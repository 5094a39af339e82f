"""Batch-orchestration smoke tests: all four multi-run drivers.

Each driver is exercised end-to-end in a subprocess on synthetic data
(reference drivers: multi_runs_scripts/run_multiple_evaluations.py,
run_multiple_trainings.py:24-33,
run_multiple_trainings_on_adversarial_attacks.py:36-67,
run_multiple_evaluations_on_adversarial_attacks.py:31-50 — the last
two carry reference bugs fixed here: a stale
``src.adversarial_attacks_generator.aa_types`` import and a
missing-space flag concatenation).

The subprocess env omits PALLAS_AXON_POOL_IPS so the axon TPU backend
never registers; JAX_PLATFORMS=cpu then forces CPU.
"""
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]

SUBPROC_ENV = {
    "JAX_PLATFORMS": "cpu",
    "PATH": "/usr/bin:/bin:/usr/local/bin",
    "HOME": "/root",
}


def _run(script, argv, timeout=900):
    return subprocess.run(
        [sys.executable, f"scripts/multi_runs/{script}", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
        env=SUBPROC_ENV,
    )


def test_run_multiple_evaluations(tmp_path):
    cfg_path = REPO / "configs/training/lcnn.yaml"
    batch = tmp_path / "batch.yaml"
    batch.write_text(yaml.dump({"paths": [str(cfg_path)]}))

    out = _run("run_multiple_evaluations.py",
               ["--config", str(batch),
                "--asv_path", "synthetic:192", "--amount", "192"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "eval/eer" in out.stderr or "eval/eer" in out.stdout


@pytest.mark.slow
def test_run_multiple_trainings(tmp_path):
    cfg_path = REPO / "configs/training/lcnn.yaml"
    batch = tmp_path / "batch.yaml"
    batch.write_text(yaml.dump({"paths": [str(cfg_path)]}))

    out = _run("run_multiple_trainings.py",
               ["--config", str(batch),
                "--asv_path", "synthetic:16",
                "--batch_size", "4", "--epochs", "1"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Training done" in out.stdout + out.stderr
    # the inner CLI chains a test config like the reference's
    assert "Test config saved" in out.stdout + out.stderr


@pytest.mark.slow
def test_run_multiple_adv_trainings(tmp_path):
    # from-scratch adversarial training (no finetune -> no ckpt needed)
    cfg = {
        "data": {"seed": 42, "adversarial_attacks": ["FGSM_eps001"]},
        "checkpoint": {"path": ""},
        "model": {
            "name": "lcnn",
            "parameters": {"frontend_algorithm": ["lfcc"],
                           "input_channels": 1},
            "optimizer": {"lr": 0.0001, "weight_decay": 0.0001},
        },
    }
    cfg_path = tmp_path / "lcnn_adv.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    batch = tmp_path / "batch.yaml"
    batch.write_text(yaml.dump([{"config": str(cfg_path)}]))

    out = _run("run_multiple_trainings_on_adversarial_attacks.py",
               ["--config", str(batch),
                "--asv_path", "synthetic:16",
                "--adv_training_strategy", "ONLY_ADV",
                "--epochs", "1", "--batch_size", "4",
                "--train_amount", "8", "--test_amount", "8"],
               timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout + out.stderr
    assert "Training done" in text or "saved" in text.lower()


@pytest.mark.slow
def test_run_multiple_adv_evaluations(tmp_path):
    cfg_path = REPO / "configs/training/lcnn.yaml"
    batch = tmp_path / "batch.yaml"
    batch.write_text(yaml.dump([{
        "attack": "FGSM_eps001",
        "config": str(cfg_path),
        "attack_model_config": str(cfg_path),
    }]))

    out = _run("run_multiple_evaluations_on_adversarial_attacks.py",
               ["--config", str(batch),
                "--asv_path", "synthetic:128", "--amount", "128"],
               timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "adv_eval/" in out.stdout + out.stderr
