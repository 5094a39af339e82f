"""End-to-end metric-dict equality: reference torch eval pipeline vs the
``evaluate_models.py`` CLI, identical wavs + identical weights.

The per-stage guard chain (golden frontends, oracle logit parity,
reference-class parity) is pinned elsewhere; this test closes the
remaining seam by running the ENTIRE pipelines side by side:

* torch side — the reference's eval loop semantics executed verbatim
  (reference: evaluate_models.py:87-133 — batch loop, sigmoid,
  ``(p + .5).int()`` labels, ``precision_recall_fscore_support``
  binary average, ``roc_auc_score``, and the flipped-label EER of
  src/metrics.py:9-14) over the full wave->LFCC->LCNN torch oracle.
* jax side — ``scripts/evaluate_models.py`` as a subprocess, loading
  the SAME torch ``.pth`` through the checkpoint importer and the same
  128 synthetic wavs via ``--asv_path synthetic:128:16000``.

Asserts (1) the CLI's formatted ``eval/*`` log line equals the
reference-formatted line character for character, and (2) the raw
in-process metric dict matches to ~1e-6 (1e-4 for EER, which moves by
the logit agreement tolerance through the ROC interpolation).

This is the closest achievable stand-in for the ±0.1% real-corpus EER
target (BASELINE.json): the corpora are absent in this image, but every
pipeline stage both frameworks disagree on would surface here.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402  (conftest forces the CPU backend)

from adaa_tpu import models  # noqa: E402
from adaa_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from adaa_tpu.eval.evaluation import evaluate_nn  # noqa: E402
from adaa_tpu.models import torch_import  # noqa: E402
from tests.oracles.torch_models import TorchLCNN  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
WAVE = 16_000
N = 128  # one full CLI batch (eval batch_size default 128, drop_last)

pytestmark = pytest.mark.slow


def _reference_eval(model: torch.nn.Module, waves: np.ndarray,
                    labels: np.ndarray):
    """The reference eval loop + metric block, line for line.

    Mirrors evaluate_models.py:87-133 (single full batch: the loader
    there shuffles, but every metric is an order-invariant aggregate
    over the same 128 samples) and src/metrics.py:9-14.
    """
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import (precision_recall_fscore_support,
                                 roc_auc_score, roc_curve)

    model.eval()
    with torch.no_grad():
        pred = torch.sigmoid(
            model(torch.from_numpy(waves)).squeeze(1))
    pred_label = (pred + 0.5).int()
    y = torch.from_numpy(labels)

    num_correct = (pred_label == y.int()).sum(dim=0).item()
    accuracy = (num_correct / len(labels)) * 100

    precision, recall, f1_score, _ = precision_recall_fscore_support(
        y.numpy(), pred_label.numpy(), average="binary", beta=1.0)
    auc_score = roc_auc_score(y_true=y.numpy(), y_score=pred.numpy())

    y_for_eer = 1 - y  # "For EER flip values" (evaluate_models.py:118)
    fpr, tpr, _ = roc_curve(y_for_eer.numpy(), -pred.numpy())
    eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)

    metrics = {"eer": float(eer), "accuracy": float(accuracy),
               "precision": float(precision), "recall": float(recall),
               "f1_score": float(f1_score), "auc": float(auc_score)}
    line = (f"eval/eer: {eer:.4f}, eval/accuracy: {accuracy:.4f}, "
            f"eval/precision: {precision:.4f}, eval/recall: {recall:.4f}, "
            f"eval/f1_score: {f1_score:.4f}, eval/auc: {auc_score:.4f}")
    return metrics, line, pred.numpy()


@pytest.fixture(scope="module")
def oracle_and_ckpt(tmp_path_factory):
    torch.manual_seed(77)
    oracle = TorchLCNN(input_channels=1, num_coefficients=80,
                       with_frontend=True)
    rng = np.random.default_rng(77)
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape)
                    .astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    1.0 + 0.3 * rng.random(m.running_var.shape)
                    .astype(np.float32)))
        # spread the logits away from 0: a random-init head leaves every
        # sigmoid at ~0.5 where 1e-4 framework noise could flip labels
        oracle.m_output_act.weight.mul_(25.0)
        oracle.m_output_act.bias.mul_(25.0)
    path = tmp_path_factory.mktemp("ckpt") / "e2e_lcnn.pth"
    torch.save(oracle.state_dict(), str(path))
    return oracle, path


@pytest.fixture(scope="module")
def val_batch():
    ds = SyntheticDataset(n=N, subset="val", wave_length=WAVE)
    waves = np.stack([ds[i][0] for i in range(N)])
    labels = np.asarray([ds[i][2] for i in range(N)], dtype=np.float32)
    return waves, labels


def test_metric_dict_matches_inprocess(oracle_and_ckpt, val_batch):
    oracle, ckpt = oracle_and_ckpt
    waves, labels = val_batch
    ref_metrics, _, ref_scores = _reference_eval(oracle, waves, labels)

    # fixture guard: no sample may sit at the decision boundary, or
    # label metrics would depend on sub-tolerance logit noise
    assert np.abs(ref_scores - 0.5).min() > 1e-3

    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]})
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=WAVE)
    variables = torch_import.import_torch_checkpoint(
        "lcnn", str(ckpt), variables)

    ds = SyntheticDataset(n=N, subset="val", wave_length=WAVE)
    report = evaluate_nn(module, variables, ds, batch_size=N)

    assert set(report) == set(ref_metrics)
    for k in ("accuracy", "precision", "recall", "f1_score"):
        assert report[k] == pytest.approx(ref_metrics[k], abs=1e-9), k
    assert report["auc"] == pytest.approx(ref_metrics["auc"], abs=1e-6)
    assert report["eer"] == pytest.approx(ref_metrics["eer"], abs=1e-4)


def test_cli_log_line_matches_reference_format(
        oracle_and_ckpt, val_batch, tmp_path):
    oracle, ckpt = oracle_and_ckpt
    waves, labels = val_batch
    _, ref_line, _ = _reference_eval(oracle, waves, labels)

    cfg = tmp_path / "e2e.yaml"
    cfg.write_text(
        "model:\n"
        "  name: lcnn\n"
        "  parameters:\n"
        "    input_channels: 1\n"
        "    frontend_algorithm: [lfcc]\n"
        f"checkpoint:\n  path: {ckpt}\n"
        "data:\n  seed: 42\n"
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "evaluate_models.py"),
         "--asv_path", f"synthetic:{N}:{WAVE}", "--wavefake_path", "none",
         "--celeb_path", "none", "--config", str(cfg), "--cpu"],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out_lines = [ln for ln in proc.stdout.splitlines() if "eval/eer" in ln]
    assert out_lines, proc.stdout[-2000:]
    # strip the logging prefix ("<ts> - INFO - ")
    got = out_lines[-1].split(" - ")[-1].strip()
    assert got == ref_line
