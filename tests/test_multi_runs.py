"""Batch-orchestration smoke test: the multi-run evaluation driver."""
import subprocess
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]


def test_run_multiple_evaluations(tmp_path):
    cfg_path = REPO / "configs/training/lcnn.yaml"
    batch = tmp_path / "batch.yaml"
    batch.write_text(yaml.dump({"paths": [str(cfg_path)]}))

    out = subprocess.run(
        [sys.executable, "scripts/multi_runs/run_multiple_evaluations.py",
         "--config", str(batch),
         "--asv_path", "synthetic:192", "--amount", "192"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "eval/eer" in out.stderr or "eval/eer" in out.stdout
