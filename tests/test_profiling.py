"""StageTimer / MetricsLogger smoke tests."""
import json

import jax.numpy as jnp

from adaa_tpu.utils.profiling import MetricsLogger, StageTimer


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.stage("fwd", sync=None):
        x = jnp.ones((16, 16)) @ jnp.ones((16, 16))
    with t.stage("fwd", sync=x):
        x = x @ x
    rep = t.report(items={"fwd": 16})
    assert rep["fwd"]["calls"] == 2
    assert rep["fwd"]["items_per_sec"] > 0


def test_metrics_logger(tmp_path):
    path = tmp_path / "metrics.jsonl"
    ml = MetricsLogger(str(path))
    ml.log("eval", {"eer": 0.01, "accuracy": 99.0}, epoch=3)
    rec = json.loads(path.read_text().strip())
    assert rec["eval/eer"] == 0.01
    assert rec["epoch"] == 3
