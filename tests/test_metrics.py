"""Metric golden tests (EER semantics from the reference)."""
import numpy as np

from adaa_tpu import metrics


def test_eer_perfect_separation():
    y = np.array([0, 0, 0, 1, 1, 1])
    scores = np.array([0.9, 0.8, 0.7, 0.1, 0.2, 0.3])
    # calculate_eer negates scores internally; with y=1 scored low,
    # roc_curve(y, -scores) separates perfectly -> EER 0
    _, eer, _, _ = metrics.calculate_eer(y, scores)
    assert eer < 1e-9


def test_eer_random_is_half():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, size=4000)
    scores = rng.random(4000)
    _, eer, _, _ = metrics.calculate_eer(y, scores)
    assert abs(eer - 0.5) < 0.05


def test_classification_report_keys_and_flip():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, size=500).astype(float)
    # scores correlated with labels
    y_pred = np.clip(y * 0.8 + rng.random(500) * 0.4 - 0.1, 0, 1)
    y_label = (y_pred + 0.5).astype(int)
    rep = metrics.classification_report(y, y_pred, y_label)
    for k in ["eer", "accuracy", "precision", "recall", "f1_score", "auc"]:
        assert k in rep
    assert rep["accuracy"] > 50.0
    assert rep["auc"] > 0.5
    # a good detector scores a low EER after the label flip
    assert rep["eer"] < 0.5


def test_format_metrics_namespaces():
    m = {"eer": 0.1, "accuracy": 90.0, "precision": 0.9, "recall": 0.8,
         "f1_score": 0.85, "auc": 0.95}
    line = metrics.format_metrics("eval", m)
    assert line.startswith("eval/eer: 0.1000")
    assert "eval/auc: 0.9500" in line
