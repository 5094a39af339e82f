"""Host-side evaluation metrics.

Mirrors the reference metric surface (reference: src/metrics.py:9-14 and
evaluate_models.py:108-133): EER via ROC + brentq root finding, plus
accuracy / precision / recall / F1 / AUC with identical label handling
(callers flip labels before EER: ``y_for_eer = 1 - y``,
evaluate_models.py:116).

These run on host (numpy/scipy/sklearn) — tiny and off the hot path.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy.interpolate import interp1d
from scipy.optimize import brentq
from sklearn.metrics import precision_recall_fscore_support, roc_auc_score, roc_curve


def calculate_eer(y, y_score) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """Equal error rate on (flipped) labels.

    Signature and semantics match the reference (src/metrics.py:9-14):
    the ROC is computed on *negated* scores and the EER is the root of
    ``1 - x - interp1d(fpr, tpr)(x)``.

    Returns (threshold, eer, fpr, tpr).
    """
    y = np.asarray(y)
    y_score = np.asarray(y_score)
    fpr, tpr, thresholds = roc_curve(y, -y_score)

    eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    thresh = interp1d(fpr, thresholds)(eer)
    return thresh, eer, fpr, tpr


def classification_report(
    y: np.ndarray,
    y_pred: np.ndarray,
    y_pred_label: np.ndarray,
) -> Dict[str, float]:
    """The full eval metric set with the reference's exact conventions.

    * accuracy as percentage (evaluate_models.py:108)
    * precision/recall/F1 binary-average (evaluate_models.py:110-112)
    * AUC on raw sigmoid scores (evaluate_models.py:113)
    * EER on flipped labels (evaluate_models.py:116-121)
    """
    y = np.asarray(y).astype(np.float64)
    y_pred = np.asarray(y_pred).astype(np.float64)
    y_pred_label = np.asarray(y_pred_label).astype(np.int64)

    num_correct = float((y_pred_label == y.astype(np.int64)).sum())
    accuracy = (num_correct / max(len(y), 1)) * 100.0

    precision, recall, f1_score, _ = precision_recall_fscore_support(
        y, y_pred_label, average="binary", beta=1.0, zero_division=0
    )
    try:
        auc_score = roc_auc_score(y_true=y, y_score=y_pred)
    except ValueError:  # single-class batch
        auc_score = float("nan")

    y_for_eer = 1 - y
    try:
        _, eer, _, _ = calculate_eer(y=y_for_eer, y_score=y_pred)
    except (ValueError, ZeroDivisionError):
        eer = float("nan")

    return {
        "eer": float(eer),
        "accuracy": float(accuracy),
        "precision": float(precision),
        "recall": float(recall),
        "f1_score": float(f1_score),
        "auc": float(auc_score),
    }


def format_metrics(prefix: str, m: Dict[str, float]) -> str:
    """Render metrics with the reference's log line format.

    e.g. ``eval/eer: 0.0123, eval/accuracy: 98.7000, ...``
    (evaluate_models.py:123-133; adv namespace
    evaluate_models_on_adversarial_attacks.py:288-298).
    """
    order = ["eer", "accuracy", "precision", "recall", "f1_score", "auc"]
    return ", ".join(f"{prefix}/{k}: {m[k]:.4f}" for k in order if k in m)
