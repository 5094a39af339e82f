"""Tracing / profiling / structured metrics.

The reference has no in-code profiling (SURVEY §5: a pinned py-spy for
ad-hoc sampling and tqdm progress bars). The TPU build provides:

* ``trace(logdir)`` — context manager around ``jax.profiler`` for
  XLA-level traces viewable in TensorBoard/Perfetto,
* ``StageTimer`` — wall-clock per-stage timing with
  ``block_until_ready`` fencing (reports adv-examples/sec, the
  BASELINE.json primary metric),
* ``MetricsLogger`` — structured jsonl metric stream next to the
  console logs, keeping the reference's metric names
  (``eval/*``, ``adv_eval/*``, ``train/...`` — SURVEY §5).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax

LOGGER = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/adaa_trace"):
    """jax.profiler trace scope (TensorBoard 'profile' plugin format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        LOGGER.info("profiler trace written to %s", logdir)


class StageTimer:
    """Wall-clock stage timer with device fencing.

    >>> t = StageTimer()
    >>> with t.stage("attack"):
    ...     adv = attack_fn(x, y, key)  # async dispatch
    >>> t.report(items={"attack": batch_size})
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, items: Optional[Dict[str, int]] = None) -> Dict[str, Dict]:
        out = {}
        for name, total in self.totals.items():
            entry = {
                "total_s": total,
                "calls": self.counts[name],
                "mean_ms": total / self.counts[name] * 1000.0,
            }
            if items and name in items:
                entry["items_per_sec"] = items[name] * self.counts[name] / total
            out[name] = entry
            LOGGER.info("[timer] %s: %s", name, entry)
        return out


class MetricsLogger:
    """Structured jsonl metrics alongside the console log lines."""

    def __init__(self, path: Optional[str] = None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, namespace: str, metrics: Dict[str, float], **extra):
        record = {
            "ts": time.time(),
            **{f"{namespace}/{k}": float(v) for k, v in metrics.items()},
            **extra,
        }
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        LOGGER.info("%s", record)
        return record
