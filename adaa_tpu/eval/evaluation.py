"""Clean evaluation loop.

Behavioral equivalent of the reference's ``evaluate_nn``
(reference: evaluate_models.py:39-133): batched eval-mode forward,
sigmoid -> label via ``(p + .5).int()``, accuracy / precision / recall
/ F1 / AUC, EER on flipped labels, and the ``eval/*`` metric namespace
(evaluate_models.py:123-133).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu import metrics
from adaa_tpu.data.loader import DataLoader

LOGGER = logging.getLogger(__name__)


def evaluate_nn(
    module,
    variables: Dict[str, Any],
    dataset,
    batch_size: int = 128,
    model_name: str = "",
) -> Dict[str, float]:
    LOGGER.info(
        "Testing '%s' model on %d audio files.", model_name, len(dataset)
    )
    loader = DataLoader(
        dataset, batch_size, shuffle=True, drop_last=True, num_workers=3
    )

    # batch-axis sharding when multiple devices are visible (SPMD
    # equivalent of the reference's DataParallel wrapping)
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and batch_size % n_dev == 0:
        from adaa_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh()
        variables = replicate(variables, mesh)
        LOGGER.info("Data-parallel over %d devices", n_dev)

    def _shard(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def predict(batch_x):
        out = module.apply(variables, batch_x, train=False).squeeze(1)
        return jax.nn.sigmoid(out)

    batches_number = len(dataset) // batch_size
    y_pred, y = [], []
    for i, batch in enumerate(loader):
        batch_x, batch_y = batch[0], batch[2]
        if i % 10 == 0:
            LOGGER.info("Batch [%d/%d]", i, batches_number)
        # keep predictions device-resident: a per-batch np.asarray sync
        # stalls the dispatch pipeline; one concatenate + pull at the end
        y_pred.append(predict(_shard(jnp.asarray(batch_x))))
        y.append(batch_y)

    if not y_pred:
        raise ValueError(
            f"no full batches: {len(dataset)} samples < batch_size "
            f"{batch_size} with drop_last — lower batch_size or raise --amount"
        )
    y_pred = np.asarray(jnp.concatenate(y_pred))
    y_pred_label = (y_pred + 0.5).astype(np.int32)
    y = np.concatenate(y)

    report = metrics.classification_report(y, y_pred, y_pred_label)
    LOGGER.info(metrics.format_metrics("eval", report))
    return report
