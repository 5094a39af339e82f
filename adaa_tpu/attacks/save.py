"""Adversarial dataset generation with robust-accuracy logging.

Equivalent of the vendored library's ``Attack.save`` loop (reference:
adversarial_attacks/torchattacks/attack.py:149-229): iterate a loader,
attack every batch, report running robust accuracy and L2 distance,
and optionally persist the adversarial tensors + labels (+ predictions)
to an ``.npz`` archive instead of torch.save.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu.attacks import core
from adaa_tpu.utils.keys import host_split

LOGGER = logging.getLogger(__name__)


def save_adversarial_dataset(
    attack_fn: core.AttackFn,
    logits_fn: core.LogitsFn,
    data_loader,
    save_path: Optional[str] = None,
    verbose: bool = True,
    return_verbose: bool = False,
    save_pred: bool = False,
    key: Optional[jax.Array] = None,
    wave_space: bool = True,
):
    """Attack every batch; returns (robust_acc, l2, elapsed_ms) when
    ``return_verbose``. ``wave_space=True`` applies the minmax round
    trip per batch (the pipeline's convention)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    atk = core.attack_in_wave_space(attack_fn) if wave_space else attack_fn
    atk = jax.jit(atk)

    adv_list, label_list, pred_list = [], [], []
    correct, total, l2_sum = 0, 0, 0.0
    t0 = time.perf_counter()

    for batch in data_loader:
        batch_x = jnp.asarray(batch[0])
        batch_y = jnp.asarray(batch[2])
        key, k = host_split(key)
        adv = atk(batch_x, batch_y, k)

        pred = core.predicted_label(logits_fn(adv))
        correct += int((pred == batch_y).sum())
        total += batch_x.shape[0]
        delta = (adv - batch_x).reshape(batch_x.shape[0], -1)
        l2_sum += float(jnp.sqrt((delta * delta).sum(axis=1)).sum())

        adv_list.append(np.asarray(adv))
        label_list.append(np.asarray(batch_y))
        if save_pred:
            pred_list.append(np.asarray(pred))

        if verbose:
            elapsed = (time.perf_counter() - t0) * 1000
            LOGGER.info(
                "- Save progress: %.2f %% / Robust accuracy: %.2f %% "
                "/ L2: %.5f (%.3f ms)",
                100 * total / max(total, 1), 100 * correct / total,
                l2_sum / total, elapsed,
            )

    rob_acc = 100.0 * correct / max(total, 1)
    l2 = l2_sum / max(total, 1)
    elapsed_ms = (time.perf_counter() - t0) * 1000

    if save_path is not None:
        arrays = {
            "adv_inputs": np.concatenate(adv_list),
            "labels": np.concatenate(label_list),
        }
        if save_pred:
            arrays["preds"] = np.concatenate(pred_list)
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(save_path, **arrays)
        LOGGER.info("- Save complete! -> %s", save_path)

    if return_verbose:
        return rob_acc, l2, elapsed_ms
