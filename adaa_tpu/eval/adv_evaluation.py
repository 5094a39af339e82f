"""Adversarial evaluation: white-box + transferability.

Behavioral equivalent of the reference's ``generate_attacks``
(reference: evaluate_models_on_adversarial_attacks.py:146-298):
per batch — minmax -> attack(surrogate) -> revert -> (optional
re-preprocess for raw samples) -> victim prediction; plus the
no-attack predictions feeding the qualitative callback, and the
``adv_eval/*`` metric namespace (:288-298).

White-box when the attack config equals the victim config;
transferability when the surrogate is a different architecture.

TPU design: attack generation + victim forward are jitted programs;
in raw mode (``--raw_from_dataset``) the attacked batch is re-run
through the canonical preprocessing WITH DEFAULTS — silence trim +
repeat-pad — before the victim prediction, exactly as the reference
does (evaluate_models_on_adversarial_attacks.py:229-234 ->
base_dataset.py:122-148); the trim is host-side (native C sox-silence
port), so raw mode pays one device->host->device round trip per batch,
same as the reference.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu import attacks as attacks_lib
from adaa_tpu import metrics
from adaa_tpu.attacks import core as attack_core
from adaa_tpu.data.loader import DataLoader
from adaa_tpu.utils.keys import host_split

LOGGER = logging.getLogger(__name__)


def generate_attacks(
    victim_module,
    victim_variables: Dict[str, Any],
    dataset,
    attack_name: str = "NO_ATTACK",
    attack_module=None,
    attack_variables: Optional[Dict[str, Any]] = None,
    batch_size: int = 64,
    key: Optional[jax.Array] = None,
    on_attack_end_callback: Optional[Callable] = None,
    raw_sample_from_dataset: bool = False,
) -> Dict[str, float]:
    key = key if key is not None else jax.random.PRNGKey(0)

    builder, params = attacks_lib.ATTACK_REGISTRY.get(
        attack_name, (None, {})
    ) if attack_name in attacks_lib.ATTACK_REGISTRY else (
        attacks_lib.EXTRA_ATTACKS[attack_name], {}
    )
    has_attack = builder is not None and attack_module is not None

    # SPMD data parallelism: with multiple devices, shard the batch on a
    # 1-D mesh (the TPU-native equivalent of the reference wrapping both
    # models in nn.DataParallel — evaluate_models_on_adversarial_attacks.py:163-167)
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and batch_size % n_dev == 0:
        from adaa_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh()
        victim_variables = replicate(victim_variables, mesh)
        if attack_variables is not None:
            attack_variables = replicate(attack_variables, mesh)
        LOGGER.info("Data-parallel over %d devices", n_dev)

    def _shard(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def victim_predict(batch_x):
        out = victim_module.apply(victim_variables, batch_x, train=False)
        return jax.nn.sigmoid(out.squeeze(1))

    if has_attack:
        logits_fn = attack_core.make_logits_fn(attack_module, attack_variables)
        atk = builder(logits_fn, **params)

        @jax.jit
        def attack_batch(batch_x, batch_y, k):
            x01, mn, mx = attack_core.to_minmax(batch_x)
            adv01 = atk(x01, batch_y, k)
            return attack_core.revert_minmax(adv01, mn, mx)

        LOGGER.info(
            "Attack using '%s' method (%s)", attack_name, params
        )
    else:
        LOGGER.info("No attack applied")

    loader = DataLoader(
        dataset, batch_size, shuffle=True, drop_last=True, num_workers=3
    )

    y_pred, y_pred_label, y = [], [], []
    for i, batch in enumerate(loader):
        batch_x = _shard(jnp.asarray(batch[0]))
        batch_sr = np.asarray(batch[1])
        batch_y = _shard(jnp.asarray(batch[2]))
        batch_meta = batch[3] if len(batch) > 3 else None

        if has_attack:
            key, ak = host_split(key)  # CPU-backend split: bit-identical
            # keys, no per-batch device program (utils/keys.py)
            batch_x_attacked = attack_batch(batch_x, batch_y, ak)
        else:
            batch_x_attacked = batch_x

        # the qualitative callback receives the UN-re-preprocessed
        # waveforms (reference keeps noproc clones, :225-226) — pulled
        # to host ONLY when needed: a full-batch np.asarray rides the
        # ~1 GB/s tunnel relay (~16 MB -> tens of ms per batch)
        need_callback = on_attack_end_callback is not None
        batch_x_noproc = np.asarray(batch_x) if need_callback else None
        batch_x_attacked_noproc = (
            np.asarray(batch_x_attacked)
            if (need_callback or raw_sample_from_dataset)
            else None
        )

        if raw_sample_from_dataset:
            # reference :229-234 — raw samples were loaded untrimmed;
            # the attacked audio is re-run through the canonical
            # preprocessing WITH DEFAULTS (silence trim + repeat-pad)
            # before the victim sees it
            from adaa_tpu.data import base as dsp

            repro, _ = dsp.wavefake_preprocessing_on_batch(
                batch_x_attacked_noproc, batch_sr
            )
            batch_x_attacked = _shard(jnp.asarray(repro))

        preds_dev = victim_predict(batch_x_attacked)
        if not need_callback:
            # no per-batch consumer: stay device-resident, one pull at
            # the end (per-batch syncs stall the dispatch pipeline);
            # labels come from the host-side batch, not the device copy
            y_pred.append(preds_dev)
            y.append(np.asarray(batch[2]))
            continue

        preds = np.asarray(preds_dev)
        preds_label = (preds + 0.5).astype(np.int32)

        # callback mode (the no-callback path continue'd above)
        if raw_sample_from_dataset:
            from adaa_tpu.data import base as dsp

            repro_clean, _ = dsp.wavefake_preprocessing_on_batch(
                batch_x_noproc, batch_sr
            )
            batch_x = _shard(jnp.asarray(repro_clean))
        preds_noattack = np.asarray(victim_predict(batch_x))
        preds_noattack_label = (preds_noattack + 0.5).astype(np.int32)
        on_attack_end_callback(
            batch_x=batch_x_noproc,
            batch_x_attacked=batch_x_attacked_noproc,
            batch_y=np.asarray(batch_y),
            batch_preds_label=preds_label,
            batch_preds=preds,
            batch_preds_noattack_label=preds_noattack_label,
            batch_preds_noattack=preds_noattack,
            batch_metadata=batch_meta,
        )

        y_pred.append(preds)
        y_pred_label.append(preds_label)
        y.append(np.asarray(batch[2]))

    if on_attack_end_callback is None and y_pred:
        y_pred = np.asarray(jnp.concatenate(y_pred))  # single pull
        y_pred_label = [(y_pred + 0.5).astype(np.int32)]
        y_pred = [y_pred]
    y_pred = np.concatenate(y_pred)
    y_pred_label = np.concatenate(y_pred_label)
    y = np.concatenate(y)

    report = metrics.classification_report(y, y_pred, y_pred_label)
    LOGGER.info(metrics.format_metrics("adv_eval", report))
    return report
