"""Composite attacks: MultiAttack and AutoAttack.

Equivalents of the reference's vendored multiattack.py / autoattack.py
(stock upstream): MultiAttack runs a list of attacks in sequence,
keeping each sample's first successful adversarial example;
AutoAttack's 'standard' suite is APGD-CE, APGD-T (DLR), FAB, and
Square. In the 2-class audio setting FAB-targeted degenerates to
untargeted FAB (there is exactly one wrong class), so the untargeted
variant stands in for both.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core


def multiattack(logits_fn: core.LogitsFn,
                attacks: List[core.AttackFn]) -> core.AttackFn:
    """Sequential attacks; per-sample first success wins
    (multiattack.py semantics)."""

    def attack(x, y, key):
        b = x.shape[0]
        shape1 = (b,) + (1,) * (x.ndim - 1)
        adv = x
        robust = core.predicted_label(logits_fn(x)) == y  # still correct
        keys = jax.random.split(key, len(attacks))
        for atk, k in zip(attacks, list(keys)):
            candidate = atk(x, y, k)
            fooled = core.predicted_label(logits_fn(candidate)) != y
            newly = robust & fooled
            adv = jnp.where(newly.reshape(shape1), candidate, adv)
            robust = robust & ~fooled
        return adv

    return attack


def autoattack(
    logits_fn: core.LogitsFn,
    norm: str = "Linf",
    eps: float = 8 / 255,
    version: str = "standard",
    n_classes: int = 2,
    seed: int = 0,
) -> core.AttackFn:
    del seed, version
    from adaa_tpu.attacks.apgd import apgd, apgdt
    from adaa_tpu.attacks.fab import fab
    from adaa_tpu.attacks.square import square

    suite = [
        apgd(logits_fn, norm=norm, eps=eps, steps=100, n_restarts=1,
             loss="ce"),
        apgdt(logits_fn, norm=norm, eps=eps, steps=100, n_restarts=1,
              n_classes=n_classes),
        fab(logits_fn, norm=norm, eps=eps, steps=100, n_restarts=1,
            n_classes=n_classes),
        square(logits_fn, norm="Linf", eps=eps, n_queries=5000),
    ]
    return multiattack(logits_fn, suite)
