"""Attack protocol core: losses, box transforms, model adapters.

The reference's vendored torchattacks fork adapts image-domain attacks
to single-logit audio detectors by (1) widening the logit to two
classes — ``outputs = cat([-z, z], dim=1)`` inserted before every loss
(reference: adversarial_attacks/torchattacks/attacks/fgsm.py:47,
pgd.py:62, etc.; README.md:130-137) — and (2) running attacks on
min-max normalized waveforms in [0, 1] so the attacks' ``clamp(0, 1)``
is a valid-wave projection (reference: src/aa/utils.py:4-14, call
sites src/trainer.py:425-427).

Here the two-class wrapper is algebra, not a concat: with logits
(-z, z) and integer label y,

    CE(cat[-z, z], y) = softplus(-2 * (2y - 1) * z)

whose gradient matches the torch construction bit-for-bit; argmax over
(-z, z) is ``z > 0``.

Attacks are pure functions ``(x01, y, key) -> adv01`` over a captured
``logits_fn``; iterative loops are ``lax.scan`` / ``lax.while_loop``
so one jit compiles the whole attack.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

LogitsFn = Callable[[jax.Array], jax.Array]  # (B, L) -> (B, 1)
AttackFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def make_logits_fn(module, variables) -> LogitsFn:
    """Deterministic eval-mode forward (the attack-mode semantics of the
    reference: model.train() with BatchNorm/Dropout forced to eval and
    no running-stat updates — attack.py:132-147,308-331 — which in
    functional flax is exactly ``train=False`` with frozen variables).
    """

    def logits_fn(x: jax.Array) -> jax.Array:
        return module.apply(variables, x, train=False)

    return logits_fn


def two_class_ce(logit: jax.Array, y: jax.Array) -> jax.Array:
    """Mean CE over the widened (-z, z) logits. logit: (B, 1), y: (B,)."""
    z = logit.squeeze(-1)
    sign = 2.0 * y.astype(z.dtype) - 1.0
    return jnp.mean(jax.nn.softplus(-2.0 * sign * z))


def two_class_logits(logit: jax.Array) -> jax.Array:
    """Materialized (B, 2) logits — used where the attack inspects them."""
    z = logit.reshape(logit.shape[0], -1)[:, :1]
    return jnp.concatenate([-z, z], axis=1)


def predicted_label(logit: jax.Array) -> jax.Array:
    """argmax over (-z, z) == (z > 0); torch argmax tie-breaks to 0."""
    z = logit.squeeze(-1)
    return (z > 0).astype(jnp.int32)


def to_minmax(batch_x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample min-max to [0, 1] (reference src/aa/utils.py:4-9)."""
    mn = batch_x.min(axis=1, keepdims=True)
    mx = batch_x.max(axis=1, keepdims=True)
    r = mx - mn
    return (batch_x - mn) / r, mn, mx


def revert_minmax(batch_x: jax.Array, mn: jax.Array, mx: jax.Array) -> jax.Array:
    """Inverse transform (reference src/aa/utils.py:12-14)."""
    return batch_x * (mx - mn) + mn


def attack_in_wave_space(attack_fn: AttackFn) -> AttackFn:
    """Wrap an [0,1]-space attack with the minmax round trip every call
    site of the reference performs (trainer.py:425-427,469-471, ...).
    """

    def wrapped(x_wave, y, key):
        x01, mn, mx = to_minmax(x_wave)
        adv01 = attack_fn(x01, y, key)
        return revert_minmax(adv01, mn, mx)

    return wrapped


def flat_norms(x: jax.Array, ord: str) -> jax.Array:
    """Per-sample norm over flattened non-batch dims."""
    flat = x.reshape(x.shape[0], -1)
    if ord == "linf":
        return jnp.abs(flat).max(axis=1)
    if ord == "l2":
        return jnp.sqrt((flat * flat).sum(axis=1))
    if ord == "l1":
        return jnp.abs(flat).sum(axis=1)
    raise ValueError(ord)
