"""First-order gradient attacks: FGSM, PGD (Linf), PGDL2.

Behavioral equivalents of the reference's adapted torchattacks
(reference: adversarial_attacks/torchattacks/attacks/fgsm.py:33-62,
pgd.py:40-78, pgdl2.py:40-90) as jit-compiled jax.grad loops. Inputs
live in [0, 1] minmax space (see attacks.core); the per-step structure
(random start, signed / L2-normalized step, eps-ball projection,
[0, 1] clamp) matches the torch loops exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core


def _make_cost_grad(logits_fn: core.LogitsFn, targeted: bool):
    """Gradient of the attack cost: CE(y) untargeted, -CE(1-y) targeted
    (2-class: the only possible target is the other class)."""
    if targeted:
        return jax.grad(
            lambda x, y: -core.two_class_ce(logits_fn(x), 1 - y)
        )
    return jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))


def fgsm(logits_fn: core.LogitsFn, eps: float = 0.007,
         targeted: bool = False) -> core.AttackFn:
    """One-step Linf: adv = clip(x + eps * sign(grad CE), 0, 1).

    ``targeted=True`` uses ``-CE(target)`` with the only 2-class target
    ``1 - y`` (torch ``set_mode_targeted`` semantics, fgsm.py:40-53).
    """

    grad_fn = _make_cost_grad(logits_fn, targeted)

    def attack(x, y, key):
        g = grad_fn(x, y)
        return jnp.clip(x + eps * jnp.sign(g), 0.0, 1.0)

    return attack


def pgd(
    logits_fn: core.LogitsFn,
    eps: float = 0.3,
    alpha: float = 2.0 / 255,
    steps: int = 40,
    random_start: bool = True,
    targeted: bool = False,
) -> core.AttackFn:
    """Iterative Linf PGD with random start (pgd.py:40-78)."""

    grad_fn = _make_cost_grad(logits_fn, targeted)

    def attack(x, y, key):
        adv = x
        if random_start:
            noise = jax.random.uniform(key, x.shape, x.dtype, -eps, eps)
            adv = jnp.clip(x + noise, 0.0, 1.0)

        def step(adv, _):
            g = grad_fn(adv, y)
            adv = adv + alpha * jnp.sign(g)
            delta = jnp.clip(adv - x, -eps, eps)
            return jnp.clip(x + delta, 0.0, 1.0), None

        adv, _ = jax.lax.scan(step, adv, None, length=steps)
        return adv

    return attack


def pgdl2(
    logits_fn: core.LogitsFn,
    eps: float = 1.0,
    alpha: float = 0.2,
    steps: int = 40,
    random_start: bool = True,
    eps_for_division: float = 1e-10,
    targeted: bool = False,
) -> core.AttackFn:
    """Iterative L2 PGD (pgdl2.py:40-90): random start on a scaled
    sphere, per-sample L2-normalized gradient steps, eps-ball renorm.
    """

    grad_fn = _make_cost_grad(logits_fn, targeted)

    def attack(x, y, key):
        b = x.shape[0]
        adv = x
        if random_start:
            k1, k2 = jax.random.split(key)
            delta = jax.random.normal(k1, x.shape, x.dtype)
            n = core.flat_norms(delta, "l2").reshape(b, *([1] * (x.ndim - 1)))
            r = jax.random.uniform(k2, (b,) + (1,) * (x.ndim - 1), x.dtype)
            delta = delta * (r / n * eps)
            adv = jnp.clip(x + delta, 0.0, 1.0)

        def step(adv, _):
            g = grad_fn(adv, y)
            gn = core.flat_norms(g, "l2") + eps_for_division
            g = g / gn.reshape(b, *([1] * (x.ndim - 1)))
            adv = adv + alpha * g
            delta = adv - x
            dn = core.flat_norms(delta, "l2")
            factor = jnp.minimum(eps / dn, 1.0).reshape(b, *([1] * (x.ndim - 1)))
            return jnp.clip(x + delta * factor, 0.0, 1.0), None

        adv, _ = jax.lax.scan(step, adv, None, length=steps)
        return adv

    return attack
