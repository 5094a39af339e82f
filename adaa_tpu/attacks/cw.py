"""Carlini & Wagner L2 attack (tanh-space Adam).

Behavioral equivalent of the reference's adapted CW (reference:
adversarial_attacks/torchattacks/attacks/cw.py:46-134): optimize w in
atanh space with Adam, cost = sum per-sample L2 + c * sum f-margin,
track the best (misclassified AND lower-L2) adversarial per sample,
and early-stop the whole batch when the cost stops decreasing at
``steps // 10`` checkpoints.

The torch loop's host-side ``cost.item()`` early exit becomes a
``lax.while_loop`` predicate, so the entire attack jits as one program.
Adam matches torch defaults (betas 0.9/0.999, eps 1e-8, bias
correction).

Reference quirk reproduced: the f-margin "second largest logit" is
``max((1 - onehot) * logits)`` — the zeroed true-class slot
participates in the max, so negative other-class logits floor at 0
(cw.py:124-134).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core


class _CWState(NamedTuple):
    step: jax.Array
    w: jax.Array
    m: jax.Array
    v: jax.Array
    best_adv: jax.Array
    best_l2: jax.Array
    prev_cost: jax.Array
    done: jax.Array


def cw(
    logits_fn: core.LogitsFn,
    c: float = 1e-4,
    kappa: float = 0.0,
    steps: int = 1000,
    lr: float = 0.01,
) -> core.AttackFn:
    def tanh_space(w):
        return 0.5 * (jnp.tanh(w) + 1.0)

    def atanh(u):
        return 0.5 * jnp.log((1.0 + u) / (1.0 - u))

    def f_margin(logits2, y):
        oh = jax.nn.one_hot(y, 2, dtype=logits2.dtype)
        i = jnp.max((1.0 - oh) * logits2, axis=1)
        j = jnp.sum(oh * logits2, axis=1)
        return jnp.maximum(j - i, -kappa)

    def cost_fn(w, x, y):
        adv = tanh_space(w)
        flat = (adv - x).reshape(x.shape[0], -1)
        current_l2 = jnp.sum(flat * flat, axis=1)  # MSE(sum) per sample
        logit = logits_fn(adv)
        logits2 = core.two_class_logits(logit)
        f_loss = jnp.sum(f_margin(logits2, y))
        cost = jnp.sum(current_l2) + c * f_loss
        return cost, (current_l2, logits2, adv)

    grad_fn = jax.value_and_grad(cost_fn, has_aux=True)
    checkpoint_every = max(steps // 10, 1)
    b1, b2, adam_eps = 0.9, 0.999, 1e-8

    def attack(x, y, key):
        del key  # deterministic
        w0 = atanh(x * 2.0 - 1.0)
        state = _CWState(
            step=jnp.array(0, jnp.int32),
            w=w0,
            m=jnp.zeros_like(x),
            v=jnp.zeros_like(x),
            best_adv=x,
            best_l2=jnp.full((x.shape[0],), 1e10, x.dtype),
            prev_cost=jnp.array(1e10, x.dtype),
            done=jnp.array(False),
        )

        def cond(s: _CWState):
            return jnp.logical_and(s.step < steps, jnp.logical_not(s.done))

        def body(s: _CWState):
            (cost, (cur_l2, logits2, adv)), g = grad_fn(s.w, x, y)

            # Adam (torch defaults) on w
            t = s.step + 1
            m = b1 * s.m + (1 - b1) * g
            v = b2 * s.v + (1 - b2) * (g * g)
            mhat = m / (1 - b1 ** t.astype(x.dtype))
            vhat = v / (1 - b2 ** t.astype(x.dtype))
            w = s.w - lr * mhat / (jnp.sqrt(vhat) + adam_eps)

            # best tracking with PRE-update logits (cw.py:93-103)
            pre = jnp.argmax(logits2, axis=1)
            correct = (pre == y).astype(x.dtype)
            mask = (1.0 - correct) * (s.best_l2 > cur_l2)
            best_l2 = mask * cur_l2 + (1.0 - mask) * s.best_l2
            mask_b = mask.reshape(-1, *([1] * (x.ndim - 1)))
            best_adv = mask_b * adv + (1.0 - mask_b) * s.best_adv

            # periodic early stop on non-decreasing cost (cw.py:105-110)
            at_checkpoint = (s.step % checkpoint_every) == 0
            done = jnp.logical_and(at_checkpoint, cost > s.prev_cost)
            prev_cost = jnp.where(at_checkpoint & ~done, cost, s.prev_cost)

            return _CWState(t, w, m, v, best_adv, best_l2, prev_cost, done)

        final = jax.lax.while_loop(cond, body, state)
        return final.best_adv

    return attack
