"""Square attack — black-box random search (Linf), 1-D audio variant.

Behavioral equivalent of the reference's vendored Square
(adversarial_attacks/torchattacks/attacks/square.py, stock upstream —
not audio-adapted there; adapted here with the widened 2-class margin:
margin = f_y - f_other = (2y-1) * 2z). The image algorithm's square
patches become contiguous wave segments on the (1, L) grid: the init
stripes are per-sample ±eps, and each query proposes a length-s window
re-randomized to ±eps around x, accepted when the margin loss
decreases (square.py:187-280 Linf branch; p-schedule square.py:158-185).

Runs as one jitted ``lax.fori_loop`` over queries with per-sample
masked accepts — fully on-device black-box search (only forwards, no
gradients).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu.attacks import core


def _p_schedule(it: int, n_queries: int, p_init: float) -> float:
    it = int(it / n_queries * 10000)
    for bound, div in ((10, 1), (50, 2), (200, 4), (500, 8), (1000, 16),
                       (2000, 32), (4000, 64), (6000, 128), (8000, 256)):
        if it <= bound:
            return p_init / div
    return p_init / 512


def square(
    logits_fn: core.LogitsFn,
    norm: str = "Linf",
    eps: float = 8 / 255,
    n_queries: int = 5000,
    p_init: float = 0.8,
    loss: str = "margin",
    seed: int = 0,
) -> core.AttackFn:
    assert norm == "Linf", "audio Square implements the Linf branch"
    assert loss in ("ce", "margin")
    del seed  # key passed at call time

    def margin_and_loss(x, y):
        z = logits_fn(x).squeeze(-1)
        sign = 2.0 * y.astype(z.dtype) - 1.0
        margin = sign * 2.0 * z  # f_y - f_other
        if loss == "ce":
            return margin, -jax.nn.softplus(-margin)  # -CE (to minimize)
        return margin, margin

    # static per-query window lengths from the p-schedule
    def window_len(length, it):
        p = _p_schedule(it, n_queries, p_init)
        s = int(round(math.sqrt(p * length)))
        return min(max(s, 1), length - 1)

    def attack(x, y, key):
        b, length = x.shape
        idx = jnp.arange(length)[None, :]

        # init: per-position random ±eps "stripes"
        key, k0 = jax.random.split(key)
        signs = jax.random.rademacher(k0, (b, length), jnp.float32) \
            if hasattr(jax.random, "rademacher") else (
                2.0 * jax.random.bernoulli(k0, 0.5, (b, length)).astype(
                    jnp.float32) - 1.0)
        x_best = jnp.clip(x + eps * signs, 0.0, 1.0)
        margin, loss_best = margin_and_loss(x_best, y)

        window_lens = np.asarray(
            [window_len(length, it) for it in range(n_queries)], np.int32
        )
        window_lens_d = jnp.asarray(window_lens)

        def body(it, carry):
            x_best, loss_best, margin, key = carry
            key, kp, ks = jax.random.split(key, 3)
            s = window_lens_d[it]
            pos = jax.random.randint(kp, (b, 1), 0, length - s + 1)
            in_window = (idx >= pos) & (idx < pos + s)
            new_sign = (
                2.0 * jax.random.bernoulli(ks, 0.5, (b, 1)).astype(jnp.float32)
                - 1.0
            )
            candidate = jnp.where(in_window, x + eps * new_sign, x_best)
            candidate = jnp.clip(
                jnp.clip(candidate, x - eps, x + eps), 0.0, 1.0
            )
            m_new, l_new = margin_and_loss(candidate, y)
            improved = l_new < loss_best
            still_to_fool = margin > 0
            accept = improved & still_to_fool
            x_best = jnp.where(accept[:, None], candidate, x_best)
            loss_best = jnp.where(accept, l_new, loss_best)
            margin = jnp.where(accept, m_new, margin)
            return (x_best, loss_best, margin, key)

        x_best, _, _, _ = jax.lax.fori_loop(
            0, n_queries, body, (x_best, loss_best, margin, key)
        )
        # the outer perturb loop only touches originally-correct samples
        originally_correct = core.predicted_label(logits_fn(x)) == y
        return jnp.where(originally_correct[:, None], x_best, x)

    return attack
