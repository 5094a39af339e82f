"""OnePixel attack — L0 black-box via batched differential evolution.

Behavioral equivalent of the reference's adapted OnePixel (reference:
adversarial_attacks/torchattacks/attacks/onepixel.py:45-144), which
reshapes waves to (B, 1, 1, L) "images" and runs a vendored scipy
differential_evolution (modified for whole-population batched fitness,
_differential_evolution.py:1-10) per sample with per-sample
success-callback early stop.

TPU-native redesign: one synchronous rand/1/bin DE runs for ALL batch
samples at once — the population is just another batch dimension, the
fitness is a (B * pop) model forward chunked to ``inf_batch``
(reference inf_batch=128, onepixel.py:37), generations are a
``lax.scan``, and per-sample success freezes that sample's population
(masking replaces the host callback). Documented deviations from
scipy's DE: synchronous (not steady-state) selection, boundary clipping
instead of random reinit, independent r0/r1/r2 draws (collision
probability ~pop^-2). The optimizer family and all public knobs
(pixels, steps, popsize) are preserved.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core


def onepixel(
    logits_fn: core.LogitsFn,
    pixels: int = 1,
    steps: int = 75,
    popsize: int = 400,
    inf_batch: int = 128,
) -> core.AttackFn:
    n_params = 3 * pixels  # (pos_x, pos_y, value) per pixel; pos_x in [0,1)
    popmul = max(1, popsize // n_params)
    pop_n = popmul * n_params  # scipy popsize semantics (multiplier)

    def perturb_one(x, delta):
        """x: (L,), delta: (n_params,) -> perturbed (L,)."""
        out = x
        for p in range(pixels):
            pos = delta[3 * p + 1].astype(jnp.int32)
            val = delta[3 * p + 2]
            out = jnp.where(jnp.arange(x.shape[0]) == pos, val, out)
        return out

    def true_prob(x_flat, y_flat):
        """P(model predicts the true class) — softmax over (-z, z)."""
        z = logits_fn(x_flat).squeeze(-1)
        sign = 2.0 * y_flat.astype(z.dtype) - 1.0
        return jax.nn.sigmoid(2.0 * sign * z)

    def fitness(x, y, pop):
        """x: (B, L), pop: (B, P, n_params) -> (B, P) true-class prob."""
        b, length = x.shape
        perturbed = jax.vmap(
            lambda xi, pi: jax.vmap(lambda d: perturb_one(xi, d))(pi)
        )(x, pop)  # (B, P, L)
        flat = perturbed.reshape(b * pop_n, length)
        y_rep = jnp.repeat(y, pop_n)
        # chunked inference (reference inf_batch)
        n_chunks = -(-flat.shape[0] // inf_batch)
        pad = n_chunks * inf_batch - flat.shape[0]
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        y_pad = jnp.pad(y_rep, (0, pad))
        probs = jax.lax.map(
            lambda args: true_prob(*args),
            (
                flat.reshape(n_chunks, inf_batch, length),
                y_pad.reshape(n_chunks, inf_batch),
            ),
        ).reshape(-1)[: b * pop_n]
        return probs.reshape(b, pop_n)

    def attack(x, y, key):
        b, length = x.shape
        bounds_hi = jnp.asarray([1.0, float(length), 1.0] * pixels)
        bounds_lo = jnp.zeros((n_params,))

        k_init, k_loop = jax.random.split(key)
        pop = (
            jax.random.uniform(k_init, (b, pop_n, n_params))
            * (bounds_hi - bounds_lo)
            + bounds_lo
        )
        energy = fitness(x, y, pop)  # lower = more adversarial
        done = jnp.zeros((b,), bool)

        def generation(carry, k):
            pop, energy, done = carry
            kf, kr, km = jax.random.split(k, 3)
            f = jax.random.uniform(kf, (), minval=0.5, maxval=1.0)
            idx = jax.random.randint(kr, (3, b, pop_n), 0, pop_n)
            r0 = jnp.take_along_axis(pop, idx[0][..., None], axis=1)
            r1 = jnp.take_along_axis(pop, idx[1][..., None], axis=1)
            r2 = jnp.take_along_axis(pop, idx[2][..., None], axis=1)
            trial = jnp.clip(r0 + f * (r1 - r2), bounds_lo, bounds_hi)
            trial_energy = fitness(x, y, trial)
            improved = trial_energy < energy
            accept = improved & ~done[:, None]
            pop = jnp.where(accept[..., None], trial, pop)
            energy = jnp.where(accept, trial_energy, energy)
            # success callback: best member flips the prediction
            done = done | (energy.min(axis=1) < 0.5)
            return (pop, energy, done), None

        keys = jax.random.split(k_loop, steps)
        (pop, energy, done), _ = jax.lax.scan(
            generation, (pop, energy, done), keys
        )

        best = jnp.argmin(energy, axis=1)  # (B,)
        best_delta = jnp.take_along_axis(
            pop, best[:, None, None], axis=1
        ).squeeze(1)  # (B, n_params)
        adv = jax.vmap(perturb_one)(x, best_delta)
        return adv

    return attack
