"""OnePixel attack — L0 black-box via batched differential evolution.

Behavioral equivalent of the reference's adapted OnePixel (reference:
adversarial_attacks/torchattacks/attacks/onepixel.py:45-144), which
reshapes waves to (B, 1, 1, L) "images" and runs a vendored scipy
differential_evolution (modified for whole-population batched fitness,
_differential_evolution.py:1-10) per sample with per-sample
success-callback early stop.

TPU-native redesign: one DE runs for ALL batch samples at once — the
population is just another batch dimension, the fitness is a (B * pop)
model forward chunked to ``inf_batch`` (reference inf_batch=128,
onepixel.py:37), generations are a ``lax.scan``, and per-sample success
freezes that sample's population (masking replaces the host callback).

The optimizer semantics match the reference fork exactly (see
attacks/differential_evolution.py): best1bin mutants off the slot-0
best, r0/r1 sampled without replacement excluding the candidate,
unit-cube internal coordinates, random re-init (not clipping) at
bounds, CR=1 full-mutant trials (onepixel.py:88 ``recombination=1``),
and the initial best swapped into slot 0. The only deviation left is
the PRNG (JAX keys vs the numpy singleton). Public knobs (pixels,
steps, popsize, inf_batch) are preserved; the population size follows
scipy's ``max(5, popmul * n_params)`` with
``popmul = max(1, popsize // n_params)`` (onepixel.py:62).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core
from adaa_tpu.attacks.differential_evolution import (
    de_generation_unit,
    de_select_best0,
    swap_best_to_slot0,
)


def onepixel(
    logits_fn: core.LogitsFn,
    pixels: int = 1,
    steps: int = 75,
    popsize: int = 400,
    inf_batch: int = 128,
) -> core.AttackFn:
    n_params = 3 * pixels  # (pos_x, pos_y, value) per pixel; pos_x in [0,1)
    popmul = max(1, popsize // n_params)
    pop_n = max(5, popmul * n_params)  # scipy popsize semantics

    def perturb_one(x, delta):
        """x: (L,), delta: (n_params,) real coords -> perturbed (L,)."""
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
        """x: (B, L), pop: (B, P, n_params) real -> (B, P) true-class prob."""
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
        # real-coordinate box: the reference's bounds [(0,H),(0,W),(0,1)]
        # on the (B,1,1,L) wave-as-image (onepixel.py:59-60)
        bounds_hi = jnp.asarray([1.0, float(length), 1.0] * pixels)

        def scale(u):  # unit cube -> real coords (lo = 0 for every dim)
            return u * bounds_hi

        k_init, k_loop = jax.random.split(key)
        pop = jax.random.uniform(k_init, (b, pop_n, n_params))
        energy = fitness(x, y, scale(pop))  # lower = more adversarial
        pop, energy = swap_best_to_slot0(pop, energy)
        done = jnp.zeros((b,), bool)

        def generation(carry, k):
            pop, energy, done = carry
            trial = de_generation_unit(pop, k, (0.5, 1.0), 1.0)
            trial_energy = fitness(x, y, scale(trial))
            pop, energy = de_select_best0(
                pop, energy, trial, trial_energy,
                accept_mask=~done[:, None],
            )
            # success callback: the slot-0 best flips the prediction
            done = done | (energy[:, 0] < 0.5)
            return (pop, energy, done), None

        keys = jax.random.split(k_loop, steps)
        (pop, energy, done), _ = jax.lax.scan(
            generation, (pop, energy, done), keys
        )

        adv = jax.vmap(perturb_one)(x, scale(pop[:, 0]))
        return adv

    return attack
