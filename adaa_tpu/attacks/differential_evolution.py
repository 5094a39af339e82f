"""Batched differential evolution on device — reference-fork semantics.

The reference vendors a modified scipy DE whose single change is
passing the whole population to the objective for batched NN
evaluation (reference:
adversarial_attacks/torchattacks/attacks/_differential_evolution.py:1-10).
This is the TPU-native counterpart with the SAME optimizer semantics as
that fork's batched loop (`__next__`, _differential_evolution.py:681-756):

* ``best1bin`` strategy — mutants are built from the slot-0 best member
  (``_best1``, :828-834), with per-generation dither F ~ U[m0, m1).
* r0/r1 are sampled WITHOUT replacement excluding the candidate
  (``_select_samples``, :887-897).
* the population lives in unit-cube internal coordinates; scaling to the
  real box happens only for fitness (``_scale_parameters``, :771-775).
* out-of-bounds trial coordinates are re-drawn uniformly at random, not
  clipped (``_ensure_constraint``, :783-788).
* trials for a generation are all created from the pre-generation
  population snapshot, batch-evaluated, then selected; slot 0 ends the
  generation holding the best member found so far (the winning trial
  occupies both its candidate's slot and slot 0 — exactly the fork's
  sequential bookkeeping, :711-722).
* the initial population is batch-evaluated and the best member is
  SWAPPED into slot 0 (``_calculate_population_energies``, :638-674).

Generations are a ``lax.scan``; scipy's host callback early-exit becomes
a ``done`` mask that freezes further updates (the caller's stop_fn is
evaluated on the slot-0 energy each generation, like the reference's
callback on ``self.x``).  Randomness comes from a JAX PRNG key instead
of the global numpy singleton — the only remaining (disclosed)
deviation; the sampling distributions are identical.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DEResult(NamedTuple):
    x: jax.Array          # best member (slot 0), real coordinates
    fun: jax.Array        # best energy
    population: jax.Array  # real coordinates
    energies: jax.Array
    nit: jax.Array


def sample_two_excluding(key: jax.Array, n: int, shape) -> tuple:
    """Ordered pair (r0, r1) drawn uniformly WITHOUT replacement from
    ``range(n)`` excluding the candidate index — vectorized equivalent of
    the reference's shuffle-and-take (_differential_evolution.py:887-897).

    ``shape`` must end with the candidate-count axis (cand = arange along
    the last axis, i.e. one row per population slot).
    """
    cand = jnp.arange(shape[-1])
    cand = jnp.broadcast_to(cand, shape)
    ka, kb = jax.random.split(key)
    # r0: uniform over the n-1 indices != candidate
    a = jax.random.randint(ka, shape, 0, n - 1)
    r0 = a + (a >= cand)
    # r1: uniform over the n-2 indices != {candidate, r0}
    b = jax.random.randint(kb, shape, 0, n - 2)
    e1 = jnp.minimum(cand, r0)
    e2 = jnp.maximum(cand, r0)
    r1 = b + (b >= e1)
    r1 = r1 + (r1 >= e2)
    return r0, r1


def de_generation_unit(
    pop: jax.Array,
    key: jax.Array,
    mutation: Tuple[float, float],
    recombination: float,
) -> jax.Array:
    """One generation's trial population in unit coordinates.

    pop: (..., P, n_params) unit-cube population with slot 0 = best.
    Returns trials of the same shape (mutation + binomial crossover +
    random re-init at bounds), per the fork's best1bin path.
    """
    p = pop.shape[-2]
    n_params = pop.shape[-1]
    kf, kr, kc, kp, ku = jax.random.split(key, 5)
    # dither: one F per generation per independent DE run (leading axes)
    f = jax.random.uniform(
        kf, pop.shape[:-2], minval=mutation[0], maxval=mutation[1]
    )[..., None, None]
    r0, r1 = sample_two_excluding(kr, p, pop.shape[:-1])
    x_r0 = jnp.take_along_axis(pop, r0[..., None], axis=-2)
    x_r1 = jnp.take_along_axis(pop, r1[..., None], axis=-2)
    best = pop[..., :1, :]
    mutant = best + f * (x_r0 - x_r1)
    if recombination < 1.0:
        cross = jax.random.uniform(kc, pop.shape) < recombination
        # the fill_point coordinate is always taken from the mutant
        forced = jax.nn.one_hot(
            jax.random.randint(kp, pop.shape[:-1], 0, n_params),
            n_params, dtype=bool,
        )
        trial = jnp.where(cross | forced, mutant, pop)
    else:
        trial = mutant
    # _ensure_constraint: out-of-bounds coordinates re-drawn uniformly
    oob = (trial < 0.0) | (trial > 1.0)
    return jnp.where(oob, jax.random.uniform(ku, trial.shape), trial)


def de_select_best0(pop, energy, trial, trial_energy, accept_mask=None):
    """Greedy selection + slot-0 best bookkeeping (fork :711-722).

    Each candidate keeps the better of (member, trial); slot 0 is then
    overwritten with the generation's overall best member, matching the
    sequential loop where any improving trial that beats the running best
    is copied into slot 0. Shapes: (..., P, n) / (..., P).
    """
    improved = trial_energy < energy
    if accept_mask is not None:
        improved = improved & accept_mask
    pop = jnp.where(improved[..., None], trial, pop)
    energy = jnp.where(improved, trial_energy, energy)
    bi = jnp.argmin(energy, axis=-1)[..., None]
    best_e = jnp.take_along_axis(energy, bi, axis=-1)
    best_x = jnp.take_along_axis(pop, bi[..., None], axis=-2)
    energy = energy.at[..., :1].set(best_e)
    pop = pop.at[..., :1, :].set(best_x)
    return pop, energy


def swap_best_to_slot0(pop, energy):
    """Initial-energies bookkeeping: SWAP the best member into slot 0
    (fork :668-674 — a swap, both members survive)."""
    bi = jnp.argmin(energy, axis=-1)[..., None]
    e0 = energy[..., :1]
    x0 = pop[..., :1, :]
    best_e = jnp.take_along_axis(energy, bi, axis=-1)
    best_x = jnp.take_along_axis(pop, bi[..., None], axis=-2)
    energy = energy.at[..., :1].set(best_e)
    pop = pop.at[..., :1, :].set(best_x)
    # scatter the old slot-0 entries to the best's former position
    energy = _scatter_energy(energy, bi, e0)
    pop = _scatter_member(pop, bi, x0)
    return pop, energy


def _scatter_energy(arr, idx, val):
    """arr[..., idx] = val for energy arrays (..., P), idx (..., 1)."""
    return jnp.where(idx == jnp.arange(arr.shape[-1]), val, arr)


def _scatter_member(arr, idx, val):
    """arr[..., idx, :] = val for member arrays (..., P, n), idx (..., 1)."""
    mask = idx[..., None] == jnp.arange(arr.shape[-2])[:, None]
    return jnp.where(mask, val, arr)


def differential_evolution(
    func: Callable[[jax.Array], jax.Array],
    bounds: Tuple[jax.Array, jax.Array],
    key: jax.Array,
    maxiter: int = 75,
    popsize: int = 15,
    mutation: Tuple[float, float] = (0.5, 1.0),
    recombination: float = 1.0,
    stop_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> DEResult:
    """Minimize ``func`` over a box (single DE run, best1bin).

    Args:
      func: batched objective — maps a population (P, n_params) in REAL
        coordinates to energies (P,) (the vendored DE's batched-func
        contract).
      bounds: (lo, hi) arrays of shape (n_params,).
      popsize: scipy semantics — population multiplier; total population
        is ``max(5, popsize * n_params)``.
      recombination: crossover rate CR (binomial).
      stop_fn: optional (best_energy,) -> bool early-stop predicate
        (replaces scipy's callback-based exit; evaluated on the slot-0
        best each generation, freezing further updates once true).

    Disclosed deviation: initialization is always uniform random,
    i.e. the vendored fork's ``init='random'`` mode. The fork's
    *default* is ``init='latinhypercube'``, which this module does not
    implement — the parity claim ("reference-fork-exact semantics")
    is scoped to ``init='random'``. The only in-repo caller (OnePixel,
    attacks/onepixel.py) passes ``init='random'`` in the reference
    too, so observable behavior matches everywhere it is used.
    """
    lo, hi = (jnp.asarray(b, jnp.float32) for b in bounds)
    n_params = lo.shape[0]
    pop_n = max(5, max(1, popsize) * n_params)

    def scale(u):
        return lo + u * (hi - lo)

    k_init, k_loop = jax.random.split(key)
    pop = jax.random.uniform(k_init, (pop_n, n_params))
    energy = func(scale(pop))
    pop, energy = swap_best_to_slot0(pop, energy)

    def generation(carry, k):
        pop, energy, done = carry
        trial = de_generation_unit(pop, k, mutation, recombination)
        trial_energy = func(scale(trial))
        new_pop, new_energy = de_select_best0(pop, energy, trial,
                                              trial_energy)
        pop = jnp.where(done, pop, new_pop)
        energy = jnp.where(done, energy, new_energy)
        if stop_fn is not None:
            done = done | stop_fn(energy[0])
        return (pop, energy, done), None

    keys = jax.random.split(k_loop, maxiter)
    (pop, energy, _), _ = jax.lax.scan(
        generation, (pop, energy, jnp.array(False)), keys
    )
    return DEResult(
        x=scale(pop[0]), fun=energy[0], population=scale(pop),
        energies=energy, nit=jnp.array(maxiter),
    )
