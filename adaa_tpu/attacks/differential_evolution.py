"""General batched differential evolution on device.

The reference vendors a modified scipy DE whose single change is
passing the whole population to the objective for batched NN
evaluation (reference:
adversarial_attacks/torchattacks/attacks/_differential_evolution.py:1-10).
This is the TPU-native counterpart: a synchronous rand/1/bin optimizer
where generations are a ``lax.scan``, the population is a batch
dimension of the (vectorized) objective, and convergence/early-stop
callbacks become masks. Used by attacks.onepixel; exposed standalone
for parity with the vendored module.

Documented deviations from scipy semantics (same as attacks.onepixel):
synchronous selection instead of steady-state, boundary clipping
instead of random reinit, independent r0/r1/r2 draws.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DEResult(NamedTuple):
    x: jax.Array          # best member, (n_params,) or (batch, n_params)
    fun: jax.Array        # best energy
    population: jax.Array
    energies: jax.Array
    nit: jax.Array


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
    """Minimize ``func`` over a box.

    Args:
      func: batched objective — maps a population (P, n_params) to
        energies (P,) (the vendored DE's "batched func" contract).
      bounds: (lo, hi) arrays of shape (n_params,).
      popsize: scipy semantics — population multiplier; total population
        is ``popsize * n_params``.
      recombination: crossover rate CR (binomial).
      stop_fn: optional (best_energy,) -> bool early-stop predicate
        (replaces scipy's callback-based convergence exit; evaluated
        each generation, freezing further updates once true).
    """
    lo, hi = (jnp.asarray(b, jnp.float32) for b in bounds)
    n_params = lo.shape[0]
    pop_n = max(1, popsize) * n_params

    k_init, k_loop = jax.random.split(key)
    pop = jax.random.uniform(k_init, (pop_n, n_params)) * (hi - lo) + lo
    energy = func(pop)

    def generation(carry, k):
        pop, energy, done = carry
        kf, kr, kc = jax.random.split(k, 3)
        f = jax.random.uniform(
            kf, (), minval=mutation[0], maxval=mutation[1]
        )
        idx = jax.random.randint(kr, (3, pop_n), 0, pop_n)
        r0, r1, r2 = pop[idx[0]], pop[idx[1]], pop[idx[2]]
        mutant = jnp.clip(r0 + f * (r1 - r2), lo, hi)
        if recombination < 1.0:
            cross = jax.random.uniform(kc, (pop_n, n_params)) < recombination
            # ensure at least one mutant coordinate (scipy guarantee)
            forced = jax.nn.one_hot(
                jax.random.randint(kc, (pop_n,), 0, n_params), n_params,
                dtype=bool,
            )
            cross = cross | forced
            trial = jnp.where(cross, mutant, pop)
        else:
            trial = mutant
        trial_energy = func(trial)
        improved = (trial_energy < energy) & ~done
        pop = jnp.where(improved[:, None], trial, pop)
        energy = jnp.where(improved, trial_energy, energy)
        if stop_fn is not None:
            done = done | stop_fn(energy.min())
        return (pop, energy, done), None

    keys = jax.random.split(k_loop, maxiter)
    (pop, energy, _), _ = jax.lax.scan(
        generation, (pop, energy, jnp.array(False)), keys
    )
    best = jnp.argmin(energy)
    return DEResult(
        x=pop[best], fun=energy[best], population=pop, energies=energy,
        nit=jnp.array(maxiter),
    )
