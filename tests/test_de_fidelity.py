"""Semantics tests for the reference-fork DE optimizer.

Pins the four behaviors the vendored scipy fork defines OnePixel by
(reference _differential_evolution.py): best1bin mutants anchored at the
slot-0 best, r0/r1 sampled without replacement excluding the candidate,
random re-init (not clipping) at bounds, and the slot-0 best
bookkeeping (swap on init, winning-trial copy during selection).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaa_tpu.attacks.differential_evolution import (
    de_generation_unit,
    de_select_best0,
    differential_evolution,
    sample_two_excluding,
    swap_best_to_slot0,
)


class TestSampleTwoExcluding:
    def test_distinct_and_excluding(self):
        n = 7
        shape = (500, n)
        r0, r1 = sample_two_excluding(jax.random.PRNGKey(0), n, shape)
        cand = np.broadcast_to(np.arange(n), shape)
        r0, r1 = np.asarray(r0), np.asarray(r1)
        assert ((r0 >= 0) & (r0 < n)).all() and ((r1 >= 0) & (r1 < n)).all()
        assert (r0 != cand).all(), "r0 must exclude the candidate"
        assert (r1 != cand).all(), "r1 must exclude the candidate"
        assert (r0 != r1).all(), "r0/r1 sampled without replacement"

    def test_uniform_coverage(self):
        # every admissible ordered pair should appear with ~equal freq
        n = 5
        r0, r1 = sample_two_excluding(
            jax.random.PRNGKey(1), n, (4000, n)
        )
        r0 = np.asarray(r0)[:, 2]  # fix candidate = 2
        r1 = np.asarray(r1)[:, 2]
        pairs, counts = np.unique(
            np.stack([r0, r1], 1), axis=0, return_counts=True
        )
        assert len(pairs) == (n - 1) * (n - 2)  # all ordered pairs occur
        freq = counts / counts.sum()
        np.testing.assert_allclose(freq, 1.0 / len(pairs), atol=0.02)


class TestGeneration:
    def test_best1_anchoring(self):
        # integer-coded 1-D population: every in-bounds trial must sit at
        # pop[0] + f * (integer) * step for ONE shared f — the best1bin
        # signature (rand1-style mutants would add a non-f integer term).
        step = 0.04
        vals = jnp.asarray([5.0, 1.0, 2.0, 3.0, 4.0, 0.0]) * step + 0.3
        pop = vals[:, None]  # (P, 1), slot 0 = "best"
        trial = de_generation_unit(
            pop, jax.random.PRNGKey(3), (0.5, 1.0), 1.0
        )
        d = (np.asarray(trial)[:, 0] - float(pop[0, 0])) / step
        nz = np.abs(d) > 1e-6
        assert nz.any()
        # recover f: the multiples are integers in [-5, 5]
        ok = False
        for k in range(1, 6):
            f = np.abs(d[nz]).min() / k
            if not (0.5 - 1e-6 <= f < 1.0):
                continue
            mult = d[nz] / f
            if np.allclose(mult, np.round(mult), atol=1e-4):
                ok = True
                break
        assert ok, f"trials not f-multiples from the best: {d}"

    def test_out_of_bounds_random_reinit(self):
        # force most mutants out of [0,1]: big spreads around a best at
        # the upper edge. Clipping would pile trials at exactly 1.0;
        # random re-init keeps them strictly inside.
        pop = jnp.asarray([[0.98], [0.0], [0.95], [0.02], [0.97]])
        hits_interior = 0
        for s in range(20):
            trial = np.asarray(
                de_generation_unit(
                    pop, jax.random.PRNGKey(s), (0.5, 1.0), 1.0
                )
            )
            assert (trial >= 0.0).all() and (trial <= 1.0).all()
            assert not np.isclose(trial, 1.0).any(), "clipping detected"
            assert not np.isclose(trial, 0.0).any()
            # re-drawn coords land anywhere in [0,1], incl. below 0.5
            hits_interior += int((trial < 0.45).sum())
        assert hits_interior > 5, "re-init should scatter uniformly"

    def test_dither_per_leading_axis(self):
        # independent DE runs (leading batch axis) draw independent F
        pop = jnp.tile(
            jnp.asarray([[0.5], [0.3], [0.7], [0.4], [0.6]]), (3, 1, 1)
        )
        trial = np.asarray(
            de_generation_unit(pop, jax.random.PRNGKey(9), (0.5, 1.0), 1.0)
        )
        # same integer-coded geometry per run, different f => the
        # nonzero offsets differ across the leading axis
        d = trial - 0.5
        spreads = [np.abs(d[i][np.abs(d[i]) > 1e-6]).min() for i in range(3)]
        assert len(set(np.round(spreads, 6))) > 1


class TestBookkeeping:
    def test_swap_best_to_slot0(self):
        pop = jnp.asarray([[10.0], [20.0], [30.0]])
        energy = jnp.asarray([3.0, 1.0, 2.0])
        pop2, e2 = swap_best_to_slot0(pop, energy)
        np.testing.assert_allclose(np.asarray(e2), [1.0, 3.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(pop2)[:, 0], [20.0, 10.0, 30.0]
        )

    def test_swap_noop_when_slot0_best(self):
        pop = jnp.asarray([[1.0], [2.0]])
        energy = jnp.asarray([0.5, 0.9])
        pop2, e2 = swap_best_to_slot0(pop, energy)
        np.testing.assert_allclose(np.asarray(pop2), np.asarray(pop))
        np.testing.assert_allclose(np.asarray(e2), np.asarray(energy))

    def test_swap_batched(self):
        pop = jnp.asarray(
            [[[1.0], [2.0], [3.0]], [[4.0], [5.0], [6.0]]]
        )
        energy = jnp.asarray([[2.0, 0.1, 3.0], [9.0, 8.0, 0.5]])
        pop2, e2 = swap_best_to_slot0(pop, energy)
        np.testing.assert_allclose(
            np.asarray(e2), [[0.1, 2.0, 3.0], [0.5, 8.0, 9.0]]
        )
        np.testing.assert_allclose(
            np.asarray(pop2)[..., 0], [[2.0, 1.0, 3.0], [6.0, 5.0, 4.0]]
        )

    def test_select_winning_trial_copies_to_slot0(self):
        # candidate 2's trial wins the generation: it must occupy BOTH
        # slot 2 and slot 0 (the fork's sequential bookkeeping)
        pop = jnp.asarray([[1.0], [2.0], [3.0]])
        energy = jnp.asarray([0.5, 0.9, 0.8])  # slot 0 = best
        trial = jnp.asarray([[7.0], [8.0], [9.0]])
        trial_energy = jnp.asarray([0.6, 0.95, 0.1])
        pop2, e2 = de_select_best0(pop, energy, trial, trial_energy)
        np.testing.assert_allclose(np.asarray(e2), [0.1, 0.9, 0.1])
        np.testing.assert_allclose(np.asarray(pop2)[:, 0], [9.0, 2.0, 9.0])

    def test_select_no_improvement_keeps_population(self):
        pop = jnp.asarray([[1.0], [2.0]])
        energy = jnp.asarray([0.1, 0.2])
        trial = jnp.asarray([[5.0], [6.0]])
        trial_energy = jnp.asarray([0.3, 0.4])
        pop2, e2 = de_select_best0(pop, energy, trial, trial_energy)
        np.testing.assert_allclose(np.asarray(pop2), np.asarray(pop))
        np.testing.assert_allclose(np.asarray(e2), np.asarray(energy))

    def test_select_respects_accept_mask(self):
        pop = jnp.asarray([[[1.0], [2.0]], [[1.0], [2.0]]])
        energy = jnp.asarray([[0.5, 0.9], [0.5, 0.9]])
        trial = jnp.asarray([[[7.0], [8.0]], [[7.0], [8.0]]])
        trial_energy = jnp.asarray([[0.1, 0.2], [0.1, 0.2]])
        mask = jnp.asarray([[True, True], [False, False]])  # run 1 frozen
        pop2, e2 = de_select_best0(pop, energy, trial, trial_energy, mask)
        np.testing.assert_allclose(np.asarray(e2)[1], [0.5, 0.9])
        np.testing.assert_allclose(np.asarray(pop2)[1, :, 0], [1.0, 2.0])
        assert float(e2[0, 0]) == pytest.approx(0.1)


class TestEndToEnd:
    def test_rosenbrock_like_converges(self):
        target = jnp.asarray([0.6, -0.2])

        def func(pop):
            return ((pop - target) ** 2).sum(axis=1)

        res = differential_evolution(
            func,
            (jnp.full((2,), -1.0), jnp.full((2,), 1.0)),
            jax.random.PRNGKey(4),
            maxiter=120,
            popsize=15,
        )
        np.testing.assert_allclose(
            np.asarray(res.x), np.asarray(target), atol=0.05
        )
        # the returned x IS slot 0 and fun its energy
        assert float(res.fun) == pytest.approx(
            float(func(res.population[:1])[0]), abs=1e-6
        )
        assert float(res.fun) == float(res.energies[0])
        assert float(res.energies.min()) == float(res.energies[0])

    def test_min_population_floor(self):
        # scipy: num_population_members = max(5, popsize * n_params)
        def func(pop):
            return (pop ** 2).sum(axis=1)

        res = differential_evolution(
            func, (jnp.full((1,), -1.0), jnp.full((1,), 1.0)),
            jax.random.PRNGKey(5), maxiter=3, popsize=1,
        )
        assert res.population.shape[0] == 5
