"""FAB projection correctness vs exact LP/QP solutions.

The closed-form projections must return the minimal-norm d with
t + d inside [0,1]^D and on the hyperplane w.x = b (when reachable).
We verify against scipy linprog (Linf/L1) and a KKT-free quadratic
solve via SLSQP (L2) on small random instances.
"""
import numpy as np
import pytest
from scipy.optimize import linprog, minimize

import jax.numpy as jnp

from adaa_tpu.attacks import fab_projections as fp

D = 16
B = 24


def _instances(rng):
    t = rng.random((B, D))
    w = rng.standard_normal((B, D))
    # hyperplane offsets near the points so projections are non-trivial
    b = (w * t).sum(1) + rng.standard_normal(B) * 0.3
    return (
        t.astype(np.float32),
        w.astype(np.float32),
        b.astype(np.float32),
    )


def _feasible(t, w, b):
    """Is the plane reachable inside the box?"""
    lo = np.minimum(w * 0.0 - w * t, w * (1 - t)).sum()  # min of w.(x-t)
    hi = np.maximum(-w * t, w * (1 - t)).sum()
    return lo <= b - (w * t).sum() <= hi


def _brute_linf(t, w, b):
    # min s  s.t.  w.d = b - w.t,  -s <= d_i <= s,  0 <= t+d <= 1
    c = np.zeros(D + 1)
    c[-1] = 1.0
    A_eq = np.concatenate([w, [0.0]])[None, :]
    b_eq = [b - w @ t]
    A_ub = []
    b_ub = []
    for i in range(D):
        row = np.zeros(D + 1)
        row[i], row[-1] = 1.0, -1.0
        A_ub.append(row.copy())
        b_ub.append(0.0)
        row = np.zeros(D + 1)
        row[i], row[-1] = -1.0, -1.0
        A_ub.append(row)
        b_ub.append(0.0)
    bounds = [(-t[i], 1 - t[i]) for i in range(D)] + [(0, None)]
    res = linprog(c, A_ub, b_ub, A_eq, b_eq, bounds=bounds, method="highs")
    return res


def _brute_l2(t, w, b):
    cons = [
        {"type": "eq", "fun": lambda d: w @ d - (b - w @ t)},
    ]
    bounds = [(-t[i], 1 - t[i]) for i in range(D)]
    res = minimize(
        lambda d: (d * d).sum(),
        np.zeros(D),
        constraints=cons,
        bounds=bounds,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    return res


class TestProjections:
    def test_linf_optimality(self, rng):
        t, w, b = _instances(rng)
        d = np.asarray(fp.projection_linf(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
        for i in range(B):
            x_new = t[i] + d[i]
            assert (x_new >= -1e-5).all() and (x_new <= 1 + 1e-5).all()
            if not _feasible(t[i], w[i], b[i]):
                continue
            res = _brute_linf(t[i].astype(np.float64), w[i].astype(np.float64),
                              float(b[i]))
            if not res.success:
                continue
            # on the plane and no worse than the LP optimum
            assert abs(w[i] @ x_new - b[i]) < 1e-3 * (1 + abs(b[i]))
            assert np.abs(d[i]).max() <= res.x[-1] + 1e-3

    def test_l2_optimality(self, rng):
        t, w, b = _instances(rng)
        d = np.asarray(fp.projection_l2(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
        for i in range(B):
            x_new = t[i] + d[i]
            assert (x_new >= -1e-4).all() and (x_new <= 1 + 1e-4).all()
            if not _feasible(t[i], w[i], b[i]):
                continue
            res = _brute_l2(t[i].astype(np.float64), w[i].astype(np.float64),
                            float(b[i]))
            if not res.success:
                continue
            assert abs(w[i] @ x_new - b[i]) < 1e-3 * (1 + abs(b[i]))
            assert np.sqrt((d[i] ** 2).sum()) <= np.sqrt(res.fun) + 1e-3

    def test_l1_feasibility(self, rng):
        t, w, b = _instances(rng)
        d = np.asarray(fp.projection_l1(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
        for i in range(B):
            x_new = t[i] + d[i]
            assert (x_new >= -1e-4).all() and (x_new <= 1 + 1e-4).all()
            if _feasible(t[i], w[i], b[i]):
                assert abs(w[i] @ x_new - b[i]) < 1e-2 * (1 + abs(b[i]))

    def test_linf_bisect_matches_sort(self, rng):
        # the bisection fast path must agree with the sort-based closed form
        for D2 in (16, 257, 4096):
            t = rng.random((B, D2)).astype(np.float32)
            w = rng.standard_normal((B, D2)).astype(np.float32)
            b = ((w * t).sum(1) + rng.standard_normal(B) * 0.3).astype(np.float32)
            # sprinkle exact zeros into w (silent samples produce zero grads)
            w[rng.random((B, D2)) < 0.05] = 0.0
            d_ref = np.asarray(fp.projection_linf(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            d_fast = np.asarray(fp.projection_linf_bisect(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            np.testing.assert_allclose(d_fast, d_ref, atol=3e-6, rtol=1e-4)

    def test_l2_bisect_matches_sort(self, rng):
        for D2 in (16, 257, 4096):
            t = rng.random((B, D2)).astype(np.float32)
            w = rng.standard_normal((B, D2)).astype(np.float32)
            b = ((w * t).sum(1) + rng.standard_normal(B) * 0.3).astype(np.float32)
            w[rng.random((B, D2)) < 0.05] = 0.0
            d_ref = np.asarray(fp.projection_l2(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            d_fast = np.asarray(fp.projection_l2_bisect(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            np.testing.assert_allclose(d_fast, d_ref, atol=5e-5, rtol=1e-3)

    def test_bisect_unreachable_saturates(self, rng):
        # plane far outside the box: both forms must return full saturation
        t = rng.random((8, 64)).astype(np.float32)
        w = rng.standard_normal((8, 64)).astype(np.float32)
        b = ((w * t).sum(1) + 1e4).astype(np.float32)
        for fast, ref in ((fp.projection_linf_bisect, fp.projection_linf),
                          (fp.projection_l2_bisect, fp.projection_l2)):
            d_ref = np.asarray(ref(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            d_fast = np.asarray(fast(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            np.testing.assert_allclose(d_fast, d_ref, atol=1e-5)

    def test_zero_when_on_plane(self, rng):
        t = rng.random((4, D)).astype(np.float32)
        w = rng.standard_normal((4, D)).astype(np.float32)
        b = (w * t).sum(1).astype(np.float32)  # already on the plane
        for proj in (fp.projection_linf, fp.projection_l2, fp.projection_l1):
            d = np.asarray(proj(jnp.asarray(t), jnp.asarray(w), jnp.asarray(b)))
            assert np.abs(d).max() < 1e-4


class TestPairForms:
    """The (S, B, D) pair forms FAB uses must match the single forms
    per slice — same hyperplane, two different points, shared w."""

    def test_linf_pair_matches_single(self, rng):
        t, w, b = _instances(rng)
        t_alt = rng.random((B, D)).astype(np.float32)
        t2 = jnp.stack([jnp.asarray(t), jnp.asarray(t_alt)], 0)
        b2 = jnp.stack([jnp.asarray(b)] * 2, 0)
        d_pair = np.asarray(
            fp.projection_linf_bisect_pair(t2, jnp.asarray(w), b2)
        )
        for s, ts in enumerate([t, t_alt]):
            d_single = np.asarray(fp.projection_linf(
                jnp.asarray(ts), jnp.asarray(w), jnp.asarray(b)))
            np.testing.assert_allclose(d_pair[s], d_single,
                                       atol=3e-6, rtol=1e-4)

    def test_l2_pair_matches_single(self, rng):
        t, w, b = _instances(rng)
        t_alt = rng.random((B, D)).astype(np.float32)
        t2 = jnp.stack([jnp.asarray(t), jnp.asarray(t_alt)], 0)
        b2 = jnp.stack([jnp.asarray(b)] * 2, 0)
        d_pair = np.asarray(
            fp.projection_l2_bisect_pair(t2, jnp.asarray(w), b2)
        )
        for s, ts in enumerate([t, t_alt]):
            d_single = np.asarray(fp.projection_l2(
                jnp.asarray(ts), jnp.asarray(w), jnp.asarray(b)))
            np.testing.assert_allclose(d_pair[s], d_single,
                                       atol=5e-5, rtol=1e-3)
