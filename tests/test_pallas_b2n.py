"""Fused Bottle2neck kernel vs the flax module (interpret mode on CPU).

Checks forward and dx-backward equivalence of ops/pallas_b2n.py against
the eval-mode flax Bottle2neck for both block shapes RawNet3 uses
(projection residual + pool, and identity residual), including the
array-edge zero-padding semantics and multi-tile halos.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaa_tpu.models.rawnet3 import Bottle2neck
from adaa_tpu.ops.pallas_b2n import TT

bf = jnp.bfloat16


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)


def _mk_block(inplanes, dilation, pool, t, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    mod = Bottle2neck(
        inplanes, 1024, kernel_size=3, dilation=dilation, scale=8,
        pool=pool, compute_dtype=bf,
    )
    x = jnp.asarray(
        rng.standard_normal((batch, t, inplanes)).astype(np.float32) * 0.3
    ).astype(bf)
    var = mod.init(jax.random.PRNGKey(1), x)
    # de-trivialize the folded BN affines (fresh init is scale-1/zero-mean)
    bs = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.02, 0.3, a.shape).astype(np.float32)),
        var["batch_stats"],
    )
    var = {"params": var["params"], "batch_stats": bs}
    return mod, var, x


def _apply(mod, var, x, fused: bool):
    env = {"ADAA_FUSED_B2N": "1" if fused else "0"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return mod.apply(var, x, train=False)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


CASES = [
    # (inplanes, dilation, pool, T): projection residual, 2 uneven tiles
    (256, 2, 5, TT + 200),
    # identity residual, no pool, single partial tile
    (1024, 4, 0, 360),
    # identity residual + pool 3, exact multi-tile
    (1024, 3, 3, 2 * TT),
]


@pytest.mark.parametrize("inplanes,dilation,pool,t", CASES)
def test_forward_matches_flax(inplanes, dilation, pool, t):
    mod, var, x = _mk_block(inplanes, dilation, pool, t)
    ref = _apply(mod, var, x, fused=False)
    out = _apply(mod, var, x, fused=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    err = _rel_err(out, ref)
    assert err < 0.02, f"forward rel err {err}"


@pytest.mark.parametrize("inplanes,dilation,pool,t", CASES)
def test_grad_matches_flax(inplanes, dilation, pool, t):
    mod, var, x = _mk_block(inplanes, dilation, pool, t, seed=3)
    rng = np.random.default_rng(9)
    out_shape = _apply(mod, var, x, fused=False).shape
    w = jnp.asarray(rng.standard_normal(out_shape).astype(np.float32))

    def loss(xx, fused):
        out = _apply(mod, var, xx, fused=fused).astype(jnp.float32)
        return (out * w).sum()

    # note: env is read at trace time, so trace the two paths separately
    g_ref = jax.grad(lambda xx: loss(xx, False))(x)
    g_out = jax.grad(lambda xx: loss(xx, True))(x)
    err = _rel_err(g_out, g_ref)
    assert err < 0.05, f"grad rel err {err}"


def test_grad_param_cotangents_poisoned():
    # eval/attack contract: differentiating the fused path w.r.t. params
    # must fail loudly (NaN), never silently return zeros
    mod, var, x = _mk_block(256, 2, 5, 480, batch=1, seed=5)

    def loss(params):
        v = {"params": params, "batch_stats": var["batch_stats"]}
        return _apply(mod, v, x, fused=True).astype(jnp.float32).sum()

    grads = jax.grad(loss)(var["params"])
    leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in grads.items() if k != "afms"}
    )
    assert any(bool(jnp.isnan(leaf).any()) for leaf in leaves)


def test_edge_zero_padding_semantics():
    # the first/last rows see the convs' zero padding, not halo garbage:
    # compare a short single-tile input against the same input embedded
    # in zeros (the true conv output differs there, so instead check
    # the flax oracle directly at the edges)
    mod, var, x = _mk_block(256, 2, 0, 480, batch=1, seed=7)
    ref = np.asarray(_apply(mod, var, x, fused=False), np.float32)
    out = np.asarray(_apply(mod, var, x, fused=True), np.float32)
    for rows in (slice(0, 30), slice(-30, None)):
        err = np.abs(out[:, rows] - ref[:, rows]).mean() / (
            np.abs(ref[:, rows]).mean() + 1e-9
        )
        assert err < 0.02, f"edge rows {rows} rel err {err}"
