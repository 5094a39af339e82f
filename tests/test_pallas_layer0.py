"""Fused LCNN layer-0 kernel (ops/pallas_layer0.py) correctness.

Three layers of guarantees:
1. Kernel == exact pure-JAX replica of its own math (bit-level fwd) —
   catches indexing/layout bugs independent of numerics policy.
2. Kernel ~= XLA reference (conv+MFM+pool) within bf16 rounding; grads
   agree in norm (exact ties may route differently — both are valid
   subgradients, see module docstring).
3. Model wiring: LCNN with the fused first block produces the same
   logits as ADAA_FUSED_LCNN=0 with shared params, and the param tree
   is unchanged (checkpoint import compatibility).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.ops import pallas_layer0 as pk

INTERP = True  # CPU test runs use the pallas interpreter


def _data(rng, b=2):
    x = jnp.asarray(rng.standard_normal((b, 404, 80)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((5, 5, 1, 64)) * 0.2).astype(np.float32))
    bias = jnp.asarray(
        (rng.standard_normal(64) * 0.1).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((b, 202, 40, 32)).astype(np.float32))
    return x, w, bias, cot


def _replica_fwd(x, w, bias):
    """Pure-JAX replica of the kernel's exact computation."""
    b = x.shape[0]
    xe, xo = pk._planes(x)
    xe = xe.reshape(b, pk.ROWS_PAD, pk.LANES_IN)
    xo = xo.reshape(b, pk.ROWS_PAD, pk.LANES_IN)
    wmat, brow = pk._pack_weights(w, bias)
    outs = []
    for b5 in range(pk.NBLK):
        accs = []
        for pt in (0, 1):
            cols = []
            for dt in range(pk.K):
                parity, shift = pk._src_for(pt, dt)
                src = xe if parity == 0 else xo
                rolled = jnp.roll(src, -shift, axis=1).astype(jnp.bfloat16)
                cols.append(
                    rolled[:, :, pk.FBLK * b5 : pk.FBLK * b5 + pk.SPAN])
            X = jnp.concatenate(cols, axis=-1)  # (B, 208, 120)
            acc = jnp.einsum(
                "brk,kn->brn", X, wmat,
                preferred_element_type=jnp.float32) + brow
            accs.append(acc)
        m = jnp.maximum(accs[0], accs[1])
        q = pk.QL
        mm = jnp.maximum(
            jnp.maximum(m[..., 0:q], m[..., q : 2 * q]),
            jnp.maximum(m[..., 2 * q : 3 * q], m[..., 3 * q : 4 * q]),
        )  # (B, 208, 256) in (fop, chp) lane order
        outs.append(mm[:, : pk.T_OUT].reshape(-1, pk.T_OUT, 8, 32))
    return jnp.concatenate(outs, axis=2)  # (B, 202, 40, 32)


class TestKernelVsReplica:
    def test_forward_exact(self, rng):
        x, w, bias, _ = _data(rng)
        ref = _replica_fwd(x, w, bias)
        out = pk.fused_conv0_mfm_pool(x, w, bias, INTERP)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def test_forward_exact_odd_batch(self, rng):
        x, w, bias, _ = _data(rng, b=3)  # exercises R=1 path
        ref = _replica_fwd(x, w, bias)
        out = pk.fused_conv0_mfm_pool(x, w, bias, INTERP)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def test_grad_matches_replica(self, rng):
        x, w, bias, cot = _data(rng)
        g_rep = jax.grad(
            lambda x: (_replica_fwd(x, w, bias) * cot).sum())(x)
        g_fus = jax.grad(
            lambda x: (pk.fused_conv0_mfm_pool(x, w, bias, INTERP)
                       .astype(jnp.float32) * cot).sum())(x)
        # exact bf16 ties may route differently; compare in norm
        num = float(jnp.linalg.norm(g_rep - g_fus))
        den = float(jnp.linalg.norm(g_rep))
        assert num / den < 0.02, (num, den)


class TestKernelVsXLAReference:
    def test_forward_close(self, rng):
        x, w, bias, _ = _data(rng)
        ref = pk._reference_xla(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            bias.astype(jnp.bfloat16)).astype(jnp.float32)
        out = pk.fused_conv0_mfm_pool(x, w, bias, INTERP)
        scale = float(jnp.abs(ref).max())
        assert float(jnp.abs(ref - out).max()) < 0.02 * scale

    def test_dw_matches_reference(self, rng):
        x, w, bias, cot = _data(rng)
        gw_ref = jax.grad(lambda w_: (pk._reference_xla(
            x.astype(jnp.bfloat16), w_.astype(jnp.bfloat16),
            bias.astype(jnp.bfloat16)).astype(jnp.float32) * cot).sum())(w)
        gw_fus = jax.grad(lambda w_: (pk.fused_conv0_mfm_pool(
            x, w_, bias, INTERP).astype(jnp.float32) * cot).sum())(w)
        np.testing.assert_allclose(
            np.asarray(gw_fus), np.asarray(gw_ref), atol=1e-3, rtol=1e-2)


class TestModelWiring:
    def test_fused_matches_xla_path(self, rng, monkeypatch):
        from adaa_tpu import models

        x = jnp.asarray(
            rng.standard_normal((2, 64600)).astype(np.float32))
        cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
               "compute_dtype": "bfloat16"}
        m = models.get_model("lcnn", cfg)
        monkeypatch.delenv("ADAA_FUSED_LCNN", raising=False)
        v = models.init_model(m, jax.random.PRNGKey(0), wave_length=64600)
        z_fused = np.asarray(m.apply(v, x))
        monkeypatch.setenv("ADAA_FUSED_LCNN", "0")
        z_xla = np.asarray(m.apply(v, x))
        np.testing.assert_allclose(z_fused, z_xla, atol=2e-3)

    def test_param_tree_unchanged(self, rng, monkeypatch):
        from adaa_tpu import models

        cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
               "compute_dtype": "bfloat16"}
        m = models.get_model("lcnn", cfg)
        monkeypatch.delenv("ADAA_FUSED_LCNN", raising=False)
        v_fused = models.init_model(m, jax.random.PRNGKey(0),
                                    wave_length=64600)
        monkeypatch.setenv("ADAA_FUSED_LCNN", "0")
        v_xla = models.init_model(m, jax.random.PRNGKey(0),
                                  wave_length=64600)
        t1 = jax.tree_util.tree_structure(v_fused)
        t2 = jax.tree_util.tree_structure(v_xla)
        assert t1 == t2
        k1 = v_fused["params"]["conv0"]["kernel"]
        k2 = v_xla["params"]["conv0"]["kernel"]
        assert k1.shape == k2.shape == (5, 5, 1, 64)
