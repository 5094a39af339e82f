"""ops/sinc_conv closed-form VJP vs XLA autodiff.

RawNet3's sinc encoder differentiates through a stride-10 k=251 conv
on every attack step; the automatic input-grad is the transposed-conv
TPU pathology so the backward is closed form (ops/sinc_conv.py).
These tests pin exactness of both cotangents against lax.conv
autodiff on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.ops.sinc_conv import sinc_conv


def _ref(x, w, stride):
    out = jax.lax.conv_general_dilated(
        x[:, None, :], w[:, None, :], (stride,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.swapaxes(out, 1, 2)


@pytest.mark.parametrize("stride,k,l", [(10, 251, 2000), (7, 33, 500),
                                        (16, 16, 512)])
def test_sinc_conv_matches_autodiff(rng, stride, k, l):
    x = jnp.asarray(rng.standard_normal((3, l)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((6, k)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(sinc_conv(x, w, stride)),
        np.asarray(_ref(x, w, stride)), atol=1e-5, rtol=1e-5)

    def loss(f):
        return lambda x, w: jnp.sum(jnp.sin(f(x, w)))

    g1x, g1w = jax.grad(loss(lambda x, w: sinc_conv(x, w, stride)),
                        (0, 1))(x, w)
    g2x, g2w = jax.grad(loss(lambda x, w: _ref(x, w, stride)),
                        (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1w), np.asarray(g2w),
                               atol=1e-4, rtol=1e-4)


def test_sinc_conv_need_dw_false_poisons_dw_only(rng):
    """Eval-path contract: dx stays exact, dW is NaN (fails loudly)."""
    x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 251)).astype(np.float32))
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(sinc_conv(x, w, 10, need_dw=False))),
        (0, 1))(x, w)
    rx = jax.grad(
        lambda x: jnp.sum(jnp.sin(_ref(x, w, 10))))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    assert bool(jnp.isnan(gw).all())


def test_sinc_conv_bf16_dx_close_to_f32(rng):
    """bf16 fast path: the (B,T,K) frame buffer is stored bf16 with an
    f32 overlap-add accumulator; dx must stay within bf16 rounding of
    the f32 closed form (the caller downgrades bf16->f32 on CPU, so
    exercise the cached bf16 builder directly)."""
    from adaa_tpu.ops.sinc_conv import _sinc_conv_fn

    x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((8, 251)) * 0.1).astype(np.float32))

    fn = _sinc_conv_fn(10, False, "bf16")
    gx = jax.grad(lambda x: jnp.sum(jnp.sin(fn(x, w))))(x)
    rx = jax.grad(lambda x: jnp.sum(jnp.sin(_ref(x, w, 10))))(x)
    gx, rx = np.asarray(gx), np.asarray(rx)
    assert gx.dtype == np.float32
    # bf16 has ~3 decimal digits; scale tolerance by the grad magnitude
    scale = np.abs(rx).max()
    np.testing.assert_allclose(gx, rx, atol=0.02 * scale, rtol=0.02)


def test_sinc_conv_chunked_form_matches_conv_form(rng):
    """The chunked forward (bf16 fast-path default on TPU) must equal
    the strided form — exercised in f32 on CPU via the factory, over
    shapes where K/stride divide unevenly and L is not stride-aligned.
    """
    from adaa_tpu.ops.sinc_conv import _sinc_conv_fn

    for l, k, s in ((1000, 251, 10), (997, 251, 10), (512, 64, 16),
                    (700, 90, 7)):
        x = jnp.asarray(rng.standard_normal((2, l)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((8, k)) * 0.1).astype(np.float32))
        ref_fn = _sinc_conv_fn(s, False, "f32", "conv")
        chk_fn = _sinc_conv_fn(s, False, "f32", "chunked")
        ref = ref_fn(x, w)
        got = chk_fn(x, w)
        assert got.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5 * scale)
        # shared closed-form bwd still sees the right residuals
        g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(ref_fn(x, w))))(x)
        g_got = jax.grad(lambda x: jnp.sum(jnp.sin(chk_fn(x, w))))(x)
        gscale = float(jnp.max(jnp.abs(g_ref)))
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=3e-5 * gscale)
