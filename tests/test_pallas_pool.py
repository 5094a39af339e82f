"""Pallas 1D max-pool kernel (ops/pallas_pool.py) correctness.

Forward must equal the XLA reshape-max bit-for-bit (same values, only
the layout strategy differs). Backward routes ties first-match (torch
MaxPool1d semantics) while the reshape-max autodiff splits ties evenly
— on tie-free data (random floats) the two gradients are identical;
with manufactured ties both must remain valid subgradients (sum of
routed mass equals the incoming cotangent).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.models import layers
from adaa_tpu.ops import pallas_pool

INTERP = True  # CPU test runs use the pallas interpreter


@pytest.mark.parametrize("window,shape", [(5, (2, 40, 128)),
                                          (3, (4, 36, 256))])
def test_forward_matches_reshape_max(rng, window, shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = layers.max_pool_1d(x, window)
    out = pallas_pool.max_pool_1d(x, window, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_backward_matches_on_tie_free_data(rng):
    # random bf16 data WILL tie inside 5-wide windows (8 mantissa bits
    # quantize ~10k samples onto a few hundred values) and tie routing
    # legitimately differs — use distinct f32-exact values instead
    n = 2 * 40 * 128
    x = jnp.asarray(
        rng.permutation(n).astype(np.float32).reshape(2, 40, 128))

    def loss_pallas(xx):
        return jnp.sum(
            pallas_pool.max_pool_1d(xx, 5, interpret=INTERP)
            .astype(jnp.float32) ** 2)

    def loss_ref(xx):
        return jnp.sum(
            layers.max_pool_1d(xx, 5).astype(jnp.float32) ** 2)

    gp = np.asarray(jax.grad(loss_pallas)(x).astype(jnp.float32))
    gr = np.asarray(jax.grad(loss_ref)(x).astype(jnp.float32))
    np.testing.assert_array_equal(gp, gr)


def test_backward_tie_mass_conserved():
    # every window slot identical -> first-match must route ALL the
    # cotangent to slot 0 and conserve the total mass
    x = jnp.ones((2, 40, 128), jnp.bfloat16)
    g = jax.grad(lambda xx: jnp.sum(
        pallas_pool.max_pool_1d(xx, 5, interpret=INTERP)
        .astype(jnp.float32)))(x)
    g = np.asarray(g.astype(jnp.float32)).reshape(2, 8, 5, 128)
    np.testing.assert_array_equal(g[:, :, 0], np.ones((2, 8, 128)))
    np.testing.assert_array_equal(g[:, :, 1:], np.zeros((2, 8, 4, 128)))


def test_supported_gates():
    assert pallas_pool.supported(
        jnp.zeros((2, 40, 128), jnp.bfloat16), 5)
    assert not pallas_pool.supported(  # f32 parity path stays XLA
        jnp.zeros((2, 40, 128), jnp.float32), 5)
    assert not pallas_pool.supported(  # lane-misaligned channels
        jnp.zeros((2, 40, 96), jnp.bfloat16), 5)
    assert not pallas_pool.supported(  # row count not 16-tileable
        jnp.zeros((2, 35, 128), jnp.bfloat16), 5)


# ---------------------------------------------------------------------------
# eqmask backward (models/layers._max_pool_1d_eqmask, round 5)
# ---------------------------------------------------------------------------

def test_eqmask_pool_forward_and_backward_match_default(monkeypatch):
    """The eqmask pool (default) == tie-splitting jnp.max pool on
    tie-free data: same forward, same input cotangent; remainder
    truncation (L % window != 0) zero-pads the tail gradient."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 17, 8)).astype(np.float32))

    def loss(xx):
        return (layers.max_pool_1d(xx, 5).astype(jnp.float32) ** 2).sum()

    monkeypatch.setenv("ADAA_POOL_EQMASK", "0")
    ref_y = layers.max_pool_1d(x, 5)
    ref_g = jax.grad(loss)(x)
    monkeypatch.delenv("ADAA_POOL_EQMASK")
    got_y = layers.max_pool_1d(x, 5)
    got_g = jax.grad(loss)(x)
    assert jnp.array_equal(got_y, ref_y)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-6, atol=1e-6)
    assert np.asarray(got_g)[:, 15:, :].max() == 0.0  # truncated tail


def test_eqmask_pool_tie_routing_documented():
    """On an exact tie the eqmask backward routes the FULL cotangent to
    every tied element (no normalization) — the documented deviation
    from jnp.max's even split (torch routes to a single argmax)."""
    from adaa_tpu.models.layers import _max_pool_1d_eqmask

    x = jnp.zeros((1, 4, 1), jnp.float32)  # all tied inside the window
    g = jax.grad(lambda a: _max_pool_1d_eqmask(a, 4).sum())(x)
    np.testing.assert_array_equal(np.asarray(g).ravel(), [1, 1, 1, 1])
