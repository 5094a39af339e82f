"""Fused Pallas LFCC kernel vs XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.ops import frontends
from adaa_tpu.ops.pallas_lfcc import lfcc_pallas


@pytest.mark.slow
def test_pallas_lfcc_matches_xla(rng):
    x = jnp.asarray((rng.standard_normal((2, 64600)) * 0.1).astype(np.float32))
    ref = frontends.lfcc(x)
    out = lfcc_pallas(x, interpret=True)
    assert out.shape == ref.shape == (2, 80, 404)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


@pytest.mark.slow
def test_pallas_grad_wrapper(monkeypatch, rng):
    """ADAA_PALLAS_FRONTEND path: value from Pallas, grad via XLA."""
    monkeypatch.setenv("ADAA_PALLAS_FRONTEND", "1")
    # interpret mode on CPU: patch the pallas forward to interpret
    import adaa_tpu.ops.pallas_lfcc as pk

    orig = pk.lfcc_pallas
    monkeypatch.setattr(
        pk, "lfcc_pallas", lambda x, interpret=False: orig(x, interpret=True)
    )
    x = jnp.asarray((rng.standard_normal((1, 64600)) * 0.1).astype(np.float32))
    val = frontends.lfcc(x)
    ref = frontends._lfcc_xla(x)
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)
    g = jax.grad(lambda w: frontends.lfcc(w).sum())(x)
    g_ref = jax.grad(lambda w: frontends._lfcc_xla(w).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
