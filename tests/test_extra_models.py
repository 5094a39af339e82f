"""Smoke tests for the unwired reference architectures
(RawNet2 / Meso4 / MesoInception4 / Xception)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.models.extra import get_extra_model


def _run(module, x, key=0):
    variables = module.init({"params": jax.random.PRNGKey(key)}, x, train=False)
    out = module.apply(variables, x, train=False)
    return out


def test_meso4_forward(rng):
    # (B, 4, 80, 404) feature "image" like the reference __main__
    x = jnp.asarray(rng.standard_normal((2, 4, 80, 404)).astype(np.float32))
    # fc1_dim for 80x404 input: 16 * (80//32) * (404//32) = 16*2*12
    module = get_extra_model("meso4", {"input_channels": 4,
                                       "fc1_dim": 16 * 2 * 12})
    out = _run(module, x)
    assert out.shape == (2, 1)


def test_meso_inception4_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 80, 404)).astype(np.float32))
    module = get_extra_model("meso_inception4", {"input_channels": 4})
    # fc1_dim in the flax version is implied by Dense input — check run
    out = _run(module, x)
    assert out.shape == (2, 1)


@pytest.mark.slow
def test_rawnet2_forward(rng):
    x = jnp.asarray((rng.standard_normal((2, 16000)) * 0.1).astype(np.float32))
    module = get_extra_model("rawnet2", {})
    out = _run(module, x)
    assert out.shape == (2, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_xception_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 80, 404)).astype(np.float32))
    module = get_extra_model("xception", {"input_channels": 4})
    out = _run(module, x)
    assert out.shape == (2, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
