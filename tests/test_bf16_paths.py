"""CPU exercise of the backend-gated bf16 fast-path branches.

The bf16 frontend/encoder stores (adaa_tpu/ops/stft.py,
ops/frontends.py, ops/sinc_conv.py, models/rawnet3.py) are gated on
``jax.default_backend() != "cpu"`` so the CPU test suite normally runs
their f32 fallbacks. These tests monkeypatch the backend check so the
actual bf16 branch traces and executes on CPU — catching dtype/shape
breakage in the TPU-only paths without a TPU (numerics are compared at
bf16-appropriate tolerances; exact parity of the fast modes is a
measured quantity, BENCH_EFFECTIVENESS.json).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaa_tpu import models


@pytest.fixture
def pretend_tpu(monkeypatch):
    # flip every backend gate to its non-cpu branch; Pallas interpret
    # gates in models/lcnn.py read the real backend via this same
    # function, so force interpret mode explicitly there instead
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("ADAA_FUSED_LCNN", "0")  # Pallas needs real TPU
    monkeypatch.setenv("ADAA_BF16_FRONTEND", "1")


def _logits(model_name, cfg, wave):
    module = models.get_model(model_name, cfg)
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=wave.shape[1]
    )
    return np.asarray(module.apply(variables, wave)).squeeze(-1)


def test_rawnet3_bf16_tail_matches_f32(pretend_tpu):
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((2, 16_000)).astype(np.float32))
    z_fast = _logits("rawnet3", {"compute_dtype": "bfloat16"}, wave)
    z_ref = _logits("rawnet3", {}, wave)
    assert np.all(np.isfinite(z_fast))
    # bf16 trunk + bf16 encoder tail vs full f32: same scale + sign
    np.testing.assert_allclose(z_fast, z_ref, rtol=0.15, atol=0.05)


# NOTE: the LCNN bf16 frontend (ops/stft.py bf16 DFT stores) cannot be
# exercised this way: XLA:CPU's DotThunk rejects bf16 x bf16 -> f32
# dots outright ("Unsupported element type"), so that branch is
# executable only on real accelerator backends — it is covered by the
# TPU benchmark sweep (BENCH_EFFECTIVENESS.json) instead.


def test_host_split_bit_identical():
    # utils/keys.host_split must reproduce jax.random.split exactly —
    # the production loops' key sequences are pinned by tests and the
    # CPU-backend split is how they avoid per-batch device programs
    from adaa_tpu.utils.keys import host_split

    key = jax.random.PRNGKey(1234)
    ref = np.asarray(jax.random.split(key, 3))
    got = host_split(key, 3)
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)
    # threading: second-generation keys from the host copies also match
    ref2 = np.asarray(jax.random.split(ref[0]))
    got2 = host_split(got[0])
    np.testing.assert_array_equal(got2, ref2)
