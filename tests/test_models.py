"""Model forward-shape + determinism tests.

Mirrors the reference's __main__ smoke blocks (src/models/lcnn.py:246-263,
specrnet.py:217-258, rawnet3.py:294-322) as a real pytest suite; logit
parity against torch oracles lives in test_torch_parity.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu import models

B = 2
SHORT_WAVE = 16_000  # short waves keep CPU tests fast


def _wave(rng, length=SHORT_WAVE):
    return jnp.asarray((rng.standard_normal((B, length)) * 0.05).astype(np.float32))


@pytest.mark.parametrize(
    "name,params",
    [
        ("lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}),
        ("lcnn", {"input_channels": 2, "frontend_algorithm": ["mel_spec"]}),
        ("specrnet", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}),
    ],
)
def test_forward_shape_wave_input(rng, name, params):
    module = models.get_model(name, params)
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    out = module.apply(variables, _wave(rng), train=False)
    assert out.shape == (B, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lcnn_feature_input(rng):
    module = models.get_model("lcnn", {"input_channels": 1})
    feat = jnp.asarray(rng.standard_normal((B, 1, 80, 404)).astype(np.float32))
    variables = module.init({"params": jax.random.PRNGKey(0)}, feat, train=False)
    out = module.apply(variables, feat, train=False)
    assert out.shape == (B, 1)


def test_specrnet_feature_input(rng):
    module = models.get_model("specrnet", {"input_channels": 1})
    feat = jnp.asarray(rng.standard_normal((B, 1, 80, 404)).astype(np.float32))
    variables = module.init({"params": jax.random.PRNGKey(0)}, feat, train=False)
    out = module.apply(variables, feat, train=False)
    assert out.shape == (B, 1)


@pytest.mark.slow
def test_rawnet3_forward_shape(rng):
    module = models.get_model("rawnet3", {})
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    out = module.apply(variables, _wave(rng), train=False)
    assert out.shape == (B, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_train_mode_updates_batch_stats(rng):
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    out, mutated = module.apply(
        variables,
        _wave(rng),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (B, 1)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )
    assert changed, "train=True must update running stats"


def test_eval_mode_is_deterministic(rng):
    module = models.get_model(
        "specrnet", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    x = _wave(rng)
    a = module.apply(variables, x, train=False)
    b = module.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradient_wrt_input_flows(rng):
    """Attacks need d(logit)/d(wave) through frontend + model."""
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    x = _wave(rng)
    g = jax.grad(lambda w: module.apply(variables, w, train=False).sum())(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))
    assert bool(jnp.all(jnp.isfinite(g)))


class TestModelGoldens:
    """Pinned CPU-f32 logits at fixed init/inputs: regression guard on
    model numerics (init + forward) across refactors."""

    @pytest.mark.slow
    def test_logits_match_golden(self):
        import pathlib

        g = np.load(pathlib.Path(__file__).parent / "golden" /
                    "model_logits_golden.npz")
        wave = jnp.asarray(g["wave"])
        for name, params in (
            ("lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}),
            ("specrnet", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}),
            ("rawnet3", {}),
        ):
            module = models.get_model(name, params)
            variables = models.init_model(
                module, jax.random.PRNGKey(777), wave_length=16000
            )
            out = np.asarray(module.apply(variables, wave, train=False))
            np.testing.assert_allclose(out, g[name], atol=1e-4, rtol=1e-4,
                                       err_msg=name)


def test_eval_bn_folding_matches_unfolded(rng, monkeypatch):
    """bf16 eval trunk: BN-folded convs == explicit BN path.

    The folded path multiplies each BatchNorm's (s, t) into the
    preceding conv (exact up to bf16 rounding; see models/lcnn.py).
    Randomized running stats make the fold non-trivial.
    """
    module = models.get_model(
        "lcnn",
        {"input_channels": 1, "frontend_algorithm": ["lfcc"],
         "compute_dtype": "bfloat16"},
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(rng.standard_normal(a.shape)).astype(np.float32) + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {**variables, "batch_stats": stats}
    x = _wave(rng)

    monkeypatch.setenv("ADAA_FOLD_BN", "0")
    ref = np.asarray(module.apply(variables, x, train=False))
    monkeypatch.delenv("ADAA_FOLD_BN")
    got = np.asarray(module.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert not np.allclose(got, 0.0)


def test_rawnet3_fold_scan_matches_unrolled(rng, monkeypatch):
    """bf16 eval RawNet3: opt-in folded-BN scan trunk == default path.

    The ADAA_RAWNET_SCAN=1 variant runs each Bottle2neck's seven scale
    convs as one lax.scan over stacked weights with BatchNorms folded
    to affines (models/rawnet3.py Bottle2neck._fast_eval — kept as a
    documented negative result); same param tree, same math up to bf16
    rounding. Randomized running stats + BN affines make the fold
    non-trivial.
    """
    module = models.get_model("rawnet3", {"compute_dtype": "bfloat16"})
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=SHORT_WAVE
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(rng.standard_normal(a.shape)).astype(np.float32) + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {**variables, "batch_stats": stats}
    x = _wave(rng)

    ref = np.asarray(module.apply(variables, x, train=False))
    monkeypatch.setenv("ADAA_RAWNET_SCAN", "1")
    got = np.asarray(module.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert not np.allclose(got, 0.0)
    # both paths create the same tree (checkpoint compatibility)
    v2 = models.init_model(module, jax.random.PRNGKey(0),
                           wave_length=SHORT_WAVE)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(dict(variables)))


def test_mfm_pool_2d_matches_composition(rng):
    """Fused mfm_pool_2d == max_pool_2d(max_feature_map(x)), values and
    (away from exact ties) gradients."""
    from adaa_tpu.models import layers

    x = jnp.asarray(rng.standard_normal((3, 10, 6, 8)).astype(np.float32))

    ref = layers.max_pool_2d(layers.max_feature_map(x))
    got = layers.mfm_pool_2d(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # odd spatial dims exercise the floor-mode truncation
    x_odd = x[:, :9, :5]
    np.testing.assert_array_equal(
        np.asarray(layers.mfm_pool_2d(x_odd)),
        np.asarray(layers.max_pool_2d(layers.max_feature_map(x_odd))),
    )

    g_ref = jax.grad(lambda a: jnp.sum(
        layers.max_pool_2d(layers.max_feature_map(a)) ** 2))(x)
    g_got = jax.grad(lambda a: jnp.sum(layers.mfm_pool_2d(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_mfm_eqmask_matches_base(rng, monkeypatch):
    """The default equality-mask backward (no tie-splitting pass) vs
    ADAA_MFM_EQMASK=0 (jnp.max VJP): values identical, gradients
    identical away from exact ties (continuous random input has
    none)."""
    from adaa_tpu.models import layers

    x = jnp.asarray(rng.standard_normal((3, 10, 6, 8)).astype(np.float32))
    x_odd = x[:, :9, :5]

    monkeypatch.setenv("ADAA_MFM_EQMASK", "0")
    base = {
        "mfm": np.asarray(layers.max_feature_map(x)),
        "pool": np.asarray(layers.mfm_pool_2d(x)),
        "pool_odd": np.asarray(layers.mfm_pool_2d(x_odd)),
        "g_mfm": np.asarray(jax.grad(
            lambda a: jnp.sum(layers.max_feature_map(a) ** 2))(x)),
        "g_pool": np.asarray(jax.grad(
            lambda a: jnp.sum(layers.mfm_pool_2d(a) ** 2))(x)),
        "g_pool_odd": np.asarray(jax.grad(
            lambda a: jnp.sum(layers.mfm_pool_2d(a) ** 2))(x_odd)),
    }
    monkeypatch.setenv("ADAA_MFM_EQMASK", "1")
    eq = {
        "mfm": np.asarray(layers.max_feature_map(x)),
        "pool": np.asarray(layers.mfm_pool_2d(x)),
        "pool_odd": np.asarray(layers.mfm_pool_2d(x_odd)),
        "g_mfm": np.asarray(jax.grad(
            lambda a: jnp.sum(layers.max_feature_map(a) ** 2))(x)),
        "g_pool": np.asarray(jax.grad(
            lambda a: jnp.sum(layers.mfm_pool_2d(a) ** 2))(x)),
        "g_pool_odd": np.asarray(jax.grad(
            lambda a: jnp.sum(layers.mfm_pool_2d(a) ** 2))(x_odd)),
    }
    for k in base:
        np.testing.assert_allclose(eq[k], base[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)

    # on an exact tie the eqmask form routes g to every tied element
    # (documented deviation; jnp.max splits the cotangent instead)
    x_tie = jnp.ones((1, 2, 2, 4), jnp.float32)
    g_tie = jax.grad(lambda a: jnp.sum(layers.mfm_pool_2d(a)))(x_tie)
    np.testing.assert_array_equal(np.asarray(g_tie),
                                  np.ones_like(np.asarray(g_tie)))


def test_max_pool_2d_eqmask_matches_base(rng, monkeypatch):
    """The default equality-mask backward for max_pool_2d (SpecRNet's
    pools) vs ADAA_POOL_EQMASK=0 (jnp.max VJP): values identical,
    gradients identical away from exact ties."""
    from adaa_tpu.models import layers

    x = jnp.asarray(rng.standard_normal((3, 10, 6, 8)).astype(np.float32))
    x_odd = x[:, :9, :5]

    def snap():
        return {
            "pool": np.asarray(layers.max_pool_2d(x)),
            "pool_odd": np.asarray(layers.max_pool_2d(x_odd)),
            "pool_w3": np.asarray(layers.max_pool_2d(x, window=3)),
            "g": np.asarray(jax.grad(
                lambda a: jnp.sum(layers.max_pool_2d(a) ** 2))(x)),
            "g_odd": np.asarray(jax.grad(
                lambda a: jnp.sum(layers.max_pool_2d(a) ** 2))(x_odd)),
            "g_w3": np.asarray(jax.grad(
                lambda a: jnp.sum(layers.max_pool_2d(a, window=3) ** 2))(x)),
        }

    monkeypatch.setenv("ADAA_POOL_EQMASK", "0")
    base = snap()
    monkeypatch.setenv("ADAA_POOL_EQMASK", "1")
    eq = snap()
    for k in base:
        np.testing.assert_allclose(eq[k], base[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)

    # exact tie: eqmask routes g to every tied element (same documented
    # deviation as the 1D pool; torch routes to a single argmax)
    x_tie = jnp.ones((1, 2, 2, 4), jnp.float32)
    g_tie = jax.grad(lambda a: jnp.sum(layers.max_pool_2d(a)))(x_tie)
    np.testing.assert_array_equal(np.asarray(g_tie),
                                  np.ones_like(np.asarray(g_tie)))
