"""Space-to-depth trunk folding (ops/s2d.py) is exact by construction.

Every transform is checked against the unfolded ops it replaces on the
real trunk shapes (scaled-down H): conv+bias, MFM, MFM+pool, and the
full three-block cascade at f=4 -> f=2 -> unfolded.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaa_tpu.models import layers
from adaa_tpu.ops import s2d

P = jax.lax.Precision.HIGHEST


def base_conv(x, k, b):
    kh = k.shape[0]
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(kh // 2, kh // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P,
    )
    return y + b


def rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_fold_unfold_roundtrip():
    rng = np.random.default_rng(0)
    x = rand(rng, (2, 5, 8, 3))
    for f in (1, 2, 4):
        assert jnp.array_equal(s2d.unfold_w(s2d.fold_w(x, f), f), x)


def test_fold_w_ordering_channel_major():
    # X_f[b, h, w2, c*f + p] == x[b, h, f*w2 + p, c]
    rng = np.random.default_rng(1)
    x = rand(rng, (1, 2, 6, 3))
    xf = s2d.fold_w(x, 2)
    for w2 in range(3):
        for p in range(2):
            for c in range(3):
                assert xf[0, 1, w2, c * 2 + p] == x[0, 1, 2 * w2 + p, c]


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("f", [2, 4])
def test_conv_folded_matches_base(k, f):
    rng = np.random.default_rng(2)
    ci, co = 6, 10
    x = rand(rng, (2, 7, 8, ci))
    kern = rand(rng, (k, k, ci, co)) * 0.3
    bias = rand(rng, (co,))
    want = s2d.fold_w(base_conv(x, kern, bias), f)
    got = s2d.conv_folded(s2d.fold_w(x, f), kern, bias, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mfm_unchanged_on_folded():
    # channel-major fold keeps the MFM half-split contiguous: the same
    # max_feature_map call pairs exactly the unfolded pairs
    rng = np.random.default_rng(3)
    x = rand(rng, (2, 5, 8, 6))
    for f in (2, 4):
        want = s2d.fold_w(layers.max_feature_map(x), f)
        got = layers.max_feature_map(s2d.fold_w(x, f))
        assert jnp.array_equal(got, want)


@pytest.mark.parametrize("f", [2, 4])
@pytest.mark.parametrize("h", [6, 7])  # odd H: floor-mode truncation
def test_mfm_pool_folded(f, h):
    rng = np.random.default_rng(4)
    x = rand(rng, (2, h, 8, 6))
    want = layers.mfm_pool_2d(x)  # (2, h//2, 4, 3) unfolded
    got = s2d.mfm_pool_folded(s2d.fold_w(x, f), f)
    assert got.shape == s2d.fold_w(want, f // 2).shape
    assert jnp.array_equal(got, s2d.fold_w(want, f // 2))


def test_trunk_cascade_f4():
    """Blocks A(f=4) -> B(f=2) -> C(refold f=2) == unfolded trunk.

    Mirrors the real mid-trunk spec (lcnn.py fconv chain) at H=16:
    pools halve the fold factor so A's exit IS B's folded entry; only
    block C needs one refold.
    """
    rng = np.random.default_rng(5)
    x = rand(rng, (2, 16, 40, 32))
    spec = [  # (feat, k, in_feat, pooled)
        ("conv3", 64, 1, 32, False),
        ("conv6", 96, 3, 32, True),
        ("conv10", 96, 1, 48, False),
        ("conv13", 128, 3, 48, True),
        ("conv16", 128, 1, 64, False),
        ("conv19", 64, 3, 64, False),
        ("conv22", 64, 1, 32, False),
        ("conv25", 64, 3, 32, True),
    ]
    params = {  # 0.05 keeps activations O(1) so f32 rounding noise
        n: (rand(rng, (k, k, ci, f_)) * 0.05, rand(rng, (f_,)))
        for n, f_, k, ci, _ in spec
    }  # stays ~1e-6 through 8 layers (identical math, reassociated sums)

    h_base = x
    for n, _, k, _, pooled in spec:
        y = base_conv(h_base, *params[n])
        h_base = (layers.mfm_pool_2d(y) if pooled
                  else layers.max_feature_map(y))

    f = 4
    h_f = s2d.fold_w(x, f)
    for n, _, k, _, pooled in spec:
        if n == "conv16":  # block C entry: unfolded after B's pool
            assert f == 1
            f = 2
            h_f = s2d.fold_w(h_f, f)
        kern, bias = params[n]
        y = s2d.conv_folded(h_f, kern, bias, f)
        if pooled:
            h_f = s2d.mfm_pool_folded(y, f)
            f //= 2
        else:
            h_f = layers.max_feature_map(y)

    assert f == 1
    assert h_f.shape == h_base.shape
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_base),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["f2", "f4", "f4lite"])
def test_lcnn_s2d_trunk_matches_default(mode, monkeypatch):
    """bf16 LCNN logits: s2d-folded trunk == unfolded folded-BN path.

    Full 64600-sample wave (the s2d gate keys on the canonical
    (202, 40, 32) post-layer0 shape); randomized running stats make
    the composed BN-fold x kernel-fold non-trivial. Fused layer0 is
    disabled on both sides so the diff isolates the mid-trunk.
    """
    from adaa_tpu import models

    rng = np.random.default_rng(7)
    module = models.get_model(
        "lcnn",
        {"input_channels": 1, "frontend_algorithm": ["lfcc"],
         "compute_dtype": "bfloat16"},
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=64_600
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(rng.standard_normal(a.shape)).astype(np.float32) + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {**variables, "batch_stats": stats}
    x = jnp.asarray(
        (rng.standard_normal((1, 64_600)) * 0.05).astype(np.float32)
    )

    monkeypatch.setenv("ADAA_FUSED_LCNN", "0")
    monkeypatch.setenv("ADAA_S2D_TRUNK", "0")
    ref = np.asarray(module.apply(variables, x, train=False))
    monkeypatch.setenv("ADAA_S2D_TRUNK", mode)
    got = np.asarray(module.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert not np.allclose(got, 0.0)


def test_conv_folded_gradients_match():
    # the attack path differentiates w.r.t. x through the folded chain
    rng = np.random.default_rng(6)
    x = rand(rng, (2, 6, 8, 4))
    kern = rand(rng, (3, 3, 4, 8)) * 0.3
    bias = rand(rng, (8,))

    def loss_base(a):
        return layers.mfm_pool_2d(base_conv(a, kern, bias)).sum()

    def loss_fold(a):
        y = s2d.conv_folded(s2d.fold_w(a, 2), kern, bias, 2)
        return s2d.mfm_pool_folded(y, 2).sum()

    g0 = jax.grad(loss_base)(x)
    g1 = jax.grad(loss_fold)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)
