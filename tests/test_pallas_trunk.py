"""Fused mid-trunk segment kernels vs the XLA reference
(adaa_tpu/ops/pallas_trunk.py; interpret mode on CPU).

Covers both LCNN segment shapes (conv3/conv6+pool and
conv10/conv13+pool, reference src/models/lcnn.py:120-157): forward
equivalence, input-cotangent equivalence through pool+MFM routing, and
the NaN-dW contract of the attack path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.ops import pallas_trunk as pt

B = 2


def _params(rng, spec):
    wa = rng.standard_normal((1, 1, spec.c_in, spec.c_mid)) * 0.2
    ba = rng.standard_normal(spec.c_mid) * 0.1
    wb = rng.standard_normal((3, 3, spec.c2, spec.c_out)) * 0.1
    bb = rng.standard_normal(spec.c_out) * 0.1
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    return f32(wa), f32(ba), f32(wb), f32(bb)


def _input(rng, spec):
    x = rng.standard_normal((B, spec.t, spec.f, spec.c_in))
    return jnp.asarray(x.astype(np.float32))


def _replica_fwd(x, wa, ba, wb, bb, spec):
    """Pure-JAX replica of fused_segment's exact math (same bf16
    quantization points) — forward must match bit-exactly and gradient
    routing decisions coincide except at exact ties."""
    c2 = spec.c2
    wa2 = wa.reshape(wa.shape[-2], wa.shape[-1])
    acc = jnp.einsum(
        "btfc,cn->btfn", x.astype(jnp.bfloat16),
        wa2.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + ba.astype(jnp.float32)
    am = jnp.maximum(acc[..., :c2], acc[..., c2:])

    # conv3x3: zero-padded shifts with the kernel's per-tap bf16 cast
    amp = jnp.pad(am, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        amp[:, 1 + dt : 1 + dt + spec.t, 1 + df : 1 + df + spec.f, :]
        .astype(jnp.bfloat16)
        for dt, df in pt.TAPS
    ]
    X = jnp.concatenate(cols, axis=-1)  # tap-major, matches _pack_wb
    wb2 = wb.reshape(9 * c2, spec.c_out).astype(jnp.bfloat16)
    y = jnp.einsum(
        "btfk,kn->btfn", X, wb2, preferred_element_type=jnp.float32
    ) + bb.astype(jnp.float32)
    half = spec.c_out // 2
    m = jnp.maximum(y[..., :half], y[..., half:])
    b = x.shape[0]
    m = m[:, : spec.t_out * 2, : spec.f_out * 2]
    m = m.reshape(b, spec.t_out, 2, spec.f_out, 2, half)
    return m.max(axis=(2, 4))


@pytest.mark.parametrize("spec", [pt.SEGMENT_A, pt.SEGMENT_B],
                         ids=["A_conv3_conv6", "B_conv10_conv13"])
class TestFusedSegment:
    def test_forward_exact_vs_replica(self, rng, spec):
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)
        ref = _replica_fwd(x, wa, ba, wb, bb, spec)
        got = pt.fused_segment(x, wa, ba, wb, bb, spec, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_grad_matches_replica_in_norm(self, rng, spec):
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)
        cot = jnp.asarray(
            rng.standard_normal(
                (B, spec.t_out, spec.f_out, spec.c_out // 2)
            ).astype(np.float32)
        )
        g_rep = jax.grad(
            lambda xx: jnp.sum(_replica_fwd(xx, wa, ba, wb, bb, spec) * cot)
        )(x)
        g_fus = jax.grad(
            lambda xx: jnp.sum(
                pt.fused_segment(xx, wa, ba, wb, bb, spec, True, False)
                * cot
            )
        )(x)
        num = float(jnp.linalg.norm(g_rep - g_fus))
        den = float(jnp.linalg.norm(g_rep))
        assert num / den < 0.02, (num, den)

    def test_forward_matches_reference(self, rng, spec):
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)
        ref = pt._reference_xla(x, wa, ba, wb, bb)
        got = pt.fused_segment(x, wa, ba, wb, bb, spec, interpret=True)
        assert got.shape == ref.shape == (
            B, spec.t_out, spec.f_out, spec.c_out // 2
        )
        # bf16 dots vs f32 reference: relative tolerance ~1e-2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=0.05, rtol=0.05
        )

    def test_forward_matches_bf16_reference(self, rng, spec):
        """Against the reference computed with the same bf16 dots the
        kernel uses — tolerance is then rounding-level."""
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)
        ref = pt._reference_xla(
            x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
            ba.astype(jnp.bfloat16), wb.astype(jnp.bfloat16),
            bb.astype(jnp.bfloat16),
        ).astype(jnp.float32)
        got = pt.fused_segment(x, wa, ba, wb, bb, spec, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=0.03, rtol=0.03
        )

    def test_input_gradient_close_to_f32_reference(self, rng, spec):
        """Sanity vs the f32 reference: bf16 rounding flips pool/MFM
        routing at near-ties (both subgradients valid), so this is a
        norm-level bound, not coordinate equality (that's the replica
        test above)."""
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)
        g_out = jnp.asarray(
            rng.standard_normal(
                (B, spec.t_out, spec.f_out, spec.c_out // 2)
            ).astype(np.float32)
        )

        def loss_fused(xx):
            return jnp.sum(
                pt.fused_segment(xx, wa, ba, wb, bb, spec, True, False)
                * g_out
            )

        def loss_ref(xx):
            return jnp.sum(pt._reference_xla(xx, wa, ba, wb, bb) * g_out)

        dx_fused = jax.grad(loss_fused)(x)
        dx_ref = jax.grad(loss_ref)(x)
        num = float(jnp.linalg.norm(dx_fused - dx_ref))
        den = float(jnp.linalg.norm(dx_ref))
        assert num / den < 0.25, (num, den)

    def test_need_dw_false_returns_nan_weight_cotangents(self, rng, spec):
        """need_dw=False: dx stays finite (and the conv1x1 weight grad,
        which flows through plain autodiff, stays real), while the
        Pallas op's conv3x3 weight cotangent is NaN-poisoned."""
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)

        def loss(xx, wwa, wwb):
            return jnp.sum(
                pt.fused_segment(xx, wwa, ba, wwb, bb, spec, True, False)
            )

        dx, dwa, dwb = jax.grad(loss, argnums=(0, 1, 2))(x, wa, wb)
        assert np.isfinite(np.asarray(dx)).all()
        assert np.isfinite(np.asarray(dwa)).all()
        assert np.abs(np.asarray(dwa)).sum() > 0
        assert np.isnan(np.asarray(dwb)).all()

    def test_train_dw_matches_reference(self, rng, spec):
        wa, ba, wb, bb = _params(rng, spec)
        x = _input(rng, spec)

        def loss_fused(wwb):
            return jnp.sum(
                pt.fused_segment(x, wa, ba, wwb, bb, spec, True, True)
            )

        def loss_ref(wwb):
            return jnp.sum(
                pt._reference_xla(
                    x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                    ba.astype(jnp.bfloat16), wwb.astype(jnp.bfloat16),
                    bb.astype(jnp.bfloat16),
                ).astype(jnp.float32)
            )

        dwb_fused = np.asarray(jax.grad(loss_fused)(wb), dtype=np.float32)
        dwb_ref = np.asarray(
            jax.grad(loss_ref)(wb.astype(jnp.bfloat16)), dtype=np.float32
        )
        # the two references quantize am slightly differently (einsum
        # vs lax.conv bf16 rounding), flipping pool/MFM routing at a
        # handful of near-ties — compare in norm
        num = np.linalg.norm(dwb_fused - dwb_ref)
        den = np.linalg.norm(dwb_ref)
        assert num / den < 0.02, (num, den)


@pytest.mark.slow
def test_lcnn_fused_trunk_matches_conv_chain(rng, monkeypatch):
    """Model wiring at the canonical frontend shape: the fused-segment
    (opt-in, ADAA_FUSED_TRUNK=1) and the default conv-chain path
    produce the same logits on shared params (same param tree)."""
    from adaa_tpu import models

    module = models.get_model(
        "lcnn",
        {"input_channels": 1, "frontend_algorithm": ["lfcc"],
         "compute_dtype": "bfloat16"},
    )
    wave = jnp.asarray(
        (np.random.default_rng(0).standard_normal((1, 64_600)) * 0.1)
        .astype(np.float32)
    )
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=64_600)
    # randomized BN stats so the folds are non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(np.random.default_rng(1).standard_normal(a.shape))
            .astype(np.float32) + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {**variables, "batch_stats": stats}

    ref = np.asarray(module.apply(variables, wave, train=False))
    monkeypatch.setenv("ADAA_FUSED_TRUNK", "1")
    got = np.asarray(module.apply(variables, wave, train=False))
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    assert np.abs(got).sum() > 0
