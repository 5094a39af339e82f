"""LCNN detector (LFCC-LCNN lineage) in flax, TPU-native layout.

Behavioral equivalent of the reference's LCNN (reference:
src/models/lcnn.py:102-243 — itself from the ASVspoof2021 LFCC-LCNN
baseline): a 9-conv Max-Feature-Map stack with affine-free BatchNorms,
two residual BLSTMs over time, mean-pool and a single output logit.

TPU-first differences from the torch code (behavior preserved):
* NHWC layout (time, coeff, channel) instead of NCHW — convs land on
  the MXU without layout transposes.
* The BLSTM input projection is hoisted to one batched matmul; only the
  (B, 80)x(80, 320) recurrence runs inside ``lax.scan``.

Module names carry the torch Sequential indices (conv0 == state_dict
key ``m_transform.0``) so the checkpoint importer is a transparent
1:1 mapping (see models/torch_import.py).

Forward maps a raw waveform (B, 64600) -> logit (B, 1); precomputed
features (B, C, n_coeff, T) are also accepted, mirroring BaseLCNN.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaa_tpu.models import layers
from adaa_tpu.ops import frontends


class _Conv0Params(nn.Module):
    """Parameter-only twin of the conv0 nn.Conv (same tree: conv0/{kernel,bias}).

    Lets the fused Pallas first block (ops/pallas_layer0.py) consume the
    exact parameters the XLA path would, so .pth checkpoint import and
    state dicts are unchanged.
    """

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", layers.kaiming_uniform_conv, (5, 5, 1, 64)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (64,))
        return kernel, bias


class _ConvParams(nn.Module):
    """Parameter-only twin of an nn.Conv (same tree: {name}/{kernel,bias}).

    Used by the folded eval path so BatchNorm scales can be multiplied
    into the kernel before the conv runs (see LCNN.__call__).
    """

    features: int
    ksize: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", layers.kaiming_uniform_conv,
            (self.ksize, self.ksize, self.in_features, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return kernel, bias


class _BNStats(nn.Module):
    """Stats-only twin of nn.BatchNorm (same tree: batch_stats/{name}/{mean,var})."""

    features: int

    @nn.compact
    def __call__(self):
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return mean.value, var.value


class LCNN(nn.Module):
    """LCNN with an optional on-device frontend.

    Attributes:
      input_channels: frontend channels (1 for lfcc/mfcc, 2 for mel_spec).
      num_coefficients: frontend coefficient count (80).
      frontend_algorithm: e.g. ["lfcc"]; empty -> feature input expected.
    """

    input_channels: int = 1
    num_coefficients: int = 80
    frontend_algorithm: Sequence[str] = ()
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 for speed;
    # params and the frontend stay float32 (EER-parity critical)
    precision: Optional[str] = None  # "highest" -> f32-exact convs for
    # EER-parity evaluation (TPU default conv precision deviates ~1%
    # relative from CPU f32 logits)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 2:  # raw waveform -> frontend
            # bf16 trunk: the frontend's DFT/filterbank matmuls also run
            # bf16 (f32 accumulation) — attack surrogates only; the f32
            # parity path keeps the HIGHEST-precision frontend.
            # ADAA_BF16_FRONTEND=0 keeps the f32 frontend on the bf16
            # trunk (measured attack-effectiveness parity either way).
            fe_compute = (
                "bf16"
                if (self.compute_dtype == jnp.bfloat16
                    and self.precision != "highest"
                    and os.environ.get("ADAA_BF16_FRONTEND") != "0")
                else "f32"
            )
            feat = frontends.get_frontend(
                list(self.frontend_algorithm), compute=fe_compute
            )(x)
            if feat.ndim < 4:
                feat = feat[:, None, :, :]  # (B, 1, n_coeff, T)
        else:
            feat = x  # (B, C, n_coeff, T)

        # torch permutes to (B, C, T, n_coeff) then runs NCHW convs
        # (src/models/lcnn.py:190); we go channels-last: (B, T, coeff, C).
        h = jnp.transpose(feat, (0, 3, 2, 1))
        dtype = self.compute_dtype
        if dtype is not None:
            h = h.astype(dtype)

        prec = (jax.lax.Precision.HIGHEST
                if self.precision == "highest" else None)
        conv = lambda f, k, name: nn.Conv(
            features=f,
            kernel_size=(k, k),
            padding=[(k // 2, k // 2)] * 2,
            kernel_init=layers.kaiming_uniform_conv,
            dtype=dtype,
            precision=prec,
            name=name,
        )
        bn = lambda name: layers.torch_batch_norm(
            affine=False, name=name, dtype=dtype
        )
        mfm = layers.max_feature_map
        pool = layers.max_pool_2d

        # First block: conv0 5x5 + MFM + pool. On the bf16 trunk at the
        # canonical frontend shape this runs as one fused Pallas kernel
        # (ops/pallas_layer0.py) — the XLA schedule materializes ~1 GB of
        # intermediates here per batch-256 step. ADAA_FUSED_LCNN=0 forces
        # the XLA path; f32/parity modes always use it. Training steps
        # (train=True) also use the XLA path: they need exact weight
        # cotangents, and the fused op's dW fallback would recompute the
        # block in XLA anyway — attacks/eval are where the steps are.
        use_fused = (
            dtype == jnp.bfloat16
            and prec is None
            and not train
            and h.shape[1:] == (404, 80, 1)
            and os.environ.get("ADAA_FUSED_LCNN") != "0"
        )
        if use_fused:
            from adaa_tpu.ops.pallas_layer0 import fused_conv0_mfm_pool

            kernel, bias = _Conv0Params(name="conv0")()
            h = fused_conv0_mfm_pool(
                h[..., 0],
                kernel,
                bias,
                jax.default_backend() == "cpu",
                train,  # weight cotangents only exist on train paths
            )
        else:
            h = mfm(conv(64, 5, "conv0")(h))
            h = pool(h)
        # mid-layer MFM/pools stay on XLA: a fused Pallas MFM+t-pool was
        # prototyped for conv6/conv13/conv25 but measured SLOWER than
        # XLA's fused machinery at these (4-16x smaller) shapes — the
        # many small grid blocks cost more in dispatch/pipelining than
        # the saved HBM traffic (47 vs 33 ms full fwd+bwd, round 2)
        #
        # Eval-mode BN folding (bf16 fast trunk): every BatchNorm here
        # follows an MFM (bn9 additionally a pool), and a monotone
        # per-channel affine commutes with those maxes — bn(mfm(y)) ==
        # mfm(y * s + t) with s, t replicated over the MFM halves. So
        # each BN folds EXACTLY into the preceding conv's output
        # channels (kernel *= s, bias = bias * s + t): six elementwise
        # passes over the big (B, 202, 40, C) activations disappear
        # from the attack hot loop in both directions. Folding on the
        # output side has no zero-padding caveat (folding a BN forward
        # into a padded 3x3 conv would mis-handle borders).
        fold = (
            dtype == jnp.bfloat16
            and prec is None
            and not train
            and os.environ.get("ADAA_FOLD_BN") != "0"
        )
        if fold:

            def fold_params(feat, k, in_feat, name, bn_name):
                kernel, bias = _ConvParams(feat, k, in_feat, name=name)()
                if bn_name is not None:
                    m, v = _BNStats(feat // 2, name=bn_name)()
                    s = 1.0 / jnp.sqrt(v + 1e-5)
                    t = -m * s
                    s2 = jnp.concatenate([s, s])
                    kernel = kernel * s2
                    bias = bias * s2 + jnp.concatenate([t, t])
                return kernel, bias

            def fconv(h, feat, k, in_feat, name, bn_name, pooled=False):
                kernel, bias = fold_params(feat, k, in_feat, name, bn_name)
                y = jax.lax.conv_general_dilated(
                    h.astype(dtype),
                    kernel.astype(dtype),
                    (1, 1),
                    [(k // 2, k // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = y + bias.astype(dtype)
                # MFM followed by a pool collapses to ONE reshape-max
                # (identical values; saves the MFM intermediate's HBM
                # round-trip fwd+bwd)
                return layers.mfm_pool_2d(y) if pooled else mfm(y)

            # conv3..conv13 (+ their pools) CAN run as two fused Pallas
            # segments (ops/pallas_trunk.py, ADAA_FUSED_TRUNK=1), but
            # the measured verdict is the same as round 2's mid-layer
            # experiments: at these shapes (32-128 channels, ~620-row
            # plane chunks) the roll-heavy kernels bottleneck on VPU
            # shuffles and grid overhead and lose to XLA's conv
            # machinery ~19x (80 vs 4.3 ms batch-256 segment-A fwd on
            # v5e). Default stays on XLA; the kernels remain as a
            # tested, documented negative result.
            fuse_trunk = (
                h.shape[1:] == (202, 40, 32)
                and os.environ.get("ADAA_FUSED_TRUNK") == "1"
            )
            # Space-to-depth trunk (ops/s2d.py): folds the coefficient
            # axis into channels so the C=32-64 convs present full
            # (8,128) tiles. MEASURED NEGATIVE (profile_s2d_r5.json,
            # round 5): f2/f4/f4lite run 2.0-2.3x SLOWER than the
            # unfolded chain (28.7-32.8 vs 14.3 ms fwd+bwd @ b256) —
            # XLA's layout assignment already reorders minor dims onto
            # the (8,128) tiles, so folding only buys the 2-4x MAC
            # inflation plus the fold transposes. Kept opt-in ("f2"/
            # "f4"/"f4lite" via ADAA_S2D_TRUNK, default off) as a
            # tested negative result; values identical by construction
            # (tests/test_s2d.py).
            s2d_mode = os.environ.get("ADAA_S2D_TRUNK", "0")
            if s2d_mode not in ("f2", "f4", "f4lite"):
                s2d_mode = "0"
            s2d_trunk = (
                not fuse_trunk
                and h.shape[1:] == (202, 40, 32)
                and s2d_mode != "0"
            )
            if s2d_trunk:
                from adaa_tpu.ops import s2d

                fa, fb, fc = {  # per-block fold factors
                    "f2": (2, 2, 2),
                    "f4": (4, 2, 2),      # A's pool exits at B's fold
                    "f4lite": (4, 2, 1),  # block C stays unfolded
                }[s2d_mode]

                def sconv(h, feat, k, in_feat, name, bn_name, f,
                          pooled=False):
                    kernel, bias = fold_params(feat, k, in_feat, name,
                                               bn_name)
                    y = s2d.conv_folded(h, kernel, bias, f, dtype=dtype)
                    return (s2d.mfm_pool_folded(y, f) if pooled
                            else mfm(y))

                def refold(h, cur, want):
                    return (h if cur == want
                            else s2d.fold_w(s2d.unfold_w(h, cur), want))

                h = s2d.fold_w(h, fa)
                h = sconv(h, 64, 1, 32, "conv3", "bn5", fa)
                h = sconv(h, 96, 3, 32, "conv6", "bn9", fa, pooled=True)
                h = refold(h, fa // 2, fb)  # pools halve the fold
                h = sconv(h, 96, 1, 48, "conv10", "bn12", fb)
                h = sconv(h, 128, 3, 48, "conv13", None, fb, pooled=True)
                h = refold(h, fb // 2, fc)
                if fc > 1:
                    h = sconv(h, 128, 1, 64, "conv16", "bn18", fc)
                    h = sconv(h, 64, 3, 64, "conv19", "bn21", fc)
                    h = sconv(h, 64, 1, 32, "conv22", "bn24", fc)
                    h = s2d.unfold_w(
                        sconv(h, 64, 3, 32, "conv25", None, fc,
                              pooled=True),
                        fc // 2,
                    )
                else:
                    h = fconv(h, 128, 1, 64, "conv16", "bn18")
                    h = fconv(h, 64, 3, 64, "conv19", "bn21")
                    h = fconv(h, 64, 1, 32, "conv22", "bn24")
                    h = fconv(h, 64, 3, 32, "conv25", None, pooled=True)
            elif fuse_trunk:
                from adaa_tpu.ops.pallas_trunk import (
                    SEGMENT_A, SEGMENT_B, fused_segment,
                )

                interp = jax.default_backend() == "cpu"
                ka, ba_ = fold_params(64, 1, 32, "conv3", "bn5")
                kb, bb_ = fold_params(96, 3, 32, "conv6", "bn9")
                h = fused_segment(h, ka, ba_, kb, bb_, SEGMENT_A,
                                  interp, train)
                ka, ba_ = fold_params(96, 1, 48, "conv10", "bn12")
                kb, bb_ = fold_params(128, 3, 48, "conv13", None)
                h = fused_segment(h, ka, ba_, kb, bb_, SEGMENT_B,
                                  interp, train)
            else:
                h = fconv(h, 64, 1, 32, "conv3", "bn5")
                h = fconv(h, 96, 3, 32, "conv6", "bn9", pooled=True)
                h = fconv(h, 96, 1, 48, "conv10", "bn12")
                h = fconv(h, 128, 3, 48, "conv13", None, pooled=True)
            if not s2d_trunk:  # the s2d branch ran its own conv16..25
                h = fconv(h, 128, 1, 64, "conv16", "bn18")
                h = fconv(h, 64, 3, 64, "conv19", "bn21")
                h = fconv(h, 64, 1, 32, "conv22", "bn24")
                h = fconv(h, 64, 3, 32, "conv25", None, pooled=True)
        else:
            h = mfm(conv(64, 1, "conv3")(h))
            h = bn("bn5")(h, use_running_average=not train)
            h = mfm(conv(96, 3, "conv6")(h))
            h = pool(h)
            h = bn("bn9")(h, use_running_average=not train)
            h = mfm(conv(96, 1, "conv10")(h))
            h = bn("bn12")(h, use_running_average=not train)
            h = mfm(conv(128, 3, "conv13")(h))
            h = pool(h)
            h = mfm(conv(128, 1, "conv16")(h))
            h = bn("bn18")(h, use_running_average=not train)
            h = mfm(conv(64, 3, "conv19")(h))
            h = bn("bn21")(h, use_running_average=not train)
            h = mfm(conv(64, 1, "conv22")(h))
            h = bn("bn24")(h, use_running_average=not train)
            h = mfm(conv(64, 3, "conv25")(h))
            h = pool(h)
        h = nn.Dropout(rate=0.7, deterministic=not train)(h)

        # (B, T', W', C) -> (B, T', C, W') -> (B, T', C * W')
        # matches torch's permute(0, 2, 1, 3) + view (src/models/lcnn.py:196-199)
        b, t = h.shape[0], h.shape[1]
        h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t, -1)

        dim = (self.num_coefficients // 16) * 32
        if dtype is not None:
            h = h.astype(jnp.float32)  # LSTM recurrence stays f32
        # full unroll only on the bf16 fast path: the T=50 recurrence
        # as straight-line code measures ~2x faster fwd+bwd than
        # unroll=4 (profile_tail_r4.json) but multiplies f32
        # training-compile time, so the train/parity paths stay scanned
        unroll = -1 if (dtype is not None and not train) else 1
        lstm_out = layers.BiLSTM(dim // 2, unroll=unroll, name="blstm0")(h)
        lstm_out = layers.BiLSTM(dim // 2, unroll=unroll, name="blstm1")(lstm_out)

        pooled = (lstm_out + h).mean(axis=1)
        logit = nn.Dense(
            1,
            kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(dim),
            name="output",
        )(pooled)
        return logit.astype(jnp.float32)
