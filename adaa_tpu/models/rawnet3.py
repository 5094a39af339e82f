"""RawNet3 raw-waveform detector in flax, TPU-native layout.

Behavioral equivalent of the reference (reference:
src/models/rawnet3.py:11-291, lineage Jung et al. RawNet3 /
clovaai): pre-emphasis + instance norm, a learnable parametric sinc
filterbank (asteroid_filterbanks ``Encoder(ParamSincFB(...))``,
reference rawnet3.py:27-33) reimplemented natively, three Res2Net
``Bottle2neck`` blocks with AFMS feature-map scaling, a skip-pyramid
1x1 conv to 1536 channels, ECA attentive statistics pooling, and a
final dense layer to one logit.

Reproduced reference quirks:
* ``bn1``/``relu`` after the sinc encoder are defined but never used in
  forward (rawnet3.py:34-35 vs 73-98) — we do not instantiate them.
* ``torch.var`` in the context stats uses the unbiased estimator.
* The sinc filterbank keeps asteroid's default ``sample_rate=8000``
  (RawNet3 passes no sample_rate), mel-spaced init between 30 Hz and
  sr/2 - 100 Hz, half-Hamming window, cos+sin filter pairs.

Layout: channels-last (B, T, C) 1D convs.

Attack-path roofline (why rawnet3:PGD throughput sits where it does):
one forward is ~37 GFLOP/sample (dominated by layer1's 1x1 convs at
T=6435: conv1 3.4 + 7 scale convs 4.4 + conv3 13.5 + residual 3.4
GFLOP, then 6.3/2.1 GFLOP for layers 2/3 and ~3.4 for the pyramid +
pooling head). Attack backwards prune dW, so a PGD step is ~2 forwards
and PGD-10 ~0.78 TFLOP/sample; v5e bf16 peak (197 TFLOPs) therefore
caps PGD-10 at ~250 ex/s at 100% MFU — the measured ~80 ex/s is ~32%
MFU, i.e. within ~2x of a realistically attainable bound, not 10x off.
Contrast LCNN at ~2.5 GFLOP/sample whose flagship bench rides the
fused Pallas layer-0.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adaa_tpu.models import layers


class _Conv1dParams(nn.Module):
    """Parameter-only twin of a 1D nn.Conv (same tree: {name}/{kernel[,bias]})."""

    features: int
    ksize: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", layers.kaiming_uniform_conv,
            (self.ksize, self.in_features, self.features),
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return kernel, bias


class _BNParams(nn.Module):
    """Twin of an affine nn.BatchNorm (params scale/bias + batch_stats)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


def _sinc_init_hz(cutoff: int, sample_rate: float, min_low_hz: float, min_band_hz: float):
    """Mel-spaced initial (low_hz, band_hz) — asteroid ParamSincFB init."""
    low_hz = 30.0
    high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
    to_mel = lambda hz: 2595.0 * np.log10(1.0 + hz / 700.0)
    to_hz = lambda mel: 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), cutoff + 1)
    hz = to_hz(mel)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


class ParamSincFB(nn.Module):
    """Learnable parametric sinc filterbank conv (asteroid-compatible).

    n_filters total output channels: first half cosine-phase band-pass
    filters, second half sine-phase. Parameters ``low_hz_`` and
    ``band_hz_`` have asteroid's (cutoff, 1) shapes for checkpoint
    compatibility.
    """

    n_filters: int = 256
    kernel_size: int = 251
    stride: int = 10
    sample_rate: float = 8000.0
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    compute_dtype: Optional[jnp.dtype] = None  # bf16 -> bf16 conv inputs
    # with f32 accumulation on the attack-surrogate fast path
    # (ADAA_BF16_FRONTEND=0 keeps the f32 encoder on the bf16 trunk)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cutoff = self.n_filters // 2
        init_low, init_band = _sinc_init_hz(
            cutoff, self.sample_rate, self.min_low_hz, self.min_band_hz
        )
        low_hz_ = self.param(
            "low_hz_", lambda k: jnp.asarray(init_low)[:, None]
        )
        band_hz_ = self.param(
            "band_hz_", lambda k: jnp.asarray(init_band)[:, None]
        )

        half = self.kernel_size // 2
        window = jnp.asarray(np.hamming(self.kernel_size)[:half].astype(np.float32))
        n_ = jnp.asarray(
            (2.0 * math.pi * np.arange(-half, 0.0) / self.sample_rate).astype(
                np.float32
            )
        )[None, :]  # (1, half)

        low = self.min_low_hz + jnp.abs(low_hz_)  # (cutoff, 1)
        high = jnp.clip(
            low + self.min_band_hz + jnp.abs(band_hz_),
            self.min_low_hz,
            self.sample_rate / 2,
        )
        band = (high - low)[:, 0]  # (cutoff,)
        ftl = low @ n_  # (cutoff, half)
        fth = high @ n_

        cos_left = ((jnp.sin(fth) - jnp.sin(ftl)) / (n_ / 2.0)) * window
        cos_center = 2.0 * band[:, None]
        cos_filt = jnp.concatenate(
            [cos_left, cos_center, jnp.flip(cos_left, axis=1)], axis=1
        ) / (2.0 * band[:, None])

        sin_left = ((jnp.cos(ftl) - jnp.cos(fth)) / (n_ / 2.0)) * window
        sin_center = jnp.zeros_like(band)[:, None]
        sin_filt = jnp.concatenate(
            [sin_left, sin_center, -jnp.flip(sin_left, axis=1)], axis=1
        ) / (2.0 * band[:, None])

        filters = jnp.concatenate([cos_filt, sin_filt], axis=0)  # (n_filt, ks)

        # Strided conv with a closed-form VJP: the automatic input-grad
        # of a stride-10 conv is the transposed-conv XLA:TPU pathology
        # and attacks differentiate through the encoder every step
        # (ops/sinc_conv.py). Filter cotangents only exist on train
        # paths (need_dw) — NaN otherwise, failing loudly if consumed.
        if os.environ.get("ADAA_SINC_VJP") == "0":
            return jax.lax.conv_general_dilated(
                x,  # (B, L, 1)
                filters.T[:, None, :],  # (ks, 1, n_filt) HIO
                window_strides=(self.stride,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
            )  # (B, T, n_filt)
        from adaa_tpu.ops.sinc_conv import sinc_conv

        compute = (
            "bf16"
            if (self.compute_dtype == jnp.bfloat16
                and os.environ.get("ADAA_BF16_FRONTEND") != "0")
            else "f32"
        )
        return sinc_conv(
            x[..., 0] if x.ndim == 3 else x,
            filters, self.stride, need_dw=train, compute=compute,
        )  # (B, T, n_filt)


class AFMS(nn.Module):
    """Alpha-feature-map scaling (reference rawnet3.py:161-182)."""

    nb_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, C)
        y = x.mean(axis=1)  # adaptive_avg_pool1d(1)
        y = nn.Dense(
            self.nb_dim,
            kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(self.nb_dim),
            name="fc",
        )(y)
        y = jax.nn.sigmoid(y)[:, None, :]
        alpha = self.param("alpha", nn.initializers.ones, (self.nb_dim,))
        return (x + alpha[None, None, :]) * y


class Bottle2neck(nn.Module):
    """Res2Net bottleneck with dilated convs (reference rawnet3.py:185-274)."""

    inplanes: int
    planes: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    pool: int = 0
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = self.planes // self.scale
        nums = self.scale - 1

        # OPT-IN (negative result, kept tested + documented): a bf16
        # eval path that folds the BatchNorms to affines and runs the
        # seven scale convs as one lax.scan over stacked weights. It
        # does cut the conv-body count (compile 462 s -> 74 s for
        # PGD-10 before the sinc VJP landed) but measured SLOWER at
        # runtime than the unrolled flax path on v5e (103 vs 79 ms per
        # batch-64 grad step): the (B, T, scale*w) <-> (scale, B, T, w)
        # stack/unstack transposes around the scan move ~1.6 GB of
        # layer-1 activations per direction, and XLA already fuses the
        # eval BN affine into the conv epilogue on the unrolled path —
        # folding buys nothing XLA hadn't. The real compile hog was the
        # sinc encoder's transposed-conv input-grad, fixed by
        # ops/sinc_conv.py's closed-form VJP (always on). The default
        # is therefore the unrolled path; ADAA_RAWNET_SCAN=1 selects
        # the scan variant (same param tree, bit-comparable logits).
        # Fused Pallas eval path (ops/pallas_b2n.py): the whole block
        # body runs in VMEM per (sample, time-tile) grid step — the XLA
        # path round-trips every (B, T, 1024) intermediate through HBM.
        # Same param tree (twin modules), bf16 attack/eval trunk only.
        if (
            self.compute_dtype == jnp.bfloat16
            and not train
            and os.environ.get("ADAA_FUSED_B2N") == "1"
        ):
            return self._fused_pallas(x, width, nums)
        fast = (
            self.compute_dtype == jnp.bfloat16
            and not train
            and os.environ.get("ADAA_RAWNET_SCAN") == "1"
        )
        if fast:
            return self._fast_eval(x, width, nums)

        bn = lambda name: layers.torch_batch_norm(
            name=name, dtype=self.compute_dtype)
        conv1x1 = lambda f, name, bias=True: nn.Conv(
            f, (1,), use_bias=bias, dtype=self.compute_dtype,
            kernel_init=layers.kaiming_uniform_conv, name=name,
        )

        residual = x
        if self.inplanes != self.planes:
            residual = conv1x1(self.planes, "residual", bias=False)(x)

        out = conv1x1(width * self.scale, "conv1")(x)
        out = nn.relu(out)
        out = bn("bn1")(out, use_running_average=not train)

        spx = jnp.split(out, self.scale, axis=-1)
        num_pad = (self.kernel_size // 2) * self.dilation
        outs = []
        sp = None
        for i in range(nums):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = nn.Conv(
                width,
                (self.kernel_size,),
                kernel_dilation=(self.dilation,),
                padding=[(num_pad, num_pad)],
                kernel_init=layers.kaiming_uniform_conv,
                dtype=self.compute_dtype,
                name=f"convs_{i}",
            )(sp)
            sp = nn.relu(sp)
            sp = bn(f"bns_{i}")(sp, use_running_average=not train)
            outs.append(sp)
        outs.append(spx[nums])
        out = jnp.concatenate(outs, axis=-1)

        out = conv1x1(self.planes, "conv3")(out)
        out = nn.relu(out)
        out = bn("bn3")(out, use_running_average=not train)

        out = out + residual
        if self.pool:
            out = layers.max_pool_1d(out, self.pool)
        return AFMS(self.planes, name="afms")(out)

    def _fused_pallas(self, x: jax.Array, width: int, nums: int) -> jax.Array:
        """Fold BNs + pack weights for the fused VMEM-resident block
        (ops/pallas_b2n.py). Twin modules keep the flax param tree."""
        from adaa_tpu.ops.pallas_b2n import B2NParams, fused_bottle2neck

        bf = jnp.bfloat16

        def bn_affine(name, feat):
            sc, bi, mu, va = _BNParams(feat, name=name)()
            s = sc / jnp.sqrt(va + 1e-5)
            return s, bi - mu * s

        k1, b1 = _Conv1dParams(
            width * self.scale, 1, self.inplanes, name="conv1")()
        s1, t1 = bn_affine("bn1", width * self.scale)
        row = lambda v: v.astype(jnp.float32).reshape(1, -1)

        kc, bc, sc_, tc = [], [], [], []
        for i in range(nums):
            k, b = _Conv1dParams(
                width, self.kernel_size, width, name=f"convs_{i}")()
            s, t = bn_affine(f"bns_{i}", width)
            # rows [(i*3 + s) * width, +width) = tap s of conv i
            kc.extend(k[s] for s in range(self.kernel_size))
            bc.append(b)
            sc_.append(s)
            tc.append(t)
        k3, b3 = _Conv1dParams(
            self.planes, 1, width * self.scale, name="conv3")()
        s3, t3 = bn_affine("bn3", self.planes)

        wr = None
        if self.inplanes != self.planes:
            krw, _ = _Conv1dParams(
                self.planes, 1, self.inplanes, use_bias=False,
                name="residual")()
            wr = krw[0].astype(bf)

        params = B2NParams(
            w1=k1[0].astype(bf), b1=row(b1), s1=row(s1), t1=row(t1),
            wc=jnp.concatenate(kc, axis=0).astype(bf),
            bc=row(jnp.concatenate(bc)), sc=row(jnp.concatenate(sc_)),
            tc=row(jnp.concatenate(tc)),
            w3=k3[0].astype(bf), b3=row(b3), s3=row(s3), t3=row(t3),
            wr=wr,
        )
        out = fused_bottle2neck(
            x.astype(bf), params, self.dilation, self.pool,
            jax.default_backend() == "cpu",  # interpret off-TPU
        )
        return AFMS(self.planes, name="afms")(out)

    def _fast_eval(self, x: jax.Array, width: int, nums: int) -> jax.Array:
        dt = self.compute_dtype

        def bn_affine(name, feat):
            sc, bi, mu, va = _BNParams(feat, name=name)()
            s = sc / jnp.sqrt(va + 1e-5)
            t = bi - mu * s
            return s.astype(dt), t.astype(dt)

        def conv1x1p(h, name, feat, in_feat, bias=True):
            k, b = _Conv1dParams(
                feat, 1, in_feat, use_bias=bias, name=name)()
            y = jax.lax.conv_general_dilated(
                h, k.astype(dt), (1,), "VALID",
                dimension_numbers=("NHC", "HIO", "NHC"))
            return y if b is None else y + b.astype(dt)

        x = x.astype(dt)
        residual = x
        if self.inplanes != self.planes:
            residual = conv1x1p(
                x, "residual", self.planes, self.inplanes, bias=False)

        out = conv1x1p(x, "conv1", width * self.scale, self.inplanes)
        s1, t1 = bn_affine("bn1", width * self.scale)
        out = nn.relu(out) * s1 + t1

        kst, bst, sst, tst = [], [], [], []
        for i in range(nums):
            k, b = _Conv1dParams(
                width, self.kernel_size, width, name=f"convs_{i}")()
            s, t = bn_affine(f"bns_{i}", width)
            kst.append(k)
            bst.append(b)
            sst.append(s)
            tst.append(t)
        kst = jnp.stack(kst).astype(dt)
        bst = jnp.stack(bst).astype(dt)
        sst = jnp.stack(sst)
        tst = jnp.stack(tst)

        bsz, tlen = out.shape[0], out.shape[1]
        spx = jnp.moveaxis(
            out.reshape(bsz, tlen, self.scale, width), 2, 0
        )  # (scale, B, T, width)
        num_pad = (self.kernel_size // 2) * self.dilation

        def step(sp, xs):
            k, b, s, t, spx_i = xs
            h = sp + spx_i
            y = jax.lax.conv_general_dilated(
                h, k, (1,), [(num_pad, num_pad)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"))
            y = nn.relu(y + b) * s + t
            return y, y

        _, ys = jax.lax.scan(
            step, jnp.zeros_like(spx[0]),
            (kst, bst, sst, tst, spx[:nums]))
        out = jnp.concatenate(
            [jnp.moveaxis(ys, 0, 2).reshape(bsz, tlen, nums * width),
             spx[nums]],
            axis=-1)

        out = conv1x1p(out, "conv3", self.planes, width * self.scale)
        s3, t3 = bn_affine("bn3", self.planes)
        out = nn.relu(out) * s3 + t3

        out = out + residual
        if self.pool:
            out = layers.max_pool_1d(out, self.pool)
        return AFMS(self.planes, name="afms")(out)


class RawNet3(nn.Module):
    """RawNet3 with fixed reference hyperparameters
    (``prepare_model``, reference rawnet3.py:277-291): C=1024, scale 8,
    context=True, summed=True, ECA encoder, log_sinc, mean norm,
    sinc_stride 10, nOut=1, out_bn=False.
    """

    C: int = 1024
    n_out: int = 1
    sinc_stride: int = 10
    log_sinc: bool = True
    norm_sinc: str = "mean"
    context: bool = True
    summed: bool = True
    out_bn: bool = False
    compute_dtype: Optional[jnp.dtype] = None  # bf16 res2net trunk +
    # bf16-input sinc encoder (f32 accumulation; ADAA_BF16_FRONTEND=0
    # keeps the encoder f32); stats pooling / head stay f32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.ndim == 2, "RawNet3 consumes raw waves (B, L)"
        # PreEmphasis (reference rawnet3.py:140-158): y[t] = x[t] - 0.97 x[t-1],
        # left reflect pad => y[0] = x[0] - 0.97 x[1]
        prev = jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)
        h = x - 0.97 * prev

        # InstanceNorm1d(1, eps=1e-4, affine=True): per-sample over time
        in_scale = self.param("instancenorm_weight", nn.initializers.ones, (1,))
        in_bias = self.param("instancenorm_bias", nn.initializers.zeros, (1,))
        mean = h.mean(axis=1, keepdims=True)
        var = h.var(axis=1, keepdims=True)  # biased, torch InstanceNorm
        h = (h - mean) / jnp.sqrt(var + 1e-4) * in_scale + in_bias

        h = ParamSincFB(
            n_filters=self.C // 4,
            kernel_size=251,
            stride=self.sinc_stride,
            compute_dtype=self.compute_dtype,
            name="conv1",
        )(h[:, :, None], train)  # (B, T, C/4)
        if (self.compute_dtype == jnp.bfloat16
                and os.environ.get("ADAA_BF16_FRONTEND") != "0"
                and jax.default_backend() != "cpu"):
            # bf16 encoder tail: abs/log run on bf16 (the trunk consumes
            # bf16 anyway — rounding here, not at the cast below, halves
            # the ~850 MB fwd+bwd HBM traffic of this (B, T, 256) chain
            # at batch 64); the time-mean still accumulates in f32
            h = h.astype(self.compute_dtype)
        h = jnp.abs(h)
        if self.log_sinc:
            h = jnp.log(h + 1e-6)
        if self.norm_sinc == "mean":
            h = h - h.mean(axis=1, keepdims=True,
                           dtype=jnp.float32).astype(h.dtype)

        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        x1 = Bottle2neck(
            self.C // 4, self.C, kernel_size=3, dilation=2, scale=8, pool=5,
            compute_dtype=self.compute_dtype, name="layer1",
        )(h, train)
        x2 = Bottle2neck(
            self.C, self.C, kernel_size=3, dilation=3, scale=8, pool=3,
            compute_dtype=self.compute_dtype, name="layer2",
        )(x1, train)
        mp3_x1 = layers.max_pool_1d(x1, 3)
        if self.summed:
            x3_in = mp3_x1 + x2
        else:
            x3_in = x2
        x3 = Bottle2neck(
            self.C, self.C, kernel_size=3, dilation=4, scale=8,
            compute_dtype=self.compute_dtype, name="layer3",
        )(x3_in, train)

        h = jnp.concatenate([mp3_x1, x2, x3], axis=-1)
        h = nn.Conv(
            1536, (1,), kernel_init=layers.kaiming_uniform_conv,
            dtype=self.compute_dtype, name="layer4"
        )(h)
        h = nn.relu(h).astype(jnp.float32)  # stats pooling in f32

        t = h.shape[1]
        if self.context:
            mu_t = h.mean(axis=1, keepdims=True)
            var_t = h.var(axis=1, keepdims=True, ddof=1)  # torch unbiased var
            sg_t = jnp.sqrt(jnp.clip(var_t, 1e-4, 1e4))
            global_x = jnp.concatenate(
                [
                    h,
                    jnp.broadcast_to(mu_t, h.shape),
                    jnp.broadcast_to(sg_t, h.shape),
                ],
                axis=-1,
            )
        else:
            global_x = h

        w = nn.Conv(
            128, (1,), kernel_init=layers.kaiming_uniform_conv, name="attention_0"
        )(global_x)
        w = nn.relu(w)
        w = layers.torch_batch_norm(name="attention_2")(
            w, use_running_average=not train
        )
        w = nn.Conv(
            1536, (1,), kernel_init=layers.kaiming_uniform_conv, name="attention_3"
        )(w)
        w = jax.nn.softmax(w, axis=1)  # softmax over time (torch dim=2 on NCL)

        mu = jnp.sum(h * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(h * h * w, axis=1) - mu * mu, 1e-4, 1e4))
        h = jnp.concatenate([mu, sg], axis=-1)  # (B, 3072)

        h = layers.torch_batch_norm(name="bn5")(h, use_running_average=not train)
        h = nn.Dense(
            self.n_out,
            kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(3072),
            name="fc6",
        )(h)
        if self.out_bn:
            h = layers.torch_batch_norm(name="bn6")(h, use_running_average=not train)
        return h


def prepare_model() -> RawNet3:
    """Mirror of the reference factory (rawnet3.py:277-291)."""
    return RawNet3()
