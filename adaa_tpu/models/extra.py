"""Additional detector architectures carried by the reference tree.

The reference ships RawNet2, MesoNet (Meso4 / MesoInception4), and
Xception but does not wire them into its model factory (reference:
src/models/models.py only dispatches rawnet3/lcnn/specrnet; SURVEY
§2.3 marks these "dead"). They are provided here for inventory
completeness, reachable through ``adaa_tpu.models.extra.get_extra_model``.

Behavioral sources:
* RawNet2  — src/models/raw_net2.py:18-372 (ASVspoof2021 baseline):
  fixed mel-spaced sinc filterbank, |.|+maxpool3, six attention-gated
  residual blocks, unidirectional multi-layer GRU. The
  compute-and-discard ``bn1`` quirk of the residual blocks
  (raw_net2.py:127-133) is reproduced.
* Meso4 / MesoInception4 — src/models/mesonet.py:9-171 (FakeAVCeleb).
  Note Meso4 re-uses bn1 (8ch) after conv2 and bn2 (16ch) after
  conv3/conv4 exactly as the torch code does.
* Xception — src/models/xception.py:79-306.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adaa_tpu.models import layers


# ---------------------------------------------------------------------------
# RawNet2
# ---------------------------------------------------------------------------

def _rawnet2_sinc_filters(out_channels: int, kernel_size: int,
                          sample_rate: int = 16000) -> np.ndarray:
    """Fixed mel-spaced band-pass sinc bank (raw_net2.py:54-78)."""
    if kernel_size % 2 == 0:
        kernel_size += 1
    nfft = 512
    f = int(sample_rate / 2) * np.linspace(0, 1, int(nfft / 2) + 1)
    fmel = 2595 * np.log10(1 + f / 700)
    filbandwidthsmel = np.linspace(fmel.min(), fmel.max(), out_channels + 1)
    mel = 700 * (10 ** (filbandwidthsmel / 2595) - 1)
    hsupp = np.arange(-(kernel_size - 1) / 2, (kernel_size - 1) / 2 + 1)
    ham = np.hamming(kernel_size)
    bank = np.zeros((out_channels, kernel_size))
    for i in range(out_channels):
        fmin, fmax = mel[i], mel[i + 1]
        h_high = (2 * fmax / sample_rate) * np.sinc(2 * fmax * hsupp / sample_rate)
        h_low = (2 * fmin / sample_rate) * np.sinc(2 * fmin * hsupp / sample_rate)
        bank[i] = ham * (h_high - h_low)
    return bank.astype(np.float32)  # (C, K)


class ResidualBlock1D(nn.Module):
    """Residual_block (raw_net2.py:85-143) — same conv1(x) quirk as
    SpecRNet's 2D blocks."""

    in_channels: int
    out_channels: int
    first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, name: nn.Conv(
            f, (k,), padding=[(k // 2, k // 2)],
            kernel_init=layers.kaiming_uniform_conv, name=name,
        )
        identity = x
        if not self.first:
            dead = layers.torch_batch_norm(name="bn1")(
                x, use_running_average=not train
            )
            del dead
        out = conv(self.out_channels, 3, "conv1")(x)
        out = layers.torch_batch_norm(name="bn2")(out, use_running_average=not train)
        out = nn.leaky_relu(out, negative_slope=0.3)
        out = conv(self.out_channels, 3, "conv2")(out)
        if self.in_channels != self.out_channels:
            identity = conv(self.out_channels, 1, "conv_downsample")(identity)
        return layers.max_pool_1d(out + identity, 3)


class UniGRU(nn.Module):
    """torch.nn.GRU(batch_first=True, bidirectional=False, num_layers)."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = x
        for layer in range(self.num_layers):
            out = layers.TorchGRU(self.hidden_size, name=f"l{layer}")(out)
        return out


class RawNet2(nn.Module):
    """RawNet2 with the ASVspoof2021 baseline hyperparameters."""

    filts: Sequence = (20, (20, 20), (20, 128), (128, 128))
    first_conv: int = 1024  # sinc kernel length
    gru_node: int = 1024
    nb_gru_layer: int = 3
    nb_fc_node: int = 1024
    nb_classes: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.ndim == 2
        bank = _rawnet2_sinc_filters(self.filts[0], self.first_conv)
        kern = jnp.asarray(bank.T[:, None, :])  # (K, 1, C)
        h = jax.lax.conv_general_dilated(
            x[:, :, None], kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )  # (B, T, C)
        h = layers.max_pool_1d(jnp.abs(h), 3)
        h = layers.torch_batch_norm(name="first_bn")(h, use_running_average=not train)
        h = nn.selu(h)

        def gate(x_blk, width, name):
            y = x_blk.mean(axis=1)
            y = nn.Dense(
                width, kernel_init=layers.kaiming_uniform_linear,
                bias_init=layers.conv_bias_init(width), name=name,
            )(y)
            y = jax.nn.sigmoid(y)[:, None, :]
            return x_blk * y + y

        f1_in, f1_out = self.filts[1]
        f2_in, f2_out = self.filts[2]
        specs = [
            (f1_in, f1_out, True), (f1_out, f1_out, False),
            (f2_in, f2_out, False), (f2_out, f2_out, False),
            (f2_out, f2_out, False), (f2_out, f2_out, False),
        ]
        for i, (cin, cout, first) in enumerate(specs):
            h = ResidualBlock1D(cin, cout, first=first, name=f"block{i}")(h, train)
            h = gate(h, cout, f"fc_attention{i}")

        h = layers.torch_batch_norm(name="bn_before_gru")(
            h, use_running_average=not train
        )
        h = nn.selu(h)
        h = UniGRU(self.gru_node, self.nb_gru_layer, name="gru")(h)
        h = h[:, -1, :]
        h = nn.Dense(
            self.nb_fc_node, kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(self.gru_node), name="fc1_gru",
        )(h)
        h = nn.Dense(
            self.nb_classes, kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(self.nb_fc_node), name="fc2_gru",
        )(h)
        return h


# ---------------------------------------------------------------------------
# MesoNet
# ---------------------------------------------------------------------------

class Meso4(nn.Module):
    """Meso4 (mesonet.py:9-61). Input NCHW feature maps."""

    num_classes: int = 1
    input_channels: int = 3
    fc1_dim: int = 16 * 7 * 7

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            kernel_init=layers.kaiming_uniform_conv, name=name,
        )
        bn1 = layers.torch_batch_norm(name="bn1")
        bn2 = layers.torch_batch_norm(name="bn2")

        h = bn1(nn.relu(conv(8, 3, "conv1")(h)), use_running_average=not train)
        h = layers.max_pool_2d(h, 2)
        h = bn1(nn.relu(conv(8, 5, "conv2")(h)), use_running_average=not train)
        h = layers.max_pool_2d(h, 2)
        h = bn2(nn.relu(conv(16, 5, "conv3")(h)), use_running_average=not train)
        h = layers.max_pool_2d(h, 2)
        h = bn2(nn.relu(conv(16, 5, "conv4")(h)), use_running_average=not train)
        h = layers.max_pool_2d(h, 4)

        # torch flattens NCHW (C-major); transpose back before reshape
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = nn.Dense(16, kernel_init=layers.kaiming_uniform_linear,
                     name="fc1")(h)
        h = nn.leaky_relu(h, negative_slope=0.1)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes,
                        kernel_init=layers.kaiming_uniform_linear, name="fc2")(h)


class MesoInception4(nn.Module):
    """MesoInception4 (mesonet.py:63-171)."""

    num_classes: int = 1
    input_channels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = jnp.transpose(x, (0, 2, 3, 1))
        conv = lambda f, k, d, name: nn.Conv(
            f, (k, k), kernel_dilation=(d, d),
            padding=[((k // 2) * d, (k // 2) * d)] * 2, use_bias=False,
            kernel_init=layers.kaiming_uniform_conv, name=name,
        )

        def inception(h, idx, train):
            x1 = conv(2 if idx == 2 else 1, 1, 1, f"i{idx}_conv1")(h)
            x2 = conv(4, 1, 1, f"i{idx}_conv2_1")(h)
            x2 = conv(4, 3, 1, f"i{idx}_conv2_2")(x2)
            x3 = conv(4, 1, 1, f"i{idx}_conv3_1")(h)
            x3 = conv(4, 3, 2, f"i{idx}_conv3_2")(x3)
            x4 = conv(2, 1, 1, f"i{idx}_conv4_1")(h)
            x4 = conv(2, 3, 3, f"i{idx}_conv4_2")(x4)
            y = jnp.concatenate([x1, x2, x3, x4], axis=-1)
            y = layers.torch_batch_norm(name=f"i{idx}_bn")(
                y, use_running_average=not train
            )
            return layers.max_pool_2d(y, 2)

        h = inception(h, 1, train)
        h = inception(h, 2, train)

        bn1 = layers.torch_batch_norm(name="bn1")
        h = bn1(nn.relu(
            conv(16, 5, 1, "conv1")(h)), use_running_average=not train)
        h = layers.max_pool_2d(h, 2)
        h = bn1(nn.relu(
            conv(16, 5, 1, "conv2")(h)), use_running_average=not train)
        h = layers.max_pool_2d(h, 4)

        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.Dense(16, kernel_init=layers.kaiming_uniform_linear, name="fc1")(h)
        h = nn.leaky_relu(h, negative_slope=0.1)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes,
                        kernel_init=layers.kaiming_uniform_linear, name="fc2")(h)


# ---------------------------------------------------------------------------
# Xception
# ---------------------------------------------------------------------------

def _overlap_max_pool_2d(x: jax.Array, window: int = 3, stride: int = 2,
                         pad: int = 1) -> jax.Array:
    """MaxPool2d(3, 2, padding=1) via shifted strided slices (avoids the
    slow SelectAndScatter backward of reduce_window)."""
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 constant_values=neg)
    h = (x.shape[1] + 2 * pad - window) // stride + 1
    w = (x.shape[2] + 2 * pad - window) // stride + 1
    out = None
    for di in range(window):
        for dj in range(window):
            sl = xp[:, di : di + (h - 1) * stride + 1 : stride,
                    dj : dj + (w - 1) * stride + 1 : stride, :]
            out = sl if out is None else jnp.maximum(out, sl)
    return out


class SeparableConv(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(
            c, (self.kernel, self.kernel),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            feature_group_count=c, use_bias=False,
            kernel_init=layers.kaiming_uniform_conv, name="conv1",
        )(x)
        return nn.Conv(
            self.features, (1, 1), use_bias=False,
            kernel_init=layers.kaiming_uniform_conv, name="pointwise",
        )(h)


class XceptionBlock(nn.Module):
    in_filters: int
    out_filters: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: layers.torch_batch_norm(name=name)
        h = x
        ops = []
        filters = self.in_filters
        idx = 0
        if self.grow_first:
            ops.append(("relu", None))
            ops.append(("sep", (self.out_filters, f"sep{idx}")))
            idx += 1
            filters = self.out_filters
        for _ in range(self.reps - 1):
            ops.append(("relu", None))
            ops.append(("sep", (filters, f"sep{idx}")))
            idx += 1
        if not self.grow_first:
            ops.append(("relu", None))
            ops.append(("sep", (self.out_filters, f"sep{idx}")))
            idx += 1
        if not self.start_with_relu:
            ops = ops[1:]

        bn_i = 0
        for kind, arg in ops:
            if kind == "relu":
                h = nn.relu(h)
            else:
                feats, name = arg
                h = SeparableConv(feats, name=name)(h)
                h = bn(f"bn{bn_i}")(h, use_running_average=not train)
                bn_i += 1
        if self.strides != 1:
            h = _overlap_max_pool_2d(h, 3, self.strides, 1)

        if self.out_filters != self.in_filters or self.strides != 1:
            skip = nn.Conv(
                self.out_filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, kernel_init=layers.kaiming_uniform_conv,
                name="skip",
            )(x)
            skip = bn("skipbn")(skip, use_running_average=not train)
        else:
            skip = x
        return h + skip


class Xception(nn.Module):
    """Xception (xception.py:144-306) with adaptive-avg-pool logits."""

    num_classes: int = 1
    input_channels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = jnp.transpose(x, (0, 2, 3, 1))
        bn = lambda name: layers.torch_batch_norm(name=name)
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
                    kernel_init=layers.kaiming_uniform_conv, name="conv1")(h)
        h = nn.relu(bn("bn1")(h, use_running_average=not train))
        h = nn.Conv(64, (3, 3), padding="VALID", use_bias=False,
                    kernel_init=layers.kaiming_uniform_conv, name="conv2")(h)
        h = nn.relu(bn("bn2")(h, use_running_average=not train))

        cfg = [
            (64, 128, 2, 2, False, True), (128, 256, 2, 2, True, True),
            (256, 728, 2, 2, True, True),
        ] + [(728, 728, 3, 1, True, True)] * 8 + [
            (728, 1024, 2, 2, True, False),
        ]
        for i, (ci, co, reps, st, swr, gf) in enumerate(cfg):
            h = XceptionBlock(ci, co, reps, st, swr, gf, name=f"block{i + 1}")(
                h, train
            )

        h = SeparableConv(1536, name="conv3")(h)
        h = nn.relu(bn("bn3")(h, use_running_average=not train))
        h = SeparableConv(2048, name="conv4")(h)
        h = bn("bn4")(h, use_running_average=not train)

        h = nn.relu(h)
        h = h.mean(axis=(1, 2))  # adaptive_avg_pool2d(1)
        return nn.Dense(self.num_classes,
                        kernel_init=layers.kaiming_uniform_linear,
                        name="last_linear")(h)


def get_extra_model(model_name: str, config: dict) -> nn.Module:
    """Factory for the reference's unwired architectures."""
    if model_name == "rawnet2":
        return RawNet2(**{k: v for k, v in config.items()
                          if k in RawNet2.__dataclass_fields__})
    if model_name == "mesonet" or model_name == "meso4":
        return Meso4(
            num_classes=config.get("num_classes", 1),
            input_channels=config.get("input_channels", 3),
            fc1_dim=config.get("fc1_dim", 16 * 7 * 7),
        )
    if model_name == "meso_inception4":
        return MesoInception4(
            num_classes=config.get("num_classes", 1),
            input_channels=config.get("input_channels", 3),
        )
    if model_name == "xception":
        return Xception(
            num_classes=config.get("num_classes", 1),
            input_channels=config.get("input_channels", 3),
        )
    raise ValueError(f"Extra model '{model_name}' not supported")
