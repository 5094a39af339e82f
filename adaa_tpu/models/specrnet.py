"""SpecRNet detector in flax, TPU-native layout.

Behavioral equivalent of the reference (reference:
src/models/specrnet.py:23-214, lineage piotrkawa/specrnet): three
residual 2D blocks with squeeze-style FC attention gates
(``x*y + y``), interleaved max-pools, BN+SELU, a 2-layer bidirectional
GRU over the time axis, and two dense layers to a single logit.

Faithfully reproduced quirks (documented, deliberate):
* In non-first residual blocks the reference computes ``bn1 + lrelu``
  and then discards the result — ``conv1`` is applied to the raw input
  (src/models/specrnet.py:75-81). We reproduce this, including the
  side effect that bn1's running stats update during training.
* The input is NOT transposed, so convs see (coeff, time) as (H, W)
  — unlike LCNN.

Layout is NHWC; GRU recurrence via ``lax.scan`` (layers.BiGRU).
Config mirrors ``get_config`` (src/models/specrnet.py:23-30).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaa_tpu.models import layers
from adaa_tpu.ops import frontends


class ResidualBlock2D(nn.Module):
    """Residual_block2D equivalent (src/models/specrnet.py:32-91)."""

    in_channels: int
    out_channels: int
    first: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, name: nn.Conv(
            features=f,
            kernel_size=(k, k),
            padding=[(k // 2, k // 2)] * 2,
            kernel_init=layers.kaiming_uniform_conv,
            dtype=self.compute_dtype,
            name=name,
        )
        identity = x
        if not self.first:
            # reference quirk: bn1+lrelu result is discarded (conv1 sees x),
            # but bn1 stats still update in train mode — reproduce both.
            dead = layers.torch_batch_norm(
                name="bn1", dtype=self.compute_dtype
            )(x, use_running_average=not train)
            del dead

        out = conv(self.out_channels, 3, "conv1")(x)
        out = layers.torch_batch_norm(name="bn2", dtype=self.compute_dtype)(
            out, use_running_average=not train)
        out = nn.leaky_relu(out, negative_slope=0.3)
        out = conv(self.out_channels, 3, "conv2")(out)

        if self.in_channels != self.out_channels:
            identity = conv(self.out_channels, 1, "conv_downsample")(identity)

        out = out + identity
        return layers.max_pool_2d(out)


class SpecRNet(nn.Module):
    """SpecRNet with an optional on-device frontend."""

    input_channels: int = 1
    frontend_algorithm: Sequence[str] = ()
    filts: Sequence = (1, (1, 20), (20, 64), (64, 64))
    gru_node: int = 64
    nb_gru_layer: int = 2
    nb_fc_node: int = 64
    nb_classes: int = 1
    compute_dtype: Optional[jnp.dtype] = None  # bf16 trunk; GRU/frontend f32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 2:
            feat = frontends.get_frontend(list(self.frontend_algorithm))(x)
            if feat.ndim < 4:
                feat = feat[:, None, :, :]
        else:
            feat = x

        # NCHW (B, C, coeff, T) -> NHWC (B, coeff, T, C); no H/W swap
        # (the reference does not permute — src/models/specrnet.py:141).
        h = jnp.transpose(feat, (0, 2, 3, 1))
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)

        h = layers.torch_batch_norm(name="first_bn", dtype=self.compute_dtype)(
            h, use_running_average=not train)
        h = nn.selu(h)

        def attention_gate(x_blk: jax.Array, width: int, name: str) -> jax.Array:
            y = x_blk.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)
            y = nn.Dense(
                width,
                kernel_init=layers.kaiming_uniform_linear,
                bias_init=layers.conv_bias_init(width),
                name=name,
            )(y)
            y = jax.nn.sigmoid(y)[:, None, None, :]
            return x_blk * y + y

        f1_in, f1_out = self.filts[1]
        f2_in, f2_out = self.filts[2]

        h = ResidualBlock2D(f1_in, f1_out, first=True, name="block0",
                            compute_dtype=self.compute_dtype)(h, train)
        h = attention_gate(h, f1_out, "fc_attention0")
        h = layers.max_pool_2d(h)

        h = ResidualBlock2D(f2_in, f2_out, name="block2",
                            compute_dtype=self.compute_dtype)(h, train)
        h = attention_gate(h, f2_out, "fc_attention2")
        h = layers.max_pool_2d(h)

        h = ResidualBlock2D(f2_out, f2_out, name="block4",
                            compute_dtype=self.compute_dtype)(h, train)
        h = attention_gate(h, f2_out, "fc_attention4")
        h = layers.max_pool_2d(h)

        h = layers.torch_batch_norm(name="bn_before_gru",
                                    dtype=self.compute_dtype)(
            h, use_running_average=not train
        )
        h = nn.selu(h)
        h = h.squeeze(axis=1)  # (B, T', C) — coeff axis pooled to 1
        h = h.astype(jnp.float32)  # GRU recurrence stays f32

        h = layers.BiGRU(self.gru_node, num_layers=self.nb_gru_layer, name="gru")(h)
        h = h[:, -1, :]
        h = nn.Dense(
            self.nb_fc_node * 2,
            kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(self.gru_node * 2),
            name="fc1_gru",
        )(h)
        h = nn.Dense(
            self.nb_classes,
            kernel_init=layers.kaiming_uniform_linear,
            bias_init=layers.conv_bias_init(self.nb_fc_node * 2),
            name="fc2_gru",
        )(h)
        return h.astype(jnp.float32)


def get_config(input_channels: int) -> dict:
    """Mirror of the reference config factory (src/models/specrnet.py:23-30)."""
    return {
        "filts": [input_channels, [input_channels, 20], [20, 64], [64, 64]],
        "nb_fc_node": 64,
        "gru_node": 64,
        "nb_gru_layer": 2,
        "nb_classes": 1,
    }
