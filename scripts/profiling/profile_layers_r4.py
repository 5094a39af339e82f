#!/usr/bin/env python
"""LCNN mid-trunk restructure experiments (round 4).

profile_layers18 showed the mid-trunk convs run at 2-20%% MFU: channel
counts of 32-64 waste 50-75%% of the 128-lane MXU/VPU width, so the
18 ms of conv+MFM(+pool) time is layout-bound, not FLOP-bound. Before
touching the model, measure restructured-but-equivalent forms of the
two heaviest layers (conv6: 3x3 32->96 @202x40, conv13: 3x3 48->128
@101x20) plus the conv3+conv6 1x1->3x3 pair:

  base      — lax conv + MFM (+pool), the current trunk form
  im2col    — 9 shifted H/W slices stacked on channels (C*9 >= 288
              contracted dim), then ONE matmul onto the MXU
  halfmax   — MFM as max(conv(x, W_left), conv(x, W_right)): lets the
              max fuse into two conv epilogues instead of a
              split+max pass over the full-width output
  pair      — conv3(1x1)+MFM+conv6(3x3)+MFM+pool as one jitted body
              in base vs im2col form (does a fused expression help?)

Scan-based two-pass methodology as profile_layers18.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parents[2] / ".jax_cache")
)

from adaa_tpu.models import layers

BATCH = 256
INNER = 8
DT = jnp.bfloat16


def scan_time(fn, x, iters=3):
    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            c = c + (leaf.ravel()[:1] * 1e-30).astype(c.dtype).reshape(
                (1,) * (c.ndim - 1) + (1,)
            )
            return c, ()

        c, _ = jax.lax.scan(body, x0, None, length=INNER)
        return c

    out = run(x)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters / INNER * 1000.0


def grad_of(fn):
    return jax.grad(lambda a: fn(a).astype(jnp.float32).sum())


def conv2d(h, k, pad):
    return jax.lax.conv_general_dilated(
        h, k, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col_conv3x3(h, kmat, feat):
    """3x3 'same' conv as 9-slice channel stack + one matmul.

    kmat: (9 * Cin, Cout) — kernel reshaped with the (dy, dx) taps on
    the leading axis in row-major order.
    """
    b, hh, ww, c = h.shape
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [hp[:, dy:dy + hh, dx:dx + ww, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, 9C)
    return jax.lax.dot_general(
        patches, kmat,
        (((3,), (0,)), ((), ())),
        preferred_element_type=DT)


def main():
    rng = np.random.default_rng(0)
    results = {}

    cases = [
        ("conv6", 96, 32, 202, 40, True),
        ("conv13", 128, 48, 101, 20, True),
    ]
    for name, feat, cin, h, w, pooled in cases:
        x = jnp.asarray(rng.standard_normal(
            (BATCH, h, w, cin)).astype(np.float32)).astype(DT)
        kern = jnp.asarray((rng.standard_normal(
            (3, 3, cin, feat)) * 0.05).astype(np.float32)).astype(DT)
        bias = jnp.zeros((feat,), DT)
        kmat = kern.reshape(9 * cin, feat)
        post = layers.mfm_pool_2d if pooled else layers.max_feature_map

        def base(hh, kern=kern, bias=bias, post=post):
            return post(conv2d(hh, kern, 1) + bias)

        def im2col(hh, kmat=kmat, bias=bias, post=post, feat=feat):
            return post(im2col_conv3x3(hh, kmat, feat) + bias)

        def halfmax(hh, kern=kern, bias=bias, feat=feat, pooled=pooled):
            kl, kr = kern[..., :feat // 2], kern[..., feat // 2:]
            bl, br = bias[:feat // 2], bias[feat // 2:]
            y = jnp.maximum(conv2d(hh, kl, 1) + bl, conv2d(hh, kr, 1) + br)
            if pooled:
                b2, h2, w2, c2 = y.shape
                y = y[:, : h2 // 2 * 2, : w2 // 2 * 2, :]  # floor mode
                y = y.reshape(b2, h2 // 2, 2, w2 // 2, 2, c2).max((2, 4))
            return y

        def lanepool(hh, kern=kern, bias=bias, feat=feat, pooled=pooled):
            """MFM + 2x2 pool as free views + lane-sliced max tree: the
            (B,H/2,2,W/2,2,C/2) reshape-max puts width-2 dims on sublane
            axes (mosaic relayouts); fusing them into the lane dim needs
            only C-multiple lane slices."""
            y = conv2d(hh, kern, 1) + bias
            if not pooled:
                c = y.shape[-1]
                return jnp.maximum(y[..., :c // 2], y[..., c // 2:])
            b2, h2, w2, c2 = y.shape
            h3, w3 = h2 // 2, w2 // 2
            y = y[:, : h3 * 2, :, :].reshape(b2, h3, 2 * w2 * c2)
            y = jnp.maximum(y[..., : w2 * c2], y[..., w2 * c2:])
            y = y.reshape(b2, h3, w3, 2 * c2)  # w2 even for these layers
            y = jnp.maximum(y[..., :c2], y[..., c2:])
            return jnp.maximum(y[..., : c2 // 2], y[..., c2 // 2:])

        for tag, fn in (("base", base), ("im2col", im2col),
                        ("halfmax", halfmax), ("lanepool", lanepool)):
            results[f"{name}_{tag}_fwd_ms"] = scan_time(fn, x)
            results[f"{name}_{tag}_fwdbwd_ms"] = scan_time(grad_of(fn), x)
            print(f"{name}_{tag}: fwd {results[f'{name}_{tag}_fwd_ms']:.3f} "
                  f"fwdbwd {results[f'{name}_{tag}_fwdbwd_ms']:.3f}",
                  flush=True)

    # conv3 (1x1 32->64) + MFM + conv6 (3x3 32->96) + MFM + pool pair
    x = jnp.asarray(rng.standard_normal(
        (BATCH, 202, 40, 32)).astype(np.float32)).astype(DT)
    k1 = jnp.asarray((rng.standard_normal(
        (1, 1, 32, 64)) * 0.05).astype(np.float32)).astype(DT)
    b1 = jnp.zeros((64,), DT)
    k6 = jnp.asarray((rng.standard_normal(
        (3, 3, 32, 96)) * 0.05).astype(np.float32)).astype(DT)
    b6 = jnp.zeros((96,), DT)
    k6mat = k6.reshape(9 * 32, 96)

    def pair_base(hh):
        y = layers.max_feature_map(conv2d(hh, k1, 0) + b1)
        return layers.mfm_pool_2d(conv2d(y, k6, 1) + b6)

    def pair_im2col(hh):
        y = layers.max_feature_map(
            jax.lax.dot_general(hh, k1.reshape(32, 64),
                                (((3,), (0,)), ((), ())),
                                preferred_element_type=DT) + b1)
        return layers.mfm_pool_2d(im2col_conv3x3(y, k6mat, 96) + b6)

    for tag, fn in (("base", pair_base), ("im2col", pair_im2col)):
        results[f"pair_{tag}_fwd_ms"] = scan_time(fn, x)
        results[f"pair_{tag}_fwdbwd_ms"] = scan_time(grad_of(fn), x)
        print(f"pair_{tag}: fwd {results[f'pair_{tag}_fwd_ms']:.3f} "
              f"fwdbwd {results[f'pair_{tag}_fwdbwd_ms']:.3f}", flush=True)

    out = Path(__file__).parent / "profile_layers_r4.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
