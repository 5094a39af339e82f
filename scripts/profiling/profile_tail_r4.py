#!/usr/bin/env python
"""Round-4 tail apportionment: where do the ~15 ms/step outside the
frontend+layer0 go?

Measures, at the flagship PGD step shapes (batch 256, bf16 trunk,
BN-folded eval mode), the fwd+bwd device time of:
  * the mid trunk (conv3..conv13 + pools), input (256, 202, 40, 32)
  * the late trunk (conv16..conv25 + pool), input (256, 101, 20, 48)
  * wait — after conv13's pool the plane is (50, 10, 64); both blocks
    are cut exactly at the model's own block boundaries below
  * the BLSTM head (2x BiLSTM + residual mean + dense) at
    (256, 50, 160), for unroll in {1, 4, 10, 25, 50}

Same scan-in-jit timing methodology as profile_r3b.py (INNER
applications inside one lax.scan, data dependence threaded through the
carry; two-pass: compile, then fresh-process measure).
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
    return jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2) * 1e-6)


def conv(x, cin, cout, k, key):
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.05
    return jax.lax.conv_general_dilated(
        x.astype(DT), w.astype(DT), (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    mfm = layers.max_feature_map
    out = {}

    # --- mid trunk: conv3(1x1,32->64) MFM, conv6(3x3,32->96) MFM+pool,
    #     conv10(1x1,48->96) MFM, conv13(3x3,48->128) MFM+pool
    def mid(h):
        h = mfm(conv(h, 32, 64, 1, keys[0]))
        h = layers.mfm_pool_2d(conv(h, 32, 96, 3, keys[1]))
        h = mfm(conv(h, 48, 96, 1, keys[2]))
        h = layers.mfm_pool_2d(conv(h, 48, 128, 3, keys[3]))
        return h

    # --- late trunk: conv16(1x1,64->128) MFM, conv19(3x3,64->64) MFM,
    #     conv22(1x1,32->64) MFM, conv25(3x3,32->64) MFM+pool
    def late(h):
        h = mfm(conv(h, 64, 128, 1, keys[4]))
        h = mfm(conv(h, 64, 64, 3, keys[5]))
        h = mfm(conv(h, 32, 64, 1, keys[6]))
        h = layers.mfm_pool_2d(conv(h, 32, 64, 3, keys[7]))
        return h

    x_mid = jax.random.normal(keys[8], (BATCH, 202, 40, 32), DT)
    x_late = jax.random.normal(keys[9], (BATCH, 50, 10, 64), DT)

    out["mid_fwd_ms"] = scan_time(mid, x_mid)
    out["mid_fwdbwd_ms"] = scan_time(grad_of(mid), x_mid)
    out["late_fwd_ms"] = scan_time(late, x_late)
    out["late_fwdbwd_ms"] = scan_time(grad_of(late), x_late)

    # --- BLSTM head at (B, 50, 160): 2x BiLSTM(80) + residual mean
    x_seq = jax.random.normal(keys[10], (BATCH, 50, 160), jnp.float32)
    for unroll in (1, 4, 10, 25, 50):
        class Head(layers.nn.Module):
            @layers.nn.compact
            def __call__(self, h):
                h0 = h
                h = layers.BiLSTM(80, unroll=unroll, name="blstm0")(h)
                h = layers.BiLSTM(80, unroll=unroll, name="blstm1")(h)
                return (h + h0).mean(axis=1)

        head = Head()
        vs = head.init(keys[11], x_seq)
        fn = lambda x: head.apply(vs, x)
        out[f"head_u{unroll}_fwd_ms"] = scan_time(fn, x_seq)
        out[f"head_u{unroll}_fwdbwd_ms"] = scan_time(grad_of(fn), x_seq)

    for k, v in out.items():
        print(f"{k:28s}{v:8.3f}")
    Path(__file__).with_suffix(".json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
