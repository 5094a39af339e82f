#!/usr/bin/env python
"""Test the lane-padding theory + Toeplitz-matmul layer-0 candidate.

1. Same-element-count elementwise max chains at different minor dims:
   (256,404,80,64) vs (256,404,40,128) vs (256,404,5120) — if sub-128
   minor dims pay physical padding, the first is ~2x slower.
2. Layer-0 block candidates, fwd+bwd:
   a. status quo: conv 5x5 1->64 + split-MFM + reshape-max pool
   b. Toeplitz matmul (B,404,400)@(400,5120) + fused lane-space epilogue
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

B = 256
T = 404
F = 80
C = 64


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    n = B * T * F * C

    # --- 1. lane-padding probe ---
    for shape in [(B, T, F, C), (B, T, F * C // 128, 128)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                        ).astype(jnp.bfloat16)

        @jax.jit
        def chain(x):
            for _ in range(4):
                x = jnp.maximum(x, 0.1 * x) + 0.01
            return x

        print(f"max-chain {str(shape):24s}: {timeit(chain, x):6.2f} ms",
              flush=True)

    # --- 2a. status quo layer-0 ---
    x = jnp.asarray(rng.standard_normal((B, T, F, 1)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((5, 5, 1, C)) * 0.2).astype(
        np.float32)).astype(jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def block_a(x, w):
        y = conv(x, w)
        a, b = jnp.split(y, 2, axis=-1)
        y = jnp.maximum(a, b)
        y = y.reshape(B, T // 2, 2, F // 2, 2, C // 2)
        return y.max(axis=(2, 4))

    fa = jax.jit(lambda x, w: block_a(x, w).astype(jnp.float32))
    ga = jax.jit(jax.grad(
        lambda x, w: block_a(x, w).astype(jnp.float32).sum(), argnums=0))
    print(f"layer0 conv+mfm+pool fwd    : {timeit(fa, x, w):6.2f} ms",
          flush=True)
    print(f"layer0 conv+mfm+pool fwd+bwd: {timeit(ga, x, w):6.2f} ms",
          flush=True)

    # --- 2b. Toeplitz matmul + lane-space epilogue ---
    # W_toep[(dt,fi),(fo,c)] = w[dt, fi-fo+2, c]
    def build_wtoep(w):
        # (5, 5, 1, C) -> (5*F, F*C)
        fi = jnp.arange(F)[None, :, None, None]
        fo = jnp.arange(F)[None, None, :, None]
        dt = jnp.arange(5)[:, None, None, None]
        df = fi - fo + 2  # (5, F, F, 1) broadcast
        valid = (df >= 0) & (df < 5)
        dfc = jnp.clip(df, 0, 4)
        # gather w[dt, dfc, 0, c]
        wt = w[dt, dfc, 0, :]  # (5, F, F, C)
        wt = jnp.where(valid[..., None] * jnp.ones((1, 1, 1, C), bool),
                       wt, 0.0)
        return wt.reshape(5 * F, F * C)

    wt_const = build_wtoep(w).astype(jnp.bfloat16)  # (400, 5120)

    def block_b(x, wt):
        xs = x[:, :, :, 0]  # (B, T, F)
        xp = jnp.pad(xs, ((0, 0), (2, 2), (0, 0)))
        xu = jnp.concatenate([xp[:, i:i + T, :] for i in range(5)],
                             axis=-1)  # (B, T, 400)
        y = jnp.einsum("btk,kn->btn", xu, wt)
        # lanes n = (f*C + c); mfm: max(c, c+32); pool: max over
        # (t pairs, f pairs)
        y = y.reshape(B, T // 2, 2, F // 2, 2, 2, C // 2)
        return y.max(axis=(2, 4, 5)).reshape(B, T // 2, (F // 2) * (C // 2))

    fb = jax.jit(lambda x, wt: block_b(x, wt).astype(jnp.float32))
    gb = jax.jit(jax.grad(
        lambda x, wt: block_b(x, wt).astype(jnp.float32).sum(), argnums=0))
    # correctness vs block_a
    ya = fa(x, w)
    yb = fb(x, wt_const).reshape(ya.shape)
    err = float(jnp.abs(ya - yb).max())
    print(f"toeplitz vs conv max err: {err:.5f}", flush=True)
    print(f"layer0 toeplitz fwd    : {timeit(fb, x, wt_const):6.2f} ms",
          flush=True)
    print(f"layer0 toeplitz fwd+bwd: {timeit(gb, x, wt_const):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
