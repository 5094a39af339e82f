#!/usr/bin/env python
"""Fusion experiments for the MFM/pool elementwise machinery."""
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


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def make_weights(rng):
    specs = [(5, 1, 64), (1, 32, 64), (3, 32, 96), (1, 48, 96),
             (3, 48, 128), (1, 64, 128), (3, 64, 64), (1, 32, 64),
             (3, 3 * 0 + 32, 64)]
    ws = []
    for k, ci, co in specs:
        w = rng.standard_normal((k, k, ci, co)).astype(np.float32) * 0.05
        ws.append(jnp.asarray(w).astype(jnp.bfloat16))
    return ws


POOL_AFTER = {0, 2, 4, 8}
KS = [5, 1, 3, 1, 3, 1, 3, 1, 3]


def conv(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def mfm(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.maximum(a, b)


def pool(x):
    b, t, f, c = x.shape
    x = x[:, : t // 2 * 2, : f // 2 * 2]
    x = x.reshape(b, t // 2, 2, f // 2, 2, c)
    return x.max(axis=(2, 4))


def mfm_pool_fused(x):
    # MFM (max over channel halves) + 2x2 maxpool as ONE reduce:
    # out[t',f',c] = max over (dt, df, half)
    b, t, f, c = x.shape
    x = x[:, : t // 2 * 2, : f // 2 * 2]
    x = x.reshape(b, t // 2, 2, f // 2, 2, 2, c // 2)
    return x.max(axis=(2, 4, 5))


def mfm_reshape(x):
    b, t, f, c = x.shape
    return x.reshape(b, t, f, 2, c // 2).max(axis=3)


def stack(x, ws, mfm_fn, fuse_pool):
    for i, (w, k) in enumerate(zip(ws, KS)):
        y = conv(x, w, k)
        if i in POOL_AFTER:
            x = mfm_pool_fused(y) if fuse_pool else pool(mfm_fn(y))
        else:
            x = mfm_fn(y)
    return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 404, 80, 1)).astype(
        np.float32)).astype(jnp.bfloat16)
    ws = make_weights(rng)

    variants = {
        "split-mfm + pool (status quo)": (mfm, False),
        "reshape-mfm + pool": (mfm_reshape, False),
        "fused mfm_pool reduce": (mfm_reshape, True),
    }
    for name, (mf, fp) in variants.items():
        f_fwd = jax.jit(
            lambda x, mf=mf, fp=fp: stack(x, ws, mf, fp).astype(jnp.float32))
        f_bwd = jax.jit(jax.grad(
            lambda x, mf=mf, fp=fp: stack(x, ws, mf, fp).astype(
                jnp.float32).sum()))
        tf = timeit(f_fwd, x)
        tb = timeit(f_bwd, x)
        print(f"{name:30s} fwd {tf:6.2f} ms | fwd+bwd {tb:6.2f} ms",
              flush=True)

    # MFM via custom VJP storing only the argmax bit? try stop-grad trick:
    # grad of max == select(a>b) — XLA already does that. Instead try
    # bf16-cotangent check: is backward running in f32 anywhere? Cast test:
    def stack_fused_c(x):
        return stack(x, ws, mfm_reshape, True)

    # remat the fused stack
    f_bwd = jax.jit(jax.grad(
        lambda x: jax.checkpoint(stack_fused_c)(x).astype(jnp.float32).sum()))
    print(f"fused + remat                  fwd+bwd {timeit(f_bwd, x):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
