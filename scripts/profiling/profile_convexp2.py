#!/usr/bin/env python
"""In-program ablations of the LCNN conv stack backward cost.

All variants run the 9-conv shape sequence in ONE jit program:
  V1: convs only (pool -> stride slice, MFM -> channel slice)
  V2: full stack (MFM + reshape-max pools + BN) — status quo
  V3: V2 with jax.checkpoint (remat) around the whole stack
  V4: V2 with pools as strided convs fused into the next conv? (skip)
  V5: V2 in NCHW dimension numbers
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


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def make_weights(rng, nchw=False):
    specs = [(5, 1, 64), (1, 32, 64), (3, 32, 96), (1, 48, 96),
             (3, 48, 128), (1, 64, 128), (3, 64, 64), (1, 32, 64),
             (3, 32, 64)]
    ws = []
    for k, ci, co in specs:
        w = rng.standard_normal((k, k, ci, co)).astype(np.float32) * 0.05
        ws.append(jnp.asarray(w).astype(jnp.bfloat16))
    return ws


POOL_AFTER = {0, 2, 4, 8}  # conv indices followed by 2x2 maxpool
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


def stack_full(x, ws):
    for i, (w, k) in enumerate(zip(ws, KS)):
        x = mfm(conv(x, w, k))
        if i in POOL_AFTER:
            x = pool(x)
    return x


def stack_convs_only(x, ws):
    for i, (w, k) in enumerate(zip(ws, KS)):
        x = conv(x, w, k)[..., : w.shape[-1] // 2]  # slice, not max
        if i in POOL_AFTER:
            x = x[:, ::2, ::2]
    return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 404, 80, 1)).astype(
        np.float32)).astype(jnp.bfloat16)
    ws = make_weights(rng)

    variants = {
        "V1 convs only": stack_convs_only,
        "V2 full stack": stack_full,
        "V3 remat full": jax.checkpoint(stack_full),
    }
    for name, fn in variants.items():
        f_fwd = jax.jit(lambda x, fn=fn: fn(x, ws).astype(jnp.float32))
        f_bwd = jax.jit(jax.grad(
            lambda x, fn=fn: fn(x, ws).astype(jnp.float32).sum()))
        tf = timeit(f_fwd, x)
        tb = timeit(f_bwd, x)
        print(f"{name:16s} fwd {tf:6.2f} ms | fwd+bwd {tb:6.2f} ms",
              flush=True)

    # remat with per-conv granularity: checkpoint each conv block
    def stack_remat_each(x, ws):
        for i, (w, k) in enumerate(zip(ws, KS)):
            blk = jax.checkpoint(
                lambda x, w, k=k, i=i: (
                    pool(mfm(conv(x, w, k))) if i in POOL_AFTER
                    else mfm(conv(x, w, k))))
            x = blk(x, w)
        return x

    f_bwd = jax.jit(jax.grad(
        lambda x: stack_remat_each(x, ws).astype(jnp.float32).sum()))
    print(f"V4 remat/conv    fwd+bwd {timeit(f_bwd, x):6.2f} ms", flush=True)

    # f32 everything (parity mode cost reference)
    x32 = x.astype(jnp.float32)
    ws32 = [w.astype(jnp.float32) for w in ws]
    f_bwd32 = jax.jit(jax.grad(
        lambda x: stack_full(x, ws32).sum()))
    print(f"V5 f32 full      fwd+bwd {timeit(f_bwd32, x32):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
