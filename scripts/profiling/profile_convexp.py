#!/usr/bin/env python
"""Conv micro-experiments: why do LCNN's small convs run at 1-10 TFLOP/s?

Variants per conv shape:
  A. autodiff igrad (status quo: jax.grad through lax.conv)
  B. manual igrad: same-shape fwd conv on dy with flipped/transposed kernel
  C. fwd alone
  D. 1x1 conv as reshaped matmul (fwd + manual igrad matmul)
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


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def conv_nhwc(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("conv0 5x5 1->64", (256, 404, 80, 1), 64, 5),
        ("conv6 3x3 32->96", (256, 202, 40, 32), 96, 3),
        ("conv16 1x1 64->128", (256, 50, 10, 64), 128, 1),
        ("conv19 3x3 64->64", (256, 50, 10, 64), 64, 3),
    ]
    for name, ishape, cout, k in shapes:
        cin = ishape[3]
        x = jnp.asarray(rng.standard_normal(ishape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(
            np.float32)).astype(jnp.bfloat16)

        @jax.jit
        def fwd(x, w):
            return conv_nhwc(x, w, k)

        @jax.jit
        def igrad_auto(x, w):
            return jax.grad(
                lambda x: conv_nhwc(x, w, k).astype(jnp.float32).sum())(x)

        @jax.jit
        def igrad_manual(dy, w):
            # dx = conv(dy, flip_hw(w) transposed io) — stride-1 SAME only
            wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
            return conv_nhwc(dy, wt, k)

        dy = fwd(x, w)
        tf = timeit(fwd, x, w)
        ta = timeit(igrad_auto, x, w)
        tm = timeit(igrad_manual, dy, w)
        flops = int(np.prod(ishape[:3])) * k * k * cin * cout * 2
        print(f"{name:20s} fwd {tf:6.2f} ms ({flops/tf/1e9:6.1f}T) | "
              f"igrad auto {ta:6.2f} | manual {tm:6.2f}", flush=True)

        if k == 1:
            xm = x.reshape(-1, cin)
            wm = w.reshape(cin, cout)

            @jax.jit
            def mm(xm, wm):
                return xm @ wm

            print(f"    as matmul {timeit(mm, xm, wm):6.2f} ms", flush=True)

    # does fusing all convs into one jit change per-op overhead? chain of
    # 4 convs same shape, one jit
    x = jnp.asarray(rng.standard_normal((256, 50, 10, 64)).astype(
        np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(
        np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def chain4(x, w):
        for _ in range(4):
            x = conv_nhwc(x, w, 3)
        return x

    print(f"chain of 4 convs (one jit): {timeit(chain4, x, w):6.2f} ms "
          f"(per conv {timeit(chain4, x, w)/4:5.2f})", flush=True)

    # channel-padding experiment: same conv at C=128 lanes full
    x = jnp.asarray(rng.standard_normal((256, 50, 10, 128)).astype(
        np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)).astype(
        np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def c128(x, w):
        return conv_nhwc(x, w, 3)

    t = timeit(c128, x, w)
    fl = 256 * 50 * 10 * 9 * 128 * 128 * 2
    print(f"conv 3x3 128->128 @(50,10): {t:6.2f} ms ({fl/t/1e9:6.1f}T)",
          flush=True)

    # spatial-flattening: (50,10) -> (500,1) 1-D conv equivalent timing probe
    x2 = x.reshape(256, 500, 1, 128)
    w2 = jnp.asarray(rng.standard_normal((3, 1, 128, 128)).astype(
        np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def c1d(x2, w2):
        return jax.lax.conv_general_dilated(
            x2, w2, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = timeit(c1d, x2, w2)
    fl = 256 * 500 * 3 * 128 * 128 * 2
    print(f"conv 3x1 128->128 @(500,1): {t:6.2f} ms ({fl/t/1e9:6.1f}T)",
          flush=True)


if __name__ == "__main__":
    main()
