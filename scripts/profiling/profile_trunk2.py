#!/usr/bin/env python
"""Finer ablation: conv stack vs BLSTM head inside the LCNN backward."""
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
    from adaa_tpu.models import layers
    from flax import linen as nn

    rng = np.random.default_rng(0)

    # BLSTM head alone: (B, 25, 160) f32, 2 x BiLSTM(80)
    h = jnp.asarray(rng.standard_normal((256, 25, 160)).astype(np.float32))

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = layers.BiLSTM(80, name="blstm0")(x)
            y = layers.BiLSTM(80, name="blstm1")(y)
            return (y + x).mean(axis=1)

    head = Head()
    hv = head.init(jax.random.PRNGKey(0), h)

    @jax.jit
    def head_fwd(h):
        return head.apply(hv, h)

    @jax.jit
    def head_fwdbwd(h):
        return jax.grad(lambda h: head.apply(hv, h).sum())(h)

    print(f"blstm head fwd    : {timeit(head_fwd, h):8.2f} ms", flush=True)
    print(f"blstm head fwd+bwd: {timeit(head_fwdbwd, h):8.2f} ms", flush=True)

    # conv stack alone (bf16): LCNN convs without the BLSTM
    from adaa_tpu.models import lcnn as lcnn_mod

    class ConvsOnly(lcnn_mod.LCNN):
        @nn.compact
        def __call__(self, x, train=False):
            feat = x
            h = jnp.transpose(feat, (0, 3, 2, 1))
            dtype = jnp.bfloat16
            h = h.astype(dtype)
            conv = lambda f, k, name: nn.Conv(
                features=f, kernel_size=(k, k),
                padding=[(k // 2, k // 2)] * 2,
                kernel_init=layers.kaiming_uniform_conv,
                dtype=dtype, name=name)
            bn = lambda name: layers.torch_batch_norm(
                affine=False, name=name, dtype=dtype)
            mfm = layers.max_feature_map
            pool = layers.max_pool_2d
            h = mfm(conv(64, 5, "conv0")(h)); h = pool(h)
            h = mfm(conv(64, 1, "conv3")(h))
            h = bn("bn5")(h, use_running_average=not train)
            h = mfm(conv(96, 3, "conv6")(h)); h = pool(h)
            h = bn("bn9")(h, use_running_average=not train)
            h = mfm(conv(96, 1, "conv10")(h))
            h = bn("bn12")(h, use_running_average=not train)
            h = mfm(conv(128, 3, "conv13")(h)); h = pool(h)
            h = mfm(conv(128, 1, "conv16")(h))
            h = bn("bn18")(h, use_running_average=not train)
            h = mfm(conv(64, 3, "conv19")(h))
            h = bn("bn21")(h, use_running_average=not train)
            h = mfm(conv(64, 1, "conv22")(h))
            h = bn("bn24")(h, use_running_average=not train)
            h = mfm(conv(64, 3, "conv25")(h)); h = pool(h)
            return h.astype(jnp.float32)

    feat = jnp.asarray(
        rng.standard_normal((256, 1, 80, 404)).astype(np.float32))
    convs = ConvsOnly(frontend_algorithm=[])
    cv = convs.init(jax.random.PRNGKey(0), feat)

    @jax.jit
    def c_fwd(feat):
        return convs.apply(cv, feat)

    @jax.jit
    def c_fwdbwd(feat):
        return jax.grad(lambda f: convs.apply(cv, f).sum())(feat)

    print(f"convs fwd         : {timeit(c_fwd, feat):8.2f} ms", flush=True)
    print(f"convs fwd+bwd     : {timeit(c_fwdbwd, feat):8.2f} ms", flush=True)

    # per-conv breakdown: single convs at their real shapes, fwd+input-grad
    shapes = [
        ("conv0 5x5 1->64", (256, 404, 80, 1), 64, 5),
        ("conv3 1x1 32->64", (256, 202, 40, 32), 64, 1),
        ("conv6 3x3 32->96", (256, 202, 40, 32), 96, 3),
        ("conv10 1x1 48->96", (256, 101, 20, 48), 96, 1),
        ("conv13 3x3 48->128", (256, 101, 20, 48), 128, 3),
        ("conv16 1x1 64->128", (256, 50, 10, 64), 128, 1),
        ("conv19 3x3 64->64", (256, 50, 10, 64), 64, 3),
        ("conv22 1x1 32->64", (256, 50, 10, 32), 64, 1),
        ("conv25 3x3 32->64", (256, 50, 10, 32), 64, 3),
    ]
    for name, ishape, cout, k in shapes:
        xx = jnp.asarray(
            rng.standard_normal(ishape).astype(np.float32)).astype(jnp.bfloat16)
        m = nn.Conv(features=cout, kernel_size=(k, k),
                    padding=[(k // 2, k // 2)] * 2, dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), xx)

        @jax.jit
        def f(xx, m=m, v=v):
            return jax.grad(
                lambda x: m.apply(v, x).astype(jnp.float32).sum())(xx)

        ms = timeit(f, xx, iters=20)
        flops = (np.prod(ishape[:3]) * k * k * ishape[3] * cout * 2) * 2
        print(f"{name:22s}: {ms:7.2f} ms  "
              f"({flops / ms / 1e9:6.1f} TFLOP/s fwd+igrad)", flush=True)


if __name__ == "__main__":
    main()
