#!/usr/bin/env python
"""TPU smoke + timing for the fused trunk segments (pallas_trunk.py).

Usage: python scripts/profiling/trunk_smoke.py [batch]
Checks mosaic compilation, output-vs-reference error, and fwd+bwd
timing for both segments at the given batch size.
"""
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

from adaa_tpu.ops import pallas_trunk as pt

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def bench(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.default_rng(0)
    for name, spec in (("A", pt.SEGMENT_A), ("B", pt.SEGMENT_B)):
        x = jnp.asarray(
            rng.standard_normal((B, spec.t, spec.f, spec.c_in))
            .astype(np.float32)
        ).astype(jnp.bfloat16)
        wa = jnp.asarray((rng.standard_normal(
            (1, 1, spec.c_in, spec.c_mid)) * 0.2).astype(np.float32))
        ba = jnp.asarray((rng.standard_normal(spec.c_mid) * 0.1)
                         .astype(np.float32))
        wb = jnp.asarray((rng.standard_normal(
            (3, 3, spec.c2, spec.c_out)) * 0.1).astype(np.float32))
        bb = jnp.asarray((rng.standard_normal(spec.c_out) * 0.1)
                         .astype(np.float32))

        fwd = jax.jit(lambda xx: pt.fused_segment(
            xx, wa, ba, wb, bb, spec, False, False))
        ref = jax.jit(lambda xx: pt._reference_xla(
            xx.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
            ba.astype(jnp.bfloat16), wb.astype(jnp.bfloat16),
            bb.astype(jnp.bfloat16)))

        t0 = time.perf_counter()
        out = jax.block_until_ready(fwd(x))
        print(f"seg{name} fwd compile+run {time.perf_counter()-t0:.1f}s")
        r = jax.block_until_ready(ref(x))
        err = float(jnp.abs(out.astype(jnp.float32)
                            - r.astype(jnp.float32)).max())
        scale = float(jnp.abs(r.astype(jnp.float32)).max())
        print(f"seg{name} max err {err:.4f} (scale {scale:.2f})")

        cot = jnp.asarray(rng.standard_normal(out.shape)
                          .astype(np.float32)).astype(jnp.bfloat16)
        fb = jax.jit(jax.grad(lambda xx: jnp.sum(
            pt.fused_segment(xx, wa, ba, wb, bb, spec, False, False)
            .astype(jnp.float32) * cot.astype(jnp.float32))))
        fb_ref = jax.jit(jax.grad(lambda xx: jnp.sum(
            pt._reference_xla(xx, wa.astype(jnp.bfloat16),
                              ba.astype(jnp.bfloat16),
                              wb.astype(jnp.bfloat16),
                              bb.astype(jnp.bfloat16))
            .astype(jnp.float32) * cot.astype(jnp.float32))))
        t0 = time.perf_counter()
        jax.block_until_ready(fb(x))
        print(f"seg{name} fwd+bwd compile+run {time.perf_counter()-t0:.1f}s")
        jax.block_until_ready(fb_ref(x))

        print(f"seg{name} fused fwd      {bench(fwd, (x,)):8.3f} ms")
        print(f"seg{name} xla   fwd      {bench(ref, (x,)):8.3f} ms")
        print(f"seg{name} fused fwd+bwd  {bench(fb, (x,)):8.3f} ms")
        print(f"seg{name} xla   fwd+bwd  {bench(fb_ref, (x,)):8.3f} ms")


if __name__ == "__main__":
    main()
