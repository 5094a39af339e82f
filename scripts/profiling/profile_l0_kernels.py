#!/usr/bin/env python
"""Micro-times for the three layer-0 pallas kernels at batch 256."""
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

from adaa_tpu.ops import pallas_layer0 as pk

BATCH = 256
INNER = 8


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


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((BATCH, 404, 80)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.standard_normal((5, 5, 1, 64)) * 0.2).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(64) * 0.1).astype(np.float32))
    wmat, brow = pk._pack_weights(w, bias)
    g = jnp.asarray(
        rng.standard_normal((BATCH, 202, 40, 32)).astype(np.float32))

    def primal(hh):
        xe, xo = pk._planes(hh)
        return pk._fwd_call(xe, xo, wmat, brow, jnp.bfloat16, False)

    def maskfwd(hh):
        xe, xo = pk._planes(hh)
        return pk._fwd_call(xe, xo, wmat, brow, jnp.bfloat16, False,
                            with_mask=True)

    # precompute a mask for the bwd-only timing
    xe, xo = pk._planes(x)
    _, mask = jax.jit(
        lambda a, b: pk._fwd_call(a, b, wmat, brow, jnp.bfloat16, False,
                                  with_mask=True))(xe, xo)
    wt = wmat.T

    def bwd_only(gg):
        return pk._bwd_call(wt, mask, gg, False)

    print(f"primal_fwd_ms   {scan_time(primal, x):9.3f}")
    print(f"mask_fwd_ms     {scan_time(maskfwd, x):9.3f}")
    print(f"bwd_only_ms     {scan_time(bwd_only, g):9.3f}")


if __name__ == "__main__":
    main()
