#!/usr/bin/env python
"""Round-4 sinc-conv forward A/B: strided (F,1,251)/stride-10 conv vs
chunked stride-1 width-26 conv (the ops/stft.py reformulation applied
to RawNet3's learnable encoder).

RawNet3's attack step spends ~10.2 ms of 78.8 ms (batch 64 fwd+bwd) in
the sinc encoder (profile_rawnet_r4.json) whose FLOP floor is ~0.5 ms
bf16 — the strided big-kernel conv is the same XLA:TPU layout
pathology the STFT had (measured 1.8x there). Times fwd and fwd+bwd
of the encoder alone at the attack shapes (B=64, L=64600, F=256).

Usage: python profile_sinc_r4.py   (TPU; CHECK=1 for CPU numerics)
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

if os.environ.get("CHECK") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parents[2] / ".jax_cache")
)

from adaa_tpu.ops.sinc_conv import _sinc_conv_fn

BATCH = 8 if os.environ.get("CHECK") == "1" else 64
L, F, K, S = 64_600, 256, 251, 10
INNER = 8


def scan_time(fn, x, iters=3):
    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            c = c + (leaf.ravel()[:1] * 1e-30).astype(c.dtype).reshape(1, 1)
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
    x = jnp.asarray(rng.standard_normal((BATCH, L)).astype(np.float32) * 0.1)
    w = jnp.asarray((rng.standard_normal((F, K)) * 0.05).astype(np.float32))

    results = {}
    cases = {}
    computes = ["f32"] if os.environ.get("CHECK") == "1" else ["bf16", "f32"]
    for comp in computes:
        for form in ("conv", "chunked"):
            fn = _sinc_conv_fn(S, False, comp, form)
            cases[f"{form}_{comp}"] = lambda xx, f=fn: f(xx, w)

    ref = cases[f"conv_{computes[-1]}"](x)
    for name, fn in cases.items():
        out = fn(x)
        results[f"{name}_relerr"] = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
        ) / float(jnp.max(jnp.abs(ref)))

    if os.environ.get("CHECK") == "1":
        print(json.dumps(results, indent=1))
        return

    for name, fn in cases.items():
        results[f"{name}_fwd_ms"] = scan_time(fn, x)
        results[f"{name}_fwdbwd_ms"] = scan_time(
            jax.grad(lambda xx, f=fn: jnp.sum(jnp.sin(f(xx)))), x)
        print(name, results[f"{name}_fwd_ms"], results[f"{name}_fwdbwd_ms"])

    out = Path(__file__).parent / "profile_sinc_r4.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
