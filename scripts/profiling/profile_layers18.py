#!/usr/bin/env python
"""Per-layer fwd+bwd timing of LCNN layers 1-8 (the XLA mid-trunk).

profile_r3b.py attributes ~13 ms of the 27 ms batch-256 fwd+bwd to
"XLA layers 1-8"; this breaks that down per folded conv (+MFM/pool) so
optimization effort lands on the right layer. Scan-based methodology
(INNER applications inside one jitted scan -> pure device time),
two-pass: run once to compile, measure in a fresh process.
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

# (name, feat, k, in_feat, H, W, pooled): folded-BN conv + MFM (+pool)
# at the activation shape the layer sees on the canonical frontend
LAYERS = [
    ("conv3", 64, 1, 32, 202, 40, False),
    ("conv6", 96, 3, 32, 202, 40, True),
    ("conv10", 96, 1, 48, 101, 20, False),
    ("conv13", 128, 3, 48, 101, 20, True),
    ("conv16", 128, 1, 64, 50, 10, False),
    ("conv19", 64, 3, 64, 50, 10, False),
    ("conv22", 64, 1, 32, 50, 10, False),
    ("conv25", 64, 3, 32, 50, 10, True),
]


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
    results = {}
    for name, feat, k, in_feat, h, w, pooled in LAYERS:
        x = jnp.asarray(
            rng.standard_normal((BATCH, h, w, in_feat)).astype(np.float32)
        ).astype(DT)
        kern = jnp.asarray(
            (rng.standard_normal((k, k, in_feat, feat)) * 0.05).astype(
                np.float32
            )
        )
        bias = jnp.zeros((feat,), jnp.float32)

        def fconv(hh, kern=kern, bias=bias, k=k, pooled=pooled):
            y = jax.lax.conv_general_dilated(
                hh.astype(DT), kern.astype(DT), (1, 1),
                [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(DT)
            return layers.mfm_pool_2d(y) if pooled else layers.max_feature_map(y)

        def grad_body(hh, fconv=fconv):
            return jax.grad(
                lambda a: fconv(a).astype(jnp.float32).sum()
            )(hh)

        results[f"{name}_fwd_ms"] = scan_time(fconv, x)
        results[f"{name}_fwdbwd_ms"] = scan_time(grad_body, x)
        print(f"{name}: fwd {results[f'{name}_fwd_ms']:.3f} ms  "
              f"fwd+bwd {results[f'{name}_fwdbwd_ms']:.3f} ms", flush=True)

    out = Path(__file__).parent / "profile_layers18.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
