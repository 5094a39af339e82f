#!/usr/bin/env python
"""Space-to-depth mid-trunk variants on the real chip (VERDICT r4 item 3).

profile_floor_r5.py measured the mid-trunk at 4.3x its roofline floor
(17.5 vs 4.1 ms fwd+bwd at batch 256) with the bytes-bound layers 4-22x
above floor. The shared cause hypothesis: C in {32..64} fills a (8,128)
lane tile 25-50%, so every HBM pass moves (and every MXU tile computes)
2-4x padding. ops/s2d.py folds W into C (exact by construction,
tests/test_s2d.py); this measures the folded mid-trunk end to end:

  base   — the fconv chain exactly as lcnn.py's folded-BN bf16 path
  f2     — fold 2 at entry; each pool unfolds; refold per block
  f4     — fold 4 at entry; A exits at f=2 = B's entry (no refold);
           one refold before block C
  f4lite — f4 for blocks A+B, block C left unfolded (its layers are
           tiny; tests whether the refold transpose pays for itself)

All variants include their fold/refold transposes (the real path would
pay them), run bf16 at batch 256, and are checked against base output
(bf16 max-abs-diff) before timing. Writes profile_s2d_r5.json.
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
from adaa_tpu.ops import s2d

BATCH = 256
INNER = 8
DT = jnp.bfloat16

SPEC = [  # (name, feat, k, in_feat, pooled) — lcnn.py fconv chain
    ("conv3", 64, 1, 32, False),
    ("conv6", 96, 3, 32, True),
    ("conv10", 96, 1, 48, False),
    ("conv13", 128, 3, 48, True),
    ("conv16", 128, 1, 64, False),
    ("conv19", 64, 3, 64, False),
    ("conv22", 64, 1, 32, False),
    ("conv25", 64, 3, 32, True),
]
BLOCK_STARTS = {"conv3": "A", "conv10": "B", "conv16": "C"}


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


def make_params(rng):
    return {
        n: (
            jnp.asarray((rng.standard_normal((k, k, ci, f)) * 0.05)
                        .astype(np.float32)),
            jnp.asarray(rng.standard_normal((f,)).astype(np.float32) * 0.01),
        )
        for n, f, k, ci, _ in SPEC
    }


def base_conv(h, kern, bias, k):
    y = jax.lax.conv_general_dilated(
        h.astype(DT), kern.astype(DT), (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(DT)


def trunk_base(params):
    def f(h):
        for n, _, k, _, pooled in SPEC:
            y = base_conv(h, *params[n], k)
            h = (layers.mfm_pool_2d(y) if pooled
                 else layers.max_feature_map(y))
        return h

    return f


def trunk_s2d(params, entry_f, block_f):
    """block_f: {'A': f, 'B': f, 'C': f} target fold per block (1=off).

    Refolds only when a block's entry fold differs from the running
    fold (pools halve it, so f4(A) flows into f2(B) for free).
    """

    def f(h):
        cur = 1
        for n, _, k, _, pooled in SPEC:
            if n in BLOCK_STARTS:
                want = block_f[BLOCK_STARTS[n]]
                if want != cur:
                    h = s2d.fold_w(s2d.unfold_w(h, cur), want)
                    cur = want
            y = (s2d.conv_folded(h, *params[n], cur, dtype=DT)
                 if cur > 1 else base_conv(h, *params[n], k))
            if pooled:
                if cur > 1:
                    h = s2d.mfm_pool_folded(y, cur)
                    cur //= 2
                else:
                    h = layers.mfm_pool_2d(y)
            else:
                h = layers.max_feature_map(y)
        return s2d.unfold_w(h, cur)

    del entry_f  # encoded in block_f['A']
    return f


def main():
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(
        rng.standard_normal((BATCH, 202, 40, 32)).astype(np.float32)
    ).astype(DT)

    variants = {
        "base": trunk_base(params),
        "f2": trunk_s2d(params, 2, {"A": 2, "B": 2, "C": 2}),
        "f4": trunk_s2d(params, 4, {"A": 4, "B": 2, "C": 2}),
        "f4lite": trunk_s2d(params, 4, {"A": 4, "B": 2, "C": 1}),
    }

    ref = np.asarray(jax.jit(variants["base"])(x), np.float32)
    results = {}
    for tag, fn in variants.items():
        out = np.asarray(jax.jit(fn)(x), np.float32)
        maxdiff = float(np.abs(out - ref).max())
        grad_fn = jax.grad(lambda a, fn=fn: fn(a).astype(jnp.float32).sum())
        fwd = scan_time(fn, x)
        fwdbwd = scan_time(grad_fn, x)
        results[tag] = {
            "fwd_ms": round(fwd, 3),
            "fwdbwd_ms": round(fwdbwd, 3),
            "max_abs_diff_vs_base": maxdiff,
        }
        print(tag, results[tag], flush=True)

    results["_meta"] = {"batch": BATCH, "dtype": "bf16",
                        "note": "full mid-trunk conv3..conv25 incl. "
                                "fold/refold transposes"}
    out_path = Path(__file__).parent / "profile_s2d_r5.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
