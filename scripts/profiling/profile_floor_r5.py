#!/usr/bin/env python
"""Mid-trunk per-layer roofline floor table (VERDICT r4 item 3).

For every folded conv(+MFM/pool) layer of the LCNN bf16 attack trunk,
measures the fwd+bwd device time (scan methodology, two-pass) and
computes two analytic floors:

* bytes floor — minimal HBM traffic of the layer pair under attack
  semantics (dW dead-code-eliminated: gradients flow to x only):
  fwd reads X and writes Y_post (post-MFM/pool); bwd reads G_post,
  re-reads X once (recompute the pre-max conv output for the max
  routing — cheaper than storing the full-width pre-MFM tensor), and
  writes dX. All at bf16 (2 bytes). Weights are negligible.
  floor_ms = bytes / 819 GB/s (v5e HBM).
* FLOP floor — conv MACs * 2, twice (fwd + the dX transposed conv;
  the routing recompute conv makes it three) / 197 TFLOP/s bf16 peak.

floor = max(bytes, flops); headroom = measured / floor. This turns
round 4's "the mid-trunk is layout-bound and every restructure lost"
from a narrative into a per-layer table: a layer at headroom <= ~1.3x
has nothing left to win on this chip without cross-layer fusion (which
was measured 19x WORSE in Pallas form, ops/pallas_trunk.py); a layer
far above its floor is a real target.

Writes profile_floor_r5.json.
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
HBM_BYTES_PER_S = 819e9   # v5e
PEAK_FLOPS = 197e12       # v5e bf16

# (name, feat, k, in_feat, H, W, pooled) — the shapes each layer sees
# on the canonical frontend (profile_layers18.py)
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
    total_meas = total_floor = 0.0
    for name, feat, k, in_feat, h, w, pooled in LAYERS:
        x = jnp.asarray(
            rng.standard_normal((BATCH, h, w, in_feat)).astype(np.float32)
        ).astype(DT)
        kern = jnp.asarray(
            (rng.standard_normal((k, k, in_feat, feat)) * 0.05)
            .astype(np.float32)
        )
        bias = jnp.zeros((feat,), jnp.float32)

        def fconv(hh, kern=kern, bias=bias, k=k, pooled=pooled):
            y = jax.lax.conv_general_dilated(
                hh.astype(DT), kern.astype(DT), (1, 1),
                [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(DT)
            return (layers.mfm_pool_2d(y) if pooled
                    else layers.max_feature_map(y))

        def grad_body(hh, fconv=fconv):
            return jax.grad(
                lambda a: fconv(a).astype(jnp.float32).sum()
            )(hh)

        meas = scan_time(grad_body, x)

        itemsize = 2  # bf16
        n_in = BATCH * h * w * in_feat
        ho, wo = (h // 2, w // 2) if pooled else (h, w)
        n_out = BATCH * ho * wo * (feat // 2)
        # fwd: rd X + wr Y_post; bwd: rd G + rd X (routing recompute)
        # + wr dX
        bytes_min = itemsize * (3 * n_in + 2 * n_out)
        bytes_ms = bytes_min / HBM_BYTES_PER_S * 1e3
        conv_macs = BATCH * h * w * (k * k) * in_feat * feat
        flops_ms = 3 * 2 * conv_macs / PEAK_FLOPS * 1e3  # fwd+dx+recomp
        floor_ms = max(bytes_ms, flops_ms)

        results[name] = {
            "measured_fwdbwd_ms": round(meas, 3),
            "bytes_floor_ms": round(bytes_ms, 3),
            "flop_floor_ms": round(flops_ms, 3),
            "floor_ms": round(floor_ms, 3),
            "headroom_x": round(meas / floor_ms, 2),
            "bound": "flops" if flops_ms > bytes_ms else "bytes",
            "hbm_bytes_floor": bytes_min,
        }
        total_meas += meas
        total_floor += floor_ms
        print(f"{name}: meas {meas:.3f} ms floor {floor_ms:.3f} ms "
              f"({results[name]['bound']}) headroom "
              f"{results[name]['headroom_x']}x", flush=True)

    results["_total"] = {
        "measured_ms": round(total_meas, 2),
        "floor_ms": round(total_floor, 2),
        "headroom_x": round(total_meas / total_floor, 2),
        "batch": BATCH,
        "method": __doc__.split("\n")[0],
    }
    print("TOTAL:", results["_total"])
    out = Path(__file__).parent / "profile_floor_r5.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
