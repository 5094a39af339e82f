#!/usr/bin/env python
"""FAB step-component breakdown (batch 64, bf16 LCNN surrogate).

Same scan-based methodology as profile_r3b.py: each component runs
INNER times inside one jitted data-dependent lax.scan so per-application
time is pure device time. Two-pass: compile, then measure in a fresh
process (warm persistent cache).

Purpose: attribute FAB's ms/step (BENCH_ATTACKS) to its parts —
z_and_grad (fwd+bwd), the post-update predict forward (inherent to the
reference loop, fab.py:269-291), and the paired box projection — to
quantify how much of the step is model-cost ceiling vs attack overhead.
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

from adaa_tpu import models
from adaa_tpu.attacks import core as attack_core
from adaa_tpu.attacks.fab_projections import projection_linf_bisect_pair

BATCH = 64
WAVE = 64_600
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
    cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
           "compute_dtype": "bfloat16"}
    module = models.get_model("lcnn", cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE)
    logits_fn = attack_core.make_logits_fn(module, variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.clip(rng.standard_normal((BATCH, WAVE)) * 0.2 + 0.5, 0, 1)
        .astype(np.float32))
    y = (np.arange(BATCH) % 2).astype(np.float32)
    y_sign = jnp.asarray(1.0 - 2.0 * y)

    def z_and_grad(xx):
        def zsum(a):
            z = logits_fn(a).squeeze(-1)
            return z.sum(), z

        (_, z), g = jax.value_and_grad(zsum, has_aux=True)(xx)
        return z, g

    def predict(xx):
        return (logits_fn(xx).squeeze(-1) > 0).astype(jnp.float32)

    def proj_pair(xx):
        # plausible hyperplane operands derived from xx cheaply
        w = xx - 0.5
        bb = (w * xx).sum(-1) * 0.5
        t2 = jnp.stack([xx, jnp.clip(xx + 0.01, 0, 1)], 0)
        return projection_linf_bisect_pair(t2, w, jnp.stack([bb, bb], 0))

    def full_step(xx):
        z, g = z_and_grad(xx)
        df = 2.0 * z * y_sign
        dg = 2.0 * g * y_sign[:, None]
        w = dg
        bb = -df + (w * xx).sum(-1)
        t2 = jnp.stack([xx, xx], 0)
        d3 = projection_linf_bisect_pair(t2, w, jnp.stack([bb, bb], 0))
        x1 = jnp.clip(xx + 1.05 * d3[0], 0.0, 1.0)
        is_adv = predict(x1)
        return jnp.where(is_adv[:, None] > 0, xx + (x1 - xx) * 0.9, x1)

    results = {}
    results["z_and_grad_ms"] = scan_time(lambda a: z_and_grad(a)[1], x)
    results["predict_fwd_ms"] = scan_time(
        lambda a: predict(a)[:, None] * 1e-6 + a[:, :1], x)
    results["proj_pair_ms"] = scan_time(lambda a: proj_pair(a)[0], x)
    results["full_step_ms"] = scan_time(full_step, x)
    for k, v in results.items():
        print(f"{k:20s} {v:9.3f}")
    out = Path(__file__).parent / "profile_fab.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
