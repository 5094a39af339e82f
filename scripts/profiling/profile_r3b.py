#!/usr/bin/env python
"""Round-3 scan-based component breakdown (dispatch-overhead-free).

Each component runs INNER times inside one jitted lax.scan with a data
dependence threaded through the carry, so per-iteration time is pure
device time (the standalone per-dispatch numbers in profile_r3.py carry
~15 ms of tunnel dispatch overhead each and are only good for totals).

Two-pass: run once to compile (persistent cache), then again in a fresh
process for clean numbers.
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
from adaa_tpu.ops import frontends

BATCH = 256
WAVE = 64_600
INNER = 8


def scan_time(fn, x, iters=3):
    """Per-application ms of fn inside a data-dependent scan of INNER."""

    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # thread a scalar back into the carry so steps serialize
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
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE)).astype(np.float32))
    y = jnp.asarray((np.arange(BATCH) % 2).astype(np.float32))

    fe = frontends.get_frontend(["lfcc"], compute="bf16")

    def loss(xx):
        z = logits_fn(xx)[:, 0]
        return jnp.sum(
            jax.nn.softplus(z) - y * z
        )

    grad_full = jax.grad(loss)

    feat = fe(x)[:, None]  # (B, 1, 80, 404)

    # trunk from features
    feat_module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": [],
                 "compute_dtype": "bfloat16"})

    def trunk_loss(ff):
        z = feat_module.apply(variables, ff)[:, 0]
        return jnp.sum(jax.nn.softplus(z) - y * z)

    grad_trunk = jax.grad(trunk_loss)

    # fused layer-0 alone (input (B, 404, 80))
    from adaa_tpu.ops.pallas_layer0 import fused_conv0_mfm_pool

    h404 = jnp.transpose(feat, (0, 3, 2, 1))[..., 0].astype(jnp.bfloat16)
    kernel = variables["params"]["conv0"]["kernel"]
    bias = variables["params"]["conv0"]["bias"]

    def l0(hh):
        return fused_conv0_mfm_pool(hh, kernel, bias, False, False)

    def l0_loss(hh):
        return jnp.sum(l0(hh).astype(jnp.float32) * 1e-6)

    grad_l0 = jax.grad(l0_loss)

    results = {}
    results["fwdbwd_full_ms"] = scan_time(grad_full, x)
    results["fwd_full_ms"] = scan_time(
        lambda xx: logits_fn(xx), x)
    results["frontend_fwd_ms"] = scan_time(fe, x)
    results["frontend_fwdbwd_ms"] = scan_time(
        jax.grad(lambda xx: jnp.sum(fe(xx))), x)
    results["trunk_fwdbwd_ms"] = scan_time(grad_trunk, feat)
    results["layer0_fwd_ms"] = scan_time(l0, h404)
    results["layer0_fwdbwd_ms"] = scan_time(grad_l0, h404)
    for k, v in results.items():
        print(f"{k:24s} {v:9.3f}")
    out = Path(__file__).parent / "profile_r3b.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
