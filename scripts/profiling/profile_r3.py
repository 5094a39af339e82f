#!/usr/bin/env python
"""Round-3 breakdown: where does a PGD step spend its 36 ms?

Times (batch 256, bf16 trunk, real chip, warm persistent cache):
  pgd10      - full attack_batch as bench.py runs it (per-step ms)
  fwdbwd     - one value_and_grad of two_class_ce over frontend+model
  fwd        - model fwd only (logits from waveform)
  frontend   - lfcc frontend fwd only
  fe_fwdbwd  - frontend fwd+bwd (sum-loss)
  trunk      - model-from-features fwd+bwd (no frontend)

Run twice (pass 1 compiles via persistent cache, pass 2 fresh process
measures): in-process timings right after long compiles are polluted.
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
from adaa_tpu.attacks.gradient import pgd
from adaa_tpu.ops import frontends

BATCH = 256
WAVE = 64_600


def timeit(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # 4-byte sync
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
           "compute_dtype": "bfloat16"}
    module = models.get_model("lcnn", cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE)
    logits_fn = attack_core.make_logits_fn(module, variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE)).astype(np.float32))
    y = jnp.asarray((np.arange(BATCH) % 2).astype(np.int32))
    key = jax.random.PRNGKey(1)

    res = {}

    atk = pgd(logits_fn, eps=0.0005, steps=10)

    @jax.jit
    def attack_batch(xx, yy, kk):
        x01, mn, mx = attack_core.to_minmax(xx)
        return attack_core.revert_minmax(atk(x01, yy, kk), mn, mx)

    ms = timeit(attack_batch, (x, y, key), iters=10)
    res["pgd10_ms"] = ms
    res["pgd_step_ms"] = ms / 10.0
    res["pgd10_ex_per_s"] = BATCH / ms * 1000.0

    grad_fn = jax.jit(jax.value_and_grad(
        lambda xx, yy: attack_core.two_class_ce(logits_fn(xx), yy)))
    res["fwdbwd_ms"] = timeit(grad_fn, (x, y))

    fwd = jax.jit(logits_fn)
    res["fwd_ms"] = timeit(fwd, (x,))

    fe = frontends.get_frontend(["lfcc"], compute="bf16")
    fe_j = jax.jit(fe)
    res["frontend_ms"] = timeit(fe_j, (x,))
    fe_g = jax.jit(jax.grad(lambda xx: jnp.sum(fe(xx))))
    res["fe_fwdbwd_ms"] = timeit(fe_g, (x,))

    feat = fe_j(x)
    feat = feat[:, None, :, :] if feat.ndim < 4 else feat
    feat = jax.block_until_ready(feat)

    def trunk_loss(ff, yy):
        z = module.apply(variables, ff, train=False)[:, 0]
        return attack_core.two_class_ce(z[:, None], yy)

    trunk_g = jax.jit(jax.value_and_grad(trunk_loss))
    res["trunk_fwdbwd_ms"] = timeit(trunk_g, (feat, y))

    for k, v in res.items():
        print(f"{k:18s} {v:10.3f}")
    out = Path(__file__).parent / "profile_r3.json"
    out.write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
