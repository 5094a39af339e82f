#!/usr/bin/env python
"""Flagship PGD-10 throughput vs batch size (LCNN+LFCC bf16).

The BLSTM scans and per-batch dispatch are latency-bound, so their
cost amortizes with batch. Two-pass protocol per CLAUDE.md.

Usage: python scripts/profiling/profile_batch_sweep.py [--batches 256 384 512]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

parser = argparse.ArgumentParser()
parser.add_argument("--batches", nargs="*", type=int,
                    default=[256, 384, 512])
parser.add_argument("--iters", type=int, default=4)
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))

from adaa_tpu import models
from adaa_tpu.attacks import core as attack_core
from adaa_tpu.attacks.gradient import pgd

WAVE = 64_600

module = models.get_model(
    "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"],
             "compute_dtype": "bfloat16"})
variables = models.init_model(module, jax.random.PRNGKey(0),
                              wave_length=WAVE)
logits_fn = attack_core.make_logits_fn(module, variables)
atk, params = (pgd, {"eps": 0.001, "alpha": 0.0002, "steps": 10})
attack = atk(logits_fn, **params)


@jax.jit
def attack_batch(x, y, key):
    x01, mn, mx = attack_core.to_minmax(x)
    return attack_core.revert_minmax(attack(x01, y, key), mn, mx)

rng = np.random.default_rng(0)
for b in args.batches:
    x = jnp.asarray(rng.standard_normal((b, WAVE)).astype(np.float32))
    y = jnp.asarray((np.arange(b) % 2).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(1), args.iters + 2)

    t0 = time.perf_counter()
    out = attack_batch(x, y, keys[0])
    float(out.ravel()[0])
    compile_s = time.perf_counter() - t0
    out = attack_batch(x, y, keys[1])
    float(out.ravel()[0])

    t0 = time.perf_counter()
    for i in range(args.iters):
        out = attack_batch(x, y, keys[2 + i])
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / args.iters
    print({"batch": b, "compile_s": round(compile_s, 1),
           "ms_per_batch": round(dt * 1e3, 1),
           "ex_per_sec": round(b / dt, 1)})
