#!/usr/bin/env python
"""Time one RawNet3 bf16 grad step (fwd+bwd wrt x) under the current
ADAA_* env-gate combination. Run once to compile (pass 1), again in a
fresh process for the clean number (pass 2, warm persistent cache).

Usage: ADAA_RAWNET_SCAN=1 ADAA_SINC_VJP=0 \
           python scripts/profiling/profile_rawnet_r3.py [--batch 64]

(defaults: unrolled trunk + closed-form sinc VJP — the measured round-3
winner; ADAA_RAWNET_SCAN=1 opts into the folded-BN scan trunk,
ADAA_SINC_VJP=0 restores the autodiff transposed-conv input-grad)
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=64)
parser.add_argument("--iters", type=int, default=20)
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))

from adaa_tpu import models
from adaa_tpu.attacks import core as attack_core

module = models.get_model("rawnet3", {"compute_dtype": "bfloat16"})
variables = models.init_model(module, jax.random.PRNGKey(0),
                              wave_length=64_600)
logits_fn = attack_core.make_logits_fn(module, variables)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((args.batch, 64_600)).astype(np.float32))
y = jnp.asarray((np.arange(args.batch) % 2).astype(np.int32))


@jax.jit
def grad_step(x, y):
    g = jax.grad(lambda x: attack_core.two_class_ce(logits_fn(x), y))(x)
    return x + 0.001 * jnp.sign(g)

t0 = time.perf_counter()
out = grad_step(x, y)
float(out.ravel()[0])
compile_s = time.perf_counter() - t0

out = grad_step(out, y)
float(out.ravel()[0])

t0 = time.perf_counter()
for _ in range(args.iters):
    out = grad_step(out, y)
float(out.ravel()[0])
dt = (time.perf_counter() - t0) / args.iters

gates = {k: os.environ.get(k, "") for k in
         ("ADAA_FOLD_BN", "ADAA_RAWNET_SCAN", "ADAA_SINC_VJP")}
print({"gates": gates, "compile_s": round(compile_s, 1),
       "ms_per_step": round(dt * 1e3, 2),
       "fgsm_equiv_ex_per_sec": round(args.batch / dt, 1)})
