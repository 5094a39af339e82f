#!/usr/bin/env python
"""Root-cause the FGSM 107 s cold-compile outlier (VERDICT r4 item 6).

Round 4's matrix sweep recorded compile_s 107.4 for FGSM vs 2.9-7 s
for every other attack (BENCH_ATTACKS.json r4) — suspicious because
FGSM is the SMALLEST program in the matrix (one fwd+bwd). The sweep
measured each attack's first call inside one long-lived process, in
matrix order, against the persistent compilation cache.

Bisection axes, each in a FRESH subprocess (the only way to isolate
device/process state):

  warm1/2/3 — persistent cache warm, FGSM alone: the steady state a
    user sees. Done-criterion: < 10 s reproduced 3x.
  cold      — cache redirected to an empty dir: the true XLA compile
    cost of the FGSM program on this host.
  after_pgd — warm cache, but PGD runs (compiles+executes) first in
    the same process, then FGSM: reproduces the sweep's
    "mid-matrix" state where the outlier appeared.
  cold_after_pgd — both effects stacked.

Writes profile_fgsm_bisect.json with one wall-clock first-call time
per axis (compile+execute, 4-byte sync).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

WAVE_LEN = 64_600
BATCH = 64


def child(mode: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "cold" in mode:
        cache_dir = tempfile.mkdtemp(prefix="jaxcache_cold_")
    else:
        cache_dir = str(REPO / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from adaa_tpu import models
    from adaa_tpu.attacks import core as attack_core
    from adaa_tpu.attacks.gradient import fgsm, pgd

    cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
           "compute_dtype": "bfloat16"}
    module = models.get_model("lcnn", cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE_LEN)
    logits_fn = attack_core.make_logits_fn(module, variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE_LEN)).astype(np.float32))
    y = jnp.asarray((np.arange(BATCH) % 2).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)

    def build(fn, params):
        atk = fn(logits_fn, **params)

        @jax.jit
        def attack_batch(x, y, key, atk=atk):
            x01, mn, mx = attack_core.to_minmax(x)
            return attack_core.revert_minmax(atk(x01, y, key), mn, mx)

        return attack_batch

    if "after_pgd" in mode:
        pg = build(pgd, {"eps": 0.0005, "steps": 10})
        out = pg(x, y, keys[0])
        float(out.ravel()[0])

    fg = build(fgsm, {"eps": 0.0005})
    t0 = time.perf_counter()
    out = fg(x, y, keys[1])
    float(out.ravel()[0])
    print(json.dumps({"mode": mode,
                      "first_call_s": time.perf_counter() - t0}))


def main():
    if len(sys.argv) > 1:
        child(sys.argv[1])
        return

    modes = ["warm1", "warm2", "warm3", "after_pgd", "cold",
             "cold_after_pgd"]
    results = {}
    for mode in modes:
        proc = subprocess.run(
            [sys.executable, __file__, mode],
            capture_output=True, text=True, timeout=3600, cwd=str(REPO),
            env={**os.environ},
        )
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            results[mode] = {"error": proc.stderr[-500:]}
        else:
            results[mode] = json.loads(line[-1])
        print(mode, results[mode], flush=True)

    out = Path(__file__).parent / "profile_fgsm_bisect.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
