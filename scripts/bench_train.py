#!/usr/bin/env python
"""Adversarial-training throughput on the real chip.

One adversarial train step = FGSM self-attack against the live params
+ BCE update (the reference's train_models_on_adversarial_attacks.py
ONLY_ADV semantics). Reports examples/sec for the f32 and bf16-trunk
configs; merges into BENCH_TRAIN.json.

Methodology: pipelined steps synced once by a 4-byte pull (CLAUDE.md);
run twice — the second, cache-warm process gives clean numbers
(in-process measurements right after long XLA compiles are polluted).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WAVE_LEN = 64_600
OUT = Path(__file__).resolve().parents[1] / "BENCH_TRAIN.json"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(OUT.parent / ".jax_cache"))

    from adaa_tpu import models
    from adaa_tpu.attacks import core as attack_core
    from adaa_tpu.attacks.gradient import fgsm
    from adaa_tpu.training import train_state as ts
    from adaa_tpu.training.gd_trainer import bce_with_logits

    results = {}
    if OUT.exists():
        results = json.loads(OUT.read_text())

    for mode in ("bf16", "f32"):
        cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
        if mode == "bf16":
            cfg["compute_dtype"] = "bfloat16"
        module = models.get_model("lcnn", cfg)
        variables = models.init_model(module, jax.random.PRNGKey(0),
                                      wave_length=WAVE_LEN)
        state = ts.create_train_state(module, variables, {"lr": 1e-4})

        def adv_train_step(state, x, y, key):
            logits_fn = lambda xx: state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                xx, train=False)
            atk = fgsm(logits_fn, eps=0.0005)
            x01, mn, mx = attack_core.to_minmax(x)
            k_atk, k_drop = jax.random.split(key)
            adv = attack_core.revert_minmax(atk(x01, y, k_atk), mn, mx)

            def loss_fn(params):
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    adv, train=True, mutable=["batch_stats"],
                    rngs={"dropout": k_drop},
                )
                return bce_with_logits(out, y), mutated["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads).replace(batch_stats=stats)
            return state, loss

        step = jax.jit(adv_train_step, donate_argnums=(0,))
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((args.batch, WAVE_LEN)).astype(np.float32))
        y = jnp.asarray((np.arange(args.batch) % 2).astype(np.int32))
        key = jax.random.PRNGKey(1)

        # pre-split keys OUTSIDE the timed loop: a host-side
        # jax.random.split per iteration is its own device program whose
        # tunnel dispatch stalls the pipeline ~25-110 ms/iter — it made
        # round 3's rows read ~157 ms/step for BOTH dtypes when the real
        # device step is ~40 ms (bf16) / ~95 ms (f32)
        # (scripts/profiling/profile_train_r4.py)
        keys = list(jax.random.split(key, args.iters + 2))

        t0 = time.perf_counter()
        state, loss = step(state, x, y, keys[0])
        float(loss)
        compile_s = time.perf_counter() - t0
        state, loss = step(state, x, y, keys[1])  # warmup
        float(loss)

        t0 = time.perf_counter()
        for i in range(args.iters):
            state, loss = step(state, x, y, keys[2 + i])
        float(loss)
        dt = time.perf_counter() - t0
        from scripts.bench_attacks import provenance

        results[f"adv_train_fgsm_bce_{mode}"] = {
            "examples_per_sec": round(args.batch * args.iters / dt, 1),
            "ms_per_step": round(dt / args.iters * 1e3, 1),
            "batch": args.batch,
            "compile_s": round(compile_s, 1),
            "measured_at": provenance(),
        }
        print(f"{mode}: {results[f'adv_train_fgsm_bce_{mode}']}", flush=True)

    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
