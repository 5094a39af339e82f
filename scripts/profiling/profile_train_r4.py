#!/usr/bin/env python
"""Adversarial-train step breakdown: where do the 157 ms go, and why
doesn't the bf16 trunk beat f32 in training when it wins 1.7-2.7x on
the attack path?

One adv-train step (bench_train.py semantics, batch 256) =
FGSM self-attack (fwd + dx-backward) + BCE update (fwd + dW backward).
This times, per dtype mode:
  * attack_seg   — FGSM generation only (dx backward, dW pruned)
  * train_seg    — loss fwd + dW+dx backward + optimizer update
  * dx_only      — loss fwd + dx backward (the attack-style backward)
the difference train_seg - dx_only isolates the dW path the attack
benches never exercise.

Scan-based methodology (INNER applications inside one jitted scan ->
pure device time), two-pass: run once to compile, measure in a fresh
process.
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
from adaa_tpu.attacks.gradient import fgsm
from adaa_tpu.training import train_state as ts
from adaa_tpu.training.gd_trainer import bce_with_logits

BATCH = 256
WAVE = 64_600
INNER = 4


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
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE)).astype(np.float32))
    y = jnp.asarray((np.arange(BATCH) % 2).astype(np.float32))
    key = jax.random.PRNGKey(1)

    results = {}
    for mode in ("bf16", "f32"):
        cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
        if mode == "bf16":
            cfg["compute_dtype"] = "bfloat16"
        module = models.get_model("lcnn", cfg)
        variables = models.init_model(module, jax.random.PRNGKey(0),
                                      wave_length=WAVE)
        state = ts.create_train_state(module, variables, {"lr": 1e-4})

        def attack_seg(xx, state=state):
            logits_fn = lambda a: state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                a, train=False)
            atk = fgsm(logits_fn, eps=0.0005)
            x01, mn, mx = attack_core.to_minmax(xx)
            return attack_core.revert_minmax(
                atk(x01, y.astype(jnp.int32), key), mn, mx)

        def train_seg(xx, state=state):
            def loss_fn(params):
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    xx, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key},
                )
                return bce_with_logits(out, y), mutated["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads)
            return jax.tree_util.tree_leaves(new_state.params)[0], loss

        def dx_only(xx, state=state):
            def loss_fn(a):
                out = state.apply_fn(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    a, train=False)
                return bce_with_logits(out, y)

            return jax.grad(loss_fn)(xx)

        results[f"{mode}_attack_seg_ms"] = scan_time(attack_seg, x)
        results[f"{mode}_dx_only_ms"] = scan_time(dx_only, x)
        results[f"{mode}_train_seg_ms"] = scan_time(train_seg, x)
        for k in list(results):
            if k.startswith(mode):
                print(f"{k:24s} {results[k]:9.3f}", flush=True)

    out = Path(__file__).parent / "profile_train_r4.json"
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
