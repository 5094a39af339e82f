#!/usr/bin/env python
"""Primary benchmark: adversarial examples/sec — PGD-10 on LCNN+LFCC.

Prints ONE JSON line:
  {"metric": "adv_examples_per_sec_pgd10_lcnn_lfcc", "value": N,
   "unit": "examples/sec", "vs_baseline": R}

vs_baseline = our throughput / torch-CPU reference throughput. The
torch-CPU baseline (the reference implementation's execution model: a
python PGD loop of 10 torch fwd+bwd over LFCC+LCNN, see reference
adversarial_attacks/torchattacks/attacks/pgd.py:59-76) is measured
once on this machine and cached in BENCH_BASELINE.json; pass
--remeasure-baseline to refresh.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

BATCH = 256  # throughput-optimal on v5e (reference eval uses 64).
# Measured r4: batch 512 is WORSE (996.6 ex/s vs 1122 at 256) — the
# PGD-10 program's working set falls out of VMEM-friendly tiling and
# the mid-trunk convs stay layout-bound, so occupancy doesn't improve.
WAVE_LEN = 64_600
BASELINE_CACHE = Path(__file__).parent / "BENCH_BASELINE.json"


def measure_jax(batch: int, iters: int = 10, warmup: int = 2,
                bf16: bool = True) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent / ".jax_cache"))

    from adaa_tpu import models
    from adaa_tpu.attacks import core as attack_core
    from adaa_tpu.attacks.gradient import pgd

    # bf16 trunk compute (params/frontend stay f32): 1.74x faster with
    # measured attack-effectiveness parity (mean adversarial logit shift
    # on an f32 victim within 1% of the f32 surrogate); --f32 disables.
    cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    if bf16:
        cfg["compute_dtype"] = "bfloat16"
    module = models.get_model("lcnn", cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE_LEN)
    logits_fn = attack_core.make_logits_fn(module, variables)
    atk = pgd(logits_fn, eps=0.0005, steps=10)  # registry PGD params

    @jax.jit
    def attack_batch(x, y, key):
        x01, mn, mx = attack_core.to_minmax(x)
        return attack_core.revert_minmax(atk(x01, y, key), mn, mx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, WAVE_LEN)).astype(np.float32))
    y = jnp.asarray((np.arange(batch) % 2).astype(np.int32))
    key = jax.random.PRNGKey(1)

    # NOTE: sync via a 4-byte scalar pull — on the tunneled axon backend
    # np.asarray(out) would transfer the full batch through the relay
    # (~1 GB/s) and block_until_ready may return early.
    # Keys are pre-split OUTSIDE the timed loop: each host-side
    # jax.random.split is its own tiny device program whose tunnel
    # dispatch stalls the pipeline ~9 ms/iter (measured 358 -> 271 ms
    # per batch-256 iteration).
    keys = list(jax.random.split(key, iters))
    for _ in range(warmup):
        out = attack_batch(x, y, key)
        float(out.ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = attack_batch(x, y, keys[i])
    float(out.ravel()[0])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_torch_cpu(batch: int = 64, iters: int = 3, repeats: int = 3) -> float:
    """Reference-style torch-CPU PGD-10 throughput (python step loop).

    Measured at batch 64 (the reference eval batch size), best-of-
    ``repeats`` over ``iters`` timed attack batches each — a sturdier
    denominator than the original batch-8 x 2-iteration snapshot."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    import numpy as np
    import torch

    from tests.oracles.torch_models import TorchLCNN

    torch.manual_seed(0)
    model = TorchLCNN(input_channels=1, num_coefficients=80)
    model.eval()

    eps, alpha, steps = 0.0005, 2 / 255, 10
    loss_fn = torch.nn.CrossEntropyLoss()

    def attack(x, y):
        mn = x.min(dim=1, keepdim=True).values
        mx = x.max(dim=1, keepdim=True).values
        x01 = (x - mn) / (mx - mn)
        adv = torch.clamp(
            x01 + torch.empty_like(x01).uniform_(-eps, eps), 0, 1
        ).detach()
        for _ in range(steps):
            adv.requires_grad_(True)
            z = model(adv)
            out = torch.cat([-z, z], dim=1)
            cost = loss_fn(out, y)
            (g,) = torch.autograd.grad(cost, adv)
            adv = adv.detach() + alpha * g.sign()
            delta = torch.clamp(adv - x01, -eps, eps)
            adv = torch.clamp(x01 + delta, 0, 1).detach()
        return adv * (mx - mn) + mn

    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.standard_normal((batch, WAVE_LEN)).astype("float32"))
    y = torch.from_numpy((np.arange(batch) % 2).astype("int64"))

    attack(x, y)  # warmup
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            attack(x, y)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def get_baseline(remeasure: bool) -> float:
    if BASELINE_CACHE.exists() and not remeasure:
        return json.loads(BASELINE_CACHE.read_text())["torch_cpu_examples_per_sec"]
    val = measure_torch_cpu()
    BASELINE_CACHE.write_text(
        json.dumps({"torch_cpu_examples_per_sec": val,
                    "config": "PGD-10 LCNN+LFCC batch=64 torch-cpu, "
                              "best-of-3 x 3 attack batches"})
    )
    return val


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=BATCH)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--remeasure-baseline", action="store_true")
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--f32", action="store_true",
                        help="full float32 compute (parity mode)")
    args = parser.parse_args()

    value = measure_jax(args.batch, args.iters, bf16=not args.f32)
    if args.skip_baseline and not BASELINE_CACHE.exists():
        vs = None
    else:
        baseline = get_baseline(args.remeasure_baseline)
        vs = value / baseline if baseline else None

    print(json.dumps({
        "metric": "adv_examples_per_sec_pgd10_lcnn_lfcc",
        "value": round(value, 2),
        "unit": "examples/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
