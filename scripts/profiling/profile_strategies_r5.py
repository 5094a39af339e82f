#!/usr/bin/env python
"""Adversarial-training strategy overhead on the real chip (VERDICT r4
item 7): RANDOM (no per-batch host sync) vs ADAPTIVE (loss-EMA
sampling, lagged device-loss pull) vs ADAPTIVE_EAGER (the round-4
blocking pull, via ADAA_EAGER_LOSS_PULL=1) through the REAL trainer
host loops.

Two confounds the first r5 measurement (RANDOM 79.1 vs ADAPTIVE 63.4
ex/s, ratio 0.802) did not separate:

* STRUCTURAL: with n attacks, RANDOM trains CLEAN with probability
  1/(n+1) (reference trainer.py:464-473) while ADAPTIVE attacks every
  batch — at n=1 RANDOM skips attack generation on half its batches.
  That cost difference is reference semantics, not overhead.
* FIXED vs MARGINAL: a 1-epoch run pays one-off costs (program cache
  loads, first-batch warmup, epoch-end validation) that drown a
  per-batch ~25 ms sync at small n_batches.

Method here: each strategy runs train() twice in-process with
N_SMALL=4 and N_LARGE=16 train batches (identical pre-materialized
data, identical FGSM self-attack, identical tiny test split); the
MARGINAL per-batch cost is (t_large - t_small) / (N_LARGE - N_SMALL),
with all fixed costs differenced out. The lagged-pull claim is judged
on marginal ADAPTIVE vs marginal ADAPTIVE_EAGER; the strategy-mix
structural gap shows up as marginal RANDOM < both (it attacks half its
batches).

Writes profile_strategies_r5.json; merges into BENCH_TRAIN.json as
adv_train_loop_*.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

WAVE_LEN = 64_600
BATCH = 256
N_SMALL = 4
N_LARGE = 16
OUT = Path(__file__).resolve().parent / "profile_strategies_r5.json"
BENCH = Path(__file__).resolve().parents[2] / "BENCH_TRAIN.json"


class ListDS:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def main():
    import random as pyrandom

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(BENCH.parent / ".jax_cache"))

    from adaa_tpu import models
    from adaa_tpu.data.synthetic import SyntheticDataset
    from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY

    cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
           "compute_dtype": "bfloat16"}
    module = models.get_model("lcnn", cfg)

    n_train = BATCH * N_LARGE
    src = SyntheticDataset(n=n_train, subset="train", wave_length=WAVE_LEN)
    all_items = [src[i] for i in range(n_train)]
    tsrc = SyntheticDataset(n=BATCH, subset="test", wave_length=WAVE_LEN)
    test_ds = ListDS([tsrc[i] for i in range(BATCH)])

    from scripts.bench_attacks import provenance

    def one_epoch(strategy, n_batches, eager):
        pyrandom.seed(5)
        if eager:
            os.environ["ADAA_EAGER_LOSS_PULL"] = "1"
        else:
            os.environ.pop("ADAA_EAGER_LOSS_PULL", None)
        trainer = ADV_TRAINER_REGISTRY[strategy](
            epochs=1, batch_size=BATCH, optimizer_kwargs={"lr": 1e-4}
        )
        # fresh init per run: train_step donates the state (a shared
        # tree would be deleted after the first run); same key ->
        # bit-identical params across runs
        variables = models.init_model(module, jax.random.PRNGKey(0),
                                      wave_length=WAVE_LEN)
        train_ds = ListDS(all_items[: BATCH * n_batches])
        t0 = time.perf_counter()
        trainer.train(
            dataset=train_ds, module=module,
            variables=variables,
            attack_module=module, attack_variables=None,  # self-attack
            adversarial_attacks=["FGSM"], test_dataset=test_ds,
            key=jax.random.PRNGKey(3),
        )
        return time.perf_counter() - t0

    results = {}
    for name, strategy, eager in (
        ("RANDOM", "RANDOM", False),
        ("ADAPTIVE", "ADAPTIVE", False),
        ("ADAPTIVE_EAGER", "ADAPTIVE", True),
    ):
        t_small = one_epoch(strategy, N_SMALL, eager)
        t_large = one_epoch(strategy, N_LARGE, eager)
        marginal_ms = (t_large - t_small) / (N_LARGE - N_SMALL) * 1e3
        results[name] = {
            "epoch_s_small": round(t_small, 2),
            "epoch_s_large": round(t_large, 2),
            "n_batches": [N_SMALL, N_LARGE],
            "marginal_ms_per_batch": round(marginal_ms, 1),
            "marginal_examples_per_sec": round(BATCH / marginal_ms * 1e3, 1),
            "batch": BATCH,
            "measured_at": provenance(),
        }
        print(name, results[name], flush=True)

    adaptive = results["ADAPTIVE"]["marginal_ms_per_batch"]
    results["adaptive_over_random_marginal"] = round(
        results["RANDOM"]["marginal_ms_per_batch"] / adaptive, 3)
    results["lagged_over_eager_marginal"] = round(
        results["ADAPTIVE_EAGER"]["marginal_ms_per_batch"] / adaptive, 3)
    print("RANDOM/ADAPTIVE marginal (structural mix, n=1):",
          results["adaptive_over_random_marginal"])
    print("EAGER/LAGGED marginal (the pull overhead):",
          results["lagged_over_eager_marginal"])
    OUT.write_text(json.dumps(results, indent=1))

    bench = json.loads(BENCH.read_text()) if BENCH.exists() else {}
    for s in ("RANDOM", "ADAPTIVE", "ADAPTIVE_EAGER"):
        bench[f"adv_train_loop_{s.lower()}"] = results[s]
    bench.pop("adv_train_loop_adaptive_over_random", None)
    bench["adv_train_loop_lagged_speedup_vs_eager"] = results[
        "lagged_over_eager_marginal"]
    BENCH.write_text(json.dumps(bench, indent=1))
    print(f"wrote {OUT} and merged {BENCH}")


if __name__ == "__main__":
    main()
