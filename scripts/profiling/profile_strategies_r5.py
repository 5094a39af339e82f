#!/usr/bin/env python
"""Adversarial-training strategy overhead on the real chip (VERDICT r4
item 7): RANDOM (no per-batch host sync) vs ADAPTIVE (loss-EMA
sampling, lagged device-loss pull) through the REAL trainer host loops.

Round 4's ADAPTIVE paid a blocking float(loss) every batch (~25 ms
tunnel sync + the full step drain, adv_trainer.py r4:194-197); the
round-5 lagged pull overlaps that sync with the next step's device
execution. Done-criterion: ADAPTIVE within 5% of RANDOM.

Method: full AdversarialGDTrainer.train() epochs with identical
pre-materialized data (the host loop is what's under test; dataset
items are precomputed so the 1-core host isn't synthesizing waves
inside the timed region), identical FGSM self-attack, tiny test split
(validation cost identical across strategies). Two-pass per CLAUDE.md:
run once to compile, rerun fresh for clean timings.

Writes profile_strategies_r5.json; merges into BENCH_TRAIN.json as
adv_train_loop_{random,adaptive}.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

WAVE_LEN = 64_600
BATCH = 256
N_TRAIN_BATCHES = 12
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

    n_train = BATCH * N_TRAIN_BATCHES
    src = SyntheticDataset(n=n_train, subset="train", wave_length=WAVE_LEN)
    train_ds = ListDS([src[i] for i in range(n_train)])
    tsrc = SyntheticDataset(n=BATCH, subset="test", wave_length=WAVE_LEN)
    test_ds = ListDS([tsrc[i] for i in range(BATCH)])

    from scripts.bench_attacks import provenance

    results = {}
    for strategy in ("RANDOM", "ADAPTIVE"):
        pyrandom.seed(5)
        trainer = ADV_TRAINER_REGISTRY[strategy](
            epochs=1, batch_size=BATCH, optimizer_kwargs={"lr": 1e-4}
        )
        # fresh init per strategy: train_step donates the state, so a
        # shared `variables` tree is deleted after the first run (the
        # first sweep hit exactly that RuntimeError); same key ->
        # bit-identical params, so the comparison is unchanged
        variables = models.init_model(module, jax.random.PRNGKey(0),
                                      wave_length=WAVE_LEN)
        t0 = time.perf_counter()
        trainer.train(
            dataset=train_ds, module=module,
            variables=variables,
            attack_module=module, attack_variables=None,  # self-attack
            adversarial_attacks=["FGSM"], test_dataset=test_ds,
            key=jax.random.PRNGKey(3),
        )
        dt = time.perf_counter() - t0
        results[strategy] = {
            "examples_per_sec": round(n_train / dt, 1),
            "epoch_s": round(dt, 2),
            "batch": BATCH,
            "n_batches": N_TRAIN_BATCHES,
            "measured_at": provenance(),
        }
        print(strategy, results[strategy], flush=True)

    ratio = (results["ADAPTIVE"]["examples_per_sec"]
             / results["RANDOM"]["examples_per_sec"])
    results["adaptive_over_random"] = round(ratio, 3)
    print("ADAPTIVE/RANDOM:", results["adaptive_over_random"])
    OUT.write_text(json.dumps(results, indent=1))

    bench = json.loads(BENCH.read_text()) if BENCH.exists() else {}
    for s in ("RANDOM", "ADAPTIVE"):
        bench[f"adv_train_loop_{s.lower()}"] = results[s]
    bench["adv_train_loop_adaptive_over_random"] = results[
        "adaptive_over_random"]
    BENCH.write_text(json.dumps(bench, indent=1))
    print(f"wrote {OUT} and merged {BENCH}")


if __name__ == "__main__":
    main()
