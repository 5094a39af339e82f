#!/usr/bin/env python
"""Attack performance comparison — the counterpart of the reference's
"Performance Comparison (CIFAR10)" demo notebook
(adversarial_attacks/demos/), on the audio domain.

For a grid of registry attacks it reports, per attack: wall time,
success rate (prediction flips), and the mean L0/L2/Linf perturbation
norms — the same three axes the reference notebook tabulates (robust
accuracy, perturbation distance, runtime).

Also demonstrates the "model with multiple outputs" pattern from the
reference's "Model with Multiple Outputs" notebook: attacks consume a
``logits_fn``, so a model returning (logits, embedding) is adapted with
a one-line selector instead of a wrapper class.

Runs on CPU or TPU against the synthetic dataset (no corpora needed):

    python examples/performance_comparison.py [--batch 16] [--attacks ...]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu import attacks, models
from adaa_tpu.attacks import core
from adaa_tpu.data.loader import DataLoader
from adaa_tpu.data.synthetic import SyntheticDataset

WAVE_LEN = 16_000
# quick-running grid; add e.g. Square / OnePixel (query-based, slower)
# via --attacks
DEFAULT_ATTACKS = ["FGSM", "PGD", "PGDL2", "BIM", "MIFGSM", "DeepFool",
                   "CW", "FAB"]


def norms(delta: np.ndarray):
    flat = delta.reshape(delta.shape[0], -1)
    return (
        (np.abs(flat) > 1e-9).sum(axis=1).mean(),       # L0 (coords changed)
        np.linalg.norm(flat, axis=1).mean(),             # L2
        np.abs(flat).max(axis=1).mean(),                 # Linf
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--attacks", nargs="*", default=DEFAULT_ATTACKS)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:  # JAX_PLATFORMS is ignored in this image
        jax.config.update("jax_platforms", "cpu")

    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=WAVE_LEN
    )

    # "Model with Multiple Outputs" pattern: suppose apply() returned
    # (logits, embedding) — attacks only need a logits_fn, so select:
    base_fn = core.make_logits_fn(module, variables)
    multi_output_fn = lambda x: (base_fn(x), x.mean())  # pretend model
    logits_fn = lambda x: multi_output_fn(x)[0]          # one-line adapter

    ds = SyntheticDataset(n=args.batch * 2, subset="val",
                          wave_length=WAVE_LEN)
    batch = next(iter(DataLoader(ds, args.batch, shuffle=False,
                                 num_workers=1)))
    x, y = jnp.asarray(batch[0]), jnp.asarray(batch[2])
    x01, mn, mx = core.to_minmax(x)
    clean_pred = core.predicted_label(logits_fn(x))
    print(f"clean accuracy: {float((clean_pred == y).mean()):.2%}\n")
    hdr = f"{'attack':<10} {'time(s)':>8} {'success':>8} " \
          f"{'L0':>8} {'L2':>10} {'Linf':>10}"
    print(hdr)
    print("-" * len(hdr))

    for name in args.attacks:
        atk = jax.jit(attacks.build_attack(name, logits_fn))
        key = jax.random.PRNGKey(42)
        t0 = time.perf_counter()
        adv01 = atk(x01, y, key)
        adv01.block_until_ready()
        dt = time.perf_counter() - t0
        adv = core.revert_minmax(adv01, mn, mx)
        adv_pred = core.predicted_label(logits_fn(adv))
        success = float((adv_pred != y).mean())
        l0, l2, linf = norms(np.asarray(adv01 - x01))
        print(f"{name:<10} {dt:>8.2f} {success:>8.2%} "
              f"{l0:>8.1f} {l2:>10.5f} {linf:>10.6f}")

    print("\n(time includes one-off XLA compilation; re-run in the same"
          "\n process or with a persistent cache for steady-state times)")


if __name__ == "__main__":
    main()
