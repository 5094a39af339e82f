#!/usr/bin/env python
"""Demo: attack a detector and inspect robustness — the counterpart of
the reference's torchattacks demo notebooks, on the audio domain.

Runs on CPU or TPU; uses the synthetic dataset (no corpora needed).

    python examples/attack_demo.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu import attacks, models
from adaa_tpu.attacks import core
from adaa_tpu.attacks.save import save_adversarial_dataset
from adaa_tpu.data.loader import DataLoader
from adaa_tpu.data.synthetic import SyntheticDataset

WAVE_LEN = 16_000


def main():
    if "--cpu" in sys.argv:  # JAX_PLATFORMS is ignored in this image
        jax.config.update("jax_platforms", "cpu")
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=WAVE_LEN
    )
    logits_fn = core.make_logits_fn(module, variables)

    ds = SyntheticDataset(n=32, subset="val", wave_length=WAVE_LEN)
    batch = next(iter(DataLoader(ds, 16, shuffle=False, num_workers=1)))
    x, y = jnp.asarray(batch[0]), jnp.asarray(batch[2])
    clean_acc = float((core.predicted_label(logits_fn(x)) == y).mean())
    print(f"clean accuracy: {clean_acc:.2%}")

    for name in ("FGSM_eps001", "PGD_eps001", "PGDL2_eps20", "FAB"):
        atk = attacks.build_attack(name, logits_fn)
        wrapped = jax.jit(core.attack_in_wave_space(atk))
        adv = wrapped(x, y, jax.random.PRNGKey(1))
        acc = float((core.predicted_label(logits_fn(adv)) == y).mean())
        linf = float(jnp.abs(adv - x).max())
        print(f"{name:14s} robust acc: {acc:.2%}   max|delta|: {linf:.5f}")

    # Attack.save equivalent: export an adversarial dataset
    atk = attacks.build_attack("FGSM_eps001", logits_fn)
    loader = DataLoader(ds, 16, shuffle=False, num_workers=1)
    rob, l2, ms = save_adversarial_dataset(
        atk, logits_fn, loader, save_path="/tmp/adv_demo.npz",
        return_verbose=True, verbose=False,
    )
    print(f"saved /tmp/adv_demo.npz  robust acc {rob:.1f}%  "
          f"mean L2 {l2:.4f}  ({ms:.0f} ms)")


if __name__ == "__main__":
    main()
