#!/usr/bin/env python
"""End-to-end robustness pipeline demo — the counterpart of the
reference's Adversarial-Training / Transfer-Attack demo notebooks:

  train a detector -> attack it (white-box matrix) -> adversarially
  finetune (RANDOM strategy, self-attack) -> re-attack.

Runs on TPU or CPU against the synthetic dataset (no corpora needed):

    python examples/robustness_pipeline.py [--wave-len 16000]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(wave_len: int, train_n: int, epochs: int, cpu: bool = False):
    import jax

    if cpu:  # JAX_PLATFORMS is ignored in this image; set via config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adaa_tpu import attacks, models
    from adaa_tpu.attacks import core
    from adaa_tpu.data.loader import DataLoader
    from adaa_tpu.data.synthetic import SyntheticDataset
    from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY
    from adaa_tpu.training.gd_trainer import GDTrainer

    train_ds = SyntheticDataset(n=train_n, subset="train", wave_length=wave_len)
    test_ds = SyntheticDataset(n=train_n // 4, subset="test",
                               wave_length=wave_len)
    val_ds = SyntheticDataset(n=train_n // 4, subset="val",
                              wave_length=wave_len)

    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=wave_len
    )

    t0 = time.perf_counter()
    trained = GDTrainer(
        epochs=epochs, batch_size=64, optimizer_kwargs={"lr": 1e-4}
    ).train(train_ds, module, variables, test_dataset=test_ds,
            key=jax.random.PRNGKey(1))
    print(f"[train] {epochs} epochs x {train_n} samples "
          f"in {time.perf_counter() - t0:.1f}s")

    batch = next(iter(DataLoader(val_ds, len(val_ds), shuffle=False,
                                 num_workers=2)))
    x, y = jnp.asarray(batch[0]), jnp.asarray(batch[2])

    def acc(v, xx):
        lf = core.make_logits_fn(module, v)
        return float((core.predicted_label(lf(xx)) == y).mean())

    print(f"[clean] val accuracy: {acc(trained, x):.2%}")

    logits_fn = core.make_logits_fn(module, trained)
    for name in ("FGSM_eps001", "PGD_eps001", "PGDL2_eps20", "FAB"):
        atk = attacks.build_attack(name, logits_fn)
        adv = jax.jit(core.attack_in_wave_space(atk))(
            x, y, jax.random.PRNGKey(2)
        )
        print(f"[attack] {name:14s} robust acc: {acc(trained, adv):.2%}")

    trainer = ADV_TRAINER_REGISTRY["RANDOM"](
        epochs=max(epochs - 1, 1), batch_size=64,
        optimizer_kwargs={"lr": 1e-4},
    )
    t0 = time.perf_counter()
    robust = trainer.train(
        dataset=train_ds, module=module, variables=trained,
        attack_module=module, attack_variables=None,  # self-attack
        adversarial_attacks=["FGSM_eps001", "PGDL2_eps20"],
        test_dataset=test_ds, key=jax.random.PRNGKey(3),
    )
    print(f"[advtrain] {time.perf_counter() - t0:.1f}s")

    print(f"[after] clean acc: {acc(robust, x):.2%}")
    rlogits = core.make_logits_fn(module, robust)
    for name in ("FGSM_eps001", "PGD_eps001", "PGDL2_eps20"):
        atk = attacks.build_attack(name, rlogits)  # white-box vs NEW model
        adv = jax.jit(core.attack_in_wave_space(atk))(
            x, y, jax.random.PRNGKey(4)
        )
        print(f"[after] {name:14s} robust acc: {acc(robust, adv):.2%}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--wave-len", type=int, default=16_000)
    parser.add_argument("--train-n", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    main(args.wave_len, args.train_n, args.epochs, args.cpu)
