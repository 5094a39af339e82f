#!/usr/bin/env python
"""Transfer attack demo — the counterpart of the reference's
"Transfer Attack (CIFAR10)" demo notebook
(adversarial_attacks/demos/), on the audio domain.

The notebook's recipe: train a SOURCE model, craft adversarial
examples against it, then measure how well they transfer to a
different TARGET architecture (white-box vs transfer robust
accuracy). Here the source is SpecRNet and the target LCNN — the same
cross-model pairing the reference's CLI exercises via
``--attack_model_config`` (evaluate_models_on_adversarial_attacks.py).

Runs on CPU or TPU against the synthetic dataset (no corpora needed):

    python examples/transfer_attack.py [--wave-len 16000]
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
    from adaa_tpu.training.gd_trainer import GDTrainer

    train_ds = SyntheticDataset(n=train_n, subset="train",
                                wave_length=wave_len, class_sep=0.6)
    test_ds = SyntheticDataset(n=train_n // 4, subset="test",
                               wave_length=wave_len, class_sep=0.6)
    val_ds = SyntheticDataset(n=train_n // 4, subset="val",
                              wave_length=wave_len, class_sep=0.6)

    def fit(name, seed):
        module = models.get_model(
            name, {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
        )
        variables = models.init_model(
            module, jax.random.PRNGKey(seed), wave_length=wave_len
        )
        t0 = time.perf_counter()
        trained = GDTrainer(
            epochs=epochs, batch_size=64, optimizer_kwargs={"lr": 1e-4}
        ).train(train_ds, module, variables, test_dataset=test_ds,
                key=jax.random.PRNGKey(seed + 1))
        print(f"[train] {name}: {epochs} epochs in "
              f"{time.perf_counter() - t0:.1f}s")
        return module, trained

    src_module, src_vars = fit("specrnet", 0)   # attacker's surrogate
    tgt_module, tgt_vars = fit("lcnn", 10)      # deployed victim

    batch = next(iter(DataLoader(val_ds, len(val_ds), shuffle=False,
                                 num_workers=2)))
    x, y = jnp.asarray(batch[0]), jnp.asarray(batch[2])

    def acc(module, v, xx):
        lf = core.make_logits_fn(module, v)
        return float((core.predicted_label(lf(xx)) == y).mean())

    print(f"[clean] source acc: {acc(src_module, src_vars, x):.2%}  "
          f"target acc: {acc(tgt_module, tgt_vars, x):.2%}")

    src_logits = core.make_logits_fn(src_module, src_vars)
    tgt_logits = core.make_logits_fn(tgt_module, tgt_vars)
    print(f"{'attack':14s} {'white-box(src)':>15s} {'transfer(tgt)':>14s}")
    for name in ("FGSM_eps001", "PGD_eps001", "PGDL2_eps20"):
        # crafted ONCE on the source; the target never sees a gradient
        adv = jax.jit(core.attack_in_wave_space(
            attacks.build_attack(name, src_logits)
        ))(x, y, jax.random.PRNGKey(2))
        wb = acc(src_module, src_vars, adv)
        tr = acc(tgt_module, tgt_vars, adv)
        print(f"{name:14s} {wb:>14.2%} {tr:>13.2%}")

    # white-box floor on the target, for scale
    for name in ("PGD_eps001",):
        adv = jax.jit(core.attack_in_wave_space(
            attacks.build_attack(name, tgt_logits)
        ))(x, y, jax.random.PRNGKey(3))
        print(f"[floor] {name} white-box on target: "
              f"{acc(tgt_module, tgt_vars, adv):.2%}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--wave-len", type=int, default=16_000)
    parser.add_argument("--train-n", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    main(args.wave_len, args.train_n, args.epochs, args.cpu)
