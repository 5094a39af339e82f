#!/usr/bin/env python
"""Clean training CLI — surface mirror of the reference's
train_models.py (flags/defaults: batch 128, epochs 5, test_amount 10k;
reference train_models.py:155-235). Writes a chained test config with
the produced checkpoint path (train_models.py:116-123).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts._common import (add_dataset_path_args, build_dataset,
                             enable_compilation_cache, setup_logging)


def main(args):
    logger = setup_logging()
    enable_compilation_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import yaml

    from adaa_tpu import models
    from adaa_tpu.training.gd_trainer import GDTrainer
    from adaa_tpu.utils import save_checkpoint, set_seed

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)

    seed = config["data"].get("seed", 42)
    key = set_seed(seed)

    model_dir = Path(args.ckpt)
    model_dir.mkdir(parents=True, exist_ok=True)

    model_config = config["model"]
    model_name = model_config["name"]
    optimizer_config = model_config.get("optimizer", {"lr": 1e-3})
    timestamp = time.time()

    paths = [args.asv_path, args.wavefake_path, args.celeb_path]
    data_train = build_dataset(paths, "train", args.train_amount, oversample=True)
    data_test = build_dataset(paths, "test", args.test_amount, oversample=True)

    module = models.get_model(model_name, model_config.get("parameters", {}))

    variables = models.init_model(module, key)

    use_scheduler = "rawnet3" in model_name.lower()
    logger.info(
        "Training '%s' model on %d audio files.", model_name, len(data_train)
    )

    best_variables = GDTrainer(
        batch_size=args.batch_size,
        epochs=args.epochs,
        optimizer_kwargs=optimizer_config,
        use_scheduler=use_scheduler,
        compute_eer=args.compute_eer,
    ).train(
        dataset=data_train,
        module=module,
        variables=variables,
        test_dataset=data_test,
        key=key,
    )

    save_name = f"aad__{model_name}__{timestamp}"
    ckpt_path = save_checkpoint(best_variables, model_dir, save_name)
    logger.info("Training done!")

    # chained test config (train_models.py:116-123)
    config["checkpoint"] = {"path": str(ckpt_path)}
    config_save_path = Path("configs") / f"aad__{model_name}__{timestamp}.yaml"
    config_save_path.parent.mkdir(parents=True, exist_ok=True)
    with open(config_save_path, "w") as f:
        yaml.dump(config, f)
    logger.info("Test config saved at location '%s'!", config_save_path)


def parse_args():
    parser = argparse.ArgumentParser()
    add_dataset_path_args(parser)
    parser.add_argument(
        "--config", help="Model config file path (default: config.yaml)",
        type=str, default="config.yaml",
    )
    parser.add_argument(
        "--train_amount", "-a", help="Amount of files to load for training.",
        type=int, default=None,
    )
    parser.add_argument(
        "--test_amount", "-ta", help="Amount of files to load for testing.",
        type=int, default=10_000,
    )
    parser.add_argument(
        "--batch_size", "-b", help="Batch size (default: 128).",
        type=int, default=128,
    )
    parser.add_argument(
        "--epochs", "-e", help="Epochs (default: 5).", type=int, default=5
    )
    parser.add_argument(
        "--ckpt", help="Checkpoint directory (default: trained_models).",
        type=str, default="trained_models",
    )
    parser.add_argument("--cpu", "-c", help="Force using cpu?", action="store_true")
    parser.add_argument(
        "--compute_eer",
        help="Compute real per-epoch validation EER instead of the "
        "reference's placeholder 0 (src/trainer.py:171 'TODO: revert "
        "EER support').",
        action="store_true",
    )
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
