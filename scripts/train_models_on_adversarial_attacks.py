#!/usr/bin/env python
"""Adversarial training/finetuning CLI — surface mirror of the
reference's train_models_on_adversarial_attacks.py (flags:
--attack_model_config, --adv_training_strategy, --finetune, defaults
train_amount=100k / test 10k / batch 64; reference :191-290). When no
--attack_model_config is given the live training model attacks itself
(:106-109). Writes the legacy ``checkpoint.paths`` test config
(:143-149).
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
    from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY
    from adaa_tpu.utils import load_checkpoint, save_checkpoint, set_seed

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)

    if args.attack_model_config is not None:
        with open(args.attack_model_config, "r") as f:
            attack_model_config = yaml.safe_load(f)
    else:
        attack_model_config = None

    seed = config["data"].get("seed", 42)
    key = set_seed(seed)

    model_dir = Path(args.ckpt)
    model_dir.mkdir(parents=True, exist_ok=True)

    model_config = config["model"]
    model_name = model_config["name"]
    optimizer_config = model_config.get("optimizer", {"lr": 1e-4})
    timestamp = time.time()

    paths = [args.asv_path, args.wavefake_path, args.celeb_path]
    data_train = build_dataset(paths, "train", args.train_amount, oversample=True)
    data_test = build_dataset(paths, "test", args.test_amount, oversample=True)

    module = models.get_model(model_name, model_config.get("parameters", {}))
    variables = models.init_model(module, key)

    if args.finetune:
        assert config["checkpoint"]["path"], \
            "Finetune requires to provide checkpoint"
        weights_path = config["checkpoint"]["path"]
        logger.info(
            "Adversarial finetuning! Architecture: '%s', lr: %s, weights: '%s'!",
            model_name, optimizer_config.get("lr"), weights_path,
        )
        _, variables = models.load_model(config)

    if attack_model_config is not None:
        logger.info("Load attack model based on attack config")
        attack_module, attack_variables = models.load_model(attack_model_config)
        attack_info = f"{attack_model_config['model']['name']} (pretrained)"
    else:
        logger.info("Use target model as attack model")
        attack_module, attack_variables = module, None  # self-attack
        attack_info = model_name

    adversarial_attacks = config["data"].get("adversarial_attacks", [])
    use_scheduler = "rawnet3" in model_name.lower()

    logger.info(
        "Training '%s', attacking using: '%s' model on %d audio files.",
        model_name, attack_info, len(data_train),
    )
    logger.info("Adversarial training strategy: %s", args.adv_training_strategy)

    save_name = f"aad__{model_name}_{timestamp}"
    trainer_cls = ADV_TRAINER_REGISTRY[args.adv_training_strategy]
    best_variables = trainer_cls(
        batch_size=args.batch_size,
        epochs=args.epochs,
        optimizer_kwargs=optimizer_config,
        use_scheduler=use_scheduler,
        compute_eer=args.compute_eer,
    ).train(
        dataset=data_train,
        module=module,
        variables=variables,
        attack_module=attack_module,
        attack_variables=attack_variables,
        adversarial_attacks=adversarial_attacks,
        test_dataset=data_test,
        model_dir=str(model_dir),
        save_model_name=save_name,
        key=key,
    )

    ckpt_path = save_checkpoint(best_variables, model_dir, save_name)
    logger.info("Training model done!")

    # legacy paths-list schema, as the reference writes (:143-149)
    config["checkpoint"] = {"paths": [str(ckpt_path)]}
    config_save_path = Path("configs") / f"aad__{model_name}__{timestamp}.yaml"
    config_save_path.parent.mkdir(parents=True, exist_ok=True)
    with open(config_save_path, "w") as f:
        yaml.dump(config, f)
    logger.info("Test config saved at location '%s'!", config_save_path)


def parse_args():
    from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY

    parser = argparse.ArgumentParser()
    add_dataset_path_args(parser)
    parser.add_argument(
        "--config", help="Model config file path (default: config.yaml)",
        type=str, default="config.yaml",
    )
    parser.add_argument(
        "--attack_model_config",
        help="Model config file path - if not provided, training will "
             "proceed using weights of the trained model",
        type=str, default=None,
    )
    parser.add_argument(
        "--train_amount", "-a", help="Amount of files to load for training.",
        type=int, default=100_000,
    )
    parser.add_argument(
        "--test_amount", "-ta", help="Amount of files to load for testing.",
        type=int, default=10_000,
    )
    parser.add_argument(
        "--batch_size", "-b", help="Batch size (default: 64).",
        type=int, default=64,
    )
    parser.add_argument(
        "--epochs", "-e", help="Epochs (default: 5).", type=int, default=5
    )
    parser.add_argument(
        "--ckpt", help="Checkpoint directory (default: trained_models).",
        type=str, default="trained_models",
    )
    parser.add_argument(
        "--adv_training_strategy",
        help="Adversarial training strategy",
        type=str,
        default="RANDOM",
        choices=list(ADV_TRAINER_REGISTRY.keys()),
    )
    parser.add_argument("--cpu", "-c", help="Force using cpu?", action="store_true")
    parser.add_argument(
        "--finetune",
        help="Finetune using checkpoint provided in a config",
        action="store_true",
    )
    parser.add_argument(
        "--compute_eer",
        help="Compute real per-epoch validation EER (incl. per-attack "
        "adversarial EER) instead of the reference's placeholder 0 "
        "(src/trainer.py:417 'TODO: revert EER support').",
        action="store_true",
    )
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
