#!/usr/bin/env python
"""Batch adversarial training — equivalent of the reference's
multi_runs_scripts/run_multiple_trainings_on_adversarial_attacks.py:36-67.
(The reference script crashes as-is on a stale
``src.adversarial_attacks_generator.aa_types`` import — :6; fixed here.)
"""
import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", help="Path to batch config.",
                        default="adv_train_batch_config.yaml")
    parser.add_argument(
        "--data_path", help="Dataset path", type=str,
        default="/home/adminuser/storage/datasets/deep_fakes",
    )
    parser.add_argument("--asv_path", default=None)
    parser.add_argument("--adv_training_strategy", default="RANDOM")
    parser.add_argument("--finetune", "-v", help="Use finetuning",
                        action="store_true")
    parser.add_argument("--epochs", type=int, default=10)
    # passthroughs beyond the reference driver's surface (None -> the
    # underlying CLI's own defaults); lets smoke tests bound the work
    parser.add_argument("--batch_size", "-b", type=int, default=None)
    parser.add_argument("--train_amount", "-a", type=int, default=None)
    parser.add_argument("--test_amount", "-ta", type=int, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    with open(args.config, "r") as f:
        configs_to_run = yaml.safe_load(f)
    print("Running following configs: ", configs_to_run)

    from scripts import train_models_on_adversarial_attacks as adv_train

    for c in configs_to_run:
        argv = [
            "--config", c["config"],
            "--epochs", str(args.epochs),
            "--adv_training_strategy", args.adv_training_strategy,
        ]
        if args.asv_path:
            argv += ["--asv_path", args.asv_path]
        else:
            argv += [
                "--asv_path", f"{args.data_path}/ASVspoof2021/DF",
                "--wavefake_path", f"{args.data_path}/WaveFake",
                "--celeb_path", f"{args.data_path}/FakeAVCeleb/FakeAVCeleb_v1.2",
            ]
        if c.get("attack_model_config"):
            argv += ["--attack_model_config", c["attack_model_config"]]
        if args.finetune:
            argv += ["--finetune"]
        for flag, val in (("--batch_size", args.batch_size),
                          ("--train_amount", args.train_amount),
                          ("--test_amount", args.test_amount)):
            if val is not None:
                argv += [flag, str(val)]
        print("train_models_on_adversarial_attacks", argv)
        sys.argv = ["train_models_on_adversarial_attacks.py"] + argv
        adv_train.main(adv_train.parse_args())
