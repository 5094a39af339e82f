#!/usr/bin/env python
"""Batch adversarial evaluation — equivalent of the reference's
multi_runs_scripts/run_multiple_evaluations_on_adversarial_attacks.py:31-50
(loop over attack/config/attack_model_config triples with --qual
--raw_from_dataset). Fixes the reference's string-concatenation bug
(its ``"--raw_from_dataset" f"--asv_path..."`` lacked a separator,
silently merging the two flags — :41-42) by passing argv lists.
"""
import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", help="Path to batch config.",
                        default="adv_batch_config.yaml")
    parser.add_argument(
        "--data_path", help="Dataset path", type=str,
        default="/home/adminuser/storage/datasets/deep_fakes",
    )
    parser.add_argument("--asv_path", default=None)
    parser.add_argument("--amount", "-a", type=int, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    with open(args.config, "r") as f:
        configs_to_run = yaml.safe_load(f)
    print("Running following configs: ", configs_to_run)

    from scripts import evaluate_models_on_adversarial_attacks as adv_eval

    for c in configs_to_run:
        argv = [
            "--attack", c["attack"],
            "--config", c["config"],
            "--attack_model_config", c["attack_model_config"],
            "--qual",
            "--raw_from_dataset",
        ]
        if args.asv_path:
            argv += ["--asv_path", args.asv_path]
        else:
            argv += [
                "--asv_path", f"{args.data_path}/ASVspoof2021/DF",
                "--wavefake_path", f"{args.data_path}/WaveFake",
                "--celeb_path", f"{args.data_path}/FakeAVCeleb/FakeAVCeleb_v1.2",
            ]
        if args.amount:
            argv += ["--amount", str(args.amount)]
        print("evaluate_models_on_adversarial_attacks", argv)
        sys.argv = ["evaluate_models_on_adversarial_attacks.py"] + argv
        adv_eval.main(adv_eval.parse_args())
