#!/usr/bin/env python
"""Batch training orchestration — equivalent of the reference's
multi_runs_scripts/run_multiple_trainings.py:24-33 (loop over
batch_config.yaml paths, train each with batch 128 / 10 epochs).
Runs each training in-process instead of via subprocess.
"""
import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", help="Path to batch config.",
                        default="batch_config.yaml")
    parser.add_argument("--asv_path", default=None)
    parser.add_argument("--wavefake_path", default=None)
    parser.add_argument("--celeb_path", default=None)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=10)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    with open(args.config, "r") as f:
        configs_to_run = yaml.safe_load(f)["paths"]
    print("Running following configs: ", configs_to_run)

    from scripts import train_models

    for current_config in configs_to_run:
        argv = [
            "--config", current_config,
            "--batch_size", str(args.batch_size),
            "--epochs", str(args.epochs),
        ]
        for flag, val in (("--asv_path", args.asv_path),
                          ("--wavefake_path", args.wavefake_path),
                          ("--celeb_path", args.celeb_path)):
            if val:
                argv += [flag, val]
        print("train_models", argv)
        sys.argv = ["train_models.py"] + argv
        train_models.main(train_models.parse_args())
