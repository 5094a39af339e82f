#!/usr/bin/env python
"""Batch clean evaluation — equivalent of the reference's
multi_runs_scripts/run_multiple_evaluations.py:23-31.
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
    parser.add_argument("--amount", "-a", type=int, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    with open(args.config, "r") as f:
        configs_to_run = yaml.safe_load(f)["paths"]
    print("Running following configs: ", configs_to_run)

    from scripts import evaluate_models

    for current_config in configs_to_run:
        argv = ["--config", current_config]
        if args.amount:
            argv += ["--amount", str(args.amount)]
        for flag, val in (("--asv_path", args.asv_path),
                          ("--wavefake_path", args.wavefake_path),
                          ("--celeb_path", args.celeb_path)):
            if val:
                argv += [flag, val]
        print("evaluate_models", argv)
        sys.argv = ["evaluate_models.py"] + argv
        evaluate_models.main(evaluate_models.parse_args())
