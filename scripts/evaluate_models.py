#!/usr/bin/env python
"""Clean evaluation CLI — surface mirror of the reference's
evaluate_models.py (flags: --asv_path/--wavefake_path/--celeb_path,
--config, --amount/-a, --cpu/-c; reference evaluate_models.py:159-190).
"""
import argparse
import sys
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
    from adaa_tpu.eval.evaluation import evaluate_nn
    from adaa_tpu.utils import set_seed

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)

    seed = config["data"].get("seed", 42)
    set_seed(seed)

    module, variables = models.load_model(config)
    dataset = build_dataset(
        [args.asv_path, args.wavefake_path, args.celeb_path],
        subset="val",
        reduced_number=args.amount,
    )
    evaluate_nn(
        module,
        variables,
        dataset,
        model_name=config["model"]["name"],
    )


def parse_args():
    parser = argparse.ArgumentParser()
    add_dataset_path_args(parser)
    parser.add_argument(
        "--config",
        help="Model config file path (default: config.yaml)",
        type=str,
        default="config.yaml",
    )
    parser.add_argument(
        "--amount", "-a",
        help="Amount of files to load from each directory (default: None - use all).",
        type=int,
        default=None,
    )
    parser.add_argument("--cpu", "-c", help="Force using cpu", action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
