#!/usr/bin/env python
"""Adversarial evaluation CLI (white-box + transferability) — surface
mirror of the reference's evaluate_models_on_adversarial_attacks.py
(flags: --attack (enum names), --attack_model_config, --config,
--amount/-a, --qual, --raw_from_dataset; reference :38-101). Logs to
logs/<datetime>.log like the reference (:30-35).
"""
import argparse
import logging
import sys
from datetime import datetime
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
    Path("logs").mkdir(exist_ok=True)
    fh = logging.FileHandler(f"logs/{datetime.now()}.log")
    fh.setFormatter(
        logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(fh)
    print(args)

    import yaml

    from adaa_tpu import models
    from adaa_tpu.eval.adv_evaluation import generate_attacks
    from adaa_tpu.utils import set_seed

    if args.attack_model_config is not None:
        with open(args.attack_model_config, "r") as f:
            attack_model_config = yaml.safe_load(f)
    else:
        attack_model_config = None

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)

    seed = config["data"].get("seed", 42)
    key = set_seed(seed)

    module, variables = models.load_model(config)
    if attack_model_config is not None:
        attack_module, attack_variables = models.load_model(attack_model_config)
    else:
        attack_module, attack_variables = None, None

    if args.qual:
        from adaa_tpu.eval.qualitative import AttackAnalyser

        results_folder = (
            f"attack_{args.attack}_"
            f"{Path(args.attack_model_config).stem}_on_{Path(args.config).stem}"
        )
        analyser = AttackAnalyser(Path("qualitative_results") / results_folder)
        on_attack_end_callback = analyser.analyse
    else:
        on_attack_end_callback = None

    dataset = build_dataset(
        [args.asv_path, args.wavefake_path, args.celeb_path],
        subset="val",
        reduced_number=args.amount,
        return_label=True,
        return_meta=True,
        return_raw=args.raw_from_dataset,
    )
    generate_attacks(
        victim_module=module,
        victim_variables=variables,
        dataset=dataset,
        attack_name=args.attack,
        attack_module=attack_module,
        attack_variables=attack_variables,
        key=key,
        on_attack_end_callback=on_attack_end_callback,
        raw_sample_from_dataset=args.raw_from_dataset,
    )


def parse_args():
    from adaa_tpu.attacks import attack_names

    parser = argparse.ArgumentParser()
    add_dataset_path_args(parser)
    parser.add_argument(
        "--attack",
        help="Attack to apply",
        type=str,
        default="NO_ATTACK",
        choices=attack_names(),
    )
    parser.add_argument(
        "--attack_model_config",
        help="Attack (surrogate) model config file path",
        type=str,
        default=None,
    )
    parser.add_argument(
        "--config",
        help="Model config file path",
        type=str,
        default="configs/lcnn.yaml",
    )
    parser.add_argument(
        "--amount", "-a",
        help="Amount of files to load from each directory (default: None - use all).",
        type=int,
        default=None,
    )
    parser.add_argument(
        "--qual", help="Generate qualitative results",
        default=False, action="store_true",
    )
    parser.add_argument(
        "--raw_from_dataset", help="Return raw sample from the dataset",
        default=False, action="store_true",
    )
    parser.add_argument("--cpu", "-c", help="Force using cpu",
                        action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
