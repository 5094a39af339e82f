"""Shared CLI plumbing for the entry-point scripts.

Keeps the reference's dataset-path flag surface (reference:
train_models.py:155-235, evaluate_models.py:159-190) and adds one
extension: passing ``synthetic[:N[:L]]`` as ``--asv_path`` selects the
in-memory synthetic dataset with N items of L samples each (this
environment carries no audio corpora; tests/benchmarks need a data
source).
"""
from __future__ import annotations

import logging
import sys
from typing import List, Optional, Union

ASVSPOOF_DATASET_PATH = "/home/adminuser/storage/datasets/deep_fakes/ASVspoof2021/DF"
WAVEFAKE_DATASET_PATH = "/home/adminuser/storage/datasets/deep_fakes/WaveFake"
FAKEAVCELEB_DATASET_PATH = (
    "/home/adminuser/storage/datasets/deep_fakes/FakeAVCeleb/FakeAVCeleb_v1.2"
)


def enable_compilation_cache() -> None:
    """Point jax at the repo's persistent compilation cache.

    LCNN@64600 compiles take 1-4 min on the tunneled TPU; the cache
    makes every CLI rerun (and the multi-run drivers' inner loops)
    compile-free.
    """
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parents[1]
            / ".jax_cache"),
    )


def setup_logging() -> logging.Logger:
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    ch = logging.StreamHandler(sys.stdout)
    ch.setFormatter(
        logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(ch)
    return logger


def add_dataset_path_args(parser) -> None:
    parser.add_argument(
        "--asv_path", type=str, default=ASVSPOOF_DATASET_PATH,
        help="Path to ASVspoof2021 dataset directory (or 'synthetic[:N]')",
    )
    parser.add_argument(
        "--wavefake_path", type=str, default=WAVEFAKE_DATASET_PATH,
        help="Path to WaveFake dataset directory",
    )
    parser.add_argument(
        "--celeb_path", type=str, default=FAKEAVCELEB_DATASET_PATH,
        help="Path to FakeAVCeleb dataset directory",
    )


def build_dataset(
    datasets_paths: List[Union[str, None]],
    subset: str,
    reduced_number: Optional[int] = None,
    oversample: bool = True,
    return_label: bool = True,
    return_meta: bool = False,
    return_raw: bool = False,
):
    # argparse can't pass None; empty string or "none" means "skip this
    # dataset" (the reference's None semantics, evaluate_models.py:162)
    datasets_paths = [
        None if (isinstance(p, str) and p.strip().lower() in ("", "none"))
        else p
        for p in datasets_paths
    ]
    asv = datasets_paths[0]
    if isinstance(asv, str) and asv.startswith("synthetic"):
        from adaa_tpu.data.synthetic import SyntheticDataset

        parts = asv.split(":")
        n = int(parts[1]) if len(parts) > 1 else 256
        if reduced_number:
            n = min(n, reduced_number)
        kwargs = {}
        if len(parts) > 2:  # synthetic:N:L — short waves for fast tests
            kwargs["wave_length"] = int(parts[2])
        return SyntheticDataset(
            n=n, subset=subset,
            return_label=return_label, return_meta=return_meta,
            return_raw=return_raw, **kwargs,
        )

    from adaa_tpu.data.detection import DetectionDataset

    return DetectionDataset(
        asvspoof_path=datasets_paths[0],
        wavefake_path=datasets_paths[1],
        fakeavceleb_path=datasets_paths[2],
        subset=subset,
        reduced_number=reduced_number,
        oversample=oversample,
        return_label=return_label,
        return_meta=return_meta,
        return_raw=return_raw,
    )
