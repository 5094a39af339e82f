"""Detector model zoo + factory.

Mirrors the reference factory surface (reference: src/models/models.py:6-18):
``get_model(name, config)`` for "rawnet3" / "lcnn" / "specrnet" (the
reference also ships RawNet2 / MesoNet / Xception which are not wired
into its factory; see adaa_tpu.models.extra for those).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaa_tpu.models.lcnn import LCNN
from adaa_tpu.models.rawnet3 import RawNet3, prepare_model
from adaa_tpu.models.specrnet import SpecRNet

LOGGER = logging.getLogger(__name__)

WAVE_LENGTH = 64_600  # canonical input length (reference base_dataset.py:27)


def get_model(model_name: str, config: Dict[str, Any]) -> nn.Module:
    """Build a detector module (reference src/models/models.py:6-18)."""
    if model_name == "rawnet3":
        import os

        import jax.numpy as jnp

        if (config.get("compute_dtype") == "bfloat16"
                or os.environ.get("ADAA_BF16") == "1"):
            return RawNet3(compute_dtype=jnp.bfloat16)
        return prepare_model()
    elif model_name == "lcnn":
        import os

        import jax.numpy as jnp

        compute_dtype = None
        if (config.get("compute_dtype") == "bfloat16"
                or os.environ.get("ADAA_BF16") == "1"):
            compute_dtype = jnp.bfloat16
        return LCNN(
            input_channels=config.get("input_channels", 1),
            num_coefficients=config.get("num_coefficients", 80),
            frontend_algorithm=tuple(config.get("frontend_algorithm", [])),
            compute_dtype=compute_dtype,
            precision=config.get("precision"),
        )
    elif model_name == "specrnet":
        import os

        import jax.numpy as jnp

        compute_dtype = None
        if (config.get("compute_dtype") == "bfloat16"
                or os.environ.get("ADAA_BF16") == "1"):
            compute_dtype = jnp.bfloat16
        return SpecRNet(
            input_channels=config.get("input_channels", 1),
            frontend_algorithm=tuple(config.get("frontend_algorithm", [])),
            compute_dtype=compute_dtype,
        )
    raise ValueError(f"Model '{model_name}' not supported")


def init_model(
    module: nn.Module,
    key: jax.Array,
    batch_size: int = 1,
    wave_length: int = WAVE_LENGTH,
) -> Dict[str, Any]:
    """Initialize variables ({'params', 'batch_stats'}) on a dummy wave."""
    dummy = jnp.zeros((batch_size, wave_length), jnp.float32)
    variables = module.init({"params": key}, dummy, train=False)
    return dict(variables)


def load_model(
    model_config: Dict[str, Any],
    key: Optional[jax.Array] = None,
) -> Tuple[nn.Module, Dict[str, Any]]:
    """Build arch + load weights from a full experiment config dict.

    Equivalent of the reference's ``src/utils.py:47-70`` including the
    DataParallel ``module.``-prefix fallback (handled inside the torch
    importer) and torch ``.pth`` checkpoints.
    """
    from adaa_tpu import config as config_lib

    model_name = model_config["model"]["name"]
    model_parameters = model_config["model"].get("parameters", {}) or {}
    model_path = config_lib.resolve_checkpoint_path(
        model_config.get("checkpoint", {}) or {}
    )

    module = get_model(model_name, model_parameters)
    if key is None:
        key = jax.random.PRNGKey(0)
    variables = init_model(module, key)

    if model_path:
        if str(model_path).endswith((".pth", ".pt")):
            from adaa_tpu.models import torch_import

            variables = torch_import.import_torch_checkpoint(
                model_name, model_path, variables
            )
        else:
            from adaa_tpu.utils import load_checkpoint

            variables = load_checkpoint(model_path, variables)
        LOGGER.info(
            "Loaded weights on '%s' model, path: %s", model_name, model_path
        )
    return module, variables
