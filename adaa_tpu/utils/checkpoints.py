"""Checkpoint save/load.

The reference persists `torch.save(model.state_dict())` to
``trained_models/aad__{model}__{ts}/ckpt[_{epoch:02d}].pth``
(src/trainer.py:20-33, train_models.py:25-32). We keep the same
directory/name scheme but store flax variable pytrees as msgpack
(``.msgpack``). Torch ``.pth`` checkpoints are importable through the
per-model converters in :mod:`adaa_tpu.models.torch_import` — the
public loader dispatches on file extension so the reference's configs
(``checkpoint: {path: ...}``) keep working against torch weights.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional, Union

from flax import serialization

LOGGER = logging.getLogger(__name__)


def save_checkpoint(
    variables: Any,
    model_dir: Union[Path, str],
    name: str,
    epoch: Optional[int] = None,
) -> Path:
    """Save variables under ``{model_dir}/{name}/ckpt[_{epoch:02d}].msgpack``.

    Mirrors the reference's layout (src/trainer.py:20-33).
    """
    full_model_dir = Path(model_dir) / name
    full_model_dir.mkdir(parents=True, exist_ok=True)
    epoch_str = f"_{epoch:02d}" if epoch is not None else ""
    path = full_model_dir / f"ckpt{epoch_str}.msgpack"
    path.write_bytes(serialization.to_bytes(variables))
    LOGGER.info("Training model saved under: %s", path)
    return path


def load_checkpoint(path: Union[Path, str], target: Any) -> Any:
    """Load a checkpoint into the structure of ``target`` variables.

    * ``.msgpack`` — native flax checkpoint.
    * ``.pth`` / ``.pt`` — torch state_dict, converted via
      :mod:`adaa_tpu.models.torch_import` (model inferred from target's
      structure is not possible, so the caller should prefer
      :func:`adaa_tpu.models.load_model` for torch checkpoints).
    """
    path = Path(path)
    if path.suffix in (".pth", ".pt"):
        raise ValueError(
            "Torch checkpoints must be imported via "
            "adaa_tpu.models.load_model / torch_import converters "
            f"(got {path})."
        )
    return serialization.from_bytes(target, path.read_bytes())


def save_checkpoint_orbax(
    variables: Any,
    model_dir: Union[Path, str],
    name: str,
    epoch: Optional[int] = None,
) -> Path:
    """Orbax-backed checkpoint (sharded-array aware — arrays laid out on
    a multi-host mesh save without gathering to one host). Use for
    large-scale runs; the msgpack path stays the default single-host
    format."""
    import orbax.checkpoint as ocp

    full_model_dir = Path(model_dir).resolve() / name
    epoch_str = f"_{epoch:02d}" if epoch is not None else ""
    path = full_model_dir / f"ckpt{epoch_str}.orbax"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, variables, force=True)
    LOGGER.info("Training model saved under: %s", path)
    return path


def load_checkpoint_orbax(path: Union[Path, str], target: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), target)
