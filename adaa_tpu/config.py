"""Config / flag surface.

Keeps the reference's yaml schema (README.md:32-46 of the reference and
configs/**):

.. code-block:: yaml

    data:
      seed: 42
      adversarial_attacks: [FGSM, ...]        # optional
    checkpoint:
      path: trained_models/.../ckpt.msgpack   # or torch .pth
      # legacy variant written by the adversarial training CLI:
      # paths: [ ... ]   (train_models_on_adversarial_attacks.py:143-149)
    model:
      name: lcnn | specrnet | rawnet3
      parameters: {...}
      optimizer: {lr: 1e-4, ...}

The reference has two competing checkpoint schemas (``path`` read at
train_models_on_adversarial_attacks.py:89 vs ``paths[0]`` at :105);
we accept both transparently.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml


@dataclasses.dataclass
class ModelConfig:
    name: str
    parameters: Dict[str, Any] = dataclasses.field(default_factory=dict)
    optimizer: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class ExperimentConfig:
    model: ModelConfig
    seed: int = 42
    checkpoint_path: Optional[str] = None
    adversarial_attacks: List[str] = dataclasses.field(default_factory=list)
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, config: Dict[str, Any]) -> "ExperimentConfig":
        data = config.get("data", {}) or {}
        ckpt = config.get("checkpoint", {}) or {}
        model = config.get("model", {}) or {}
        return cls(
            model=ModelConfig(
                name=model.get("name", ""),
                parameters=model.get("parameters", {}) or {},
                optimizer=model.get("optimizer", {}) or {},
            ),
            seed=data.get("seed", 42),
            checkpoint_path=resolve_checkpoint_path(ckpt),
            adversarial_attacks=list(data.get("adversarial_attacks", []) or []),
            raw=config,
        )

    @classmethod
    def from_yaml(cls, path: Union[str, Path]) -> "ExperimentConfig":
        with open(path, "r") as f:
            return cls.from_dict(yaml.safe_load(f))

    def to_dict(self) -> Dict[str, Any]:
        d = dict(self.raw) if self.raw else {}
        d.setdefault("data", {})["seed"] = self.seed
        if self.adversarial_attacks:
            d["data"]["adversarial_attacks"] = list(self.adversarial_attacks)
        d["checkpoint"] = {"path": self.checkpoint_path}
        d["model"] = {
            "name": self.model.name,
            "parameters": self.model.parameters,
            "optimizer": self.model.optimizer,
        }
        return d

    def dump_yaml(self, path: Union[str, Path]) -> None:
        with open(path, "w") as f:
            yaml.dump(self.to_dict(), f)


def resolve_checkpoint_path(ckpt: Dict[str, Any]) -> Optional[str]:
    """Accept both ``checkpoint.path`` and legacy ``checkpoint.paths[0]``."""
    path = ckpt.get("path")
    if path:
        return str(path)
    paths = ckpt.get("paths")
    if paths:
        return str(paths[0])
    return None


def load_yaml(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)
