"""Deterministic seeding.

The reference fixes python/numpy/torch RNGs + cudnn determinism
(src/utils.py:33-44). In JAX, on-device randomness is explicit PRNG-key
threading, so `set_seed` covers the host-side RNGs (python `random`,
numpy — used for dataset splits and strategy sampling) and returns a
root `jax.random.PRNGKey` for device-side randomness.
"""
from __future__ import annotations

import os
import random

import numpy as np

import jax


def set_seed(seed: int) -> "jax.Array":
    """Fix host PRNGs and return the root JAX key for this run."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
