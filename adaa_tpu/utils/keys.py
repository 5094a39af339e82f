"""Host-side PRNG key derivation.

Every host-loop ``jax.random.split`` is its own tiny device program on
the default backend; over the tunneled single-chip TPU its dispatch
stalls the pipeline ~25 ms (measured in scripts/bench_attacks.py's
round-3 methodology note). Threefry is backend-invariant, so splitting
on the always-present CPU backend yields BIT-IDENTICAL keys with zero
accelerator programs — per-batch keys then ride into the jitted step
with the regular argument transfer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def host_split(key, num: int = 2) -> np.ndarray:
    """``jax.random.split`` computed on the CPU backend.

    Accepts a device-resident, numpy, or freshly-made PRNG key; returns
    a host ``(num, 2)`` uint32 array whose rows equal the default-
    backend split exactly.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    key = np.asarray(key)  # 8-byte pull iff device-resident
    with jax.default_device(cpu):
        out = jax.random.split(jnp.asarray(key), num)
    return np.asarray(out)
