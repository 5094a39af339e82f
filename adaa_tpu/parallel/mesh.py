"""SPMD data parallelism over a device mesh.

The reference's entire distributed story is single-process
``torch.nn.DataParallel`` (replicate + scatter/gather; reference:
evaluate_models_on_adversarial_attacks.py:163-167,
train_models_on_adversarial_attacks.py:95-104, src/utils.py:61).
Attacks and training are per-sample independent, so the TPU-native
equivalent is batch-axis sharding under ``jit``: parameters replicated,
batch sharded on a 1-D ``data`` mesh axis, XLA/GSPMD inserting the
gradient all-reduces over ICI. Multi-host extends the same code path
(jax distributed init makes ``jax.devices()`` span hosts; DCN handles
cross-slice collectives) — no NCCL-style plumbing to port.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over (the first n) visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU)"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place a pytree of batched arrays with the leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )


def data_parallel_attack_fn(
    attack_batch_fn: Callable,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Wrap a jitted ``(variables, x, y, key) -> adv`` attack so the wave
    batch shards across the mesh — the TPU equivalent of wrapping the
    surrogate in nn.DataParallel before attacking
    (evaluate_models_on_adversarial_attacks.py:167-170)."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    jitted = jax.jit(
        attack_batch_fn,
        in_shardings=(repl, batch_sharding, batch_sharding, repl),
        out_shardings=batch_sharding,
    )

    def wrapped(variables, x, y, key):
        return jitted(variables, x, y, key)

    return wrapped


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bring-up: after this, ``jax.devices()`` spans all
    hosts and the same mesh/sharding code paths scale across DCN —
    collectives ride ICI within a slice and DCN across slices, with
    no NCCL-style plumbing (the reference has no multi-host story at
    all; its ceiling is single-process DataParallel).

    No-ops (returns 1) when no coordinator is configured — single-host
    runs and tests take this path.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "ADAA_COORDINATOR"
    )
    if not coordinator_address:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["ADAA_NUM_PROCESSES"]),
        process_id=process_id if process_id is not None
        else int(os.environ["ADAA_PROCESS_ID"]),
    )
    return jax.process_count()
