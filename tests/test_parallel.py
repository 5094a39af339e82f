"""Multi-device tests on the virtual 8-device CPU mesh.

Replaces the reference's (nonexistent) distributed tests: same pipeline
on 1 vs N devices must agree, and the driver's multichip dryrun must
compile + run.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core as attack_core
from adaa_tpu.attacks.gradient import fgsm
from adaa_tpu.parallel.mesh import (
    data_parallel_attack_fn,
    make_mesh,
    replicate,
    shard_batch,
)

D = 64


def _toy():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((D, 1)).astype(np.float32) / 8.0)

    def apply_fn(variables, x, train=False):
        return x @ variables["w"]

    return apply_fn, {"w": w}


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8


def test_sharded_attack_matches_single_device():
    apply_fn, variables = _toy()
    mesh = make_mesh(8)

    def attack_batch(variables, x, y, key):
        logits_fn = lambda xx: apply_fn(variables, xx)
        atk = fgsm(logits_fn, eps=0.01)
        x01, mn, mx = attack_core.to_minmax(x)
        return attack_core.revert_minmax(atk(x01, y, key), mn, mx)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((16, D)).astype(np.float32)
    y = (rng.random(16) > 0.5).astype(np.int32)
    key = jax.random.PRNGKey(0)

    # single device
    ref = np.asarray(attack_batch(variables, jnp.asarray(x), jnp.asarray(y), key))

    # 8-way sharded
    dp = data_parallel_attack_fn(attack_batch, mesh)
    x_sh = shard_batch(mesh, x)
    y_sh = shard_batch(mesh, y)
    var_repl = replicate(variables, mesh)
    out = np.asarray(dp(var_repl, x_sh, y_sh, key))

    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
