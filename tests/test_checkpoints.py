"""Checkpoint save/load: msgpack default + orbax option + torch guard."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.utils.checkpoints import (
    load_checkpoint,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)

VARS = {
    "params": {"w": jnp.arange(6.0).reshape(2, 3)},
    "batch_stats": {"mean": jnp.ones(3)},
}


def test_msgpack_roundtrip(tmp_path):
    p = save_checkpoint(VARS, tmp_path, "model", epoch=3)
    assert p.name == "ckpt_03.msgpack"
    zero = jax.tree_util.tree_map(np.zeros_like, VARS)
    restored = load_checkpoint(p, zero)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(VARS["params"]["w"])
    )


def test_torch_path_guard(tmp_path):
    f = tmp_path / "ckpt.pth"
    f.write_bytes(b"x")
    with pytest.raises(ValueError, match="torch_import"):
        load_checkpoint(f, VARS)


def test_orbax_roundtrip(tmp_path):
    p = save_checkpoint_orbax(VARS, tmp_path, "model")
    zero = jax.tree_util.tree_map(np.zeros_like, VARS)
    restored = load_checkpoint_orbax(p, zero)
    np.testing.assert_array_equal(
        np.asarray(restored["batch_stats"]["mean"]), np.ones(3)
    )
