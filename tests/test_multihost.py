"""Real multi-process (DCN-path) bring-up test for initialize_multihost.

The reference has no multi-host story at all (its ceiling is
single-process ``nn.DataParallel``, reference src/utils.py:61); this
framework's multi-host path is ``jax.distributed.initialize`` +
the same mesh/sharding code used single-host (adaa_tpu/parallel/mesh.py).

This test actually forms a 2-process cluster over a localhost
coordinator (gloo collectives on the CPU backend, 4 virtual devices
per process -> one 8-device global mesh) and runs a jitted
grad-allreduce step over a globally-sharded batch — the exact pattern
the trainers use — so the cross-process init + collective path is
exercised for real, not just the single-host no-op.
"""
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS is
    # ignored in this image (site config pins axon,cpu) — see conftest
    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from adaa_tpu.parallel.mesh import initialize_multihost, make_mesh

    got = initialize_multihost(addr, nproc, pid)
    assert got == nproc, got
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * len(jax.local_devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    # globally-sharded batch assembled from per-process shards
    n_local = 2 * len(jax.local_devices())
    xl = np.linspace(0, 1, n_local * 4, dtype=np.float32).reshape(n_local, 4)
    xl += pid  # distinct per-process content
    yl = (np.arange(n_local) % 2).astype(np.float32)
    x = jax.make_array_from_process_local_data(shard, xl)
    y = jax.make_array_from_process_local_data(shard, yl)
    w = jnp.ones((4,), jnp.float32)

    def loss(w, x, y):  # tiny logistic loss: grad needs a cross-shard psum
        z = x @ w
        return jnp.mean(jax.nn.softplus(z) - y * z)

    step = jax.jit(
        jax.grad(loss),
        in_shardings=(repl, shard, shard),
        out_shardings=repl,
    )
    g = step(w, x, y)
    print("GRAD", " ".join(f"{v:.6f}" for v in np.asarray(g)), flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.replace("{repo!r}", repr(str(REPO))))
    addr = f"localhost:{_free_port()}"
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", addr],
            cwd=REPO, env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=300)[0] for p in procs]
    finally:
        # a hung handshake (port race, early worker crash) must not
        # leak two blocked python processes into later runs
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    grads = [
        line.split()[1:]
        for out in outs
        for line in out.splitlines()
        if line.startswith("GRAD")
    ]
    assert len(grads) == 2
    # both processes must see the SAME fully-reduced gradient
    assert grads[0] == grads[1]

    # oracle: the same loss/grad computed single-process over the
    # concatenated global batch
    import numpy as np

    n_local = 8
    xs, ys = [], []
    for pid in range(2):
        xl = np.linspace(0, 1, n_local * 4, dtype=np.float32).reshape(
            n_local, 4
        ) + pid
        xs.append(xl)
        ys.append((np.arange(n_local) % 2).astype(np.float32))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    z = x @ np.ones(4, np.float32)
    sig = 1.0 / (1.0 + np.exp(-z))
    ref = (x * (sig - y)[:, None]).mean(axis=0)
    got = np.asarray([float(v) for v in grads[0]])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
