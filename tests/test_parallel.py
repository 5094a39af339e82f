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


@pytest.mark.slow
def test_lcnn_pgd10_sharded_matches_single_device():
    """VERDICT item 6: the REAL flagship model (LCNN+LFCC) under the
    registry PGD-10 attack must produce identical adversarial audio on
    1 device and on the 8-device mesh."""
    from adaa_tpu import attacks as attacks_lib
    from adaa_tpu import models

    wave_len = 8_000
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=wave_len
    )
    builder, params = attacks_lib.ATTACK_REGISTRY["PGD"]

    def attack_batch(variables, x, y, key):
        logits_fn = lambda xx: module.apply(variables, xx, train=False)
        atk = builder(logits_fn, **params)
        x01, mn, mx = attack_core.to_minmax(x)
        return attack_core.revert_minmax(atk(x01, y, key), mn, mx)

    rng = np.random.default_rng(5)
    x = (rng.standard_normal((16, wave_len)) * 0.1).astype(np.float32)
    y = (rng.random(16) > 0.5).astype(np.int32)
    key = jax.random.PRNGKey(7)

    ref = np.asarray(
        jax.jit(attack_batch)(variables, jnp.asarray(x), jnp.asarray(y), key)
    )
    mesh = make_mesh(8)
    dp = data_parallel_attack_fn(attack_batch, mesh)
    out = np.asarray(
        dp(replicate(variables, mesh), shard_batch(mesh, x),
           shard_batch(mesh, y), key)
    )
    # sign(grad) can flip on coordinates where the f32 gradient is ~0
    # and the sharded reduction order differs; require >=99%
    # coordinate-exact with every deviation bounded by the PGD
    # step-size scale (same criterion as the torch cross-framework
    # parity test, tests/test_torch_parity.py)
    diff = np.abs(out - ref)
    exact = (diff <= 1e-6).mean()
    assert exact >= 0.99, f"only {exact:.2%} coordinate-exact"
    assert diff.max() <= 2e-3  # bounded by O(alpha * minmax scale)
    assert not np.allclose(out, x)  # the attack actually perturbed


@pytest.mark.slow
def test_lcnn_train_step_sharded_matches_single_device():
    """One LCNN train_step (fwd+bwd+Adam+batch-stats) must yield the
    same loss and updated parameters on 1 device and on the 8-mesh."""
    from adaa_tpu import models
    from adaa_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from adaa_tpu.training import train_state as ts
    from adaa_tpu.training.gd_trainer import train_step

    wave_len = 8_000
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=wave_len
    )
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((16, wave_len)) * 0.1).astype(np.float32)
    y = (rng.random(16) > 0.5).astype(np.int32)
    dk = jax.random.PRNGKey(3)

    # train_step donates its state and the donated buffers alias the
    # shared `variables`: materialize both states (with copies) first
    mesh = make_mesh(8)
    state1 = ts.create_train_state(module, variables, {"lr": 1e-4})
    state1 = jax.tree_util.tree_map(jnp.array, state1)
    state8 = ts.create_train_state(module, variables, {"lr": 1e-4})
    state8 = replicate(state8, mesh)

    state1, loss1, acc1 = train_step(
        state1, jnp.asarray(x), jnp.asarray(y), dk,
        jnp.zeros((2,), jnp.float32),
    )
    state8, loss8, acc8 = train_step(
        state8, shard_batch(mesh, x), shard_batch(mesh, y), dk,
        replicate(jnp.zeros((2,), jnp.float32), mesh),
    )

    assert float(loss1) == pytest.approx(float(loss8), abs=1e-6)
    acc1, acc8 = np.asarray(acc1), np.asarray(acc8)
    assert acc1[0] == pytest.approx(acc8[0], abs=2e-5)  # loss_sum
    assert int(acc1[1]) == int(acc8[1])  # correct count
    # the first Adam step is ~ lr*sign(grad): coordinates whose f32
    # gradient is reduction-order-noise-small can flip sign between the
    # sharded and unsharded all-reduce, moving the param by up to 2*lr
    # — require >=99.5% of coordinates tight and every outlier bounded
    # by that 2*lr scale (same criterion as the PGD test above)
    lr = 1e-4
    diffs = []
    for group1, group8 in (
        (state1.params, state8.params),
        (state1.batch_stats, state8.batch_stats),
    ):
        for a, b in zip(jax.tree_util.tree_leaves(group1),
                        jax.tree_util.tree_leaves(group8)):
            diff = np.abs(np.asarray(a) - np.asarray(b)).ravel()
            assert diff.max() <= 2.5 * lr  # bounded by the sign-flip scale
            diffs.append(diff)
    alldiff = np.concatenate(diffs)
    tight = (alldiff <= 1e-5).mean()
    assert tight >= 0.99, f"only {tight:.2%} of coordinates tight"


def test_evaluate_nn_sharded_equals_unsharded():
    """Sharded evaluate_nn (batch divisible by the 8 devices) must
    report identical metrics to the unsharded path over the same
    dataset (metrics are set-level, order-invariant)."""
    from adaa_tpu.eval.evaluation import evaluate_nn

    class Probe:
        def apply(self, variables, x, train=False):
            return (x[:, :16].mean(axis=1) * 4.0)[:, None]

    class DS:
        def __init__(self, n):
            rng = np.random.default_rng(0)
            self.items = [
                (np.full(64, (1.0 if i % 2 else -1.0) * rng.uniform(0.2, 1),
                         np.float32), 16000, i % 2)
                for i in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    sharded = evaluate_nn(Probe(), {}, DS(48), batch_size=16)   # 16 % 8 == 0
    unsharded = evaluate_nn(Probe(), {}, DS(48), batch_size=12)  # 12 % 8 != 0
    assert sharded == unsharded


def test_fused_bf16_lcnn_shards_over_mesh(monkeypatch):
    """The fused Pallas first block (canonical 64600-sample shape,
    bf16 trunk) must partition under batch sharding on the 8-device
    mesh — pallas_call + SPMD partitioner compatibility guard."""
    from adaa_tpu import models

    monkeypatch.delenv("ADAA_FUSED_LCNN", raising=False)
    wave_len = 64_600
    module = models.get_model(
        "lcnn",
        {"input_channels": 1, "frontend_algorithm": ["lfcc"],
         "compute_dtype": "bfloat16"},
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=wave_len
    )

    def fwdgrad(variables, x, y, key):
        del y, key
        return jax.grad(
            lambda x: module.apply(variables, x, train=False).sum())(x)

    rng = np.random.default_rng(6)
    x = (rng.standard_normal((8, wave_len)) * 0.1).astype(np.float32)
    y = np.zeros(8, np.int32)
    key = jax.random.PRNGKey(0)
    ref = np.asarray(
        jax.jit(fwdgrad)(variables, jnp.asarray(x), jnp.asarray(y), key))

    mesh = make_mesh(8)
    dp = data_parallel_attack_fn(fwdgrad, mesh)
    out = np.asarray(dp(replicate(variables, mesh), shard_batch(mesh, x),
                        shard_batch(mesh, y), key))
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    # bf16 grads; identical math modulo reduction order
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)


def _run_adv_trainer(strategy, attacks, sharded, monkeypatch, n=48,
                     batch=16, epochs=1):
    """Full AdversarialGDTrainer.train() with the sharding path forced
    on (real 8-device make_sharding) or off (identity fns), identical
    host RNG/loader order, for 1-vs-8 equality tests (VERDICT r4 item
    8: the reference's DataParallel trainers must not change results
    when scattered, train_models_on_adversarial_attacks.py:95-104)."""
    import functools
    import random as pyrandom

    import flax.linen as nn

    from adaa_tpu.data.loader import DataLoader
    from adaa_tpu.training import adv_trainer as at
    from adaa_tpu.training import gd_trainer as gt
    from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(1)(x[:, :64])

    module = Tiny()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)))

    class DS:
        def __init__(self, n):
            rng = np.random.default_rng(0)
            self.items = [
                (rng.standard_normal(256).astype(np.float32) + (i % 2),
                 16000, i % 2)
                for i in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    monkeypatch.setattr(
        at, "DataLoader", functools.partial(DataLoader, seed=0)
    )
    if not sharded:
        monkeypatch.setattr(
            gt, "make_sharding",
            lambda b: ((lambda x: jnp.asarray(x)), (lambda t: t)),
        )

    pyrandom.seed(1234)
    trainer = ADV_TRAINER_REGISTRY[strategy](
        epochs=epochs, batch_size=batch, optimizer_kwargs={"lr": 1e-3}
    )
    best = trainer.train(
        dataset=DS(n), module=module, variables=variables,
        attack_module=module, attack_variables=None,
        adversarial_attacks=attacks, test_dataset=DS(n),
        key=jax.random.PRNGKey(7),
    )
    weights = list(getattr(trainer, "adv_attacks_weights", []))
    return jax.tree_util.tree_map(np.asarray, best), weights


def _assert_trees_equal(t1, t8, atol):
    for a, b in zip(jax.tree_util.tree_leaves(t1),
                    jax.tree_util.tree_leaves(t8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_equal_trainer_sharded_matches_single_device(monkeypatch):
    """EQUAL's host-indexed half-batch scatter (adv_trainer.py
    EqualAdversarialGDTrainer.apply_adv_attack) must survive batch
    sharding: same params after 3 steps on 1 vs 8 devices."""
    p1, _ = _run_adv_trainer("EQUAL", ["FGSM"], False, monkeypatch)
    p8, _ = _run_adv_trainer("EQUAL", ["FGSM"], True, monkeypatch)
    _assert_trees_equal(p1, p8, atol=1e-5)


def test_adaptive_trainer_sharded_matches_single_device(monkeypatch):
    """ADAPTIVE's weight evolution (lagged loss-EMA pulls) and final
    params must agree between the unsharded and 8-device runs."""
    p1, w1 = _run_adv_trainer("ADAPTIVE", ["FGSM", "FGSM_eps001"], False,
                              monkeypatch, epochs=2)
    p8, w8 = _run_adv_trainer("ADAPTIVE", ["FGSM", "FGSM_eps001"], True,
                              monkeypatch, epochs=2)
    assert len(w1) == len(w8) == 3
    np.testing.assert_allclose(w1, w8, atol=1e-5)
    _assert_trees_equal(p1, p8, atol=1e-5)


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    from adaa_tpu.parallel.mesh import initialize_multihost

    monkeypatch.delenv("ADAA_COORDINATOR", raising=False)
    assert initialize_multihost() == 1


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
