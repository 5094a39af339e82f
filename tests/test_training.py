"""Trainer tests: clean training learns, strategies match reference math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu import models
from adaa_tpu.data.synthetic import SyntheticDataset
from adaa_tpu.training.adv_trainer import (
    ADV_TRAINER_REGISTRY,
    AdaptiveAdversarialGDTrainer,
    AdaptiveV2AdversarialGDTrainer,
    AdversarialGDTrainer,
    EqualAdversarialGDTrainer,
    OnlyOneAdversarialGDTrainer,
    multi_f1_score,
)
from adaa_tpu.training.gd_trainer import GDTrainer, bce_with_logits

WAVE_LEN = 8_000


def test_multi_f1_score_golden():
    # len * prod / sum (trainer.py:220-224)
    assert multi_f1_score([1.0, 0.5]) == pytest.approx(2 * 0.5 / 1.5)
    assert multi_f1_score([0.9, 0.8, 0.7]) == pytest.approx(3 * 0.504 / 2.4)


def test_bce_with_logits_matches_manual():
    z = jnp.asarray([[2.0], [-1.0], [0.0]])
    y = jnp.asarray([1, 0, 1])
    manual = -(np.log(1 / (1 + np.exp(-2.0)))
               + np.log(1 - 1 / (1 + np.exp(1.0)))
               + np.log(0.5)) / 3
    assert float(bce_with_logits(z, y)) == pytest.approx(manual, rel=1e-5)


def test_registry_names_match_reference():
    assert set(ADV_TRAINER_REGISTRY) == {
        "ONLY_ADV", "RANDOM", "ADAPTIVE", "ADAPTIVE_V2", "EQUAL"
    }
    assert ADV_TRAINER_REGISTRY["RANDOM"] is AdversarialGDTrainer
    assert ADV_TRAINER_REGISTRY["EQUAL"] is EqualAdversarialGDTrainer
    assert ADV_TRAINER_REGISTRY["ONLY_ADV"] is OnlyOneAdversarialGDTrainer
    assert ADV_TRAINER_REGISTRY["ADAPTIVE"] is AdaptiveAdversarialGDTrainer
    assert ADV_TRAINER_REGISTRY["ADAPTIVE_V2"] is AdaptiveV2AdversarialGDTrainer


def test_adaptive_weight_update_golden():
    """Replicates trainer.py:544-557 arithmetic."""
    t = AdaptiveAdversarialGDTrainer(epochs=1, batch_size=4)
    t.attacks = [("A", None), ("B", None)]
    t.adv_attacks_weights = [1 / 3] * 3
    t.last_adv_attack = 0
    t.update_adv_attack(batch_loss=0.5)
    # w0 = .2*.5 + .8/3 = 0.3667; sum = 0.3667+2/3 = 1.0333
    w = t.adv_attacks_weights
    expected0 = 0.5 * (0.36666667 / 1.03333333) + 0.5 / 3
    assert w[0] == pytest.approx(expected0, rel=1e-6)
    assert sum(w) == pytest.approx(1.0, rel=1e-6)


def test_adaptive_v2_weight_update_golden():
    """Replicates trainer.py:560-581 arithmetic."""
    t = AdaptiveV2AdversarialGDTrainer(epochs=1, batch_size=4)
    t.attacks = [("A", None), ("B", None)]
    t.adv_attacks_weights = [1 / 3] * 3
    t.last_adv_attack = 2  # the no-attack arm
    t.update_adv_attack(batch_loss=2.0)  # clipped to max_val=1
    w = t.adv_attacks_weights
    # w2 = .2*1 + .8/3 = 0.46667; sum = 2/3 + 0.46667 = 1.13333
    # normalized*0.5 then + 0.5*(2/3)/2 for attacks, + 0.5*(1/3) for last
    s = 2 / 3 + 0.4666666667
    assert w[0] == pytest.approx(0.5 * ((1 / 3) / s) + 0.5 * (1 / 3), rel=1e-6)
    assert w[2] == pytest.approx(0.5 * (0.4666666667 / s) + 0.5 * (1 / 3),
                                 rel=1e-6)


def test_only_one_asserts_single_attack():
    t = OnlyOneAdversarialGDTrainer(epochs=1, batch_size=4)
    with pytest.raises(AssertionError):
        t.init_adv_attacks(None, ["FGSM", "PGD"])


@pytest.mark.slow
def test_gd_trainer_learns_synthetic():
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    key = jax.random.PRNGKey(0)
    variables = models.init_model(module, key, wave_length=WAVE_LEN)

    train_ds = SyntheticDataset(n=96, subset="train", wave_length=WAVE_LEN)
    test_ds = SyntheticDataset(n=32, subset="test", wave_length=WAVE_LEN)

    trainer = GDTrainer(epochs=2, batch_size=16, optimizer_kwargs={"lr": 1e-3})
    best = trainer.train(train_ds, module, variables, test_dataset=test_ds,
                         key=key)

    # the synthetic task is linearly separable: 2 epochs should beat chance
    from adaa_tpu.training.gd_trainer import make_eval_step

    eval_step = make_eval_step(module.apply)
    correct = total = 0
    from adaa_tpu.data.loader import DataLoader

    for batch in DataLoader(test_ds, 16, shuffle=False, num_workers=1):
        _, c, _ = eval_step(best, jnp.asarray(batch[0]), jnp.asarray(batch[2]))
        correct += int(c)
        total += batch[0].shape[0]
    assert correct / total > 0.7


@pytest.mark.slow
def test_adversarial_trainer_self_attack_runs():
    """ONLY_ADV with self-attack (attack_variables=None): one epoch of
    FGSM adversarial training completes and returns variables."""
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    key = jax.random.PRNGKey(1)
    variables = models.init_model(module, key, wave_length=WAVE_LEN)

    train_ds = SyntheticDataset(n=32, subset="train", wave_length=WAVE_LEN)
    test_ds = SyntheticDataset(n=16, subset="test", wave_length=WAVE_LEN)

    trainer = ADV_TRAINER_REGISTRY["ONLY_ADV"](
        epochs=1, batch_size=8, optimizer_kwargs={"lr": 1e-4}
    )
    best = trainer.train(
        dataset=train_ds,
        module=module,
        variables=variables,
        attack_module=module,
        attack_variables=None,  # self-attack
        adversarial_attacks=["FGSM"],
        test_dataset=test_ds,
        key=key,
    )
    assert "params" in best and "batch_stats" in best


def test_random_strategy_sampling_distribution():
    """RANDOM attacks with prob n/(n+1), uniform choice (trainer.py:464-473)."""
    import random as pyrandom

    t = AdversarialGDTrainer(epochs=1, batch_size=4)
    calls = {"count": 0, "indices": []}

    def fake_adv(variables, x, y, key):
        calls["count"] += 1
        return x

    t.attacks = [("A", fake_adv), ("B", fake_adv), ("C", fake_adv)]
    pyrandom.seed(123)
    n_trials = 4000
    for _ in range(n_trials):
        t.apply_adv_attack(None, jnp.zeros((2, 4)), jnp.zeros(2, jnp.int32),
                           None)
    # expected attack probability: n/(n+1) = 3/4
    frac = calls["count"] / n_trials
    assert abs(frac - 0.75) < 0.03


def test_equal_strategy_attacks_half_batch():
    """EQUAL: attacks[0] on exactly half the batch (trainer.py:479-497)."""
    import random as pyrandom

    t = EqualAdversarialGDTrainer(epochs=1, batch_size=8)
    attacked_sizes = []

    def fake_adv(variables, x, y, key):
        attacked_sizes.append(x.shape[0])
        return x + 1.0

    t.attacks = [("A", fake_adv)]
    pyrandom.seed(7)
    x = jnp.zeros((8, 16))
    out = t.apply_adv_attack(None, x, jnp.zeros(8, jnp.int32),
                             jax.random.PRNGKey(0))
    assert attacked_sizes == [4]
    # exactly half the rows changed
    changed = int((np.asarray(out) != 0).any(axis=1).sum())
    assert changed == 4


@pytest.mark.slow
def test_optional_in_training_eer():
    """compute_eer=True finishes the reference's 'TODO: revert EER
    support' (trainer.py:171) — real per-epoch EER on flipped labels."""
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=WAVE_LEN
    )
    train_ds = SyntheticDataset(n=32, subset="train", wave_length=WAVE_LEN)
    test_ds = SyntheticDataset(n=16, subset="test", wave_length=WAVE_LEN)
    from adaa_tpu.training.gd_trainer import make_eval_step, make_sharding
    from adaa_tpu.training import train_state as ts
    from adaa_tpu.data.loader import DataLoader

    trainer = GDTrainer(epochs=1, batch_size=8, compute_eer=True)
    state = ts.create_train_state(module, variables, {"lr": 1e-4})
    loader = DataLoader(test_ds, 8, shuffle=False, num_workers=1)
    loss, acc, eer = trainer._test_epoch(
        make_eval_step(module.apply), state, loader, compute_eer=True
    )
    assert 0.0 <= eer <= 1.0


def _tiny_module_and_data(n=48, d=256, seed=0):
    """A Dense probe + list dataset for fast full-train() tests."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(1)(x[:, :64])

    module = Tiny()
    variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, d)))

    class DS:
        def __init__(self, n):
            rng = np.random.default_rng(seed)
            self.items = [
                (rng.standard_normal(d).astype(np.float32) + (i % 2),
                 16000, i % 2)
                for i in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    return module, variables, DS(n)


def test_adaptive_lagged_pull_pairs_loss_with_attack(monkeypatch):
    """The pipelined (one-iteration-late) loss pull must deliver exactly
    one EMA update per batch, in iteration order, each paired with the
    attack index that was sampled for THAT batch — the semantics knob
    vs the reference (trainer.py:544-557) is only a one-batch lag in
    when the host applies the update, never a mispairing or a dropped
    tail."""
    import functools
    import random as pyrandom

    from adaa_tpu.data.loader import DataLoader
    from adaa_tpu.training import adv_trainer as at

    module, variables, ds = _tiny_module_and_data(n=40)
    monkeypatch.setattr(
        at, "DataLoader", functools.partial(DataLoader, seed=0)
    )

    sampled, updated = [], []

    class Probe(AdaptiveAdversarialGDTrainer):
        def apply_adv_attack(self, *a, **k):
            out = super().apply_adv_attack(*a, **k)
            sampled.append(self.last_adv_attack)
            return out

        def update_adv_attack(self, batch_loss, attack_idx=None, iter=None,
                              **kw):
            updated.append((iter, attack_idx, batch_loss))
            return super().update_adv_attack(
                batch_loss, attack_idx=attack_idx, iter=iter, **kw
            )

    pyrandom.seed(11)
    t = Probe(epochs=2, batch_size=8, optimizer_kwargs={"lr": 1e-3})
    t.train(
        dataset=ds, module=module, variables=variables,
        attack_module=module, attack_variables=None,
        adversarial_attacks=["FGSM", "FGSM_eps001"], test_dataset=ds,
        key=jax.random.PRNGKey(0),
    )
    n_batches = 40 // 8
    assert len(updated) == len(sampled) == 2 * n_batches
    # per epoch: updates arrive in iteration order and carry the index
    # sampled for that same iteration
    for e in range(2):
        ep = updated[e * n_batches : (e + 1) * n_batches]
        assert [u[0] for u in ep] == list(range(n_batches))
        assert [u[1] for u in ep] == sampled[e * n_batches : (e + 1) * n_batches]
    assert all(np.isfinite(u[2]) for u in updated)
    assert sum(t.adv_attacks_weights) == pytest.approx(1.0, rel=1e-6)


def test_adv_validation_epoch_eer_flag():
    """VERDICT item 8: compute_eer threads into the ADVERSARIAL
    trainer's per-attack validation (reference placeholder:
    trainer.py:417) — nonzero-capable real EER with the flag on,
    placeholder 0 with it off."""
    import flax.linen as nn

    from adaa_tpu.data.loader import DataLoader
    from adaa_tpu.training import train_state as ts
    from adaa_tpu.training.gd_trainer import make_eval_step

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

    loader = DataLoader(DS(32), 8, shuffle=False, num_workers=1)
    state = ts.create_train_state(module, variables, {"lr": 1e-3})
    eval_step = make_eval_step(module.apply)

    def adv_fn(attack_variables, x, y, key):  # trivial perturbation
        return x + 0.01

    t_off = AdversarialGDTrainer(epochs=1, batch_size=8)
    _, _, eer_off = t_off.validation_epoch(
        eval_step, state, loader, adv_fn, variables, jax.random.PRNGKey(1)
    )
    assert eer_off == 0  # reference log surface preserved by default

    t_on = AdversarialGDTrainer(epochs=1, batch_size=8, compute_eer=True)
    loader2 = DataLoader(DS(32), 8, shuffle=False, num_workers=1)
    _, _, eer_on = t_on.validation_epoch(
        eval_step, state, loader2, adv_fn, variables, jax.random.PRNGKey(1)
    )
    assert isinstance(eer_on, float) and 0.0 <= eer_on <= 1.0
    # clean validation path too
    loader3 = DataLoader(DS(32), 8, shuffle=False, num_workers=1)
    _, _, eer_clean = t_on.validation_epoch(
        eval_step, state, loader3, None, None, None
    )
    assert 0.0 <= eer_clean <= 1.0
