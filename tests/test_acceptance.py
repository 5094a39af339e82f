"""The five BASELINE.json acceptance configs, on synthetic data.

1. LCNN + LFCC clean eval
2. SpecRNet + frontend, 1-epoch train + eval
3. RawNet3 raw-waveform eval (no frontend — 1D conv/GRU path)
4. White-box FGSM + PGD at REGISTRY params on a trained model —
   asserting the attacks actually reduce accuracy (reference
   semantics: evaluate_models_on_adversarial_attacks.py:211-298)
5. Transfer CW/FAB RawNet3 -> LCNN (norm-contract assertions) +
   adversarial finetune that must IMPROVE adversarial accuracy

Real-data EER parity requires the actual corpora (not present in this
image); these verify the full code paths end-to-end with behavioral
assertions. The attack/finetune tests train on ``class_sep=0.15``
synthetic data (adaa_tpu/data/synthetic.py): the default corpus is so
separable that a 3-epoch model's margins exceed any registry eps
(<=0.001 in minmax space) and nothing would flip.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu import models
from adaa_tpu.data.synthetic import SyntheticDataset
from adaa_tpu.eval.adv_evaluation import generate_attacks
from adaa_tpu.eval.evaluation import evaluate_nn
from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY
from adaa_tpu.training.gd_trainer import GDTrainer

WAVE_LEN = 16_000
SEP = 0.15  # small-margin synthetic variant for the attack tests

pytestmark = pytest.mark.slow


def _model(name, params, key=0):
    module = models.get_model(name, params)
    variables = models.init_model(
        module, jax.random.PRNGKey(key), wave_length=WAVE_LEN
    )
    return module, variables


def _ds(n, subset, **kw):
    return SyntheticDataset(n=n, subset=subset, wave_length=WAVE_LEN, **kw)


@pytest.fixture(scope="module")
def trained_lcnn():
    """LCNN trained 3 epochs on the small-margin synthetic corpus."""
    np.random.seed(4242)  # pins the loader's shuffle order (the train
    # outcome guard below is order-sensitive at 3 epochs x 64 samples)
    module, variables = _model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    best = GDTrainer(
        epochs=3, batch_size=8,
        optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4},
    ).train(
        _ds(64, "train", class_sep=SEP), module, variables,
        test_dataset=_ds(32, "test", class_sep=SEP),
    )
    return module, best


def test_acceptance_1_lcnn_lfcc_clean_eval():
    module, variables = _model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    report = evaluate_nn(module, variables, _ds(32, "val"), batch_size=16)
    assert np.isfinite(report["accuracy"])


def test_acceptance_2_specrnet_train_and_eval():
    module, variables = _model(
        "specrnet", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}, key=1
    )
    best = GDTrainer(epochs=1, batch_size=8,
                     optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4}
                     ).train(_ds(32, "train"), module, variables,
                             test_dataset=_ds(16, "test"))
    report = evaluate_nn(module, best, _ds(32, "val"), batch_size=16)
    assert np.isfinite(report["accuracy"])


def test_acceptance_3_rawnet3_raw_eval():
    module, variables = _model("rawnet3", {}, key=2)
    report = evaluate_nn(module, variables, _ds(16, "val"), batch_size=8)
    assert np.isfinite(report["accuracy"])


def test_acceptance_4_whitebox_registry_attacks_reduce_accuracy(trained_lcnn):
    """Registry-exact FGSM/PGD must degrade a trained model's accuracy
    (the reference's white-box setting,
    evaluate_models_on_adversarial_attacks.py:211-264)."""
    module, best = trained_lcnn
    val = _ds(32, "val", class_sep=SEP, return_meta=True)
    clean = evaluate_nn(module, best, val, batch_size=16)
    assert clean["accuracy"] >= 90.0  # "trained enough" guard

    for attack in ("FGSM_eps001", "PGD_eps001"):
        report = generate_attacks(
            victim_module=module, victim_variables=best,
            dataset=val, attack_name=attack,
            attack_module=module, attack_variables=best,
            batch_size=16,
        )
        assert report["accuracy"] < clean["accuracy"], (
            attack, report["accuracy"], clean["accuracy"])


def test_acceptance_5a_transfer_attacks_respect_norm_contracts():
    """Transfer RawNet3 -> LCNN: adversarial audio must be a real,
    norm-contract-respecting perturbation, not just finite.

    Registry eps values are exact. Step counts for CW/FAB are reduced
    for suite time — legitimately: CW is not in the reference's
    AttackEnum at all (README.md:137) so it has no registry step count,
    and FAB's box/projection contract is enforced every step, so the
    contract being asserted is step-count-invariant.
    """
    victim_m, victim_v = _model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    surr_m, surr_v = _model("rawnet3", {}, key=3)
    ds = _ds(8, "val", return_meta=True)

    from adaa_tpu import attacks as attacks_lib
    from adaa_tpu.attacks import core as attack_core

    x = jnp.asarray(np.stack([ds[i][0] for i in range(8)]))
    y = jnp.asarray([ds[i][2] for i in range(8)])
    x01, mn, mx = attack_core.to_minmax(x)

    cases = (
        ("PGD_eps001", {}, ("linf", 0.001)),
        ("PGDL2", {}, ("l2", 0.1)),
        ("FAB", {"steps": 10}, ("minimal", None)),
        ("CW", {"steps": 10}, ("minimal", None)),
    )
    logits_fn = attack_core.make_logits_fn(surr_m, surr_v)
    z_clean = np.asarray(logits_fn(x01))[:, 0]
    for attack, overrides, (kind, budget) in cases:
        atk = attacks_lib.build_attack(attack, logits_fn, overrides)
        adv01 = atk(x01, y, jax.random.PRNGKey(0))
        d = np.asarray(adv01 - x01)
        assert np.all(np.isfinite(np.asarray(adv01))), attack
        if kind == "linf":
            # eps-ball attacks always perturb (random start + signed steps)
            assert np.abs(d).max() > 1e-6, attack
            assert np.abs(d).max() <= budget + 1e-6, attack
        elif kind == "l2":
            assert np.abs(d).max() > 1e-6, attack
            l2 = np.sqrt((d.reshape(8, -1) ** 2).sum(axis=1))
            assert l2.max() <= budget + 1e-5, attack
        else:
            # minimal-norm families (FAB/CW) return x verbatim for rows
            # where no adversarial was found (or where the surrogate's
            # boundary is within float epsilon — an untrained surrogate
            # has near-zero margins); any row they DID move must truly
            # be adversarial on the surrogate
            moved = np.abs(d).max(axis=1) > 0
            if moved.any():
                z_adv = np.asarray(logits_fn(adv01))[:, 0]
                if attack.startswith("FAB"):  # flips the clean prediction
                    flipped = (z_adv > 0) != (z_clean > 0)
                else:  # CW: misclassifies w.r.t. the label
                    flipped = (z_adv > 0) != (np.asarray(y) == 1)
                assert flipped[moved].all(), (attack, z_clean, z_adv)
        # all families operate in the [0,1] minmax box
        adv = np.asarray(adv01)
        assert adv.min() >= -1e-6 and adv.max() <= 1 + 1e-6, attack

        # and the victim must consume the transferred audio
        out = victim_m.apply(
            victim_v, attack_core.revert_minmax(adv01, mn, mx), train=False)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_acceptance_5b_adversarial_finetune_improves_robustness(trained_lcnn):
    """ONLY_ADV finetuning against PGD_eps001 (registry params) must
    improve adversarial accuracy over the un-finetuned model
    (the reference's adversarial-training goal, src/trainer.py:213-403)."""
    module, best = trained_lcnn
    val = _ds(32, "val", class_sep=SEP, return_meta=True)

    def adv_acc(variables):
        return generate_attacks(
            victim_module=module, victim_variables=variables,
            dataset=val, attack_name="PGD_eps001",
            attack_module=module, attack_variables=variables,
            batch_size=16,
        )["accuracy"]

    pre = adv_acc(best)
    trainer = ADV_TRAINER_REGISTRY["ONLY_ADV"](
        epochs=2, batch_size=8, optimizer_kwargs={"lr": 1e-4}
    )
    finetuned = trainer.train(
        dataset=_ds(64, "train", class_sep=SEP),
        module=module, variables=best,
        attack_module=module, attack_variables=None,  # self-attack
        adversarial_attacks=["PGD_eps001"],
        test_dataset=_ds(32, "test", class_sep=SEP),
    )
    post = adv_acc(finetuned)
    assert post > pre, (pre, post)
