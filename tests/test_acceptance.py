"""The five BASELINE.json acceptance configs, on synthetic data.

1. LCNN + LFCC clean eval
2. SpecRNet + frontend, 1-epoch train + eval
3. RawNet3 raw-waveform eval (no frontend — 1D conv/GRU path)
4. White-box FGSM + PGD-10 on LCNN
5. Transfer CW/FAB RawNet3 -> LCNN + adversarial finetune

Real-data EER parity requires the actual corpora (not present in this
image); these verify the full code paths end-to-end.
"""
import numpy as np
import pytest

import jax

from adaa_tpu import models
from adaa_tpu.data.synthetic import SyntheticDataset
from adaa_tpu.eval.adv_evaluation import generate_attacks
from adaa_tpu.eval.evaluation import evaluate_nn
from adaa_tpu.training.adv_trainer import ADV_TRAINER_REGISTRY
from adaa_tpu.training.gd_trainer import GDTrainer

WAVE_LEN = 16_000

pytestmark = pytest.mark.slow


def _model(name, params, key=0):
    module = models.get_model(name, params)
    variables = models.init_model(
        module, jax.random.PRNGKey(key), wave_length=WAVE_LEN
    )
    return module, variables


def test_acceptance_1_lcnn_lfcc_clean_eval():
    module, variables = _model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    ds = SyntheticDataset(n=32, subset="val", wave_length=WAVE_LEN)
    report = evaluate_nn(module, variables, ds, batch_size=16)
    assert np.isfinite(report["accuracy"])


def test_acceptance_2_specrnet_train_and_eval():
    module, variables = _model(
        "specrnet", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}, key=1
    )
    train = SyntheticDataset(n=32, subset="train", wave_length=WAVE_LEN)
    test = SyntheticDataset(n=16, subset="test", wave_length=WAVE_LEN)
    best = GDTrainer(epochs=1, batch_size=8,
                     optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4}
                     ).train(train, module, variables, test_dataset=test)
    val = SyntheticDataset(n=32, subset="val", wave_length=WAVE_LEN)
    report = evaluate_nn(module, best, val, batch_size=16)
    assert np.isfinite(report["accuracy"])


def test_acceptance_3_rawnet3_raw_eval():
    module, variables = _model("rawnet3", {}, key=2)
    ds = SyntheticDataset(n=16, subset="val", wave_length=WAVE_LEN)
    report = evaluate_nn(module, variables, ds, batch_size=8)
    assert np.isfinite(report["accuracy"])


def test_acceptance_4_whitebox_fgsm_pgd_on_lcnn():
    module, variables = _model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    ds = SyntheticDataset(n=16, subset="val", wave_length=WAVE_LEN,
                          return_meta=True)
    for attack in ("FGSM", "PGD"):
        report = generate_attacks(
            victim_module=module, victim_variables=variables,
            dataset=ds, attack_name=attack,
            attack_module=module, attack_variables=variables,
            batch_size=8,
        )
        assert np.isfinite(report["accuracy"])


def test_acceptance_5_transfer_attacks_and_adv_finetune():
    # transfer: RawNet3 surrogate -> LCNN victim, CW + FAB
    victim_m, victim_v = _model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    surr_m, surr_v = _model("rawnet3", {}, key=3)
    ds = SyntheticDataset(n=8, subset="val", wave_length=WAVE_LEN,
                          return_meta=True)
    for attack, params in (("CW", {"steps": 5}), ("FAB", {})):
        from adaa_tpu import attacks as attacks_lib
        from adaa_tpu.attacks import core as attack_core
        import jax.numpy as jnp

        logits_fn = attack_core.make_logits_fn(surr_m, surr_v)
        atk = attacks_lib.build_attack(attack, logits_fn, params)
        x = jnp.asarray(np.stack([ds[i][0] for i in range(8)]))
        y = jnp.asarray([ds[i][2] for i in range(8)])
        x01, mn, mx = attack_core.to_minmax(x)
        adv = attack_core.revert_minmax(
            atk(x01, y, jax.random.PRNGKey(0)), mn, mx
        )
        out = victim_m.apply(victim_v, adv, train=False)
        assert bool(jnp.all(jnp.isfinite(out)))

    # adversarial finetune of LCNN against the pretrained surrogate
    train = SyntheticDataset(n=16, subset="train", wave_length=WAVE_LEN)
    test = SyntheticDataset(n=8, subset="test", wave_length=WAVE_LEN)
    trainer = ADV_TRAINER_REGISTRY["RANDOM"](
        epochs=1, batch_size=8, optimizer_kwargs={"lr": 1e-4}
    )
    best = trainer.train(
        dataset=train, module=victim_m, variables=victim_v,
        attack_module=victim_m, attack_variables=None,  # self-attack
        adversarial_attacks=["FGSM", "PGDL2"],
        test_dataset=test,
    )
    assert "params" in best
