"""Adversarial trainers + the five attack-scheduling strategies.

Behavioral equivalents of the reference's AdversarialGDTrainer family
(reference: src/trainer.py:213-581):

* RANDOM   — attack w.p. n/(n+1), uniform attack choice (trainer.py:464-473)
* EQUAL    — always attacks[0] on a random half of the batch (479-497)
* ONLY_ADV — always attack, exactly one attack allowed (500-514)
* ADAPTIVE — loss-EMA weighted attack sampling, 50% uniform smoothing
  (517-557)
* ADAPTIVE_V2 — 1/3 no-attack, 2/3 split redistribution (560-581)

Model selection uses ``multi_f1_score`` = len * prod / sum over
[clean_acc, adv_acc...] (trainer.py:220-224,386-392), with per-epoch
checkpointing (394-400) and one adversarial validation per attack on a
freshly shuffled loader (356-380).

TPU design: each attack is one jitted program ``(attack_variables,
wave, y, key) -> adv_wave`` that takes the surrogate's variables as an
*argument* — so the self-attack case of the reference
(train_models_on_adversarial_attacks.py:106-109, where the attack
model IS the live training model) passes the current step's params
with zero staleness and zero recompilation. Strategy sampling stays on
host with python ``random`` like the reference.
"""
from __future__ import annotations

import functools
import logging
import os
import random
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaa_tpu import attacks as attacks_lib
from adaa_tpu.attacks import core as attack_core
from adaa_tpu.data.loader import DataLoader
from adaa_tpu.training import train_state as ts
from adaa_tpu.utils.keys import host_split
from adaa_tpu.training.gd_trainer import (
    GDTrainer,
    make_eval_step,
    reduce_epoch_stats,
    train_step,
)
from adaa_tpu.utils.checkpoints import save_checkpoint

LOGGER = logging.getLogger(__name__)

AdvFn = Callable[[Dict, jax.Array, jax.Array, jax.Array], jax.Array]


def multi_f1_score(results: List[float]) -> float:
    """len * prod / sum (trainer.py:220-224)."""
    s = sum(results)
    m = functools.reduce(lambda a, b: a * b, results)
    return len(results) * m / s


def make_adv_fn(attack_name: str, attack_module) -> Optional[AdvFn]:
    """One jitted wave-space attack program parameterized by the
    surrogate's variables."""
    builder, params = attacks_lib.ATTACK_REGISTRY[attack_name]
    if builder is None:
        return None

    @jax.jit
    def adv_fn(attack_variables, x_wave, y, key):
        logits_fn = lambda x: attack_module.apply(attack_variables, x, train=False)
        atk = builder(logits_fn, **params)
        x01, mn, mx = attack_core.to_minmax(x_wave)
        adv01 = atk(x01, y, key)
        return attack_core.revert_minmax(adv01, mn, mx)

    return adv_fn


class AdversarialGDTrainer(GDTrainer):
    """RANDOM strategy base (trainer.py:213-476)."""

    @property
    def needs_batch_loss(self) -> bool:
        """True iff the strategy overrides ``update_adv_attack`` (the
        base hook is a no-op): only then is the per-batch loss pulled
        to host — each pull stalls the dispatch pipeline."""
        return (
            type(self).update_adv_attack
            is not AdversarialGDTrainer.update_adv_attack
        )

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.attacks: List[Tuple[str, Optional[AdvFn]]] = []

    # -- strategy hooks ----------------------------------------------------
    def init_adv_attacks(self, attack_module, adversarial_attacks: List[str]):
        self.attacks = [
            (name, make_adv_fn(name, attack_module))
            for name in adversarial_attacks
        ]
        LOGGER.info("Adversarial attacks: %s", adversarial_attacks)
        return self.attacks

    def apply_adv_attack(self, attack_variables, batch_x, batch_y, key):
        """attack with prob n/(n+1), uniform choice (trainer.py:464-473)."""
        if random.random() > 1 / (len(self.attacks) + 1):
            attack_index = random.randint(0, len(self.attacks) - 1)
            _, adv_fn = self.attacks[attack_index]
            if adv_fn is not None:
                batch_x = adv_fn(attack_variables, batch_x, batch_y, key)
        return batch_x

    def update_adv_attack(self, batch_loss, batch_pred=None, iter=None,
                          epoch=None, attack_idx=None):
        ...

    # -- main loop ----------------------------------------------------------
    def train(
        self,
        dataset,
        module,
        variables: Dict[str, Any],
        attack_module,
        attack_variables: Optional[Dict[str, Any]],
        adversarial_attacks: List[str],
        test_dataset=None,
        model_dir: Optional[str] = None,
        save_model_name: Optional[str] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        """``attack_variables=None`` selects self-attack: the surrogate
        sees the live training weights every step
        (train_models_on_adversarial_attacks.py:106-109)."""
        assert test_dataset is not None, "pass an explicit test split"
        key = key if key is not None else jax.random.PRNGKey(0)
        self_attack = attack_variables is None

        train_loader = DataLoader(
            dataset, self.batch_size, shuffle=True, drop_last=True, num_workers=6
        )
        test_loader = DataLoader(
            test_dataset, self.batch_size, shuffle=True, drop_last=True,
            num_workers=6,
        )

        state = ts.create_train_state(
            module,
            variables,
            self.optimizer_kwargs,
            use_scheduler=self.use_scheduler,
            batches_per_epoch=len(train_loader),
            scheduler_t0_epochs=1,  # trainer.py:274 (adv: 1 epoch)
        )
        from adaa_tpu.training.gd_trainer import make_sharding

        shard, replicate = make_sharding(self.batch_size)
        state = replicate(state)
        if attack_variables is not None:
            attack_variables = replicate(attack_variables)
        eval_step = make_eval_step(module.apply)
        self.init_adv_attacks(attack_module, adversarial_attacks)

        best_variables, best_acc = None, 0.0
        LOGGER.info("Starting adversarial training for %d epochs!", self.epochs)

        for epoch in range(self.epochs):
            LOGGER.info("Epoch num: %d", epoch)
            num_total = 0
            acc = replicate(jnp.zeros((2,), jnp.float32))
            # adaptive strategies: (device_loss, attack_idx, iter) queue —
            # the loss scalar is pulled one iteration LATE, so the ~25 ms
            # tunnel sync overlaps with the device executing the next
            # step instead of stalling the dispatch pipeline (the EMA
            # update itself is loss-for-loss identical to the reference's
            # post-step update, trainer.py:544-557; only the sampling of
            # batch i+1 sees weights through batch i-1 instead of i)
            pending: List[Tuple[jax.Array, Optional[int], int]] = []
            # ADAA_EAGER_LOSS_PULL=1 restores the round-4 blocking pull
            # (the profiling A/B for the lagged-pull claim,
            # scripts/profiling/profile_strategies_r5.py)
            lag = 0 if os.environ.get("ADAA_EAGER_LOSS_PULL") == "1" else 1

            for i, batch in enumerate(train_loader):
                batch_x = shard(batch[0])
                batch_y = shard(batch[2])
                bsz = batch_x.shape[0]
                key, ak, dk = host_split(key, 3)

                atk_vars = state.variables() if self_attack else attack_variables
                batch_x = self.apply_adv_attack(atk_vars, batch_x, batch_y, ak)

                state, loss, acc = train_step(state, batch_x, batch_y, dk, acc)
                num_total += bsz

                if i % 100 == 0:
                    ls, nc = np.asarray(acc)  # sync at log points only
                    LOGGER.info(
                        "[%04d][%05d]: %s %s",
                        epoch, i, ls / num_total, nc / num_total * 100,
                    )
                # only the adaptive strategies consume the per-batch loss
                # (loss-EMA sampling weights, trainer.py:544-557); the
                # no-op base skips the sync entirely
                if self.needs_batch_loss:
                    pending.append(
                        (loss, getattr(self, "last_adv_attack", None), i)
                    )
                    if len(pending) > lag:
                        dloss, idx, pi = pending.pop(0)
                        self.update_adv_attack(
                            float(dloss), batch_pred=None, iter=pi,
                            epoch=epoch, attack_idx=idx,
                        )
            for dloss, idx, pi in pending:  # flush the lagged tail
                self.update_adv_attack(
                    float(dloss), batch_pred=None, iter=pi, epoch=epoch,
                    attack_idx=idx,
                )

            loss_sum, num_correct = np.asarray(acc)
            running_loss = loss_sum / max(num_total, 1)
            train_acc = num_correct / max(num_total, 1) * 100
            LOGGER.info(
                "Epoch [%d/%d]: train/loss: %s, train/accuracy: %s",
                epoch + 1, self.epochs, running_loss, train_acc,
            )

            # clean validation
            test_loss, test_acc, eer_val = self.validation_epoch(
                eval_step, state, test_loader, adv_fn=None,
                attack_variables=None, key=None,
            )
            test_acc_results = [test_acc / 100]
            LOGGER.info(
                "Epoch [%d/%d]: test/loss: %s, test/accuracy: %s, test/eer: %s",
                epoch + 1, self.epochs, test_loss, test_acc, eer_val,
            )

            # one adversarial validation per attack, fresh shuffled loader
            for attack_name, adv_fn in self.attacks:
                fresh_loader = DataLoader(
                    test_dataset, self.batch_size, shuffle=True, drop_last=True,
                    num_workers=6,
                )
                key, vk = host_split(key)
                atk_vars = state.variables() if self_attack else attack_variables
                adv_loss, adv_acc, adv_eer = self.validation_epoch(
                    eval_step, state, fresh_loader, adv_fn=adv_fn,
                    attack_variables=atk_vars, key=vk,
                )
                test_acc_results.append(adv_acc / 100)
                LOGGER.info(
                    "Epoch [%d/%d]: adv_test/%s__loss: %s,"
                    " adv_test/%s__accuracy: %s, adv_test/%s__eer: %s.",
                    epoch + 1, self.epochs,
                    attack_name, adv_loss, attack_name, adv_acc,
                    attack_name, adv_eer,
                )

            score = multi_f1_score(test_acc_results)
            LOGGER.info("[%04d]: multi_f1_score: %s", epoch, score)
            if best_variables is None or score > best_acc:
                best_acc = score
                best_variables = jax.tree_util.tree_map(
                    np.asarray, state.variables()
                )
                LOGGER.info("[%04d]: update best model", epoch)

            if model_dir is not None:
                save_checkpoint(
                    jax.tree_util.tree_map(np.asarray, state.variables()),
                    model_dir, save_model_name, epoch=epoch,
                )

        return jax.tree_util.tree_map(jnp.asarray, best_variables)

    def validation_epoch(
        self, eval_step, state, test_loader, adv_fn, attack_variables, key
    ):
        """Clean (adv_fn=None) or per-attack validation pass. With the
        trainer's ``compute_eer`` flag set, the reference's hardcoded
        test/eer placeholder 0 (trainer.py:417 "TODO: revert EER
        support") is replaced by the real EER on flipped labels — most
        useful here, where it gives per-attack adversarial EER; the
        default keeps the reference's log surface."""
        # deferred syncs: device scalars/arrays pulled once after the
        # loop (see GDTrainer._test_epoch)
        num_total = 0
        eer_val = 0  # matches reference placeholder (trainer.py:417)
        bszs, losses, corrects = [], [], []
        outs, labels = [], []
        variables = state.variables()
        for batch in test_loader:
            batch_x = jnp.asarray(batch[0])
            batch_y = jnp.asarray(batch[2])
            bsz = batch_x.shape[0]
            if adv_fn is not None:
                key, ak = host_split(key)
                batch_x = adv_fn(attack_variables, batch_x, batch_y, ak)
            loss, correct, out = eval_step(variables, batch_x, batch_y)
            num_total += bsz
            bszs.append(bsz)
            losses.append(loss)
            corrects.append(correct)
            if self.compute_eer:
                outs.append(out)
                labels.append(np.asarray(batch[2]))
        test_loss, num_correct, scores = reduce_epoch_stats(
            bszs, losses, corrects, outs
        )
        num_total = max(num_total, 1)
        if self.compute_eer and scores:
            from adaa_tpu.metrics import calculate_eer

            y = np.concatenate(labels)
            try:
                _, eer_val, _, _ = calculate_eer(1 - y, np.concatenate(scores))
            except (ValueError, ZeroDivisionError):
                eer_val = float("nan")
        return test_loss / num_total, 100.0 * num_correct / num_total, eer_val


class EqualAdversarialGDTrainer(AdversarialGDTrainer):
    """attacks[0] on a random half of the batch (trainer.py:479-497)."""

    def apply_adv_attack(self, attack_variables, batch_x, batch_y, key):
        _, adv_fn = self.attacks[0]
        if adv_fn is None:
            return batch_x
        n = batch_x.shape[0]
        indices = random.sample(range(n), n // 2)
        idx = jnp.asarray(np.asarray(indices, np.int32))
        attacked = adv_fn(
            attack_variables, batch_x[idx], batch_y[idx], key
        )
        return batch_x.at[idx].set(attacked)


class OnlyOneAdversarialGDTrainer(AdversarialGDTrainer):
    """always the single configured attack (trainer.py:500-514)."""

    def init_adv_attacks(self, attack_module, adversarial_attacks):
        assert len(adversarial_attacks) == 1, \
            "Method allows to apply only one attack"
        return super().init_adv_attacks(attack_module, adversarial_attacks)

    def apply_adv_attack(self, attack_variables, batch_x, batch_y, key):
        _, adv_fn = self.attacks[0]
        if adv_fn is None:
            return batch_x
        return adv_fn(attack_variables, batch_x, batch_y, key)


class AdaptiveAdversarialGDTrainer(AdversarialGDTrainer):
    """loss-EMA weighted sampling over n attacks + no-attack arm
    (trainer.py:517-557)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.adv_attacks_weights: List[float] = []
        self.last_adv_attack: Optional[int] = None

    def init_adv_attacks(self, attack_module, adversarial_attacks):
        out = super().init_adv_attacks(attack_module, adversarial_attacks)
        n = len(self.attacks) + 1
        self.adv_attacks_weights = [1.0 / n] * n
        return out

    def apply_adv_attack(self, attack_variables, batch_x, batch_y, key):
        (attack_idx,) = random.choices(
            range(len(self.attacks) + 1), weights=self.adv_attacks_weights, k=1
        )
        self.last_adv_attack = attack_idx
        if attack_idx < len(self.attacks):
            _, adv_fn = self.attacks[attack_idx]
            if adv_fn is not None:
                batch_x = adv_fn(attack_variables, batch_x, batch_y, key)
        return batch_x

    def update_adv_attack(
        self, batch_loss, batch_pred=None, max_val=1, proportion_val=0.2,
        iter=None, epoch=None, attack_idx=None,
    ):
        idx = attack_idx if attack_idx is not None else self.last_adv_attack
        loss = min(batch_loss, max_val)
        w = self.adv_attacks_weights
        w[idx] = proportion_val * loss + (1 - proportion_val) * w[idx]
        total = float(np.sum(w))
        self.adv_attacks_weights = [
            0.5 * (wi / total) + 0.5 * (1.0 / len(w)) for wi in w
        ]
        if iter is not None and iter % 100 == 0:
            LOGGER.info(
                "[%04d][%05d]: Adversarial attack weights: %s",
                epoch, iter, self.adv_attacks_weights,
            )


class AdaptiveV2AdversarialGDTrainer(AdaptiveAdversarialGDTrainer):
    """1/3 no-attack, 2/3 attack-split redistribution (trainer.py:560-581)."""

    def update_adv_attack(
        self, batch_loss, batch_pred=None, max_val=1, proportion_val=0.2,
        iter=None, epoch=None, attack_idx=None,
    ):
        idx = attack_idx if attack_idx is not None else self.last_adv_attack
        loss = min(batch_loss, max_val)
        w = self.adv_attacks_weights
        w[idx] = proportion_val * loss + (1 - proportion_val) * w[idx]
        total = float(np.sum(w))
        w = [0.5 * (wi / total) for wi in w]

        non_attack_ratio = 1 / 3
        attack_ratio = (2 / 3) / len(self.attacks)
        self.adv_attacks_weights = [
            wi + 0.5 * attack_ratio
            if i < len(w) - 1
            else wi + 0.5 * non_attack_ratio
            for i, wi in enumerate(w)
        ]
        if iter is not None and iter % 100 == 0:
            LOGGER.info(
                "[%04d][%05d]: Adversarial attack weights: %s",
                epoch, iter, self.adv_attacks_weights,
            )


# mirrors AdversarialGDTrainerEnum (src/aa/aa_trainer_types.py:12-17)
ADV_TRAINER_REGISTRY: Dict[str, type] = {
    "ONLY_ADV": OnlyOneAdversarialGDTrainer,
    "RANDOM": AdversarialGDTrainer,
    "ADAPTIVE": AdaptiveAdversarialGDTrainer,
    "ADAPTIVE_V2": AdaptiveV2AdversarialGDTrainer,
    "EQUAL": EqualAdversarialGDTrainer,
}
