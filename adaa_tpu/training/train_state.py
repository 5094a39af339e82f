"""Train state + optimizer construction (torch-equivalent numerics).

The reference uses torch Adam with per-model configs
(configs/training/*.yaml, reference trainer.py:108) and a
CosineAnnealingWarmRestarts schedule for RawNet3 only
(train_models.py:89, trainer.py:117-125: T_0 = 2 epochs of batches,
T_mult 1, eta_min 5e-6). optax.adam matches torch defaults
(b1 .9, b2 .999, eps 1e-8); weight decay uses torch Adam's L2-into-
gradient semantics (optax.add_decayed_weights before the Adam
transform), matching ``torch.optim.Adam(weight_decay=...)`` rather
than AdamW.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def cosine_annealing_warm_restarts(
    base_lr: float, t_0: int, eta_min: float = 5e-6
) -> optax.Schedule:
    """torch CosineAnnealingWarmRestarts with T_mult=1:
    lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * (t % T_0) / T_0)) / 2.
    """

    def schedule(count):
        t_cur = jnp.mod(count, t_0).astype(jnp.float32)
        cos = jnp.cos(jnp.pi * t_cur / t_0)
        return eta_min + (base_lr - eta_min) * (1.0 + cos) / 2.0

    return schedule


def make_optimizer(
    optimizer_kwargs: Dict[str, Any],
    use_scheduler: bool = False,
    batches_per_epoch: Optional[int] = None,
    scheduler_t0_epochs: int = 2,
) -> optax.GradientTransformation:
    """torch.optim.Adam(+ optional warm-restart schedule) equivalent."""
    lr = optimizer_kwargs.get("lr", 1e-3)
    weight_decay = optimizer_kwargs.get("weight_decay", 0.0)
    eta_min = optimizer_kwargs.get("eta_min", 5e-6)

    if use_scheduler:
        assert batches_per_epoch is not None
        lr = cosine_annealing_warm_restarts(
            lr, t_0=batches_per_epoch * scheduler_t0_epochs, eta_min=eta_min
        )

    chain = []
    if weight_decay:
        # torch Adam folds wd into the gradient BEFORE the moment updates
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    )
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)


def create_train_state(
    module,
    variables: Dict[str, Any],
    optimizer_kwargs: Dict[str, Any],
    use_scheduler: bool = False,
    batches_per_epoch: Optional[int] = None,
    scheduler_t0_epochs: int = 2,
) -> TrainState:
    tx = make_optimizer(
        optimizer_kwargs, use_scheduler, batches_per_epoch, scheduler_t0_epochs
    )
    params = variables["params"]
    return TrainState(
        step=jnp.array(0, jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=module.apply,
    )
