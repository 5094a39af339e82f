"""Auto-PGD (APGD) and targeted Auto-PGD (APGDT).

APGDT carries the reference's single-logit adaptation (reference:
adversarial_attacks/torchattacks/attacks/apgdt.py:104,112,166,222 —
the cat([-z, z]) wrapper is present though undocumented in its
README); APGD (apgd.py) is stock upstream. Both are provided here
audio-adapted.

2-class closed forms:
* targeted DLR (apgdt.py:75-78) with target = second-highest class:
  loss = -(f_y - f_other) / (f_max + 1e-12) = -(2y-1)*2z / (|z|+1e-12)
* untargeted CE: the standard widened CE; untargeted DLR needs >= 3
  classes (apgd.py:75-80 indexes sorted[-3]) and is rejected, matching
  where the stock code would fail.

The torch implementation's host-side bookkeeping — momentum with
a=0.75, per-sample best tracking, oscillation-triggered step-size
halving on a shrinking checkpoint schedule (apgdt.py:64-69,185-210) —
runs as one ``lax.fori_loop`` with a (steps, B) loss-history buffer;
checkpoint positions are static python ints so the oscillation check
unrolls with fixed trip counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core


def _apgd_engine(
    logits_fn: core.LogitsFn,
    loss_indiv_fn,  # (z(B,), y(B,)) -> per-sample loss to MAXIMIZE
    norm: str,
    eps: float,
    steps: int,
    rho: float,
):
    steps_2 = max(int(0.22 * steps), 1)
    steps_min = max(int(0.06 * steps), 1)
    size_decr = max(int(0.03 * steps), 1)

    # static checkpoint schedule (counter3/k bookkeeping of the torch code)
    checkpoints = []  # list of (step index i, window k at that point)
    k = steps_2
    counter3 = 0
    for i in range(steps):
        counter3 += 1
        if counter3 == k:
            checkpoints.append((i, k))
            counter3 = 0
            k = max(k - size_decr, steps_min)
    checkpoint_set = {i: kk for i, kk in checkpoints}

    def loss_and_grad(x_adv, y):
        def f(xx):
            z = logits_fn(xx).squeeze(-1)
            li = loss_indiv_fn(z, y)
            return li.sum(), (li, z)

        (_, (li, z)), g = jax.value_and_grad(f, has_aux=True)(x_adv)
        return li, z, g

    def run(x, y, key):
        b = x.shape[0]
        shape1 = (b,) + (1,) * (x.ndim - 1)

        if norm == "Linf":
            t = 2.0 * jax.random.uniform(key, x.shape, x.dtype) - 1.0
            denom = jnp.abs(t.reshape(b, -1)).max(axis=1).reshape(shape1)
            x_adv = x + eps * t / denom
        else:  # L2
            t = jax.random.normal(key, x.shape, x.dtype)
            denom = core.flat_norms(t, "l2").reshape(shape1) + 1e-12
            x_adv = x + eps * t / denom
        x_adv = jnp.clip(x_adv, 0.0, 1.0)

        li, z, grad = loss_and_grad(x_adv, y)
        pred_ok = ((z > 0).astype(jnp.int32)) == y

        state = dict(
            x_adv=x_adv,
            x_adv_old=x_adv,
            x_best=x_adv,
            x_best_adv=x_adv,
            grad=grad,
            grad_best=grad,
            loss_best=li,
            loss_best_last_check=li,
            reduced_last_check=jnp.ones((b,), bool),
            acc=pred_ok,
            step_size=jnp.full(shape1, 2.0 * eps, x.dtype),
            loss_steps=jnp.zeros((steps, b), x.dtype),
        )

        def project(v):
            if norm == "Linf":
                return jnp.clip(
                    jnp.clip(v, x - eps, x + eps), 0.0, 1.0
                )
            d = v - x
            dn = core.flat_norms(d, "l2").reshape(shape1)
            factor = jnp.minimum(eps, dn) / (dn + 1e-12)
            return jnp.clip(x + d * factor, 0.0, 1.0)

        def body(i, s):
            a = jnp.where(i > 0, 0.75, 1.0)
            grad2 = s["x_adv"] - s["x_adv_old"]
            x_adv_old = s["x_adv"]

            if norm == "Linf":
                x1 = s["x_adv"] + s["step_size"] * jnp.sign(s["grad"])
                x1 = project(x1)
                x1 = project(s["x_adv"] + (x1 - s["x_adv"]) * a + grad2 * (1 - a))
            else:
                gn = core.flat_norms(s["grad"], "l2").reshape(
                    (s["grad"].shape[0],) + (1,) * (x.ndim - 1)
                )
                x1 = s["x_adv"] + s["step_size"] * s["grad"] / (gn + 1e-12)
                x1 = project(x1)
                x1 = s["x_adv"] + (x1 - s["x_adv"]) * a + grad2 * (1 - a)
                x1 = project(x1)
            x_adv = x1

            li, z, grad = loss_and_grad(x_adv, y)
            pred_ok = ((z > 0).astype(jnp.int32)) == y
            acc = jnp.logical_and(s["acc"], pred_ok)
            fooled = jnp.logical_not(pred_ok).reshape(shape1)
            x_best_adv = jnp.where(fooled, x_adv, s["x_best_adv"])

            improved = li > s["loss_best"]
            imp_b = improved.reshape(shape1)
            x_best = jnp.where(imp_b, x_adv, s["x_best"])
            grad_best = jnp.where(imp_b, grad, s["grad_best"])
            loss_best = jnp.where(improved, li, s["loss_best"])
            loss_steps = s["loss_steps"].at[i].set(li)

            return dict(
                x_adv=x_adv, x_adv_old=x_adv_old, x_best=x_best,
                x_best_adv=x_best_adv, grad=grad, grad_best=grad_best,
                loss_best=loss_best,
                loss_best_last_check=s["loss_best_last_check"],
                reduced_last_check=s["reduced_last_check"],
                acc=acc, step_size=s["step_size"], loss_steps=loss_steps,
            )

        # unrolled main loop: checkpoint positions are static python ints
        for i in range(steps):
            state = body(i, state)
            if i in checkpoint_set:
                kk = checkpoint_set[i]
                # check_oscillation (apgdt.py:64-69, called with
                # k3 = thr_decr = rho): count loss increases over the
                # last kk steps; oscillating when t <= kk * rho
                t = jnp.zeros((b,), x.dtype)
                for c5 in range(kk):
                    prev = state["loss_steps"][i - c5 - 1] if i - c5 - 1 >= 0 \
                        else jnp.full((b,), -jnp.inf, x.dtype)
                    t = t + (
                        state["loss_steps"][i - c5] > prev
                    ).astype(x.dtype)
                fl_oscillation = t <= kk * rho
                fl_reduce_no_impr = jnp.logical_and(
                    jnp.logical_not(state["reduced_last_check"]),
                    state["loss_best_last_check"] >= state["loss_best"],
                )
                fl_oscillation = jnp.logical_or(fl_oscillation, fl_reduce_no_impr)
                state["reduced_last_check"] = fl_oscillation
                state["loss_best_last_check"] = state["loss_best"]

                osc_b = fl_oscillation.reshape(shape1)
                state["step_size"] = jnp.where(
                    osc_b, state["step_size"] / 2.0, state["step_size"]
                )
                state["x_adv"] = jnp.where(osc_b, state["x_best"], state["x_adv"])
                state["grad"] = jnp.where(osc_b, state["grad_best"], state["grad"])

        return state["x_best"], state["acc"], state["loss_best"], state["x_best_adv"]

    return run


def apgd(
    logits_fn: core.LogitsFn,
    norm: str = "Linf",
    eps: float = 8 / 255,
    steps: int = 100,
    n_restarts: int = 1,
    seed: int = 0,
    loss: str = "ce",
    eot_iter: int = 1,
    rho: float = 0.75,
    verbose: bool = False,
) -> core.AttackFn:
    """Untargeted Auto-PGD (apgd.py:41-264), CE loss (maximized)."""
    del seed, eot_iter, verbose
    if loss == "dlr":
        raise ValueError(
            "untargeted DLR needs >= 3 classes (apgd.py:75-80 indexes "
            "sorted[-3]) — audio detectors are 2-class"
        )

    def ce_indiv(z, y):
        sign = 2.0 * y.astype(z.dtype) - 1.0
        return jax.nn.softplus(-2.0 * sign * z)  # per-sample CE

    engine = _apgd_engine(logits_fn, ce_indiv, norm, eps, steps, rho)

    def attack(x, y, key):
        b = x.shape[0]
        shape1 = (b,) + (1,) * (x.ndim - 1)
        adv = x
        acc = core.predicted_label(logits_fn(x)) == y
        keys = jax.random.split(key, n_restarts)
        for r in range(n_restarts):
            _, acc_curr, _, adv_curr = engine(x, y, keys[r])
            newly = acc & ~acc_curr
            adv = jnp.where(newly.reshape(shape1), adv_curr, adv)
            acc = acc & acc_curr
        return adv

    return attack


def apgdt(
    logits_fn: core.LogitsFn,
    norm: str = "Linf",
    eps: float = 8 / 255,
    steps: int = 100,
    n_restarts: int = 1,
    seed: int = 0,
    eot_iter: int = 1,
    rho: float = 0.75,
    n_classes: int = 2,
    verbose: bool = False,
) -> core.AttackFn:
    """Targeted Auto-PGD (apgdt.py:41-260). 2-class: the only target is
    the other class; targeted DLR collapses to
    -(2y-1)*2z / (|z| + 1e-12)."""
    del seed, eot_iter, verbose
    assert n_classes == 2

    def dlr_t_indiv(z, y):
        sign = 2.0 * y.astype(z.dtype) - 1.0
        return -(sign * 2.0 * z) / (jnp.abs(z) + 1e-12)

    engine = _apgd_engine(logits_fn, dlr_t_indiv, norm, eps, steps, rho)

    def attack(x, y, key):
        b = x.shape[0]
        shape1 = (b,) + (1,) * (x.ndim - 1)
        adv = x
        acc = core.predicted_label(logits_fn(x)) == y
        keys = jax.random.split(key, n_restarts)
        for r in range(n_restarts):
            _, acc_curr, _, adv_curr = engine(x, y, keys[r])
            newly = acc & ~acc_curr
            adv = jnp.where(newly.reshape(shape1), adv_curr, adv)
            acc = acc & acc_curr
        return adv

    return attack
