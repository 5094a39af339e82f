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
runs as ONE ``lax.scan`` whose per-step inputs carry the (static)
checkpoint flag and window size; the oscillation check reads a dynamic
window of a carried loss-increase buffer and its effects are gated by
the flag, so the compiled program holds a single fwd+bwd body instead
of ``steps`` inlined copies.
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
            # incr[i] = loss_steps[i] > loss_steps[i-1] (i=0: > -inf),
            # maintained incrementally so the oscillation check needs
            # only a dynamic window over this buffer
            incr=jnp.zeros((steps, b), x.dtype),
            prev_li=jnp.full((b,), -jnp.inf, x.dtype),
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

        # ONE lax.scan over all steps (one compiled fwd+bwd body instead
        # of `steps` inlined copies — APGDT-20 cold compile was 199 s
        # unrolled). Checkpoint positions are static, so they ride in as
        # per-step scan inputs (flag + window size); the oscillation
        # check runs every step on a dynamic window of the carried
        # `incr` buffer and is APPLIED only where the flag is set —
        # bit-identical to checking at the checkpoints alone.
        maxk = steps_2  # largest window (k only ever shrinks)
        is_ckpt = jnp.asarray(
            [i in checkpoint_set for i in range(steps)])
        kk_arr = jnp.asarray(
            [checkpoint_set.get(i, 1) for i in range(steps)], jnp.int32)
        rows = jnp.arange(maxk, dtype=jnp.int32)

        def body(s, inp):
            i, ckpt, kk = inp
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
            incr = jax.lax.dynamic_update_slice(
                s["incr"], (li > s["prev_li"]).astype(x.dtype)[None], (i, 0)
            )

            # check_oscillation (apgdt.py:64-69, k3 = thr_decr = rho):
            # count loss increases over the last kk steps. The window
            # [i-maxk+1, i] is in-range at every checkpoint (the first
            # sits at i = maxk-1); keep its last kk rows.
            win = jax.lax.dynamic_slice(incr, (i - (maxk - 1), 0), (maxk, b))
            t = jnp.sum(
                win * (rows >= maxk - kk).astype(x.dtype)[:, None], axis=0
            )
            fl_oscillation = t <= kk.astype(x.dtype) * rho
            fl_reduce_no_impr = jnp.logical_and(
                jnp.logical_not(s["reduced_last_check"]),
                s["loss_best_last_check"] >= loss_best,
            )
            fl_oscillation = jnp.logical_or(fl_oscillation, fl_reduce_no_impr)
            reduced_last_check = jnp.where(
                ckpt, fl_oscillation, s["reduced_last_check"])
            loss_best_last_check = jnp.where(
                ckpt, loss_best, s["loss_best_last_check"])
            osc_b = (fl_oscillation & ckpt).reshape(shape1)
            step_size = jnp.where(osc_b, s["step_size"] / 2.0, s["step_size"])
            x_adv = jnp.where(osc_b, x_best, x_adv)
            grad = jnp.where(osc_b, grad_best, grad)

            return dict(
                x_adv=x_adv, x_adv_old=x_adv_old, x_best=x_best,
                x_best_adv=x_best_adv, grad=grad, grad_best=grad_best,
                loss_best=loss_best,
                loss_best_last_check=loss_best_last_check,
                reduced_last_check=reduced_last_check,
                acc=acc, step_size=step_size, incr=incr, prev_li=li,
            ), None

        state, _ = jax.lax.scan(
            body, state,
            (jnp.arange(steps, dtype=jnp.int32), is_ckpt, kk_arr),
        )

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
