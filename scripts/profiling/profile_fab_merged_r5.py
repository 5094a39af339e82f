#!/usr/bin/env python
"""Quantify the merged-FAB variant (VERDICT r4 weak item 3).

Round 4 claimed FAB's per-step fwd+bwd+predict triple "can't merge
without changing the reference's evaluation points" but never measured
what the merged form would yield. This does.

The reference loop per iteration (fab.py:269-291 upstream; our
attacks/fab.py single_run): grad at x1 -> projection update -> predict
at the NEW x1 -> bookkeeping + beta-pullback for adversarial rows.
The predict point and the NEXT iteration's gradient point coincide
whenever the pullback doesn't fire — so the merged variant moves the
bookkeeping to the TOP of the step and derives is_adv from the very
logit z_and_grad just computed (bit-identical to what predict returned
for those rows), then applies the pullback BEFORE the update. The one
semantic change: on iterations where a row just turned adversarial,
the gradient/linearization was taken at the pre-pullback point
(reference re-evaluates after pulling back). One extra final predict
resolves the last candidate. Cost: 1 fwd+bwd per step vs
fwd+bwd+fwd — ~1.4x fewer model passes.

Measures both forms at the registry config (eta=10, steps=100,
batch 256, bf16 LCNN with a spread-logit head so boundaries are real)
and reports throughput plus output agreement (success rates, median
perturbation-norm ratio on commonly-successful rows).

Writes profile_fab_merged_r5.json. The merged form ships opt-in as
ADAA_FAB_MERGED=1 iff this experiment shows it worthwhile; default
stays reference-exact.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parents[2] / ".jax_cache")
)

from adaa_tpu import models
from adaa_tpu.attacks import core
from adaa_tpu.attacks.fab import fab
from adaa_tpu.attacks.fab_projections import projection_linf_bisect_pair

BATCH = 256
WAVE = 64_600
STEPS = 100
ETA = 10.0  # registry "FAB" eta (attacks/__init__.py) — must match base
ALPHA_MAX = 0.1
BETA = 0.9
EPS = 0.3  # _DEFAULT_EPS["Linf"] in attacks/fab.py


def fab_merged(logits_fn):
    """Merged-step FAB (Linf, 2-class, single run) — see module doc."""

    def z_and_grad(x):
        def zsum(xx):
            z = logits_fn(xx).squeeze(-1)
            return z.sum(), z

        (_, z), g = jax.value_and_grad(zsum, has_aux=True)(x)
        return z, g

    def predict(x):
        return (logits_fn(x).squeeze(-1) > 0).astype(jnp.int32)

    def attack(x, y, key):
        del key
        b = x.shape[0]
        shape1 = (b,) + (1,) * (x.ndim - 1)
        y_sign = 1.0 - 2.0 * y.astype(x.dtype)
        act = predict(x) == y
        im2 = x
        adv = x
        res2 = jnp.full((b,), 1e10, x.dtype)
        x0 = x.reshape(b, -1)
        x1 = x

        def step(carry, _):
            x1, adv, res2 = carry
            z, g = z_and_grad(x1)
            # deferred bookkeeping: is_adv of the incoming candidate,
            # from the logit the gradient pass just produced (identical
            # to what the reference's predict saw at this point)
            is_adv = (z > 0).astype(jnp.int32) != y
            t_norm = core.flat_norms(x1 - im2, "linf")
            better = is_adv & (t_norm < res2) & act
            adv = jnp.where(better.reshape(shape1), x1, adv)
            res2 = jnp.where(better, t_norm, res2)
            # pullback BEFORE the update; g/z stay from the pre-pullback
            # point (the deviation, fires only on just-adversarial rows)
            x1 = jnp.where(
                is_adv.reshape(shape1), im2 + (x1 - im2) * BETA, x1
            )

            df = 2.0 * z * y_sign
            dg = 2.0 * g * y_sign.reshape(shape1)
            w = dg.reshape(b, -1)
            bb = -df + (w * x1.reshape(b, -1)).sum(axis=1)
            t2 = jnp.stack([x1.reshape(b, -1), x0], 0)
            d3 = projection_linf_bisect_pair(t2, w, jnp.stack([bb, bb], 0))
            d3 = d3.reshape(2 * b, -1)
            d1 = d3[:b].reshape(x1.shape)
            d2 = d3[b:].reshape(x1.shape)
            a0 = jnp.maximum(core.flat_norms(d3, "linf"), 1e-8)
            a1 = a0[:b].reshape(shape1)
            a2 = a0[b:].reshape(shape1)
            alpha = jnp.clip(a1 / (a1 + a2), 0.0, ALPHA_MAX)
            x1 = jnp.clip(
                (x1 + ETA * d1) * (1.0 - alpha) + (im2 + ETA * d2) * alpha,
                0.0, 1.0,
            )
            return (x1, adv, res2), None

        (x1, adv, res2), _ = jax.lax.scan(
            step, (x1, adv, res2), None, length=STEPS
        )
        # final candidate resolution (one predict, as the reference's
        # last in-loop predict)
        is_adv = predict(x1) != y
        t_norm = core.flat_norms(x1 - im2, "linf")
        better = is_adv & (t_norm < res2) & act
        adv = jnp.where(better.reshape(shape1), x1, adv)
        res2 = jnp.where(better, t_norm, res2)
        success = (res2 < 1e10) & act
        adv_c = jnp.where(success.reshape(shape1), adv, x)
        # restart-loop epilogue (attack(), n_restarts=1)
        still_correct = predict(adv_c) == y
        res = core.flat_norms(x - adv_c, "linf")
        fooled = act & ~(still_correct | (res > EPS))
        return jnp.where(fooled.reshape(shape1), adv_c, x)

    return attack


def bench(attack_batch, x, y, iters=3):
    keys = jax.random.split(jax.random.PRNGKey(1), iters + 2)
    t0 = time.perf_counter()
    out = attack_batch(x, y, keys[0])
    float(out.ravel()[0])
    compile_s = time.perf_counter() - t0
    out = attack_batch(x, y, keys[1])
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = attack_batch(x, y, keys[2 + i])
    float(out.ravel()[0])
    dt = time.perf_counter() - t0
    return BATCH * iters / dt, compile_s, out


def main():
    cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
           "compute_dtype": "bfloat16"}
    module = models.get_model("lcnn", cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE)
    # spread the logits so decision boundaries sit at real distances
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    out_k = variables["params"]["output"]["kernel"] * 25.0
    out_b = variables["params"]["output"]["bias"] * 25.0
    variables["params"]["output"] = {"kernel": out_k, "bias": out_b}
    logits_fn = core.make_logits_fn(module, variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE)).astype(np.float32))
    y01, mn, mx = core.to_minmax(x)
    z0 = logits_fn(y01).squeeze(-1)
    y = (np.asarray(z0) > 0).astype(np.int32)  # attack the predictions
    y = jnp.asarray(y)

    base = fab(logits_fn, n_classes=2, eta=10)
    merged = fab_merged(logits_fn)

    results = {}
    outs = {}
    for tag, atk in (("base", base), ("merged", merged)):
        @jax.jit
        def attack_batch(x, y, key, atk=atk):
            x01, mn, mx = core.to_minmax(x)
            return core.revert_minmax(atk(x01, y, key), mn, mx)

        ex_s, compile_s, out = bench(attack_batch, x, y)
        outs[tag] = np.asarray(out)
        results[tag] = {"examples_per_sec": round(ex_s, 1),
                        "compile_s": round(compile_s, 1)}
        print(tag, results[tag], flush=True)

    # agreement report
    xs = np.asarray(x)
    d_base = np.abs(outs["base"] - xs).max(axis=1)
    d_merged = np.abs(outs["merged"] - xs).max(axis=1)
    s_base, s_merged = d_base > 0, d_merged > 0
    both = s_base & s_merged
    ratio = np.median(d_merged[both] / np.maximum(d_base[both], 1e-12)) \
        if both.any() else float("nan")
    results["agreement"] = {
        "success_base": round(float(s_base.mean()), 4),
        "success_merged": round(float(s_merged.mean()), 4),
        "median_norm_ratio_merged_over_base": round(float(ratio), 4),
        "speedup": round(results["merged"]["examples_per_sec"]
                         / results["base"]["examples_per_sec"], 3),
    }
    print("agreement:", results["agreement"])

    out_path = Path(__file__).parent / "profile_fab_merged_r5.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
