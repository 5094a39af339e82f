#!/usr/bin/env python
"""Attack-effectiveness parity of the fast-surrogate modes.

The EER-parity path is full f32 (precision "highest"); the fast trunk
(bf16 compute, fused layer-0, optionally bf16 frontend) is only used
to GENERATE adversarial examples. This script measures whether the
fast surrogates produce attacks as effective as the f32 surrogate:
PGD-10 (registry params) is run from each surrogate, and the resulting
audio is scored on the f32 victim (mean |logit shift| + flip rate).

Writes BENCH_EFFECTIVENESS.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WAVE_LEN = 64_600
BATCH = 128


def run_family(model_name, base_cfg, surrogates, batch=BATCH):
    """PGD-10 from each fast surrogate, scored on the f32 victim."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adaa_tpu import models
    from adaa_tpu.attacks import core as attack_core
    from adaa_tpu.attacks.gradient import pgd

    victim = models.get_model(model_name, base_cfg)
    variables = models.init_model(victim, jax.random.PRNGKey(0),
                                  wave_length=WAVE_LEN)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, WAVE_LEN)).astype(np.float32))
    y = jnp.asarray((np.arange(batch) % 2).astype(np.int32))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def victim_logits(wave):
        return victim.apply(variables, wave)

    z_clean = np.asarray(victim_logits(x)).squeeze(-1)

    def run_surrogate(name, env=None, extra_cfg=None):
        envs = env or {}
        old = {k: os.environ.get(k) for k in envs}
        os.environ.update(envs)
        try:
            cfg = dict(base_cfg, **(extra_cfg or {}))
            module = models.get_model(model_name, cfg)

            def attack_batch(x, y, key):
                logits_fn = lambda xx: module.apply(variables, xx)
                atk = pgd(logits_fn, eps=0.0005, steps=10)
                x01, mn, mx = attack_core.to_minmax(x)
                return attack_core.revert_minmax(atk(x01, y, key), mn, mx)

            jitted = jax.jit(attack_batch)
            t0 = time.perf_counter()
            adv = jitted(x, y, key)
            float(adv.ravel()[0])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(3):
                adv = jitted(x, y, key)
            float(adv.ravel()[0])
            dt = (time.perf_counter() - t0) / 3
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        z_adv = np.asarray(victim_logits(adv)).squeeze(-1)
        shift = np.abs(z_adv - z_clean)
        flips = ((z_adv > 0) != (z_clean > 0)).mean()
        from scripts.bench_attacks import provenance

        res = {
            "mean_abs_logit_shift": float(shift.mean()),
            "flip_rate": float(flips),
            "examples_per_sec": round(batch / dt, 1),
            "compile_s": round(compile_s, 1),
            "measured_at": provenance(),
        }
        print(f"{name}: {res}", flush=True)
        return res

    out = {}
    for name, kw in surrogates.items():
        # one broken opt-in variant must not lose the family's rows
        try:
            out[name] = run_surrogate(name, **kw)
        except Exception as exc:  # noqa: BLE001 — recorded, not hidden
            from scripts.bench_attacks import provenance
            msg = str(exc).splitlines()[0][:200]
            print(f"{name}: FAILED {msg}", flush=True)
            out[name] = {"error": msg, "measured_at": provenance()}
    return out


def main():
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--families", nargs="*", default=["lcnn", "specrnet", "rawnet3"])
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))

    out = Path(__file__).resolve().parents[1] / "BENCH_EFFECTIVENESS.json"
    results = json.loads(out.read_text()) if out.exists() else {}

    if "lcnn" in args.families:
        results.update(run_family(
            "lcnn",
            {"input_channels": 1, "frontend_algorithm": ["lfcc"]},
            {
                "f32_surrogate": dict(env={"ADAA_FUSED_LCNN": "0"}),
                "bf16_trunk_f32_frontend": dict(
                    env={"ADAA_BF16_FRONTEND": "0"},
                    extra_cfg={"compute_dtype": "bfloat16"}),
                "bf16_trunk_bf16_frontend": dict(
                    env={"ADAA_BF16_FRONTEND": "1"},
                    extra_cfg={"compute_dtype": "bfloat16"}),
            },
        ))
        out.write_text(json.dumps(results, indent=1))
    if "specrnet" in args.families:
        results.update({
            f"specrnet:{k}": v for k, v in run_family(
                "specrnet",
                {"input_channels": 1, "frontend_algorithm": ["lfcc"]},
                {
                    "f32_surrogate": dict(),
                    "bf16_trunk_f32_frontend": dict(
                        env={"ADAA_BF16_FRONTEND": "0"},
                        extra_cfg={"compute_dtype": "bfloat16"}),
                    "bf16_trunk_bf16_frontend": dict(
                        env={"ADAA_BF16_FRONTEND": "1"},
                        extra_cfg={"compute_dtype": "bfloat16"}),
                },
            ).items()
        })
        out.write_text(json.dumps(results, indent=1))
    if "rawnet3" in args.families:
        # raw-waveform family: the "frontend" knob is the sinc encoder
        results.update({
            f"rawnet3:{k}": v for k, v in run_family(
                "rawnet3",
                {},
                {
                    "f32_surrogate": dict(),
                    "bf16_trunk_f32_encoder": dict(
                        env={"ADAA_BF16_FRONTEND": "0"},
                        extra_cfg={"compute_dtype": "bfloat16"}),
                    "bf16_trunk_bf16_encoder": dict(
                        env={"ADAA_BF16_FRONTEND": "1"},
                        extra_cfg={"compute_dtype": "bfloat16"}),
                    # fused VMEM-resident Bottle2neck (ops/pallas_b2n.py)
                    "bf16_fused_b2n": dict(
                        env={"ADAA_FUSED_B2N": "1"},
                        extra_cfg={"compute_dtype": "bfloat16"}),
                },
                batch=64,
            ).items()
        })
        out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
