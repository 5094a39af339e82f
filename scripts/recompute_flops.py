#!/usr/bin/env python
"""Re-derive flops_per_example / mfu_pct for existing BENCH_ATTACKS rows.

The first r5 sweep populated those fields from XLA cost_analysis, which
counts scan/while bodies once (see adaa_tpu/utils/flops.py) — iterative
rows underreported 10-100x. Timings (ms/batch, examples_per_sec,
compile_s) are untouched; this only replaces the FLOP fields using the
scan-aware jaxpr count. Host-CPU tracing only — safe to run while the
TPU is busy, and exactly what bench_attacks.py now computes for new
rows.

Usage: python scripts/recompute_flops.py
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(REPO / "scripts"))
import bench_attacks as ba  # noqa: E402

OUT = REPO / "BENCH_ATTACKS.json"
PEAK = ba.PEAK_FLOPS_BF16
KEY_RE = re.compile(
    r"^(?:(?P<model>[a-z0-9]+):)?(?P<attack>[A-Za-z0-9]+?)"
    r"(?:@b(?P<batch>\d+))?(?P<suffix>\+\w+)?$"
)


def main():
    rows = json.loads(OUT.read_text())
    logits_cache = {}

    def logits_fn_for(model):
        if model not in logits_cache:
            from adaa_tpu import models
            from adaa_tpu.attacks import core as attack_core

            if model == "rawnet3":
                cfg = {"compute_dtype": "bfloat16"}
            else:
                cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
                       "compute_dtype": "bfloat16"}
            module = models.get_model(model, cfg)
            variables = models.init_model(
                module, jax.random.PRNGKey(0), wave_length=ba.WAVE_LEN)
            logits_cache[model] = attack_core.make_logits_fn(
                module, variables)
        return logits_cache[model]

    for key, row in rows.items():
        if key.startswith("_") or not isinstance(row, dict):
            continue
        if "examples_per_sec" not in row:
            continue  # e.g. the rawnet3 b256 OOM row
        m = KEY_RE.match(key)
        if not m:
            print(f"skip (unparsed key): {key}")
            continue
        model = m.group("model") or "lcnn"
        attack = m.group("attack")
        batch = int(m.group("batch") or 64)
        from adaa_tpu.attacks import core as attack_core

        fn, params = ba._resolve(attack)
        atk = fn(logits_fn_for(model), **params)

        def attack_plain(x, y, k, atk=atk):
            x01, mn, mx = attack_core.to_minmax(x)
            return attack_core.revert_minmax(atk(x01, y, k), mn, mx)

        x = jnp.zeros((batch, ba.WAVE_LEN), jnp.float32)
        y = jnp.zeros((batch,), jnp.int32)
        k = jax.random.PRNGKey(1)
        fpe = ba._flops_per_example(
            attack_plain, batch, x, y, k,
            while_trip=params.get("steps", 1)
            if isinstance(params, dict) else 1,
        )
        if fpe is None:
            print(f"skip (no count): {key}")
            continue
        row["flops_per_example"] = round(fpe)
        row["mfu_pct"] = round(
            fpe * row["examples_per_sec"] / PEAK * 100, 2)
        print(f"{key}: {row['flops_per_example']:.4g} flops/ex "
              f"mfu {row['mfu_pct']}%")

    meta = rows.setdefault("_meta", {})
    meta["flops_method"] = (
        "scan-aware analytic MXU FLOPs from the traced jaxpr "
        "(adaa_tpu/utils/flops.py): dot_general + conv FLOPs, scan "
        "bodies x static length, CW's early-stop while_loop x its step "
        "bound. Replaces XLA cost_analysis, which counts loop bodies "
        "once (PGD-10 had recorded FGSM-sized FLOPs)."
    )
    OUT.write_text(json.dumps(rows, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
