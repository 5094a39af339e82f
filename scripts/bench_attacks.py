#!/usr/bin/env python
"""Attack-matrix throughput benchmark on the real TPU chip.

Regenerates BENCH_ATTACKS.json: per-attack compile time, ms/batch and
examples/sec for the registry attacks used in the acceptance configs.
Reference hot loops: adversarial_attacks/torchattacks/attacks/*.py.

Usage:
    python scripts/bench_attacks.py [--attacks FAB PGD ...] [--batch 64]

Sync convention per CLAUDE.md: 4-byte scalar pull (full np.asarray rides
the ~1 GB/s axon relay; block_until_ready may return early).
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def provenance() -> str:
    """Row provenance stamp: '<git-short-rev> <iso-date>' at measure time."""
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).resolve().parents[1],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        rev = "unknown"
    return f"{rev} {date.today().isoformat()}"

WAVE_LEN = 64_600
OUT = Path(__file__).resolve().parent.parent / "BENCH_ATTACKS.json"

# v5e bf16 peak (same denominator as the RawNet3 roofline,
# models/rawnet3.py:27). MFU here = XLA-cost-analysis FLOPs of the
# whole attack program / wall time / this peak — a uniform, automatic
# method (the compiler counts the FLOPs actually emitted, incl. the
# backward), reported for every row regardless of attack family.
PEAK_FLOPS_BF16 = 197e12

DEFAULT_ATTACKS = [
    "FGSM", "PGD", "PGDL2", "BIM", "MIFGSM", "DeepFool", "APGDT",
    "CW", "Square", "FAB",
]


def _resolve(name):
    """Registry attacks by exact key; stock attacks by builder name."""
    from adaa_tpu.attacks import ATTACK_REGISTRY

    if name in ATTACK_REGISTRY:
        return ATTACK_REGISTRY[name]
    import importlib

    apgd_mod = importlib.import_module("adaa_tpu.attacks.apgd")
    cw_mod = importlib.import_module("adaa_tpu.attacks.cw")
    extra = importlib.import_module("adaa_tpu.attacks.extra")
    square_mod = importlib.import_module("adaa_tpu.attacks.square")
    onepixel_mod = importlib.import_module("adaa_tpu.attacks.onepixel")
    composite = importlib.import_module("adaa_tpu.attacks.composite")

    def _multiattack(logits_fn):
        """Registry-eps PGD + PGDL2 + FGSM in sequence (the reference's
        multiattack.py first-success-wins semantics)."""
        from adaa_tpu.attacks.gradient import fgsm, pgd, pgdl2

        return composite.multiattack(logits_fn, [
            pgd(logits_fn, eps=0.0005, steps=10),
            pgdl2(logits_fn, eps=0.1, steps=10),
            fgsm(logits_fn, eps=0.0005),
        ])

    stock = {
        "BIM": (extra.bim, {"steps": 10}),
        "MIFGSM": (extra.mifgsm, {"steps": 10}),
        "DeepFool": (extra.deepfool, {"steps": 20}),
        "APGDT": (apgd_mod.apgdt, {"steps": 20}),
        "CW": (cw_mod.cw, {"steps": 50}),
        "Square": (square_mod.square, {"n_queries": 200}),
        # reference OnePixel defaults (torchattacks/attacks/onepixel.py:
        # pixels=1, steps=75, popsize=10, inf_batch=128) — the
        # DE-driven black-box attack whose reference loop is host-bound
        "OnePixel": (onepixel_mod.onepixel,
                     {"pixels": 1, "steps": 75, "popsize": 10,
                      "inf_batch": 128}),
        "MultiAttack": (_multiattack, {}),
        # upstream 'standard' suite budgets (autoattack.py): APGD-CE +
        # APGD-T + FAB at 100 steps, Square at 5000 queries
        "AutoAttack": (composite.autoattack, {"eps": 0.001}),
    }
    return stock[name]


def _flops_per_example(fn, batch, *example_args, while_trip=1):
    """Scan-aware analytic MXU FLOPs per example (adaa_tpu.utils.flops).

    Replaces the first r5 sweep's ``compiled.cost_analysis()`` method:
    XLA's HloCostAnalysis counts a while/scan BODY ONCE regardless of
    trip count, so every iterative attack underreported 10-100x (the
    sweep recorded PGD-10 at 2.196e9 FLOPs/ex vs FGSM's 2.186e9 — one
    step, not ten). The jaxpr walk multiplies scan bodies by their
    static length; ``while_trip`` supplies CW's early-stop bound (its
    one ``while_loop``; the bench workload runs to the bound). Tracing
    is host-only — no device, no compile. The Pallas fused layer-0 is
    swapped for its XLA twin during the trace (identical math; jaxprs
    can't see inside a pallas_call).
    """
    import os

    from adaa_tpu.utils.flops import count_flops

    saved = os.environ.get("ADAA_FUSED_LCNN")
    os.environ["ADAA_FUSED_LCNN"] = "0"
    try:
        rep = count_flops(fn, *example_args, while_trip=while_trip)
    except Exception as e:  # row ships without the field, but say why
        print(f"[flops] count failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None
    finally:
        if saved is None:
            os.environ.pop("ADAA_FUSED_LCNN", None)
        else:
            os.environ["ADAA_FUSED_LCNN"] = saved
    if rep.get("has_pallas") or rep.get("unknown_hops"):
        print(f"[flops] opaque ops, skipping field: "
              f"pallas={rep.get('has_pallas')} "
              f"unknown={rep.get('unknown_hops')}", file=sys.stderr)
        return None  # opaque kernels would silently undercount
    flops = rep["flops"]
    return flops / batch if flops > 0 else None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--attacks", nargs="*", default=DEFAULT_ATTACKS)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--model", default="lcnn",
                        help="detector to attack (lcnn/specrnet/rawnet3); "
                        "non-lcnn results get a '<model>:' key prefix")
    parser.add_argument("--no-merge", action="store_true",
                        help="overwrite BENCH_ATTACKS.json instead of merging")
    parser.add_argument("--key-suffix", default="",
                        help="append to the result row key (A/B runs of "
                        "env-gated fast paths, e.g. '+b2n')")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(OUT.parent / ".jax_cache"))

    from adaa_tpu import models
    from adaa_tpu.attacks import ATTACK_REGISTRY, core as attack_core

    if args.model == "rawnet3":  # raw-waveform model: no frontend key
        cfg = {"compute_dtype": "bfloat16"}
    else:
        cfg = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
               "compute_dtype": "bfloat16"}
    module = models.get_model(args.model, cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE_LEN)
    logits_fn = attack_core.make_logits_fn(module, variables)
    prefix = "" if args.model == "lcnn" else f"{args.model}:" 

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.batch, WAVE_LEN)).astype(np.float32))
    y = jnp.asarray((np.arange(args.batch) % 2).astype(np.int32))

    results = {}
    if OUT.exists() and not args.no_merge:
        results = json.loads(OUT.read_text())

    for name in args.attacks:
        fn, params = _resolve(name)
        atk = fn(logits_fn, **params)

        def attack_plain(x, y, key, atk=atk):
            x01, mn, mx = attack_core.to_minmax(x)
            return attack_core.revert_minmax(atk(x01, y, key), mn, mx)

        attack_batch = jax.jit(attack_plain)

        # pre-split keys OUTSIDE the timed loop: each host-side split is
        # its own device program whose tunnel dispatch stalls the
        # pipeline ~25-110 ms/iter (same fix as bench.py; measured
        # rawnet3 PGD-10 1128 -> 795 ms/batch64)
        keys = jax.random.split(jax.random.PRNGKey(1), args.iters + 2)
        t0 = time.perf_counter()
        out = attack_batch(x, y, keys[0])
        float(out.ravel()[0])
        compile_s = time.perf_counter() - t0
        out = attack_batch(x, y, keys[1])  # warmup
        float(out.ravel()[0])

        t0 = time.perf_counter()
        for i in range(args.iters):
            out = attack_batch(x, y, keys[2 + i])
        float(out.ravel()[0])
        dt = time.perf_counter() - t0

        ms = dt / args.iters * 1e3
        ex_s = args.batch * args.iters / dt
        fpe = _flops_per_example(
            attack_plain, args.batch, x, y, keys[0],
            while_trip=params.get("steps", 1) if isinstance(params, dict)
            else 1,
        )
        row_key = prefix + name + (
            f"@b{args.batch}" if args.batch != 64 else "") + args.key_suffix
        results[row_key] = {
            f"ms_per_batch{args.batch}": round(ms, 1),
            "examples_per_sec": round(ex_s, 1),
            "compile_s": round(compile_s, 1),
            "measured_at": provenance(),
        }
        if fpe is not None:
            results[row_key]["flops_per_example"] = round(fpe)
            results[row_key]["mfu_pct"] = round(
                fpe * ex_s / PEAK_FLOPS_BF16 * 100, 2)
        if name == "OnePixel" and args.model == "lcnn":
            base = OUT.parent / "BENCH_BASELINE.json"
            if base.exists():
                ref = json.loads(base.read_text()).get(
                    "onepixel_torch_cpu_examples_per_sec")
                if ref:  # scripts/bench_onepixel_baseline.py
                    results[row_key]["vs_torch_cpu"] = round(ex_s / ref, 1)
        print(f"{row_key}: {results[row_key]}")

    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
