#!/usr/bin/env python
"""Torch-CPU baseline for the OnePixel black-box attack.

Measures the REFERENCE'S OWN OnePixel (its per-sample host loop driving
the vendored differential evolution —
/root/reference/adversarial_attacks/torchattacks/attacks/onepixel.py:45-95,
read-only import) over LCNN+LFCC at the reference defaults
(pixels=1, steps=75, popsize=10, inf_batch=128), and caches
``onepixel_torch_cpu_examples_per_sec`` in BENCH_BASELINE.json so
BENCH_ATTACKS' OnePixel row has a reference denominator.

Method: a full 75-generation run per sample is minutes of torch-CPU
LCNN forwards, so the per-sample cost is extrapolated from two short
runs — T(m) = t_init + m * t_gen is exactly linear in the generation
count m (the vendored DE's per-generation work is constant; the
reference call disables convergence exit with atol=-1 and the victim
uses a spread-logit head so the success callback never fires), so two
measurements at m=1 and m=3 pin t_init and t_gen and
T(75) = t_init + 75 * t_gen. The extrapolation is recorded in the
cache entry.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF_TA = Path("/root/reference/adversarial_attacks")
OUT = REPO / "BENCH_BASELINE.json"
WAVE_LEN = 64_600

sys.path.insert(0, str(REPO))


def main():
    import numpy as np
    import torch

    from tests.oracles.torch_models import TorchLCNN

    sys.path.insert(0, str(REF_TA))
    import torchattacks

    torch.manual_seed(0)
    model = TorchLCNN(input_channels=1, num_coefficients=80)
    with torch.no_grad():
        # spread the logits so the DE success callback can't fire and
        # cut a generation short (same trick as tests/test_e2e_eer_parity)
        model.m_output_act.weight.mul_(25.0)
        model.m_output_act.bias.mul_(25.0)
    model.eval()

    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.standard_normal((2, WAVE_LEN)).astype("float32"))
    with torch.no_grad():
        z = model(x).squeeze(1)
    y = (z > 0).long()  # true-label = prediction: attack must WORK for it

    def run(steps):
        atk = torchattacks.OnePixel(model, pixels=1, steps=steps,
                                    popsize=10, inf_batch=128)
        t0 = time.perf_counter()
        atk(x, y)
        return (time.perf_counter() - t0) / x.shape[0]  # s/sample

    run(1)  # warmup (torch kernel autotuning)
    t1 = run(1)
    t3 = run(3)
    t_gen = max((t3 - t1) / 2.0, 1e-9)
    t_init = max(t1 - t_gen, 0.0)
    t75 = t_init + 75.0 * t_gen
    ex_s = 1.0 / t75

    cache = json.loads(OUT.read_text()) if OUT.exists() else {}
    cache["onepixel_torch_cpu_examples_per_sec"] = ex_s
    cache["onepixel_torch_cpu_config"] = (
        "OnePixel pixels=1 steps=75 popsize=10 inf_batch=128, LCNN+LFCC "
        "torch-cpu (reference per-sample DE loop); extrapolated "
        f"T(75)=t_init+75*t_gen from m=1/m=3 runs: t_init={t_init:.2f}s, "
        f"t_gen={t_gen:.2f}s/gen, T75={t75:.1f}s/sample"
    )
    OUT.write_text(json.dumps(cache, indent=1))
    print(json.dumps({"onepixel_torch_cpu_examples_per_sec": ex_s,
                      "t_gen_s": t_gen, "t_init_s": t_init}))


if __name__ == "__main__":
    main()
