#!/usr/bin/env python
"""Ablation timing for the PGD hot loop: frontend vs conv trunk vs RNN.

Times fwd and fwd+bwd of each stage separately on the real chip so
optimization effort lands where the milliseconds are. Not a test —
a diagnostic for VERDICT r1 item 4 (conv-trunk MFU).
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

BATCH = 256
WAVE_LEN = 64_600


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out = out[0] if isinstance(out, tuple) else out
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from adaa_tpu import models
    from adaa_tpu.ops import frontends

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE_LEN)).astype(np.float32))

    lfcc = frontends.get_frontend(["lfcc"])

    @jax.jit
    def fe_fwd(x):
        return lfcc(x)

    @jax.jit
    def fe_fwdbwd(x):
        return jax.grad(lambda x: lfcc(x).sum())(x)

    feat = fe_fwd(x)  # (B, 80, T) or (B,1,80,T)
    if feat.ndim == 3:
        feat = feat[:, None]
    print("feat shape:", feat.shape, flush=True)

    print(f"frontend fwd      : {timeit(fe_fwd, x):8.1f} ms", flush=True)
    print(f"frontend fwd+bwd  : {timeit(fe_fwdbwd, x):8.1f} ms", flush=True)

    for dtype_name in ("bfloat16", "float32"):
        cfg = {"input_channels": 1, "frontend_algorithm": [],
               "compute_dtype": dtype_name}
        module = models.get_model("lcnn", cfg)
        variables = module.init(jax.random.PRNGKey(0), feat)

        @jax.jit
        def m_fwd(feat):
            return module.apply(variables, feat)

        @jax.jit
        def m_fwdbwd(feat):
            return jax.grad(lambda f: module.apply(variables, f).sum())(feat)

        print(f"[{dtype_name}] model-on-feats fwd    : "
              f"{timeit(m_fwd, feat):8.1f} ms", flush=True)
        print(f"[{dtype_name}] model-on-feats fwd+bwd: "
              f"{timeit(m_fwdbwd, feat):8.1f} ms", flush=True)

        # full chain
        cfg2 = {"input_channels": 1, "frontend_algorithm": ["lfcc"],
                "compute_dtype": dtype_name}
        module2 = models.get_model("lcnn", cfg2)
        variables2 = models.init_model(module2, jax.random.PRNGKey(0),
                                       wave_length=WAVE_LEN)

        @jax.jit
        def full_fwdbwd(x):
            return jax.grad(lambda x: module2.apply(variables2, x).sum())(x)

        print(f"[{dtype_name}] full fwd+bwd          : "
              f"{timeit(full_fwdbwd, x):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
