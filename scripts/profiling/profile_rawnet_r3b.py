#!/usr/bin/env python
"""RawNet3 scan-based component breakdown (batch 64, bf16 trunk).

Same methodology as profile_r3b.py: each component runs INNER times
inside one jitted data-dependent lax.scan, so per-application time is
pure device time. Two-pass: run once to compile, measure in a fresh
process.
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
from flax import linen as nn

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parents[2] / ".jax_cache")
)

from adaa_tpu import models
from adaa_tpu.attacks import core as attack_core
from adaa_tpu.models.rawnet3 import Bottle2neck, ParamSincFB

BATCH = 64
WAVE = 64_600
INNER = 8


def scan_time(fn, x, iters=3):
    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            c = c + (leaf.ravel()[:1] * 1e-30).astype(c.dtype).reshape(
                (1,) * (c.ndim - 1) + (1,)
            )
            return c, ()

        c, _ = jax.lax.scan(body, x0, None, length=INNER)
        return c

    out = run(x)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters / INNER * 1000.0


def main():
    cfg = {"compute_dtype": "bfloat16"}
    module = models.get_model("rawnet3", cfg)
    variables = models.init_model(module, jax.random.PRNGKey(0),
                                  wave_length=WAVE)
    logits_fn = attack_core.make_logits_fn(module, variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE)).astype(np.float32))
    y = jnp.asarray((np.arange(BATCH) % 2).astype(np.float32))

    def loss(xx):
        z = logits_fn(xx)[:, 0]
        return jnp.sum(jax.nn.softplus(z) - y * z)

    grad_full = jax.grad(loss)

    # sinc encoder segment (f32 frontend incl. abs/log/mean-sub)
    sinc = ParamSincFB(n_filters=256, kernel_size=251, stride=10)
    sv = sinc.init(jax.random.PRNGKey(1), x[:, :, None])

    def sinc_seg(xx):
        h = sinc.apply(sv, xx[:, :, None])
        h = jnp.abs(h)
        h = jnp.log(h + 1e-6)
        return h - h.mean(axis=1, keepdims=True)

    grad_sinc = jax.grad(lambda xx: jnp.sum(sinc_seg(xx)))

    # bottleneck blocks standalone (random params; timing only)
    T1 = (WAVE - 251) // 10 + 1  # 6435
    h1 = jnp.asarray(
        rng.standard_normal((BATCH, T1, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    l1 = Bottle2neck(256, 1024, kernel_size=3, dilation=2, scale=8, pool=5,
                     compute_dtype=jnp.bfloat16)
    v1 = l1.init(jax.random.PRNGKey(2), h1)
    h2 = jnp.asarray(
        rng.standard_normal((BATCH, T1 // 5, 1024)).astype(np.float32)
    ).astype(jnp.bfloat16)
    l2 = Bottle2neck(1024, 1024, kernel_size=3, dilation=3, scale=8, pool=3,
                     compute_dtype=jnp.bfloat16)
    v2 = l2.init(jax.random.PRNGKey(3), h2)
    h3 = jnp.asarray(
        rng.standard_normal((BATCH, T1 // 15, 1024)).astype(np.float32)
    ).astype(jnp.bfloat16)
    l3 = Bottle2neck(1024, 1024, kernel_size=3, dilation=4, scale=8,
                     compute_dtype=jnp.bfloat16)
    v3 = l3.init(jax.random.PRNGKey(4), h3)

    def block_grad(mod, var):
        return jax.grad(
            lambda hh: jnp.sum(mod.apply(var, hh).astype(jnp.float32))
        )

    # layer1 internals at T=6435 (the docstring roofline says this block
    # is ~2/3 of the model FLOPs; find where its time actually goes).
    # Random weights, bf16 in/out, input-grad only (attacks prune dW).
    bf = jnp.bfloat16
    wrng = np.random.default_rng(7)

    def mk(shape):
        return jnp.asarray(
            wrng.standard_normal(shape).astype(np.float32) * 0.05
        ).astype(bf)

    k1 = mk((1, 256, 1024))      # conv1 1x1
    k3 = mk((1, 1024, 1024))     # conv3 1x1
    kres = mk((1, 256, 1024))    # residual 1x1
    ksc = [mk((3, 128, 128)) for _ in range(7)]  # scale convs

    def conv1d(h, k, dil=1, pad=0):
        return jax.lax.conv_general_dilated(
            h, k, (1,), [(pad, pad)] if pad else "VALID",
            rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"))

    def l1_conv1_seg(h):          # (B,T,256) -> (B,T,1024)
        return nn.relu(conv1d(h, k1))

    def l1_scalechain_seg(h):     # (B,T,1024) -> (B,T,1024)
        spx = jnp.split(h, 8, axis=-1)
        outs, sp = [], None
        for i in range(7):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = nn.relu(conv1d(sp, ksc[i], dil=2, pad=2))
            outs.append(sp)
        outs.append(spx[7])
        return jnp.concatenate(outs, axis=-1)

    def l1_conv3_seg(h):          # (B,T,1024) -> (B,T,1024)
        return nn.relu(conv1d(h, k3))

    def l1_matmul_ref(h):         # same FLOPs as conv3 as one einsum
        return nn.relu(jnp.einsum(
            "btc,cd->btd", h, k3[0],
            preferred_element_type=jnp.bfloat16))

    h256 = h1  # (B, 6435, 256) bf16
    h1024 = mk((BATCH, T1, 1024))

    def seg_grad(fn):
        return jax.grad(lambda hh: jnp.sum(fn(hh).astype(jnp.float32)))

    results = {}
    results["fwdbwd_full_ms"] = scan_time(grad_full, x)
    results["fwd_full_ms"] = scan_time(logits_fn, x)
    results["sinc_seg_fwd_ms"] = scan_time(sinc_seg, x)
    results["sinc_seg_fwdbwd_ms"] = scan_time(grad_sinc, x)
    results["layer1_fwdbwd_ms"] = scan_time(block_grad(l1, v1), h1)
    results["layer2_fwdbwd_ms"] = scan_time(block_grad(l2, v2), h2)
    results["layer3_fwdbwd_ms"] = scan_time(block_grad(l3, v3), h3)
    results["l1_conv1_fwdbwd_ms"] = scan_time(seg_grad(l1_conv1_seg), h256)
    results["l1_scalechain_fwdbwd_ms"] = scan_time(
        seg_grad(l1_scalechain_seg), h1024)
    results["l1_conv3_fwdbwd_ms"] = scan_time(seg_grad(l1_conv3_seg), h1024)
    results["l1_matmul_ref_fwdbwd_ms"] = scan_time(
        seg_grad(l1_matmul_ref), h1024)
    for k, v in results.items():
        print(f"{k:24s} {v:9.3f}")
    out = Path(__file__).parent / "profile_rawnet_r3b.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
