#!/usr/bin/env python
"""RawNet3 round-4 breakdown: find the backward blow-up and test
restructured layer1 variants before changing the model.

profile_rawnet_r3b measured fwdbwd_full = 3.1x fwd_full (78.8 vs 25.4
ms at batch 64) — a dx-only backward of a conv trunk should be ~1.2x
the forward — and layer1 fwd+bwd (42.9) exceeds the sum of its conv
segments (~26): somewhere the backward and the inter-conv elementwise
are pathological. Rows here:

  * per-block fwd vs fwd+bwd (locate the asymmetry)
  * pool / AFMS / encoder-tail / instance-norm isolated fwd+bwd
  * layer1 variants, all semantics-preserving in eval mode:
      v2  concat-free conv3 (sum of per-chunk matmuls)
      v5  folded-BN-affine unrolled (no flax BN modules, no scan)
      v6  v5 + concat-free conv3

Scan-based methodology as r3b, two-pass (pass 1 compiles, pass 2
measures in a fresh cache-warm process).
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

from adaa_tpu.models import layers
from adaa_tpu.models.rawnet3 import AFMS, Bottle2neck

BATCH = 64
WAVE = 64_600
INNER = 8
T1 = (WAVE - 251) // 10 + 1  # 6435
bf = jnp.bfloat16


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


def seg_grad(fn):
    return jax.grad(lambda hh: jnp.sum(fn(hh).astype(jnp.float32)))


def main():
    rng = np.random.default_rng(7)

    def mk(shape, dtype=bf, scale=0.05):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        ).astype(dtype)

    h256 = mk((BATCH, T1, 256))
    h1024 = mk((BATCH, T1, 1024))
    h1024_5 = mk((BATCH, T1 // 5, 1024))
    h1024_15 = mk((BATCH, T1 // 15, 1024))

    results = {}

    # ---- per-block fwd vs fwd+bwd ------------------------------------
    blocks = {
        "layer1": (Bottle2neck(256, 1024, kernel_size=3, dilation=2,
                               scale=8, pool=5, compute_dtype=bf), h256),
        "layer2": (Bottle2neck(1024, 1024, kernel_size=3, dilation=3,
                               scale=8, pool=3, compute_dtype=bf), h1024_5),
        "layer3": (Bottle2neck(1024, 1024, kernel_size=3, dilation=4,
                               scale=8, compute_dtype=bf), h1024_15),
    }
    for name, (mod, h) in blocks.items():
        var = mod.init(jax.random.PRNGKey(1), h)
        fwd = lambda hh, mod=mod, var=var: mod.apply(var, hh)
        results[f"{name}_fwd_ms"] = scan_time(fwd, h)
        results[f"{name}_fwdbwd_ms"] = scan_time(seg_grad(fwd), h)

    # ---- isolated pieces ---------------------------------------------
    results["pool5_fwdbwd_ms"] = scan_time(
        seg_grad(lambda hh: layers.max_pool_1d(hh, 5)), h1024)

    def max_pool_1d_lane(x, window):
        """Pool via a free (B, L/w, w*C) view + max-tree over LANE-dim
        slices: the (B, L/w, w, C) reshape puts a width-w dim on the
        sublane axis, which mosaic can only handle with relayout copies
        (the standalone pool5 row costs 10.6 ms for a ~4 ms-of-traffic
        op); C-aligned lane slices need none."""
        b, l, c = x.shape
        l2 = l // window
        y = x[:, : l2 * window, :].reshape(b, l2, window * c)
        out = y[..., :c]
        for i in range(1, window):
            out = jnp.maximum(out, y[..., i * c:(i + 1) * c])
        return out

    results["pool5_lane_fwdbwd_ms"] = scan_time(
        seg_grad(lambda hh: max_pool_1d_lane(hh, 5)), h1024)

    from adaa_tpu.ops import pallas_pool

    results["pool5_pallas_fwdbwd_ms"] = scan_time(
        seg_grad(lambda hh: pallas_pool.max_pool_1d(hh, 5)), h1024)

    # full layer1 with the pallas pool substituted (monkeypatch is
    # safe: the profiler is a standalone process)
    orig_pool = layers.max_pool_1d
    layers.max_pool_1d = lambda x, w, stride=None: (
        pallas_pool.max_pool_1d(x, w)
        if pallas_pool.supported(x, w) else orig_pool(x, w, stride))
    try:
        l1m, h1m = blocks["layer1"]
        v1m = l1m.init(jax.random.PRNGKey(1), h1m)
        results["layer1_pallaspool_fwdbwd_ms"] = scan_time(
            seg_grad(lambda hh: l1m.apply(v1m, hh)), h1m)
    finally:
        layers.max_pool_1d = orig_pool
    afms = AFMS(1024)
    av = afms.init(jax.random.PRNGKey(2), h1024_5)
    results["afms_fwdbwd_ms"] = scan_time(
        seg_grad(lambda hh: afms.apply(av, hh)), h1024_5)

    x_wave = mk((BATCH, WAVE), jnp.float32, 1.0)

    def pre_in(xx):  # pre-emphasis + instance norm
        prev = jnp.concatenate([xx[:, 1:2], xx[:, :-1]], axis=1)
        h = xx - 0.97 * prev
        mean = h.mean(axis=1, keepdims=True)
        var = h.var(axis=1, keepdims=True)
        return (h - mean) / jnp.sqrt(var + 1e-4)

    results["preemph_instnorm_fwdbwd_ms"] = scan_time(seg_grad(pre_in), x_wave)

    henc = mk((BATCH, T1, 256))

    def enc_tail(hh):  # bf16 abs/log/mean-sub
        h = jnp.abs(hh)
        h = jnp.log(h + 1e-6)
        return h - h.mean(axis=1, keepdims=True,
                          dtype=jnp.float32).astype(h.dtype)

    results["enc_tail_fwdbwd_ms"] = scan_time(seg_grad(enc_tail), henc)

    # ---- layer1 variants ---------------------------------------------
    width, scale_n, planes = 128, 8, 1024
    nums = scale_n - 1
    k1 = mk((1, 256, 1024))
    b1 = mk((1024,))
    kres = mk((1, 256, 1024))
    k3 = mk((1, 1024, 1024))
    b3 = mk((1024,))
    ksc = [mk((3, 128, 128)) for _ in range(nums)]
    bsc = [mk((128,)) for _ in range(nums)]
    # folded BN affines (eval mode): per-channel (s, t)
    s1, t1 = mk((1024,), scale=1.0), mk((1024,))
    s3, t3 = mk((1024,), scale=1.0), mk((1024,))
    ssc = [mk((128,), scale=1.0) for _ in range(nums)]
    tsc = [mk((128,)) for _ in range(nums)]
    alpha = mk((1024,))
    wfc = mk((1024, 1024))
    bfc = mk((1024,))

    def conv1d(h, k, dil=1, pad=0):
        return jax.lax.conv_general_dilated(
            h, k, (1,), [(pad, pad)] if pad else "VALID",
            rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"))

    def afms_f(h):
        y = jax.nn.sigmoid(
            h.mean(axis=1).astype(jnp.float32) @ wfc.astype(jnp.float32)
            + bfc.astype(jnp.float32))[:, None, :].astype(h.dtype)
        return (h + alpha[None, None, :]) * y

    def layer1_folded(x, concat_free):
        residual = conv1d(x, kres)
        out = nn.relu(conv1d(x, k1) + b1) * s1 + t1
        spx = jnp.split(out, scale_n, axis=-1)
        outs, sp = [], None
        for i in range(nums):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = nn.relu(conv1d(sp, ksc[i], dil=2, pad=2) + bsc[i])
            sp = sp * ssc[i] + tsc[i]
            outs.append(sp)
        outs.append(spx[nums])
        if concat_free:
            w3 = jnp.split(k3[0], scale_n, axis=0)  # 8 x (128, 1024)
            acc = outs[0] @ w3[0]
            for i in range(1, scale_n):
                acc = acc + outs[i] @ w3[i]
            out = acc + b3
        else:
            out = conv1d(jnp.concatenate(outs, axis=-1), k3) + b3
        out = nn.relu(out) * s3 + t3
        out = out + residual
        out = layers.max_pool_1d(out, 5)
        return afms_f(out)

    results["l1_v5_folded_fwd_ms"] = scan_time(
        lambda h: layer1_folded(h, False), h256)
    results["l1_v5_folded_fwdbwd_ms"] = scan_time(
        seg_grad(lambda h: layer1_folded(h, False)), h256)
    results["l1_v6_concatfree_fwdbwd_ms"] = scan_time(
        seg_grad(lambda h: layer1_folded(h, True)), h256)

    for k, v in results.items():
        print(f"{k:32s} {v:9.3f}", flush=True)
    out = Path(__file__).parent / "profile_rawnet_r4.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
