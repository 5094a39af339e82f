#!/usr/bin/env python
"""RawNet3 attack-path per-op roofline floor table (VERDICT r4 item 2).

Same method as the LCNN mid-trunk table (profile_floor_r5.py): for
every component of the RawNet3 PGD hot path (reference
src/models/rawnet3.py:91-101; ours adaa_tpu/models/rawnet3.py), measure
the fwd+bwd device time (scan methodology, two-pass) and compute two
analytic floors under attack semantics (dW dead-code-eliminated,
gradients flow to x only):

* bytes floor — fwd reads X and writes Y; bwd reads G, re-reads X once
  (recompute the relu/pool routing — cheaper than storing masks), and
  writes dX. All bf16 (2 bytes); weights negligible.
  floor_ms = bytes / 819 GB/s (v5e HBM).
* FLOP floor — conv MACs * 2, three applications (fwd + dX transposed
  conv + routing recompute) / 197 TFLOP/s bf16 peak.

floor = max(bytes, flops); headroom = measured / floor. The table
closes the r4 ask "rawnet3:PGD >= 120 ex/s OR a per-op bytes-floor
table": it publishes where the 82->~90 ex/s row actually sits against
this chip, per op. The scale-conv chain (7 sequential k=3 dilated
convs of width 128 — a res2net data dependency, reference
rawnet3.py:222-238) is measured as the chain it is; its floor is the
sum of its per-conv floors.

Writes profile_rawnet_floor_r5.json.
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

from adaa_tpu.models import layers

BATCH = 64
INNER = 8
DT = jnp.bfloat16
HBM_BYTES_PER_S = 819e9   # v5e
PEAK_FLOPS = 197e12       # v5e bf16
WAVE = 64_600
T1 = (WAVE - 251) // 10 + 1  # 6435 (sinc encoder output length)


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


def conv1d(x, kern, dilation=1):
    k = kern.shape[0]
    pad = (k // 2) * dilation
    return jax.lax.conv_general_dilated(
        x, kern, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def grad_of(fn):
    return jax.grad(lambda hh: jnp.sum(fn(hh).astype(jnp.float32)))


def conv_floor(t, cin, cout, k, n_in_el, n_out_el, seq=1):
    """(bytes_ms, flop_ms) for one conv(+relu) op at batch BATCH.

    seq > 1 scales a chain of identical ops (floors add)."""
    itemsize = 2
    bytes_min = itemsize * (3 * n_in_el + 2 * n_out_el) * seq
    macs = BATCH * t * k * cin * cout * seq
    bytes_ms = bytes_min / HBM_BYTES_PER_S * 1e3
    flop_ms = 3 * 2 * macs / PEAK_FLOPS * 1e3
    return bytes_min, bytes_ms, flop_ms


def main():
    rng = np.random.default_rng(7)

    def mk(shape, dtype=DT, scale=0.05):
        return jnp.asarray(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        ).astype(dtype)

    results = {}
    total_meas = total_floor = 0.0

    def row(name, meas, bytes_min, bytes_ms, flop_ms):
        nonlocal total_meas, total_floor
        floor_ms = max(bytes_ms, flop_ms)
        results[name] = {
            "measured_fwdbwd_ms": round(meas, 3),
            "bytes_floor_ms": round(bytes_ms, 3),
            "flop_floor_ms": round(flop_ms, 3),
            "floor_ms": round(floor_ms, 3),
            "headroom_x": round(meas / floor_ms, 2),
            "bound": "flops" if flop_ms > bytes_ms else "bytes",
            "hbm_bytes_floor": int(bytes_min),
        }
        total_meas += meas
        total_floor += floor_ms
        print(f"{name}: meas {meas:.3f} ms floor {floor_ms:.3f} ms "
              f"({results[name]['bound']}) headroom "
              f"{results[name]['headroom_x']}x", flush=True)

    B = BATCH

    # --- sinc encoder: conv k=251 stride 10, 1 -> 256 (closed-form VJP
    # path is exercised by the real model; here the raw conv as XLA
    # sees it — strided, so the routing recompute term drops (no relu
    # before the abs/log tail which is measured in enc_tail)).
    wave = mk((B, WAVE, 1))
    sinc_k = mk((251, 1, 256))

    def enc(hh):
        return jax.lax.conv_general_dilated(
            hh, sinc_k, (10,), [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"))

    n_in = B * WAVE
    n_out = B * T1 * 256
    bytes_min = 2 * (3 * n_in + 2 * n_out)
    macs = B * T1 * 251 * 256
    row("encoder_sinc", scan_time(grad_of(enc), wave), bytes_min,
        bytes_min / HBM_BYTES_PER_S * 1e3, 2 * 2 * macs / PEAK_FLOPS * 1e3)

    # --- layer1 pieces (256 -> 1024, T=6435, dilation 2, scale 8) ---
    x256 = mk((B, T1, 256))
    x1024 = mk((B, T1, 1024))

    k_c1 = mk((1, 256, 1024))
    row("l1_conv1_1x1", scan_time(grad_of(
        lambda hh: jax.nn.relu(conv1d(hh, k_c1))), x256),
        *conv_floor(T1, 256, 1024, 1, B * T1 * 256, B * T1 * 1024))

    k_res = mk((1, 256, 1024))
    row("l1_residual_1x1", scan_time(grad_of(
        lambda hh: conv1d(hh, k_res)), x256),
        *conv_floor(T1, 256, 1024, 1, B * T1 * 256, B * T1 * 1024))

    # the res2net chain: sp_i = relu(conv(sp_{i-1} + spx_i)) — 7
    # sequential width-128 convs (data dependency, can't batch)
    ks = [mk((3, 128, 128)) for _ in range(7)]

    def chain(hh):
        spx = jnp.split(hh, 8, axis=-1)
        sp = None
        outs = []
        for i in range(7):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = jax.nn.relu(conv1d(sp, ks[i], dilation=2))
            outs.append(sp)
        outs.append(spx[7])
        return jnp.concatenate(outs, axis=-1)

    row("l1_scale_chain7", scan_time(grad_of(chain), x1024),
        *conv_floor(T1, 128, 128, 3, B * T1 * 128, B * T1 * 128, seq=7))

    k_c3 = mk((1, 1024, 1024))
    row("l1_conv3_1x1", scan_time(grad_of(
        lambda hh: jax.nn.relu(conv1d(hh, k_c3))), x1024),
        *conv_floor(T1, 1024, 1024, 1, B * T1 * 1024, B * T1 * 1024))

    # pool 5 (eqmask backward is the default since r5)
    n_in = B * 6435 * 1024
    n_out = B * 1287 * 1024
    bytes_min = 2 * (3 * n_in + 2 * n_out)
    row("l1_pool5", scan_time(grad_of(
        lambda hh: layers.max_pool_1d(hh, 5)), x1024),
        bytes_min, bytes_min / HBM_BYTES_PER_S * 1e3, 0.0)

    # --- layer2 (1024 -> 1024, T=1287, dilation 3, pool 3) ---
    t2 = 1287
    x2 = mk((B, t2, 1024))
    k2_c1 = mk((1, 1024, 1024))
    k2s = [mk((3, 128, 128)) for _ in range(7)]
    k2_c3 = mk((1, 1024, 1024))

    def layer2(hh):
        out = jax.nn.relu(conv1d(hh, k2_c1))
        spx = jnp.split(out, 8, axis=-1)
        sp = None
        outs = []
        for i in range(7):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = jax.nn.relu(conv1d(sp, k2s[i], dilation=3))
            outs.append(sp)
        outs.append(spx[7])
        out = jax.nn.relu(conv1d(jnp.concatenate(outs, axis=-1), k2_c3))
        out = out + hh
        return layers.max_pool_1d(out, 3)

    bm1, by1, fl1 = conv_floor(t2, 1024, 1024, 1,
                               B * t2 * 1024, B * t2 * 1024)
    bm2, by2, fl2 = conv_floor(t2, 128, 128, 3,
                               B * t2 * 128, B * t2 * 128, seq=7)
    bm3 = 2 * (3 * B * t2 * 1024 + 2 * B * (t2 // 3) * 1024)
    row("layer2_full", scan_time(grad_of(layer2), x2),
        bm1 + bm2 + bm1 + bm3, by1 + by2 + by1
        + bm3 / HBM_BYTES_PER_S * 1e3, fl1 + fl2 + fl1)

    # --- layer3 (1024 -> 1024, T=429, dilation 4, no pool) ---
    t3 = 429
    x3 = mk((B, t3, 1024))
    k3_c1 = mk((1, 1024, 1024))
    k3s = [mk((3, 128, 128)) for _ in range(7)]
    k3_c3 = mk((1, 1024, 1024))

    def layer3(hh):
        out = jax.nn.relu(conv1d(hh, k3_c1))
        spx = jnp.split(out, 8, axis=-1)
        sp = None
        outs = []
        for i in range(7):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = jax.nn.relu(conv1d(sp, k3s[i], dilation=4))
            outs.append(sp)
        outs.append(spx[7])
        out = jax.nn.relu(conv1d(jnp.concatenate(outs, axis=-1), k3_c3))
        return out + hh

    bm1, by1, fl1 = conv_floor(t3, 1024, 1024, 1,
                               B * t3 * 1024, B * t3 * 1024)
    bm2, by2, fl2 = conv_floor(t3, 128, 128, 3,
                               B * t3 * 128, B * t3 * 128, seq=7)
    row("layer3_full", scan_time(grad_of(layer3), x3),
        2 * bm1 + bm2, 2 * by1 + by2, 2 * fl1 + fl2)

    # --- head: pyramid concat -> layer4 1x1 3072->1536 + attention ---
    xcat = mk((B, t3, 3072))
    k4 = mk((1, 3072, 1536))
    ka0 = mk((1, 1536 * 3, 128))
    ka3 = mk((1, 128, 1536))

    def head(hh):
        h = jax.nn.relu(conv1d(hh, k4)).astype(jnp.float32)
        mu_t = h.mean(axis=1, keepdims=True)
        sg_t = jnp.sqrt(jnp.clip(h.var(axis=1, keepdims=True, ddof=1),
                                 1e-4, 1e4))
        g = jnp.concatenate(
            [h, jnp.broadcast_to(mu_t, h.shape),
             jnp.broadcast_to(sg_t, h.shape)], axis=-1)
        w = jax.nn.relu(conv1d(g.astype(DT), ka0))
        w = jax.nn.softmax(conv1d(w, ka3).astype(jnp.float32), axis=1)
        mu = jnp.sum(h * w, axis=1)
        sg = jnp.sqrt(jnp.clip(
            jnp.sum(h * h * w, axis=1) - mu * mu, 1e-4, 1e4))
        return jnp.concatenate([mu, sg], axis=-1)

    bm1, by1, fl1 = conv_floor(t3, 3072, 1536, 1,
                               B * t3 * 3072, B * t3 * 1536)
    bm2, by2, fl2 = conv_floor(t3, 4608, 128, 1,
                               B * t3 * 4608, B * t3 * 128)
    bm3, by3, fl3 = conv_floor(t3, 128, 1536, 1,
                               B * t3 * 128, B * t3 * 1536)
    row("head_layer4_attn", scan_time(grad_of(head), xcat),
        bm1 + bm2 + bm3, by1 + by2 + by3, fl1 + fl2 + fl3)

    pgd_step_ms = total_meas
    results["_total"] = {
        "measured_ms": round(total_meas, 2),
        "floor_ms": round(total_floor, 2),
        "headroom_x": round(total_meas / total_floor, 2),
        "batch": BATCH,
        "pgd10_bound_ex_per_sec_at_floor": round(
            BATCH / (10 * total_floor / 1e3), 1),
        "pgd10_bound_ex_per_sec_at_measured": round(
            BATCH / (10 * pgd_step_ms / 1e3), 1),
        "method": __doc__.split("\n")[0],
    }
    print("TOTAL:", results["_total"])
    out = Path(__file__).parent / "profile_rawnet_floor_r5.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
