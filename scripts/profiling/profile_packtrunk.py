#!/usr/bin/env python
"""Lane-packed LCNN mid-trunk experiment (round 4).

Theory: the mid-trunk tensors carry C=32-64 channels in the minor dim;
XLA:TPU lane-tiles the minor dim to 128, so every HBM pass moves 2-4x
the payload, which matches the measured 1x1 convs at 2-5% MFU (4x
above their traffic floor, profile_layers18.json).

Candidate: space-to-depth the coefficient axis W into channels
(w-major packing: packed[..., o*C+c] = x[..., j*P+o, c] — a pure
row-major reshape), and run the WHOLE mid-trunk at a 96-128-lane minor
dim. Channel mixing then needs block-diagonal dense kernels = P x the
FLOPs, a trade that is favorable exactly where MFU is low:

  1x1 convs (2-5%% MFU, bandwidth-bound): P x FLOPs is free, lanes 4x.
  3x3 convs (19-40%% MFU): P x FLOPs may not amortize -> measure.

Variants (batch 256, bf16, dx-only backward like the attack path):
  probe   minor-dim lane-padding probe (max chains, equal elements)
  base    status-quo folded pipeline conv3..conv25
  packP4  whole trunk packed: P=4 until conv6's pool, P=2 after
  packP2  whole trunk packed at P=2 (half lanes, half FLOP inflation)
  mixed   1x1 stages packed (pure-reshape boundaries), 3x3 natural

All packed variants are asserted numerically equal to base (bf16 tol)
before timing.
"""
from __future__ import annotations

import json
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

B = 256
DT = jnp.bfloat16


def timeit(fn, *args, iters=20, warmup=3):
    # sync via a 4-byte scalar pull (np.asarray on the full output rides
    # a ~1 GB/s relay and overcounts ~100x — see CLAUDE.md)
    for _ in range(warmup):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


# --- shared pieces -------------------------------------------------------

def conv(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def mfm(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.maximum(a, b)


def mfm_pool(x):
    b, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2]
    x = x.reshape(b, h // 2, 2, w // 2, 2, 2, c // 2)
    return x.max(axis=(2, 4, 5))


# (name, ksize, Cin, Cout, pooled) for the folded mid-trunk,
# input (B, 202, 40, 32) -> output (B, 25, 5, 32)
SPEC = [
    ("conv3", 1, 32, 64, False),
    ("conv6", 3, 32, 96, True),
    ("conv10", 1, 48, 96, False),
    ("conv13", 3, 48, 128, True),
    ("conv16", 1, 64, 128, False),
    ("conv19", 3, 64, 64, False),
    ("conv22", 1, 32, 64, False),
    ("conv25", 3, 32, 64, True),
]


def make_params(rng):
    params = {}
    for name, k, cin, cout, _ in SPEC:
        params[name] = (
            jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, DT),
            jnp.asarray(rng.standard_normal((cout,)) * 0.01, DT),
        )
    return params


def base_trunk(x, params):
    h = x
    for name, k, cin, cout, pooled in SPEC:
        w, b = params[name]
        h = conv(h, w, k) + b
        h = mfm_pool(h) if pooled else mfm(h)
    return h


# --- packed machinery ----------------------------------------------------

def pack_kernel_1x1(w, P):
    """(1,1,Cin,Cout) -> block-diag (1,1,P*Cin,P*Cout), w-major packing."""
    cin, cout = w.shape[2], w.shape[3]
    eye = jnp.eye(P, dtype=w.dtype)
    # out[o*Cout+co] sums in[o*Cin+ci] * w[ci,co]
    wp = jnp.einsum("pq,ij->piqj", eye, w[0, 0]).reshape(P * cin, P * cout)
    return wp[None, None]


def pack_kernel_3x3(w, P):
    """(3,3,Cin,Cout) -> (3,3,P*Cin,P*Cout) over (H, blockW).

    Output (j, o) needs input w' = j*P + o + dw - 1 for dw in {0,1,2}
    (kernel tap positions, pad 1): block tap bt = (o+dw-1)//P + 1,
    in-block offset o' = (o+dw-1) % P.
    """
    cin, cout = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, P, cin, P, cout), np.float32)
    wn = np.asarray(w, np.float32)
    for o in range(P):
        for dw in range(3):
            tw = o + dw - 1
            bt = tw // P + 1
            op = tw % P
            wp[:, bt, op, :, o, :] += wn[:, dw]
    return jnp.asarray(wp.reshape(3, 3, P * cin, P * cout), w.dtype)


def packed_mfm(x, P, c):
    b, h, wb, _ = x.shape
    x = x.reshape(b, h, wb, P, 2, c // 2).max(axis=4)
    return x.reshape(b, h, wb, P * (c // 2))


def packed_mfm_pool(x, P, c):
    """MFM + 2x2 pool in packed space: P halves (pairs of adjacent w)."""
    b, h, wb, _ = x.shape
    x = x[:, : (h // 2) * 2]
    x = x.reshape(b, h // 2, 2, wb, P // 2, 2, 2, c // 2)
    x = x.max(axis=(2, 5, 6))
    return x.reshape(b, h // 2, wb, (P // 2) * (c // 2))


def packed_trunk(x, params, p0):
    """Whole mid-trunk in packed space. p0: starting P (4 or 2)."""
    b, h, w, c = x.shape
    P = p0
    hloc = x.reshape(b, h, w // P, P * c)
    for name, k, cin, cout, pooled in SPEC:
        wgt, bias = params[name]
        if k == 1:
            wp = pack_kernel_1x1(wgt, P)
        else:
            wp = pack_kernel_3x3(wgt, P)
        bp = jnp.tile(bias, P)
        hloc = conv(hloc, wp, k) + bp
        if pooled:
            hloc = packed_mfm_pool(hloc, P, cout)
            P //= 2
            if P == 1:
                # re-widen: merge two adjacent blocks (pure reshape)
                bb, hh, wb, cc = hloc.shape
                if wb % 2 == 0:
                    hloc = hloc.reshape(bb, hh, wb // 2, 2 * cc)
                    P = 2
        else:
            hloc = packed_mfm(hloc, P, cout)
    bb, hh, wb, cc = hloc.shape
    cfin = SPEC[-1][3] // 2
    return hloc.reshape(bb, hh, wb * P, cfin)


def mixed_trunk(x, params):
    """1x1 stages packed via pure reshapes; 3x3 stages natural layout."""
    h = x
    for name, k, cin, cout, pooled in SPEC:
        wgt, bias = params[name]
        if k == 1:
            b_, hh, w, c = h.shape
            P = max(1, 128 // c)
            while w % P:
                P //= 2
            hp = h.reshape(b_, hh, w // P, P * c)
            hp = conv(hp, pack_kernel_1x1(wgt, P), 1) + jnp.tile(bias, P)
            hp = packed_mfm(hp, P, cout)
            h = hp.reshape(b_, hh, w, cout // 2)
        else:
            h = conv(h, wgt, k) + bias
            h = mfm_pool(h) if pooled else mfm(h)
    return h


def main():
    check_only = "--check" in sys.argv
    if check_only:
        jax.config.update("jax_platforms", "cpu")
    b = 4 if check_only else B
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(rng.standard_normal((b, 202, 40, 32)), DT)
    res = {}

    if check_only:
        ref = np.asarray(base_trunk(x, params), np.float32)
        for name, fn in [("packP4", partial(packed_trunk, p0=4)),
                         ("packP2", partial(packed_trunk, p0=2)),
                         ("mixed", mixed_trunk)]:
            out = np.asarray(fn(x, params), np.float32)
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"{name}: shape={out.shape} relerr={err:.2e}")
            assert out.shape == ref.shape and err < 3e-2, name
        print("OK")
        return

    # --- probe: equal-element max chains at different minor dims ---
    for minor in (32, 128):
        shape = (B, 202, 40 * 32 // minor, minor)
        y = jnp.asarray(rng.standard_normal(shape), DT)

        @jax.jit
        def chain(a):
            for _ in range(8):
                a = jnp.maximum(a * 1.0001, a - 0.001)
            return a.sum()

        res[f"probe_max8_minor{minor}_ms"] = timeit(chain, y)

    variants = {
        "base": base_trunk,
        "packP4": partial(packed_trunk, p0=4),
        "packP2": partial(packed_trunk, p0=2),
        "mixed": mixed_trunk,
    }

    ref = None
    for name, fn in variants.items():
        fwd = jax.jit(lambda xx, pp, f=fn: f(xx, pp))

        def loss(xx, pp, f=fn):
            return (f(xx, pp).astype(jnp.float32) ** 2).sum()

        grad = jax.jit(jax.grad(loss, argnums=0))
        out = np.asarray(fwd(x, params), np.float32)
        if ref is None:
            ref = out
        else:
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            res[f"{name}_relerr"] = float(err)
            assert err < 3e-2, f"{name} mismatch: {err}"
        t0 = time.perf_counter()
        res[f"{name}_fwd_ms"] = timeit(fwd, x, params)
        res[f"{name}_fwdbwd_ms"] = timeit(grad, x, params)
        res[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)

    out_path = Path(__file__).with_suffix(".json")
    out_path.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
