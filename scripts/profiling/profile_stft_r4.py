#!/usr/bin/env python
"""Round-4 STFT reformulation A/B: strided conv vs chunked conv vs framed matmul.

The flagship PGD step spends 5.96 ms of ~22.8 ms in the LFCC frontend
(profile_r3b.json) whose windowed DFT is a (B,1,65112)x(514,1,512)
stride-160 conv — ~12x off its 0.28 ms bf16 FLOP floor. Hypothesis: the
big-kernel strided conv forces a relayout; reformulating on hop-sized
chunks turns it into stride-1 width-4 convs / plain matmuls that land
straight on the MXU.

Variants (all numerically the same windowed DFT):
  a) status quo: stride-160 conv fwd + einsum/overlap-add bwd
  b) chunked conv: x->(B,R,160); fwd = width-4 VALID conv (4,160,2F);
     bwd = width-4 padded conv of g with the transposed kernel
  c) framed matmul: stack 4 shifted chunk views -> (B,T,640) @ (640,2F);
     bwd = g @ (2F,640) -> scatter back as 4 shifted adds on chunks

Usage: [CHECK=1] python profile_stft_r4.py   (CHECK=1 runs CPU numerics only)
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

if os.environ.get("CHECK") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parents[2] / ".jax_cache")
)

from adaa_tpu.ops import stft as stft_ops

N_FFT = 512
HOP = 160
WIN = 400
F2 = 2 * (N_FFT // 2 + 1)  # 514
C = -(-N_FFT // HOP)  # 4 chunks per frame
BATCH = 64 if os.environ.get("CHECK") == "1" else 256
WAVE = 64_600
INNER = 8

kern2d = stft_ops._dft_kernel(N_FFT, WIN, "hann")[:, 0, :]  # (2F, n_fft)
# chunked kernel: (C, HOP, 2F); row j takes xp[160j:160j+160] within a frame
kc = np.zeros((C, HOP, F2), np.float32)
flat = np.zeros((C * HOP, F2), np.float32)
flat[:N_FFT] = kern2d.T
kc[:] = flat.reshape(C, HOP, F2)


def pad_wave(x):
    pad = N_FFT // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    lp = xp.shape[-1]
    r = -(-lp // HOP)
    xp = jnp.pad(xp, ((0, 0), (0, r * HOP - lp)))
    return xp, lp, r


def make_chunked(dtype):
    kf = jnp.asarray(kc, dtype)  # (C, HOP, 2F)
    kb = jnp.asarray(np.ascontiguousarray(kc[::-1].transpose(0, 2, 1)), dtype)
    prec = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    @jax.custom_vjp
    def dft(xp):  # xp (B, R*HOP) padded
        b = xp.shape[0]
        ch = xp.reshape(b, -1, HOP).astype(dtype)
        out = jax.lax.conv_general_dilated(
            ch, kf, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NCH"),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (B, 2F, T)
        return out.astype(dtype) if dtype == jnp.bfloat16 else out

    def fwd(xp):
        return dft(xp), (xp.shape[0], xp.shape[1])

    def bwd(res, g):
        b, lpad = res
        # g (B, 2F, T) -> chunk grads (B, R, HOP) via full-corr conv
        gt = jnp.transpose(g, (0, 2, 1)).astype(dtype)  # (B, T, 2F)
        dch = jax.lax.conv_general_dilated(
            gt, kb, window_strides=(1,), padding=((C - 1, C - 1),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (B, T + C - 1, HOP) == (B, R, HOP)
        return (dch.reshape(b, -1)[:, :lpad],)

    dft.defvjp(fwd, bwd)
    return dft


def make_framed(dtype):
    kflat = jnp.asarray(flat, dtype)  # (C*HOP, 2F)
    prec = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    @jax.custom_vjp
    def dft(xp):
        b = xp.shape[0]
        ch = xp.reshape(b, -1, HOP).astype(dtype)  # (B, R, HOP)
        t = ch.shape[1] - (C - 1)
        s = jnp.concatenate(
            [ch[:, j : j + t] for j in range(C)], axis=-1
        )  # (B, T, C*HOP)
        out = jnp.einsum("btn,nf->bft", s, kflat,
                         preferred_element_type=jnp.float32, precision=prec)
        return out.astype(dtype) if dtype == jnp.bfloat16 else out

    def fwd(xp):
        return dft(xp), (xp.shape[0], xp.shape[1])

    def bwd(res, g):
        b, lpad = res
        t = g.shape[-1]
        gg = jnp.einsum("bft,nf->btn", g.astype(dtype), kflat,
                        preferred_element_type=jnp.float32,
                        precision=prec)  # (B,T,C*HOP)
        gg = gg.reshape(b, t, C, HOP)
        r = t + C - 1
        acc = jnp.zeros((b, r, HOP), gg.dtype)
        for j in range(C):
            acc = acc.at[:, j : j + t].add(gg[:, :, j])
        return (acc.reshape(b, -1)[:, :lpad],)

    dft.defvjp(fwd, bwd)
    return dft


def lfcc_like(dft_fn):
    """Full mini-frontend over a reformulated DFT: spec+sum for grad."""

    def f(x):
        xp, lp, _ = pad_wave(x)
        out = dft_fn(xp)  # (B, 2F, T)
        nb = N_FFT // 2 + 1
        r32 = out[:, :nb].astype(jnp.float32)
        i32 = out[:, nb:].astype(jnp.float32)
        return r32 * r32 + i32 * i32

    return f


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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, WAVE)).astype(np.float32) * 0.1)

    # reference values from the existing path (f32 parity path)
    spec_ref = stft_ops.spectrogram(x, power=2.0)
    g_ref = jax.grad(lambda xx: jnp.sum(stft_ops.spectrogram(xx, power=2.0)))(x)

    results = {}
    dts = [(jnp.float32, "f32")]
    if jax.default_backend() != "cpu":
        dts.append((jnp.bfloat16, "bf16"))  # no bf16 dot kernel on CPU
    for name, maker in (("chunked", make_chunked), ("framed", make_framed)):
        for dt, dtname in dts:
            fn = lfcc_like(maker(dt))
            spec = fn(x)
            g = jax.grad(lambda xx: jnp.sum(fn(xx)))(x)
            scale = float(jnp.max(jnp.abs(spec_ref)))
            gscale = float(jnp.max(jnp.abs(g_ref)))
            results[f"{name}_{dtname}_spec_relerr"] = float(
                jnp.max(jnp.abs(spec - spec_ref))) / scale
            results[f"{name}_{dtname}_grad_relerr"] = float(
                jnp.max(jnp.abs(g - g_ref))) / gscale

    if os.environ.get("CHECK") == "1":
        print(json.dumps(results, indent=1))
        return

    # timings (TPU): status quo bf16/f32 vs reformulations
    sq_bf = lambda xx: stft_ops.spectrogram(xx, power=2.0, compute="bf16")
    sq_f32 = lambda xx: stft_ops.spectrogram(xx, power=2.0)
    cases = {
        "statusquo_bf16": sq_bf,
        "statusquo_f32": sq_f32,
        "chunked_bf16": lfcc_like(make_chunked(jnp.bfloat16)),
        "chunked_f32": lfcc_like(make_chunked(jnp.float32)),
        "framed_bf16": lfcc_like(make_framed(jnp.bfloat16)),
    }
    for name, fn in cases.items():
        results[f"{name}_fwd_ms"] = scan_time(fn, x)
        results[f"{name}_fwdbwd_ms"] = scan_time(
            jax.grad(lambda xx, f=fn: jnp.sum(f(xx))), x)
        print(name, results[f"{name}_fwd_ms"], results[f"{name}_fwdbwd_ms"])

    out = Path(__file__).parent / "profile_stft_r4.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
