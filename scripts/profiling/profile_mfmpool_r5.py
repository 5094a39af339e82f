#!/usr/bin/env python
"""Equality-mask backward for the LCNN trunk's fused MFM(+pool) maxes.

profile_pool_r5.py measured RawNet3's 1-D pool backward at 1.57x by
dropping jnp.max's tie-count normalization (models/layers.py
_max_pool_1d_eqmask). The LCNN mid-trunk pays the same tax bigger:
mfm_pool_2d reduces an 8-candidate max over the full-width conv output
((256, 202, 40, 96) bf16 at conv6), and max_feature_map's binary max
also lowers to a tie-splitting select chain. This measures, per pooled
layer and for the full conv3..conv25 chain (standalone twins of the
lcnn.py fconv chain — the module is NOT modified, so a running bench
sweep's warm cache stays valid):

  base     — mfm_pool_2d / max_feature_map as shipped
  eqmask   — custom-VJP forms: dx = g where x equals the reduced max
             (no tie normalization); binary MFM routes g to BOTH
             halves on ties instead of 0.5/0.5

Identical values forward; gradients differ only on exact ties
(measure-zero for continuous activations). Writes
profile_mfmpool_r5.json; integration into models/layers.py is gated on
these numbers.
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

BATCH = 256
INNER = 8
DT = jnp.bfloat16

SPEC = [  # (name, feat, k, in_feat, pooled) — lcnn.py fconv chain
    ("conv3", 64, 1, 32, False),
    ("conv6", 96, 3, 32, True),
    ("conv10", 96, 1, 48, False),
    ("conv13", 128, 3, 48, True),
    ("conv16", 128, 1, 64, False),
    ("conv19", 64, 3, 64, False),
    ("conv22", 64, 1, 32, False),
    ("conv25", 64, 3, 32, True),
]


# --- eqmask twins (standalone; candidates for models/layers.py) -----------

@jax.custom_vjp
def mfm_pool_2d_eqmask(x):
    return layers.mfm_pool_2d(x)


def _mp_fwd(x):
    y = layers.mfm_pool_2d(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x8 = x[:, : h2 * 2, : w2 * 2, :].reshape(b, h2, 2, w2, 2, 2, c // 2)
    dx = jnp.where(
        x8 == y[:, :, None, :, None, None, :],
        g[:, :, None, :, None, None, :],
        jnp.zeros((), g.dtype),
    ).reshape(b, h2 * 2, w2 * 2, c)
    if h2 * 2 < h or w2 * 2 < w:
        dx = jnp.pad(dx, ((0, 0), (0, h - h2 * 2), (0, w - w2 * 2), (0, 0)))
    return (dx.astype(x.dtype),)


mfm_pool_2d_eqmask.defvjp(_mp_fwd, _mp_bwd)


@jax.custom_vjp
def mfm_eqmask(x):
    return layers.max_feature_map(x)


def _mfm_fwd(x):
    a, b = jnp.split(x, 2, axis=-1)
    y = jnp.maximum(a, b)
    return y, (x, y)


def _mfm_bwd(res, g):
    x, y = res
    a, b = jnp.split(x, 2, axis=-1)
    da = jnp.where(a == y, g, jnp.zeros((), g.dtype))
    db = jnp.where(b == y, g, jnp.zeros((), g.dtype))
    return (jnp.concatenate([da, db], axis=-1).astype(x.dtype),)


mfm_eqmask.defvjp(_mfm_fwd, _mfm_bwd)


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


def make_params(rng):
    return {
        n: (
            jnp.asarray((rng.standard_normal((k, k, ci, f)) * 0.05)
                        .astype(np.float32)),
            jnp.asarray(rng.standard_normal((f,)).astype(np.float32) * 0.01),
        )
        for n, f, k, ci, _ in SPEC
    }


def conv(h, kern, bias, k):
    y = jax.lax.conv_general_dilated(
        h.astype(DT), kern.astype(DT), (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(DT)


def trunk(params, mfm_fn, pool_fn):
    def f(h):
        for n, _, k, _, pooled in SPEC:
            y = conv(h, *params[n], k)
            h = pool_fn(y) if pooled else mfm_fn(y)
        return h

    return f


def main():
    rng = np.random.default_rng(0)
    params = make_params(rng)
    results = {}

    # per-layer: the three pooled conv+mfm_pool pairs
    shapes = {"conv6": (202, 40, 32), "conv13": (101, 20, 48),
              "conv25": (50, 10, 32)}
    for name, (h, w, ci) in shapes.items():
        feat, k = next((f, kk) for n, f, kk, _, _ in SPEC if n == name)
        x = jnp.asarray(
            rng.standard_normal((BATCH, h, w, ci)).astype(np.float32)
        ).astype(DT)
        for tag, pool in (("base", layers.mfm_pool_2d),
                          ("eqmask", mfm_pool_2d_eqmask)):
            gfn = jax.grad(
                lambda a, pool=pool, name=name, k=k: pool(
                    conv(a, *params[name], k)
                ).astype(jnp.float32).sum()
            )
            ms = scan_time(gfn, x)
            results[f"{name}_{tag}_fwdbwd_ms"] = round(ms, 3)
            print(f"{name} {tag}: {ms:.3f} ms", flush=True)

    # full chain: base / eqmask pools only / eqmask pools+mfm
    x = jnp.asarray(
        rng.standard_normal((BATCH, 202, 40, 32)).astype(np.float32)
    ).astype(DT)
    chains = {
        "chain_base": trunk(params, layers.max_feature_map,
                            layers.mfm_pool_2d),
        "chain_eqpool": trunk(params, layers.max_feature_map,
                              mfm_pool_2d_eqmask),
        "chain_eqpool_eqmfm": trunk(params, mfm_eqmask,
                                    mfm_pool_2d_eqmask),
    }
    ref = np.asarray(jax.jit(chains["chain_base"])(x), np.float32)
    for tag, fn in chains.items():
        out = np.asarray(jax.jit(fn)(x), np.float32)
        gfn = jax.grad(lambda a, fn=fn: fn(a).astype(jnp.float32).sum())
        results[f"{tag}_fwdbwd_ms"] = round(scan_time(gfn, x), 3)
        results[f"{tag}_max_abs_diff"] = float(np.abs(out - ref).max())
        print(f"{tag}: {results[f'{tag}_fwdbwd_ms']} ms "
              f"diff {results[f'{tag}_max_abs_diff']}", flush=True)

    results["_meta"] = {"batch": BATCH, "dtype": "bf16"}
    out_path = Path(__file__).parent / "profile_mfmpool_r5.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
