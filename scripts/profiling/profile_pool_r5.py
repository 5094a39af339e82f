#!/usr/bin/env python
"""RawNet3 layer1 maxpool-5 backward variants (VERDICT r4 item 2).

Round 4 measured the reshape-max pool fwd+bwd at ~12.8 ms (batch 64,
(64, 6435, 1024) bf16) — ~3x its HBM traffic floor — and two
reformulations (lane-sliced max tree, Pallas streaming first-match)
failed to beat it. The VERDICT flags one variant as unmeasured:
recompute-style routing with NO tie normalization. jnp.max's VJP
splits the cotangent evenly across ties (lax _reduce_chooser rule),
which costs an extra tie-count reduction + divide pass over the
(B, T, C) tensor; for continuous activations ties are measure-zero, so
an eq-mask-only backward (dx = g * (x == y), torch-MaxPool-like
routing up to tie duplication) saves whole HBM passes if XLA doesn't
fuse the normalization away.

Variants at (B, 6435, 1024) bf16, B in {64, 256}:
  base    — jnp reshape + max (models/layers.py max_pool_1d)
  eqmask  — custom VJP: bwd = g * (x == y), no tie count
  eqmask_stopgrad — same but y recomputed in bwd from the residual x
    (drops the saved y; trades a small re-reduce for less residual IO)

Writes profile_pool_r5.json.
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

T, C, W = 6435, 1024, 5
INNER = 4
DT = jnp.bfloat16


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


def base_pool(x):
    b, l, c = x.shape
    l2 = l // W
    return x[:, : l2 * W, :].reshape(b, l2, W, c).max(axis=2)


@jax.custom_vjp
def eqmask_pool(x):
    return base_pool(x)


def _eq_fwd(x):
    y = base_pool(x)
    return y, (x, y)


def _eq_bwd(res, g):
    x, y = res
    b, l, c = x.shape
    l2 = l // W
    x2 = x[:, : l2 * W, :].reshape(b, l2, W, c)
    dx = jnp.where(x2 == y[:, :, None, :], g[:, :, None, :],
                   jnp.zeros((), x.dtype)).reshape(b, l2 * W, c)
    if l2 * W < l:
        dx = jnp.pad(dx, ((0, 0), (0, l - l2 * W), (0, 0)))
    return (dx,)


eqmask_pool.defvjp(_eq_fwd, _eq_bwd)


@jax.custom_vjp
def eqmask_recompute_pool(x):
    return base_pool(x)


def _eqr_fwd(x):
    return base_pool(x), (x,)


def _eqr_bwd(res, g):
    (x,) = res
    b, l, c = x.shape
    l2 = l // W
    x2 = x[:, : l2 * W, :].reshape(b, l2, W, c)
    y = x2.max(axis=2)
    dx = jnp.where(x2 == y[:, :, None, :], g[:, :, None, :],
                   jnp.zeros((), x.dtype)).reshape(b, l2 * W, c)
    if l2 * W < l:
        dx = jnp.pad(dx, ((0, 0), (0, l - l2 * W), (0, 0)))
    return (dx,)


eqmask_recompute_pool.defvjp(_eqr_fwd, _eqr_bwd)


def main():
    rng = np.random.default_rng(0)
    results = {}
    for batch in (64, 256):
        x = jnp.asarray(
            rng.standard_normal((batch, T, C)).astype(np.float32)
        ).astype(DT)

        for tag, pool in (("base", base_pool), ("eqmask", eqmask_pool),
                          ("eqmask_recompute", eqmask_recompute_pool)):
            fwdbwd = jax.grad(
                lambda a, pool=pool: pool(a).astype(jnp.float32).sum())
            key = f"b{batch}_{tag}"
            try:  # b256 holds several 3.4 GB tensors; OOM is a result,
                  # not a crash — keep the b64 rows either way
                results[f"{key}_fwd_ms"] = round(scan_time(pool, x), 3)
                results[f"{key}_fwdbwd_ms"] = round(scan_time(fwdbwd, x), 3)
            except Exception as e:  # noqa: BLE001
                results[f"{key}_error"] = str(e).split("\n")[0][:200]
                print(f"{key}: FAILED {results[f'{key}_error']}", flush=True)
                continue
            print(f"{key}: fwd {results[f'{key}_fwd_ms']} "
                  f"fwdbwd {results[f'{key}_fwdbwd_ms']}", flush=True)

        # traffic floor for the pair at this batch (read x, write y) +
        # (read x, read g, write dx), bf16
        n_in = batch * T * C
        n_out = batch * (T // W) * C
        floor_ms = 2 * (3 * n_in + 2 * n_out) / 819e9 * 1e3
        results[f"b{batch}_floor_ms"] = round(floor_ms, 3)
        print(f"b{batch} floor: {floor_ms:.3f} ms", flush=True)

    out = Path(__file__).parent / "profile_pool_r5.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
