"""Pallas non-overlapping 1D max-pool with a first-match backward.

RawNet3's Bottle2neck blocks pool their (B, T, 1024) activations by 5
and 3 (reference: src/models/rawnet3.py:216,270 ``nn.MaxPool1d``). The
XLA formulation this codebase uses elsewhere — ``(B, T/w, w, C)``
reshape + max — is the right call for small tensors, but at RawNet3
layer1's (64, 6435, 1024) it measures 10.5 ms fwd+bwd for an op whose
HBM traffic floor is ~4 ms (scripts/profiling/profile_rawnet_r4.py:
``pool5_fwdbwd_ms``): the width-w sublane dim forces relayout copies,
and the autodiff backward re-materializes full-size compare/select
intermediates. A lane-sliced max tree is WORSE (15.8 ms — its backward
materializes a partial-grad pyramid; ``pool5_lane_fwdbwd_ms``).

This kernel streams tiles once per direction:

* forward — input viewed as (R, w*C) (a free reshape: the w window
  elements of one output row are contiguous), in-VMEM max over the w
  C-aligned lane slices.
* backward — recomputes the tile max and routes the cotangent to the
  FIRST maximal window slot (torch MaxPool1d's argmax semantics; the
  XLA reshape-max splits exact ties evenly instead — both are valid
  subgradients of the same measure-zero event, same contract as
  ops/pallas_layer0).

dL/dW does not exist (no parameters). Used on the bf16 TPU fast path
only; the f32 parity path keeps the reshape-max (models/layers.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


# Mosaic's scoped-VMEM ceiling is 16 MB and it DOUBLE-BUFFERS every
# in/out block DMA: the first wiring OOMed the backward at rows=416,
# w*C=5120 (2*(in+g+dx) blocks = 17.88 M > 16 M). Budget half the
# ceiling and derive the row tile per direction from its block bytes.
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_rows(r: int, row_bytes: int, sublane: int = 16) -> int:
    """Largest divisor of r that is a multiple of ``sublane`` whose
    double-buffered blocks fit the VMEM budget (``row_bytes`` counts
    both buffers of every block a row touches)."""
    cap = min(_VMEM_BUDGET // max(row_bytes, 1), 512)
    best = 0
    for cand in range(sublane, cap + 1, sublane):
        if r % cand == 0:
            best = cand
    return best


def _row_bytes(w: int, c: int, itemsize: int, backward: bool) -> int:
    blocks = (w * c + c) + (w * c if backward else 0)
    return 2 * blocks * itemsize  # x2: mosaic double-buffers block DMAs


# NOTE: compares/maxes run in f32 in-register — mosaic on v5e rejects
# bf16 vector cmpf ("Target does not support this comparison"); the
# upcast is lossless for bf16 values and HBM traffic stays bf16.


def _fwd_kernel(x_ref, o_ref, *, w: int, c: int):
    m = x_ref[:, :c].astype(jnp.float32)
    for i in range(1, w):
        m = jnp.maximum(m, x_ref[:, i * c:(i + 1) * c].astype(jnp.float32))
    o_ref[...] = m.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, w: int, c: int):
    m = x_ref[:, :c].astype(jnp.float32)
    for i in range(1, w):
        m = jnp.maximum(m, x_ref[:, i * c:(i + 1) * c].astype(jnp.float32))
    g = g_ref[...]
    taken = jnp.zeros(m.shape, jnp.bool_)
    zero = jnp.zeros(g.shape, g.dtype)
    for i in range(w):
        xi = x_ref[:, i * c:(i + 1) * c].astype(jnp.float32)
        is_max = xi == m
        hit = jnp.logical_and(is_max, jnp.logical_not(taken))
        dx_ref[:, i * c:(i + 1) * c] = jnp.where(hit, g, zero)
        taken = jnp.logical_or(taken, is_max)


@functools.lru_cache(maxsize=16)
def _pool_fn(w: int, c: int, rows_f: int, rows_b: int, interpret: bool):
    fwd_k = functools.partial(_fwd_kernel, w=w, c=c)
    bwd_k = functools.partial(_bwd_kernel, w=w, c=c)

    @jax.custom_vjp
    def pool(x2):  # (R, w*C) -> (R, C)
        r = x2.shape[0]
        return pl.pallas_call(
            fwd_k,
            grid=(r // rows_f,),
            in_specs=[pl.BlockSpec((rows_f, w * c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows_f, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
            interpret=interpret,
        )(x2)

    def fwd(x2):
        return pool(x2), x2

    def bwd(x2, g):
        r = x2.shape[0]
        dx = pl.pallas_call(
            bwd_k,
            grid=(r // rows_b,),
            in_specs=[
                pl.BlockSpec((rows_b, w * c), lambda i: (i, 0)),
                pl.BlockSpec((rows_b, c), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((rows_b, w * c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r, w * c), g.dtype),
            interpret=interpret,
        )(x2, g)
        return (dx,)

    pool.defvjp(fwd, bwd)
    return pool


def supported(x: jax.Array, window: int) -> bool:
    """Shapes/dtype this kernel handles: bf16 (B, T, C) with C a lane
    multiple and a row count divisible by a 16-multiple tile."""
    if x.ndim != 3 or x.dtype != jnp.bfloat16:
        return False
    b, l, c = x.shape
    if c % 128 != 0:
        return False
    r = b * (l // window)
    it = x.dtype.itemsize
    return (_pick_rows(r, _row_bytes(window, c, it, backward=False)) > 0
            and _pick_rows(r, _row_bytes(window, c, it, backward=True)) > 0)


def max_pool_1d(x: jax.Array, window: int,
                interpret: bool = False) -> jax.Array:
    """Non-overlapping 1D max pool over axis 1 of (B, T, C)."""
    b, l, c = x.shape
    l2 = l // window
    x2 = x[:, : l2 * window, :].reshape(b * l2, window * c)
    it = x.dtype.itemsize
    rows_f = _pick_rows(b * l2, _row_bytes(window, c, it, backward=False))
    rows_b = _pick_rows(b * l2, _row_bytes(window, c, it, backward=True))
    if rows_f <= 0 or rows_b <= 0:
        raise ValueError(
            f"max_pool_1d: shape {x.shape} window={window} does not tile "
            "into VMEM — gate calls on pallas_pool.supported(x, window)")
    out = _pool_fn(window, c, rows_f, rows_b, interpret)(x2)
    return out.reshape(b, l2, c)
