"""Scan-aware analytic FLOP counting from jaxprs.

XLA's ``compiled.cost_analysis()`` visits a ``while``/``scan`` body
ONCE regardless of trip count (HloCostAnalysis's documented loop
caveat), so iterative attack programs — PGD-10, CW-50, FAB-100,
Square's query loop — underreport their FLOPs 10-100x. Round-5
evidence: the r5 sweep's cost-analysis field recorded PGD-10 at
2.196e9 FLOPs/example vs FGSM's 2.186e9 — i.e. one body, not ten.

This module counts MXU FLOPs (``dot_general`` + ``conv_general_dilated``,
the only FLOP classes that matter against the matmul peak an MFU quotes)
directly from the traced jaxpr, multiplying ``scan`` bodies by their
static ``length``. Tracing needs no device and no compile, so the count
is cheap and exact for the compute-dominant ops; elementwise FLOPs are
deliberately excluded (standard MFU practice — the bf16 peak being
divided by is the MXU's).

Caveats, all flagged in the returned report rather than silently wrong:
* ``while_loop`` has no static trip count — its body is counted once
  and ``has_while`` is set (the attack library expresses its loops as
  masked fixed-shape scans precisely so this never fires there).
* ``cond`` branches are counted at the max across branches.
* ``pallas_call`` kernels are opaque to tracing — callers should
  disable fused-kernel fast paths for the counting trace (the XLA and
  Pallas forms compute the same math, e.g. ``ADAA_FUSED_LCNN=0``);
  ``has_pallas`` is set when one is encountered.

Used by scripts/bench_attacks.py for the per-row ``flops_per_example``
/ ``mfu_pct`` bench fields.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax

__all__ = ["count_jaxpr_flops", "count_flops"]

# higher-order primitives whose nested jaxprs are elementwise update
# rules (scatter's update computation is one add per element) — no MXU
# FLOPs inside, not worth flagging
_ELEMENTWISE_HOPS = frozenset({
    "scatter", "scatter-add", "scatter_add", "scatter-mul", "scatter-min",
    "scatter-max", "select_and_scatter_add", "reduce_window",
    "reduce_window_sum", "reduce_window_max", "reduce_sum", "reduce_max",
    "reduce_min", "reduce_and", "reduce_or", "argmax", "argmin",
    "reduce_precision", "custom_jvp_generic", "associative_scan",
    "cumsum", "cumlogsumexp", "cummax", "cummin", "cumprod",
})


def _aval_size(var) -> int:
    return math.prod(var.aval.shape) if var.aval.shape else 1


def _dot_general_flops(eqn) -> float:
    (lhs_contract, _), _ = eqn.params["dimension_numbers"]
    lhs_shape = eqn.invars[0].aval.shape
    k = math.prod(lhs_shape[d] for d in lhs_contract) or 1
    return 2.0 * _aval_size(eqn.outvars[0]) * k


def _conv_flops(eqn) -> float:
    kernel_shape = eqn.invars[1].aval.shape
    dnums = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1) or 1
    # reduction size per output element: (C_in / groups) * prod(k_spatial)
    cin = kernel_shape[dnums.rhs_spec[1]]  # already C_in/groups in the aval
    k_spatial = math.prod(kernel_shape[d] for d in dnums.rhs_spec[2:])
    del groups  # kernel aval's input-feature dim is per-group already
    return 2.0 * _aval_size(eqn.outvars[0]) * cin * k_spatial


def _sub_jaxprs(params: Dict[str, Any]):
    """Yield (closed_jaxpr, multiplier) for every nested jaxpr param."""
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in params:
            sub = params[key]
            yield sub, 1.0
    if "branches" in params:  # cond/switch: counted separately by caller
        return


def count_jaxpr_flops(
    jaxpr, report: Dict[str, Any], while_trip: int = 1
) -> float:
    """Total MXU FLOPs of one (open) jaxpr, recursing through scans.

    ``while_trip`` multiplies every ``while_loop`` body — JAX has no
    static trip count for them, so the caller supplies the loop's
    semantic bound (e.g. CW's ``steps``; an upper bound when the
    early-stop fires sooner). ``has_while`` is set so consumers know
    the multiplier was applied.
    """
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            body = eqn.params["jaxpr"]
            total += eqn.params["length"] * count_jaxpr_flops(
                body.jaxpr, report, while_trip
            )
        elif name == "while":
            report["has_while"] = True
            total += while_trip * (
                count_jaxpr_flops(
                    eqn.params["body_jaxpr"].jaxpr, report, while_trip
                )
                + count_jaxpr_flops(
                    eqn.params["cond_jaxpr"].jaxpr, report, while_trip
                )
            )
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(
                count_jaxpr_flops(b.jaxpr, report, while_trip)
                for b in branches
            )
        elif name == "pallas_call":
            report["has_pallas"] = True
        else:
            found = False
            for sub, mult in _sub_jaxprs(eqn.params):
                found = True
                inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                total += mult * count_jaxpr_flops(inner, report, while_trip)
            if (
                not found
                and name not in _ELEMENTWISE_HOPS
                and any("jaxpr" in k for k in eqn.params)
            ):
                # unknown higher-order primitive carrying jaxprs under a
                # param name this walker doesn't know — flag, don't guess
                if name not in report.setdefault("unknown_hops", []):
                    report["unknown_hops"].append(name)
    return total


def count_flops(fn, *example_args, while_trip: int = 1) -> Dict[str, Any]:
    """Trace ``fn(*example_args)`` (no device, no compile) and count.

    Returns ``{"flops": float, ...caveat flags}``. See
    :func:`count_jaxpr_flops` for ``while_trip``.
    """
    report: Dict[str, Any] = {}
    closed = jax.make_jaxpr(fn)(*example_args)
    report["flops"] = count_jaxpr_flops(closed.jaxpr, report, while_trip)
    return report
