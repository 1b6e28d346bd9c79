"""Analytic FLOP counting from jaxprs (MFU reporting).

XLA's HLO cost model (`lowered.compile().cost_analysis()`) does not
reliably scale `while`-loop body costs by the trip count, so a program
whose towers run under `lax.scan` (ours: nn.scan over ViT blocks) is
undercounted by ~the tower depth.  This walker traverses the closed
jaxpr instead: matmul/conv FLOPs are computed exactly from shapes, scan
bodies multiply by their static `length`, and Pallas kernels contribute
the `cost_estimate` they were built with.

Counts multiply-add as 2 FLOPs.  Elementwise/reduction FLOPs are ignored
(<2% of any program we report MFU for — matmul machines).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    (contract_l, _), (batch_l, _) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    batch = math.prod(lhs[d] for d in batch_l)
    contract = math.prod(lhs[d] for d in contract_l)
    lhs_free = math.prod(
        d for i, d in enumerate(lhs) if i not in contract_l + batch_l)
    rhs_rest = math.prod(rhs) // max(1, batch * contract)
    return 2.0 * batch * contract * lhs_free * rhs_rest


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    # rhs: (out_chan, in_chan/groups, *window) in dn.rhs_spec order; the
    # per-output-pixel contraction is in_chan/groups × window.
    rhs_spec = dn.rhs_spec
    in_chan = rhs[rhs_spec[1]]
    window = math.prod(rhs[d] for d in rhs_spec[2:])
    return 2.0 * math.prod(out) * in_chan * window


def jaxpr_matmul_flops(jaxpr) -> float:
    """Total dot/conv FLOPs of a (closed) jaxpr, scan-aware."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * jaxpr_matmul_flops(
                eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # Trip count unknown statically; count the body once (our
            # programs use scan for static loops).
            total += jaxpr_matmul_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(jaxpr_matmul_flops(b.jaxpr)
                         for b in eqn.params["branches"])
        elif name == "pallas_call":
            ce = eqn.params.get("cost_estimate")
            if ce is not None and getattr(ce, "flops", None):
                total += float(ce.flops)
        else:
            # Generic containers: pjit, remat/checkpoint, custom_{vjp,jvp},
            # closed_call, shard_map, ... — recurse into any held jaxpr.
            inner = (eqn.params.get("jaxpr")
                     or eqn.params.get("call_jaxpr")
                     or eqn.params.get("fun_jaxpr"))
            if inner is not None:
                total += jaxpr_matmul_flops(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner)
    return total


def fn_matmul_flops(fn, *args: Any, **kwargs: Any) -> float:
    """Matmul/conv FLOPs of `fn(*args, **kwargs)` (args may be
    ShapeDtypeStructs)."""
    import functools

    if kwargs:
        fn = functools.partial(fn, **kwargs)
    jaxpr = jax.make_jaxpr(fn)(*args)
    return jaxpr_matmul_flops(jaxpr.jaxpr)
