"""Linear assignment (Hungarian matching) — on-device and exact host paths.

The reference matches DETR queries to targets with scipy's C++
`linear_sum_assignment` after a `.cpu()` sync inside the train step
(/root/reference/src/panst3r/criterion/matcher.py:188-190) — a host
round-trip per batch item per decoder layer.  TPU-native design:

- ``auction_lap`` — Jacobi auction algorithm (all unassigned columns bid in
  parallel each round — vectorizes the bidding onto the VPU), pure JAX
  (`lax.while_loop`), fully jittable: the matcher stays on device inside the
  compiled train step.  ε is fixed at `span·2e-3/(C+1)`, giving an
  optimality gap ≤ C·ε ≈ 0.2% of the cost span — far below any effect on
  DETR training.  A greedy completion pass guarantees a valid assignment
  even if the iteration cap is hit.
- ``exact_lap`` — exact solver on host (scipy's C++ Jonker-Volgenant), for
  eval and for testing the auction gap.

Convention: costs (n_rows, n_cols) with n_rows >= n_cols; every column gets
a distinct row (matches scipy's behavior for tall matrices).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_iters",))
def auction_lap(cost: jnp.ndarray, max_iters: int = 5000, span=None,
                col_valid=None):
    """Min-cost assignment of columns (bidders) to rows (objects).

    cost: (R, C) with R >= C.  Returns row_for_col: (C,) int32 — a distinct
    row index for each column.

    ``span`` optionally overrides the cost scale used to set the bidding
    increment ε.  Callers that pad invalid columns with a large sentinel
    MUST pass the span of the *real* costs — otherwise ε inflates by the
    sentinel magnitude and real assignments drift from optimal.

    ``col_valid`` (C,) bool optionally marks padding columns (False) whose
    assignment is arbitrary: they are excluded from the auction and placed
    on free rows by the completion pass.  Without it, sentinel-padded
    columns all share identical benefits and separate only by ε-sized
    price increments — hundreds of extra while_loop iterations per solve
    for an assignment nobody reads.
    """
    R, C = cost.shape
    assert R >= C, "auction_lap expects tall cost matrices (R >= C)"
    benefit = -cost.astype(jnp.float32).T        # (C, R): bidders × objects
    if span is None:
        span = jnp.max(jnp.abs(benefit))
    span = jnp.maximum(jnp.asarray(span, jnp.float32), 1e-6)
    eps = span * 2e-3 / (C + 1)
    if col_valid is None:
        col_valid = jnp.ones((C,), bool)

    def cond(state):
        _, assign, _, it = state
        return ((assign < 0) & col_valid).any() & (it < max_iters)

    def body(state):
        prices, assign, owner, it = state
        unassigned = (assign < 0) & col_valid     # (C,)
        values = benefit - prices[None]           # (C, R)
        top2, idx2 = jax.lax.top_k(values, 2)
        best_obj = idx2[:, 0]
        bid_amt = prices[best_obj] + top2[:, 0] - top2[:, 1] + eps

        # Per object: the highest bid among unassigned bidders wins.
        bid_amt_u = jnp.where(unassigned, bid_amt, -jnp.inf)
        obj_bids = jnp.full((R,), -jnp.inf).at[best_obj].max(bid_amt_u)
        bidder_ids = jnp.where(
            (obj_bids[best_obj] == bid_amt_u) & unassigned,
            jnp.arange(C), -1)
        winner = jnp.full((R,), -1, jnp.int32).at[best_obj].max(
            bidder_ids.astype(jnp.int32))
        contested = winner >= 0                   # (R,)

        # Previous owners of contested objects become unassigned.
        prev_owner_lost = jnp.zeros((C,), bool).at[
            jnp.where(owner >= 0, owner, C)].set(contested, mode="drop")
        assign = jnp.where(prev_owner_lost, -1, assign)
        # New winners take ownership.
        assign = assign.at[jnp.where(contested, winner, C)].set(
            jnp.arange(R, dtype=jnp.int32), mode="drop")
        owner = jnp.where(contested, winner, owner)
        prices = jnp.where(contested, obj_bids, prices)
        return prices, assign, owner, it + 1

    _, assign, owner, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((R,), jnp.float32),
                     jnp.full((C,), -1, jnp.int32),
                     jnp.full((R,), -1, jnp.int32), 0))

    # Greedy completion (no-op when the auction converged): assign leftover
    # bidders to their cheapest free row, one per round.
    def fix_cond(state):
        assign, _ = state
        return (assign < 0).any()

    def fix_body(state):
        assign, owner = state
        t = jnp.argmax(assign < 0)                # first unassigned bidder
        free = owner < 0
        masked = jnp.where(free, benefit[t], -jnp.inf)
        r = jnp.argmax(masked).astype(jnp.int32)
        return assign.at[t].set(r), owner.at[r].set(t)

    assign, _ = jax.lax.while_loop(fix_cond, fix_body, (assign, owner))
    return assign


def exact_lap(cost) -> tuple[np.ndarray, np.ndarray]:
    """Exact LAP on host — the native shortest-augmenting-path solver
    (native/lap.cpp, the framework's own C++ replacement for the
    reference's scipy dependency); scipy fallback without a toolchain."""
    from panst3r_tpu.native import lap_jv

    res = lap_jv(np.asarray(cost))
    if res is not None:
        return res
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(np.asarray(cost))
    return rows.astype(np.int64), cols.astype(np.int64)


def assignment_cost(cost, row_for_col) -> jnp.ndarray:
    C = cost.shape[1]
    return cost[row_for_col, jnp.arange(C)].sum()
