"""Tests: auction LAP vs scipy, point_sample vs torch grid_sample."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from panst3r_tpu.ops.lap import assignment_cost, auction_lap, exact_lap
from panst3r_tpu.ops.sampling import point_sample, uncertain_point_coords


@pytest.mark.parametrize("R,C", [(10, 10), (200, 7), (50, 30), (5, 1)])
def test_auction_matches_scipy_cost(rng, R, C):
    for trial in range(3):
        cost = rng.standard_normal((R, C)).astype(np.float32) * 3
        assign = np.asarray(auction_lap(jnp.asarray(cost)))
        # distinct rows
        assert len(set(assign.tolist())) == C
        ours = float(assignment_cost(jnp.asarray(cost), jnp.asarray(assign)))
        rows, cols = exact_lap(cost)
        optimal = cost[rows, cols].sum()
        assert ours <= optimal + 1e-2 * max(1.0, abs(optimal)), \
            (ours, optimal)


def test_auction_vmap(rng):
    costs = rng.standard_normal((4, 20, 6)).astype(np.float32)
    assigns = jax.vmap(auction_lap)(jnp.asarray(costs))
    for b in range(4):
        a = np.asarray(assigns[b])
        assert len(set(a.tolist())) == 6
        ours = costs[b][a, np.arange(6)].sum()
        rows, cols = exact_lap(costs[b])
        assert ours <= costs[b][rows, cols].sum() + 0.05


def test_point_sample_matches_grid_sample(rng):
    N, H, W, P = 3, 16, 24, 50
    feats = rng.standard_normal((N, H, W)).astype(np.float32)
    pts = rng.random((N, P, 2)).astype(np.float32)  # (x, y) in [0,1]

    ours = np.asarray(point_sample(jnp.asarray(feats), jnp.asarray(pts)))

    t_in = torch.from_numpy(feats)[:, None]
    t_pts = torch.from_numpy(pts)[:, :, None]       # (N, P, 1, 2)
    theirs = F.grid_sample(t_in, 2.0 * t_pts - 1.0, align_corners=False)
    theirs = theirs[:, 0, :, 0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_point_sample_shared_bit_exact(rng):
    """point_sample_shared (transposed row-gather, the TPU-fast matcher
    form) must equal point_sample with tiled per-row coords EXACTLY —
    same four taps, same weights, same summation order.  Includes
    out-of-bounds points (zero-padding semantics)."""
    from panst3r_tpu.ops.sampling import point_sample_shared

    K, H, W, P = 7, 16, 24, 64
    feats = rng.standard_normal((K, H, W)).astype(np.float32)
    pts = (rng.random((P, 2)).astype(np.float32) * 1.2 - 0.1)  # some OOB

    shared = np.asarray(point_sample_shared(jnp.asarray(feats),
                                            jnp.asarray(pts)))
    tiled = np.asarray(point_sample(
        jnp.asarray(feats), jnp.tile(jnp.asarray(pts)[None], (K, 1, 1))))
    np.testing.assert_array_equal(shared, tiled)


def test_uncertain_point_coords_shapes(rng):
    logits = jnp.asarray(rng.standard_normal((4, 8, 12)), jnp.float32)
    pts = uncertain_point_coords(jax.random.PRNGKey(0), logits, 32, 3.0, 0.75)
    assert pts.shape == (4, 32, 2)
    assert (np.asarray(pts) >= 0).all() and (np.asarray(pts) <= 1).all()

    # oversample=1, importance=1 (the reference training config) → all
    # points kept, reordered by uncertainty.
    pts2 = uncertain_point_coords(jax.random.PRNGKey(1), logits, 32, 1.0, 1.0)
    assert pts2.shape == (4, 32, 2)


def test_auction_padded_matches_scipy(rng):
    """Regression: with _BIG-padded invalid columns, ε must be scaled by
    the REAL cost span (passed via span=) — previously the sentinel
    inflated ε ~1e5× and real assignments drifted from optimal."""
    BIG = 1e6
    for trial in range(5):
        Q, T, T_valid = 40, 12, 7
        cost = rng.standard_normal((Q, T)).astype(np.float32) * 2
        valid = np.arange(T) < T_valid
        padded = np.where(valid[None], cost, BIG).astype(np.float32)

        span = np.abs(cost[:, valid]).max()
        assign = np.asarray(auction_lap(jnp.asarray(padded), span=span))
        assert len(set(assign.tolist())) == T

        rows, cols = exact_lap(cost[:, :T_valid])
        optimal = cost[rows, cols].sum()
        ours = cost[assign[:T_valid], np.arange(T_valid)].sum()
        # ε-optimality gap bounded by C·ε ≈ 0.2% of the REAL span.
        assert ours <= optimal + 0.01 * max(1.0, span), (ours, optimal)


def test_auction_col_valid_fast_and_exact(rng):
    """col_valid excludes padding columns from bidding: still scipy-exact
    on the real columns, distinct rows everywhere, and convergence no
    longer needs the ~700 ε-step rounds the identical sentinel benefits
    would take (max_iters=16 suffices — regression guard for the train-step
    time this cost)."""
    BIG = 1e6
    for trial in range(5):
        Q, T, T_valid = 200, 16, 7
        cost = rng.standard_normal((Q, T)).astype(np.float32) * 3
        valid = np.arange(T) < T_valid
        padded = np.where(valid[None], cost, BIG).astype(np.float32)
        span = np.abs(cost[:, valid]).max()

        assign = np.asarray(auction_lap(jnp.asarray(padded), max_iters=16,
                                        span=span,
                                        col_valid=jnp.asarray(valid)))
        assert len(set(assign.tolist())) == T
        rows, cols = exact_lap(cost[:, :T_valid])
        optimal = cost[rows, cols].sum()
        ours = cost[assign[:T_valid], np.arange(T_valid)].sum()
        assert ours <= optimal + 0.01 * max(1.0, span), (ours, optimal)
