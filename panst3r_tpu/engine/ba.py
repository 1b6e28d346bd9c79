"""Pointmap-anchored bundle adjustment with Schur-complement reduction.

The global refinement backend of the north star (BASELINE.json): jointly
refine keyframe poses T_i ∈ SE(3) and a sparse set of 3D anchors X_a
against the network's per-view LOCAL pointmaps —

    r_o = w_o · (T_{v(o)} · x_o − X_{a(o)})            (one obs o per
                                                        sampled pixel)

The reference has no BA at all (poses come from per-view Weiszfeld +
Procrustes only, /root/reference/tools/demo_panst3r.py:258-277); the
pose-graph GN in engine/slam.py couples poses pairwise.  BA couples them
through shared structure: anchors are voxel-merged fused global points,
so views observing the same surface pull on the same variables — the
"map blocks" of the north star's partitioning story.

TPU structure (classic sparse-BA Schur, expressed densely per anchor):

- camera-camera Hessian is BLOCK-DIAGONAL (each obs touches one pose);
  all cross-view coupling flows through the anchors, so eliminating the
  (3×3-diagonal, here scalar·I₃) anchor blocks gives the dense reduced
  camera system  S = H_cc − U W⁻¹ Uᵀ  of size (6K, 6K), K = #keyframes.
- every accumulation (H_cc, b_c, U, W, b_a) is a segment-sum over
  observations → shard observations across devices and `psum` the
  partials (`bundle_adjust_sharded`, shard_map over the mesh axis); the
  tiny reduced solve is replicated.  This is the "distributed BA via
  Schur-complement reduction on jax.lax collectives" of SURVEY.md §5.8.

Left-perturbation convention shared with engine/slam.py: T ← exp(ξ)·T,
d(T·x)/dξ = [I | −hat(T·x)].
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.engine.slam import hat, se3_exp

__all__ = ["bundle_adjust", "bundle_adjust_sharded", "voxel_anchors",
           "refine_scene_ba"]


def _gn_partials(poses, anchors, obs_view, obs_anchor, x_local, w,
                 K: int, A: int):
    """Per-shard GN accumulations (pure segment-sums over observations).

    Returns (Hc (K,6,6), bc (K,6), U (K*A,6,3) flat, s (A,), ba (A,3),
    cost ()) — all linear in the observation set, so cross-device psum
    of the outputs equals computing on the concatenated observations.
    """
    R = poses[obs_view, :3, :3]                       # (O, 3, 3)
    t = poses[obs_view, :3, 3]
    y = (R @ x_local[..., None])[..., 0] + t          # (O, 3) T·x
    r = (y - anchors[obs_anchor]) * w[:, None]        # (O, 3)

    # J_pose = w·[I | −hat(y)] (O, 3, 6); J_point = −w·I₃.
    Jp = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (y.shape[0], 3, 3)), -hat(y)],
        axis=-1) * w[:, None, None]
    JpT = jnp.swapaxes(Jp, -1, -2)                    # (O, 6, 3)

    Hc = jax.ops.segment_sum(JpT @ Jp, obs_view, num_segments=K)
    bc = jax.ops.segment_sum((JpT @ r[..., None])[..., 0], obs_view,
                             num_segments=K)
    # U_{v,a} = Σ_o Jpᵀ·J_point = −w·Jpᵀ   (6, 3) per (view, anchor)
    seg = obs_view * A + obs_anchor
    U = jax.ops.segment_sum(-w[:, None, None] * JpT, seg,
                            num_segments=K * A)       # (K*A, 6, 3)
    s = jax.ops.segment_sum(w * w, obs_anchor, num_segments=A)  # H_aa=s·I₃
    ba = jax.ops.segment_sum(-w[:, None] * r, obs_anchor, num_segments=A)
    cost = jnp.sum(r * r)
    return Hc, bc, U, s, ba, cost


def _gn_update(poses, anchors, Hc, bc, U, s, ba, damping: float):
    """Schur-reduced GN update from (possibly psum-reduced) partials."""
    K = poses.shape[0]
    A = anchors.shape[0]
    U = U.reshape(K, A, 6, 3)
    winv = 1.0 / (s + damping)                        # (A,)

    # S = blockdiag(Hc) − Σ_a winv_a · U_ia U_jaᵀ ; b = bc − Σ_a winv·U·ba
    S = -jnp.einsum("a,iaxk,jayk->ixjy", winv, U, U)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hc)
    br = bc - jnp.einsum("a,iaxk,ak->ix", winv, U, ba)

    # Gauge: pin pose 0.
    S = S.at[0].set(0.0).at[:, :, 0].set(0.0)
    S = S.at[0, :, 0].set(jnp.eye(6))
    br = br.at[0].set(0.0)

    Sf = S.reshape(6 * K, 6 * K) + damping * jnp.eye(6 * K)
    dc = -jnp.linalg.solve(Sf, br.reshape(-1)).reshape(K, 6)

    # Back-substitute anchors: δa = winv · (−ba − Σ_i U_iaᵀ δc_i)
    da = -winv[:, None] * (ba + jnp.einsum("iaxk,ix->ak", U, dc))
    # note: b here is Jᵀr (gradient); δ = −H⁻¹b throughout.
    return se3_exp(dc) @ poses, anchors + da


@partial(jax.jit, static_argnames=("iters",))
def bundle_adjust(poses: jnp.ndarray, anchors: jnp.ndarray,
                  obs_view: jnp.ndarray, obs_anchor: jnp.ndarray,
                  x_local: jnp.ndarray, weights: jnp.ndarray,
                  iters: int = 8, damping: float = 1e-4):
    """Single-device BA.  poses (K,4,4) cam2world; anchors (A,3);
    obs_view/obs_anchor (O,) int32; x_local (O,3) per-view local points;
    weights (O,) ≥ 0 (zero = padding).  Returns (poses, anchors, costs)."""
    K, A = poses.shape[0], anchors.shape[0]

    def body(carry, _):
        poses, anchors = carry
        parts = _gn_partials(poses, anchors, obs_view, obs_anchor,
                             x_local, weights, K, A)
        poses, anchors = _gn_update(poses, anchors, *parts[:5], damping)
        return (poses, anchors), parts[5]

    (poses, anchors), costs = jax.lax.scan(body, (poses, anchors), None,
                                           length=iters)
    return poses, anchors, costs


_SHARDED_BA_CACHE: dict = {}


def bundle_adjust_sharded(poses, anchors, obs_view, obs_anchor, x_local,
                          weights, mesh, axis: str = "data",
                          iters: int = 8, damping: float = 1e-4):
    """Distributed BA: observations sharded over ``axis``; every GN
    accumulation psum-reduced across the mesh; replicated Schur solve.
    Bit-path-identical math to `bundle_adjust` on the gathered set (up
    to f32 reduction order).  Pad O to a multiple of the axis size with
    zero-weight observations."""
    from jax.sharding import PartitionSpec as P

    K, A = poses.shape[0], anchors.shape[0]
    n = mesh.shape[axis]
    O = obs_view.shape[0]
    assert O % n == 0, f"pad observations ({O}) to a multiple of {n}"

    # jit cache: a fresh closure per call would recompile every time
    cache_key = (id(mesh), axis, K, A, O, iters, float(damping))
    if cache_key in _SHARDED_BA_CACHE:
        fn = _SHARDED_BA_CACHE[cache_key]
    else:
        def shard_fn(poses, anchors, ov, oa, xl, w):
            def body(carry, _):
                poses, anchors = carry
                Hc, bc, U, s, ba, cost = _gn_partials(
                    poses, anchors, ov, oa, xl, w, K, A)
                Hc, bc, U, s, ba, cost = jax.lax.psum(
                    (Hc, bc, U, s, ba, cost), axis)
                poses, anchors = _gn_update(poses, anchors, Hc, bc, U, s,
                                            ba, damping)
                return (poses, anchors), cost

            (poses, anchors), costs = jax.lax.scan(body, (poses, anchors),
                                                   None, length=iters)
            return poses, anchors, costs

        fn = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P())))
        _SHARDED_BA_CACHE[cache_key] = fn
    return fn(poses, anchors, obs_view, obs_anchor, x_local, weights)


def voxel_anchors(pts_global: np.ndarray, conf: np.ndarray,
                  voxel: float, max_anchors: Optional[int] = None):
    """Build shared anchors by voxel-merging fused global points.

    pts_global (K, N, 3) per-view global pointmap samples; conf (K, N).
    Points in the same voxel become ONE anchor (initialized at their
    conf-weighted mean) — the cross-view coupling.  Returns
    (anchors (A,3) f32, obs_view (O,), obs_anchor (O,), valid (K·N,)
    bool) as numpy; index the caller's flattened per-obs arrays
    (x_local, weights) with ``valid`` to align them.
    """
    K, N = conf.shape
    flat = pts_global.reshape(-1, 3)
    keys = np.floor(flat / voxel).astype(np.int64)
    _, anchor_of = np.unique(keys, axis=0, return_inverse=True)
    conf_ok = conf.reshape(-1) > 0
    # rank voxels by VALID observation count only — conf-0 (masked)
    # points must not buy a voxel an anchor slot
    counts = np.bincount(anchor_of[conf_ok],
                         minlength=int(anchor_of.max()) + 1)
    if max_anchors is not None and counts.size > max_anchors:
        keep = np.argsort(-counts)[:max_anchors]
        remap = np.full(counts.size, -1, np.int64)
        remap[keep] = np.arange(keep.size)
        anchor_of = remap[anchor_of]
    valid = (anchor_of >= 0) & conf_ok
    A = int(anchor_of[valid].max()) + 1 if valid.any() else 0
    w = np.where(valid, conf.reshape(-1), 0.0).astype(np.float64)
    sums = np.zeros((A, 3))
    wsum = np.zeros(A)
    np.add.at(sums, anchor_of[valid], flat[valid] * w[valid, None])
    np.add.at(wsum, anchor_of[valid], w[valid])
    anchors = (sums / np.maximum(wsum, 1e-12)[:, None]).astype(np.float32)
    obs_view = np.repeat(np.arange(K, dtype=np.int32), N)
    return (anchors, obs_view[valid], anchor_of[valid].astype(np.int32),
            valid)


def refine_scene_ba(pointmaps: dict, poses_init: np.ndarray,
                    stride: int = 8, voxel: float = 0.05,
                    iters: int = 8, damping: float = 1e-4,
                    conf_threshold: float = 1.5,
                    max_anchors: Optional[int] = 8192):
    """BA refinement of recovered keyframe poses against the network's
    pointmaps (the BASELINE config-4 'global BA refinement' step).

    pointmaps: {'pts3d' (K,H,W,3) global, 'pts3d_local' (K,H,W,3),
    'conf' (K,H,W)} (InferenceEngine.run postprocess output);
    poses_init (K,4,4) cam2world (e.g. engine/pose.py recovery).
    ``conf_threshold``: postprocess conf = 1 + exp(raw) is strictly > 1,
    so thresholds must be > 1 to filter anything (default 1.5 drops
    low-confidence pixels).  Returns (poses (K,4,4), costs (iters,)).
    """
    pts_g = np.asarray(pointmaps["pts3d"])[:, ::stride, ::stride]
    pts_l = np.asarray(pointmaps["pts3d_local"])[:, ::stride, ::stride]
    conf = np.asarray(pointmaps["conf"])[:, ::stride, ::stride]
    K = pts_g.shape[0]
    pts_g = pts_g.reshape(K, -1, 3)
    pts_l = pts_l.reshape(K, -1, 3)
    conf = conf.reshape(K, -1)
    conf = np.where(conf >= conf_threshold, conf, 0.0)

    anchors, obs_view, obs_anchor, valid = voxel_anchors(
        pts_g, conf, voxel, max_anchors)
    x_local = pts_l.reshape(-1, 3)[valid]
    w = np.sqrt(conf.reshape(-1))[valid].astype(np.float32)

    poses, _, costs = bundle_adjust(
        jnp.asarray(poses_init), jnp.asarray(anchors),
        jnp.asarray(obs_view), jnp.asarray(obs_anchor),
        jnp.asarray(x_local), jnp.asarray(w), iters=iters, damping=damping)
    return np.asarray(poses), np.asarray(costs)
