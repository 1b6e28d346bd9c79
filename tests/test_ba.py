"""Pointmap-anchored bundle adjustment (engine/ba.py): synthetic
recovery, gauge fixing, distributed (shard_map + psum) parity, and the
scene-level refine wiring."""
import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core.mesh import MeshSpec, build_mesh
from panst3r_tpu.engine.ba import (bundle_adjust, bundle_adjust_sharded,
                                   refine_scene_ba, voxel_anchors)
from panst3r_tpu.engine.slam import se3_exp, se3_inv


def _synthetic(rng, K=5, A=64, obs_per_view=48, pose_noise=0.08,
               point_noise=0.0):
    X = rng.standard_normal((A, 3)).astype(np.float32) * 2.0
    poses_gt = np.asarray(se3_exp(jnp.asarray(
        rng.standard_normal((K, 6)) * 0.3, jnp.float32)))
    obs_view = np.repeat(np.arange(K, dtype=np.int32), obs_per_view)
    obs_anchor = rng.integers(0, A, K * obs_per_view).astype(np.int32)
    Tin = np.asarray(se3_inv(jnp.asarray(poses_gt)))
    Xo = X[obs_anchor]
    x_local = (np.einsum("oij,oj->oi", Tin[obs_view, :3, :3], Xo)
               + Tin[obs_view, :3, 3]).astype(np.float32)
    x_local += rng.standard_normal(x_local.shape).astype(np.float32) \
        * point_noise
    w = np.ones(len(obs_view), np.float32)

    noise = rng.standard_normal((K, 6)).astype(np.float32) * pose_noise
    noise[0] = 0.0                                    # keep the gauge
    poses0 = np.asarray(se3_exp(jnp.asarray(noise))) @ poses_gt
    anchors0 = X + rng.standard_normal(X.shape).astype(np.float32) * 0.02
    return (poses_gt, X, poses0, anchors0, obs_view, obs_anchor,
            x_local, w)


def _pose_err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def test_ba_recovers_poses_and_gauge(rng):
    (poses_gt, X, poses0, anchors0, ov, oa, xl, w) = _synthetic(rng)
    err0 = _pose_err(poses0, poses_gt)
    poses, anchors, costs = bundle_adjust(
        jnp.asarray(poses0), jnp.asarray(anchors0), jnp.asarray(ov),
        jnp.asarray(oa), jnp.asarray(xl), jnp.asarray(w), iters=10)
    assert float(costs[-1]) < 1e-4 * float(costs[0]), np.asarray(costs)
    assert _pose_err(poses, poses_gt) < 0.02 * err0
    # gauge: pose 0 held fixed exactly
    np.testing.assert_allclose(np.asarray(poses)[0], poses0[0], atol=1e-5)


def test_ba_zero_weight_padding_is_inert(rng):
    (poses_gt, X, poses0, anchors0, ov, oa, xl, w) = _synthetic(rng)
    poses_a, _, costs_a = bundle_adjust(
        jnp.asarray(poses0), jnp.asarray(anchors0), jnp.asarray(ov),
        jnp.asarray(oa), jnp.asarray(xl), jnp.asarray(w), iters=4)
    pad = 13
    ov_p = np.concatenate([ov, np.zeros(pad, np.int32)])
    oa_p = np.concatenate([oa, np.zeros(pad, np.int32)])
    xl_p = np.concatenate([xl, np.ones((pad, 3), np.float32) * 7])
    w_p = np.concatenate([w, np.zeros(pad, np.float32)])
    poses_b, _, costs_b = bundle_adjust(
        jnp.asarray(poses0), jnp.asarray(anchors0), jnp.asarray(ov_p),
        jnp.asarray(oa_p), jnp.asarray(xl_p), jnp.asarray(w_p), iters=4)
    np.testing.assert_allclose(np.asarray(poses_a), np.asarray(poses_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(costs_a), np.asarray(costs_b),
                               rtol=1e-5)


def test_ba_sharded_matches_single(rng):
    (poses_gt, X, poses0, anchors0, ov, oa, xl, w) = _synthetic(
        rng, K=4, A=32, obs_per_view=64)
    mesh = build_mesh(MeshSpec(data=8, mem=1))
    O = len(ov)
    pad = (-O) % 8
    ov = np.concatenate([ov, np.zeros(pad, np.int32)])
    oa = np.concatenate([oa, np.zeros(pad, np.int32)])
    xl = np.concatenate([xl, np.zeros((pad, 3), np.float32)])
    w_p = np.concatenate([w, np.zeros(pad, np.float32)])

    ref_poses, ref_anchors, ref_costs = bundle_adjust(
        jnp.asarray(poses0), jnp.asarray(anchors0), jnp.asarray(ov),
        jnp.asarray(oa), jnp.asarray(xl), jnp.asarray(w_p), iters=6)
    with mesh:
        sh_poses, sh_anchors, sh_costs = bundle_adjust_sharded(
            jnp.asarray(poses0), jnp.asarray(anchors0), jnp.asarray(ov),
            jnp.asarray(oa), jnp.asarray(xl), jnp.asarray(w_p), mesh,
            iters=6)
    np.testing.assert_allclose(np.asarray(sh_poses), np.asarray(ref_poses),
                               rtol=1e-4, atol=1e-5)
    # identical math; costs at convergence differ only by f32
    # reduction-order noise → absolute tolerance scaled to the initial cost
    np.testing.assert_allclose(np.asarray(sh_costs), np.asarray(ref_costs),
                               rtol=1e-3,
                               atol=1e-8 * float(ref_costs[0]))


def test_voxel_anchors_merge_and_refine_scene(rng):
    # Two views of the same quantized surface: the voxel merge must couple
    # them, and refine_scene_ba must reduce pose error of a perturbed view.
    K, H, W = 3, 16, 24
    # voxel-interior offsets: exact-multiple coords would straddle floor()
    # boundaries under float error and defeat the merge
    X = (rng.integers(0, 20, (H * W, 3)) * 0.25 + 0.1).astype(np.float32)
    poses_gt = np.asarray(se3_exp(jnp.asarray(
        rng.standard_normal((K, 6)) * 0.2, jnp.float32)))
    Tin = np.asarray(se3_inv(jnp.asarray(poses_gt)))
    pts_local = np.einsum("kij,nj->kni", Tin[:, :3, :3], X) + \
        Tin[:, None, :3, 3]
    noise = rng.standard_normal((K, 6)).astype(np.float32) * 0.05
    noise[0] = 0.0
    poses0 = np.asarray(se3_exp(jnp.asarray(noise))) @ poses_gt
    # global maps are cross-view CONSISTENT (MUSt3R predicts one global
    # frame) while the recovered poses carry the noise — the realistic
    # input to refinement
    pts_global = np.einsum("kij,knj->kni", poses_gt[:, :3, :3], pts_local) \
        + poses_gt[:, None, :3, 3]
    pm = {"pts3d": pts_global.reshape(K, H, W, 3),
          "pts3d_local": pts_local.reshape(K, H, W, 3),
          "conf": np.full((K, H, W), 2.0, np.float32)}

    anchors, ov, oa, valid = voxel_anchors(
        pts_global.astype(np.float32), pm["conf"].reshape(K, -1), 0.25)
    assert anchors.shape[0] < K * H * W / 2      # real cross-view merging

    poses, costs = refine_scene_ba(pm, poses0, stride=1, voxel=0.25,
                                   iters=8)
    err0 = _pose_err(poses0, poses_gt)
    err1 = _pose_err(poses, poses_gt)
    assert float(costs[-1]) < float(costs[0])
    assert err1 < 0.5 * err0, (err0, err1)
