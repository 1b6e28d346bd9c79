"""SLAM backend tests: SE(3) math, pose-graph GN, incremental frontend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.engine.slam import (IncrementalFrontend, se3_exp, se3_inv,
                                     se3_log, measure_relative_poses,
                                     pose_graph_gauss_newton,
                                     refine_scene_poses)


def _random_se3(rng, scale_rot=0.5, scale_t=1.0):
    xi = np.concatenate([rng.standard_normal(3) * scale_t,
                         rng.standard_normal(3) * scale_rot])
    return np.asarray(se3_exp(jnp.asarray(xi)))


def test_se3_exp_log_roundtrip(rng):
    for _ in range(5):
        xi = rng.standard_normal(6) * 0.8
        T = se3_exp(jnp.asarray(xi))
        xi2 = se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-5)


def test_se3_inv():
    rng = np.random.default_rng(0)
    T = _random_se3(rng)
    np.testing.assert_allclose(np.asarray(se3_inv(jnp.asarray(T))) @ T,
                               np.eye(4), atol=1e-6)


def test_pose_graph_recovers_from_noise(rng):
    V = 8
    # Ground-truth poses along a loop.
    gt = [np.eye(4)]
    for i in range(1, V):
        gt.append(gt[-1] @ _random_se3(rng, 0.2, 0.5))
    gt = np.stack(gt)

    edges = np.asarray([(i, i + 1) for i in range(V - 1)]
                       + [(0, i) for i in range(2, V)], np.int32)
    rel = np.stack([np.linalg.inv(gt[j]) @ gt[i] for i, j in edges])

    # Noisy initialization.
    noisy = np.stack([g @ _random_se3(rng, 0.05, 0.1) for g in gt])
    noisy[0] = gt[0]

    refined, costs = pose_graph_gauss_newton(
        jnp.asarray(noisy), jnp.asarray(edges), jnp.asarray(rel), iters=15)
    refined = np.asarray(refined)

    def err(poses):
        return np.mean([np.linalg.norm(p[:3, 3] - g[:3, 3])
                        for p, g in zip(poses, gt)])

    assert err(refined) < 0.2 * err(noisy)
    assert float(costs[-1]) < float(costs[0])


def test_measure_relative_poses_consistency(rng):
    V, H, W = 3, 8, 10
    pts_local = rng.standard_normal((V, H, W, 3)).astype(np.float32)
    gt = np.stack([np.eye(4)] + [_random_se3(rng, 0.3, 1.0)
                                 for _ in range(V - 1)])
    pts_global = np.einsum("vab,vhwb->vhwa", gt[:, :3, :3], pts_local) \
        + gt[:, None, None, :3, 3]
    conf = np.full((V, H, W), 3.0, np.float32)
    edges = np.asarray([[0, 1], [1, 2]], np.int32)
    T, rel, w = measure_relative_poses(jnp.asarray(pts_local),
                                       jnp.asarray(pts_global),
                                       jnp.asarray(conf),
                                       jnp.asarray(edges))
    np.testing.assert_allclose(np.asarray(T), gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rel[0]),
                               np.linalg.inv(gt[1]) @ gt[0], atol=1e-4)


def test_refine_scene_poses_runs(rng):
    V, H, W = 4, 8, 10
    pts_local = rng.standard_normal((V, H, W, 3)).astype(np.float32)
    gt = np.stack([np.eye(4)] + [_random_se3(rng, 0.2, 0.5)
                                 for _ in range(V - 1)])
    pts_global = np.einsum("vab,vhwb->vhwa", gt[:, :3, :3], pts_local) \
        + gt[:, None, None, :3, 3]
    pm = {"pts3d_local": pts_local, "pts3d": pts_global.astype(np.float32),
          "conf": np.full((V, H, W), 2.0, np.float32)}
    refined, T0, costs = refine_scene_poses(pm, iters=5)
    np.testing.assert_allclose(np.asarray(refined), gt, atol=1e-3)


def test_incremental_frontend(rng):
    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from tests.test_inference import _setup
    from tests.test_train import H, W

    model, params, images, portrait, cls_emb = _setup(rng, V=6)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=4,
                             chunk=1, amp=False)
    frontend = IncrementalFrontend(engine, sim_threshold=1.1,  # always novel
                                   max_interval=2, max_keyframes=4)
    outs = [frontend.process(images[i], i) for i in range(6)]
    assert outs[0]["is_keyframe"] and outs[1]["is_keyframe"]
    assert all(o["pointmaps_raw"] is not None for o in outs[1:])
    assert outs[2]["pointmaps_raw"].shape == (H, W, 7)
    # capacity cap respected
    assert len(frontend.state.keyframe_ids) <= 4


def test_pose_graph_ate_threshold(rng):
    """ATE rigor (VERDICT #8): noisy per-view registration init → 6×6-block
    pose-graph GN must bring ATE under a numeric threshold AND improve on
    the init.  Synthetic render→recover: GT trajectory on a circle, world
    pointmaps rendered from GT, per-view local maps perturbed."""
    from panst3r_tpu.engine.eval import ate_rmse

    V, H, W = 10, 12, 16
    gt = []
    for i in range(V):
        a = 2 * np.pi * i / V
        c, s = np.cos(a), np.sin(a)
        T = np.eye(4)
        T[:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [2 * c, 2 * s, 0.1 * i]
        gt.append(T)
    gt = np.stack(gt)

    pts_local = rng.standard_normal((V, H, W, 3)).astype(np.float32)
    pts_global = np.einsum("vab,vhwb->vhwa", gt[:, :3, :3], pts_local) \
        + gt[:, None, None, :3, 3]
    # measurement noise on the local maps → noisy Procrustes registrations
    pts_local_noisy = pts_local + 0.03 * rng.standard_normal(
        pts_local.shape).astype(np.float32)
    pm = {"pts3d_local": pts_local_noisy,
          "pts3d": pts_global.astype(np.float32),
          "conf": np.full((V, H, W), 2.0, np.float32)}
    refined, T0, costs = refine_scene_poses(pm, iters=10)

    ate_init = ate_rmse(np.asarray(T0), gt)
    ate_ref = ate_rmse(np.asarray(refined), gt)
    assert float(costs[-1]) < float(costs[0])
    assert ate_ref <= ate_init + 1e-9
    assert ate_ref < 0.05, (ate_init, ate_ref)


def test_block_gn_rotation_coupling(rng):
    """The 6×6-block Jacobians must couple rotation and translation
    (Ad(A) off-diagonal) — large rotational noise with exact relative
    measurements converges to the GT, which the scalar-Laplacian
    approximation could not do in few iterations."""
    V = 6
    gt = [np.eye(4)]
    for i in range(1, V):
        gt.append(gt[-1] @ _random_se3(rng, 0.4, 1.0))
    gt = np.stack(gt)
    edges = np.asarray([(i, i + 1) for i in range(V - 1)]
                       + [(0, i) for i in range(2, V)], np.int32)
    rel = np.stack([np.linalg.inv(gt[j]) @ gt[i] for i, j in edges])
    noisy = np.stack([g @ _random_se3(rng, 0.15, 0.3) for g in gt])
    noisy[0] = gt[0]

    refined, costs = pose_graph_gauss_newton(
        jnp.asarray(noisy), jnp.asarray(edges), jnp.asarray(rel), iters=12)
    refined = np.asarray(refined)
    np.testing.assert_allclose(refined, gt, atol=1e-3)


def test_memory_ring_overwrite(rng):
    """begin_overwrite/end_overwrite: freed slots are rewritten in place,
    cursor restored, validity consistent."""
    from panst3r_tpu.models import memory as memlib

    mem = memlib.init_memory(2, 1, 6, 4)
    y = jnp.asarray(rng.standard_normal((2, 1, 2, 4)), jnp.float32)
    pos = jnp.ones((1, 2, 2), jnp.int32)
    mem = memlib.insert(mem, y, pos)
    mem = memlib.insert(mem, 2 * y, 2 * pos)
    assert int(mem.count) == 4 and bool(mem.valid[0, :4].all())

    # reuse slots [0:2]
    mem = memlib.begin_overwrite(mem, 0, 2)
    assert int(mem.count) == 0 and not bool(mem.valid[0, :2].any())
    mem = memlib.insert(mem, 3 * y, 3 * pos)
    mem = memlib.end_overwrite(mem, 4)
    assert int(mem.count) == 4
    assert bool(mem.valid[0, :4].all()) and not bool(mem.valid[0, 4:].any())
    np.testing.assert_allclose(np.asarray(mem.y[:, :, :2]),
                               np.asarray(3 * y))
    np.testing.assert_allclose(np.asarray(mem.y[:, :, 2:4]),
                               np.asarray(2 * y))


def test_ate_from_preprocessed_metadata_gt(rng, tmp_path):
    """End-to-end ATE rigor (VERDICT r2 #5): GT trajectories come from the
    preprocessed-dataset metadata contract (`all_metadata.npz`
    trajectories, tools/preprocess_scannetpp.py layout); pointmaps are
    rendered from those poses by proper pinhole unprojection; the full
    recovery stack (Weiszfeld focal + weighted Kabsch init, pose-graph GN,
    Schur BA) must hit numeric ATE thresholds and refinement must not
    degrade the init."""
    from panst3r_tpu.engine.ba import refine_scene_ba
    from panst3r_tpu.engine.eval import ate_rmse
    from panst3r_tpu.engine.pose import recover_cameras

    V, H, W = 6, 24, 32
    f = 30.0
    # GT trajectory: arc with varying orientation; write + read back via
    # the dataset metadata format.
    gt = []
    for i in range(V):
        a = 0.5 * i / V
        c, s = np.cos(a), np.sin(a)
        T = np.eye(4)
        T[:3, :3] = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [0.8 * i / V, 0.05 * i, 0.3 * s]
        gt.append(T)
    np.savez(tmp_path / "all_metadata.npz",
             trajectories=np.stack(gt).astype(np.float32),
             intrinsics=np.stack([[[f, 0, W / 2], [0, f, H / 2],
                                   [0, 0, 1]]] * V).astype(np.float32))
    with np.load(tmp_path / "all_metadata.npz") as meta:
        gt = meta["trajectories"].astype(np.float64)

    # Render local pointmaps by unprojecting a smooth depth field, then
    # map into the global frame (= world of the metadata poses).
    ys, xs = np.mgrid[:H, :W].astype(np.float32)
    depth = 2.0 + 0.3 * np.sin(xs / 7.0) + 0.2 * np.cos(ys / 5.0)
    pts_local = np.stack([(xs - W / 2) / f * depth,
                          (ys - H / 2) / f * depth, depth], -1)
    pts_local = np.broadcast_to(pts_local, (V, H, W, 3)).copy()
    # vary the field slightly per view so registrations are well-posed
    pts_local += 0.02 * np.sin(np.arange(V))[:, None, None, None] \
        * np.stack([ys, xs, ys], -1)[None] / 30.0
    pts_global = np.einsum("vab,vhwb->vhwa", gt[:, :3, :3], pts_local) \
        + gt[:, None, None, :3, 3]
    pm = {"pts3d_local": pts_local.astype(np.float32),
          "pts3d": pts_global.astype(np.float32),
          "conf": np.full((V, H, W), 2.0, np.float32)}

    # 1. Clean recovery (demo recipe): focal + ATE both near-exact.
    focals, c2w = recover_cameras(pm, (H, W))
    np.testing.assert_allclose(np.asarray(focals), f, rtol=0.02)
    assert ate_rmse(np.asarray(c2w, np.float64), gt) < 1e-3

    # 2. Noisy local maps: pose-graph + BA refinement vs init, all
    # against the metadata GT.
    pm_noisy = dict(pm)
    pm_noisy["pts3d_local"] = (pts_local + 0.02 * rng.standard_normal(
        pts_local.shape)).astype(np.float32)
    refined, T0, costs = refine_scene_poses(pm_noisy, iters=10)
    ate_init = ate_rmse(np.asarray(T0, np.float64), gt)
    ate_pg = ate_rmse(np.asarray(refined, np.float64), gt)
    assert float(costs[-1]) <= float(costs[0])
    # GN at convergence may wiggle within numerical noise of the init
    assert ate_pg <= ate_init * 1.01 + 1e-6
    assert ate_pg < 0.03, (ate_init, ate_pg)

    # 3. BA from a deliberately degraded init must improve on it (from a
    # near-perfect init BA only redistributes noise, so improvement is
    # asserted against the perturbed start).
    from panst3r_tpu.engine.slam import se3_exp

    xi = 0.03 * rng.standard_normal((V, 6)).astype(np.float32)
    T0_bad = np.einsum("vab,vbc->vac", np.asarray(T0),
                       np.asarray(jax.vmap(se3_exp)(jnp.asarray(xi))))
    ate_bad = ate_rmse(T0_bad.astype(np.float64), gt)
    ba_poses, _ = refine_scene_ba(pm_noisy, T0_bad.astype(np.float32))
    ate_ba = ate_rmse(np.asarray(ba_poses, np.float64), gt)
    assert ate_ba < ate_bad, (ate_bad, ate_ba)
    assert ate_ba < 0.03


def test_stream_matches_process(rng):
    """stream() pipelines fetches but must produce EXACTLY the per-frame
    results and keyframe decisions of sequential process() calls."""
    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from tests.test_inference import _setup
    from tests.test_train import H, W

    model, params, images, portrait, cls_emb = _setup(rng, V=6)

    def build():
        engine = InferenceEngine(model, params, Bucket(H, W),
                                 num_keyframes=4, chunk=1, amp=False)
        return IncrementalFrontend(engine, sim_threshold=1.1,
                                   max_interval=2, max_keyframes=4)

    f_sync = build()
    sync = [f_sync.process(images[i], i) for i in range(6)]

    f_str = build()
    stream = list(f_str.stream([images[i] for i in range(6)]))

    assert len(stream) == 6
    assert [o["frame_id"] for o in stream] == list(range(6))
    for s, p in zip(stream, sync):
        assert s["is_keyframe"] == p["is_keyframe"]
        if p["pointmaps_raw"] is None:
            assert s["pointmaps_raw"] is None
        else:
            np.testing.assert_allclose(s["pointmaps_raw"],
                                       p["pointmaps_raw"], rtol=1e-5,
                                       atol=1e-5)
    assert f_str.state.keyframe_ids == f_sync.state.keyframe_ids


def test_long_session_eviction_stability(rng):
    """Long-session ring-eviction soundness (VERDICT r4 #7): a 200-frame
    stream with max_keyframes=6 must stay bounded and consistent — the
    protected gauge anchors survive every eviction, slots remain a
    permutation of the capacity, and the memory's validity mask matches
    the occupied token count."""
    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from tests.test_inference import _setup
    from tests.test_train import H, W

    model, params, images, portrait, cls_emb = _setup(rng, V=4)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=6,
                             chunk=1, amp=False)
    frontend = IncrementalFrontend(engine, sim_threshold=-1.0,  # interval-only
                                   max_interval=5, max_keyframes=6)

    n_frames = 200
    base = images[0]
    frames = [np.roll(base, i, axis=1) + 0.01 * (i % 7) for i in range(n_frames)]
    outs = list(frontend.stream(frames))
    assert len(outs) == n_frames
    assert [o["frame_id"] for o in outs] == list(range(n_frames))

    st = frontend.state
    n_kf = sum(o["is_keyframe"] for o in outs)
    assert n_kf > 20                      # eviction exercised many times
    assert len(st.keyframe_ids) == 6     # capacity respected
    # protected anchors (frames 0 and 1) never evicted
    assert st.keyframe_ids[0] == 0 and st.keyframe_ids[1] == 1
    # remaining keyframes are the most recent inserts, in order
    assert st.keyframe_ids[2:] == sorted(st.keyframe_ids[2:])
    assert st.keyframe_ids[-1] == max(o["frame_id"] for o in outs
                                      if o["is_keyframe"])
    # slots form a permutation of the capacity
    assert sorted(st.slots) == list(range(6))
    # memory validity consistent with full occupancy
    assert int(st.mem.count) == 6 * engine.n_tokens
    assert bool(np.asarray(st.mem.valid)[0, :6 * engine.n_tokens].all())
    # every post-bootstrap frame produced a pointmap
    assert all(o["pointmaps_raw"] is not None for o in outs[1:])


def test_long_session_stream_matches_process(rng):
    """Eviction parity between the pipelined stream() and per-frame
    process() — the existing 6-frame parity test never evicts; this one
    evicts ~15 times over 60 frames."""
    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from tests.test_inference import _setup
    from tests.test_train import H, W

    model, params, images, portrait, cls_emb = _setup(rng, V=4)

    def build():
        engine = InferenceEngine(model, params, Bucket(H, W),
                                 num_keyframes=4, chunk=1, amp=False)
        return IncrementalFrontend(engine, sim_threshold=-1.0,
                                   max_interval=3, max_keyframes=4)

    frames = [np.roll(images[0], 3 * i, axis=1) for i in range(60)]
    f_sync = build()
    sync = [f_sync.process(frames[i], i) for i in range(60)]
    f_str = build()
    stream = list(f_str.stream(frames))

    assert sum(o["is_keyframe"] for o in sync) >= 18
    for s, p in zip(stream, sync):
        assert s["is_keyframe"] == p["is_keyframe"]
        if p["pointmaps_raw"] is not None:
            np.testing.assert_allclose(s["pointmaps_raw"],
                                       p["pointmaps_raw"], rtol=1e-5,
                                       atol=1e-5)
    assert f_str.state.keyframe_ids == f_sync.state.keyframe_ids
    assert f_str.state.slots == f_sync.state.slots


def test_long_trajectory_windowed_ate_bounded(rng):
    """ATE over a 200-view trajectory with eviction-shaped edges (chain +
    loop closures only to the protected anchors, since evicted keyframes
    cannot contribute edges): the pose-graph GN must keep ATE bounded at
    every interval checkpoint — drift must not accumulate with session
    length."""
    from panst3r_tpu.engine.eval import ate_rmse

    V, H, W = 200, 8, 12
    gt = []
    for i in range(V):
        a = 2 * np.pi * i / 80.0
        c, s = np.cos(a), np.sin(a)
        T = np.eye(4)
        T[:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [3 * c, 3 * s, 0.05 * i]
        gt.append(T)
    gt = np.stack(gt)

    pts_local = rng.standard_normal((V, H, W, 3)).astype(np.float32)
    pts_global = np.einsum("vab,vhwb->vhwa", gt[:, :3, :3], pts_local) \
        + gt[:, None, None, :3, 3]
    noisy = pts_local + 0.03 * rng.standard_normal(
        pts_local.shape).astype(np.float32)

    ates = {}
    for upto in (50, 100, 200):
        pm = {"pts3d_local": noisy[:upto], "pts3d": pts_global[:upto],
              "conf": np.full((upto, H, W), 2.0, np.float32)}
        seq = [(i, i + 1) for i in range(upto - 1)]
        anchors = [(a, i) for a in (0, 1) for i in range(2, upto, 5)]
        edges = np.asarray(seq + anchors, np.int32)
        refined, T0, costs = refine_scene_poses(pm, edges=edges, iters=8)
        # The registration init is near-optimal here (relative measurements
        # derive from the same maps), so costs sit at float-noise scale —
        # require only that GN does not blow the cost up.
        assert float(costs[-1]) <= float(costs[0]) * 1.05 + 1e-8
        ates[upto] = (ate_rmse(np.asarray(T0), gt[:upto]),
                      ate_rmse(np.asarray(refined), gt[:upto]))
    for upto, (a0, a1) in ates.items():
        # near-optimal init: refinement must not degrade it measurably
        assert a1 <= a0 * 1.01 + 1e-6, (upto, a0, a1)
        assert a1 < 0.08, (upto, a0, a1)
    # bounded drift: ATE at 200 views no worse than 2x the 50-view ATE
    assert ates[200][1] < 2.0 * ates[50][1] + 1e-6, ates
