"""Inference engine integration tests (tiny model, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.engine.inference import InferenceEngine
from panst3r_tpu.engine.pose import (estimate_focal_weiszfeld,
                                     recover_cameras,
                                     rigid_points_registration)
from panst3r_tpu.engine.retrieval import (farthest_point_sampling,
                                          select_keyframes_linspace,
                                          select_keyframes_retrieval,
                                          view_similarity)

from tests.test_train import GRID, H, NCLS, W, tiny_model


def _setup(rng, V=5):
    model = tiny_model()
    images = (rng.standard_normal((V, H, W, 3)) * 0.2).astype(np.float32)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 24)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(images[None, :2]),
                        jnp.asarray(portrait[None, :2]),
                        jnp.asarray(cls_emb), GRID)
    return model, params, images, portrait, cls_emb


def test_engine_all_keyframes_matches_training_forward(rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=4)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=4,
                             chunk=2, amp=False)
    out = engine.run(images, portrait, cls_emb)

    panout, pointmaps = model.apply(params, jnp.asarray(images[None]),
                                    jnp.asarray(portrait[None]),
                                    jnp.asarray(cls_emb), GRID)
    np.testing.assert_allclose(out["pointmaps_raw"],
                               np.asarray(pointmaps[0]), atol=2e-4)
    np.testing.assert_allclose(out["pred_logits"],
                               np.asarray(panout["pred_logits"][0]),
                               atol=2e-3)
    np.testing.assert_allclose(out["pred_masks"],
                               np.asarray(panout["pred_masks"][0]),
                               atol=1e-2, rtol=1e-2)


def test_engine_with_non_keyframes(rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=6)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=3,
                             chunk=2, amp=False)
    out = engine.run(images, portrait, cls_emb)
    assert len(out["keyframes"]) == 3
    assert out["pred_masks"].shape[0] == 6
    assert out["pointmaps"]["pts3d"].shape == (6, H, W, 3)
    assert np.isfinite(out["pred_masks"]).all()
    # keyframe predictions in output order must match their slots
    assert out["keyframes"] == [0, 2, 5]  # linspace(0, 5, 3)


def test_engine_amp_runs(rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=3)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=2,
                             chunk=2, amp=True)
    out = engine.run(images, portrait, cls_emb)
    assert np.isfinite(out["pred_masks"]).all()
    assert out["pointmaps"]["pts3d"].dtype == np.float32


def test_run_fused_matches_run_device(rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=5)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=3,
                             chunk=2, amp=False)
    a = engine.run_device(images, portrait, cls_emb)
    b = engine.run_fused(images, portrait, cls_emb)
    assert a["keyframes"] == b["keyframes"]
    np.testing.assert_allclose(np.asarray(a["pointmaps_raw"]),
                               np.asarray(b["pointmaps_raw"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a["pred_logits"]),
                               np.asarray(b["pred_logits"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(a["pred_masks"]),
                               np.asarray(b["pred_masks"]), atol=1e-2,
                               rtol=1e-2)


def test_engine_retrieval_keyframes(rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=6)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=3,
                             chunk=2, amp=False)
    out = engine.run(images, portrait, cls_emb, use_retrieval=True)
    assert len(set(out["keyframes"])) == 3


# ------------------------------------------------------------- pose -------

def test_focal_estimation_recovers_truth(rng):
    Hh, Ww, f_true = 24, 32, 40.0
    pp = np.array([Ww / 2, Hh / 2], np.float32)
    u, v = np.meshgrid(np.arange(Ww) - pp[0], np.arange(Hh) - pp[1])
    z = 1.0 + rng.random((Hh, Ww)).astype(np.float32) * 3
    pts = np.stack([u / f_true * z, v / f_true * z, z], -1).astype(np.float32)
    f = float(estimate_focal_weiszfeld(jnp.asarray(pts), jnp.asarray(pp)))
    np.testing.assert_allclose(f, f_true, rtol=1e-3)


def test_rigid_registration_recovers_pose(rng):
    ang = 0.4
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0],
                       [0, 0, 1]], np.float32)
    t_true = np.array([0.5, -1.0, 2.0], np.float32)
    src = rng.standard_normal((500, 3)).astype(np.float32)
    dst = src @ R_true.T + t_true
    w = np.ones(500, np.float32)
    R, t = rigid_points_registration(jnp.asarray(src), jnp.asarray(dst),
                                     jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


def test_recover_cameras_shapes(rng):
    V = 3
    pts = rng.standard_normal((V, 8, 12, 3)).astype(np.float32)
    pts[..., 2] = np.abs(pts[..., 2]) + 1
    pm = {"pts3d": jnp.asarray(pts), "pts3d_local": jnp.asarray(pts),
          "conf": jnp.asarray(np.ones((V, 8, 12), np.float32) * 2)}
    focals, c2w = recover_cameras(pm, (8, 12))
    assert focals.shape == (V,)
    assert c2w.shape == (V, 4, 4)
    # identity transform since local == global
    np.testing.assert_allclose(np.asarray(c2w[0]), np.eye(4), atol=1e-4)


# --------------------------------------------------------- retrieval ------

def test_view_similarity_and_fps(rng):
    tokens = jnp.asarray(rng.standard_normal((6, 10, 16)), jnp.float32)
    sim = np.asarray(view_similarity(tokens))
    assert sim.shape == (6, 6)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)

    sel = farthest_point_sampling(1 - sim, 3)
    assert len(set(sel)) == 3

    kf = select_keyframes_retrieval(tokens, 4)
    assert len(set(kf)) == 4

    assert select_keyframes_linspace(10, 3) == [0, 4, 9]
    assert select_keyframes_linspace(3, None) == [0, 1, 2]


def test_refinement_iterations_use_feedback(rng):
    """Refined memory build (feedback passes) must change — and keep
    finite — the render outputs; feedback params must exist."""
    model, params, images, portrait, cls_emb = _setup(rng, V=3)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=3,
                             chunk=3, amp=False)
    x, pos = engine._encode_all(images)
    mem0 = engine.build_memory(x, pos, refine_iterations=0)
    mem1 = engine.build_memory(x, pos, refine_iterations=1)
    pm0, _ = engine._render_chunked(x, pos, mem0)
    pm1, _ = engine._render_chunked(x, pos, mem1)
    assert np.isfinite(np.asarray(pm1)).all()
    assert np.abs(np.asarray(pm0) - np.asarray(pm1)).max() > 1e-5
