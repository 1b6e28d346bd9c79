"""Criterion + fusion behavior tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.data.targets import prepare_targets
from panst3r_tpu.data.utils import id2rgb, rgb2id
from panst3r_tpu.engine.criterion import (PanopticLossConfig, Targets, match,
                                          panoptic_loss, set_criterion)
from panst3r_tpu.engine.fusion import (panoptic_fusion, panoptic_fusion_v1,
                                       qubo_fusion, qubo_weights,
                                       solve_qubo_sa)

B, V, Q, H, W, NCLS, T = 2, 2, 12, 16, 24, 6, 4
CFG = PanopticLossConfig(num_points=64, label_mode="sigmoid")


def _fake_batch(rng, perfect=False):
    labels = rng.integers(0, NCLS, (B, T)).astype(np.int32)
    valid = np.zeros((B, T), bool)
    valid[:, :3] = True
    masks = (rng.random((B, T, V, H, W)) < 0.3).astype(np.float32)

    logits = rng.standard_normal((B, Q, NCLS)).astype(np.float32)
    pred_masks = rng.standard_normal((B, V, Q, H, W)).astype(np.float32)
    if perfect:
        # queries t..: exactly predict target t; other queries → no object
        logits[:] = -8.0
        for b in range(B):
            for t in range(T):
                logits[b, t, labels[b, t]] = 8.0
                pred_masks[b, :, t] = np.where(
                    masks[b, t].transpose(0, 1, 2) > 0, 8.0, -8.0)
    targets = Targets(labels=jnp.asarray(labels),
                      masks=jnp.asarray(masks),
                      valid=jnp.asarray(valid),
                      output_mask=jnp.ones((B, NCLS), bool))
    return jnp.asarray(logits), jnp.asarray(pred_masks), targets


def test_match_recovers_identity(rng):
    logits, pred_masks, targets = _fake_batch(rng, perfect=True)
    assign = match(jax.random.PRNGKey(0), logits, pred_masks, targets, CFG)
    a = np.asarray(assign)
    for b in range(B):
        np.testing.assert_array_equal(a[b, :3], np.arange(3))


def test_loss_decreases_for_perfect_predictions(rng):
    logits_r, masks_r, targets = _fake_batch(rng, perfect=False)
    # Perfect predictions w.r.t. the SAME targets.
    labels = np.asarray(targets.labels)
    masks = np.asarray(targets.masks)
    logits_p = np.full((B, Q, NCLS), -8.0, np.float32)
    masks_p = np.asarray(masks_r).copy()
    for b in range(B):
        for t in range(T):
            logits_p[b, t, labels[b, t]] = 8.0
            masks_p[b, :, t] = np.where(masks[b, t] > 0, 8.0, -8.0)
    logits_p, masks_p = jnp.asarray(logits_p), jnp.asarray(masks_p)
    out_r = {"pred_logits": logits_r, "pred_masks": masks_r}
    out_p = {"pred_logits": logits_p, "pred_masks": masks_p}
    key = jax.random.PRNGKey(1)
    loss_r, _ = panoptic_loss(key, out_r, targets, CFG)
    loss_p, details = panoptic_loss(key, out_p, targets, CFG)
    assert float(loss_p) < float(loss_r)
    assert np.isfinite(float(loss_r))
    assert set(details) >= {"loss_ce", "loss_mask", "loss_dice",
                            "panoptic_loss"}


def test_loss_softmax_mode(rng):
    cfg = PanopticLossConfig(num_points=64, label_mode="softmax")
    logits, masks, targets = _fake_batch(rng)
    # softmax mode has an extra no-object class column
    logits = jnp.concatenate(
        [logits, jnp.zeros((B, Q, 1), logits.dtype)], axis=-1)
    loss, _ = panoptic_loss(jax.random.PRNGKey(0),
                            {"pred_logits": logits, "pred_masks": masks},
                            targets, cfg)
    assert np.isfinite(float(loss))


def test_criterion_aux_outputs(rng):
    logits, masks, targets = _fake_batch(rng)
    out = {"pred_logits": logits, "pred_masks": masks,
           "aux_outputs": [{"pred_logits": logits, "pred_masks": masks}]}
    losses = set_criterion(jax.random.PRNGKey(0), out, targets, CFG)
    assert "loss_ce_0" in losses and "loss_mask_0" in losses


def test_criterion_gradients_flow(rng):
    logits, masks, targets = _fake_batch(rng)

    def loss_fn(logits, masks):
        total, _ = panoptic_loss(jax.random.PRNGKey(0),
                                 {"pred_logits": logits,
                                  "pred_masks": masks}, targets, CFG)
        return total

    gl, gm = jax.grad(loss_fn, argnums=(0, 1))(logits, masks)
    assert np.isfinite(np.asarray(gl)).all()
    assert np.isfinite(np.asarray(gm)).all()
    assert np.abs(np.asarray(gm)).max() > 0


# ---------------------------------------------------------------- fusion ---

def test_fusion_output_is_partition(rng):
    mask_cls = jnp.asarray(rng.standard_normal((1, Q, NCLS)) * 2, jnp.float32)
    mask_pred = jnp.asarray(rng.standard_normal((1, V, Q, H // 2, W // 2)) * 2,
                            jnp.float32)
    res = panoptic_fusion(mask_cls, mask_pred, (H, W))
    assert len(res) == 1
    pan = res[0]["pan"]
    assert pan.shape == (V, H, W)
    ids = {s["id"] for s in res[0]["segments_info"]}
    present = set(np.unique(pan).tolist()) - {0}
    assert present <= ids
    # conf within [0,1] on segment pixels
    assert res[0]["conf"].min() >= 0.0


def test_fusion_v1_is_v2_with_one_iter(rng):
    mask_cls = jnp.asarray(rng.standard_normal((1, Q, NCLS)) * 2, jnp.float32)
    mask_pred = jnp.asarray(rng.standard_normal((1, V, Q, H // 2, W // 2)) * 2,
                            jnp.float32)
    r1 = panoptic_fusion_v1(mask_cls, mask_pred, (H, W))
    r2 = panoptic_fusion(mask_cls, mask_pred, (H, W), niters=1,
                         mask_threshold=0.5, overlap_threshold=0.8)
    np.testing.assert_array_equal(r1[0]["pan"], r2[0]["pan"])


def test_fusion_strong_signal_recovers_instances():
    # Two disjoint boxes, two confident queries → two segments.
    mask_pred = np.full((1, 1, Q, H, W), -8.0, np.float32)
    mask_pred[0, 0, 0, :8, :10] = 8.0
    mask_pred[0, 0, 1, 8:, 14:] = 8.0
    mask_cls = np.full((1, Q, NCLS), -8.0, np.float32)
    mask_cls[0, 0, 2] = 6.0
    mask_cls[0, 1, 4] = 6.0
    res = panoptic_fusion(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                          (H, W))
    infos = res[0]["segments_info"]
    assert len(infos) == 2
    cats = sorted(i["category_id"] for i in infos)
    assert cats == [2, 4]
    pan = res[0]["pan"]
    assert pan[0, 4, 5] == [i["id"] for i in infos if i["query_id"] == 0][0]


def test_qubo_weights_and_sa(rng):
    masks = jnp.asarray(rng.random((6, 1, 8, 8)), jnp.float32)
    Wm = qubo_weights(masks)
    Wn = np.asarray(Wm)
    np.testing.assert_allclose(Wn, Wn.T, atol=1e-6)
    assert (np.diag(Wn) <= 0).all()  # -W: diag = -area

    sol, e = solve_qubo_sa(Wm, jax.random.PRNGKey(0), num_iters=500,
                           num_restarts=4)
    x = np.asarray(sol).astype(np.float64)
    # energy matches definition
    e_direct = x @ Wn @ x + 1e-3 * x.mean()
    np.testing.assert_allclose(float(e), e_direct, rtol=1e-4, atol=1e-5)


def test_qubo_fusion_runs(rng):
    mask_cls = jnp.asarray(rng.standard_normal((1, 8, NCLS)) * 2, jnp.float32)
    mask_pred = jnp.asarray(rng.standard_normal((1, V, 8, H // 2, W // 2)) * 2,
                            jnp.float32)
    res = qubo_fusion(mask_cls, mask_pred, (H, W), num_restarts=2)
    assert res[0]["pan"].shape == (V, H, W)


# ------------------------------------------------------------- targets ----

def test_rgb2id_roundtrip(rng):
    ids = rng.integers(0, 2 ** 24, (5, 7)).astype(np.int64)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def test_prepare_targets():
    V_, H_, W_ = 2, 4, 6
    inst = np.zeros((V_, H_, W_), np.int32)
    cls = np.zeros((V_, H_, W_), np.int32)
    inst[0, :2, :3] = 5; cls[0, :2, :3] = 1
    inst[1, 2:, 3:] = 9; cls[1, 2:, 3:] = 0
    class_set = ["chair", "table"]
    classes = ["wall", "table", "chair"]
    t = prepare_targets(inst, cls, class_set, classes, max_instances=4)
    assert t["valid"].sum() == 2
    assert t["labels"][0] == 1  # inst 5 → local cls 1 = 'table' → global 1
    assert t["labels"][1] == 2  # inst 9 → local cls 0 = 'chair' → global 2
    assert t["masks"][0].sum() == 6
    np.testing.assert_array_equal(t["output_mask"], [False, True, True])


def test_match_grid_equals_random_on_coherent_masks(rng):
    """Grid-quadrature matcher costs must produce the same assignment as
    the reference's random-point sampling on spatially coherent (real-like)
    masks — both estimate the same per-pixel CE/dice integral."""
    import dataclasses

    T_, Q_, V_, H_, W_ = 5, 12, 2, 32, 48
    labels = rng.integers(0, NCLS, (1, T_)).astype(np.int32)
    yy, xx = np.mgrid[0:H_, 0:W_]
    masks = np.zeros((1, T_, V_, H_, W_), np.float32)
    for t in range(T_):
        cy, cx = rng.integers(4, H_ - 4), rng.integers(6, W_ - 6)
        r = rng.integers(4, 10)
        masks[0, t] = ((yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2)[None]
    targets = Targets(labels=jnp.asarray(labels), masks=jnp.asarray(masks),
                      valid=jnp.ones((1, T_), bool),
                      output_mask=jnp.ones((1, NCLS), bool))
    logits = np.full((1, Q_, NCLS), -6.0, np.float32)
    pred = np.full((1, V_, Q_, H_, W_), -6.0, np.float32)
    perm = rng.permutation(Q_)[:T_]
    for t, q in enumerate(perm):
        logits[0, q, labels[0, t]] = 6.0
        pred[0, :, q] = np.where(masks[0, t] > 0, 6.0, -6.0)
    cfg_g = PanopticLossConfig(num_points=512, matcher_sampling="grid")
    cfg_r = PanopticLossConfig(num_points=512, matcher_sampling="random")
    a_g = np.asarray(match(jax.random.PRNGKey(3), jnp.asarray(logits),
                           jnp.asarray(pred), targets, cfg_g))
    a_r = np.asarray(match(jax.random.PRNGKey(3), jnp.asarray(logits),
                           jnp.asarray(pred), targets, cfg_r))
    np.testing.assert_array_equal(a_g[0], perm)
    np.testing.assert_array_equal(a_r[0], perm)


def test_loss_grid_close_to_random_on_coherent_masks(rng):
    """Grid-quadrature mask loss (loss_sampling='grid') must agree with
    the reference's random point sampling on spatially coherent masks —
    both estimate the same per-row CE/dice integrals."""
    from panst3r_tpu.engine.criterion import _loss_masks

    B_, T_, V_, Q_, H_, W_ = 1, 4, 2, 8, 32, 48
    yy, xx = np.mgrid[0:H_, 0:W_]
    tmasks = np.zeros((B_, T_, V_, H_, W_), np.float32)
    pred = np.full((B_, V_, Q_, H_, W_), -4.0, np.float32)
    assign = np.arange(T_, dtype=np.int32)[None]
    for t in range(T_):
        cy, cx = rng.integers(6, H_ - 6), rng.integers(8, W_ - 8)
        r = rng.integers(5, 10)
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2)
        tmasks[0, t] = disk[None]
        # prediction: the same disk shifted by 1px → nonzero but small loss
        pred[0, :, t] = np.where(np.roll(disk, 1, axis=1), 4.0, -4.0)
    targets = Targets(labels=jnp.zeros((B_, T_), jnp.int32),
                      masks=jnp.asarray(tmasks),
                      valid=jnp.ones((B_, T_), bool),
                      output_mask=jnp.ones((B_, NCLS), bool))

    cfg_g = PanopticLossConfig(num_points=2048, loss_sampling="grid")
    cfg_r = PanopticLossConfig(num_points=2048, loss_sampling="random")
    lm_g, ld_g = _loss_masks(jax.random.PRNGKey(0), jnp.asarray(pred),
                             targets, jnp.asarray(assign), float(T_), cfg_g)
    lm_r, ld_r = _loss_masks(jax.random.PRNGKey(0), jnp.asarray(pred),
                             targets, jnp.asarray(assign), float(T_), cfg_r)
    np.testing.assert_allclose(float(lm_g), float(lm_r), rtol=0.15)
    np.testing.assert_allclose(float(ld_g), float(ld_r), rtol=0.15)
