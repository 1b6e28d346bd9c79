"""Numerical parity of loss building blocks vs independent torch formulas.

Each torch reference here is written from the published formula (focal loss,
dice, BCE-with-logits), not copied — these pin the exact numerics the
criterion relies on (reference criterion/panoptic.py & matcher.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from panst3r_tpu.engine.criterion import (_batch_dice, _batch_sigmoid_ce,
                                          PanopticLossConfig, Targets,
                                          _loss_labels_sigmoid,
                                          _loss_labels_softmax)


def test_batch_sigmoid_ce_matches_torch(rng):
    N, M, P = 5, 4, 32
    inputs = rng.standard_normal((N, P)).astype(np.float32)
    targets = (rng.random((M, P)) < 0.5).astype(np.float32)

    ti = torch.from_numpy(inputs)
    tt = torch.from_numpy(targets)
    pos = F.binary_cross_entropy_with_logits(
        ti, torch.ones_like(ti), reduction="none")
    neg = F.binary_cross_entropy_with_logits(
        ti, torch.zeros_like(ti), reduction="none")
    expected = (torch.einsum("nc,mc->nm", pos, tt)
                + torch.einsum("nc,mc->nm", neg, 1 - tt)) / P

    ours = _batch_sigmoid_ce(jnp.asarray(inputs), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_batch_dice_matches_torch(rng):
    N, M, P = 5, 4, 32
    inputs = rng.standard_normal((N, P)).astype(np.float32)
    targets = (rng.random((M, P)) < 0.5).astype(np.float32)

    ti = torch.from_numpy(inputs).sigmoid()
    tt = torch.from_numpy(targets)
    num = 2 * torch.einsum("nc,mc->nm", ti, tt)
    den = ti.sum(-1)[:, None] + tt.sum(-1)[None]
    expected = 1 - (num + 1) / (den + 1)

    ours = _batch_dice(jnp.asarray(inputs), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               rtol=1e-5, atol=1e-6)


def _targets(rng, B, T, ncls, valid_counts):
    labels = rng.integers(0, ncls, (B, T)).astype(np.int32)
    valid = np.zeros((B, T), bool)
    for b, c in enumerate(valid_counts):
        valid[b, :c] = True
    return labels, valid


def test_focal_label_loss_matches_torch(rng):
    B, Q, T, ncls = 2, 6, 3, 5
    logits = rng.standard_normal((B, Q, ncls)).astype(np.float32)
    labels, valid = _targets(rng, B, T, ncls, [2, 3])
    assign = np.stack([rng.permutation(Q)[:T] for _ in range(B)]).astype(
        np.int32)
    output_mask = rng.random((B, ncls)) < 0.8
    num_masks = float(valid.sum())

    cfg = PanopticLossConfig()
    targets = Targets(jnp.asarray(labels), jnp.zeros((B, T, 1, 2, 2)),
                      jnp.asarray(valid), jnp.asarray(output_mask))
    ours = _loss_labels_sigmoid(jnp.asarray(logits), targets,
                                jnp.asarray(assign), num_masks, cfg)

    # torch reference: one-hot targets at matched (valid) queries, focal
    # loss (α=.25, γ=2), masked by output_mask, mean over queries,
    # sum / num_masks × Q  (reference panoptic.py:142-170).
    tl = torch.from_numpy(logits)
    onehot = torch.zeros(B, Q, ncls)
    for b in range(B):
        for t in range(T):
            if valid[b, t]:
                onehot[b, assign[b, t], labels[b, t]] = 1.0
    prob = tl.sigmoid()
    ce = F.binary_cross_entropy_with_logits(tl, onehot, reduction="none")
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * (1 - p_t) ** 2
    alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
    loss = alpha_t * loss * torch.from_numpy(output_mask)[:, None]
    expected = loss.mean(1).sum() / num_masks * Q

    np.testing.assert_allclose(float(ours), float(expected), rtol=1e-5)


def test_softmax_label_loss_matches_torch(rng):
    B, Q, T, ncls = 2, 6, 3, 5
    logits = rng.standard_normal((B, Q, ncls + 1)).astype(np.float32)
    labels, valid = _targets(rng, B, T, ncls, [2, 3])
    assign = np.stack([rng.permutation(Q)[:T] for _ in range(B)]).astype(
        np.int32)
    num_masks = float(valid.sum())

    cfg = PanopticLossConfig(label_mode="softmax", no_obj_weight=0.1)
    targets = Targets(jnp.asarray(labels), jnp.zeros((B, T, 1, 2, 2)),
                      jnp.asarray(valid), jnp.ones((B, ncls), bool))
    ours = _loss_labels_softmax(jnp.asarray(logits), targets,
                                jnp.asarray(assign), num_masks, cfg)

    # torch reference: weighted CE with no-object class weight
    # (reference panoptic.py:172-200, all classes unmasked here).
    tl = torch.from_numpy(logits)
    target_classes = torch.full((B, Q), ncls, dtype=torch.long)
    for b in range(B):
        for t in range(T):
            if valid[b, t]:
                target_classes[b, assign[b, t]] = labels[b, t]
    weight = torch.ones(ncls + 1)
    weight[-1] = 0.1
    expected = F.cross_entropy(tl.transpose(1, 2), target_classes, weight)

    np.testing.assert_allclose(float(ours), float(expected), rtol=1e-5)


def test_mask_loss_reference_reduction(rng):
    """Regression: loss_mask/loss_dice follow the reference's per-(mask,view)
    row reduction (panoptic.py:229-231,255-256): CE = per-row mean over P,
    dice = per-row, both summed over B*T*V rows / num_masks / V.  Previously
    CE averaged over V*P jointly AND divided by V (V× too small) and dice
    was joint over views."""
    from panst3r_tpu.engine.criterion import _loss_masks
    from panst3r_tpu.ops.sampling import point_sample, uncertain_point_coords

    B, T, V, Q, h, w = 1, 3, 3, 6, 8, 8
    cfg = PanopticLossConfig(num_points=16, oversample_ratio=1.0,
                             importance_sample_ratio=1.0,
                             loss_sampling="random")
    pred = rng.standard_normal((B, V, Q, h, w)).astype(np.float32)
    tmasks = (rng.random((B, T, V, h, w)) < 0.5).astype(np.float32)
    valid = np.array([[True, True, False]])
    assign = np.array([[0, 3, 1]], np.int32)
    targets = Targets(jnp.zeros((B, T), jnp.int32), jnp.asarray(tmasks),
                      jnp.asarray(valid), jnp.ones((B, 4), bool))
    num_masks = float(valid.sum())
    key = jax.random.PRNGKey(7)

    lm, ld = _loss_masks(key, jnp.asarray(pred), targets,
                         jnp.asarray(assign), num_masks, cfg)

    # Independent reference-style computation with identical sample coords.
    src = pred.transpose(0, 2, 1, 3, 4)[
        np.zeros((B, T), int), assign]                  # (B, T, V, h, w)
    src = jnp.asarray(src.reshape(B * T * V, h, w), jnp.float32)
    tgt = jnp.asarray(tmasks.reshape(B * T * V, h, w), jnp.float32)
    coords = uncertain_point_coords(key, src, cfg.num_points, 1.0, 1.0)
    pl_ = torch.from_numpy(np.asarray(point_sample(src, coords)))
    lb = torch.from_numpy(np.asarray(point_sample(tgt, coords)))

    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        pl_, lb, reduction="none")
    vmask = torch.from_numpy(np.repeat(valid.reshape(-1), V)).float()
    exp_mask = (ce.mean(1) * vmask).sum() / num_masks / V

    probs = pl_.sigmoid()
    num = 2 * (probs * lb).sum(-1)
    den = probs.sum(-1) + lb.sum(-1)
    dice = 1 - (num + 1) / (den + 1)
    exp_dice = (dice * vmask).sum() / num_masks / V

    np.testing.assert_allclose(float(lm), float(exp_mask), rtol=1e-5)
    np.testing.assert_allclose(float(ld), float(exp_dice), rtol=1e-5)
