"""QUBO fusion parity vs a transcription of the reference semantics.

The reference solves query-subset selection as a QUBO
(postprocess.py:134-336): W from mask areas/overlaps (`weight_from_masks`,
:229-260), simulated annealing (`solve_qubo_simulated_annealing`,
:266-336), then an argmax instance map with per-segment class/conf
filtering (:179-207).  SA is stochastic, so parity is established the way
VERDICT r2 #8 prescribes: (a) the W matrix is compared EXACTLY against a
direct transcription, (b) the solver is checked against brute-force
enumeration on small exactly-solvable instances, and (c) the selection →
segment-map logic is compared against a transcription given the same
(brute-force optimal) solution.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.engine.fusion import (qubo_fusion, qubo_weights,
                                       solve_qubo_sa)


def reference_weight_from_masks(masks, cls_probs, min_cls_prob=0.0,
                                penalty=1.0, cutoff=0.0,
                                prob_weighted=False):
    """Transcription of reference postprocess.py:229-260 (numpy)."""
    masks = masks.astype(np.float64).copy()
    n_masks, n_imgs, H, W = masks.shape
    if prob_weighted:
        masks = masks * cls_probs.max(1).reshape(-1, 1, 1, 1)
    bad = (cls_probs < min_cls_prob).all(1)
    masks[bad] = 0.0
    Wm = np.diag(masks.reshape(n_masks, -1).sum(1))
    for i in range(1, n_masks):
        mask_i = masks[i].reshape(-1)[None]
        mask_rest = masks[:i].reshape(i, -1)
        overlap = np.minimum(mask_i, mask_rest).sum(1)
        overlap = np.where(overlap > cutoff, overlap, 0.0)
        Wm[i, :i] = Wm[:i, i] = -(1.0 + penalty) * overlap / 2.0
    Wm /= H * W
    Wm /= n_imgs
    return masks, -Wm


def brute_force_qubo(W, lambda_reg=1e-3):
    """Exact minimizer of x^T W x + lambda*mean(x) by enumeration."""
    N = W.shape[0]
    best_x, best_e = None, np.inf
    for bits in itertools.product((0.0, 1.0), repeat=N):
        x = np.asarray(bits)
        e = x @ W @ x + lambda_reg * x.mean()
        if e < best_e:
            best_e, best_x = e, x
    return best_x, best_e


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("prob_weighted", [False, True])
def test_qubo_weights_matches_reference(seed, prob_weighted):
    rng = np.random.default_rng(seed)
    Q, V, H, W = 9, 2, 10, 12
    masks = rng.uniform(size=(Q, V, H, W)).astype(np.float32)
    probs = rng.uniform(size=(Q, 4)).astype(np.float32)

    _, ref = reference_weight_from_masks(masks, probs,
                                         prob_weighted=prob_weighted)
    ours = np.asarray(qubo_weights(jnp.asarray(masks), jnp.asarray(probs),
                                   prob_weighted=prob_weighted))
    np.testing.assert_allclose(ours, ref, rtol=2e-6, atol=1e-7)
    # symmetric, negative diagonal (area), positive off-diagonal overlaps
    np.testing.assert_allclose(ours, ours.T, rtol=1e-6)
    assert (np.diag(ours) < 0).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qubo_sa_finds_brute_force_optimum(seed):
    """Small exactly-solvable instances: SA must hit the enumerated
    optimum (reference SA semantics: geometric cooling + restarts)."""
    rng = np.random.default_rng(seed)
    N = 10
    # reference random_weights shape: symmetric, strictly negative diag
    W = rng.uniform(size=(N, N))
    W = (W + W.T) / 2
    np.fill_diagonal(W, -np.abs(np.diag(W)) - 0.1)

    x_star, e_star = brute_force_qubo(W)
    sol, e = solve_qubo_sa(jnp.asarray(W, jnp.float32),
                           jax.random.PRNGKey(seed), num_iters=2000,
                           num_restarts=8)
    assert float(e) == pytest.approx(e_star, abs=1e-4)
    np.testing.assert_array_equal(np.asarray(sol, np.float64), x_star)


def reference_qubo_selection(masks, cls_probs, solution,
                             prob_threshold=0.01):
    """Transcription of the reference's solution → segment-map parse
    (postprocess.py:179-207), given a fixed solution vector."""
    solution = solution.astype(bool)
    sel = np.nonzero(solution)[0]
    cls_sel = cls_probs[solution]
    cls_probs_max, cls_ids = cls_sel.max(1), cls_sel.argmax(1)
    m = masks[solution]                          # (S, V, H, W)
    conf = m.max(0)
    instance_ids = m.argmax(0)
    pan = np.zeros_like(instance_ids, dtype=np.int32)
    new_id = 1
    infos = []
    for inst_id in np.unique(instance_ids):
        region = instance_ids == inst_id
        mask_conf = conf[region].mean()
        if cls_probs_max[inst_id] * mask_conf < prob_threshold:
            continue
        pan[region] = new_id
        infos.append({"id": new_id, "query_id": int(sel[inst_id]),
                      "class_prob": float(cls_probs_max[inst_id]),
                      "mask_conf": float(mask_conf),
                      "category_id": int(cls_ids[inst_id]),
                      "area": int(region.sum())})
        new_id += 1
    return pan, infos, conf


def test_qubo_fusion_selection_matches_reference():
    """End-to-end qubo_fusion on an easy instance (well-separated masks →
    SA reliably optimal) vs the reference parse given the brute-force
    optimal solution."""
    rng = np.random.default_rng(3)
    B, V, Q, NC = 1, 2, 6, 4
    h, w = 8, 12
    H, W = 16, 24
    # Three well-separated "real" masks + three noise queries.
    logits = np.full((B, V, Q, h, w), -6.0, np.float32)
    logits[0, :, 0, :4, :6] = 6.0
    logits[0, :, 1, 4:, :6] = 6.0
    logits[0, :, 2, :, 6:] = 6.0
    logits[0, :, 3:] += rng.standard_normal((V, 3, h, w)).astype(np.float32)
    mask_cls = rng.standard_normal((B, Q, NC)).astype(np.float32) * 2

    out = qubo_fusion(jnp.asarray(mask_cls), jnp.asarray(logits), (H, W),
                      num_restarts=8, seed=0)[0]

    # Reproduce the upsampled sigmoid masks exactly as qubo_fusion builds
    # them, then brute-force the QUBO and parse with the reference logic.
    masks = jax.nn.sigmoid(jnp.asarray(logits[0], jnp.float32))
    masks = np.asarray(jax.image.resize(masks, (V, Q, H, W), "bilinear"))
    masks = masks.transpose(1, 0, 2, 3)
    probs = 1 / (1 + np.exp(-mask_cls[0].astype(np.float64)))
    _, Wm = reference_weight_from_masks(masks, probs)
    x_star, _ = brute_force_qubo(Wm)
    pan_ref, infos_ref, conf_ref = reference_qubo_selection(
        masks, probs.astype(np.float32), x_star)

    np.testing.assert_array_equal(out["pan"], pan_ref)
    assert [i["query_id"] for i in out["segments_info"]] == \
        [i["query_id"] for i in infos_ref]
    assert [i["category_id"] for i in out["segments_info"]] == \
        [i["category_id"] for i in infos_ref]
    for o, r in zip(out["segments_info"], infos_ref):
        assert o["class_prob"] == pytest.approx(r["class_prob"], rel=1e-4)
        assert o["mask_conf"] == pytest.approx(r["mask_conf"], rel=1e-4)
        assert o["area"] == r["area"]
    np.testing.assert_allclose(out["conf"], conf_ref, atol=1e-5)


def test_qubo_double_sigmoid_temperature_quirk():
    """With a temperature, the reference sigmoids TWICE
    (postprocess.py:157 then :162) — pinned so checkpoint-parity behavior
    never silently 'fixes' it."""
    rng = np.random.default_rng(0)
    B, V, Q, NC = 1, 1, 4, 3
    logits = rng.standard_normal((B, V, Q, 6, 8)).astype(np.float32)
    mask_cls = rng.standard_normal((B, Q, NC)).astype(np.float32)

    out = qubo_fusion(jnp.asarray(mask_cls), jnp.asarray(logits), (12, 16),
                      temperature=0.1, num_restarts=4, seed=0)[0]
    s = 1 / (1 + np.exp(-mask_cls[0]))
    ss = 1 / (1 + np.exp(-s))
    expected = np.exp(ss / 0.1) / np.exp(ss / 0.1).sum(-1, keepdims=True)
    for info in out["segments_info"]:
        q = info["query_id"]
        assert info["class_prob"] == pytest.approx(
            float(expected[q].max()), rel=1e-4)
