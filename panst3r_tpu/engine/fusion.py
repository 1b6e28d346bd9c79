"""Multi-view-consistent panoptic fusion.

TPU-native equivalents of the reference post-processing
(/root/reference/src/panst3r/engine/postprocess.py):

- ``panoptic_fusion`` — the v1/v2 "standard" fusion (:9-131): per-scene
  prob-weighted argmax over queries *jointly across all views*, per-segment
  area/overlap test, iterated ``niters`` times (v1 = 1, v2 = 2).  The
  reference's sequential per-query Python loop (:80-113) is replaced by a
  fully vectorized keep-mask + cumsum segment-id computation — legal because
  with `isthing=True` (the reference's :84 "temporary fix", i.e. no stuff
  merging) per-query decisions are independent; ids still follow original
  query order, preserving the reference's id assignment.
- ``qubo_fusion`` — the QUBO query-subset selection (:134-336).  The weight
  matrix is a batched min-overlap matmul (vectorized over query pairs); the
  simulated annealing solver runs restarts in parallel (vmap) with an O(N)
  incremental energy delta per flip instead of the reference's O(N²) full
  re-evaluation (:298-312), under jit with `lax.scan` — the reference runs
  this CPU-only (:169-171).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _class_scores(mask_cls, label_mode, cls_threshold, temperature):
    """Per-query scores/labels/keep from class logits (reference :39-51).

    Intentional deviation: with ``temperature`` set (the QUBO path), the
    reference applies sigmoid TWICE (postprocess.py:157 then .sigmoid()
    again at :162 before the softmax) — a quirk that compresses probs
    into [0.5, 0.73].  Here sigmoid is applied once; the softmax
    temperature can absorb the difference and argmax labels are far less
    distorted.
    """
    if label_mode == "sigmoid":
        probs = jax.nn.sigmoid(mask_cls.astype(jnp.float32))
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        keep = scores > cls_threshold
        if temperature is not None:
            soft = jax.nn.softmax(probs / temperature, axis=-1)
            scores, labels = soft.max(-1), soft.argmax(-1)
    else:
        soft = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
        scores, labels = soft.max(-1), soft.argmax(-1)
        ncls = mask_cls.shape[-1] - 1
        keep = (labels != ncls) & (scores > cls_threshold)
    return scores, labels, keep


def _fusion_scores(mask_cls, mask_pred, true_shape, label_mode, cls_threshold,
                   temperature):
    """Shared prep: upsampled sigmoid masks + per-query scores/labels.

    Mask math runs in bf16 (sigmoid probabilities in [0,1] — well within
    bf16 range; area sums accumulate in f32 downstream).
    """
    B, V, Q = mask_pred.shape[:3]
    H, W = true_shape
    masks = jax.nn.sigmoid(mask_pred.astype(jnp.float32)).astype(jnp.bfloat16)
    masks = jax.image.resize(masks, (B, V, Q, H, W), method="bilinear")
    scores, labels, keep = _class_scores(mask_cls, label_mode, cls_threshold,
                                         temperature)
    return masks, scores, labels, keep


def panoptic_fusion(mask_cls, mask_pred, true_shape: tuple[int, int],
                    label_mode: str = "sigmoid", cls_threshold: float = 0.1,
                    temperature=None, mask_threshold: float = 0.25,
                    overlap_threshold: float = 0.5, niters: int = 2,
                    void_confidence: float = 0.1, with_conf: bool = True):
    """v2 fusion (v1 = niters 1, thresholds 0.5/0.8 — reference :9-11).

    mask_cls: (B, Q, ncls) logits; mask_pred: (B, V, Q, h, w) logits;
    true_shape: static output (H, W).

    Returns list of per-scene dicts {'pan': (V, H, W) int32 segment ids,
    'segments_info': [{'id', 'query_id', 'category_id'}...], 'conf'}.
    """
    pan, conf, seg_ids, seg_cls, seg_valid = _fusion_full(
        mask_cls, mask_pred, true_shape, label_mode, cls_threshold,
        temperature, mask_threshold, overlap_threshold, niters,
        void_confidence)

    # Host transfers: segment ids fit uint16, confidence in f16 — halves
    # the host-link traffic (matters on slow host↔device links).
    pan_host = np.asarray(pan.astype(jnp.uint16)).astype(np.int32)
    conf_host = (np.asarray(conf.astype(jnp.float16)).astype(np.float32)
                 if with_conf else None)
    seg_ids_h = np.asarray(seg_ids)
    seg_cls_h = np.asarray(seg_cls)
    seg_valid_h = np.asarray(seg_valid)

    results = []
    for b in range(mask_cls.shape[0]):
        infos = []
        ids, cls, valid = seg_ids_h[b], seg_cls_h[b], seg_valid_h[b]
        for q in range(ids.shape[0]):
            if valid[q]:
                infos.append({"id": int(ids[q]), "query_id": int(q),
                              "category_id": int(cls[q])})
        results.append({"pan": pan_host[b],
                        "segments_info": infos,
                        "conf": conf_host[b] if with_conf else None})
    return results


@functools.partial(jax.jit, static_argnames=("true_shape", "label_mode",
                                             "niters"))
def _fusion_full(mask_cls, mask_pred, true_shape, label_mode, cls_threshold,
                 temperature, mask_threshold, overlap_threshold, niters,
                 void_confidence):
    """One fused program: score prep + iterations (the big (B,V,Q,H,W)
    sigmoid-mask tensor stays bf16 and never round-trips HBM in fp32)."""
    masks, scores, labels, keep = _fusion_scores(
        mask_cls, mask_pred, true_shape, label_mode, cls_threshold,
        temperature)
    return _fusion_iters(masks, scores, keep, labels, mask_threshold,
                         overlap_threshold, niters, void_confidence)


@functools.partial(jax.jit, static_argnames=("label_mode", "niters"))
def _fusion_presigmoid(mask_cls, masks, label_mode, cls_threshold,
                       temperature, mask_threshold, overlap_threshold,
                       niters, void_confidence):
    """Fusion over PRE-sigmoided, pre-padded masks (B, V, Q, H, W) —
    the mixed-aspect-ratio path where per-view upsampling + zero padding
    happened upstream."""
    scores, labels, keep = _class_scores(mask_cls, label_mode, cls_threshold,
                                         temperature)
    return _fusion_iters(masks, scores, keep, labels, mask_threshold,
                         overlap_threshold, niters, void_confidence)


def panoptic_fusion_multi_ar(mask_cls, mask_pred_views: Sequence,
                             true_shapes: Sequence[tuple[int, int]],
                             label_mode: str = "sigmoid",
                             cls_threshold: float = 0.1, temperature=None,
                             mask_threshold: float = 0.25,
                             overlap_threshold: float = 0.5, niters: int = 2,
                             void_confidence: float = 0.1,
                             with_conf: bool = True) -> list[dict]:
    """Mixed-aspect-ratio scene fusion (reference postprocess.py:17-27,
    124-126): per view, sigmoid → bilinear upsample to that view's true
    shape → zero-pad to the max shape; fuse jointly (padding never exceeds
    mask_threshold so padded pixels stay void and contribute no area);
    crop each view's maps back to its true shape.

    mask_cls: (Q, ncls) logits; mask_pred_views: per-view (Q, h_i, w_i)
    logits; true_shapes: per-view (H_i, W_i).  Single scene (B=1).
    """
    from panst3r_tpu.ops.image import resize_bilinear_hw

    Hm = max(h for h, _ in true_shapes)
    Wm = max(w for _, w in true_shapes)
    padded = []
    for m, (h, w) in zip(mask_pred_views, true_shapes):
        pm = jax.nn.sigmoid(jnp.asarray(m, jnp.float32)).astype(jnp.bfloat16)
        pm = resize_bilinear_hw(pm, h, w)               # (Q, h, w)
        pm = jnp.pad(pm, ((0, 0), (0, Hm - h), (0, Wm - w)))
        padded.append(pm)
    masks = jnp.stack(padded)[None]                     # (1, V, Q, Hm, Wm)

    pan, conf, seg_ids, seg_cls, seg_valid = _fusion_presigmoid(
        jnp.asarray(mask_cls)[None], masks, label_mode, cls_threshold,
        temperature, mask_threshold, overlap_threshold, niters,
        void_confidence)

    pan_h = np.asarray(pan[0].astype(jnp.uint16)).astype(np.int32)
    conf_h = np.asarray(conf[0].astype(jnp.float16)).astype(np.float32)
    ids, cls, valid = (np.asarray(seg_ids[0]), np.asarray(seg_cls[0]),
                       np.asarray(seg_valid[0]))
    infos = [{"id": int(ids[q]), "query_id": int(q),
              "category_id": int(cls[q])}
             for q in range(ids.shape[0]) if valid[q]]
    return [{
        "pan": [pan_h[i, :h, :w] for i, (h, w) in enumerate(true_shapes)],
        "segments_info": infos,
        "conf": ([conf_h[i, :h, :w] for i, (h, w) in enumerate(true_shapes)]
                 if with_conf else None),
    }]


def _fusion_iters(masks, scores, keep, labels, mask_threshold,
                  overlap_threshold, niters, void_confidence,
                  axis_name=None):
    """Iterated argmax fusion in compare-select (gather-free) form.

    A gather/scatter formulation (`take_along_axis` over the query axis,
    `.at[winner].add` per-query areas) lowers to scalar-speed custom
    fusions on TPU — an xplane trace of the serve program showed ~100 ms
    /scene in those ops at 8×384×512.  Every per-pixel "value at the
    winning query" is instead computed as a one-hot compare-select
    reduction over the Q axis — streaming VPU passes XLA fuses with the
    `winner == q` comparison, so nothing but the (B,Q,V,H,W) prob-mask
    tensor itself ever crosses HBM.  Results are bit-identical: the
    one-hot has exactly one nonzero per pixel (argmax index), and the
    per-query area sum counts the same winner/validity predicate the
    scatter-add accumulated.
    """
    B, V, Q, H, W = masks.shape
    pm = masks.transpose(0, 2, 1, 3, 4)            # (B, Q, V, H, W)
    prob_masks = pm * scores.astype(pm.dtype)[:, :, None, None, None]

    # With ``axis_name`` the VIEW axis is sharded over a mesh axis
    # (shard_map): the ONLY cross-view coupling is the per-query integer
    # area sums, so a psum makes every device compute identical
    # `selected`/`seg_ids` — bit-exact with the single-device fusion
    # (integer addition is order-free).  This is the distributed
    # query-fusion of SURVEY §5.8 (the reference fuses on one GPU/CPU).
    def _vsum(x):
        tot = x.sum((2, 3, 4))                     # (B, Q) over local views
        return jax.lax.psum(tot, axis_name) if axis_name else tot

    # Per-query area at the 0.5 level — alive-independent (one pass).
    orig_area = _vsum((pm >= 0.5).astype(jnp.int32))        # (B, Q)

    qid = jnp.arange(Q, dtype=jnp.int32)[None, :, None, None, None]

    alive = keep
    winner = pm_win = selected = None
    for _ in range(niters):
        neg = jnp.where(alive[:, :, None, None, None], prob_masks, -jnp.inf)
        winner = jnp.argmax(neg, axis=1).astype(jnp.int32)  # (B, V, H, W)
        onehot = winner[:, None] == qid                # (B, Q, V, H, W)
        pm_win = jnp.sum(jnp.where(onehot, pm, 0), axis=1)  # pm[winner]
        alive_win = jnp.any(onehot & alive[:, :, None, None, None], axis=1)
        win_valid = (pm_win >= mask_threshold) & alive_win
        mask_area = _vsum((onehot & win_valid[:, None])
                          .astype(jnp.int32))      # (B, Q), global over V
        selected = (alive & (mask_area > 0) & (orig_area > 0)
                    & (mask_area / jnp.maximum(orig_area, 1)
                       >= overlap_threshold))
        alive = selected
        # Stash this iteration's pixel assignment for the final map.
        pix_assigned = win_valid

    # Segment ids in original query order (reference :103-104).  The pan map
    # uses the *entering* winner of the final iteration restricted to the
    # queries that survived its selection test — pixels whose winner was
    # dropped stay void, exactly like the reference's in-loop assignment.
    seg_ids = jnp.cumsum(selected, axis=1) * selected          # (B, Q)
    onehot = winner[:, None] == qid
    sel_at_winner = jnp.any(onehot & selected[:, :, None, None, None], axis=1)
    assigned = pix_assigned & sel_at_winner
    seg_at_winner = jnp.sum(
        jnp.where(onehot, seg_ids[:, :, None, None, None], 0), axis=1)
    pan = jnp.where(assigned, seg_at_winner, 0).astype(jnp.int32)
    conf = jnp.where(assigned, pm_win.astype(jnp.float32), void_confidence)
    return pan, conf, seg_ids, labels, selected


_FUSION_SHARDED_CACHE: dict = {}


def fusion_sharded(mask_cls, mask_pred, true_shape: tuple[int, int], mesh,
                   axis: str = "mem", label_mode: str = "sigmoid",
                   cls_threshold: float = 0.1, temperature=None,
                   mask_threshold: float = 0.25,
                   overlap_threshold: float = 0.5, niters: int = 2,
                   void_confidence: float = 0.1):
    """View-sharded panoptic fusion (SURVEY §5.8 distributed query-fusion).

    The (B, V, Q, h, w) mask tensor is sharded on its VIEW axis over
    ``mesh[axis]`` — at 50 views / full res it is ~790 MB, the piece that
    outgrows one chip first.  Each device runs the full compare-select
    fusion on its view shard; the per-query area sums (the only
    cross-view coupling) are integer psums, so selection/ids are
    bit-exact with the single-device `_fusion_full`
    (tests/test_sharding.py::test_fusion_sharded_matches).  Returns
    (pan, conf, seg_ids, labels, selected) with pan/conf sharded on V.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    nshard = mesh.shape[axis]
    V = mask_pred.shape[1]
    assert V % nshard == 0, f"views {V} not divisible by {axis}={nshard}"

    # Compiled-program cache: rebuilding jit(shard_map(...)) per call
    # would retrace every scene (ADVICE r4) — expensive exactly in the
    # 50-view streaming regime this path targets.  Keyed on the mesh and
    # every static fusion parameter; `temperature` may be an array, in
    # which case it rides as a traced argument.
    temp_static = (temperature if isinstance(temperature,
                                             (int, float, type(None)))
                   else "traced")
    key = (mesh, axis, true_shape, label_mode, cls_threshold, temp_static,
           mask_threshold, overlap_threshold, niters, void_confidence)
    fn = _FUSION_SHARDED_CACHE.get(key)
    if fn is None:
        from jax import shard_map

        def local(mask_cls, mask_pred, temp):
            masks, scores, labels, keep = _fusion_scores(
                mask_cls, mask_pred, true_shape, label_mode, cls_threshold,
                temperature if temp_static != "traced" else temp)
            return _fusion_iters(masks, scores, keep, labels,
                                 mask_threshold, overlap_threshold, niters,
                                 void_confidence, axis_name=axis)

        spec_v = P(None, axis)              # (B, V, ...) sharded on views
        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(), spec_v, P()),
            out_specs=(spec_v, spec_v, P(), P(), P())))
        _FUSION_SHARDED_CACHE[key] = fn
    temp_arg = (jnp.zeros(()) if temp_static != "traced"
                else jnp.asarray(temperature))
    args = (jnp.asarray(mask_cls),
            jax.device_put(jnp.asarray(mask_pred),
                           NamedSharding(mesh, P(None, axis))),
            temp_arg)
    return fn(*args)


# ---------------------------------------------------------------- QUBO ----

def qubo_weights(masks, cls_probs=None, penalty: float = 1.0,
                 min_cls_prob: float = 0.0, cutoff: float = 0.0,
                 prob_weighted: bool = False):
    """Weight matrix for query-subset selection (reference :229-260).

    masks: (Q, V, H, W) sigmoid masks; cls_probs: (Q, ncls) optional.
    Diag = mask area; off-diag = -(1+penalty)·pairwise min-overlap / 2
    (thresholded at ``cutoff``); normalized by pixels × views.  With
    ``prob_weighted`` masks scale by their max class prob; queries whose
    class prob never reaches ``min_cls_prob`` are zeroed (:238-243).
    """
    Q, V, H, W = masks.shape
    if cls_probs is not None:
        if prob_weighted:
            masks = masks * cls_probs.max(-1)[:, None, None, None]
        bad = (cls_probs < min_cls_prob).all(-1)
        masks = jnp.where(bad[:, None, None, None], 0.0, masks)
    flat = masks.reshape(Q, -1)
    # Pairwise min-overlap, one query row at a time (Q·P per step — the
    # full (Q, Q, P) broadcast would be tens of GB at 512px).
    overlap = jax.lax.map(lambda row: jnp.minimum(row[None], flat).sum(-1),
                          flat)                                # (Q, Q)
    overlap = jnp.where(overlap > cutoff, overlap, 0.0)
    area = flat.sum(-1)
    W_mat = -(1.0 + penalty) * overlap / 2.0
    W_mat = W_mat.at[jnp.arange(Q), jnp.arange(Q)].set(area)
    W_mat = W_mat / (H * W) / V
    return -W_mat  # reference returns -W (:260)


@functools.partial(jax.jit, static_argnames=("num_iters", "num_restarts"))
def solve_qubo_sa(W, key, num_iters: int = 10000, T0: float = 0.5,
                  T_end: float = 1e-4, lambda_reg: float = 1e-3,
                  num_restarts: int = 20):
    """Simulated annealing, restarts in parallel (reference :266-336).

    Minimizes x^T W x + λ·mean(x) over x ∈ {0,1}^N with geometric cooling.
    Incremental ΔE per bit flip (O(N)) — exact, unlike a full re-eval it
    keeps the scan light; restarts vmap across the batch dimension.
    """
    N = W.shape[0]
    cooling = (T_end / T0) ** (1.0 / num_iters)

    def single(key):
        k_init, k_scan = jax.random.split(key)
        x0 = jax.random.bernoulli(k_init, 0.5, (N,)).astype(jnp.float32)
        e0 = x0 @ W @ x0 + lambda_reg * x0.mean()

        def step(carry, inp):
            x, e, best_x, best_e, T = carry
            kj, ku = inp
            j = jax.random.randint(kj, (), 0, N)
            s = 1.0 - 2.0 * x[j]
            delta = 2.0 * s * (W[j] @ x) + W[j, j] + lambda_reg * s / N
            accept = (delta < 0) | (jax.random.uniform(ku) <
                                    jnp.exp(-delta / T))
            x = jnp.where(accept, x.at[j].add(s), x)
            e = jnp.where(accept, e + delta, e)
            better = e < best_e
            best_x = jnp.where(better, x, best_x)
            best_e = jnp.where(better, e, best_e)
            return (x, e, best_x, best_e, T * cooling), None

        keys = jax.random.split(k_scan, num_iters * 2).reshape(num_iters, 2, -1)
        (x, e, best_x, best_e, _), _ = jax.lax.scan(
            step, (x0, e0, x0, e0, T0), (keys[:, 0], keys[:, 1]))
        return best_x, best_e

    xs, es = jax.vmap(single)(jax.random.split(key, num_restarts))
    best = jnp.argmin(es)
    return xs[best] > 0.5, es[best]


def qubo_fusion(mask_cls, mask_pred, true_shape: tuple[int, int],
                label_mode: str = "sigmoid", temperature=None,
                prob_threshold: float = 0.01, num_restarts: int = 20,
                seed: int = 0):
    """QUBO-based fusion (reference panoptic_inference_qubo :134-219)."""
    B, V, Q = mask_pred.shape[:3]
    H, W = true_shape
    masks_all = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
    masks_all = jax.image.resize(masks_all, (B, V, Q, H, W),
                                 method="bilinear")
    if label_mode == "sigmoid":
        probs_all = jax.nn.sigmoid(mask_cls.astype(jnp.float32))
        if temperature is not None:
            # Bit-parity quirk: the reference applies sigmoid TWICE when a
            # temperature is set (postprocess.py:157 sigmoid, then :162
            # softmax(x.sigmoid()/T) on the already-sigmoided tensor).
            # Replicated deliberately so QUBO class probabilities match the
            # released checkpoints' behavior.
            probs_all = jax.nn.softmax(jax.nn.sigmoid(probs_all) / temperature,
                                       axis=-1)
    else:
        probs_all = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
        probs_all = probs_all[..., :-1]

    results = []
    for b in range(B):
        masks = masks_all[b].transpose(1, 0, 2, 3)             # (Q, V, H, W)
        probs = probs_all[b]
        Wm = qubo_weights(masks, cls_probs=probs)
        sol, _ = solve_qubo_sa(Wm, jax.random.PRNGKey(seed + b),
                               num_restarts=num_restarts)
        sol = np.asarray(sol)
        sel_idx = np.nonzero(sol)[0]

        if sel_idx.size == 0:
            results.append({"pan": np.zeros((V, H, W), np.int32),
                            "segments_info": [],
                            "conf": np.zeros((V, H, W), np.float32)})
            continue

        sel_masks = np.asarray(masks)[sel_idx]                 # (S, V, H, W)
        conf = sel_masks.max(0)
        inst = sel_masks.argmax(0)                             # (V, H, W)
        cls_probs = np.asarray(probs)[sel_idx]
        cls_ids = cls_probs.argmax(-1)
        cls_p = cls_probs.max(-1)

        pan = np.zeros_like(inst, dtype=np.int32)
        infos = []
        new_id = 1
        for si in np.unique(inst):
            region = inst == si
            mask_conf = float(conf[region].mean())
            if cls_p[si] * mask_conf < prob_threshold:
                continue
            pan[region] = new_id
            infos.append({"id": new_id, "query_id": int(sel_idx[si]),
                          "class_prob": float(cls_p[si]),
                          "mask_conf": mask_conf,
                          "category_id": int(cls_ids[si]),
                          "area": int(region.sum())})
            new_id += 1
        results.append({"pan": pan, "segments_info": infos, "conf": conf})
    return results


def panoptic_fusion_v1(mask_cls, mask_pred, true_shape, **kw):
    """v1 = v2 with one iteration and stricter thresholds (reference :9-11)."""
    kw.setdefault("mask_threshold", 0.5)
    kw.setdefault("overlap_threshold", 0.8)
    return panoptic_fusion(mask_cls, mask_pred, true_shape, niters=1, **kw)
