"""Inference engine: keyframe memory build + joint panoptic prediction +
O(1) per-frame decode of the remaining views.

TPU-native equivalent of `PanSt3R.forward_inference_multi_ar`
(/root/reference/src/panst3r/panst3r.py:169-284) and the must3r inference
drivers (engine/must3r.py).  Design differences, deliberate:

- The reference re-jits nothing and chunks dynamically (`batched_map`,
  `max_bs`); here every stage is a separately jitted function with static
  shapes — encoder/DINO chunks, memory update (init-batch and +1 variants),
  render chunks, the joint panoptic decode, and the memory-query fast path.
  Each compiles once per (bucket, chunk size) and is reused across views —
  the host loop is free, the device pipeline stays hot.
- Multi-aspect-ratio stacks (`stack_views` / `unstack_tensors`) become
  resolution buckets: one engine instance per bucket; mixed-bucket scenes
  run per bucket and are merged by view index.
- `amp` (torch autocast, :174) becomes bf16 parameter/compute casting.

Pipeline (reference step numbering):
  1. encode all views; select keyframes (linspace | retrieval); reorder
     keyframes-first (:191-196)
  2. build token memory over keyframes ([2, 1, 1, ...] schedule, :204-210);
     render keyframes + DINO; joint mask-transformer decode (:217-245)
  3. non-keyframes: render against frozen memory + prediction heads with
     frozen keyframe queries (:254-273)
  4. inverse permutation (:279-282)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.models import memory as memlib
from panst3r_tpu.models.decoder import postprocess
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.engine.retrieval import (select_keyframes_linspace,
                                          select_keyframes_retrieval)


def _pad_views(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    reps = [arr[-1:]] * (target - arr.shape[0])
    return np.concatenate([arr] + reps, axis=0)


@dataclasses.dataclass
class InferenceEngine:
    model: PanSt3R
    params: dict
    bucket: Bucket
    num_keyframes: int = 16
    chunk: int = 4              # micro-batch for encoder/render (max_bs)
    amp: bool = True            # bf16 compute (reference amp flag)

    def __post_init__(self):
        c = self.model.config
        self.grid = self.bucket.grid(c.encoder.patch_size)
        self.n_tokens = self.grid[0] * self.grid[1]
        if self.amp:
            self.params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if isinstance(p, jnp.ndarray) and
                jnp.issubdtype(p.dtype, jnp.floating) else p,
                self.params)
        self._build_stage_fns()

    def _build_stage_fns(self):
        model, grid = self.model, self.grid
        cast = (lambda x: x.astype(jnp.bfloat16)) if self.amp else (lambda x: x)

        @jax.jit
        def encode(params, images):
            return model.apply(params, cast(images), method=PanSt3R.encode)

        @jax.jit
        def dino(params, images):
            return model.apply(params, cast(images),
                               method=PanSt3R.encode_dino)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def update(params, x, mem, pos):
            new_mem, pm, _ = model.apply(params, x, pos, mem, grid,
                                         method=PanSt3R.decoder_update)
            return new_mem, pm

        @jax.jit
        def render(params, x, pos, mem):
            return model.apply(params, x, pos, mem, grid,
                               method=PanSt3R.decoder_render)

        @jax.jit
        def panoptic_joint(params, feats, images, pos, portrait, cls_emb):
            return model.apply(params, feats, cast(images), pos, portrait,
                               cls_emb, grid, method=PanSt3R.panoptic)

        @jax.jit
        def panoptic_queries(params, feats, images, pos, portrait, cls_emb,
                             queries):
            return model.apply(params, feats, cast(images), pos, portrait,
                               cls_emb, grid, memory_queries=queries,
                               method=PanSt3R.panoptic)

        self._encode, self._dino = encode, dino
        self._update, self._render = update, render
        self._panoptic_joint = panoptic_joint
        self._panoptic_queries = panoptic_queries

    # ------------------------------------------------------------------

    def _encode_all(self, images: np.ndarray):
        """Chunked encoder pass; images (V, H, W, 3) → (V, N, C), (V, N, 2)."""
        V = images.shape[0]
        xs, poss = [], []
        for s in range(0, V, self.chunk):
            img = _pad_views(images[s:s + self.chunk], self.chunk)
            x, pos = self._encode(self.params, jnp.asarray(img)[:, None])
            n = min(self.chunk, V - s)
            xs.append(x[:n, 0])
            poss.append(pos[:n, 0])
        return jnp.concatenate(xs), jnp.concatenate(poss)

    def _dino_chunked(self, images: np.ndarray):
        V = images.shape[0]
        outs = []
        for s in range(0, V, self.chunk):
            img = _pad_views(images[s:s + self.chunk], self.chunk)
            out = self._dino(self.params, jnp.asarray(img)[:, None])
            outs.append(out[:min(self.chunk, V - s), 0])
        return jnp.concatenate(outs)

    def build_memory(self, x_kf, pos_kf):
        """Incremental memory over keyframes: [init, +1, +1, ...]."""
        c = self.model.config
        K = x_kf.shape[0]
        capacity = K * self.n_tokens
        dtype = jnp.bfloat16 if self.amp else jnp.float32
        mem = memlib.init_memory(c.decoder.depth, 1, capacity,
                                 c.decoder.dim, dtype=dtype)
        schedule = c.mem_batches(K)
        start = 0
        for nb in schedule:
            xi = x_kf[None, start:start + nb]
            posi = pos_kf[None, start:start + nb]
            mem, _ = self._update(self.params, xi, mem, posi)
            start += nb
        return mem

    def _render_chunked(self, x, pos, mem):
        """Render V views against frozen memory in chunks."""
        V = x.shape[0]
        pms, ys = [], []
        for s in range(0, V, self.chunk):
            n = min(self.chunk, V - s)
            xi = jnp.concatenate([x[s:s + n]] + [x[s + n - 1:s + n]] *
                                 (self.chunk - n))[None]
            pi = jnp.concatenate([pos[s:s + n]] + [pos[s + n - 1:s + n]] *
                                 (self.chunk - n))[None]
            pm, y = self._render(self.params, xi, pi, mem)
            pms.append(pm[0, :n])
            ys.append(y[0, :n])
        return jnp.concatenate(pms), jnp.concatenate(ys)

    # ------------------------------------------------------------------

    def run(self, images: np.ndarray, portrait: np.ndarray,
            cls_embeddings: np.ndarray,
            num_keyframes: Optional[int] = None,
            use_retrieval: bool = False) -> dict:
        """images: (V, H, W, 3) float32 landscape-canonical dust3r-norm;
        portrait: (V,) bool; cls_embeddings: (ncls, lang_dim).

        Returns {pointmaps: {pts3d, pts3d_local, conf} (V, ...) fp32,
                 pred_logits (Q, ncls), pred_masks (V, Q, Hm, Wm),
                 out_queries, keyframes: list[int]}.
        """
        V = images.shape[0]
        K = min(num_keyframes or self.num_keyframes, V)
        cls_emb = jnp.asarray(cls_embeddings)
        if self.amp:
            cls_emb = cls_emb.astype(jnp.bfloat16)

        x, pos = self._encode_all(images)

        if use_retrieval and V > K:
            keyframes = select_keyframes_retrieval(
                x.astype(jnp.float32), K)
        else:
            keyframes = select_keyframes_linspace(V, K)
        not_keyframes = sorted(set(range(V)) - set(keyframes))
        order = list(keyframes) + not_keyframes

        # Step 1: memory over keyframes.
        kf_idx = jnp.asarray(keyframes)
        mem = self.build_memory(x[kf_idx], pos[kf_idx])

        # Step 2: render + dino + joint panoptic decode on keyframes.
        pm_kf, y_kf = self._render_chunked(x[kf_idx], pos[kf_idx], mem)
        dino_kf = self._dino_chunked(images[np.asarray(keyframes)])
        panout_kf = self._panoptic_joint(
            self.params,
            (x[kf_idx][None], y_kf[None], dino_kf[None]),
            jnp.asarray(images[np.asarray(keyframes)])[None],
            pos[kf_idx][None],
            jnp.asarray(portrait[np.asarray(keyframes)])[None], cls_emb)

        pointmaps = [np.asarray(p, np.float32) for p in pm_kf]
        pred_masks = [np.asarray(m, np.float32)
                      for m in panout_kf["pred_masks"][0]]

        # Step 3: non-keyframes — render-only + frozen-query decode.
        if not_keyframes:
            nk = np.asarray(not_keyframes)
            queries = panout_kf["out_queries"]
            for s in range(0, len(not_keyframes), self.chunk):
                sel = nk[s:s + self.chunk]
                n = len(sel)
                pad = np.concatenate(
                    [sel, np.full(self.chunk - n, sel[-1], sel.dtype)])
                pm_i, y_i = self._render_chunked(
                    x[jnp.asarray(pad)], pos[jnp.asarray(pad)], mem)
                dino_i = self._dino_chunked(images[pad])
                panout_i = self._panoptic_queries(
                    self.params,
                    (x[jnp.asarray(pad)][None], y_i[None], dino_i[None]),
                    jnp.asarray(images[pad])[None],
                    pos[jnp.asarray(pad)][None],
                    jnp.asarray(portrait[pad])[None], cls_emb, queries)
                for j in range(n):
                    pointmaps.append(np.asarray(pm_i[j], np.float32))
                    pred_masks.append(
                        np.asarray(panout_i["pred_masks"][0, j], np.float32))

        # Step 4: inverse permutation back to input order.
        inv = np.argsort(order)
        pm_raw = np.stack([pointmaps[i] for i in inv])
        masks = np.stack([pred_masks[i] for i in inv])

        post = jax.tree_util.tree_map(
            np.asarray, postprocess(jnp.asarray(pm_raw)))
        return {
            "pointmaps": post,
            "pointmaps_raw": pm_raw,
            "pred_logits": np.asarray(panout_kf["pred_logits"][0],
                                      np.float32),
            "pred_masks": masks,
            "out_queries": np.asarray(panout_kf["out_queries"][0]),
            "keyframes": list(keyframes),
        }
