"""Mask2Former-style multi-view query decoder (panoptic head core).

TPU-native equivalent of /root/reference/src/panst3r/model/mask_transformer.py
(540 LoC).  Key semantics preserved:

- 200 learnable queries + query PE; `dec_layers` rounds of [masked
  cross-attention over the **concatenated multi-view** token axis
  (mask_transformer.py:142-145), query self-attention, FFN], post-norm
  residual layers like torch's nn.MultiheadAttention stack (:309-469).
- Open-vocab classification: `lang_embed` → cosine similarity against text
  embeddings × exp(logit_scale) (:224-228).
- Mask prediction: einsum(query mask embeddings, per-view mask features)
  (:279-288 "bqc,bnchw->bnqhw" — here channels-last "bqc,bvhwc->bvqhw").
- Attention masking from the previous layer's mask prediction: bilinear
  resize to the token grid, sigmoid < 0.5 → blocked, and the critical
  "fully-blocked row → unblock" fixup (:172) — implemented as additive bias
  with stop_gradient (:271 .detach()).
- Deep-supervision aux outputs per layer (:200-212); optional two-stage
  top-k query selection (:85-104); prediction heads reusable standalone for
  memory-query decoding of non-keyframes (:215-277, via panoptic_decoder).

The multi-view joint cross-attention (KV length = V·gh·gw) is the hot op —
it runs through the block-sparse Pallas masked-attention kernel, which
skips fully-blocked KV tiles (see ops/pallas/masked_attention.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.ops.attention import flash_attention, masked_attention

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def sine_position_embedding(gh: int, gw: int, dim: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """2D sine PE, normalized — reference PositionEmbeddingSine (:487-527).

    Returns (gh*gw, 2*dim) with y-features first (reference :526 cat order).
    """
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(gh, dtype=jnp.float32) + 1) / (gh + eps) * scale
    x = (jnp.arange(gw, dtype=jnp.float32) + 1) / (gw + eps) * scale
    dim_t = temperature ** (2 * (jnp.arange(dim) // 2) / dim)

    def encode(v):  # (n,) → (n, dim) interleaved sin/cos
        ang = v[:, None] / dim_t
        return jnp.stack([jnp.sin(ang[:, 0::2]), jnp.cos(ang[:, 1::2])],
                         axis=-1).reshape(v.shape[0], -1)

    pe_y = jnp.repeat(encode(y)[:, None], gw, axis=1)   # (gh, gw, dim)
    pe_x = jnp.repeat(encode(x)[None], gh, axis=0)      # (gh, gw, dim)
    return jnp.concatenate([pe_y, pe_x], -1).reshape(gh * gw, 2 * dim)


def pe_with_portrait(gh: int, gw: int, dim: int,
                     portrait: jnp.ndarray) -> jnp.ndarray:
    """Per-view PE honoring the portrait flag (reference :106-119).

    portrait: (B, V) bool.  Landscape views use PE of the (gh, gw) grid;
    portrait views use the PE of the transposed (gw, gh) grid laid back out
    in storage (landscape) order — geometrically consistent with the
    landscape-canonical token layout.  Returns (B, V, gh*gw, 2*dim).
    """
    pe_land = sine_position_embedding(gh, gw, dim)
    pe_port = sine_position_embedding(gw, gh, dim).reshape(gw, gh, -1)
    pe_port = pe_port.transpose(1, 0, 2).reshape(gh * gw, -1)
    return jnp.where(portrait[..., None, None], pe_port[None, None],
                     pe_land[None, None])


class _MHA(nn.Module):
    """torch-style nn.MultiheadAttention (separate q/k/v proj + out-proj)."""

    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, bias=None, blocked=None):
        C = q.shape[-1]
        H = self.num_heads

        def heads(x):
            B, N, _ = x.shape
            return x.reshape(B, N, H, C // H).transpose(0, 2, 1, 3)

        qp = nn.Dense(C, name="q_proj")(q)
        kp = nn.Dense(C, name="k_proj")(k)
        vp = nn.Dense(C, name="v_proj")(v)
        if blocked is not None:
            # (B, Nq, Nk) bool, True = blocked, shared across heads →
            # block-sparse kernel on TPU (see ops/attention.masked_attention).
            out = masked_attention(heads(qp), heads(kp), heads(vp), blocked)
        else:
            out = flash_attention(heads(qp), heads(kp), heads(vp), bias=bias)
        B, _, N, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="out_proj")(out)


class _QueryMLP(nn.Module):
    """3-layer ReLU MLP (reference MLP :472-484)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.out, name="fc2")(x)


@cfg.register
@dataclasses.dataclass(frozen=True)
class MaskTransformerConfig:
    hidden_dim: int = 768
    ff_dim: int = 2048
    mask_dim: int = 256
    num_queries: int = 200
    num_heads: int = 8
    dec_layers: int = 6
    lang_dim: int = 768
    fpn_dims: tuple = (768,)
    two_stage: bool = False

    @property
    def num_feature_levels(self) -> int:
        return len(self.fpn_dims)


class MaskTransformer(nn.Module):
    config: MaskTransformerConfig = MaskTransformerConfig()

    def setup(self):
        c = self.config
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5)
        self.lang_embed = nn.Dense(c.lang_dim)
        self.cls_logit_scale = self.param("cls_logit_scale",
                                          nn.initializers.ones, ())
        self.mask_embed = _QueryMLP(c.hidden_dim, c.mask_dim)
        self.level_embed = self.param("level_embed",
                                      nn.initializers.normal(1.0),
                                      (c.num_feature_levels, c.hidden_dim))
        self.input_proj = [
            nn.Conv(c.hidden_dim, (1, 1), name=f"input_proj_{i}")
            if d != c.hidden_dim else None
            for i, d in enumerate(c.fpn_dims)]
        if not c.two_stage:
            self.query_feat = self.param("query_feat",
                                         nn.initializers.normal(1.0),
                                         (c.num_queries, c.hidden_dim))
            self.query_pe = self.param("query_embed",
                                       nn.initializers.normal(1.0),
                                       (c.num_queries, c.hidden_dim))
        self.cross_attn_layers = [
            _MHA(c.num_heads, name=f"cross_attn_{i}")
            for i in range(c.dec_layers)]
        self.cross_norms = [nn.LayerNorm(epsilon=1e-5, name=f"cross_norm_{i}")
                            for i in range(c.dec_layers)]
        self.self_attn_layers = [
            _MHA(c.num_heads, name=f"self_attn_{i}")
            for i in range(c.dec_layers)]
        self.self_norms = [nn.LayerNorm(epsilon=1e-5, name=f"self_norm_{i}")
                           for i in range(c.dec_layers)]
        self.ffn_fc1 = [nn.Dense(c.ff_dim, name=f"ffn_fc1_{i}")
                        for i in range(c.dec_layers)]
        self.ffn_fc2 = [nn.Dense(c.hidden_dim, name=f"ffn_fc2_{i}")
                        for i in range(c.dec_layers)]
        self.ffn_norms = [nn.LayerNorm(epsilon=1e-5, name=f"ffn_norm_{i}")
                          for i in range(c.dec_layers)]

    def _class_logits(self, dec_out, cls_embeddings):
        lang = self.lang_embed(dec_out)
        lang = lang / (jnp.linalg.norm(lang, axis=-1, keepdims=True) + 1e-7)
        return jnp.exp(self.cls_logit_scale) * jnp.einsum(
            "bqc,nc->bqn", lang, cls_embeddings)

    def prediction_heads(self, output, mask_feats, cls_embeddings,
                         attn_grids=None, attn_feats=None,
                         need_mask: bool = True):
        """output: (B, Q, C); mask_feats: (B, V, Hm, Wm, mask_dim) or a list
        of such per resolution bucket (the reference's multi-AR lists,
        mask_transformer.py:130-146,215-277).

        Returns (outputs_class (B, Q, num_cls),
                 outputs_mask — same structure as mask_feats, per bucket
                 (B, V_b, Q, Hm_b, Wm_b), or None,
                 attn_blocked (B, Q, Σ_b V_b·gh_b·gw_b) bool or None —
                 True = may not attend, shared across heads).

        TPU optimization: the reference computes the full-resolution mask
        einsum every layer then bilinearly downsamples it for the attention
        mask (:279-288).  Bilinear resize and the channel-contraction einsum
        commute (both linear per pixel), so the attention mask is computed
        directly against token-grid-resized mask features (``attn_feats``,
        64× fewer FLOPs at stride 2) — mathematically identical; the
        full-resolution mask is only materialized when ``need_mask``
        (final layer, and every layer under deep supervision).
        """
        c = self.config
        single = not isinstance(mask_feats, (list, tuple))
        mf_list = [mask_feats] if single else list(mask_feats)

        dec_out = self.decoder_norm(output)
        outputs_class = self._class_logits(dec_out, cls_embeddings)
        mask_embed = self.mask_embed(dec_out)
        outputs_mask = None
        if need_mask:
            outputs_mask = [jnp.einsum("bqc,bvhwc->bvqhw", mask_embed, mf)
                            for mf in mf_list]
            if single:
                outputs_mask = outputs_mask[0]

        attn_blocked = None
        if attn_grids is not None:
            if not isinstance(attn_grids, list):
                attn_grids = [attn_grids]
            if attn_feats is None:
                attn_feats = [
                    jax.image.resize(mf, (*mf.shape[:2], gh, gw,
                                          mf.shape[-1]), method="bilinear")
                    for mf, (gh, gw) in zip(mf_list, attn_grids)]
            B = mf_list[0].shape[0]
            Q = output.shape[1]
            blocked_parts = []
            for af in attn_feats:
                am = jnp.einsum("bqc,bvhwc->bvqhw", mask_embed, af)
                bl = jax.nn.sigmoid(am) < 0.5           # True = blocked (:272)
                _, Vb, _, ghb, gwb = bl.shape
                blocked_parts.append(
                    bl.transpose(0, 2, 1, 3, 4).reshape(B, Q,
                                                        Vb * ghb * gwb))
            blocked = jnp.concatenate(blocked_parts, axis=-1)
            # Fully-blocked rows attend everywhere (:172).  Kept boolean
            # (B, Q, Nk), head-shared — the TPU kernel consumes it directly
            # (no (B, H, Q, Nk) additive-bias broadcast in HBM); gradients
            # cannot flow through the comparison, matching :271 .detach().
            all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
            attn_blocked = jnp.where(all_blocked, False, blocked)
        return outputs_class, outputs_mask, attn_blocked

    def decode_with_queries(self, memory_queries, mask_feats, cls_embeddings):
        """Non-keyframe fast path: prediction heads only against frozen
        keyframe queries (reference panoptic_decoder.py:68-76)."""
        ocls, omask, _ = self.prediction_heads(memory_queries, mask_feats,
                                               cls_embeddings, None)
        return {"pred_logits": ocls, "pred_masks": omask,
                "out_queries": memory_queries}

    def __call__(self, fpn_f: Sequence, mask_feats,
                 cls_embeddings: jnp.ndarray, portrait,
                 deep_supervision: bool = True):
        """fpn_f: per-level (B, V, gh, gw, C) — or per-level *lists* over
        resolution buckets; mask_feats: (B, V, Hm, Wm, mask_dim) or list;
        portrait: (B, V) bool or list.  Multi-bucket inputs are jointly
        decoded: all buckets' tokens concatenate into one cross-attention
        context (the reference's multi-AR joint prediction,
        mask_transformer.py:130-146)."""
        c = self.config
        assert len(fpn_f) == c.num_feature_levels

        single = not isinstance(fpn_f[0], (list, tuple))
        fpn_b = [[f] for f in fpn_f] if single else [list(f) for f in fpn_f]
        mf_list = [mask_feats] if single else list(mask_feats)
        port_list = [portrait] if single else list(portrait)
        n_buckets = len(fpn_b[0])

        B = fpn_b[0][0].shape[0]
        grids = [(f.shape[2], f.shape[3]) for f in fpn_b[0]]
        # Token-grid mask features for attention-mask computation (see
        # prediction_heads): resized once, reused by every layer.
        attn_feats = [
            jax.image.resize(mf, (*mf.shape[:2], gh, gw, mf.shape[-1]),
                             method="bilinear")
            for mf, (gh, gw) in zip(mf_list, grids)]

        src, pos = [], []
        for lvl in range(c.num_feature_levels):
            src_parts, pos_parts = [], []
            for bkt in range(n_buckets):
                f = fpn_b[lvl][bkt]
                _, V, gh, gw, _ = f.shape
                if self.input_proj[lvl] is not None:
                    f = self.input_proj[lvl](f)
                src_parts.append(f.reshape(B, V * gh * gw, c.hidden_dim)
                                 + self.level_embed[lvl])
                pe = pe_with_portrait(gh, gw, c.hidden_dim // 2,
                                      port_list[bkt])
                pos_parts.append(pe.reshape(B, V * gh * gw, c.hidden_dim)
                                 .astype(f.dtype))
            src.append(jnp.concatenate(src_parts, axis=1))
            pos.append(jnp.concatenate(pos_parts, axis=1))

        mask_feats = mf_list if not single else mf_list[0]
        attn_grids = grids if not single else grids[0]
        attn_feats_arg = attn_feats

        if c.two_stage:
            output, query_embed = self._query_selection(src, pos,
                                                        cls_embeddings)
        else:
            output = jnp.broadcast_to(self.query_feat[None],
                                      (B, c.num_queries, c.hidden_dim))
            query_embed = jnp.broadcast_to(self.query_pe[None],
                                           (B, c.num_queries, c.hidden_dim))

        ocls, omask, attn_blocked = self.prediction_heads(
            output, mask_feats, cls_embeddings, attn_grids,
            attn_feats=attn_feats_arg, need_mask=deep_supervision)
        if c.two_stage:
            output = jax.lax.stop_gradient(output)

        pred_cls, pred_masks = [ocls], [omask]
        for i in range(c.dec_layers):
            lvl = i % c.num_feature_levels
            # Masked cross-attention: queries ← multi-view tokens.
            attn_out = self.cross_attn_layers[i](
                output + query_embed, src[lvl] + pos[lvl], src[lvl],
                blocked=attn_blocked)
            output = self.cross_norms[i](output + attn_out)
            # Self-attention over queries.
            sa = self.self_attn_layers[i](
                output + query_embed, output + query_embed, output)
            output = self.self_norms[i](output + sa)
            # FFN (post-norm).
            h = self.ffn_fc2[i](nn.relu(self.ffn_fc1[i](output)))
            output = self.ffn_norms[i](output + h)

            last = i == c.dec_layers - 1
            ocls, omask, attn_blocked = self.prediction_heads(
                output, mask_feats, cls_embeddings,
                None if last else attn_grids, attn_feats=attn_feats_arg,
                need_mask=deep_supervision or last)
            pred_cls.append(ocls)
            pred_masks.append(omask)

        out = {
            "pred_logits": pred_cls[-1],
            "pred_masks": pred_masks[-1],
            "out_queries": jax.lax.stop_gradient(output),
        }
        if deep_supervision:
            out["aux_outputs"] = [
                {"pred_logits": a, "pred_masks": b}
                for a, b in zip(pred_cls[:-1], pred_masks[:-1])]
        return out

    def _query_selection(self, src, pos, cls_embeddings):
        """Two-stage top-k proposal selection (reference :85-104)."""
        c = self.config
        feats = jnp.concatenate(src, axis=1)       # (B, N, C)
        pos_all = jnp.concatenate(pos, axis=1)
        score = self._class_logits(self.decoder_norm(feats), cls_embeddings)
        top = jax.lax.top_k(score.max(-1), c.num_queries)[1]  # (B, Q)
        output = jnp.take_along_axis(feats, top[..., None], axis=1)
        query_embed = jnp.take_along_axis(pos_all, top[..., None], axis=1)
        return output, query_embed
