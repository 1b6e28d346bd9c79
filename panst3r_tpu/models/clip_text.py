"""Native JAX CLIP text tower for live open-vocabulary serving.

Closes the reference's third text-tower option torch-free
(/root/reference/src/panst3r/model/text_encoder.py:7-30,57-58: CLIP
`openai/clip-vit-base-patch32`, pooled output WITHOUT the projection —
the reference reads ``CLIPTextModel(...).pooler_output``).

Semantics transcribed from HF `CLIPTextTransformer`:
- token + learned position embeddings (context 77)
- pre-LN blocks with CAUSAL self-attention (+ padding mask),
  quick_gelu MLP (x * sigmoid(1.702 x)), LayerNorm eps 1e-5
- final LayerNorm, pooling at the FIRST EOS position per sequence.

Tokenization: CLIP's lowercase byte-BPE with ``</w>`` word endings, read
from the checkpoint's local ``vocab.json`` + ``merges.txt``
(zero-egress: files ship with any downloaded HF CLIP checkpoint).
"""
from __future__ import annotations

import dataclasses
import json
import re
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core import config as cfg
from panst3r_tpu.ops.attention import dot_product_attention


@cfg.register
@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_dim: int = 2048
    max_positions: int = 77
    eps: float = 1e-5               # HF clip layer_norm_eps
    eos_id: int = 49407


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class _ClipBlock(nn.Module):
    c: ClipTextConfig

    @nn.compact
    def __call__(self, x, bias):
        c = self.c
        h = nn.LayerNorm(epsilon=c.eps, name="layer_norm1")(x)
        B, N, C = h.shape
        hd = C // c.heads

        def heads(t):
            return t.reshape(B, N, c.heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(C, name="q_proj")(h))
        k = heads(nn.Dense(C, name="k_proj")(h))
        v = heads(nn.Dense(C, name="v_proj")(h))
        att = dot_product_attention(q, k, v, bias=bias)
        att = att.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, name="out_proj")(att)

        h = nn.LayerNorm(epsilon=c.eps, name="layer_norm2")(x)
        h = nn.Dense(c.mlp_dim, name="fc1")(h)
        h = nn.Dense(C, name="fc2")(quick_gelu(h))
        return x + h


class ClipTextTower(nn.Module):
    config: ClipTextConfig = ClipTextConfig()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        """input_ids: (B, N) int32; attention_mask: (B, N) 1/0.
        Returns (pooled (B, width), last_hidden (B, N, width))."""
        c = self.config
        B, N = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.width))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_positions, c.width))
        x = tok[input_ids] + pos[None, :N]

        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((N, N), neg, jnp.float32), k=1)
        bias = causal[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
            bias = bias + pad.astype(jnp.float32)
        for i in range(c.layers):
            x = _ClipBlock(c, name=f"layer_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=c.eps, name="final_layer_norm")(x)
        # pool at the first EOS per sequence (HF CLIPTextTransformer;
        # for the openai vocab EOS is also the argmax token id)
        is_eos = (input_ids == c.eos_id)
        eos_pos = jnp.argmax(is_eos, axis=1)
        pooled = x[jnp.arange(B), eos_pos]
        return pooled, x


# --------------------------------------------------------------- tokenizer


def _bytes_to_unicode():
    """GPT-2/CLIP byte↔unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# CLIP's token-split pattern uses unicode categories (\p{L}/\p{N}) — the
# stdlib `re` can't express them, so use the `regex` module (baked into
# the image); the ASCII fallback keeps working environments without it
# but tokenizes non-ASCII words (e.g. "café") differently from HF.
try:
    import regex as _regex

    _PAT = _regex.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _regex.IGNORECASE)
except ImportError:  # pragma: no cover
    _PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+",
        re.IGNORECASE)


class ClipTokenizer:
    """CLIP byte-BPE from local ``vocab.json`` + ``merges.txt``."""

    def __init__(self, vocab_path: str, merges_path: str):
        with open(vocab_path, encoding="utf-8") as f:
            self.encoder = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges
                  if m and not m.startswith("#version")]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.bos = self.encoder["<|startoftext|>"]
        self.eos = self.encoder["<|endoftext|>"]
        self._cache: dict[str, list[int]] = {}

    def _bpe(self, token: str) -> list[str]:
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        return list(word)

    def encode(self, text: str) -> list[int]:
        text = re.sub(r"\s+", " ", text.lower()).strip()
        ids: list[int] = []
        for token in _PAT.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            if token in self._cache:
                ids.extend(self._cache[token])
                continue
            enc = [self.encoder[t] for t in self._bpe(token)]
            self._cache[token] = enc
            ids.extend(enc)
        return ids


def tokenize_clip(texts: Sequence[str], tok: ClipTokenizer,
                  max_len: int = 77) -> tuple[np.ndarray, np.ndarray]:
    """HF CLIPTokenizer(padding=True) semantics: BOS + bpe + EOS, pad the
    batch to its longest sequence with EOS (clip pad == eos)."""
    seqs = [[tok.bos] + tok.encode(t)[: max_len - 2] + [tok.eos]
            for t in texts]
    longest = max(len(s) for s in seqs)
    ids = np.full((len(seqs), longest), tok.eos, np.int32)
    mask = np.zeros((len(seqs), longest), np.int32)
    for i, s in enumerate(seqs):
        ids[i, :len(s)] = s
        mask[i, :len(s)] = 1
    return ids, mask


class NativeClipTower:
    """Drop-in ``tower_fn`` for models.text_encoder.TextEncoder: torch-free
    prompt → pooled-embedding path (flax CLIP tower + host byte-BPE)."""

    def __init__(self, params: dict, vocab_path: str, merges_path: str,
                 config: ClipTextConfig = ClipTextConfig()):
        self.model = ClipTextTower(config)
        self.params = params
        self.tok = ClipTokenizer(vocab_path, merges_path)

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        ids, mask = tokenize_clip(prompts, self.tok)
        pooled, _ = self.model.apply({"params": self.params},
                                     jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(pooled, np.float32)
