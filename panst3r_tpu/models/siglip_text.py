"""Native JAX SigLIP text tower for live open-vocabulary serving.

The reference loads HF `SiglipTextModel` at runtime for open-vocab mode
(/root/reference/src/panst3r/model/text_encoder.py:49-66,
gradio_panst3r.py:40); this module is the torch-free equivalent: a flax
transcription of the SigLIP text transformer (pre-norm blocks, tanh-GELU
MLP, full — non-causal — attention, final LayerNorm, LAST-position pooling
+ linear head, exactly HF `SiglipTextTransformer` semantics including
pooling index -1 over the max_length-padded sequence).

Weights port from an HF checkpoint via
tools/port_torch_checkpoint.port_siglip_text; tokenization runs on host via
sentencepiece (`tokenize_siglip`), reproducing SiglipTokenizer's
canonicalize → encode → append EOS → pad-to-64 pipeline.
"""
from __future__ import annotations

import dataclasses
import re
import string
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core import config as cfg
from panst3r_tpu.ops.attention import flash_attention


@cfg.register
@dataclasses.dataclass(frozen=True)
class SiglipTextConfig:
    vocab_size: int = 32000
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 64
    eps: float = 1e-6               # HF siglip layer_norm_eps


def _gelu_tanh(x):
    return nn.gelu(x, approximate=True)  # HF hidden_act=gelu_pytorch_tanh


class _TextBlock(nn.Module):
    c: SiglipTextConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.c
        h = nn.LayerNorm(epsilon=c.eps, name="layer_norm1")(x)
        B, N, C = h.shape
        hd = C // c.heads

        def heads(t):
            return t.reshape(B, N, c.heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(C, name="q_proj")(h))
        k = heads(nn.Dense(C, name="k_proj")(h))
        v = heads(nn.Dense(C, name="v_proj")(h))
        att = flash_attention(q, k, v, bias=mask_bias)
        att = att.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, name="out_proj")(att)

        h = nn.LayerNorm(epsilon=c.eps, name="layer_norm2")(x)
        h = nn.Dense(c.mlp_dim, name="fc1")(h)
        h = nn.Dense(C, name="fc2")(_gelu_tanh(h))
        return x + h


class SiglipTextTower(nn.Module):
    config: SiglipTextConfig = SiglipTextConfig()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        """input_ids: (B, N) int32 (N = max_positions padded);
        attention_mask: (B, N) 1/0.  Returns (pooled (B, width),
        last_hidden (B, N, width))."""
        c = self.config
        B, N = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.width))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_positions, c.width))
        x = tok[input_ids] + pos[None, :N]

        bias = None
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
            bias = bias.astype(jnp.float32)
        for i in range(c.layers):
            x = _TextBlock(c, name=f"layer_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=c.eps, name="final_layer_norm")(x)
        # HF SiglipTextTransformer pools the LAST position of the padded
        # sequence (trained that way), then a linear head.
        pooled = nn.Dense(c.width, name="head")(x[:, -1])
        return pooled, x


# SigLIP2 text tower (google/siglip2-base-*): architecturally identical
# to SigLIP (same SiglipTextTransformer), trained with the multilingual
# Gemma tokenizer — only vocab size and tokenization differ
# (reference text_encoder.py:8-15, Siglip2TextModel at :54-55).
SIGLIP2_CONFIG = SiglipTextConfig(vocab_size=256000)


def tokenize_siglip2(texts: Sequence[str], spm, max_len: int = 64,
                     bos_id: int = 2, pad_id: int = 0,
                     add_eos: bool = False):
    """Gemma-tokenizer pipeline used by Siglip2Processor: [BOS] + pieces,
    truncate/pad to max_length=64 with the pad token.  (Gemma defaults:
    BOS yes, EOS no — ``add_eos`` exposed in case a checkpoint's
    tokenizer_config differs.)  Returns (ids, attention_mask)."""
    import numpy as np

    ids_all, mask_all = [], []
    budget = max_len - 1 - int(add_eos)
    for t in texts:
        ids = [bos_id] + list(spm.encode(t))[:budget]
        if add_eos:
            ids.append(1)
        mask = [1] * len(ids) + [0] * (max_len - len(ids))
        ids = ids + [pad_id] * (max_len - len(ids))
        ids_all.append(ids)
        mask_all.append(mask)
    return (np.asarray(ids_all, np.int32), np.asarray(mask_all, np.int32))


_PUNCT = re.compile(f"[{re.escape(string.punctuation)}]")


def canonicalize_text(text: str) -> str:
    """SigLIP text canonicalization (big_vision convention the HF
    SiglipTokenizer reproduces): strip punctuation, collapse whitespace."""
    text = _PUNCT.sub("", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def tokenize_siglip(texts: Sequence[str], spm, max_len: int = 64,
                    eos_id: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Host-side tokenization with a sentencepiece processor.

    Returns (input_ids (B, max_len) int32, attention_mask (B, max_len)).
    Mirrors SiglipTokenizer(padding='max_length', max_length=64): encode
    canonicalized text, append EOS, pad with EOS (siglip pad == eos)."""
    ids_all, mask_all = [], []
    for t in texts:
        ids = list(spm.encode(canonicalize_text(t)))[: max_len - 1]
        ids.append(eos_id)
        mask = [1] * len(ids) + [0] * (max_len - len(ids))
        ids = ids + [eos_id] * (max_len - len(ids))
        ids_all.append(ids)
        mask_all.append(mask)
    return (np.asarray(ids_all, np.int32), np.asarray(mask_all, np.int32))


def load_tokenizer(path: str):
    """Host tokenizer with a sentencepiece-like ``encode`` surface.

    Accepts a sentencepiece ``.model`` (needs the sentencepiece package) or
    an HF fast-tokenizer ``tokenizer.json`` (needs only the Rust
    ``tokenizers`` lib, which ships with transformers)."""
    if path.endswith(".json"):
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(path)

        class _Wrap:
            def encode(self, text):
                return tok.encode(text, add_special_tokens=False).ids

        return _Wrap()
    import sentencepiece as sp

    return sp.SentencePieceProcessor(model_file=path)


class NativeTextTower:
    """Drop-in ``tower_fn`` for models.text_encoder.TextEncoder: torch-free
    prompt → pooled-embedding path (flax tower + host tokenizer)."""

    def __init__(self, params: dict, tokenizer,
                 config: SiglipTextConfig = SiglipTextConfig()):
        """tokenizer: a path (see load_tokenizer) or any object with
        ``encode(str) -> list[int]``."""
        self.model = SiglipTextTower(config)
        self.params = params
        self.spm = (load_tokenizer(tokenizer) if isinstance(tokenizer, str)
                    else tokenizer)

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        ids, mask = tokenize_siglip(prompts, self.spm)
        pooled, _ = self.model.apply({"params": self.params},
                                     jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(pooled, np.float32)
