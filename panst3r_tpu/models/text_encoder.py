"""Open-vocabulary text embedding provider.

The reference wraps HF SigLIP/SigLIP2/CLIP text towers
(/root/reference/src/panst3r/model/text_encoder.py:33-103) with two modes:
`fixed_vocab` precomputes embeddings once via `set_vocab` then frees the
tower (text_encoder.py:82-92), or a live tokenizer+tower for the demo.

TPU design: the text tower runs rarely (vocab changes, not per step), so it
is *not* part of the jitted graph.  The primary path is a precomputed
embedding table keyed by class name (`set_vocab` / `embed`); live
open-vocab serving plugs a tower in via ``tower_fn`` — torch-free native
flax towers exist for ALL THREE reference options
(models/siglip_text.NativeTextTower for siglip, the same tower with
SIGLIP2_CONFIG + tokenize_siglip2 for siglip2,
models/clip_text.NativeClipTower for clip); `_hf_tower` below remains the
torch/HF fallback when only an HF checkpoint directory is at hand.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

from panst3r_tpu.core import config as cfg

MODEL_CONFIGS = {
    # Mirrors reference MODEL_CONFIGS (text_encoder.py:7-30).
    "siglip2": dict(embed_dim=768, template="this is a photo of {}"),
    "siglip": dict(embed_dim=768, template="This is a photo of {}."),
    "clip": dict(embed_dim=512, template="a photo of {}"),
}


@cfg.register
@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    model_name: str = "siglip"
    fixed_vocab: bool = True

    @property
    def embed_dim(self) -> int:
        return MODEL_CONFIGS[self.model_name]["embed_dim"]


class TextEncoder:
    """Host-side class-name → L2-normalized embedding provider."""

    def __init__(self, config: TextEncoderConfig = TextEncoderConfig(),
                 tower_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None):
        self.config = config
        self.embed_dim = config.embed_dim
        self.template = MODEL_CONFIGS[config.model_name]["template"]
        self._tower_fn = tower_fn
        self._table: dict[str, np.ndarray] = {}

    def _run_tower(self, classes: Sequence[str]) -> np.ndarray:
        prompts = [self.template.format(c) for c in classes]
        if self._tower_fn is not None:
            emb = np.asarray(self._tower_fn(prompts), np.float32)
        else:
            emb = _hf_tower(self.config.model_name, prompts)
        assert emb.shape == (len(classes), self.embed_dim)
        return emb

    def set_vocab(self, classes: Sequence[str]) -> None:
        """Precompute and cache embeddings (reference set_vocab :82-92)."""
        emb = self._run_tower(classes)
        for c, e in zip(classes, emb):
            self._table[c] = e

    def load_table(self, classes: Sequence[str], embeddings: np.ndarray):
        """Install precomputed embeddings (e.g. from a checkpoint)."""
        for c, e in zip(classes, np.asarray(embeddings, np.float32)):
            self._table[c] = e

    def __call__(self, classes: Sequence[str]) -> np.ndarray:
        """(num_classes, embed_dim) L2-normalized (reference :94-103)."""
        missing = [c for c in classes if c not in self._table]
        if missing:
            if self.config.fixed_vocab:
                raise KeyError(
                    f"classes missing from fixed vocab: {missing[:5]}... "
                    "call set_vocab first")
            self.set_vocab(missing)
        emb = np.stack([self._table[c] for c in classes])
        return emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True),
                                1e-12)

    def state(self) -> dict:
        return {"classes": list(self._table),
                "embeddings": np.stack(list(self._table.values()))
                if self._table else np.zeros((0, self.embed_dim), np.float32)}


def _hf_tower(model_name: str, prompts: Sequence[str]) -> np.ndarray:
    """Run the HF text tower on CPU (serving path; requires local weights)."""
    hf_names = {"siglip": "google/siglip-base-patch16-224",
                "siglip2": "google/siglip2-base-patch16-224",
                "clip": "openai/clip-vit-base-patch32"}
    import torch
    from transformers import AutoTokenizer, AutoModel

    tok = AutoTokenizer.from_pretrained(hf_names[model_name])
    model = AutoModel.from_pretrained(hf_names[model_name]).eval()
    text_model = getattr(model, "text_model", model)
    outs = []
    with torch.no_grad():
        for i in range(0, len(prompts), 32):
            kw = dict(padding="max_length", max_length=64) \
                if model_name.startswith("siglip") else dict(padding=True)
            inputs = tok(list(prompts[i:i + 32]), return_tensors="pt", **kw)
            outs.append(text_model(**inputs).pooler_output)
    return torch.cat(outs).float().numpy()
