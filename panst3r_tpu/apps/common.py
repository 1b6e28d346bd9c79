"""Shared app bootstrap: preset/checkpoint → warm InferenceEngine.

Both user-facing apps (demo, serving daemon) need the same sequence —
build the preset model, init params at the serving bucket, optionally
load an orbax checkpoint, and pair the weights with the SAME class
names + text-embedding table they were trained with (checkpoint meta;
apps/train.py) — keeping it in one place so the pairing logic cannot
drift between apps.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def build_engine(preset: str, bucket, checkpoint: Optional[str] = None,
                 num_keyframes: int = 4, amp: bool = True,
                 classes: Optional[Sequence[str]] = None,
                 seed: int = 0):
    """Returns (engine, classes, cls_emb).

    Without a checkpoint the class embeddings are random unit vectors
    (architecture demos); with one, classes/cls_emb come from the
    checkpoint meta when present.
    """
    import jax
    import jax.numpy as jnp

    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import (panst3r_v1_config,
                                            panst3r_v2_config, tiny_config,
                                            tiny_v2_config)

    cfg = {"v1": panst3r_v1_config, "v2": panst3r_v2_config,
           "tiny": tiny_config, "tiny_v2": tiny_v2_config}[preset]()
    model = PanSt3R(cfg)
    lang_dim = cfg.panoptic.mask_transformer.lang_dim
    classes = list(classes) if classes is not None \
        else [f"class_{i}" for i in range(32)]

    rng = np.random.default_rng(seed)
    cls_emb = rng.standard_normal((len(classes), lang_dim)).astype(
        np.float32)
    cls_emb /= np.linalg.norm(cls_emb, axis=-1, keepdims=True)

    H, W = bucket.height, bucket.width
    grid = bucket.grid(cfg.encoder.patch_size)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 2, H, W, 3), jnp.float32), jnp.zeros((1, 2), bool),
        jnp.asarray(cls_emb), grid)

    if checkpoint:
        from pathlib import Path

        from panst3r_tpu.core.checkpoint import load_checkpoint

        params, _, meta = load_checkpoint(
            Path(checkpoint).parent, Path(checkpoint).name,
            jax.tree_util.tree_map(np.asarray, params))
        if "classes" in meta:
            classes = list(meta["classes"])
        if "cls_emb" in meta:
            # trained weights must pair with the SAME text embeddings
            cls_emb = np.asarray(meta["cls_emb"], np.float32)

    engine = InferenceEngine(model, params, bucket,
                             num_keyframes=num_keyframes, amp=amp)
    return engine, classes, cls_emb
