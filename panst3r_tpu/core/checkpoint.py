"""Checkpoint I/O (orbax-backed).

Resume contract of the reference (/root/reference/src/panst3r/engine/io.py:
10-57 + train.py:149-151,253-254): `checkpoint-last` every epoch with
weights + optimizer + epoch + config; numbered keeps every ``keep_freq``;
final checkpoint drops the optimizer.  Model reconstruction is from the
declarative config dict (core/config.py), never from eval-able strings
(reference panst3r.py:301-325 — replaced deliberately).

Orbax handles multi-host coordination (each host writes its shards) — the
TPU-native replacement for the reference's rank-0 `save_on_master`.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

from panst3r_tpu.core import config as cfg


def save_checkpoint(directory: str | Path, name: str, tree: Any,
                    model_config: Any = None, meta: Optional[dict] = None):
    """Save a pytree + config/meta under ``directory/name``.

    Multi-host contract: call from EVERY process with the (possibly
    globally-sharded) device tree — orbax coordinates the shard writes;
    the config/meta sidecar files are written by process 0 only (the
    reference's ``save_on_master`` analog, engine/io.py:24)."""
    import jax

    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / name
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", tree, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() != 0:
        return
    if model_config is not None:
        (path / "config.json").write_text(
            json.dumps(cfg.to_dict(model_config), indent=2))
    if meta is not None:
        # Array-valued meta entries (e.g. the class-embedding table) go to
        # a sidecar npz — multi-MB JSON otherwise, rewritten every epoch.
        import numpy as np

        arrays = {k: np.asarray(v) for k, v in meta.items()
                  if isinstance(v, np.ndarray)}
        scalars = {k: v for k, v in meta.items() if k not in arrays}
        if arrays:
            np.savez(path / "meta_arrays.npz", **arrays)
        (path / "meta.json").write_text(json.dumps(scalars, indent=2))


def load_checkpoint(directory: str | Path, name: str,
                    target: Any = None) -> tuple[Any, Any, dict]:
    """Returns (tree, model_config | None, meta dict)."""
    path = Path(directory).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path / "state", target)
    model_config = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        model_config = cfg.from_dict(json.loads(cfg_file.read_text()))
    meta_file = path / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    arr_file = path / "meta_arrays.npz"
    if arr_file.exists():
        import numpy as np

        with np.load(arr_file) as z:
            meta.update({k: z[k] for k in z.files})
    return tree, model_config, meta


def latest_checkpoint(directory: str | Path) -> Optional[str]:
    """Auto-resume hook: returns 'last' if it exists (train.py:149-151)."""
    path = Path(directory) / "last"
    return "last" if path.exists() else None
