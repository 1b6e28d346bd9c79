"""Reverse checkpoint port: flax param tree → reference-named torch
state_dict (interop export for TPU-trained weights).

The forward port (tools/port_torch_checkpoint.py) is, end to end, an
element PERMUTATION: every scalar of the produced flax tree originates
from exactly one scalar of the torch state_dict (transposes, reshapes,
per-head row permutations, qkv splits, scan stacking — no arithmetic).
This exporter exploits that: it runs the FORWARD port on an id-valued
copy of a template state_dict (each torch scalar replaced by its unique
global index), which yields at every flax leaf position the torch index
it came from — an exact inverse map by construction, immune to drift
between hand-written forward/backward mappings.

A template state_dict — the reference checkpoint being round-tripped, or
any torch model with reference naming and matching shapes — supplies the
torch key set/shapes/dtypes.  Keys the forward port ignores (buffers such
as position ids) are passed through from the template and listed in the
report.

Usage:
  python tools/export_torch_checkpoint.py --params ported_params.npz \
      --template reference.pth --out exported.pth
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.port_torch_checkpoint import _flatten, port_checkpoint  # noqa


def _leaf(tree: dict, path: tuple):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_checkpoint(flax_tree: dict, template_sd: dict,
                      dec_layers: int | None = None,
                      rename: dict | None = None,
                      rope_layout: str = "half") -> tuple[dict, dict]:
    """Invert the forward port: values from ``flax_tree``, key
    set/shapes/dtypes from ``template_sd``.

    Returns (state_dict, report).  report['passthrough'] lists template
    keys the port never consumed (copied from the template verbatim);
    report['missing'] lists flax leaves the port produces but the given
    tree lacks (their template keys fall back to passthrough).
    """
    # 1. id-valued template: global scalar indices.
    id_sd, spans = {}, {}
    off = 0
    for k, v in template_sd.items():
        shape = np.shape(v)
        size = int(np.prod(shape)) if shape else 1
        id_sd[k] = np.arange(off, off + size, dtype=np.int64).reshape(shape)
        spans[k] = (off, size, shape)
        off += size

    id_tree, _ = port_checkpoint(id_sd, dec_layers, rename=rename,
                                 rope_layout=rope_layout)

    # 2. scatter flax values into a flat per-id vector.
    values = np.empty(off, np.float64)
    covered = np.zeros(off, bool)
    missing = []
    for path_s, ids in _flatten(id_tree):
        path = tuple(path_s.split("/"))
        leaf = _leaf(flax_tree, path)
        if leaf is None:
            missing.append(path_s)
            continue
        leaf = np.asarray(leaf)
        assert leaf.shape == ids.shape, (path_s, leaf.shape, ids.shape)
        flat_ids = np.asarray(ids, np.int64).ravel()
        values[flat_ids] = leaf.astype(np.float64).ravel()
        covered[flat_ids] = True

    # 3. gather per template key.
    out, passthrough = {}, []
    for k, v in template_sd.items():
        o, size, shape = spans[k]
        if covered[o:o + size].all():
            arr = values[o:o + size].reshape(shape)
            out[k] = arr.astype(np.asarray(v).dtype)
        else:
            out[k] = np.asarray(v)
            passthrough.append(k)
    report = {"exported_keys": len(out) - len(passthrough),
              "passthrough": sorted(passthrough),
              "missing": sorted(missing)}
    return out, report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True,
                    help="ported_params.npz (flat 'a/b/c' keys) or orbax dir")
    ap.add_argument("--template", required=True,
                    help="reference-named .pth supplying keys/shapes")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--dec-layers", type=int, default=None)
    ap.add_argument("--rope-layout", choices=("half", "interleaved"),
                    default="half")
    args = ap.parse_args(argv)

    import torch

    tree: dict = {}
    flat = np.load(args.params)
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]

    ckpt = torch.load(args.template, map_location="cpu", weights_only=False)
    template = ckpt.get("weights", ckpt)
    template = {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in template.items()}

    sd, report = export_checkpoint(tree, template, args.dec_layers,
                                   rope_layout=args.rope_layout)
    torch.save({"weights": {k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}}, args.out)
    print(f"exported {report['exported_keys']} keys "
          f"({len(report['passthrough'])} passthrough, "
          f"{len(report['missing'])} missing); report:")
    print(json.dumps({k: v[:8] if isinstance(v, list) else v
                      for k, v in report.items()}, indent=2))


if __name__ == "__main__":
    main()
