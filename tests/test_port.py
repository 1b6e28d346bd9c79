"""Weight-porting tests: torch→flax mapping round-trip + MHA numerics."""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

import port_torch_checkpoint as port  # noqa: E402

from panst3r_tpu.models.mask_transformer import (MaskTransformer,  # noqa
                                                 MaskTransformerConfig, _MHA)


def test_mha_port_matches_torch(rng):
    """Our _MHA with weights ported from torch nn.MultiheadAttention must
    produce identical outputs — validates the packed-qkv split + transpose
    conventions the whole port relies on."""
    C, H, N = 32, 4, 10
    mha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    x = rng.standard_normal((2, N, C)).astype(np.float32)
    k = rng.standard_normal((2, N + 3, C)).astype(np.float32)

    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(x), torch.from_numpy(k),
                     torch.from_numpy(k), need_weights=False)

    qkv = port.split_qkv(mha.in_proj_weight.detach().numpy(),
                         mha.in_proj_bias.detach().numpy())
    params = {"params": {}}
    for (kern, bias), name in zip(qkv, ("q_proj", "k_proj", "v_proj")):
        params["params"][name] = {"kernel": jnp.asarray(kern),
                                  "bias": jnp.asarray(bias)}
    params["params"]["out_proj"] = {
        "kernel": jnp.asarray(port.t(mha.out_proj.weight.detach().numpy())),
        "bias": jnp.asarray(mha.out_proj.bias.detach().numpy())}

    ours = _MHA(H).apply(params, jnp.asarray(x), jnp.asarray(k),
                         jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def _fake_reference_mask_transformer_sd(rng, cfg: MaskTransformerConfig):
    """Synthesize a torch-style state_dict with the reference's key names."""
    C, L, F = cfg.hidden_dim, cfg.dec_layers, cfg.ff_dim
    sd = {}
    p = "panoptic_decoder.mask_transformer"

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd[f"{p}.query_feat.weight"] = r(cfg.num_queries, C)
    sd[f"{p}.query_embed.weight"] = r(cfg.num_queries, C)
    sd[f"{p}.level_embed.weight"] = r(1, C)
    sd[f"{p}.cls_logit_scale"] = r()
    sd[f"{p}.decoder_norm.weight"] = r(C)
    sd[f"{p}.decoder_norm.bias"] = r(C)
    sd[f"{p}.lang_embed.weight"] = r(cfg.lang_dim, C)
    sd[f"{p}.lang_embed.bias"] = r(cfg.lang_dim)
    for i in range(3):
        out = cfg.mask_dim if i == 2 else C
        inp = C
        sd[f"{p}.mask_embed.layers.{i}.weight"] = r(out, inp)
        sd[f"{p}.mask_embed.layers.{i}.bias"] = r(out)
    for i in range(L):
        for mod, sub in ((f"cross_attn_layers.{i}", "multihead_attn"),
                         (f"self_attn_layers.{i}", "self_attn")):
            sd[f"{p}.{mod}.{sub}.in_proj_weight"] = r(3 * C, C)
            sd[f"{p}.{mod}.{sub}.in_proj_bias"] = r(3 * C)
            sd[f"{p}.{mod}.{sub}.out_proj.weight"] = r(C, C)
            sd[f"{p}.{mod}.{sub}.out_proj.bias"] = r(C)
            sd[f"{p}.{mod}.norm.weight"] = r(C)
            sd[f"{p}.{mod}.norm.bias"] = r(C)
        sd[f"{p}.ffn_layers.{i}.linear1.weight"] = r(F, C)
        sd[f"{p}.ffn_layers.{i}.linear1.bias"] = r(F)
        sd[f"{p}.ffn_layers.{i}.linear2.weight"] = r(C, F)
        sd[f"{p}.ffn_layers.{i}.linear2.bias"] = r(C)
        sd[f"{p}.ffn_layers.{i}.norm.weight"] = r(C)
        sd[f"{p}.ffn_layers.{i}.norm.bias"] = r(C)
    return sd


def test_mask_transformer_port_shapes(rng):
    cfg = MaskTransformerConfig(hidden_dim=32, ff_dim=64, mask_dim=16,
                                num_queries=8, num_heads=4, dec_layers=2,
                                lang_dim=24, fpn_dims=(32,))
    sd = _fake_reference_mask_transformer_sd(rng, cfg)
    ported = port.port_mask_transformer(port.Port(sd),
                                        dec_layers=cfg.dec_layers)

    # Must structurally match a real init (same leaves, same shapes).
    model = MaskTransformer(cfg)
    fpn = [jnp.zeros((1, 1, 2, 3, 32))]
    mf = jnp.zeros((1, 1, 8, 12, 16))
    init = model.init(jax.random.PRNGKey(0), fpn, mf,
                      jnp.zeros((5, 24)), jnp.zeros((1, 1), bool))["params"]

    flat_init = dict(port._flatten(jax.tree_util.tree_map(np.asarray, init)))
    flat_port = dict(port._flatten(ported))
    assert set(flat_port) == set(flat_init), (
        set(flat_port) ^ set(flat_init))
    for k in flat_init:
        assert flat_port[k].shape == flat_init[k].shape, k

    # Ported params must run.
    out = model.apply({"params": ported}, fpn, mf, jnp.zeros((5, 24)),
                      jnp.zeros((1, 1), bool))
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
