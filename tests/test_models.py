"""Model component shape and invariance tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.models import memory as memlib
from panst3r_tpu.models.decoder import (MemoryDecoder, MemoryDecoderConfig,
                                        postprocess)
from panst3r_tpu.models.dino import DinoEncoder, DinoEncoderConfig
from panst3r_tpu.models.encoder import ViTEncoder, ViTEncoderConfig
from panst3r_tpu.models.mask_transformer import (MaskTransformer,
                                                 MaskTransformerConfig,
                                                 sine_position_embedding)
from panst3r_tpu.models.panoptic_decoder import (PanopticDecoder,
                                                 PanopticDecoderConfig)
from panst3r_tpu.models.panst3r import PanSt3R, PanSt3RConfig
from panst3r_tpu.models.upscalers import (LoftUpUpscaler, LoftUpUpscalerConfig,
                                          PixelShuffleUpscaler,
                                          PixelShuffleUpscalerConfig)

ENC = ViTEncoderConfig(patch_size=16, embed_dim=64, depth=2, num_heads=4)
DEC = MemoryDecoderConfig(enc_dim=64, dim=48, depth=2, num_heads=4)
H, W = 32, 48
GRID = (H // 16, W // 16)
N = GRID[0] * GRID[1]


def test_encoder_shapes(rng):
    imgs = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    model = ViTEncoder(ENC)
    params = model.init(jax.random.PRNGKey(0), imgs)
    x, pos = model.apply(params, imgs)
    assert x.shape == (2, N, 64)
    assert pos.shape == (2, N, 2)
    np.testing.assert_array_equal(np.asarray(pos[0, -1]),
                                  [GRID[0] - 1, GRID[1] - 1])


def _decoder_inputs(rng, B, V):
    x = jnp.asarray(rng.standard_normal((B, V, N, 64)), jnp.float32)
    pos = jnp.broadcast_to(
        jnp.stack(jnp.meshgrid(jnp.arange(GRID[0]), jnp.arange(GRID[1]),
                               indexing="ij"), -1).reshape(1, 1, N, 2),
        (B, V, N, 2)).astype(jnp.int32)
    return x, pos


def test_decoder_update_render(rng):
    B, V = 1, 3
    x, pos = _decoder_inputs(rng, B, V)
    model = MemoryDecoder(DEC)
    mem0 = memlib.init_memory(DEC.depth, B, V * N, DEC.dim)
    params = model.init(jax.random.PRNGKey(0), x[:, :2], pos[:, :2], mem0,
                        False, GRID)

    mem, pm0, feats0 = model.apply(params, x[:, :2], pos[:, :2], mem0, False,
                                   GRID)
    assert int(mem.count) == 2 * N
    assert pm0.shape == (B, 2, H, W, 7)
    mem, _, _ = model.apply(params, x[:, 2:], pos[:, 2:], mem, False, GRID)
    assert int(mem.count) == 3 * N
    assert bool(mem.valid.all())

    _, pm, feats = model.apply(params, x, pos, mem, True, GRID)
    assert pm.shape == (B, V, H, W, 7)
    assert feats.shape == (B, V, N, DEC.dim)


def test_decoder_render_per_view_independent(rng):
    """Render of view i against frozen memory is independent of which other
    views are rendered alongside — the O(1) per-frame decode contract."""
    B, V = 1, 3
    x, pos = _decoder_inputs(rng, B, V)
    model = MemoryDecoder(DEC)
    mem0 = memlib.init_memory(DEC.depth, B, 2 * N, DEC.dim)
    params = model.init(jax.random.PRNGKey(0), x[:, :2], pos[:, :2], mem0,
                        False, GRID)
    mem, _, _ = model.apply(params, x[:, :2], pos[:, :2], mem0, False, GRID)

    _, pm_all, _ = model.apply(params, x, pos, mem, True, GRID)
    _, pm_single, _ = model.apply(params, x[:, 2:], pos[:, 2:], mem, True,
                                  GRID)
    np.testing.assert_allclose(np.asarray(pm_all[:, 2]),
                               np.asarray(pm_single[:, 0]), atol=1e-5)


def test_memory_padding_invariance(rng):
    """Extra invalid capacity slots must not change the render output."""
    B = 1
    x, pos = _decoder_inputs(rng, B, 2)
    model = MemoryDecoder(DEC)
    mem_exact = memlib.init_memory(DEC.depth, B, 2 * N, DEC.dim)
    params = model.init(jax.random.PRNGKey(0), x, pos, mem_exact, False, GRID)
    mem_a, _, _ = model.apply(params, x, pos, mem_exact, False, GRID)

    mem_pad = memlib.init_memory(DEC.depth, B, 2 * N + 37, DEC.dim)
    mem_b, _, _ = model.apply(params, x, pos, mem_pad, False, GRID)

    q, qpos = _decoder_inputs(rng, B, 1)
    _, pm_a, _ = model.apply(params, q, qpos, mem_a, True, GRID)
    _, pm_b, _ = model.apply(params, q, qpos, mem_b, True, GRID)
    np.testing.assert_allclose(np.asarray(pm_a), np.asarray(pm_b), atol=1e-5)


def test_postprocess_activations(rng):
    raw = jnp.asarray(rng.standard_normal((1, 1, 8, 8, 7)), jnp.float32)
    out = postprocess(raw)
    assert (np.asarray(out["conf"]) >= 1.0).all()
    # direction preserved for global pts
    raw_dir = np.asarray(raw[..., :3])
    out_dir = np.asarray(out["pts3d"])
    cos = (raw_dir * out_dir).sum(-1) / (
        np.linalg.norm(raw_dir, axis=-1) * np.linalg.norm(out_dir, axis=-1)
        + 1e-9)
    assert (cos > 0.999).all()


def test_sine_pe_properties():
    pe = np.asarray(sine_position_embedding(4, 6, 32))
    assert pe.shape == (24, 64)
    assert np.abs(pe).max() <= 1.0 + 1e-6


MT = MaskTransformerConfig(hidden_dim=32, ff_dim=64, mask_dim=16,
                           num_queries=8, num_heads=4, dec_layers=2,
                           lang_dim=24, fpn_dims=(32,))


def _mt_inputs(rng, B=1, V=2, ncls=5):
    fpn = [jnp.asarray(rng.standard_normal((B, V, *GRID, 32)), jnp.float32)]
    mask_f = jnp.asarray(rng.standard_normal((B, V, H // 2, W // 2, 16)),
                         jnp.float32)
    cls_emb = jnp.asarray(rng.standard_normal((ncls, 24)), jnp.float32)
    portrait = jnp.zeros((B, V), bool)
    return fpn, mask_f, cls_emb, portrait


def test_mask_transformer_shapes(rng):
    fpn, mask_f, cls_emb, portrait = _mt_inputs(rng)
    model = MaskTransformer(MT)
    params = model.init(jax.random.PRNGKey(0), fpn, mask_f, cls_emb, portrait)
    out = model.apply(params, fpn, mask_f, cls_emb, portrait)
    assert out["pred_logits"].shape == (1, 8, 5)
    assert out["pred_masks"].shape == (1, 2, 8, H // 2, W // 2)
    assert len(out["aux_outputs"]) == MT.dec_layers
    assert out["out_queries"].shape == (1, 8, 32)


def test_mask_transformer_memory_queries(rng):
    fpn, mask_f, cls_emb, portrait = _mt_inputs(rng)
    model = MaskTransformer(MT)
    params = model.init(jax.random.PRNGKey(0), fpn, mask_f, cls_emb, portrait)
    queries = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    out = model.apply(params, queries, mask_f, cls_emb,
                      method=MaskTransformer.decode_with_queries)
    assert out["pred_logits"].shape == (1, 8, 5)
    assert out["pred_masks"].shape == (1, 2, 8, H // 2, W // 2)


def test_upscalers(rng):
    B, V = 2, 1
    feats = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)
    imgs = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)

    ps_cfg = PixelShuffleUpscalerConfig(fp_dim=(32, 24, 16, 8))
    ps = PixelShuffleUpscaler(ps_cfg)
    params = ps.init(jax.random.PRNGKey(0), feats, imgs, GRID)
    fpn, mask_f = ps.apply(params, feats, imgs, GRID)
    assert fpn[0].shape == (B, *GRID, 32)
    assert mask_f.shape == (B, H // 2, W // 2, 8)

    lu_cfg = LoftUpUpscalerConfig(dim=16, n_freqs=4, num_heads=2,
                                  num_layers=1)
    lu = LoftUpUpscaler(lu_cfg)
    params = lu.init(jax.random.PRNGKey(1), feats, imgs, GRID)
    fpn, mask_f = lu.apply(params, feats, imgs, GRID)
    assert fpn[0].shape == (B, *GRID, 64)
    assert mask_f.shape == (B, H // 2, W // 2, 16)


def test_dino_encoder_shapes(rng):
    cfg = DinoEncoderConfig(patch_size=14, embed_dim=32, depth=1, num_heads=2,
                            pos_grid=5)
    model = DinoEncoder(cfg)
    imgs = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (1, N, 32)  # patch count matches 16-px grid


def test_panst3r_full_forward(rng):
    cfg = PanSt3RConfig(
        encoder=ENC,
        decoder=DEC,
        dino=DinoEncoderConfig(patch_size=14, embed_dim=32, depth=1,
                               num_heads=2, pos_grid=5),
        panoptic=PanopticDecoderConfig(
            upscaler=PixelShuffleUpscalerConfig(fp_dim=(32, 24, 16, 8)),
            mask_transformer=MaskTransformerConfig(
                hidden_dim=32, ff_dim=64, mask_dim=8, num_queries=8,
                num_heads=4, dec_layers=2, lang_dim=24, fpn_dims=(32,)),
        ),
    )
    B, V, ncls = 1, 3, 5
    imgs = jnp.asarray(rng.standard_normal((B, V, H, W, 3)) * 0.3,
                       jnp.float32)
    portrait = jnp.zeros((B, V), bool)
    cls_emb = jnp.asarray(rng.standard_normal((ncls, 24)), jnp.float32)

    model = PanSt3R(cfg)
    params = model.init(jax.random.PRNGKey(0), imgs, portrait, cls_emb, GRID)
    panout, pointmaps = model.apply(params, imgs, portrait, cls_emb, GRID)
    assert pointmaps.shape == (B, V, H, W, 7)
    assert panout["pred_logits"].shape == (B, 8, ncls)
    assert panout["pred_masks"].shape == (B, V, 8, H // 2, W // 2)
    assert np.isfinite(np.asarray(panout["pred_logits"])).all()
    assert np.isfinite(np.asarray(pointmaps)).all()


def test_update_joint_views_interact(rng):
    """Views injected together must see each other through the memory
    cross-attention (the reference initializes with 2 views jointly)."""
    B = 1
    x, pos = _decoder_inputs(rng, B, 2)
    model = MemoryDecoder(DEC)
    mem0 = memlib.init_memory(DEC.depth, B, 2 * N, DEC.dim)
    params = model.init(jax.random.PRNGKey(0), x, pos, mem0, False, GRID)

    # Joint injection of (A, B)
    _, pm_joint, _ = model.apply(params, x, pos, mem0, False, GRID)
    # B alone
    mem1 = memlib.init_memory(DEC.depth, B, N, DEC.dim)
    _, pm_alone, _ = model.apply(params, x[:, 1:], pos[:, 1:], mem1, False,
                                 GRID)
    diff = np.abs(np.asarray(pm_joint[:, 1]) - np.asarray(pm_alone[:, 0]))
    assert diff.max() > 1e-4  # cross-view information flowed


def test_render_depends_on_memory_content(rng):
    B = 1
    x, pos = _decoder_inputs(rng, B, 3)
    model = MemoryDecoder(DEC)
    mem0 = memlib.init_memory(DEC.depth, B, 2 * N, DEC.dim)
    params = model.init(jax.random.PRNGKey(0), x[:, :2], pos[:, :2], mem0,
                        False, GRID)
    mem_a, _, _ = model.apply(params, x[:, :2], pos[:, :2], mem0, False,
                              GRID)
    mem_b, _, _ = model.apply(params, x[:, 1:], pos[:, 1:], mem0, False,
                              GRID)
    _, pm_a, _ = model.apply(params, x[:, 2:], pos[:, 2:], mem_a, True, GRID)
    _, pm_b, _ = model.apply(params, x[:, 2:], pos[:, 2:], mem_b, True, GRID)
    assert np.abs(np.asarray(pm_a) - np.asarray(pm_b)).max() > 1e-4


def test_dino_split_cls_matches_concat(rng):
    """split_cls carries the cls token separately but computes the SAME
    joint attention (rank-1 softmax fixup) — outputs must match the
    concatenated path on identical params."""
    import dataclasses as _dc

    cfg = DinoEncoderConfig(patch_size=14, embed_dim=32, depth=2,
                            num_heads=2, pos_grid=5, split_cls=True)
    model = DinoEncoder(cfg)
    imgs = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    out_split = model.apply(params, imgs)

    concat = DinoEncoder(_dc.replace(cfg, split_cls=False))
    out_concat = concat.apply(params, imgs)  # identical param tree
    np.testing.assert_allclose(np.asarray(out_split, np.float32),
                               np.asarray(out_concat, np.float32),
                               atol=2e-5, rtol=2e-5)
