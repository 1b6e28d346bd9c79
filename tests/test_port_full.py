"""Layerwise torch→flax port parity for every module of the checkpoint map.

Each test synthesizes a torch module with the reference state_dict naming
(documented in tools/port_torch_checkpoint.py), ports its weights, and
checks numerical agreement between the torch forward (independent
transcription of the contract, written here) and our flax module.

Covers VERDICT round-1 Missing #1: MUSt3R memory decoder, DINOv2 (real HF
`Dinov2Model` naming via `transformers`), LoftUp + InputMixer, dust3r-style
encoder naming, plus the interleaved→half RoPE permutation option.
"""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

import port_torch_checkpoint as port  # noqa: E402

from tests.test_rope_attention import torch_rope_2d  # noqa: E402


# ---------------------------------------------------------------------------
# torch reference building blocks (croco conventions, independent writing)
# ---------------------------------------------------------------------------

class TAttn(nn.Module):
    """croco-style packed-qkv self-attention with 2D RoPE."""

    def __init__(self, dim, heads, rope=True):
        super().__init__()
        self.h = heads
        self.rope = rope
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, pos=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, C // self.h)
        q, k, v = [qkv[:, :, i].transpose(1, 2) for i in range(3)]
        if self.rope and pos is not None:
            q = torch_rope_2d(q, pos)
            k = torch_rope_2d(k, pos)
        att = (q @ k.transpose(-1, -2)) * (C // self.h) ** -0.5
        out = att.softmax(-1) @ v
        return self.proj(out.transpose(1, 2).reshape(B, N, C))


class TCrossAttn(nn.Module):
    """croco CrossAttention: projq/projk/projv/proj, RoPE on q and k.
    qkv_bias applies to projq/k/v only; the out proj always has bias
    (croco convention; CrossonlyDecoderBlock uses qkv_bias=False,
    reference blocks.py:13)."""

    def __init__(self, dim, heads, rope=True, qkv_bias=True):
        super().__init__()
        self.h = heads
        self.rope = rope
        for n in ("projq", "projk", "projv"):
            setattr(self, n, nn.Linear(dim, dim, bias=qkv_bias))
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, key, value, qpos=None, kpos=None):
        B, Nq, C = x.shape
        Nk = key.shape[1]

        def heads(t, n):
            return t.reshape(B, n, self.h, C // self.h).transpose(1, 2)

        q = heads(self.projq(x), Nq)
        k = heads(self.projk(key), Nk)
        v = heads(self.projv(value), Nk)
        if self.rope:
            if qpos is not None:
                q = torch_rope_2d(q, qpos)
            if kpos is not None:
                k = torch_rope_2d(k, kpos)
        att = (q @ k.transpose(-1, -2)) * (C // self.h) ** -0.5
        out = att.softmax(-1) @ v
        return self.proj(out.transpose(1, 2).reshape(B, Nq, C))


class TMlp(nn.Module):
    def __init__(self, dim, hidden, out=None):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, out or dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TBlock(nn.Module):
    """croco `Block`: norm1/attn/norm2/mlp pre-norm residual."""

    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


def _grid_pos(gh, gw, B):
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    pos = np.stack([yy, xx], -1).reshape(1, gh * gw, 2)
    return np.broadcast_to(pos, (B, gh * gw, 2)).astype(np.int32).copy()


def _sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# RoPE layout permutation
# ---------------------------------------------------------------------------

def _rope1d_interleaved(x, pos1d, base, D):
    """Interleaved (2i, 2i+1) pairing — the alternative layout the port's
    --rope-layout interleaved option converts FROM."""
    inv_freq = 1.0 / (base ** (torch.arange(0, D, 2).float() / D))
    ang = pos1d.float()[..., None] * inv_freq           # (B, N, D/2)
    cos, sin = ang.cos()[:, None], ang.sin()[:, None]   # (B, 1, N, D/2)
    u, v = x[..., 0::2], x[..., 1::2]
    out = torch.empty_like(x)
    out[..., 0::2] = u * cos - v * sin
    out[..., 1::2] = v * cos + u * sin
    return out


def torch_rope_2d_interleaved(tokens, positions, base=100.0):
    D = tokens.shape[-1] // 2
    y, x = tokens.split(D, dim=-1)
    y = _rope1d_interleaved(y, positions[..., 0], base, D)
    x = _rope1d_interleaved(x, positions[..., 1], base, D)
    return torch.cat([y, x], dim=-1)


def test_interleave_to_half_perm_numerics(rng):
    """half-RoPE(x[perm]) must equal interleaved-RoPE(x)[perm] — the
    identity that makes the port-time q/k row permutation correct."""
    B, H, N, D = 1, 1, 6, 16
    x = torch.from_numpy(rng.standard_normal((B, H, N, D)).astype(np.float32))
    pos = torch.from_numpy(
        rng.integers(0, 9, (B, N, 2)).astype(np.int64))

    perm = port.interleave_to_half_perm(D)
    half_of_perm = torch_rope_2d(x[..., perm], pos)
    inter = torch_rope_2d_interleaved(x, pos)[..., perm]
    np.testing.assert_allclose(half_of_perm.numpy(), inter.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_interleaved_port_attention_invariant(rng):
    """Porting an interleaved-RoPE-trained attention with
    --rope-layout interleaved must reproduce its attention output under
    our rotate-half kernel."""
    from panst3r_tpu.models.blocks import SelfAttention

    dim, heads, N = 32, 2, 6
    attn = TAttn(dim, heads)
    x = rng.standard_normal((1, N, dim)).astype(np.float32)
    pos = rng.integers(0, 9, (1, N, 2)).astype(np.int32)

    # torch forward with INTERLEAVED pairing
    with torch.no_grad():
        tx = torch.from_numpy(x)
        qkv = attn.qkv(tx).reshape(1, N, 3, heads, dim // heads)
        q, k, v = [qkv[:, :, i].transpose(1, 2) for i in range(3)]
        tp = torch.from_numpy(pos.astype(np.int64))
        q = torch_rope_2d_interleaved(q, tp)
        k = torch_rope_2d_interleaved(k, tp)
        att = (q @ k.transpose(-1, -2)) * (dim // heads) ** -0.5
        ref = (att.softmax(-1) @ v).transpose(1, 2).reshape(1, N, dim)
        ref = attn.proj(ref).numpy()

    sd = _sd(attn, "m")
    ctx = port.Port(sd, rope_layout="interleaved")
    tree = {}
    port._packed_qkv(ctx, tree, ("qkv",), "m.qkv", heads, rope=True)
    port._linear(ctx, tree, ("proj",), "m.proj")

    ours = SelfAttention(heads).apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Encoder (dust3r naming)
# ---------------------------------------------------------------------------

class TEncoder(nn.Module):
    """Dust3rEncoder-shaped: patch_embed.proj / enc_blocks / enc_norm."""

    def __init__(self, dim=32, depth=2, heads=2, patch=16):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.enc_blocks = nn.ModuleList(
            [TBlock(dim, heads) for _ in range(depth)])
        self.enc_norm = nn.LayerNorm(dim, eps=1e-6)
        self.patch = patch

    def forward(self, img):                       # img: (B, 3, H, W)
        x = self.patch_embed.proj(img)
        B, C, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        pos = torch.from_numpy(_grid_pos(gh, gw, B).astype(np.int64))
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x)


def test_encoder_port_parity(rng):
    from panst3r_tpu.models.encoder import ViTEncoder, ViTEncoderConfig

    tenc = TEncoder(dim=32, depth=2, heads=2)
    img = rng.standard_normal((1, 3, 32, 48)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tenc(torch.from_numpy(img)).numpy()

    ctx = port.Port(_sd(tenc, "must3r_encoder"))
    tree = port.port_encoder(ctx, depth=2, num_heads=2)
    assert not ctx.unmapped()

    model = ViTEncoder(ViTEncoderConfig(embed_dim=32, depth=2, num_heads=2))
    ours, _ = model.apply({"params": tree},
                          jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# MUSt3R memory decoder
# ---------------------------------------------------------------------------

class TDecBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.cross_attn = TCrossAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)


class TMemoryDecoder(nn.Module):
    """Reference-shaped MUSt3R decoder (naming documented in the port tool):
    decoder_embed / feedback_mlp / dec_blocks.i.* / dec_norm / head.proj."""

    def __init__(self, enc_dim=32, dim=24, depth=2, heads=2, patch=16,
                 ch=7):
        super().__init__()
        self.decoder_embed = nn.Linear(enc_dim, dim)
        self.feedback_mlp = TMlp(dim, dim * 2)
        self.dec_blocks = nn.ModuleList(
            [TDecBlock(dim, heads) for _ in range(depth)])
        self.dec_norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Module()
        self.head.proj = nn.Linear(dim, patch * patch * ch)
        self.patch, self.ch = patch, ch

    def _pass(self, tokens, pos, mem, bank):
        """One decoder pass.  tokens: (B, V, N, C); mem: per-layer KV list
        (render) or None (update, banks y_cur); returns (x, new_mem)."""
        B, V, N, C = tokens.shape
        flat_pos = pos.reshape(B, V * N, 2)
        x = tokens
        new_mem = []
        for blk in self.dec_blocks:
            y_cur = blk.norm_y(x).reshape(B, V * N, C)
            kv = y_cur if bank else mem[len(new_mem)]
            kpos = flat_pos if bank else mem[-1]  # pos stored at end
            xv = x.reshape(B * V, N, C)
            xv = xv + blk.attn(blk.norm1(xv), pos.reshape(B * V, N, 2))
            x = xv.reshape(B, V * N, C)
            x = x + blk.cross_attn(blk.norm2(x), kv, kv,
                                   qpos=flat_pos, kpos=kpos)
            x = x + blk.mlp(blk.norm3(x))
            x = x.reshape(B, V, N, C)
            new_mem.append(y_cur)
        return x, new_mem + [flat_pos]

    def forward(self, x_enc, pos, grid):
        """Joint 2-view update then render; returns (pointmaps, feats)."""
        B, V, N, _ = x_enc.shape
        gh, gw = grid
        tokens = self.decoder_embed(x_enc)
        _, mem = self._pass(tokens, pos, None, bank=True)
        x, _ = self._pass(tokens, pos, mem, bank=False)
        feats = self.dec_norm(x)
        p, ch = self.patch, self.ch
        out = self.head.proj(feats).reshape(B, V, gh, gw, p, p, ch)
        out = out.permute(0, 1, 2, 4, 3, 5, 6).reshape(
            B, V, gh * p, gw * p, ch)
        return out, feats


def test_memory_decoder_port_parity(rng):
    from panst3r_tpu.models import memory as memlib
    from panst3r_tpu.models.decoder import MemoryDecoder, MemoryDecoderConfig

    enc_dim, dim, depth, heads = 32, 24, 2, 2
    gh, gw, V = 2, 3, 2
    N = gh * gw
    tdec = TMemoryDecoder(enc_dim, dim, depth, heads)

    x_enc = rng.standard_normal((1, V, N, enc_dim)).astype(np.float32)
    pos = np.broadcast_to(_grid_pos(gh, gw, 1)[:, None], (1, V, N, 2)).copy()

    with torch.no_grad():
        ref_pm, ref_feats = tdec(torch.from_numpy(x_enc),
                                 torch.from_numpy(pos.astype(np.int64)),
                                 (gh, gw))

    ctx = port.Port(_sd(tdec, "must3r_decoder"))
    tree = port.port_memory_decoder(ctx, depth=depth, num_heads=heads)
    assert not ctx.unmapped(), ctx.unmapped()

    cfg = MemoryDecoderConfig(enc_dim=enc_dim, dim=dim, depth=depth,
                              num_heads=heads)
    model = MemoryDecoder(cfg)
    mem0 = memlib.init_memory(depth, 1, V * N, dim)
    mem, _, _ = model.apply({"params": tree}, jnp.asarray(x_enc),
                            jnp.asarray(pos), mem0, False, (gh, gw))
    _, pm, feats = model.apply({"params": tree}, jnp.asarray(x_enc),
                               jnp.asarray(pos), mem, True, (gh, gw))

    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pm), ref_pm.numpy(),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# DINOv2 (real HF naming via transformers)
# ---------------------------------------------------------------------------

def test_dino_port_parity_hf(rng):
    from transformers import Dinov2Config, Dinov2Model

    from panst3r_tpu.models.dino import DinoEncoder, DinoEncoderConfig

    hf_cfg = Dinov2Config(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, mlp_ratio=2,
                          image_size=28, patch_size=14)
    hf = Dinov2Model(hf_cfg).eval()
    # randomize layer-scale (init is constant 1.0 — would mask bugs)
    with torch.no_grad():
        for layer in hf.encoder.layer:
            layer.layer_scale1.lambda1.copy_(
                torch.from_numpy(rng.standard_normal(32).astype(np.float32)))
            layer.layer_scale2.lambda1.copy_(
                torch.from_numpy(rng.standard_normal(32).astype(np.float32)))

    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.4

    # reference DinoV2Encoder preprocessing (dino.py:61-66): renorm +
    # torch bilinear resize to H//16*14 — done here with torch itself so
    # resize parity is covered too.
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    pre = (img * 0.5 + 0.5 - mean) / std
    with torch.no_grad():
        tpre = F.interpolate(torch.from_numpy(pre.transpose(0, 3, 1, 2)),
                             size=(28, 28), mode="bilinear",
                             align_corners=False)
        ref = hf(pixel_values=tpre).last_hidden_state.numpy()

    ctx = port.Port(_sd(hf, "dino_encoder.dinov2"))
    tree = port.port_dino(ctx, depth=2)
    assert not ctx.unmapped(), ctx.unmapped()

    cfg = DinoEncoderConfig(embed_dim=32, depth=2, num_heads=2,
                            mlp_ratio=2.0, pos_grid=2)
    ours = DinoEncoder(cfg).apply({"params": tree}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(ours), ref[:, 1:],
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# InputMixer (exact on-disk naming)
# ---------------------------------------------------------------------------

class TInputMixer(nn.Module):
    def __init__(self, in_dim, dim, heads, layers):
        super().__init__()
        self.in_proj = nn.Linear(in_dim, dim)
        self.mixer_blk = nn.ModuleList(
            [TBlock(dim, heads) for _ in range(layers)])
        self.mixer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, pos):
        x = self.in_proj(x)
        for blk in self.mixer_blk:
            x = blk(x, pos)
        return self.mixer_norm(x)


def test_input_mixer_port_parity(rng):
    from panst3r_tpu.models.input_mixer import InputMixer, InputMixerConfig

    tm = TInputMixer(48, 32, 2, 2)
    x = rng.standard_normal((2, 6, 48)).astype(np.float32)
    pos = rng.integers(0, 8, (2, 6, 2)).astype(np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x),
                 torch.from_numpy(pos.astype(np.int64))).numpy()

    ctx = port.Port(_sd(tm, "panoptic_decoder.input_mixer"))
    tree = port.port_input_mixer(ctx, num_layers=2, num_heads=2)
    assert not ctx.unmapped()

    cfg = InputMixerConfig(hidden_dim=32, num_heads=2, num_layers=2)
    ours = InputMixer(cfg).apply({"params": tree}, jnp.asarray(x),
                                 jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# LoftUp upscaler (exact on-disk naming, loftup.py:84-190)
# ---------------------------------------------------------------------------

class TImplicitFeaturizer(nn.Module):
    def __init__(self, color_feats, n_freqs):
        super().__init__()
        dm = 2 + (3 if color_feats else 0)
        self.color_feats = color_feats
        self.n_freqs = n_freqs
        self.dm = dm
        self.biases = nn.Parameter(torch.randn(2, dm, n_freqs))

    def forward(self, img):                            # (B, C, H, W)
        b, c, h, w = img.shape
        dt = img.dtype  # honor f64 in parity tests (reference runs f32)
        gh = torch.linspace(-1, 1, h, dtype=dt)
        gw = torch.linspace(-1, 1, w, dtype=dt)
        yy, xx = torch.meshgrid(gh, gw, indexing="ij")
        coords = torch.stack([yy, xx])[None].expand(b, 2, h, w)
        feats = torch.cat([coords, img], 1) if self.color_feats else coords
        freqs = torch.exp(torch.linspace(-2, 10, self.n_freqs, dtype=dt))
        f = feats[:, None] * freqs.reshape(1, -1, 1, 1, 1)
        sin_f = f + self.biases[0].reshape(1, self.n_freqs, self.dm, 1, 1)
        cos_f = f + self.biases[1].reshape(1, self.n_freqs, self.dm, 1, 1)
        sin_f = sin_f.reshape(b, -1, h, w)
        cos_f = cos_f.reshape(b, -1, h, w)
        parts = [torch.sin(sin_f), torch.cos(cos_f)]
        if self.color_feats:
            parts.append(img)
        return torch.cat(parts, 1)


class TCrossonlyBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=1.0):
        super().__init__()
        self.cross_attn = TCrossAttn(dim, heads, rope=False, qkv_bias=False)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))
        self.norm_y = nn.LayerNorm(dim)

    def forward(self, x, y):
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, y_)
        return x + self.mlp(self.norm3(x))


class TLoftUp(nn.Module):
    """Reference-shaped LoftUpUpscaler (loftup.py naming)."""

    def __init__(self, input_dim, dim, heads=2, n_freqs=20, patch=16):
        super().__init__()
        self.patch_embed = nn.Conv2d(input_dim, input_dim, 1)
        self.lr_pe = TImplicitFeaturizer(False, 5)
        start_dim = 5 * n_freqs * 2 + 3
        self.lr_input_proj = nn.Sequential(
            nn.Linear(input_dim + 20, dim), nn.LayerNorm(dim))
        self.fourier_feat = nn.Sequential(
            nn.Identity(), TImplicitFeaturizer(True, n_freqs))
        self.first_conv = nn.Sequential(
            nn.GroupNorm(1, start_dim), nn.Conv2d(start_dim, dim, 3, padding=1),
            nn.GroupNorm(8, dim), nn.ReLU(),
            nn.Conv2d(dim, dim, 3, padding=1), nn.GroupNorm(8, dim),
            nn.ReLU())
        self.ca_transformer_blocks = nn.ModuleList(
            [TCrossonlyBlock(dim, heads, 1.0) for _ in range(2)])
        self.ca_transformer_norm = nn.LayerNorm(dim)
        self.patch = patch

    @staticmethod
    def _minmax(x):
        c = x.shape[1]
        flat = x.permute(1, 0, 2, 3).reshape(c, -1)
        mn = flat.min(-1).values.reshape(1, c, 1, 1)
        scale = flat.max(-1).values.reshape(1, c, 1, 1) - mn
        return (x - mn) / scale.clamp_min(1e-4) - 0.5

    def forward(self, lr_feats, img):
        """lr_feats: (B, N, C) tokens; img: (B, 3, H, W)."""
        B, N, C = lr_feats.shape
        H, W = img.shape[-2:]
        gh, gw = H // self.patch, W // self.patch
        lr2d = lr_feats.transpose(-1, -2).view(B, C, gh, gw)
        patch_feats = self.patch_embed(lr2d)

        img = F.interpolate(img, scale_factor=0.5, mode="bilinear",
                            align_corners=False)
        x = self.fourier_feat[1](self._minmax(img))
        x = self.first_conv(x)
        Bc, Ch, Ho, Wo = x.shape
        x = x.flatten(2).transpose(-1, -2)

        lr_pe = self.lr_pe(lr2d)
        lr_cat = torch.cat([lr2d, lr_pe], 1).flatten(2).permute(0, 2, 1)
        lr_tokens = self.lr_input_proj(lr_cat)

        for blk in self.ca_transformer_blocks:
            x = blk(x, lr_tokens)
        x = self.ca_transformer_norm(x)
        return patch_feats, x.transpose(-1, -2).reshape(Bc, Ch, Ho, Wo)


def test_loftup_port_parity(rng):
    """f64 on both sides: the Fourier featurizer's max frequency is
    e^10 ≈ 22k, so sin() amplifies f32 input rounding ~2e-3 per ulp —
    double precision isolates mapping correctness from float sensitivity
    (an actual transposition/mapping error shows up as O(1))."""
    from panst3r_tpu.models.upscalers.loftup import (LoftUpUpscaler,
                                                     LoftUpUpscalerConfig)

    input_dim, dim = 24, 16
    tl = TLoftUp(input_dim, dim).double()
    gh, gw = 2, 3
    feats = rng.standard_normal((1, gh * gw, input_dim))
    img = rng.random((1, 32, 48, 3))

    with torch.no_grad():
        ref_patch, ref_mask = tl(torch.from_numpy(feats),
                                 torch.from_numpy(img.transpose(0, 3, 1, 2)))

    ctx = port.Port(_sd(tl, "panoptic_decoder.upscaler"))
    tree = port.port_loftup(ctx, num_layers=2)
    assert not ctx.unmapped(), ctx.unmapped()

    with jax.enable_x64():
        cfg = LoftUpUpscalerConfig(dim=dim, num_heads=2)
        tree64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), tree)
        fpn, mask_f = LoftUpUpscaler(cfg).apply(
            {"params": tree64}, jnp.asarray(feats), jnp.asarray(img),
            (gh, gw))

    np.testing.assert_allclose(
        np.asarray(fpn[0]), ref_patch.permute(0, 2, 3, 1).numpy(),
        rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(mask_f), ref_mask.permute(0, 2, 3, 1).numpy(),
        rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Full-checkpoint zero-unmapped (v2-shaped synthetic)
# ---------------------------------------------------------------------------

def test_full_v2_checkpoint_zero_unmapped(rng):
    """A complete v2-shaped state_dict (encoder + decoder + dino + mixer +
    loftup + mask transformer) ports with ZERO unmapped keys."""
    from transformers import Dinov2Config, Dinov2Model

    from tests.test_port import _fake_reference_mask_transformer_sd
    from panst3r_tpu.models.mask_transformer import MaskTransformerConfig

    sd = {}
    sd.update(_sd(TEncoder(dim=32, depth=2, heads=2), "must3r_encoder"))
    sd.update(_sd(TMemoryDecoder(32, 24, 2, 2), "must3r_decoder"))
    hf = Dinov2Model(Dinov2Config(hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=2, mlp_ratio=2,
                                  image_size=28, patch_size=14))
    sd.update(_sd(hf, "dino_encoder.dinov2"))
    sd.update(_sd(TInputMixer(48, 32, 2, 2), "panoptic_decoder.input_mixer"))
    sd.update(_sd(TLoftUp(24, 16), "panoptic_decoder.upscaler"))
    mt_cfg = MaskTransformerConfig(hidden_dim=32, ff_dim=64, mask_dim=16,
                                   num_queries=8, num_heads=4, dec_layers=2,
                                   lang_dim=24, fpn_dims=(32,))
    sd.update(_fake_reference_mask_transformer_sd(rng, mt_cfg))

    ported, report = port.port_checkpoint(sd)
    assert report["unmapped"] == [], report["unmapped"][:10]
    assert report["ported_keys"] + len(report["ignored"]) == len(sd)
    for top in ("must3r_encoder", "must3r_decoder", "dino_encoder",
                "panoptic_decoder"):
        assert top in ported
    assert "input_mixer" in ported["panoptic_decoder"]
    assert "upscaler" in ported["panoptic_decoder"]


# ---------------------------------------------------------------------------
# SigLIP text tower (real HF naming via transformers)
# ---------------------------------------------------------------------------

def test_siglip_text_port_parity_hf(rng):
    """Native flax SigLIP text tower vs HF SiglipTextModel with ported
    weights — pooled output + last hidden state, incl. padding attention
    mask and last-position pooling."""
    from transformers import SiglipTextConfig as HFCfg
    from transformers import SiglipTextModel

    from panst3r_tpu.models.siglip_text import (SiglipTextConfig,
                                                SiglipTextTower)

    hf_cfg = HFCfg(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=16)
    hf = SiglipTextModel(hf_cfg).eval()

    B, N = 2, 16
    ids = rng.integers(0, 120, (B, N)).astype(np.int32)
    mask = np.ones((B, N), np.int32)
    mask[0, 10:] = 0
    mask[1, 13:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)))
        ref_pooled = out.pooler_output.numpy()
        ref_hidden = out.last_hidden_state.numpy()

    ctx = port.Port(_sd(hf, "x"))
    tree = port.port_siglip_text(ctx, layers=2, prefix="x.text_model")
    assert not ctx.unmapped(), ctx.unmapped()

    cfg = SiglipTextConfig(vocab_size=120, width=32, layers=2, heads=2,
                           mlp_dim=64, max_positions=16)
    pooled, hidden = SiglipTextTower(cfg).apply(
        {"params": tree}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=2e-4, atol=2e-5)


def test_native_text_tower_live_open_vocab(tmp_path, rng):
    """Live open-vocab with NO torch in the loop: toy tokenizers-json
    tokenizer + random flax tower behind TextEncoder(tower_fn=...)."""
    import json as _json

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    from panst3r_tpu.models.siglip_text import (NativeTextTower,
                                                SiglipTextConfig,
                                                SiglipTextTower,
                                                canonicalize_text)
    from panst3r_tpu.models.text_encoder import (TextEncoder,
                                                 TextEncoderConfig)

    vocab = {w: i for i, w in enumerate(
        ["<unk>", "</s>", "this", "is", "a", "photo", "of", "chair",
         "table", "sofa"])}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok_path = str(tmp_path / "tokenizer.json")
    tok.save(tok_path)

    cfg = SiglipTextConfig(vocab_size=16, width=24, layers=1, heads=2,
                           mlp_dim=32, max_positions=16)
    params = SiglipTextTower(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))["params"]

    tower = NativeTextTower(params, tok_path, cfg)
    # monkeypatch max_len via tokenize path: NativeTextTower uses 64 — the
    # tiny config has 16 positions, so call the pieces directly.
    from panst3r_tpu.models.siglip_text import tokenize_siglip
    ids, mask = tokenize_siglip(["This is a photo of chair."], tower.spm,
                                max_len=16)
    assert ids.shape == (1, 16) and mask[0].sum() == 7  # 6 words + eos
    assert canonicalize_text("This is a photo of chair.") \
        == "This is a photo of chair"

    tower_fn = lambda prompts: np.stack(  # noqa: E731
        [tower.model.apply({"params": params},
                           *map(jnp.asarray,
                                tokenize_siglip([p], tower.spm, 16)))[0][0]
         for p in prompts])
    te = TextEncoder(TextEncoderConfig(fixed_vocab=False), tower_fn=tower_fn)
    te.embed_dim = 24  # tiny tower for the test
    emb = te(["chair", "table"])
    assert emb.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Reverse export (flax -> torch) roundtrip
# ---------------------------------------------------------------------------

def test_export_roundtrip_bit_exact(rng):
    """torch sd -> port -> flax -> export -> torch sd' must be bit-exact
    for every non-ignored key (the id-tracing exporter inverts the port
    by construction)."""
    from transformers import Dinov2Config, Dinov2Model

    from tests.test_port import _fake_reference_mask_transformer_sd
    from panst3r_tpu.models.mask_transformer import MaskTransformerConfig
    from tools.export_torch_checkpoint import export_checkpoint

    sd = {}
    sd.update(_sd(TEncoder(dim=32, depth=2, heads=2), "must3r_encoder"))
    sd.update(_sd(TMemoryDecoder(32, 24, 2, 2), "must3r_decoder"))
    hf = Dinov2Model(Dinov2Config(hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=2, mlp_ratio=2,
                                  image_size=28, patch_size=14))
    sd.update(_sd(hf, "dino_encoder.dinov2"))
    sd.update(_sd(TInputMixer(48, 32, 2, 2), "panoptic_decoder.input_mixer"))
    sd.update(_sd(TLoftUp(24, 16), "panoptic_decoder.upscaler"))
    mt_cfg = MaskTransformerConfig(hidden_dim=32, ff_dim=64, mask_dim=16,
                                   num_queries=8, num_heads=4, dec_layers=2,
                                   lang_dim=24, fpn_dims=(32,))
    sd.update(_fake_reference_mask_transformer_sd(rng, mt_cfg))

    ported, report = port.port_checkpoint(sd)
    assert report["unmapped"] == []

    out, ereport = export_checkpoint(ported, sd)
    assert ereport["missing"] == []
    assert set(ereport["passthrough"]) == set(report["ignored"])
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(out[k]), np.asarray(sd[k]), err_msg=k)


def test_export_roundtrip_interleaved_rope(rng):
    """The interleaved->half RoPE row permutation must invert exactly.
    (Module-level port: head count is a config input, not inferable from
    the sd, and the tiny test dims break port_checkpoint's ViT-L default.)
    """
    from tools.export_torch_checkpoint import _leaf, export_checkpoint

    sd = _sd(TEncoder(dim=32, depth=2, heads=2), "must3r_encoder")

    def run_port(s):
        ctx = port.Port(s, rope_layout="interleaved")
        tree = {"must3r_encoder": port.port_encoder(ctx, depth=2,
                                                    num_heads=2)}
        assert not ctx.unmapped()
        return tree

    ported = run_port(sd)
    # id-trace with the same module port (export_checkpoint wires in
    # port_checkpoint; exercise the underlying mechanism directly here).
    id_sd, off = {}, 0
    for k, v in sd.items():
        size = int(np.prod(v.shape)) if v.shape else 1
        id_sd[k] = np.arange(off, off + size, dtype=np.int64).reshape(v.shape)
        off += size
    id_tree = run_port(id_sd)
    values = np.empty(off, np.float64)
    for path_s, ids in port._flatten(id_tree):
        leaf = _leaf(ported, tuple(path_s.split("/")))
        values[np.asarray(ids, np.int64).ravel()] = \
            np.asarray(leaf, np.float64).ravel()
    o = 0
    for k, v in sd.items():
        size = int(np.prod(v.shape)) if v.shape else 1
        np.testing.assert_array_equal(
            values[o:o + size].reshape(v.shape).astype(v.dtype), v,
            err_msg=k)
        o += size
