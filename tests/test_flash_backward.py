"""Flash-attention backward kernels vs jnp reference VJP (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from panst3r_tpu.ops.attention import dot_product_attention
from panst3r_tpu.ops.pallas.flash_attention import _flash_fwd
from panst3r_tpu.ops.pallas.flash_attention_bwd import flash_bwd
from panst3r_tpu.ops.rope import apply_rope_tables, rope2d_tables


def _data(rng, B=1, H=2, Nq=100, Nk=150, D=64):
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, H, Nq, D)), jnp.float32)
    return q, k, v, g


def _check(dq, dk, dv, ref_grads, tol=2e-2):
    for ours, theirs, name in zip((dq, dk, dv), ref_grads,
                                  ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                                   rtol=tol, atol=tol, err_msg=name)


def test_flash_bwd_plain(rng):
    q, k, v, g = _data(rng)
    scale = q.shape[-1] ** -0.5
    with pltpu.force_tpu_interpret_mode():
        o, lse = _flash_fwd(q, k, v, None, None, scale, with_lse=True)
        dq, dk, dv = flash_bwd(q, k, v, None, None, None, o, lse, g, scale)

    ref, vjp = jax.vjp(
        lambda q, k, v: dot_product_attention(q, k, v, scale=scale), q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-3)
    _check(dq, dk, dv, vjp(g))


def test_flash_bwd_with_bias(rng):
    q, k, v, g = _data(rng, Nq=64, Nk=96, D=32)
    B, H, Nq, _ = q.shape
    Nk = k.shape[2]
    scale = q.shape[-1] ** -0.5
    bias = jnp.asarray(
        np.where(rng.random((B, H, Nq, Nk)) < 0.3, -1e9, 0.0), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        o, lse = _flash_fwd(q, k, v, bias, None, scale, with_lse=True)
        dq, dk, dv = flash_bwd(q, k, v, bias, None, None, o, lse, g, scale)

    ref, vjp = jax.vjp(
        lambda q, k, v: dot_product_attention(q, k, v, bias=bias,
                                              scale=scale), q, k, v)
    _check(dq, dk, dv, vjp(g))


def test_flash_bwd_with_kv_validity(rng):
    q, k, v, g = _data(rng, Nq=32, Nk=160, D=32)
    B = q.shape[0]
    Nk = k.shape[2]
    scale = q.shape[-1] ** -0.5
    valid = (jnp.arange(Nk) < 100)[None].repeat(B, 0)
    with pltpu.force_tpu_interpret_mode():
        o, lse = _flash_fwd(q, k, v, None, valid, scale, with_lse=True)
        dq, dk, dv = flash_bwd(q, k, v, None, valid, None, o, lse, g, scale)

    mask = valid[:, None, None, :]
    ref, vjp = jax.vjp(
        lambda q, k, v: dot_product_attention(q, k, v, mask=mask,
                                              scale=scale), q, k, v)
    _check(dq, dk, dv, vjp(g))
    # masked-out keys must get zero gradients
    assert float(jnp.abs(dk[:, :, 100:]).max()) == 0.0
    assert float(jnp.abs(dv[:, :, 100:]).max()) == 0.0


def test_flash_bwd_with_rope(rng):
    q, k, v, g = _data(rng, Nq=48, Nk=80, D=64)
    B, _, Nq, D = q.shape
    Nk = k.shape[2]
    scale = D ** -0.5
    qpos = jnp.asarray(rng.integers(0, 16, (B, Nq, 2)), jnp.int32)
    kpos = jnp.asarray(rng.integers(0, 16, (B, Nk, 2)), jnp.int32)
    qcos, qsin = rope2d_tables(qpos, D)
    kcos, ksin = rope2d_tables(kpos, D)
    # Both forward and backward kernels take the materialized (B, N, D)
    # cos/sin tables.
    rope = (qcos, qsin, kcos, ksin)
    with pltpu.force_tpu_interpret_mode():
        o, lse = _flash_fwd(q, k, v, None, None, scale, rope=rope,
                            with_lse=True)
        dq, dk, dv = flash_bwd(q, k, v, None, None, rope, o, lse, g, scale)

    def ref_fn(q, k, v):
        qr = apply_rope_tables(q, qcos, qsin)
        kr = apply_rope_tables(k, kcos, ksin)
        return dot_product_attention(qr, kr, v, scale=scale)

    ref, vjp = jax.vjp(ref_fn, q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-3)
    _check(dq, dk, dv, vjp(g))


def test_lse_output_matches_reference(rng):
    q, k, v, _ = _data(rng, Nq=40, Nk=64, D=32)
    scale = q.shape[-1] ** -0.5
    with pltpu.force_tpu_interpret_mode():
        o, lse = _flash_fwd(q, k, v, None, None, scale, with_lse=True)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    ref_lse = jax.nn.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_end_to_end_kernel_backward(rng):
    """grad through pallas_mha uses the kernel backward (interpret mode)."""
    from panst3r_tpu.ops.pallas.flash_attention import pallas_mha

    q, k, v, g = _data(rng, Nq=40, Nk=64, D=32)
    scale = q.shape[-1] ** -0.5

    def loss_kernel(q, k, v):
        return (pallas_mha(q, k, v) * g).sum()

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v, scale=scale) * g).sum()

    import os

    os.environ["PANST3R_FLASH_BWD"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    finally:
        os.environ["PANST3R_FLASH_BWD"] = "0"
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    _check(*gk, gr)
