"""Exhaustive bit-parity of the fast bf16 GELU (ops/gelu.py).

The reference towers use exact erf-GELU (torch nn.GELU() default; croco
Mlp / HF ViTs).  fast_gelu replaces XLA's erf for half precision — these
tests prove the replacement is not an approximation in any observable
sense: over ALL 65536 bf16 input bit patterns, the output rounded to bf16
equals the f64-exact erf-GELU rounded to bf16, bit for bit.
"""
import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from scipy import special

from panst3r_tpu.ops.gelu import fast_gelu


def _all_finite_bf16():
    bits = np.arange(65536, dtype=np.uint16)
    vals = bits.view(ml_dtypes.bfloat16)
    return vals[np.isfinite(vals.astype(np.float32))]


def test_fast_gelu_bit_identical_on_all_bf16():
    """Exhaustive contract: for every bf16 input whose exact erf-GELU
    output is a NORMAL bf16 (|y| >= 1.18e-38), the fast path is
    bit-identical to the f64-exact value rounded to bf16.  Outputs below
    the f32 normal range flush to a correctly-signed zero (XLA/TPU FTZ
    semantics — stock gelu flushes these too)."""
    vals = _all_finite_bf16()
    x64 = vals.astype(np.float64)
    exact64 = 0.5 * x64 * special.erfc(-x64 / np.sqrt(2))
    exact_bf = exact64.astype(ml_dtypes.bfloat16)
    normal_out = np.abs(exact64) >= 1.1754944e-38

    out = np.asarray(jax.jit(fast_gelu)(jnp.asarray(vals, jnp.bfloat16)))
    out_bf = out.astype(ml_dtypes.bfloat16)

    mism = out_bf.view(np.uint16) != exact_bf.view(np.uint16)
    bad = mism & normal_out
    assert int(bad.sum()) == 0, (
        f"{int(bad.sum())} bf16 values disagree with exact erf-GELU; "
        f"first at x={x64[bad][:5]}")
    tiny = mism & ~normal_out
    # the flushed tail must be exactly +-0 with the input's sign
    assert np.all(out_bf.astype(np.float64)[tiny] == 0.0)
    assert np.all(np.signbit(out_bf[tiny].astype(np.float32))
                  == (x64[tiny] < 0))


def test_fast_gelu_f32_is_stock_erf_gelu():
    """Full-precision inputs must pass through unchanged (port-parity
    paths compare f32/f64 against torch)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32) * 4
    ours = np.asarray(fast_gelu(jnp.asarray(x)))
    stock = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    np.testing.assert_array_equal(ours, stock)


def test_fast_gelu_grad_finite_and_close():
    """The polynomial path is differentiated directly under AMP training;
    gradients must be finite everywhere (incl. the clamped tails) and
    match the erf-GELU derivative."""
    x = jnp.asarray(np.linspace(-30, 30, 1001), jnp.float32)
    g_ref = jax.vmap(jax.grad(
        lambda t: jax.nn.gelu(t, approximate=False)))(x)

    def half(t):
        return fast_gelu(t.astype(jnp.bfloat16)).astype(jnp.float32)

    g_fast = jax.vmap(jax.grad(half))(x)
    assert np.isfinite(np.asarray(g_fast)).all()
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=2e-2)


def test_tower_mlp_uses_fast_path_bf16():
    """models/blocks.py Mlp in bf16 == the same Mlp computed with stock
    erf-GELU in bf16 (the activation path is the only difference)."""
    from panst3r_tpu.models.blocks import Mlp

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.bfloat16)
    mlp = Mlp(hidden_features=128)
    params = mlp.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params)
    ours = mlp.apply(params, x)

    ref_mlp = Mlp(hidden_features=128,
                  act=lambda t: jax.nn.gelu(t, approximate=False))
    ref = ref_mlp.apply(params, x)
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)
