"""Fast exact-GELU for bf16 towers.

The reference towers use torch ``nn.GELU()`` — the exact erf form (croco
`Mlp`; see models/blocks.py gelu_exact).  XLA's erf lowering on TPU costs
~0.48 ms/layer at the ViT-L MLP shape (8 views × 768 tokens × 4096 — A/B
in tools/ab_tower_block.py: 0.94 ms/layer erf vs 0.46 tanh), dominated by
a division and a wide polynomial evaluated in the fc2 matmul's operand
fusion.

``fast_gelu`` replaces it for half-precision inputs with a division-light
two-branch polynomial evaluated in f32:

  |u| <= 1 (u = x/sqrt2):  erf(u) = u * P6(u^2)           (abs err 4e-9)
  |u| >  1:  erfc(|u|) = exp(-u^2) * v * S10(v), v = 1/|u| (rel err 2e-7)
             gelu =  0.5*x*(2 - erfc)   for x > 0
                     0.5*x*erfc         for x < 0   (no 1-erfc cancellation)

Accuracy contract (tests/test_gelu_fast.py, exhaustive over all 65536
bf16 bit patterns): wherever the exact output is a NORMAL bf16,
``bf16(fast_gelu(x)) == bf16(exact erf-gelu computed in f64)`` — bit
identical; outputs below the f32 normal range (x < -6.6 deep tail) flush
to a correctly-signed zero (XLA/TPU flush-to-zero semantics; stock gelu
flushes the same values).  For comparison, XLA's own erf lowering
deviates from the f64-exact rounding on 1185 of the same inputs.

For f32/f64 inputs (training goldens, port-parity paths) it falls back to
``jax.nn.gelu(approximate=False)`` so full-precision numerics are
unchanged bit-for-bit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# erf(u)/u as a polynomial in t = u^2, Chebyshev-fit on [0, 1] (deg 6).
_PA = (1.12837923e+00, -3.76126289e-01, 1.12836346e-01, -2.68560704e-02,
       5.19296154e-03, -8.05378717e-04, 8.00701164e-05)
# S(v) = u * erfc(u) * exp(u^2) with v = 1/u, Chebyshev-fit on
# u in [1, 9.9] (deg 10) — evaluated in v to avoid the cancellation a
# power-basis fit in u suffers in f32 (measured 1-ulp bf16 flips).
_QS = (5.6420797e-01, -6.4483745e-04, -2.7258244e-01, -7.7341169e-02,
       8.0074513e-01, -1.1009063e+00, 5.4886961e-01, 2.6496434e-01,
       -5.3397429e-01, 2.9362467e-01, -5.9379213e-02)

_RSQ2 = 0.7071067811865476


def _polyval(coefs, t):
    r = jnp.full_like(t, coefs[-1])
    for c in coefs[-2::-1]:
        r = r * t + c
    return r


def fast_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU, bit-identical to erf-GELU for every bf16/f16 input.

    Half-precision inputs run the polynomial path (f32 internally);
    full-precision inputs fall back to ``jax.nn.gelu(approximate=False)``
    unchanged.
    """
    if x.dtype not in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(x, approximate=False)
    xf = x.astype(jnp.float32)
    u = xf * _RSQ2
    au = jnp.abs(u)
    # Branch B: erfc(|u|) via exp(-u^2) * v * S(v).  |u| clamped to the
    # fit domain; beyond 9.6 (x < -13.58) every bf16 output rounds to -0,
    # and the hard zero also avoids f32-subnormal erfc values being
    # multiplied by huge |x| (CPU keeps subnormals; TPU flushes).
    aub = jnp.clip(au, 1.0, 9.6)
    vb = 1.0 / aub
    exp_b = jnp.exp(-(aub * aub))
    svb = vb * _polyval(_QS, vb)
    erfc_b = exp_b * svb
    # Branch A (|u| <= 1): inputs clamped so the unselected lane never
    # overflows (inf * 0 NaNs under jnp.where autodiff).
    ta = jnp.minimum(au * au, 1.0)
    uc = jnp.clip(u, -1.0, 1.0)
    out_a = 0.5 * xf * (1.0 + uc * _polyval(_PA, ta))
    out_pos = 0.5 * xf * (2.0 - erfc_b)
    # Negative branch associated as (0.5*x*exp) * (v*S): erfc itself goes
    # f32-subnormal (flushed to 0) two bf16 inputs before the OUTPUT
    # leaves the bf16-normal range; this grouping keeps every
    # intermediate normal.  Beyond the fit domain (x < -13.58) every
    # output rounds to -0; the explicit zero also keeps the clamped lane
    # from producing junk for huge |x|.
    out_neg = (0.5 * xf * exp_b) * svb
    out_neg = jnp.where(au > 9.6, jnp.float32(0.0) * xf, out_neg)
    out = jnp.where(au <= 1.0, out_a,
                    jnp.where(u > 0, out_pos, out_neg))
    return out.astype(x.dtype)
