"""Flash-backward crossover sweep (VERDICT r1 #10).

Measures the training-step attention backward at increasing memory length
Nk with (a) the XLA recompute VJP (default) and (b) the Pallas
FlashAttention-2 backward kernels (PANST3R_FLASH_BWD=1), to find the
sequence length where the kernel path wins — the documented activation
criterion for the opt-in flag (ops/pallas/flash_attention.py).

Shape model: the MUSt3R decoder's memory cross-attention during training —
q = one view's tokens (768 @ 512×384), kv = the token memory, which grows
with keyframes (Nk = K × 768).

Run on a TPU chip:  python tools/flash_bwd_crossover.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from panst3r_tpu.ops.pallas import flash_attention as fa

    B, H, Nq, D = 1, 12, 768, 64
    lengths = [int(x) for x in os.environ.get(
        "CROSSOVER_LENGTHS", "1536,3072,6144,12288,24576,49152").split(",")]
    reps = int(os.environ.get("CROSSOVER_REPS", "10"))
    rng = np.random.default_rng(0)

    def bench_mode(use_kernel: bool, Nk: int) -> float:
        os.environ["PANST3R_FLASH_BWD"] = "1" if use_kernel else "0"
        q = jnp.asarray(rng.standard_normal((B, H, Nq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, Nk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, Nk, D)), jnp.bfloat16)

        # distinct function objects per mode → distinct jit cache entries
        # (the env gate is read at trace time)
        if use_kernel:
            def loss(q, k, v):
                return fa.pallas_mha(q, k, v).astype(jnp.float32).sum()
        else:
            def loss(q, k, v):  # noqa: F811
                return fa.pallas_mha(q, k, v).astype(jnp.float32).sum()

        # host-scalar fetch per rep: through the tunneled runtime,
        # block_until_ready alone does not force remote completion — a tiny
        # device→host transfer does.
        def grad_scalar(q, k, v):
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).sum() for x in g)

        grad = jax.jit(grad_scalar)
        float(grad(q, k, v))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(grad(q, k, v))
            times.append(time.perf_counter() - t0)
        return min(times)

    rows = []
    crossover = None
    for Nk in lengths:
        t_rec = bench_mode(False, Nk)
        t_ker = bench_mode(True, Nk)
        rows.append({"Nk": Nk, "recompute_ms": round(t_rec * 1e3, 2),
                     "kernel_ms": round(t_ker * 1e3, 2),
                     "kernel_wins": bool(t_ker < t_rec)})
        if crossover is None and t_ker < t_rec:
            crossover = Nk
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"crossover_Nk": crossover, "rows": rows}))


if __name__ == "__main__":
    main()
