"""A/B the cross-attention kernel's (block_q, block_k) at the serve and
long-memory shapes.

The render decoder's memory cross-attention (6144 q x 3072 kv, d=64 head
pairs) measured 1.77 ms/call in the serve xplane vs ~0.6 ms lane-bound —
the online-softmax carry (4 k-blocks at bk=768) serializes VPU work
against the MXU.  v5e VMEM fits the whole (bq, Nk) f32 score tile for
Nk=3072, turning the kernel one-pass.  This probe times the same kernel
at several block choices (RTT-subtracted, many reps per launch).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.ops.pallas.tower_attention import _cross_fwd
    from panst3r_tpu.ops.rope import rope2d_tables

    B, C = 1, 768
    REPS = int(os.environ.get("AB_REPS", "30"))

    shapes = [("serve-render", 6144, 3072), ("long-mem", 6144, 12288),
              # the actual 50-view render call: all views folded into Nq
              ("long-mem-full", 38400, 12288)]
    grids = {6144: (8 * 24, 32), 3072: (4 * 24, 32), 12288: (16 * 24, 32),
             38400: (50 * 24, 32)}

    rng = np.random.default_rng(0)

    def tables(n):
        gh, gw = grids[n]
        pos = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                   indexing="ij"), -1).reshape(-1, 2)
        pos = np.tile(pos, (B, 1, 1))[:, :n]
        return rope2d_tables(jnp.asarray(pos), 64)

    for name, nq, nk in shapes:
        q = jnp.asarray(rng.standard_normal((B, nq, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, nk, C)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, nk, C)), jnp.bfloat16)
        qtab = tables(nq)
        ktab = tables(nk)
        bias = jnp.zeros((B, nk), jnp.float32)

        # RTT floor: dispatch + tiny fetch of a trivial op
        # (block_until_ready does not force execution through the
        # tunneled runtime — the fetch does; same pattern as
        # ab_tower_attention.py).
        tiny = jax.jit(lambda x: x * 1.0)
        np.asarray(tiny(jnp.zeros(8)))
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.zeros(8)))
        rtt = time.perf_counter() - t0

        print(f"--- {name}: Nq={nq} Nk={nk} (RTT {rtt*1e3:.1f} ms)")
        for cfgt in [(512, 768), (512, 1536), (1024, 768), (1024, 1536),
                     (512, 3072), (1024, 3072),
                     (1536, 1536), (1024, 2048), (1536, 2048),
                     # r5: the raised in-kernel vmem_limit_bytes makes
                     # big blocks compile; per-grid-step exposed VPU
                     # time shrinks with block area.
                     (2048, 1536), (1536, 3072), (2048, 2048),
                     (3072, 1536), (2048, 3072),
                     # r5b: in-kernel k sub-split — sub_k softmax chains
                     # per fetched block against pre-issued matmuls.
                     (1536, 1536, 2), (1536, 768, 2), (1536, 768, 4),
                     (1024, 1536, 2), (1536, 1536, 4)]:
            bq, bk = cfgt[0], cfgt[1]
            sub = cfgt[2] if len(cfgt) > 2 else 1
            if bk * sub > nk:
                continue
            # ~4 live (bq, bk) f32 tiles must fit the raised VMEM budget
            if 6 * bq * bk * 4 + 16 * 2**20 > 110 * 2**20:
                continue

            def run(q, k, v, qtab, ktab, bias, bq=bq, bk=bk, sub=sub):
                out = q
                for _ in range(REPS):
                    out = _cross_fwd(out, k, v, qtab, ktab, bias,
                                     64 ** -0.5, block_q=bq, block_k=bk,
                                     sub_k=sub)
                return out

            f = jax.jit(run)
            try:
                np.asarray(f(q, k, v, qtab, ktab, bias)[0, 0, :2])
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d} sub={sub}  FAILED: "
                      f"{str(e)[:80]}")
                continue
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(q, k, v, qtab, ktab, bias)
                np.asarray(out[0, 0, :2])
                best = min(best, time.perf_counter() - t0)
            per = (best - rtt) / REPS * 1e3
            print(f"bq={bq:5d} bk={bk:5d} sub={sub}  {per:6.3f} ms/call")


if __name__ == "__main__":
    main()
