"""Per-stage MFU table: jaxpr FLOPs (ops/flops.py) ÷ xplane device times.

Usage:
  python tools/mfu_report.py                # flops only (no chip needed)
  python tools/mfu_report.py trace.xplane.pb  # + times/MFU from a trace
                                              (tools/profile_serve.py)

Stage times are attributed by the dominant while-loop signature of each
stage program (towers = 24-layer scans, render/memory = 12-layer scans);
pass a trace produced by profile_serve.py on the same shapes.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_TF = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def stage_flops():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import functools

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.fusion import _fusion_full
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models import memory as memlib
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config
    from panst3r_tpu.ops.flops import fn_matmul_flops

    H, W, V, K, NCLS = 384, 512, 8, 4, 32
    model = PanSt3R(panst3r_v1_config())
    c = model.config
    imgs0 = jnp.zeros((1, 2, H, W, 3), jnp.bfloat16)
    params = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), imgs0, jnp.zeros((1, 2), bool),
        jnp.zeros((NCLS, 768), jnp.bfloat16), (H // 16, W // 16)))
    eng = InferenceEngine.__new__(InferenceEngine)
    eng.model, eng.params, eng.bucket = model, params, Bucket(H, W)
    eng.num_keyframes, eng.chunk, eng.amp, eng.retrieval_head = K, 4, True, \
        None
    eng.__post_init__()

    S = jax.ShapeDtypeStruct
    N, dt = eng.n_tokens, jnp.bfloat16
    p = jax.tree_util.tree_map(lambda a: S(jnp.shape(a), a.dtype),
                               eng.params)
    mt = c.panoptic.mask_transformer
    mem = memlib.init_memory(c.decoder.depth, 1, K * N, c.decoder.dim,
                             dtype=dt)
    mem_s = jax.tree_util.tree_map(lambda a: S(a.shape, a.dtype), mem)
    img = S((V, H, W, 3), jnp.uint8)
    x = S((V, N, c.encoder.embed_dim), dt)
    pos = S((V, N, 2), jnp.int32)
    y = S((V, N, c.decoder.dim), dt)
    dino = S((V, N, c.dino.embed_dim), dt)
    cls_emb = S((32, mt.lang_dim), dt)

    def one(a, n):
        return S((1, n) + a.shape[1:], a.dtype)

    def sel(a, n):
        return S((n,) + a.shape[1:], a.dtype)

    return {
        "encoder": fn_matmul_flops(
            functools.partial(eng._encode_batch, n=V), p, img),
        "dino": fn_matmul_flops(
            functools.partial(eng._dino_batch, n=V), p, img),
        "memory": fn_matmul_flops(
            functools.partial(eng._build_memory_jit,
                              schedule=tuple(c.mem_batches(K))),
            p, sel(x, K), mem_s, sel(pos, K)),
        "render": fn_matmul_flops(
            functools.partial(eng._render_batch, n=V), p, x, pos, mem_s),
        "pan_joint": fn_matmul_flops(
            eng._panoptic_joint, p, (one(x, K), one(y, K), one(dino, K)),
            S((1, K, H, W, 3), jnp.uint8), one(pos, K),
            S((1, K), jnp.bool_), cls_emb),
        "pan_queries": fn_matmul_flops(
            eng._panoptic_queries, p,
            (one(x, V - K), one(y, V - K), one(dino, V - K)),
            S((1, V - K, H, W, 3), jnp.uint8), one(pos, V - K),
            S((1, V - K), jnp.bool_), cls_emb,
            S((1, mt.num_queries, mt.hidden_dim), dt)),
        "fusion": fn_matmul_flops(
            lambda mc, mp: _fusion_full(mc, mp, (H, W), "sigmoid", 0.1,
                                        None, 0.25, 0.5, 2, 0.1),
            S((1, mt.num_queries, 32), jnp.float32),
            S((1, V, mt.num_queries, H // 2, W // 2), jnp.float32)),
    }


def serve_module_ms(trace_path: str):
    """Per-execution device time of the jit_serve module from a trace."""
    from tools.xplane_summary import summarize

    for name, ms, count in summarize(trace_path, 400):
        if "jit_serve" in name and "XLA Modules" in name:
            return ms / max(count, 1), count
    return None, 0


def main():
    fl = stage_flops()
    total = sum(fl.values())
    print(f"{'stage':12s} {'TF':>7s}")
    for k, v in fl.items():
        print(f"{k:12s} {v/1e12:7.2f}")
    print(f"{'TOTAL':12s} {total/1e12:7.2f}")
    if len(sys.argv) > 1:
        ms, cnt = serve_module_ms(sys.argv[1])
        if ms:
            tfs = total / (ms / 1e3)
            print(f"\nserve program: {ms:.1f} ms/scene (x{cnt})  "
                  f"{tfs/1e12:.1f} TF/s  {100*tfs/1e12/PEAK_TF:.1f}% MFU")


if __name__ == "__main__":
    main()
