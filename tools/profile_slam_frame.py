"""Per-frame latency of the streaming SLAM frontend on the real chip.

VERDICT r2 #5: the frontend previously padded every streamed frame to a
4-view encoder batch; with the chunk-capped stage fns a single frame runs
chunk-1 programs.  Reports warm per-frame wall time (serialized-RPC
regime: each frame's pointmaps are fetched, as a real SLAM consumer
would) for the flagship v1 model at 512x384.

Usage: python tools/profile_slam_frame.py [--frames 12]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.engine.slam import IncrementalFrontend
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config

    H, W = 384, 512
    model = PanSt3R(panst3r_v1_config())
    rng = np.random.default_rng(0)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W, 3), jnp.bfloat16),
        jnp.zeros((1, 2), bool), jnp.zeros((8, 768), jnp.bfloat16),
        (H // 16, W // 16))
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=8,
                             chunk=4, amp=True)
    frontend = IncrementalFrontend(engine, sim_threshold=0.0,  # kf rarely
                                   max_interval=6, max_keyframes=8)

    frames = (rng.standard_normal((args.frames, H, W, 3)) * 0.3
              ).astype(np.float32)
    # warm: bootstrap (2 kf) + one normal frame compiles all programs
    for i in range(3):
        out = frontend.process(frames[i], i)
        if out["pointmaps_raw"] is not None:
            np.asarray(out["pointmaps_raw"])

    ts = []
    for i in range(3, args.frames):
        t0 = time.perf_counter()
        out = frontend.process(frames[i], i)
        np.asarray(out["pointmaps_raw"])
        ts.append((time.perf_counter() - t0, out["is_keyframe"]))
    norm = [t for t, kf in ts if not kf]
    kfs = [t for t, kf in ts if kf]
    print(f"frames timed: {len(ts)} (non-kf {len(norm)}, kf {len(kfs)})")
    if norm:
        print(f"per-frame (non-keyframe): min {min(norm)*1e3:.1f} ms  "
              f"median {sorted(norm)[len(norm)//2]*1e3:.1f} ms")
    if kfs:
        print(f"per-frame (keyframe insert): min {min(kfs)*1e3:.1f} ms")

    # Pipelined stream() — sustained session fps including keyframe
    # insertion cadence; f32 and f16 pointmap wires.
    for dtype, label in ((None, "f32"), (jnp.float16, "f16")):
        frontend2 = IncrementalFrontend(engine, sim_threshold=0.0,
                                        max_interval=6, max_keyframes=8)
        seq = [frames[i % args.frames] for i in range(args.frames + 3)]
        n_warm = 3
        outs = []
        t0 = None
        for j, out in enumerate(frontend2.stream(seq, fetch_dtype=dtype)):
            if j == n_warm - 1:
                t0 = time.perf_counter()   # skip bootstrap+compile frames
            outs.append(out["is_keyframe"])
        dt = time.perf_counter() - t0
        n = len(seq) - n_warm
        print(f"stream[{label}]: {n} frames in {dt*1e3:.0f} ms = "
              f"{n / dt:.2f} fps sustained "
              f"({sum(outs)} keyframe inserts total)")


if __name__ == "__main__":
    main()
