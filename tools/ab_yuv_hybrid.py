"""A/B: standard 8-view hybrid-wire serving, RGB vs packed-YUV420 input.

The hybrid pipelined loop is link-arrival-bound (PERFORMANCE.md round 4:
device time fell 11.5 ms/scene and wall fps did not move).  The packed
YUV420 input wire (ops/image.rgb_to_yuv420) halves the 4.7 MB/scene
upload; this probe measures whether that shows up at the 8-view serving
shape the headline bench tracks (it already did at 50 views: 33-36 ->
38.5 fps).

Usage: python tools/ab_yuv_hybrid.py [loops]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config
    from panst3r_tpu.ops.image import rgb_to_yuv420

    H, W, V, K, NCLS = 384, 512, 8, 4, 32
    loops = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (V, H, W, 3), dtype=np.uint8)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 768)).astype(np.float32)

    model = PanSt3R(panst3r_v1_config(init_num_views=2))
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, H, W, 3), jnp.bfloat16),
        jnp.zeros((1, 2), bool),
        jnp.zeros((NCLS, 768), jnp.bfloat16), (H // 16, W // 16))
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=K,
                             chunk=4, amp=True)

    nthr = 10
    scenes = [np.ascontiguousarray(np.roll(images, s + 1, axis=0))
              for s in range(nthr)]
    scenes_yuv = [rgb_to_yuv420(s) for s in scenes]
    port_dev, cls_dev = jnp.asarray(portrait), jnp.asarray(cls_emb)
    kw = dict(fusion_res="hybrid")

    # warm both programs
    w_rgb = np.asarray(engine.serve_device(scenes[0], port_dev, cls_dev, **kw))
    w_yuv = np.asarray(engine.serve_device(scenes_yuv[0], port_dev, cls_dev,
                                           **kw))
    # sanity: gray scenes byte-identical is covered in tests; here just
    # check shapes agree
    assert w_rgb.shape == w_yuv.shape, (w_rgb.shape, w_yuv.shape)

    def loop(sc):
        t0 = time.perf_counter()
        n = 0
        for res in engine.serve_stream(sc, port_dev, cls_dev, **kw):
            assert res["pan"].shape[0] == V
            n += 1
        assert n == nthr
        return nthr * V / (time.perf_counter() - t0)

    for name, sc in (("rgb", scenes), ("yuv420", scenes_yuv)):
        passes = [loop(sc) for _ in range(loops)]
        print(f"{name:8s} best {max(passes):6.2f} fps  "
              f"median {float(np.median(passes)):6.2f}  "
              f"passes {[round(p, 1) for p in passes]}")


if __name__ == "__main__":
    main()


def latency_ab():
    """RGB vs YUV through the overlapped latency path."""
    import time

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config
    from panst3r_tpu.ops.image import rgb_to_yuv420

    H, W, V, K, NCLS = 384, 512, 8, 4, 32
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (V, H, W, 3), dtype=np.uint8)
    packed = rgb_to_yuv420(images)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 768)).astype(np.float32)

    model = PanSt3R(panst3r_v1_config(init_num_views=2))
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, H, W, 3), jnp.bfloat16),
        jnp.zeros((1, 2), bool),
        jnp.zeros((NCLS, 768), jnp.bfloat16), (H // 16, W // 16))
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=K,
                             chunk=4, amp=True)
    kw = dict(fusion_res="hybrid", chunk=2)
    for name, img in (("rgb", images), ("yuv420", packed)):
        np.asarray(engine.serve_latency_overlap(img, portrait, cls_emb, **kw))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            w = np.asarray(engine.serve_latency_overlap(img, portrait,
                                                        cls_emb, **kw))
            res = engine.unpack_wire(w, V)
            assert res["pan"].shape[0] == V
            times.append(time.perf_counter() - t0)
        print(f"latency {name:8s} best {V / min(times):6.2f} fps  "
              f"median {V / float(np.median(times)):6.2f}")
