"""Serving wire path (engine/inference.py serve_device/unpack_wire) and
the per-key-bias flash-kernel shortcut it leans on."""
import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.engine.inference import InferenceEngine
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.models.presets import tiny_config, tiny_v2_config

H, W, V, NCLS = 32, 48, 5, 6


def _engine(rng, preset=tiny_config, **kw):
    model = PanSt3R(preset())
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, H, W, 3), jnp.float32), jnp.zeros((1, 2), bool),
        jnp.zeros((NCLS, 24), jnp.float32), (H // 16, W // 16))
    return InferenceEngine(model, params, Bucket(H, W), num_keyframes=3,
                           chunk=2, amp=False, **kw)


def _scene(rng):
    images = (rng.random((V, H, W, 3)) * 255).astype(np.uint8)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 24)).astype(np.float32)
    return images, portrait, cls_emb


def test_serve_wire_matches_fuse_device(rng):
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)

    wire = np.asarray(eng.serve_device(images, portrait, cls_emb))
    dec = eng.unpack_wire(wire, V)

    out = eng.run_fused(images, portrait, cls_emb)
    pan, conf, seg_ids, labels, selected = eng.fuse_device(out, (H, W))

    np.testing.assert_array_equal(dec["pan"], np.asarray(pan)[0])
    np.testing.assert_allclose(dec["conf"], np.asarray(conf)[0],
                               atol=1.0 / 255 + 1e-6)
    np.testing.assert_array_equal(dec["seg_ids"], np.asarray(seg_ids)[0])
    np.testing.assert_array_equal(dec["labels"], np.asarray(labels)[0])
    np.testing.assert_array_equal(dec["selected"],
                                  np.asarray(selected)[0].astype(bool))


def test_serve_wire_v2_composite(rng):
    """The v2 composite (InputMixer + LoftUp) through the full serve wire:
    one program, packed buffer decodes to a valid panoptic partition."""
    eng = _engine(rng, preset=tiny_v2_config)
    images, portrait, cls_emb = _scene(rng)

    wire = np.asarray(eng.serve_device(images, portrait, cls_emb))
    dec = eng.unpack_wire(wire, V)
    assert dec["pan"].shape == (V, H, W)
    # pan ids reference selected segments only (0 = void)
    ids = np.unique(dec["pan"])
    live = set(dec["seg_ids"][dec["selected"]].tolist()) | {0}
    assert set(ids.tolist()) <= live
    # matches the staged pipeline + device fusion
    out = eng.run_fused(images, portrait, cls_emb)
    pan, *_ = eng.fuse_device(out, (H, W))
    np.testing.assert_array_equal(dec["pan"], np.asarray(pan)[0])


def test_serve_wire_mask_res(rng):
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)

    wire = np.asarray(eng.serve_device(images, portrait, cls_emb,
                                       fusion_res="mask"))
    dec = eng.unpack_wire(wire, V)
    assert dec["pan"].shape == (V, H, W)
    assert dec["conf"].shape == (V, H, W)

    # equals fusing at the mask resolution directly, nearest-upsampled
    out = eng.run_fused(images, portrait, cls_emb)
    hm, wm = out["pred_masks"].shape[-2:]
    pan, *_ = eng.fuse_device(out, (hm, wm))
    ref = np.asarray(pan)[0].repeat(H // hm, axis=1).repeat(W // wm, axis=2)
    np.testing.assert_array_equal(dec["pan"], ref)


def test_serve_wire_hybrid_res(rng):
    """fusion_res='hybrid': pan bit-exact with the full-res wire, conf
    2x2 mean-pooled then nearest-upsampled (wire is 37% smaller)."""
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)

    full = np.asarray(eng.serve_device(images, portrait, cls_emb))
    hyb = np.asarray(eng.serve_device(images, portrait, cls_emb,
                                      fusion_res="hybrid"))
    assert hyb.size == full.size - 3 * V * (H // 2) * (W // 2)
    dec_f = eng.unpack_wire(full, V)
    dec_h = eng.unpack_wire(hyb, V)
    np.testing.assert_array_equal(dec_h["pan"], dec_f["pan"])
    np.testing.assert_array_equal(dec_h["seg_ids"], dec_f["seg_ids"])
    np.testing.assert_array_equal(dec_h["labels"], dec_f["labels"])
    np.testing.assert_array_equal(dec_h["selected"], dec_f["selected"])
    # conf: mean-pool the full-res plane, quantize, upsample
    cf = dec_f["conf"].reshape(V, H // 2, 2, W // 2, 2).mean((2, 4))
    cf = cf.repeat(2, axis=1).repeat(2, axis=2)
    np.testing.assert_allclose(dec_h["conf"], cf, atol=2.0 / 255 + 1e-6)

    # hybrid4 (conf 4x4-pooled for traffic-bound links): pan/meta still
    # bit-exact with the full wire.
    h4 = np.asarray(eng.serve_device(images, portrait, cls_emb,
                                     fusion_res="hybrid4"))
    assert h4.size == full.size - V * H * W + V * (H // 4) * (W // 4)
    dec_4 = eng.unpack_wire(h4, V)
    np.testing.assert_array_equal(dec_4["pan"], dec_f["pan"])
    np.testing.assert_array_equal(dec_4["selected"], dec_f["selected"])
    cf4 = dec_f["conf"].reshape(V, H // 4, 4, W // 4, 4).mean((2, 4))
    cf4 = cf4.repeat(4, axis=1).repeat(4, axis=2)
    np.testing.assert_allclose(dec_4["conf"], cf4, atol=2.0 / 255 + 1e-6)


def test_serve_latency_matches_serve_device(rng):
    """serve_latency_device (chunked uploads overlapped with chunked
    tower programs + one tail program) must produce the same wire
    semantics as the one-program serve_device."""
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)

    full = eng.unpack_wire(
        np.asarray(eng.serve_device(images, portrait, cls_emb)), V)
    lat = eng.unpack_wire(
        np.asarray(eng.serve_latency_device(images, portrait, cls_emb)), V)
    np.testing.assert_array_equal(lat["pan"], full["pan"])
    np.testing.assert_array_equal(lat["seg_ids"], full["seg_ids"])
    np.testing.assert_array_equal(lat["labels"], full["labels"])
    np.testing.assert_array_equal(lat["selected"], full["selected"])
    np.testing.assert_allclose(lat["conf"], full["conf"],
                               atol=1.0 / 255 + 1e-6)

    # options ride through identically (hybrid fusion + cameras)
    w = np.asarray(eng.serve_latency_device(
        images, portrait, cls_emb, fusion_res="hybrid", with_cameras=True))
    dec = eng.unpack_wire(w, V, with_cameras=True)
    np.testing.assert_array_equal(dec["pan"], full["pan"])
    assert dec["focals"].shape == (V,)


def test_serve_stream_matches_sequential(rng):
    """serve_stream (pipelined uploader/fetcher threads) must yield the
    same decoded results, in order, as sequential serve_device calls."""
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)
    scenes = [np.ascontiguousarray(np.roll(images, s + 1, axis=0))
              for s in range(4)]

    seq = [eng.unpack_wire(np.asarray(
        eng.serve_device(s, portrait, cls_emb, fusion_res="hybrid")), V)
        for s in scenes]
    stream = list(eng.serve_stream(scenes, portrait, cls_emb,
                                   fusion_res="hybrid"))
    assert len(stream) == len(seq)
    for a, b in zip(stream, seq):
        np.testing.assert_array_equal(a["pan"], b["pan"])
        np.testing.assert_array_equal(a["conf"], b["conf"])
        np.testing.assert_array_equal(a["selected"], b["selected"])

    # early abandon must not deadlock
    gen = eng.serve_stream(scenes, portrait, cls_emb, fusion_res="hybrid")
    first = next(gen)
    gen.close()
    np.testing.assert_array_equal(first["pan"], seq[0]["pan"])


def test_serve_wire_retrieval_keyframes(rng):
    """keyframe_mode='retrieval' computes keyframes ON DEVICE inside the
    one-program wire; result must match the staged pipeline with the host
    retrieval selection, and the wire ships the chosen keyframes."""
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)
    K = eng.num_keyframes

    wire = np.asarray(eng.serve_device(images, portrait, cls_emb,
                                       keyframe_mode="retrieval"))
    dec = eng.unpack_wire(wire, V, with_keyframes=K)
    assert len(dec["keyframes"]) == K
    assert len(set(dec["keyframes"].tolist())) == K

    out = eng.run_device(images, portrait, cls_emb, use_retrieval=True)
    assert sorted(out["keyframes"]) == sorted(dec["keyframes"].tolist())
    pan, *_ = eng.fuse_device(out, (H, W))
    np.testing.assert_array_equal(dec["pan"], np.asarray(pan)[0])


def test_serve_wire_all_options_combined(rng):
    """retrieval keyframes + cameras + half-res fusion in ONE wire: the
    tail sections must decode in the documented order."""
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)
    K = eng.num_keyframes

    wire = np.asarray(eng.serve_device(
        images, portrait, cls_emb, keyframe_mode="retrieval",
        with_cameras=True, fusion_res="mask"))
    dec = eng.unpack_wire(wire, V, with_cameras=True, with_keyframes=K)
    assert dec["pan"].shape == (V, H, W)
    assert sorted(dec["keyframes"].tolist()) == sorted(
        set(dec["keyframes"].tolist()))
    assert dec["keyframes"].max() < V
    assert dec["focals"].shape == (V,)
    assert np.isfinite(dec["cam2world"]).all()
    np.testing.assert_allclose(dec["cam2world"][:, 3], [[0, 0, 0, 1]] * V)


def test_serve_wire_uint16_path(rng):
    """ncls >= 255 forces the uint16 wire; pack/unpack must stay exact."""
    eng = _engine(rng)
    images = (rng.random((V, H, W, 3)) * 255).astype(np.uint8)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((300, 24)).astype(np.float32)

    wire = np.asarray(eng.serve_device(images, portrait, cls_emb))
    assert wire.dtype == np.uint16
    dec = eng.unpack_wire(wire, V)
    out = eng.run_fused(images, portrait, cls_emb)
    pan, conf, seg_ids, labels, selected = eng.fuse_device(out, (H, W))
    np.testing.assert_array_equal(dec["pan"], np.asarray(pan)[0])
    np.testing.assert_array_equal(dec["labels"], np.asarray(labels)[0])


def test_serve_wire_with_cameras(rng):
    """with_cameras appends on-device recovered focals + poses that match
    host-side recover_cameras on the same pointmaps."""
    from panst3r_tpu.engine.pose import recover_cameras
    from panst3r_tpu.models.decoder import postprocess

    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)

    wire = np.asarray(eng.serve_device(images, portrait, cls_emb,
                                       with_cameras=True))
    dec = eng.unpack_wire(wire, V, with_cameras=True)
    assert dec["focals"].shape == (V,)
    assert dec["cam2world"].shape == (V, 4, 4)
    np.testing.assert_allclose(dec["cam2world"][:, 3], [[0, 0, 0, 1]] * V)

    out = eng.run_fused(images, portrait, cls_emb)
    post = postprocess(np.asarray(out["pointmaps_raw"]).astype(np.float32))
    focals, c2w = recover_cameras(post, (H, W))
    np.testing.assert_allclose(dec["focals"], np.asarray(focals),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dec["cam2world"], np.asarray(c2w),
                               rtol=1e-3, atol=1e-3)
    # the base wire still decodes identically
    base = eng.unpack_wire(np.asarray(
        eng.serve_device(images, portrait, cls_emb)), V)
    np.testing.assert_array_equal(dec["pan"], base["pan"])


def test_kernel_per_key_bias_shortcut(rng):
    """(B,1,1,Nk)-shaped bias must take the cheap per-key path and match
    the dense reference, including -inf entries and padded tails."""
    from jax.experimental.pallas import tpu as pltpu

    from panst3r_tpu.ops.attention import dot_product_attention
    from panst3r_tpu.ops.pallas.flash_attention import pallas_mha

    B, Hh, Nq, Nk, D = 2, 3, 100, 140, 64
    q = jnp.asarray(rng.standard_normal((B, Hh, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hh, Nk, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hh, Nk, D)), jnp.float32)
    kb = rng.standard_normal((B, 1, 1, Nk)).astype(np.float32)
    kb[:, :, :, -17:] = -np.inf          # some keys fully masked
    kb = jnp.asarray(kb)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_mha(q, k, v, bias=kb)

    ref = dot_product_attention(q, k, v, bias=kb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_serve_many_matches_single(rng):
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)
    scenes = np.stack([images, images[::-1].copy()])
    ports = np.stack([portrait, portrait])

    wires = np.asarray(eng.serve_many_device(scenes, ports, cls_emb))
    for s in range(2):
        single = np.asarray(eng.serve_device(scenes[s], portrait, cls_emb))
        np.testing.assert_array_equal(wires[s], single)


def test_serve_latency_overlap_matches(rng):
    """serve_latency_overlap (keyframes-first uploads, memory + joint
    decode launched mid-upload, nk-only tail program) must produce the
    same wire semantics as the one-program serve_device."""
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)

    full = eng.unpack_wire(
        np.asarray(eng.serve_device(images, portrait, cls_emb)), V)
    lat = eng.unpack_wire(
        np.asarray(eng.serve_latency_overlap(images, portrait, cls_emb)), V)
    np.testing.assert_array_equal(lat["pan"], full["pan"])
    np.testing.assert_array_equal(lat["seg_ids"], full["seg_ids"])
    np.testing.assert_array_equal(lat["labels"], full["labels"])
    np.testing.assert_array_equal(lat["selected"], full["selected"])
    np.testing.assert_allclose(lat["conf"], full["conf"],
                               atol=1.0 / 255 + 1e-6)

    # hybrid fusion + cameras ride through identically
    w = np.asarray(eng.serve_latency_overlap(
        images, portrait, cls_emb, fusion_res="hybrid", with_cameras=True))
    dec = eng.unpack_wire(w, V, with_cameras=True)
    np.testing.assert_array_equal(dec["pan"], full["pan"])
    assert dec["focals"].shape == (V,)

    # K == V degenerates to the v1 path
    wv = np.asarray(eng.serve_latency_overlap(images, portrait, cls_emb,
                                              num_keyframes=V))
    np.testing.assert_array_equal(eng.unpack_wire(wv, V)["pan"],
                                  full["pan"])


def test_yuv420_roundtrip_and_serve_wire(rng):
    """Packed YUV420 serving input (ops/image.py): rank-3 uint8 input to
    serve_device decodes on device.  Checks: (a) pack→unpack round-trip
    quality on random RGB (luma-exact; chroma 2x2-lossy ⇒ PSNR > 30 dB);
    (b) gray images (no chroma) round-trip within 1/255 ⇒ the serve wire
    matches the RGB-input wire exactly on gray scenes; (c) the YUV path
    produces a decodable wire on color scenes."""
    import jax.numpy as jnp

    from panst3r_tpu.ops.image import rgb_to_yuv420, yuv420_to_rgb

    # smooth image (chroma varies at image scale, like photos — random
    # per-pixel chroma is the 4:2:0 worst case and not representative)
    low = rng.random((V, H // 8, W // 8, 3)) * 255
    img = np.clip(np.repeat(np.repeat(low, 8, axis=1), 8, axis=2)
                  + rng.standard_normal((V, H, W, 3)) * 2.0,
                  0, 255).astype(np.uint8)
    dec = np.asarray(yuv420_to_rgb(jnp.asarray(rgb_to_yuv420(img))))
    mse = float(((dec - img.astype(np.float32)) ** 2).mean())
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 30.0, psnr
    # luma of the reconstruction matches the original luma to rounding
    w = np.asarray([0.299, 0.587, 0.114], np.float32)
    assert np.abs((dec @ w) - (img.astype(np.float32) @ w)).max() < 2.0

    eng = _engine(rng)
    gray = np.repeat((rng.random((V, H, W, 1)) * 255).astype(np.uint8),
                     3, axis=-1)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 24)).astype(np.float32)
    wire_rgb = np.asarray(eng.serve_device(gray, portrait, cls_emb))
    wire_yuv = np.asarray(eng.serve_device(rgb_to_yuv420(gray), portrait,
                                           cls_emb))
    dec_rgb = eng.unpack_wire(wire_rgb, V)
    dec_yuv = eng.unpack_wire(wire_yuv, V)
    agree = (dec_rgb["pan"] == dec_yuv["pan"]).mean()
    assert agree > 0.99, agree

    color = (rng.random((V, H, W, 3)) * 255).astype(np.uint8)
    wire_c = np.asarray(eng.serve_device(rgb_to_yuv420(color), portrait,
                                         cls_emb))
    dec_c = eng.unpack_wire(wire_c, V)
    assert dec_c["pan"].shape == (V, H, W)


def test_yuv420_decode_equivalence_and_latency(rng):
    """The packed wire is EXACTLY "decode to uint8 RGB, then the normal
    uint8 path" (inference.py _image_cast rint): serve(pack(x)) is
    byte-identical to serve(decode(pack(x))) on arbitrary COLOR scenes,
    and the chunk-uploading latency paths (which decode each packed chunk
    on device, half-size uploads) produce the same wire as the
    one-program serve."""
    import jax.numpy as jnp

    from panst3r_tpu.ops.image import rgb_to_yuv420, yuv420_to_rgb

    eng = _engine(rng)
    color = (rng.random((V, H, W, 3)) * 255).astype(np.uint8)
    packed = rgb_to_yuv420(color)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 24)).astype(np.float32)

    decoded = np.asarray(
        jnp.rint(yuv420_to_rgb(jnp.asarray(packed))).astype(jnp.uint8))
    w_pack = np.asarray(eng.serve_device(packed, portrait, cls_emb))
    w_dec = np.asarray(eng.serve_device(decoded, portrait, cls_emb))
    np.testing.assert_array_equal(w_pack, w_dec)

    w_lat = np.asarray(eng.serve_latency_device(packed, portrait, cls_emb))
    np.testing.assert_array_equal(w_lat, w_pack)
    w_ovl = np.asarray(eng.serve_latency_overlap(packed, portrait, cls_emb))
    np.testing.assert_array_equal(w_ovl, w_pack)


def test_yuv420_serve_many_matches_single(rng):
    """The vmapped multi-scene program accepts packed-YUV scenes
    (rank-3 per example under vmap) and its wires match per-scene
    serve_device byte-exactly."""
    from panst3r_tpu.ops.image import rgb_to_yuv420

    eng = _engine(rng)
    images = (rng.random((V, H, W, 3)) * 255).astype(np.uint8)
    scenes = np.stack([rgb_to_yuv420(images),
                       rgb_to_yuv420(images[::-1].copy())])
    portrait = np.zeros(V, bool)
    ports = np.stack([portrait, portrait])
    cls_emb = rng.standard_normal((NCLS, 24)).astype(np.float32)

    wires = np.asarray(eng.serve_many_device(scenes, ports, cls_emb))
    for s in range(2):
        single = np.asarray(eng.serve_device(scenes[s], portrait, cls_emb))
        np.testing.assert_array_equal(wires[s], single)
