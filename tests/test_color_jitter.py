"""ColorJitter semantics tests (torchvision-free environment).

The reference trains with dust3r's ColorJitter — torchvision
``ColorJitter(0.5, 0.5, 0.5, 0.1)`` before the [-1, 1] normalization
(/root/reference/configs/base.yaml:47).  torchvision is not in this
image, so the ops are pinned two ways: analytic identities of the
documented torchvision math (blend formula, ITU-R 601 grayscale, HSV hue
rotation) and cross-checks against PIL's ImageEnhance (the backend
torchvision's uint8 path reproduces), at uint8 quantization tolerance.
"""
import numpy as np
import pytest
from PIL import Image, ImageEnhance

from panst3r_tpu.data.transforms import (adjust_brightness, adjust_contrast,
                                         adjust_hue, adjust_saturation,
                                         color_jitter)

GRAY_W = np.asarray([0.2989, 0.587, 0.114], np.float32)


def _rand_img(seed=0, h=31, w=45):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(h, w, 3)).astype(np.float32)


def _rand_u8(seed=0, h=32, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


# --- analytic identities -------------------------------------------------

def test_brightness_is_scaling():
    img = _rand_img(1)
    np.testing.assert_allclose(adjust_brightness(img, 0.5), 0.5 * img,
                               atol=1e-7)
    np.testing.assert_allclose(adjust_brightness(img, 1.0), img, atol=1e-7)
    # clamped at 1
    assert adjust_brightness(img, 3.0).max() <= 1.0


def test_contrast_blends_with_mean_gray():
    img = _rand_img(2)
    mean = float((img @ GRAY_W).mean())
    f = 0.6
    expected = np.clip(f * img + (1 - f) * mean, 0, 1)
    np.testing.assert_allclose(adjust_contrast(img, f), expected, atol=1e-6)
    # factor 0 -> constant mean image
    out0 = adjust_contrast(img, 0.0)
    assert np.ptp(out0) < 1e-6


def test_saturation_zero_is_grayscale_and_gray_invariant():
    img = _rand_img(3)
    out0 = adjust_saturation(img, 0.0)
    # channels equal, at the ITU-R 601 luma
    np.testing.assert_allclose(out0[..., 0], out0[..., 1], atol=1e-6)
    np.testing.assert_allclose(out0[..., 0], img @ GRAY_W, atol=1e-6)
    gray = np.repeat(_rand_img(4)[..., :1], 3, axis=-1)
    # luma weights sum to 0.9999 (ITU-R 601), so "invariant" holds to ~1e-4
    np.testing.assert_allclose(adjust_saturation(gray, 1.7), gray, atol=2e-4)


def test_hue_rotation_on_primaries_and_roundtrip():
    red = np.zeros((2, 2, 3), np.float32)
    red[..., 0] = 1.0
    # +1/3 rotation: red -> green -> blue
    green = adjust_hue(red, 1 / 3)
    np.testing.assert_allclose(green[..., 1], 1.0, atol=1e-6)
    assert green[..., 0].max() < 1e-6 and green[..., 2].max() < 1e-6
    img = _rand_img(5)
    back = adjust_hue(adjust_hue(img, 0.07), -0.07)
    np.testing.assert_allclose(back, img, atol=1e-5)
    # hue leaves grayscale pixels unchanged
    gray = np.repeat(_rand_img(6)[..., :1], 3, axis=-1)
    np.testing.assert_allclose(adjust_hue(gray, 0.1), gray, atol=1e-6)


# --- PIL cross-checks (uint8 quantization tolerance) ---------------------

@pytest.mark.parametrize("factor", [0.5, 1.4])
def test_brightness_matches_pil(factor):
    u8 = _rand_u8(7)
    ref = np.asarray(ImageEnhance.Brightness(
        Image.fromarray(u8)).enhance(factor), np.float32) / 255.0
    ours = adjust_brightness(u8.astype(np.float32) / 255.0, factor)
    np.testing.assert_allclose(ours, ref, atol=2 / 255)


@pytest.mark.parametrize("factor", [0.5, 1.4])
def test_saturation_matches_pil(factor):
    u8 = _rand_u8(8)
    ref = np.asarray(ImageEnhance.Color(
        Image.fromarray(u8)).enhance(factor), np.float32) / 255.0
    ours = adjust_saturation(u8.astype(np.float32) / 255.0, factor)
    np.testing.assert_allclose(ours, ref, atol=3 / 255)


# --- composed jitter -----------------------------------------------------

def test_color_jitter_deterministic_and_in_range():
    img = _rand_img(9)
    a = color_jitter(img, np.random.default_rng(42))
    b = color_jitter(img, np.random.default_rng(42))
    c = color_jitter(img, np.random.default_rng(43))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)          # different seed -> different aug
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.dtype == np.float32


def test_dataset_applies_color_jitter(tmp_path):
    """ScanNetppPanoptic(transform='ColorJitter') must change the loaded
    image deterministically; no-transform load must be unchanged."""
    from tests.test_data import _make_scannetpp

    root = str(tmp_path / "scannetpp")
    _make_scannetpp(root)
    from panst3r_tpu.data.scannetpp import ScanNetppPanoptic

    plain = ScanNetppPanoptic(root, resolution=(64, 48), num_views=2,
                              aug_crop=0, seed=7)
    jit = ScanNetppPanoptic(root, resolution=(64, 48), num_views=2,
                            aug_crop=0, seed=7, transform="ColorJitter")
    v0 = plain[0][0]["img"]
    j0 = jit[0][0]["img"]
    j0b = jit[0][0]["img"]
    np.testing.assert_array_equal(j0, j0b)       # deterministic
    assert not np.allclose(v0, j0)               # actually jittered
    assert np.abs(j0).max() <= 1.0 + 1e-6        # still in dust3r range
