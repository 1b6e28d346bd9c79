"""Bucketing/micro-batching substrate tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.core.bucketing import (DEFAULT_BUCKETS, Bucket,
                                        bucket_for_shape, landscape_shape,
                                        micro_batched, transpose_to_landscape,
                                        true_shape_of)


def test_bucket_properties():
    b = Bucket(384, 512)
    assert b.grid(16) == (24, 32)
    assert b.num_patches(16) == 768
    with pytest.raises(AssertionError):
        Bucket(512, 384)


def test_bucket_for_shape():
    assert bucket_for_shape(384, 512) == Bucket(384, 512)
    assert bucket_for_shape(512, 384) == Bucket(384, 512)  # portrait → same
    assert bucket_for_shape(150, 512) == Bucket(160, 512)
    assert bucket_for_shape(3000, 4000) == Bucket(384, 512)  # 4:3


def test_landscape_shape_and_transpose():
    assert landscape_shape(384, 512) == (384, 512, False)
    assert landscape_shape(512, 384) == (384, 512, True)
    img = np.zeros((512, 384, 3), np.uint8)
    out, portrait = transpose_to_landscape(img)
    assert out.shape == (384, 512, 3) and portrait


def test_true_shape_of():
    b = Bucket(384, 512)
    np.testing.assert_array_equal(true_shape_of(b, False), [384, 512])
    np.testing.assert_array_equal(true_shape_of(b, True), [512, 384])


def test_micro_batched_matches_direct(rng):
    x = jnp.asarray(rng.standard_normal((3, 5, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((3, 5, 4)), jnp.float32)

    def fn(a, b):
        return a * 2 + b, (a - b).sum(-1)

    direct = fn(x.reshape(-1, 4), y.reshape(-1, 4))
    for bs in (1, 2, 4, 15, None):
        out = micro_batched(fn, bs)(x, y)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(direct[0].reshape(3, 5, 4)),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   np.asarray(direct[1].reshape(3, 5)),
                                   atol=1e-6)
