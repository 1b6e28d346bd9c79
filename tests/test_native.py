"""Native rasterizer tests (C++ via ctypes, with numpy fallback parity)."""
import numpy as np
import pytest

from panst3r_tpu.native import _build, _rasterize_numpy, rasterize_mesh


def _square_mesh(z=2.0, label=7):
    # Two triangles forming a square from (-0.5,-0.5) to (0.5,0.5) at depth z.
    verts = np.array([[-0.5, -0.5, z], [0.5, -0.5, z],
                      [0.5, 0.5, z], [-0.5, 0.5, z]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    labels = np.array([label, label], np.int32)
    return verts, faces, labels


K = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32)


def test_rasterize_square_depth_and_label():
    verts, faces, labels = _square_mesh()
    depth, label = rasterize_mesh(verts, faces, labels, K, 48, 64)
    # center of the square projects to the principal point
    assert label[24, 32] == 7
    np.testing.assert_allclose(depth[24, 32], 2.0, rtol=1e-5)
    # projected half-size: 0.5/2*40 = 10 px
    assert label[24, 32 + 8] == 7
    assert label[24, 32 + 14] == 0
    assert depth[0, 0] == 0.0


def test_rasterize_occlusion():
    v1, f1, l1 = _square_mesh(z=2.0, label=1)
    v2, f2, l2 = _square_mesh(z=1.0, label=2)  # closer, smaller on screen? no
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    labels = np.concatenate([l1, l2])
    depth, label = rasterize_mesh(verts, faces, labels, K, 48, 64)
    assert label[24, 32] == 2          # closer surface wins
    np.testing.assert_allclose(depth[24, 32], 1.0, rtol=1e-5)


def test_cpp_matches_numpy_fallback(rng):
    n = 40
    verts = rng.standard_normal((n, 3)).astype(np.float32)
    verts[:, 2] = np.abs(verts[:, 2]) + 1.0
    faces = rng.integers(0, n, (30, 3)).astype(np.int32)
    labels = rng.integers(1, 9, 30).astype(np.int32)

    d_np, l_np = _rasterize_numpy(verts, faces, labels, K, 48, 64)
    if _build() is None:
        pytest.skip("no C++ toolchain")
    d_cc, l_cc = rasterize_mesh(verts, faces, labels, K, 48, 64)
    np.testing.assert_allclose(d_cc, d_np, atol=1e-4)
    mismatch = (l_cc != l_np).mean()
    assert mismatch < 0.01  # edge-pixel ties may differ
