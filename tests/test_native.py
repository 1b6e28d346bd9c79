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


# ---------------------------------------------------------------- LAP ----


def test_native_lap_matches_scipy():
    """native/lap.cpp vs scipy on random dense matrices (optimal cost must
    be identical; assignments may differ only among exact ties)."""
    from scipy.optimize import linear_sum_assignment

    from panst3r_tpu.native import lap_jv

    rng = np.random.default_rng(0)
    shapes = [(5, 5), (16, 16), (200, 16), (16, 200), (64, 33), (1, 7)]
    for R, C in shapes:
        for _ in range(3):
            cost = rng.standard_normal((R, C)) * 10
            res = lap_jv(cost)
            if res is None:
                pytest.skip("no toolchain")
            rows, cols = res
            assert len(rows) == min(R, C)
            assert len(np.unique(rows)) == len(rows)
            assert len(np.unique(cols)) == len(cols)
            sr, sc = linear_sum_assignment(cost)
            np.testing.assert_allclose(cost[rows, cols].sum(),
                                       cost[sr, sc].sum(), rtol=1e-12)


def test_native_lap_with_sentinel_padding():
    """Tall matcher-shaped matrices with big sentinel columns (the
    criterion's padding) stay exact."""
    from scipy.optimize import linear_sum_assignment

    from panst3r_tpu.native import lap_jv

    rng = np.random.default_rng(1)
    cost = rng.standard_normal((200, 16))
    cost[:, 10:] = 1e6                     # padded targets
    res = lap_jv(cost)
    if res is None:
        pytest.skip("no toolchain")
    rows, cols = res
    sr, sc = linear_sum_assignment(cost)
    np.testing.assert_allclose(cost[rows, cols].sum(),
                               cost[sr, sc].sum(), rtol=1e-12)
