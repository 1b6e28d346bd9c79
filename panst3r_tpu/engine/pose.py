"""Camera recovery from pointmaps: focal estimation + pose registration.

TPU-native equivalents of the dust3r/roma calls in the reference demo
pipeline (/root/reference/tools/demo_panst3r.py:258-277):

- ``estimate_focal_weiszfeld`` — dust3r `estimate_focal_knowing_depth(...,
  focal_mode='weiszfeld')`: robust (L1) focal from the local pointmap via
  Weiszfeld iteratively-reweighted least squares.
- ``rigid_points_registration`` — roma's weighted Procrustes: the SE(3)
  (optionally Sim(3)) transform aligning local→global pointmaps with
  confidence weights, via weighted Kabsch/SVD.

Both are pure jnp, jit-friendly, batched over views with vmap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iterations",))
def estimate_focal_weiszfeld(pts3d_local: jnp.ndarray, pp: jnp.ndarray,
                             iterations: int = 10) -> jnp.ndarray:
    """pts3d_local: (H, W, 3) camera-frame pointmap; pp: (2,) principal
    point (x, y).  Returns scalar focal (pixels).
    """
    H, W, _ = pts3d_local.shape
    u = (jnp.arange(W, dtype=jnp.float32)[None, :] - pp[0])
    v = (jnp.arange(H, dtype=jnp.float32)[:, None] - pp[1])
    u = jnp.broadcast_to(u, (H, W)).reshape(-1)
    v = jnp.broadcast_to(v, (H, W)).reshape(-1)

    pts = pts3d_local.reshape(-1, 3)
    z = jnp.maximum(pts[:, 2], 1e-6)
    xz = pts[:, 0] / z
    yz = pts[:, 1] / z

    dot_num = u * xz + v * yz
    dot_den = xz * xz + yz * yz
    # L2 init
    focal = jnp.sum(dot_num) / jnp.maximum(jnp.sum(dot_den), 1e-8)

    def body(_, f):
        # residual per pixel at current focal
        dist = jnp.sqrt((f * xz - u) ** 2 + (f * yz - v) ** 2)
        w = 1.0 / jnp.maximum(dist, 1e-8)
        return jnp.sum(w * dot_num) / jnp.maximum(jnp.sum(w * dot_den), 1e-8)

    return jax.lax.fori_loop(0, iterations, body, focal)


@jax.jit
def rigid_points_registration(src: jnp.ndarray, dst: jnp.ndarray,
                              weights: jnp.ndarray):
    """Weighted Kabsch: R, t minimizing Σ w ||R·src + t − dst||².

    src/dst: (N, 3); weights: (N,) (clipped to ≥ 0).  Returns (R (3,3),
    t (3,)).  Equivalent of roma.rigid_points_registration with
    compute_scaling=False (demo_panst3r.py:268-271).
    """
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(w.sum(), 1e-8)
    w = (w / wsum)[:, None]
    mu_s = (w * src).sum(0)
    mu_d = (w * dst).sum(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (w * sc).T @ dc                      # (3, 3)
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(Vt.T @ U.T)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = Vt.T @ S @ U.T
    t = mu_d - R @ mu_s
    return R, t


def recover_cameras(pointmaps: dict, true_shape) -> tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """Per-view focals + cam2world poses from postprocessed pointmaps.

    pointmaps: dict with pts3d (V, H, W, 3), pts3d_local, conf (V, H, W).
    Reproduces the demo's per-view recipe (demo_panst3r.py:258-277):
    Weiszfeld focal from the local pointmap, then weighted registration of
    local→global points with weights conf − 1.
    """
    pts_l = pointmaps["pts3d_local"]
    pts_g = pointmaps["pts3d"]
    conf = pointmaps["conf"]
    V, H, W = conf.shape
    pp = jnp.array([W / 2.0, H / 2.0], jnp.float32)

    focals = jax.vmap(lambda p: estimate_focal_weiszfeld(p, pp))(pts_l)
    Rs, ts = jax.vmap(rigid_points_registration)(
        pts_l.reshape(V, -1, 3), pts_g.reshape(V, -1, 3),
        conf.reshape(V, -1) - 1.0)
    c2w = jnp.zeros((V, 4, 4)).at[:, :3, :3].set(Rs).at[:, :3, 3].set(ts)
    c2w = c2w.at[:, 3, 3].set(1.0)
    return focals, c2w


def geotrf(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) (4,4) to (..., 3) points (dust3r geotrf equivalent)."""
    return pts @ T[:3, :3].T + T[:3, 3]
