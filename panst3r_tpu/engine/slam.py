"""Incremental SLAM frontend + global pose-graph refinement backend.

North-star extension (BASELINE.json): the reference runs an offline
all-keyframes pass (panst3r.py:169-284); here the same memory-conditioned
machinery becomes an **online frontend** — per-frame O(1) decode against the
current token memory with a keyframe-insertion policy — plus an **offline
backend**: an on-manifold Gauss-Newton pose-graph optimizer over keyframe
poses with relative-pose edges measured from pointmap registration.

All backend math is jnp/jit: residuals and normal-equation blocks are built
with vmap; the per-edge Hessian contributions are a sum-reduction that maps
directly onto `psum` when edges are sharded across devices (the distributed
BA reduction of SURVEY.md §5.8).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.engine.pose import rigid_points_registration

# ----------------------------------------------------------- SE(3) utils --


def hat(w: jnp.ndarray) -> jnp.ndarray:
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zeros, -wz, wy], -1),
        jnp.stack([wz, zeros, -wx], -1),
        jnp.stack([-wy, wx, zeros], -1),
    ], -2)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi: (..., 6) [rho, phi] → (..., 4, 4) SE(3)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    K = hat(phi / theta)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    th = theta[..., None]
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = I + s * K + (1 - c) * (K @ K)
    # Left Jacobian: V = I + ((1-cosθ)/θ)K + ((θ-sinθ)/θ)K²
    V = I + ((1 - c) / th) * K + ((th - s) / th) * (K @ K)
    t = (V @ rho[..., None])[..., 0]
    T = jnp.zeros((*xi.shape[:-1], 4, 4))
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return T


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    scale = jnp.where(theta < 1e-6, 0.5,
                      theta / (2.0 * jnp.sin(jnp.maximum(theta, 1e-12))))
    return w * scale[..., None]


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    phi = so3_log(T[..., :3, :3])
    theta = jnp.maximum(jnp.linalg.norm(phi, axis=-1, keepdims=True), 1e-12)
    K = hat(phi / theta)
    th = theta[..., None]
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    Vinv = (I - 0.5 * th * K
            + (1 - (th * (1 + c)) / (2 * s + 1e-12)) * (K @ K))
    small = (theta < 1e-6)[..., None]
    Vinv = jnp.where(small, I - 0.5 * hat(phi), Vinv)
    rho = (Vinv @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    return out.at[..., 3, 3].set(1.0)


# --------------------------------------------------------- pose graph GN --


@functools.partial(jax.jit, static_argnames=("iters",))
def pose_graph_gauss_newton(poses: jnp.ndarray, edges: jnp.ndarray,
                            rel_meas: jnp.ndarray,
                            weights: Optional[jnp.ndarray] = None,
                            iters: int = 10, damping: float = 1e-6):
    """On-manifold GN over SE(3) poses with relative-pose edges.

    poses: (V, 4, 4) initial cam2world; edges: (E, 2) int (i, j);
    rel_meas: (E, 4, 4) measured T_j⁻¹·T_i; weights: (E,).
    Pose 0 is the gauge anchor (held fixed).  Returns refined (V, 4, 4).

    Residual per edge: log((T_j · rel_meas)⁻¹ · T_i) ∈ ℝ⁶, left-perturbation
    Jacobians approximated by ±I (standard for small residuals) — the GN
    normal equations then reduce to a graph Laplacian over 6-blocks, built
    with scatter-adds (→ psum-ready when edges shard across devices).
    """
    V = poses.shape[0]
    E = edges.shape[0]
    if weights is None:
        weights = jnp.ones((E,))

    def body(poses, _):
        Ti = poses[edges[:, 0]]
        Tj = poses[edges[:, 1]]
        pred = se3_inv(Tj @ rel_meas) @ Ti
        r = se3_log(pred)                       # (E, 6)

        # J_i = +I, J_j = −I (first-order, left perturbation).
        w = weights[:, None]
        # Gradient g and block-diagonal of H via scatter-add.
        g = jnp.zeros((V, 6))
        g = g.at[edges[:, 0]].add(w * r)
        g = g.at[edges[:, 1]].add(-w * r)
        # Full H: Laplacian with 6x6 identity blocks × weights.
        Hd = jnp.zeros((V,))
        Hd = Hd.at[edges[:, 0]].add(weights)
        Hd = Hd.at[edges[:, 1]].add(weights)
        Hoff = jnp.zeros((V, V))
        Hoff = Hoff.at[edges[:, 0], edges[:, 1]].add(-weights)
        Hoff = Hoff.at[edges[:, 1], edges[:, 0]].add(-weights)
        L = Hoff + jnp.diag(Hd)                 # (V, V) scalar Laplacian
        # Gauge fix: pin node 0.
        L = L.at[0].set(0.0).at[:, 0].set(0.0).at[0, 0].set(1.0)
        g = g.at[0].set(0.0)
        L = L + damping * jnp.eye(V)
        delta = -jnp.linalg.solve(L, g)         # (V, 6) per-block solve
        upd = se3_exp(delta)
        return upd @ poses, jnp.sum(weights * jnp.sum(r * r, -1))

    poses, costs = jax.lax.scan(body, poses, None, length=iters)
    return poses, costs


def measure_relative_poses(pts_local: jnp.ndarray, pts_global: jnp.ndarray,
                           conf: jnp.ndarray, edges: np.ndarray):
    """Edge measurements from pointmap registration.

    Per view: T_i = Procrustes(local_i → global_i) (demo recipe); per edge
    (i, j): rel = T_j⁻¹ T_i.  Returns (init_poses (V,4,4), rel (E,4,4),
    edge weights from mean confidences).
    """
    V = conf.shape[0]
    Rs, ts = jax.vmap(rigid_points_registration)(
        pts_local.reshape(V, -1, 3), pts_global.reshape(V, -1, 3),
        conf.reshape(V, -1) - 1.0)
    T = jnp.zeros((V, 4, 4)).at[:, :3, :3].set(Rs).at[:, :3, 3].set(ts)
    T = T.at[:, 3, 3].set(1.0)
    rel = se3_inv(T[edges[:, 1]]) @ T[edges[:, 0]]
    w = (conf.reshape(V, -1).mean(-1)[edges[:, 0]]
         + conf.reshape(V, -1).mean(-1)[edges[:, 1]]) / 2.0
    return T, rel, w


def refine_scene_poses(pointmaps: dict, edges: Optional[np.ndarray] = None,
                       iters: int = 10):
    """Backend entry: registration init + pose-graph GN refinement.

    pointmaps: dict with pts3d (V, H, W, 3), pts3d_local, conf (V, H, W).
    edges default to the sequential chain + loop closure to view 0.
    """
    conf = jnp.asarray(pointmaps["conf"])
    V = conf.shape[0]
    if edges is None:
        seq = [(i, i + 1) for i in range(V - 1)]
        loops = [(0, i) for i in range(2, V)]
        edges = np.asarray(seq + loops, np.int32)
    edges = jnp.asarray(edges)
    T0, rel, w = measure_relative_poses(
        jnp.asarray(pointmaps["pts3d_local"]),
        jnp.asarray(pointmaps["pts3d"]), conf, edges)
    refined, costs = pose_graph_gauss_newton(T0, edges, rel, w, iters=iters)
    return refined, T0, costs


# ------------------------------------------------------------- frontend --


@dataclasses.dataclass
class FrontendState:
    """Online state: the token memory + bookkeeping."""

    mem: object
    keyframe_ids: list
    kf_descriptors: list       # pooled encoder descriptors per keyframe
    slots: list = dataclasses.field(default_factory=list)  # memory slot/kf
    frame_count: int = 0


class IncrementalFrontend:
    """Online per-frame processing against a growing keyframe memory.

    Frames decode in O(1) against the frozen memory
    (reference step-2 machinery, engine/must3r.py:71-129); a frame is
    promoted to keyframe — injected into the memory — when its pooled
    encoder descriptor is dissimilar enough from all existing keyframes
    (coverage criterion, the online analog of FPS selection) or every
    ``max_interval`` frames.
    """

    def __init__(self, engine, sim_threshold: float = 0.85,
                 max_interval: int = 10, max_keyframes: int = 64,
                 protected: int = 2):
        self.engine = engine
        self.sim_threshold = sim_threshold
        self.max_interval = max_interval
        self.max_keyframes = max_keyframes
        # First `protected` keyframes are never evicted — the gauge anchors
        # (reference mem_protected_imgs semantics, engine/must3r.py:76-80).
        self.protected = protected
        self.state: Optional[FrontendState] = None
        self._since_kf = 0

    def _descriptor(self, x):
        d = jnp.sign(x) * jnp.sqrt(jnp.abs(x))
        d = d.mean(axis=0)
        return d / jnp.maximum(jnp.linalg.norm(d), 1e-8)

    def process(self, image: np.ndarray, frame_id: int):
        """image: (H, W, 3) canonical.  Returns dict with pointmaps_raw,
        is_keyframe; panoptic decode hooks onto the same render output."""
        eng = self.engine
        x, pos = eng._encode_all(image[None])
        desc = self._descriptor(x[0].astype(jnp.float32))

        if self.state is None:
            # Bootstrap: first frame becomes keyframe 0; memory needs >= 2
            # views to initialize (reference init_num_views=2) so we inject
            # the first frame twice-lazily: store and wait for frame 2.
            self._pending = (x, pos, image)
            self.state = FrontendState(mem=None, keyframe_ids=[frame_id],
                                       kf_descriptors=[desc])
            return {"is_keyframe": True, "pointmaps_raw": None}

        if self.state.mem is None:
            px, ppos, _ = self._pending
            x2 = jnp.concatenate([px, x])[None]
            pos2 = jnp.concatenate([ppos, pos])[None]
            c = eng.model.config
            import panst3r_tpu.models.memory as memlib

            capacity = self.max_keyframes * eng.n_tokens
            dtype = jnp.bfloat16 if eng.amp else jnp.float32
            mem = memlib.init_memory(c.decoder.depth, 1, capacity,
                                     c.decoder.dim, dtype=dtype)
            mem, _ = eng._update(eng.params, x2, mem, pos2)
            self.state.mem = mem
            self.state.keyframe_ids.append(frame_id)
            self.state.kf_descriptors.append(desc)
            self.state.slots = [0, 1]
            pm, _ = eng._render(eng.params, x[None], pos[None], mem)
            return {"is_keyframe": True, "pointmaps_raw": np.asarray(pm[0, 0])}

        # Normal path: render against frozen memory.
        pm, feats = eng._render(eng.params, x[None], pos[None],
                                self.state.mem)
        self.state.frame_count += 1
        self._since_kf += 1

        sims = jnp.stack([jnp.dot(desc, d)
                          for d in self.state.kf_descriptors])
        novel = float(sims.max()) < self.sim_threshold
        make_kf = novel or self._since_kf >= self.max_interval
        if make_kf:
            st = self.state
            if len(st.keyframe_ids) >= self.max_keyframes:
                # Evict the oldest unprotected keyframe; reuse its slot
                # (ring over fixed capacity — bounded memory online).
                victim = self.protected
                slot = st.slots.pop(victim)
                st.keyframe_ids.pop(victim)
                st.kf_descriptors.pop(victim)
                import panst3r_tpu.models.memory as memlib

                mem = memlib.evict(st.mem, slot * eng.n_tokens,
                                   eng.n_tokens)
                mem = mem._replace(
                    count=jnp.asarray(slot * eng.n_tokens, jnp.int32))
            else:
                slot = len(st.keyframe_ids)
                mem = st.mem
            mem, _ = eng._update(eng.params, x[None], mem, pos[None])
            # Restore count to full occupancy (inserts are slot-addressed).
            occupied = max(len(st.slots) + 1, slot + 1)
            st.mem = mem._replace(
                count=jnp.asarray(occupied * eng.n_tokens, jnp.int32))
            st.keyframe_ids.append(frame_id)
            st.kf_descriptors.append(desc)
            st.slots.append(slot)
            self._since_kf = 0

        return {"is_keyframe": bool(make_kf),
                "pointmaps_raw": np.asarray(pm[0, 0])}
