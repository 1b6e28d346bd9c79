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


def se3_adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """Ad(T) (..., 6, 6) in [rho, phi] tangent ordering:
    [[R, hat(t)·R], [0, R]]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, hat(t) @ R], -1)
    bot = jnp.concatenate([z, R], -1)
    return jnp.concatenate([top, bot], -2)


def se3_ad(xi: jnp.ndarray) -> jnp.ndarray:
    """ad(xi) (..., 6, 6): [[hat(phi), hat(rho)], [0, hat(phi)]]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    hp, hr = hat(phi), hat(rho)
    z = jnp.zeros_like(hp)
    top = jnp.concatenate([hp, hr], -1)
    bot = jnp.concatenate([z, hp], -1)
    return jnp.concatenate([top, bot], -2)


def jl_inv(r: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SE(3), first-order: I − ½·ad(r) (exact to
    O(|r|²); residuals shrink every GN iteration so higher orders don't
    change the fixed point)."""
    eye = jnp.broadcast_to(jnp.eye(6), (*r.shape[:-1], 6, 6))
    return eye - 0.5 * se3_ad(r)


@functools.partial(jax.jit, static_argnames=("iters",))
def pose_graph_gauss_newton(poses: jnp.ndarray, edges: jnp.ndarray,
                            rel_meas: jnp.ndarray,
                            weights: Optional[jnp.ndarray] = None,
                            iters: int = 10, damping: float = 1e-6):
    """On-manifold GN over SE(3) poses with relative-pose edges — true
    6×6-block normal equations with per-edge adjoint Jacobians.

    poses: (V, 4, 4) initial cam2world; edges: (E, 2) int (i, j);
    rel_meas: (E, 4, 4) measured T_j⁻¹·T_i; weights: (E,).
    Pose 0 is the gauge anchor (held fixed).  Returns refined (V, 4, 4).

    Residual r_e = log(A·T_i), A = (T_j·Z)⁻¹, under LEFT perturbations
    T ← exp(ξ)·T:  J_i = Jl⁻¹(r)·Ad(A), J_j = −J_i (from
    A·exp(ε) = exp(Ad(A)ε)·A and BCH to first order).  Per-edge blocks
    JᵀWJ scatter-add into the (V,6,V,6) Hessian — a sum-reduction that
    becomes a `psum` when edges shard across devices (distributed BA,
    SURVEY.md §5.8).
    """
    V = poses.shape[0]
    E = edges.shape[0]
    if weights is None:
        weights = jnp.ones((E,))

    def body(poses, _):
        i, j = edges[:, 0], edges[:, 1]
        A = se3_inv(poses[j] @ rel_meas)        # (E, 4, 4)
        r = se3_log(A @ poses[i])               # (E, 6)

        J = jl_inv(r) @ se3_adjoint(A)          # (E, 6, 6) — J_i; J_j = −J
        Jt = jnp.swapaxes(J, -1, -2)
        w = weights[:, None, None]
        JtJ = (Jt @ J) * w                      # (E, 6, 6)
        Jtr = (Jt @ r[..., None])[..., 0] * weights[:, None]   # (E, 6)

        H = jnp.zeros((V, V, 6, 6))
        H = H.at[i, i].add(JtJ).at[j, j].add(JtJ)
        H = H.at[i, j].add(-JtJ).at[j, i].add(-JtJ)
        g = jnp.zeros((V, 6))
        g = g.at[i].add(Jtr).at[j].add(-Jtr)

        # Gauge fix: pin node 0 (identity block row/col).
        H = H.at[0].set(0.0).at[:, 0].set(0.0)
        H = H.at[0, 0].set(jnp.eye(6))
        g = g.at[0].set(0.0)

        Hf = H.transpose(0, 2, 1, 3).reshape(6 * V, 6 * V)
        Hf = Hf + damping * jnp.eye(6 * V)
        delta = -jnp.linalg.solve(Hf, g.reshape(-1)).reshape(V, 6)
        return se3_exp(delta) @ poses, jnp.sum(weights * jnp.sum(r * r, -1))

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
            return {"is_keyframe": True,
                    "pointmaps_raw": self._init_memory_pair(x, pos,
                                                            frame_id)}

        # Normal path: render against frozen memory.
        pm, feats = eng._render(eng.params, x[None], pos[None],
                                self.state.mem)
        make_kf = self._maybe_insert(x, pos, desc, frame_id,
                                     float(self._sims_max(desc)))
        return {"is_keyframe": bool(make_kf),
                "pointmaps_raw": np.asarray(pm[0, 0])}

    def _sims_max(self, desc):
        """Max cosine similarity vs the current keyframe descriptors —
        DEVICE scalar (the stream path fetches it asynchronously)."""
        return jnp.stack([jnp.dot(desc, d)
                          for d in self.state.kf_descriptors]).max()

    def _maybe_insert(self, x, pos, desc, frame_id, sims_max: float) -> bool:
        """Keyframe policy + memory injection (shared by process/stream)."""
        eng = self.engine
        self.state.frame_count += 1
        self._since_kf += 1
        novel = sims_max < self.sim_threshold
        make_kf = novel or self._since_kf >= self.max_interval
        if make_kf:
            import panst3r_tpu.models.memory as memlib

            st = self.state
            if len(st.keyframe_ids) >= self.max_keyframes:
                # Evict the oldest unprotected keyframe; reuse its slot
                # (ring over fixed capacity — bounded memory online).
                victim = self.protected
                slot = st.slots.pop(victim)
                st.keyframe_ids.pop(victim)
                st.kf_descriptors.pop(victim)
                mem = memlib.begin_overwrite(st.mem, slot * eng.n_tokens,
                                             eng.n_tokens)
            else:
                slot = len(st.keyframe_ids)
                mem = st.mem
            mem, _ = eng._update(eng.params, x[None], mem, pos[None])
            occupied = max(len(st.slots) + 1, slot + 1)
            st.mem = memlib.end_overwrite(mem, occupied * eng.n_tokens)
            st.keyframe_ids.append(frame_id)
            st.kf_descriptors.append(desc)
            st.slots.append(slot)
            self._since_kf = 0
        return bool(make_kf)

    def stream(self, frames, start_id: int = 0, fetch_dtype=None):
        """Pipelined online processing — yields one dict per frame, in
        order, with the device→host pointmap fetch of frame t overlapped
        with frame t+1's encoder/render programs (the serve_latency_device
        overlap applied to the SLAM seam; reference per-frame O(1) decode,
        /root/reference/src/panst3r/panst3r.py:254-277).

        Semantics are IDENTICAL to calling :meth:`process` per frame: the
        keyframe decision for frame t resolves after t's programs launch
        but before frame t+1's render, so t+1 sees exactly the memory the
        synchronous path would produce (test_slam.py::test_stream_matches_
        process).  ``fetch_dtype`` (e.g. jnp.float16) casts pointmaps on
        device before the wire fetch — half the per-frame download bytes
        on slow host links.
        """
        eng = self.engine
        pending = None          # (frame_id, x, pos, desc, sims_dev, pm_dev)

        def finish(p):
            fid, x, pos, desc, sims_dev, pm_dev = p
            make_kf = self._maybe_insert(x, pos, desc, fid,
                                         float(sims_dev))
            return {"frame_id": fid, "is_keyframe": make_kf,
                    "pointmaps_raw": np.asarray(pm_dev)}

        for i, image in enumerate(frames):
            fid = start_id + i
            x, pos = eng._encode_all(np.asarray(image)[None])
            desc = self._descriptor(x[0].astype(jnp.float32))

            if self.state is None:           # bootstrap frame 0
                self._pending = (x, pos, image)
                self.state = FrontendState(mem=None, keyframe_ids=[fid],
                                           kf_descriptors=[desc])
                yield {"frame_id": fid, "is_keyframe": True,
                       "pointmaps_raw": None}
                continue
            if self.state.mem is None:       # bootstrap frame 1
                out = self._init_memory_pair(x, pos, fid)
                yield {"frame_id": fid, "is_keyframe": True,
                       "pointmaps_raw": out}
                continue

            # Resolve the previous frame's keyframe decision BEFORE this
            # frame's render (the sims fetch overlaps this frame's encode,
            # already launched above).
            if pending is not None:
                prev = finish(pending)
            else:
                prev = None
            pm, _ = eng._render(eng.params, x[None], pos[None],
                                self.state.mem)
            pm_dev = pm[0, 0]
            if fetch_dtype is not None:
                pm_dev = pm_dev.astype(fetch_dtype)
            try:  # start the D2H early; overlaps the next frame's compute
                pm_dev.copy_to_host_async()
            except Exception:
                pass
            pending = (fid, x, pos, desc, self._sims_max(desc), pm_dev)
            if prev is not None:
                yield prev
        if pending is not None:
            yield finish(pending)

    def _init_memory_pair(self, x, pos, frame_id):
        """Second bootstrap frame: initialize memory from the stored first
        frame + this one (shared by process/stream)."""
        eng = self.engine
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
        self.state.kf_descriptors.append(
            self._descriptor(x[0].astype(jnp.float32)))
        self.state.slots = [0, 1]
        pm, _ = eng._render(eng.params, x[None], pos[None], mem)
        return np.asarray(pm[0, 0])
