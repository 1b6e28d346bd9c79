"""Headless serving daemon: POST scenes, get panoptic results.

Production-serving front for the one-program wire path
(`InferenceEngine.serve_device`): a stdlib HTTP server that keeps the
engine warm and turns each request into exactly one upload, one launch
and one fetch on the chip.  The reference's only serving surface is the
gradio demo (gradio_panst3r.py); this is the deployable equivalent.

Protocol (all binary npz — no JSON image encoding overhead):

  POST /reconstruct   body: npz{images (V,H,W,3) uint8 [, portrait (V,)]}
                      query: ?cameras=1&keyframes=retrieval&fusion=mask
  → 200, npz{pan (V,H,W) int32, conf (V,H,W) f32, seg_ids, labels,
             selected [, focals, cam2world, keyframes]}

  GET /healthz        → 200 "ok" once the engine is warm.

Streaming SLAM session (engine/slam.py IncrementalFrontend over HTTP —
O(1) per-frame decode against the growing keyframe memory):

  POST /slam/start    query: ?sim_threshold=0.9&max_interval=5
  POST /slam/frame    body: npz{image (H,W,3) uint8}
                      → npz{is_keyframe [, pts3d, pts3d_local, conf] f16}
  POST /slam/finish   → npz{poses (N,4,4), poses_init, frame_ids,
                        keyframe_ids} (pose-graph GN refinement; frame 0
                        is re-rendered against the final memory like the
                        CLI, apps/slam.py:40-46) and ends the session.

Run:  python -m panst3r_tpu.apps.serve --preset tiny --port 8030
      (real deployments: --preset v1 --checkpoint <orbax dir>)
"""
from __future__ import annotations

import argparse
import functools
import http.server
import io
import threading

import numpy as np


class SceneServer:
    """Engine wrapper: one serve call per request, thread-serialized
    (the device is a serial resource; concurrent requests queue)."""

    def __init__(self, engine, cls_emb: np.ndarray):
        self.engine = engine
        self.cls_emb = np.asarray(cls_emb)
        self.lock = threading.Lock()

    def reconstruct(self, images: np.ndarray, portrait: np.ndarray,
                    with_cameras: bool = False,
                    keyframe_mode: str = "linspace",
                    fusion_res: str = "full") -> dict:
        V = images.shape[0]
        K = min(self.engine.num_keyframes, V)
        with self.lock:
            wire = np.asarray(self.engine.serve_device(
                images, portrait, self.cls_emb, with_cameras=with_cameras,
                keyframe_mode=keyframe_mode, fusion_res=fusion_res))
        return self.engine.unpack_wire(
            wire, V, with_cameras=with_cameras,
            with_keyframes=K if keyframe_mode == "retrieval" else 0)

    # ------------------------------------------------- streaming SLAM ----

    def slam_start(self, sim_threshold: float = 0.9, max_interval: int = 5):
        from panst3r_tpu.engine.slam import IncrementalFrontend

        with self.lock:
            self._slam = IncrementalFrontend(
                self.engine, sim_threshold=sim_threshold,
                max_interval=max_interval)
            self._slam_maps = {}                  # frame id -> pointmaps
            self._slam_kf = []
            self._slam_n = 0
            self._slam_frame0 = None

    def slam_frame(self, image: np.ndarray) -> dict:
        from panst3r_tpu.models.decoder import postprocess

        with self.lock:
            if getattr(self, "_slam", None) is None:
                raise ValueError("no SLAM session (POST /slam/start first)")
            fid = self._slam_n
            self._slam_n += 1
            out = self._slam.process(image, fid)
            res = {"is_keyframe": np.asarray(out["is_keyframe"])}
            if out["is_keyframe"]:
                self._slam_kf.append(fid)
            if out["pointmaps_raw"] is not None:
                post = postprocess(np.asarray(out["pointmaps_raw"],
                                              np.float32))
                post = {k: np.asarray(v) for k, v in post.items()}
                self._slam_maps[fid] = post
                for k, v in post.items():
                    res[k] = v.astype(np.float16)
            else:
                # bootstrap frame: rendered at /slam/finish against the
                # final memory (same as the CLI, apps/slam.py:40-46)
                self._slam_frame0 = np.asarray(image)
            return res

    def slam_finish(self) -> dict:
        from panst3r_tpu.engine.slam import refine_scene_poses
        from panst3r_tpu.models.decoder import postprocess

        with self.lock:
            if getattr(self, "_slam", None) is None:
                raise ValueError("no SLAM session")
            try:
                eng = self.engine
                if (self._slam_frame0 is not None
                        and self._slam.state is not None
                        and self._slam.state.mem is not None):
                    x, pos = eng._encode_all(self._slam_frame0[None])
                    pm, _ = eng._render(eng.params, x[None], pos[None],
                                        self._slam.state.mem)
                    post = postprocess(np.asarray(pm[0, 0], np.float32))
                    self._slam_maps[0] = {k: np.asarray(v)
                                          for k, v in post.items()}
                if not self._slam_maps:
                    raise ValueError(
                        "SLAM session has no decodable frames yet "
                        "(need >= 2 frames)")
                order = sorted(self._slam_maps)
                maps = {k: np.stack([self._slam_maps[i][k] for i in order])
                        for k in self._slam_maps[order[0]]}
                refined, init, _ = refine_scene_poses(maps)
                return {"poses": np.asarray(refined),
                        "poses_init": np.asarray(init),
                        "frame_ids": np.asarray(order, np.int32),
                        "keyframe_ids": np.asarray(self._slam_kf,
                                                   np.int32)}
            finally:
                self._slam = None


class _Handler(http.server.BaseHTTPRequestHandler):
    server_version = "panst3r_tpu-serve/1.0"

    def __init__(self, *args, scene_server: SceneServer, **kw):
        self.scene_server = scene_server
        super().__init__(*args, **kw)

    def log_message(self, *a):
        pass

    def _send(self, code: int, body: bytes,
              ctype: str = "application/octet-stream"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/healthz"):
            self._send(200, b"ok", "text/plain")
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):
        try:
            from urllib.parse import parse_qs, urlparse

            path = urlparse(self.path).path
            q = parse_qs(urlparse(self.path).query)
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if path == "/reconstruct":
                data = np.load(io.BytesIO(body))
                images = data["images"]
                portrait = (data["portrait"] if "portrait" in data
                            else np.zeros(images.shape[0], bool))
                out = self.scene_server.reconstruct(
                    images, portrait,
                    with_cameras=q.get("cameras", ["0"])[0] == "1",
                    keyframe_mode=q.get("keyframes", ["linspace"])[0],
                    fusion_res=q.get("fusion", ["full"])[0])
            elif path == "/slam/start":
                self.scene_server.slam_start(
                    sim_threshold=float(
                        q.get("sim_threshold", ["0.9"])[0]),
                    max_interval=int(q.get("max_interval", ["5"])[0]))
                self._send(200, b"ok", "text/plain")
                return
            elif path == "/slam/frame":
                data = np.load(io.BytesIO(body))
                out = self.scene_server.slam_frame(data["image"])
            elif path == "/slam/finish":
                out = self.scene_server.slam_finish()
            else:
                self._send(404, b"not found", "text/plain")
                return
            buf = io.BytesIO()
            np.savez_compressed(buf, **{k: v for k, v in out.items()
                                        if v is not None})
            self._send(200, buf.getvalue())
        except Exception as e:  # client gets the reason, server stays up
            self._send(400, f"error: {e}".encode(), "text/plain")


def make_server(scene_server: SceneServer, host: str, port: int):
    handler = functools.partial(_Handler, scene_server=scene_server)
    return http.server.ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    from panst3r_tpu.apps.common import build_engine
    from panst3r_tpu.core.bucketing import Bucket

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="v1",
                    choices=["v1", "v2", "tiny"])
    ap.add_argument("--checkpoint", default=None, help="orbax dir")
    ap.add_argument("--bucket", default="512x384",
                    help="WxH serving resolution bucket")
    ap.add_argument("--num-keyframes", type=int, default=4)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8030)
    ap.add_argument("--warm", type=int, default=0, metavar="V",
                    help="compile the V-view serve program before "
                         "accepting traffic (readiness probes on /healthz "
                         "then mean 'first request is fast')")
    args = ap.parse_args(argv)

    W, H = (int(x) for x in args.bucket.split("x"))
    engine, _, cls_emb = build_engine(
        args.preset, Bucket(H, W), checkpoint=args.checkpoint,
        num_keyframes=args.num_keyframes)
    if args.warm:
        import numpy as _np

        print(f"warming the {args.warm}-view serve program…")
        np.asarray(engine.serve_device(
            _np.zeros((args.warm, H, W, 3), _np.uint8),
            _np.zeros(args.warm, bool), cls_emb))
    srv = make_server(SceneServer(engine, cls_emb), args.host, args.port)
    print(f"serving at http://{args.host}:{args.port}/reconstruct")
    srv.serve_forever()


if __name__ == "__main__":
    main()
