"""Realtime preview driver (reference: main_preview.py).

Wires capture → preprocess → detect → track → geometry → overlay → compare
canvas → optional recording, with the reference's config gates and soft-fail
semantics, but batched through the TPU engine (one device round-trip per
batch). The preview window requires OpenCV; without it, use --record or
--max-frames for headless runs (q/Esc quit only applies to the cv2 window).

Usage:
  python main_preview.py [--config configs/default.yaml] [--max-frames N]
                         [--record out.avi] [--no-show]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402

from roadvision_tpu.config import load_config  # noqa: E402
from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from roadvision_tpu.io_video import FPSMeter, VideoSource, make_writer  # noqa: E402
from roadvision_tpu.runtime import PipelineEngine  # noqa: E402
from roadvision_tpu.utils import get_logger  # noqa: E402
from roadvision_tpu.vis import draw_overlays, make_canvas, tile_streams  # noqa: E402

log = get_logger("roadvision.preview")

try:
    import cv2  # type: ignore
    _HAS_CV2 = True
except Exception:
    cv2 = None
    _HAS_CV2 = False

# config sections safe to apply live (host-side overlay/preview knobs).
# Everything baked into compiled graphs (camera geometry, preprocess
# chain, detector thresholds/model, tracker constants, tpu.*) needs a
# restart and is reported instead of silently ignored.
_HOT_SECTIONS = ("vis", "preview")


class ConfigWatcher:
    """Polling hot-reload of the YAML (reference README's future Module 8).

    ``poll()`` re-reads the file when its mtime changes and returns the
    fresh config dict, logging which hot sections changed and warning
    about changed cold sections that require a restart.
    """

    def __init__(self, path, cfg):
        self.path = Path(path) if path else None
        self.cfg = cfg
        self.mtime = self._mtime()

    def _mtime(self):
        try:
            return self.path.stat().st_mtime if self.path else None
        except OSError:
            return None

    def poll(self):
        m = self._mtime()
        if m is None or m == self.mtime:
            return None
        self.mtime = m
        try:
            fresh = load_config(str(self.path))
        except Exception as exc:
            log.warning("config reload failed (%s); keeping old", exc)
            return None
        hot = [k for k in _HOT_SECTIONS if fresh.get(k) != self.cfg.get(k)]
        cold = [k for k in fresh
                if k not in _HOT_SECTIONS and fresh.get(k) != self.cfg.get(k)]
        if hot:
            log.info("hot-reloaded config sections: %s", ", ".join(hot))
        if cold:
            log.warning("config sections %s changed but need a restart "
                        "(compiled into the device step)", ", ".join(cold))
        self.cfg = fresh
        return fresh if hot else None


def run_multi(args, cfg) -> int:
    """Sharded multi-camera preview: ``tpu.mesh.enable`` + ``camera.sources``
    (VERDICT r2 next-step #2 — the mesh knob now reaches the driver). Each
    stream runs the full fused step on its mesh shard; the preview tiles
    the per-stream overlays into one grid canvas."""
    from roadvision_tpu.runtime import MultiStreamEngine, build_sources

    cam_cfg = cfg.get("camera", {})
    preview_cfg = cfg.get("preview", {}) or {}
    record_cfg = preview_cfg.get("record", {}) or {}
    draw_cfg = (cfg.get("vis", {}) or {}).get("draw", {}) or {}

    sources = build_sources(cam_cfg, max_frames=args.max_frames)
    engine = MultiStreamEngine(cfg, num_streams=len(sources))
    log.info("multi-stream mode: %d sources over mesh %s",
             len(sources), dict(engine.mesh.shape))
    fpsm = FPSMeter(alpha=0.1)
    ana_cfg = cfg.get("analytics", {}) or {}
    analytics = None
    if ana_cfg.get("enabled"):
        from roadvision_tpu.analytics import Analytics
        analytics = [Analytics(ana_cfg) for _ in sources]  # per stream

    writer = None
    gated = False
    min_det = int(record_cfg.get("min_detections", 1))
    if bool(record_cfg.get("enable", False)) or args.record:
        path = args.record or record_cfg.get("path", "out_compare.avi")
        writer = make_writer(path, fps=record_cfg.get("fps", 30),
                             quality=int(record_cfg.get("quality", 85)))
        gated = bool(record_cfg.get("events_only", False))
        if gated:
            from roadvision_tpu.io_video import EventGatedWriter
            writer = EventGatedWriter(
                writer, pre_roll=int(record_cfg.get("pre_roll", 30)),
                post_roll=int(record_cfg.get("post_roll", 60)))
        log.info("recording to %s%s", path,
                 " (event-gated)" if gated else "")
    show = _HAS_CV2 and not args.no_show

    trails = None
    if int(draw_cfg.get("trails", 0)) > 0:
        from roadvision_tpu.vis import TrailRenderer
        trails = [TrailRenderer(length=int(draw_cfg["trails"]))
                  for _ in sources]

    n_frames = 0
    labels = [f"CAM{i}" for i in range(len(sources))]
    try:
        for batch in engine.stream(sources, max_frames=args.max_frames):
            b = len(batch[0])
            for i in range(b):
                tiles = []
                trig = False
                for s, stream_results in enumerate(batch):
                    res = stream_results[i]
                    frame = np.ascontiguousarray(res.proc)
                    if not frame.flags.writeable:
                        frame = frame.copy()
                    if trails is not None:
                        trails[s].update(res.detections, res.ts)
                        trails[s].draw(
                            frame,
                            thickness=int(draw_cfg.get("thickness", 2)))
                    if draw_cfg.get("det", True) and res.detections:
                        draw_overlays(
                            frame, res.detections,
                            lb_meta=engine.engine.lb_meta(*frame.shape[:2]),
                            thickness=int(draw_cfg.get("thickness", 2)),
                            font_scale=float(draw_cfg.get("font_scale",
                                                          0.6)),
                            mask_alpha=float(draw_cfg.get("mask_alpha",
                                                          0.45)))
                    if len(res.detections) >= min_det:
                        trig = True
                    if analytics is not None:
                        if analytics[s].update(res.detections, res.ts):
                            trig = True
                        analytics[s].overlay(frame)
                    tiles.append(frame)
                fps = fpsm.tick(batch[0][i].ts)
                canvas = tile_streams(
                    tiles, labels,
                    fps=fps if preview_cfg.get("show_fps", True) else None)
                if writer:
                    if gated:
                        writer.write_gated(canvas, trig)
                    else:
                        writer.write(canvas)
                if show:
                    cv2.imshow("Multi-Stream Preview", canvas)
                    if (cv2.waitKey(1) & 0xFF) in (27, ord("q")):
                        raise KeyboardInterrupt
                n_frames += 1
    except KeyboardInterrupt:
        pass
    finally:
        if writer:
            writer.release()
        for src in sources:
            src.release()
        if show:
            cv2.destroyAllWindows()
        log.info("processed %d frames x %d streams; stage times: %s",
                 n_frames, len(sources), engine.timer.summary())
        if engine.fleet_gate:
            log.info("fleet temporal gate: %d frame-slots coasted "
                     "(detector skipped fleet-wide while ALL streams "
                     "were static)", engine.gate_frames_coasted)
        if gated and writer is not None:
            log.info("event-gated recording: %s", writer.summary())
        if analytics is not None:
            import json as _json
            log.info("analytics: %s", _json.dumps(
                [a.summary() for a in analytics]))
            for a in analytics:
                a.close()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--record", default=None,
                    help="override preview.record.path and enable recording")
    ap.add_argument("--no-show", action="store_true")
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler device trace to this dir")
    ap.add_argument("--state", default=None, metavar="PATH",
                    help="tracking-state checkpoint: loaded at start if "
                         "the file exists, saved on exit — lets a "
                         "long-running stream resume identities exactly")
    ap.add_argument("--watch-config", action="store_true",
                    help="hot-reload vis/preview sections when the config "
                         "file changes (other sections need a restart)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    tpu_cfg = cfg.get("tpu", {}) or {}
    mesh_cfg = tpu_cfg.get("mesh", {}) or {}
    if bool(mesh_cfg.get("enable", False)) \
            and len(cfg.get("camera", {}).get("sources") or []) > 1:
        return run_multi(args, cfg)
    cam_cfg = cfg.get("camera", {})
    preview_cfg = cfg.get("preview", {})
    compare_cfg = preview_cfg.get("compare", {}) or {}
    record_cfg = preview_cfg.get("record", {}) or {}
    vis_cfg = cfg.get("vis", {}) or {}
    draw_cfg = vis_cfg.get("draw", {}) or {}

    vs = VideoSource(
        source=cam_cfg.get("source", 0),
        width=cam_cfg.get("width", 1280),
        height=cam_cfg.get("height", 720),
        fps_request=cam_cfg.get("fps_request", 30),
        backend=cam_cfg.get("backend", "auto"),
        num_frames=args.max_frames,
    )
    fpsm = FPSMeter(alpha=0.1)
    engine = PipelineEngine(cfg)
    if args.state and Path(args.state).exists():
        engine.load_state(args.state)
        log.info("resumed tracking state from %s", args.state)

    writer = None
    gated = False
    min_det = int(record_cfg.get("min_detections", 1))
    want_record = bool(record_cfg.get("enable", False)) or args.record
    if want_record:
        path = args.record or record_cfg.get("path", "out_compare.avi")
        writer = make_writer(path, fps=record_cfg.get("fps", 30),
                             quality=int(record_cfg.get("quality", 85)))
        gated = bool(record_cfg.get("events_only", False))
        if gated:
            from roadvision_tpu.io_video import EventGatedWriter
            writer = EventGatedWriter(
                writer, pre_roll=int(record_cfg.get("pre_roll", 30)),
                post_roll=int(record_cfg.get("post_roll", 60)))
            log.info("recording to %s (event-gated: pre %s / post %s "
                     "frames)", path, record_cfg.get("pre_roll", 30),
                     record_cfg.get("post_roll", 60))
        else:
            log.info("recording to %s", path)

    want_compare = bool(compare_cfg.get("enable", True))
    layout = compare_cfg.get("layout", "h")
    divider_px = int(compare_cfg.get("divider_px", 4))
    show = _HAS_CV2 and not args.no_show

    profile_ctx = None
    if args.profile:
        from roadvision_tpu.utils.profiler import trace
        profile_ctx = trace(args.profile)
        profile_ctx.__enter__()
        log.info("profiling to %s", args.profile)

    watcher = ConfigWatcher(args.config, cfg) if args.watch_config else None

    ana_cfg = cfg.get("analytics", {}) or {}
    analytics = None
    if ana_cfg.get("enabled"):
        from roadvision_tpu.analytics import Analytics
        analytics = Analytics(ana_cfg)

    n_frames = 0
    tail_s = 0.0
    t_first = None
    trails = None
    import time as _time
    try:
        for res in engine.stream(vs, max_frames=args.max_frames):
            if t_first is None:
                t_first = _time.perf_counter()  # end-to-end clock starts
                # after the first result (compile/warmup excluded)
            if watcher is not None and n_frames % engine.batch_size == 0:
                fresh = watcher.poll()
                if fresh is not None:
                    preview_cfg = fresh.get("preview", {}) or {}
                    compare_cfg = preview_cfg.get("compare", {}) or {}
                    draw_cfg = (fresh.get("vis", {}) or {}).get("draw",
                                                                {}) or {}
                    want_compare = bool(compare_cfg.get("enable", True))
                    layout = compare_cfg.get("layout", "h")
                    divider_px = int(compare_cfg.get("divider_px", 4))
            t_tail = _time.perf_counter()
            proc = np.ascontiguousarray(res.proc)
            if not proc.flags.writeable:   # jax-backed view (no-preprocess
                proc = proc.copy()         # path) → copy before overlays
            tr_n = int(draw_cfg.get("trails", 0))
            if tr_n > 0:
                if trails is None or trails.length != max(2, tr_n):
                    from roadvision_tpu.vis import TrailRenderer
                    trails = TrailRenderer(length=tr_n)
                trails.update(res.detections, res.ts)
                trails.draw(proc,
                            thickness=int(draw_cfg.get("thickness", 2)))
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
                    res.raw, proc, layout=layout, divider_px=divider_px,
                    label_raw=compare_cfg.get("label_raw", "RAW"),
                    label_proc=compare_cfg.get("label_proc", "PROC"),
                    fps=fps, show_fps=bool(preview_cfg.get("show_fps", True)))
            else:
                canvas = proc

            if writer:
                if gated:
                    trig = (len(res.detections) >= min_det
                            or bool(ana_events))
                    writer.write_gated(canvas, trig)
                else:
                    writer.write(canvas)
            tail_s += _time.perf_counter() - t_tail
            if show:
                cv2.imshow("Compare Preview" if want_compare else "Preview",
                           canvas)
                key = cv2.waitKey(1) & 0xFF
                if key in (27, ord("q")):
                    break
            n_frames += 1
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
        if args.state:
            engine.save_state(args.state)
            log.info("saved tracking state to %s", args.state)
        if writer:
            writer.release()
        vs.release()
        if show:
            cv2.destroyAllWindows()
        log.info("processed %d frames; stage times: %s",
                 n_frames, engine.timer.summary())
        if engine._gate_cfg is not None:
            log.info("temporal gate: %d/%d frames coasted (detector "
                     "forward skipped)", engine.gate_frames_coasted,
                     n_frames)
        if gated and writer is not None:
            log.info("event-gated recording: %s", writer.summary())
        if analytics is not None:
            import json as _json
            log.info("analytics: %s", _json.dumps(analytics.summary()))
            analytics.close()
        if n_frames > 1 and t_first is not None:
            wall = _time.perf_counter() - t_first
            log.info("sustained %.2f fps end-to-end (%d frames after "
                     "warmup); overlay%s tail %.2f ms/frame",
                     (n_frames - 1) / wall, n_frames - 1,
                     "+record" if writer else "",
                     tail_s / max(1, n_frames) * 1e3)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
