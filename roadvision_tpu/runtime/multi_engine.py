"""Config-driven multi-stream engine: camera fleets sharded over a mesh.

The reference runs one camera per process (src/io_video/capture.py:13,
main_preview.py:36-148 — single-threaded loop). The TPU-native scale-out
is stream parallelism (SURVEY.md §2.5): S independent camera streams run
the SAME fused per-batch step, vmapped over a leading stream axis and
sharded over the mesh's data axis, so 8 chips process 8× the cameras at
the single-chip rate with zero collectives in the hot path.

This module makes that reachable from the user-facing config surface
(VERDICT r2 next-step #2):

    camera:
      sources: [synthetic:road, traffic.mp4, rtsp://...]   # one per stream
    tpu:
      mesh: {enable: true, axis: data, devices: null}

``main_preview.py`` and ``tools/serve.py`` construct a
:class:`MultiStreamEngine` whenever ``tpu.mesh.enable`` is true and more
than one source is configured. Per-stream outputs are bit-identical to S
independent single-device runs (tests/test_multi_engine.py) because the
per-stream traced code IS the single-stream step
(parallel/inference.py:make_sharded_stream_step).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..detect.types import COCO_NAMES
from ..io_video.capture import VideoSource
from ..parallel import make_mesh, make_sharded_stream_step
from ..utils import get_logger
from .engine import FrameResult, PipelineEngine, unpack_detections

log = get_logger("roadvision.multi")


def build_sources(cam_cfg: Dict[str, Any],
                  max_frames: Optional[int] = None) -> List[VideoSource]:
    """``camera.sources`` entries → VideoSource list.

    Each entry is either a bare source spec (string/int, inheriting the
    camera block's width/height/fps/backend) or a dict overriding any of
    those keys for that stream.
    """
    entries = cam_cfg.get("sources") or []
    if not entries:
        entries = [cam_cfg.get("source", 0)]
    out = []
    for e in entries:
        over = dict(e) if isinstance(e, dict) else {"source": e}
        out.append(VideoSource(
            source=over.get("source", cam_cfg.get("source", 0)),
            width=over.get("width", cam_cfg.get("width", 1280)),
            height=over.get("height", cam_cfg.get("height", 720)),
            fps_request=over.get("fps_request",
                                 cam_cfg.get("fps_request", 30)),
            backend=over.get("backend", cam_cfg.get("backend", "auto")),
            num_frames=max_frames,
        ))
    return out


def mesh_from_config(tpu_cfg: Dict[str, Any]):
    """``tpu.mesh`` section → (Mesh, axis name)."""
    mesh_cfg = tpu_cfg.get("mesh") or {}
    n_dev = mesh_cfg.get("devices")
    mesh = make_mesh(int(n_dev) if n_dev else None, model_parallel=1)
    axis = str(mesh_cfg.get("axis", "data"))
    if axis not in mesh.axis_names:
        raise ValueError(
            f"tpu.mesh.axis={axis!r} is not a mesh axis "
            f"(available: {list(mesh.axis_names)})")
    return mesh, axis


class MultiStreamEngine:
    """S-camera fleet over one device mesh, driven by the same config
    schema as :class:`PipelineEngine` (which it wraps for construction,
    soft-fail semantics, and the traced per-stream step)."""

    def __init__(self, cfg: Dict[str, Any], num_streams: int):
        if num_streams < 1:
            raise ValueError("need at least one stream")
        self.engine = PipelineEngine(cfg)
        # detect.temporal_gate under tpu.mesh: GLOBAL fleet gating —
        # coast only when ALL streams are static (one lax.cond on the
        # fleet-max motion score, parallel/inference.py:
        # make_sharded_gated_stream_step). The branch predicate is a
        # global scalar, so lockstep shards stay lockstep.
        self.fleet_gate = self.engine._gate_cfg is not None
        self.gate_frames_coasted = 0
        self._gate_carry = None
        self.num_streams = num_streams
        tpu_cfg = cfg.get("tpu", {}) or {}
        self.mesh, self.axis = mesh_from_config(tpu_cfg)
        data_size = self.mesh.shape[self.axis]
        # the stream axis shards over the mesh, so it must be divisible by
        # the data axis: pad with throwaway streams (their frames are a
        # repeat of stream 0, their states evolve but are never unpacked)
        self.padded_streams = -(-num_streams // data_size) * data_size
        if self.padded_streams != num_streams:
            log.warning(
                "%d streams over a %d-way '%s' mesh axis: padding to %d "
                "shards — round the stream count to a multiple for full "
                "utilisation", num_streams, data_size, self.axis,
                self.padded_streams)
        self.batch_size = self.engine.batch_size
        self.timer = self.engine.timer
        self._built: Dict[Tuple[int, int, int], Any] = {}
        self.states = None
        self._gmc_prev = None   # (S, G, G) per-stream thumbnail carry
        self._t0: Optional[float] = None

    # ------------------------------------------------------------------
    def _step_for(self, shape: Tuple[int, int, int]):
        if shape not in self._built:
            if self.fleet_gate:
                from ..parallel.inference import \
                    make_sharded_gated_stream_step
                step, init_carry = make_sharded_gated_stream_step(
                    self.engine, shape, self.mesh, self.axis)
                self._built[shape] = (step, init_carry)
            else:
                step, init_states = make_sharded_stream_step(
                    self.engine, shape, self.mesh, self.axis)
                self._built[shape] = (step, init_states)
        return self._built[shape]

    def _names(self) -> List[str]:
        det = self.engine.detector
        if det is not None:
            return [det.names.get(i, str(i)) for i in range(det.nc)]
        return list(COCO_NAMES)

    # ------------------------------------------------------------------
    def process_batch(self, frames: np.ndarray,
                      timestamps: np.ndarray) -> List[List[FrameResult]]:
        """(S, B, H, W, 3) BGR uint8 + (S, B) stamps → per-stream result
        lists. Tracking state persists on device across calls, sharded
        over the mesh."""
        return self.collect_batch(self.dispatch_batch(frames, timestamps))

    def dispatch_batch(self, frames: np.ndarray, timestamps: np.ndarray):
        s, b, h, w = frames.shape[:4]
        if s != self.num_streams:
            raise ValueError(f"expected {self.num_streams} streams, "
                             f"got {s}")
        step, init_fn = self._step_for((b, h, w))
        if self.fleet_gate:
            if self._gate_carry is None:
                self._gate_carry = init_fn(self.padded_streams)
        elif self.states is None:
            self.states = init_fn(self.padded_streams)
        if self._t0 is None:
            self._t0 = float(np.min(timestamps))
        ts_rel = (timestamps - self._t0).astype(np.float32)
        if self.padded_streams != s:
            pad = self.padded_streams - s
            frames_in = np.concatenate(
                [frames, np.broadcast_to(frames[:1],
                                         (pad,) + frames.shape[1:])])
            ts_in = np.concatenate(
                [ts_rel, np.broadcast_to(ts_rel[:1], (pad, b))])
        else:
            frames_in, ts_in = frames, ts_rel
        params = self.engine.detector.params if self.engine.detector else {}
        if self.fleet_gate:
            outs, coast, self._gate_carry = step(
                params, self._gate_carry, jnp.asarray(frames_in),
                jnp.asarray(ts_in))
            return frames, timestamps, outs, coast
        if getattr(self.engine, "gmc_enabled", False):
            from ..track.gmc import GMC_SIZE
            prev = self._gmc_prev if self._gmc_prev is not None else \
                jnp.zeros((self.padded_streams, GMC_SIZE, GMC_SIZE),
                          jnp.float32)
            valid = jnp.float32(0.0 if self._gmc_prev is None else 1.0)
            outs, self.states, self._gmc_prev = step(
                params, self.states, jnp.asarray(frames_in),
                jnp.asarray(ts_in), prev, valid)
        else:
            outs, self.states = step(params, self.states,
                                     jnp.asarray(frames_in),
                                     jnp.asarray(ts_in))
        return frames, timestamps, outs

    def collect_batch(self, inflight) -> List[List[FrameResult]]:
        frames, timestamps, outs = inflight[:3]
        s, b = frames.shape[:2]
        with self.timer.stage("device_step"):
            arrays = [np.asarray(a) for a in outs]
        if len(inflight) > 3 and bool(np.asarray(inflight[3])):
            self.gate_frames_coasted += s * b  # fleet coasted this batch
        names = self._names()
        det = self.engine.detector
        kind = {"pose": "keypoints", "obb": "rboxes"}.get(
            det.task if det is not None else "detect", "masks")
        results: List[List[FrameResult]] = []
        with self.timer.stage("host_unpack"):
            for si in range(s):
                per_frame = unpack_detections(
                    [a[si] for a in arrays], names, b, extra_kind=kind)
                results.append([
                    FrameResult(frames[si, i], frames[si, i], per_frame[i],
                                float(timestamps[si, i]))
                    for i in range(b)])
        return results

    # ------------------------------------------------------------------
    def stream(self, sources: Sequence[VideoSource],
               max_frames: Optional[int] = None
               ) -> Iterator[List[List[FrameResult]]]:
        """Lockstep streaming over S sources with the same double-buffered
        overlap as the single-stream engine: decode of batch i+1 overlaps
        the device compute of batch i. Ends when ANY source ends (streams
        advance in lockstep so per-stream state stays aligned)."""
        if len(sources) != self.num_streams:
            raise ValueError(f"engine built for {self.num_streams} "
                             f"streams, got {len(sources)} sources")
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def reader():
            count = 0
            try:
                while not stop.is_set():
                    n = self.batch_size
                    if max_frames is not None:
                        n = min(n, max_frames - count)
                        if n <= 0:
                            break
                    with self.timer.stage("decode"):
                        batches = [src.read_batch(n) for src in sources]
                    m = min(mb for _, _, mb in batches)
                    if m == 0:
                        break
                    shapes = {f.shape[1:] for f, _, _ in batches}
                    if len(shapes) > 1:
                        raise ValueError(
                            f"streams must share one frame shape to ride "
                            f"the mesh in lockstep, got {sorted(shapes)} — "
                            f"drop per-stream width/height overrides")
                    frames = np.stack([f[:m] for f, _, _ in batches])
                    ts = np.stack([t[:m] for _, t, _ in batches])
                    q.put((frames, ts))
                    count += m
            except Exception as exc:  # decode failure ends the stream
                log.warning("frame source failed: %s", exc)
            finally:
                q.put(None)

        thread = threading.Thread(target=reader, daemon=True)
        thread.start()
        pending: list = []
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                frames, ts = item
                pending.append(self.dispatch_batch(frames, ts))
                if len(pending) >= 2:
                    yield self.collect_batch(pending.pop(0))
            for inflight in pending:
                yield self.collect_batch(inflight)
            pending = []
        finally:
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=2.0)

    def reset(self) -> None:
        self.states = None
        self._t0 = None
        self._gate_carry = None
        self.gate_frames_coasted = 0
