"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): end-to-end 1080p pipeline
(preprocess CLAHE+median → YOLOv8n → SORT → geometry) frames/sec/chip.
``vs_baseline`` is the ratio against the 500 fps/chip target (the reference
publishes no numbers of its own — BASELINE.json ``published: {}``).

Secondary numbers (stderr): per-stage breakdown and p50 per-frame latency.

Env knobs: RVT_BENCH_BATCH (default 8), RVT_BENCH_ITERS (default 8 batches),
RVT_BENCH_RES (default 1080), RVT_BENCH_METRIC (e2e|detect|preprocess|sort).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roadvision_tpu.config import DEFAULTS, merge  # noqa: E402
from roadvision_tpu.io_video.capture import SyntheticRoadSource  # noqa: E402
from roadvision_tpu.runtime import PipelineEngine  # noqa: E402

NORTH_STAR_FPS = 500.0


def _cfg(height: int, width: int, batch: int):
    return merge(DEFAULTS, {
        "preprocess": {"enabled": True, "chain": [
            {"name": "CLAHEDehaze",
             "params": {"space": "YCrCb", "clip_limit": 2.0, "tile_grid": 8}},
            {"name": "MedianDerain", "params": {"ksize": 3}},
        ]},
        "detect": {"enabled": True, "model": "yolov8n.pt",
                   "conf_thres": 0.25, "iou_thres": 0.7, "max_det": 100,
                   "classes_keep": [0, 2, 3, 5, 7],
                   "compute_dtype": "bfloat16"},
        "tracking": {"enabled": True, "max_staleness": 1.2, "min_hits": 3,
                     "iou_threshold": 0.35, "speed_window": 0.8},
        "geometry": {"enabled": True, "projector": {
            "type": "homography",
            "image_points": [[0, height], [width, height],
                             [0, int(0.4 * height)], [width, int(0.4 * height)]],
            "world_points": [[0, 0], [20, 0], [0, 120], [20, 120]],
            "origin": [10.0, 0.0], "max_distance": 1000.0}},
        "tpu": {"batch_size": batch, "track_slots": 64},
    })


def main() -> int:
    res = int(os.environ.get("RVT_BENCH_RES", "1080"))
    height, width = res, {1080: 1920, 720: 1280, 480: 640}.get(res, res * 16 // 9)
    batch = int(os.environ.get("RVT_BENCH_BATCH", "8"))
    iters = int(os.environ.get("RVT_BENCH_ITERS", "8"))

    engine = PipelineEngine(_cfg(height, width, batch))
    src = SyntheticRoadSource(width, height, num_vehicles=6)

    # pre-render frames so decode cost is out of the measurement loop
    frames = np.stack([src.render(i) for i in range(batch)])
    base_ts = np.arange(batch, dtype=np.float64) / 30.0

    # warmup/compile
    engine.process_batch(frames, 1.0 + base_ts)

    n_frames = 0
    t0 = time.perf_counter()
    for it in range(iters):
        ts = 1.0 + (it + 1) * batch / 30.0 + base_ts
        results = engine.process_batch(frames, ts)
        n_frames += len(results)
    elapsed = time.perf_counter() - t0

    fps = n_frames / elapsed
    p50_ms = elapsed / n_frames * 1e3

    print(json.dumps({
        "metric": f"e2e_{res}p_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
    }))
    print(f"[bench] {n_frames} frames in {elapsed:.2f}s | "
          f"per-frame {p50_ms:.2f} ms | batch={batch} res={res}p | "
          f"stages: {engine.timer.summary()}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
