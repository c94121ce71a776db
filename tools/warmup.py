"""Ahead-of-time compile warmer for deployment targets.

The reference stack is eager (torch/OpenCV — nothing to warm); under XLA
every (batch, H, W) shape of the fused pipeline step compiles on first
dispatch, which on a remote-compile attach stalls the first frames for
minutes. This tool drives one synthetic batch through every shape a
deployment will hit so the compiled executables land in the persistent
compilation cache (roadvision_tpu/utils/cache.py) — after a warm run,
process restarts start at full rate.

Warmed per resolution: the engine step with and without the processed-
frame return (``want_proc`` — the streaming driver uses True, the bench
and headless paths False).

Usage:
  python tools/warmup.py [--config configs/default.yaml]
                         [--res 1080[,720,...]] [--batch N]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from roadvision_tpu.config import load_config  # noqa: E402
from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from roadvision_tpu.runtime import PipelineEngine  # noqa: E402
from roadvision_tpu.utils import get_logger, res_width  # noqa: E402

log = get_logger("roadvision.warmup")


def warm_shape(engine: PipelineEngine, height: int, width: int,
               batch: int) -> None:
    frames = np.zeros((batch, height, width, 3), np.uint8)
    ts = np.arange(batch, dtype=np.float64) / 30.0
    for want_proc in (True, False):
        t0 = time.perf_counter()
        engine.reset()
        engine.process_batch(frames, ts, want_proc=want_proc)
        if engine._gate_cfg is not None and batch >= 2:
            # zero frames score as static, so a second batch exercises
            # (and therefore compiles) the coast step + motion probe —
            # otherwise the first real static stretch stalls mid-stream
            engine.process_batch(frames, ts + batch / 30.0,
                                 want_proc=want_proc)
            assert engine.gate_frames_coasted > 0
        log.info("warmed (%d, %d, %d) want_proc=%s in %.1fs",
                 batch, height, width, want_proc,
                 time.perf_counter() - t0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default=None,
                    help="YAML config (same file the deployment runs)")
    ap.add_argument("--res", default=None,
                    help="comma-separated heights to warm (e.g. 1080,720); "
                         "default: the configured camera resolution")
    ap.add_argument("--batch", type=int, default=None,
                    help="override tpu.batch_size")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    if args.batch:
        cfg.setdefault("tpu", {})["batch_size"] = int(args.batch)
    engine = PipelineEngine(cfg)

    if args.res:
        shapes = []
        for tok in str(args.res).split(","):
            h = int(tok)
            shapes.append((h, res_width(h)))
    else:
        cam = cfg.get("camera", {}) or {}
        h = int(cam.get("height", 480))
        shapes = [(h, int(cam.get("width", res_width(h))))]

    t0 = time.perf_counter()
    for h, w in shapes:
        warm_shape(engine, h, w, engine.batch_size)
    log.info("warmup complete: %d shape(s) in %.1fs",
             len(shapes), time.perf_counter() - t0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
