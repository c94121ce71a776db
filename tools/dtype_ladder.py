"""Dtype ladder: fps AND accuracy for detect.compute_dtype settings.

BASELINE's perf tables quote bf16; the int8 path existed without an
accuracy row, so the `detect.compute_dtype` knob had no evidence behind
it (VERDICT r3 #7). This tool measures, per dtype
(float32 / bfloat16 / int8 / int8-static):

  * detection quality on the synthetic-GT scene with the shipped demo
    checkpoint — mAP@0.5, recall, matched-confidence mean (the same
    scoring as tools/eval_weather.py);
  * optionally (--fps) the device-resident pipeline fps at the demo
    scene via bench.device_resident_fps — run that part on the real
    chip; the accuracy part is deterministic anywhere.

Output: one JSON table (--out DTYPES.json).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

LADDER = ("float32", "bfloat16", "int8", "int8-static")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--vehicles", type=int, default=6)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--weights",
                    default=str(ROOT / "assets" / "yolov8n_synthetic_256.npz"))
    ap.add_argument("--dtypes", default=",".join(LADDER))
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calib-frames", type=int, default=16)
    ap.add_argument("--fps", action="store_true",
                    help="also measure device-resident fps per dtype "
                         "(run on the real chip; slow on CPU)")
    ap.add_argument("--fps-iters", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--device", default="cpu", choices=["cpu", "auto"])
    args = ap.parse_args(argv)
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tools.eval_weather import build_scene, score

    frames, gt = build_scene(args.frames, args.res, args.vehicles, seed=0)
    report = {"meta": {"frames": args.frames, "res": args.res,
                       "vehicles": args.vehicles, "weights": args.weights,
                       "conf_thres": args.conf,
                       "calib_frames": args.calib_frames}}
    rows = {}
    for dt in [s.strip() for s in args.dtypes.split(",") if s.strip()]:
        t0 = time.time()
        from roadvision_tpu.config import DEFAULTS, merge
        from roadvision_tpu.runtime import PipelineEngine
        cfg = merge(DEFAULTS, {
            "preprocess": {"enabled": False},
            "detect": {"enabled": True, "model": args.weights,
                       "imgsz": args.res, "conf_thres": args.conf,
                       "iou_thres": 0.7, "max_det": 20,
                       "classes_keep": [2],
                       "compute_dtype": "int8" if dt == "int8-static"
                                        else dt},
            "tracking": {"enabled": True},
            "tpu": {"batch_size": args.batch, "track_slots": 32},
        })
        engine = PipelineEngine(cfg)
        if dt == "int8-static":
            engine.detector.calibrate_int8(frames[:args.calib_frames])
        # accuracy through the same fused engine step as deployment
        b = engine.batch_size
        dets = []
        for i in range(0, frames.shape[0], b):
            chunk = frames[i:i + b]
            if chunk.shape[0] < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - chunk.shape[0], 0)])
            ts = (i + np.arange(b, dtype=np.float64)) / 30.0
            res = engine.process_batch(chunk, ts, want_proc=False)
            dets.extend(r.detections
                        for r in res[:min(b, frames.shape[0] - i)])
        row = score(dets, gt)
        if args.fps:
            import bench
            fps, _, flops, _bytes = bench.device_resident_fps(
                engine, args.res, args.res, args.batch, args.fps_iters,
                num_vehicles=args.vehicles)
            row["fps"] = round(fps, 2)
            row["gflops_frame"] = round(flops / 1e9, 3)
        rows[dt] = row
        print(f"[dtype_ladder] {dt:<12s} mAP50={row['map50']:.4f} "
              f"R={row['recall50']:.4f} conf={row['conf_matched_mean']:.4f}"
              + (f" fps={row['fps']}" if args.fps else "")
              + f"  ({time.time() - t0:.1f}s)", file=sys.stderr)
    report["dtypes"] = rows
    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text + "\n")
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
