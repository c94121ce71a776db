"""Tracker backend quality ladder — the measured answer to "which
tracker should a deployment use?".

The reference ships exactly one tracker (src/track/sort_tracker.py) with
known quality quirks preserved here for parity (immediate IDs, unused
min_hits — SURVEY.md §2.2); the framework ships six backends but until
round 5 only SORT had scene-level quality evidence (WEATHER.json clean
row: 24 ID switches, IDF1 0.613 on a 6-vehicle scene). This tool runs
the SAME rendered ground-truth scene + real demo detector through every
backend — the identical fused engine path main_preview.py drives — and
scores MOTA/IDF1/HOTA/ID-switches per backend, on the clean scene and
under heavy fog (preprocess chain on), into one JSON artifact
(TRACKERS.json).

Speed is NOT measured here (CPU timings would misstate the chip);
tools/benchmark_trackers.py measures backend step rates on synthetic
detection streams — BASELINE.md carries both tables side by side.

Usage:
  python tools/eval_trackers.py [--out TRACKERS.json] [--frames 96]
      [--backends sort,bytetrack,ocsort,deepsort,botsort,strongsort]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Dict

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.eval_weather import (PRE_CHAIN, build_scene, fog_level,  # noqa: E402
                                run_mode, score)


def make_cfg(weights: str, res: int, backend: str, conf: float,
             batch: int, pre_on: bool, min_hits: int = 3) -> Dict:
    """Engine config — eval_weather's deployment with the tracker
    backend swapped (and the appearance embedder for the re-id
    backends when the shipped checkpoint exists)."""
    from roadvision_tpu.config import DEFAULTS, merge
    reid = Path(__file__).resolve().parent.parent / "assets" \
        / "reid_synthetic.npz"
    tracking = {"enabled": True, "backend": backend,
                "max_staleness": 1.2, "min_hits": min_hits,
                "iou_threshold": 0.35, "speed_window": 0.8}
    if backend in ("deepsort", "botsort", "strongsort") and reid.exists():
        tracking["reid_weights"] = str(reid)
    return merge(DEFAULTS, {
        "preprocess": ({"enabled": True, "chain": PRE_CHAIN}
                       if pre_on else {"enabled": False}),
        "detect": {"enabled": True, "backend": "ultralytics",
                   "model": weights, "imgsz": res, "conf_thres": conf,
                   "iou_thres": 0.7, "max_det": 20, "classes_keep": [2]},
        "tracking": tracking,
        "geometry": {"enabled": False},
        "tpu": {"batch_size": batch, "track_slots": 32},
    })


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--vehicles", type=int, default=6)
    ap.add_argument("--weights",
                    default=str(Path(__file__).resolve().parent.parent
                                / "assets" / "yolov8n_synthetic_256.npz"))
    ap.add_argument("--backends",
                    default="sort,bytetrack,ocsort,deepsort,botsort,"
                            "strongsort")
    ap.add_argument("--scenes", default="clean,heavy_fog",
                    help="clean | heavy_fog (fog + chain on) comma list")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--device", default="cpu", choices=["cpu", "auto"])
    args = ap.parse_args(argv)
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    frames, gt = build_scene(args.frames, args.res, args.vehicles,
                             args.seed)
    scenes = {}
    for name in [s.strip() for s in args.scenes.split(",") if s.strip()]:
        if name == "clean":
            scenes[name] = (frames, False)
        elif name == "heavy_fog":
            scenes[name] = (fog_level(frames, "heavy", args.seed), True)
        else:
            raise SystemExit(f"unknown scene {name!r}")

    report: Dict = {"meta": {
        "frames": args.frames, "res": args.res, "vehicles": args.vehicles,
        "weights": args.weights, "conf_thres": args.conf,
        "seed": args.seed,
        "note": "same engine path as WEATHER.json; speed per backend is "
                "measured separately by tools/benchmark_trackers.py "
                "(device step rates)"},
        "scenes": {}}
    for sname, (simg, pre_on) in scenes.items():
        rows = {}
        for backend in [b.strip() for b in args.backends.split(",")
                        if b.strip()]:
            t0 = time.time()
            dets = run_mode(make_cfg(args.weights, args.res, backend,
                                     args.conf, args.batch, pre_on), simg)
            rows[backend] = score(dets, gt)
            print(f"[eval_trackers] {sname:<10s} {backend:<11s} "
                  f"MOTA={rows[backend]['mota']:.3f} "
                  f"IDF1={rows[backend]['idf1']:.3f} "
                  f"HOTA={rows[backend]['hota']:.3f} "
                  f"IDsw={rows[backend]['id_switches']} "
                  f"mAP50={rows[backend]['map50']:.3f} "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr)
        report["scenes"][sname] = rows

    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text + "\n")
        print(f"[eval_trackers] wrote {args.out}", file=sys.stderr)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
