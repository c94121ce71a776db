"""Evaluate detection mAP on a YOLO-format directory or COCO json.

Usage:
  python tools/eval_map.py --data yolo_dir|instances.json [--weights W] \
      [--iou-thres 0.5,0.75]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from roadvision_tpu.detect import build_detector  # noqa: E402
from roadvision_tpu.detect.dataset import load_dataset  # noqa: E402
from roadvision_tpu.detect.eval import evaluate_detector  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--weights", default="yolov8n.pt")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou-thres", default="0.5")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)

    det = build_detector({"backend": "ultralytics", "model": args.weights,
                          "conf_thres": args.conf, "iou_thres": 0.7,
                          "max_det": 300, "imgsz": args.imgsz,
                          "classes_keep": []})
    images, gt_boxes, gt_cls, gt_mask = load_dataset(
        args.data, imgsz=args.imgsz, limit=args.limit)

    thresholds = [float(t) for t in args.iou_thres.split(",")]
    result = evaluate_detector(det, images, gt_boxes, gt_cls, gt_mask,
                               thresholds)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
