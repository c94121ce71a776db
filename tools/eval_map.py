"""Evaluate mAP on real data, task-aware.

detect (default): YOLO-format dir or COCO instances JSON → box mAP.
segment: COCO instances JSON with polygon segmentations → mask mAP
  (prototype-resolution gt upsampled ×4 to the letterbox frame).
pose: COCO person-keypoints JSON → OKS keypoint mAP.
obb: YOLO-OBB dir (DOTA quad labels) → ProbIoU rotated-box mAP.

Usage:
  python tools/eval_map.py --data yolo_dir|instances.json [--weights W] \
      [--task detect|segment|pose|obb] [--iou-thres 0.5,0.75]
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
    ap.add_argument("--task", default="auto",
                    choices=["auto", "detect", "segment", "pose", "obb"])
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou-thres", default="0.5")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--tile", type=int, default=0,
                    help="tiled small-object inference: crop size "
                         "(0 = off; detect task only) — compare mAP "
                         "with/without tiling on the same data")
    ap.add_argument("--tile-overlap", type=float, default=0.25)
    ap.add_argument("--tta", action="store_true",
                    help="test-time augmentation — compare mAP with/"
                         "without on the same data (detect task only)")
    args = ap.parse_args(argv)

    task = args.task
    if task == "auto":
        name = str(args.weights).lower()
        task = "segment" if "-seg" in name else "pose" if "-pose" in name \
            else "obb" if "-obb" in name else "detect"

    det = build_detector({"backend": "ultralytics", "model": args.weights,
                          "task": task, "conf_thres": args.conf,
                          "iou_thres": 0.7, "max_det": 300,
                          "imgsz": args.imgsz, "classes_keep": [],
                          "tiling": {"enable": args.tile > 0,
                                     "tile": args.tile or 640,
                                     "overlap": args.tile_overlap},
                          "tta": args.tta})
    thresholds = [float(t) for t in args.iou_thres.split(",")]

    if task == "segment":
        from roadvision_tpu.detect.dataset import load_coco_seg_json
        from roadvision_tpu.detect.eval import evaluate_segmenter
        images, _boxes, gt_cls, gt_mask, seg = load_coco_seg_json(
            args.data, imgsz=args.imgsz, limit=args.limit)
        # prototype-res gt → letterbox frame pixels (×4 nearest — the
        # loader rasterized at S/4; images are already letterboxed so
        # the detector's own letterbox is identity)
        gt_masks = [np.repeat(np.repeat(seg[i][gt_mask[i]] > 0.5, 4, 1),
                              4, 2) for i in range(images.shape[0])]
        gt_cls_l = [gt_cls[i][gt_mask[i]] for i in range(images.shape[0])]
        result = evaluate_segmenter(det, images, gt_masks, gt_cls_l,
                                    thresholds)
    elif task == "pose":
        from roadvision_tpu.detect.dataset import load_coco_kpts_json
        from roadvision_tpu.detect.eval import evaluate_pose
        images, gt_boxes, _cls, gt_mask, kpts = load_coco_kpts_json(
            args.data, imgsz=args.imgsz, limit=args.limit)
        result = evaluate_pose(det, images, gt_boxes, kpts, gt_mask,
                               thresholds)
    elif task == "obb":
        from roadvision_tpu.detect.dataset import load_yolo_obb_dir
        from roadvision_tpu.detect.eval import evaluate_obb
        images, gt_rb, gt_cls, gt_mask = load_yolo_obb_dir(
            args.data, imgsz=args.imgsz, limit=args.limit)
        result = evaluate_obb(det, images, gt_rb, gt_cls, gt_mask,
                              thresholds)
    else:
        images, gt_boxes, gt_cls, gt_mask = load_dataset(
            args.data, imgsz=args.imgsz, limit=args.limit)
        result = evaluate_detector(det, images, gt_boxes, gt_cls, gt_mask,
                                   thresholds)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
