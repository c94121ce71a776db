"""Evaluate detection mAP on a YOLO-format labeled directory.

Usage:
  python tools/eval_map.py --data /path/to/yolo_dir [--weights W] \
      [--iou-thres 0.5,0.75]
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from roadvision_tpu.detect import build_detector  # noqa: E402
from roadvision_tpu.detect.dataset import load_yolo_dir  # noqa: E402
from roadvision_tpu.detect.eval import mean_ap  # noqa: E402


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
    images, gt_boxes, gt_cls, gt_mask = load_yolo_dir(
        args.data, imgsz=args.imgsz, limit=args.limit)

    # first pass: collect raw per-frame records, then build per-class lists
    # aligned over ALL frames (a class may first appear mid-dataset)
    records = []
    classes = set()
    for i in range(images.shape[0]):
        bgr = images[i][..., ::-1]
        batch = det.infer_batch(bgr[None])
        boxes = batch.boxes[0][batch.valid[0]]
        conf = batch.conf[0][batch.valid[0]]
        cls = batch.cls_id[0][batch.valid[0]]
        fg_boxes = gt_boxes[i][gt_mask[i]]
        fg_cls = gt_cls[i][gt_mask[i]]
        records.append((boxes, conf, cls, fg_boxes, fg_cls))
        classes.update(int(c) for c in np.unique(fg_cls))
        classes.update(int(c) for c in np.unique(cls))

    preds = {c: ([], []) for c in classes}
    gts = defaultdict(list)
    for boxes, conf, cls, fg_boxes, fg_cls in records:
        for c in classes:
            sel = cls == c
            preds[c][0].append(boxes[sel])
            preds[c][1].append(conf[sel])
            gts[c].append(fg_boxes[fg_cls == c])

    thresholds = [float(t) for t in args.iou_thres.split(",")]
    result = mean_ap({c: preds[c] for c in preds}, dict(gts), thresholds)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
