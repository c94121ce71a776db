"""Detection dataset loading (YOLO-txt format + synthetic road scenes).

YOLO layout: ``images/*.jpg|png`` with ``labels/<stem>.txt`` lines of
``<cls> <cx> <cy> <w> <h>`` (normalized). Images are letterboxed to the
model size; boxes are converted to pixel xyxy in letterbox space and padded
to fixed capacity (static shapes for the jitted train step).

``synthetic_batches`` yields procedurally generated road scenes with exact
ground truth (vehicle class = COCO "car"), so the training loop is testable
and demoable with zero assets.
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..io_video.capture import SyntheticRoadSource

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def _letterbox_np(img: np.ndarray, size: int):
    """Host-side letterbox (training data prep): returns image, r, (dw, dh)."""
    from PIL import Image
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    resized = np.asarray(Image.fromarray(img).resize((nw, nh),
                                                     Image.BILINEAR))
    out = np.full((size, size, 3), 114, np.uint8)
    top = (size - nh) // 2
    left = (size - nw) // 2
    out[top:top + nh, left:left + nw] = resized
    return out, r, (left, top)


def load_yolo_dir(root: str, imgsz: int = 640, max_boxes: int = 50,
                  limit: Optional[int] = None):
    """Load a YOLO-format dir → (images (N,S,S,3) u8 RGB, boxes (N,M,4),
    cls (N,M), mask (N,M))."""
    from PIL import Image
    root = Path(root)
    img_dir = root / "images" if (root / "images").is_dir() else root
    lbl_dir = root / "labels"
    files = sorted(p for p in img_dir.rglob("*")
                   if p.suffix.lower() in IMG_EXTS)
    if limit:
        files = files[:limit]
    images, boxes_all, cls_all, mask_all = [], [], [], []
    for p in files:
        img = np.asarray(Image.open(p).convert("RGB"))
        h, w = img.shape[:2]
        lb, r, (dw, dh) = _letterbox_np(img, imgsz)
        images.append(lb)
        boxes = np.zeros((max_boxes, 4), np.float32)
        cls = np.zeros((max_boxes,), np.int32)
        mask = np.zeros((max_boxes,), bool)
        lbl = (lbl_dir / (p.stem + ".txt")) if lbl_dir.is_dir() \
            else p.with_suffix(".txt")
        if lbl.exists():
            lines = [ln for ln in lbl.read_text().splitlines() if ln.strip()]
            if len(lines) > max_boxes:
                print(f"[roadvision] {p.name}: {len(lines)} labels truncated "
                      f"to max_boxes={max_boxes} — raise max_boxes for "
                      f"correct eval/training on crowded scenes")
            for i, line in enumerate(lines):
                if i >= max_boxes:
                    break
                parts = line.split()
                c = int(float(parts[0]))
                cx, cy, bw, bh = (float(v) for v in parts[1:5])
                x1 = (cx - bw / 2) * w * r + dw
                y1 = (cy - bh / 2) * h * r + dh
                x2 = (cx + bw / 2) * w * r + dw
                y2 = (cy + bh / 2) * h * r + dh
                boxes[i] = (x1, y1, x2, y2)
                cls[i] = c
                mask[i] = True
        boxes_all.append(boxes)
        cls_all.append(cls)
        mask_all.append(mask)
    if not images:
        raise FileNotFoundError(f"no images under {root}")
    return (np.stack(images), np.stack(boxes_all), np.stack(cls_all),
            np.stack(mask_all))


def synthetic_batches(batch: int, imgsz: int = 320, max_boxes: int = 12,
                      num_vehicles: int = 5, seed: int = 0,
                      car_class: int = 2) -> Iterator[Tuple[np.ndarray, ...]]:
    """Endless generator of (images RGB f-ready u8, boxes, cls, mask)."""
    src = SyntheticRoadSource(imgsz, imgsz, num_vehicles=num_vehicles,
                              seed=seed)
    idx = 0
    while True:
        imgs, boxes_b, cls_b, mask_b = [], [], [], []
        for _ in range(batch):
            img = src.render(idx)[..., ::-1]  # BGR → RGB
            gts = src.gt_boxes(idx)
            boxes = np.zeros((max_boxes, 4), np.float32)
            cls = np.zeros((max_boxes,), np.int32)
            mask = np.zeros((max_boxes,), bool)
            for i, (x1, y1, x2, y2, _v) in enumerate(gts[:max_boxes]):
                boxes[i] = (x1, y1, x2, y2)
                cls[i] = car_class
                mask[i] = True
            imgs.append(img)
            boxes_b.append(boxes)
            cls_b.append(cls)
            mask_b.append(mask)
            idx += 1
        yield (np.stack(imgs), np.stack(boxes_b), np.stack(cls_b),
               np.stack(mask_b))
