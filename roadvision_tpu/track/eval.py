"""Tracking-quality metrics: ID switches, fragmentation, MOTA-lite.

Parity tooling for the BASELINE gate ("track-ID parity with the CPU
reference"): greedy IoU matching of tracker output against ground-truth
object identities per frame, accumulating misses, false positives and
identity switches (the classic CLEAR-MOT accounting, simplified to a
single operating point). Host-side numpy.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _iou(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def evaluate_tracking(
    frames_gt: Sequence[Sequence[Tuple[float, float, float, float, int]]],
    frames_pred: Sequence[Sequence[Tuple[float, float, float, float, int]]],
    iou_thres: float = 0.5,
) -> Dict[str, float]:
    """frames_gt[f] = [(x1,y1,x2,y2,gt_id)], frames_pred likewise with
    track ids. Returns mota, id_switches, misses, false_positives,
    matches."""
    last_match: Dict[int, int] = {}  # gt_id -> track_id
    misses = fps = switches = matches = total_gt = 0
    for gts, preds in zip(frames_gt, frames_pred):
        total_gt += len(gts)
        taken = [False] * len(preds)
        for (gx1, gy1, gx2, gy2, gid) in gts:
            best, best_iou = -1, iou_thres
            for i, (px1, py1, px2, py2, tid) in enumerate(preds):
                if taken[i]:
                    continue
                v = _iou((gx1, gy1, gx2, gy2), (px1, py1, px2, py2))
                if v >= best_iou:
                    best, best_iou = i, v
            if best < 0:
                misses += 1
                continue
            taken[best] = True
            matches += 1
            tid = preds[best][4]
            if gid in last_match and last_match[gid] != tid:
                switches += 1
            last_match[gid] = tid
        fps += sum(1 for t in taken if not t)
    mota = 1.0 - (misses + fps + switches) / max(1, total_gt)
    return {"mota": mota, "id_switches": switches, "misses": misses,
            "false_positives": fps, "matches": matches,
            "total_gt": total_gt}
