"""Ground-plane projection (reference: src/geometry/projector.py).

``HomographyProjector`` estimates H from ≥4 image↔world correspondences at
init time on the host — a normalized DLT least-squares solve replacing
``cv2.findHomography`` (projector.py:69; SURVEY.md §2.3 — init-time, not hot
path) — and applies it either per point (reference-parity scalar API with
the same w≈0 and non-finite guards, projector.py:74-84) or batched on
device (``project_boxes_device``: the form the SORT scan consumes, one
einsum over all boxes in a frame batch).

Behavior preserved:
  - bbox → bottom-center point convention (projector.py:30-35);
  - distance = ‖ground − origin‖ CLAMPED (not rejected) to max_distance
    (projector.py:37-47);
  - <4 points or mismatched shapes raise ValueError (projector.py:64-67);
  - unknown projector type raises ValueError (projector.py:92-95).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Point2D = Tuple[float, float]


def find_homography_dlt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares homography via normalized DLT (Hartley normalization).

    src, dst: (N, 2) float arrays, N >= 4. Returns (3, 3) float64 with
    H[2,2] == 1. Exact for N == 4; algebraic least squares for N > 4.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]

    def normalize(pts):
        mean = pts.mean(axis=0)
        centered = pts - mean
        scale_d = np.mean(np.linalg.norm(centered, axis=1))
        s = np.sqrt(2.0) / scale_d if scale_d > 1e-12 else 1.0
        T = np.array([[s, 0, -s * mean[0]],
                      [0, s, -s * mean[1]],
                      [0, 0, 1]], np.float64)
        return (centered * s), T

    sn, Ts = normalize(src)
    dn, Td = normalize(dst)

    A = np.zeros((2 * n, 9), np.float64)
    for i in range(n):
        x, y = sn[i]
        u, v = dn[i]
        A[2 * i] = [-x, -y, -1, 0, 0, 0, u * x, u * y, u]
        A[2 * i + 1] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]
    _, _, vt = np.linalg.svd(A)
    Hn = vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    if abs(H[2, 2]) < 1e-12:
        raise ValueError("degenerate homography (H[2,2] ~ 0)")
    return H / H[2, 2]


class GroundProjector(ABC):
    """Image → ground-plane mapping (reference: projector.py:13-51)."""

    def __init__(self, origin: Optional[Sequence[float]] = None,
                 max_distance: Optional[float] = None):
        if origin is None:
            origin = (0.0, 0.0)
        if len(origin) != 2:
            raise ValueError("origin must be a length-2 sequence")
        self.origin = np.asarray(origin, np.float32)
        self.max_distance = float(max_distance) if max_distance is not None else None

    @abstractmethod
    def project_point(self, x: float, y: float) -> Optional[Point2D]:
        ...

    def project_bbox(self, bbox: Sequence[float]) -> Optional[Point2D]:
        x1, y1, x2, y2 = bbox
        return self.project_point(0.5 * (float(x1) + float(x2)), float(y2))

    def distance(self, point: Optional[Sequence[float]]) -> Optional[float]:
        if point is None:
            return None
        dist = float(np.linalg.norm(np.asarray(point, np.float32) - self.origin))
        if not np.isfinite(dist):
            return None
        if self.max_distance is not None:
            dist = min(dist, self.max_distance)
        return dist

    def distance_for_bbox(self, bbox: Sequence[float]) -> Optional[float]:
        return self.distance(self.project_bbox(bbox))


class HomographyProjector(GroundProjector):
    def __init__(self, cfg: dict):
        super().__init__(origin=cfg.get("origin", (0.0, 0.0)),
                         max_distance=cfg.get("max_distance"))
        img_pts = np.asarray(cfg.get("image_points", []), np.float32)
        world_pts = np.asarray(cfg.get("world_points", []), np.float32)
        if img_pts.ndim != 2 or img_pts.shape[0] < 4 or img_pts.shape[1] != 2:
            raise ValueError("homography requires >= 4 image points (x, y)")
        if world_pts.shape != img_pts.shape:
            raise ValueError("image_points and world_points shapes must match")
        self._H = find_homography_dlt(img_pts, world_pts)
        self._H_dev = jnp.asarray(self._H, jnp.float32)
        self._origin_dev = jnp.asarray(self.origin, jnp.float32)
        self._maxd_dev = jnp.float32(
            self.max_distance if self.max_distance is not None else np.inf)

    @property
    def H(self) -> np.ndarray:
        return self._H

    def project_point(self, x: float, y: float) -> Optional[Point2D]:
        mapped = self._H @ np.array([float(x), float(y), 1.0], np.float64)
        w = float(mapped[2])
        if abs(w) < 1e-6:
            return None
        X, Y = mapped[0] / w, mapped[1] / w
        if not (np.isfinite(X) and np.isfinite(Y)):
            return None
        return float(X), float(Y)

    # ------------------------------------------------------------------
    # Device path (consumed by the SORT scan and the batched pipeline)
    # ------------------------------------------------------------------
    def device_params(self):
        """(H (3,3), origin (2,), max_distance scalar) as jnp float32."""
        return self._H_dev, self._origin_dev, self._maxd_dev


def project_points_device(H: jnp.ndarray, pts: jnp.ndarray):
    """Batched projective apply. pts (..., 2) → (ground (..., 2), valid).

    Guards match the scalar path: |w| < 1e-6 or non-finite → invalid
    (reference: projector.py:78-83).
    """
    # Elementwise 3x3 apply (full f32 — an einsum here would route through
    # the default matmul precision, which is bf16 on TPU).
    x, y = pts[..., 0], pts[..., 1]
    u = H[0, 0] * x + H[0, 1] * y + H[0, 2]
    v = H[1, 0] * x + H[1, 1] * y + H[1, 2]
    w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    mapped = jnp.stack([u, v, w], axis=-1)
    safe_w = jnp.where(jnp.abs(w) < 1e-6, 1.0, w)
    ground = mapped[..., :2] / safe_w[..., None]
    valid = (jnp.abs(w) >= 1e-6) & jnp.all(jnp.isfinite(ground), axis=-1)
    return jnp.where(valid[..., None], ground, 0.0), valid


def project_boxes_device(H: jnp.ndarray, boxes: jnp.ndarray):
    """Boxes (..., 4) xyxy → bottom-center ground points + validity."""
    cx = 0.5 * (boxes[..., 0] + boxes[..., 2])
    cy = boxes[..., 3]
    return project_points_device(H, jnp.stack([cx, cy], axis=-1))


def distance_device(ground: jnp.ndarray, valid: jnp.ndarray,
                    origin: jnp.ndarray, max_distance: jnp.ndarray):
    """‖ground − origin‖ clamped to max_distance; invalid → NaN."""
    d = jnp.linalg.norm(ground - origin, axis=-1)
    d = jnp.minimum(d, max_distance)
    return jnp.where(valid & jnp.isfinite(d), d, jnp.nan)


def build_projector(cfg: dict) -> GroundProjector:
    """Build from a geometry config section (reference: projector.py:87-95)."""
    proj_cfg = cfg.get("projector") if isinstance(cfg, dict) else None
    if proj_cfg is None:
        proj_cfg = cfg
    proj_type = (proj_cfg.get("type") or "homography").lower()
    if proj_type == "homography":
        return HomographyProjector(proj_cfg)
    raise ValueError(f"unknown projector type: {proj_type}")
