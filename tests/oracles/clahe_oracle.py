"""Independent scalar numpy oracle for OpenCV-style CLAHE.

A direct, loop-based transcription of the published CLAHE algorithm
(histogram clip + even redistribution + residual spread, inclusive-CDF LUT,
bilinear tile interpolation with half-tile offset), used as the golden
reference for roadvision_tpu.ops.clahe. Kept deliberately naive/readable.
"""
import numpy as np


def tile_luts(plane: np.ndarray, clip_limit: float = 2.0, grid=(8, 8)) -> np.ndarray:
    """Per-tile LUTs only (the integer, bit-exact stage)."""
    gy, gx = grid
    h, w = plane.shape
    pad_h = (gy - h % gy) % gy
    pad_w = (gx - w % gx) % gx
    ext = np.pad(plane, ((0, pad_h), (0, pad_w)), mode="reflect")
    he, we = ext.shape
    th, tw = he // gy, we // gx
    area = th * tw
    clip = max(int(clip_limit * area / 256.0), 1) if clip_limit > 0 else 0
    luts = np.zeros((gy, gx, 256), np.int32)
    for ty in range(gy):
        for tx in range(gx):
            tile = ext[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            hist = np.bincount(tile.reshape(-1), minlength=256).astype(np.int64)
            if clip > 0:
                excess = int(np.sum(np.maximum(hist - clip, 0)))
                hist = np.minimum(hist, clip)
                hist += excess // 256
                residual = excess % 256
                if residual:
                    step = max(256 // residual, 1)
                    i = 0
                    while i < 256 and residual > 0:
                        hist[i] += 1
                        i += step
                        residual -= 1
            cdf = np.cumsum(hist)
            lut = np.rint(cdf.astype(np.float32) * np.float32(255.0 / area))
            luts[ty, tx] = np.clip(lut, 0, 255).astype(np.int32)
    return luts


def clahe(plane: np.ndarray, clip_limit: float = 2.0, grid=(8, 8)) -> np.ndarray:
    assert plane.ndim == 2 and plane.dtype == np.uint8
    gy, gx = grid
    h, w = plane.shape
    pad_h = (gy - h % gy) % gy
    pad_w = (gx - w % gx) % gx
    ext = np.pad(plane, ((0, pad_h), (0, pad_w)), mode="reflect")
    he, we = ext.shape
    th, tw = he // gy, we // gx
    area = th * tw

    clip = max(int(clip_limit * area / 256.0), 1) if clip_limit > 0 else 0

    luts = np.zeros((gy, gx, 256), np.int32)
    for ty in range(gy):
        for tx in range(gx):
            tile = ext[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            hist = np.bincount(tile.reshape(-1), minlength=256).astype(np.int64)
            if clip > 0:
                excess = int(np.sum(np.maximum(hist - clip, 0)))
                hist = np.minimum(hist, clip)
                hist += excess // 256
                residual = excess % 256
                if residual:
                    step = max(256 // residual, 1)
                    i = 0
                    while i < 256 and residual > 0:
                        hist[i] += 1
                        i += step
                        residual -= 1
            cdf = np.cumsum(hist)
            lut = np.rint(cdf.astype(np.float32) * np.float32(255.0 / area))  # f32 scale + rint, like OpenCV
            luts[ty, tx] = np.clip(lut, 0, 255).astype(np.int32)

    # Interpolation in float32, matching OpenCV's internal precision.
    f32 = np.float32
    out = np.zeros_like(plane)
    inv_th = f32(1.0) / f32(th)
    inv_tw = f32(1.0) / f32(tw)
    for y in range(h):
        fy = f32(y) * inv_th - f32(0.5)
        y1 = int(np.floor(fy))
        ya = f32(fy - f32(y1))
        y1c = max(y1, 0)
        y2c = min(y1 + 1, gy - 1)
        for x in range(w):
            fx = f32(x) * inv_tw - f32(0.5)
            x1 = int(np.floor(fx))
            xa = f32(fx - f32(x1))
            x1c = max(x1, 0)
            x2c = min(x1 + 1, gx - 1)
            v = plane[y, x]
            top = f32(luts[y1c, x1c, v]) * (f32(1) - xa) + f32(luts[y1c, x2c, v]) * xa
            bot = f32(luts[y2c, x1c, v]) * (f32(1) - xa) + f32(luts[y2c, x2c, v]) * xa
            res = top * (f32(1) - ya) + bot * ya
            out[y, x] = np.clip(np.rint(res), 0, 255)
    return out
