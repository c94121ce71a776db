"""Scalar oracle for OpenCV's fixed-point u8 BGR→LAB (RGB2Lab_b).

A deliberately naive per-pixel transcription of the published integer
algorithm: sRGB gamma LUT scaled ×8, 12-bit XYZ/white coefficients,
3072-entry f(t) table in 15-bit fixed point, CV_DESCALE rounding. Golden
reference for roadvision_tpu.ops.color.bgr_to_lab_u8_fixed.
"""
import numpy as np

LAB_SHIFT = 12
GAMMA_SHIFT = 3
LAB_SHIFT2 = LAB_SHIFT + GAMMA_SHIFT
TAB_N = (255 * 3 // 2 + 1) * (1 << GAMMA_SHIFT)

XYZ_FROM_RGB = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
])
WHITE = np.array([0.950456, 1.0, 1.088754])


def _descale(v, n):
    return (int(v) + (1 << (n - 1))) >> n


def _tables():
    gamma = np.empty(256, np.int64)
    for i in range(256):
        t = i / 255.0
        lin = t / 12.92 if t <= 0.04045 else ((t + 0.055) / 1.055) ** 2.4
        gamma[i] = int(np.rint(lin * 255.0 * (1 << GAMMA_SHIFT)))
    ftab = np.empty(TAB_N, np.int64)
    for i in range(TAB_N):
        x = i / (255.0 * (1 << GAMMA_SHIFT))
        f = x * 7.787 + 16.0 / 116.0 if x < 0.008856 else np.cbrt(x)
        ftab[i] = int(np.rint(f * (1 << LAB_SHIFT2)))
    coeffs = np.rint(
        XYZ_FROM_RGB / WHITE[:, None] * (1 << LAB_SHIFT)).astype(np.int64)
    return gamma, ftab, coeffs


_GAMMA, _FTAB, _COEFFS = _tables()
_LSCALE = (116 * 255 + 50) // 100
_LSHIFT = -((16 * 255 * (1 << LAB_SHIFT2) + 50) // 100)


def bgr_to_lab_u8(bgr: np.ndarray) -> np.ndarray:
    assert bgr.ndim == 3 and bgr.dtype == np.uint8
    out = np.empty_like(bgr)
    for yy in range(bgr.shape[0]):
        for xx in range(bgr.shape[1]):
            bb, gg, rr = (int(v) for v in bgr[yy, xx])
            r8, g8, b8 = _GAMMA[rr], _GAMMA[gg], _GAMMA[bb]
            f = []
            for row in range(3):
                s = (r8 * _COEFFS[row, 0] + g8 * _COEFFS[row, 1]
                     + b8 * _COEFFS[row, 2])
                idx = min(max(_descale(s, LAB_SHIFT), 0), TAB_N - 1)
                f.append(int(_FTAB[idx]))
            fx, fy, fz = f
            l_ = _descale(_LSCALE * fy + _LSHIFT, LAB_SHIFT2)
            a_ = _descale(500 * (fx - fy) + (128 << LAB_SHIFT2), LAB_SHIFT2)
            b_ = _descale(200 * (fy - fz) + (128 << LAB_SHIFT2), LAB_SHIFT2)
            out[yy, xx] = (np.clip(l_, 0, 255), np.clip(a_, 0, 255),
                           np.clip(b_, 0, 255))
    return out
