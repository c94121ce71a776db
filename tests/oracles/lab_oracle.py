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
    # OpenCV freezes this table via its softfloat cbrt; float64 cbrt
    # rounds the other way at these 38 entries (see ops/color.py
    # _LAB_CBRT_SOFTFLOAT_DELTAS; validated exhaustively vs cv2 5.0)
    from roadvision_tpu.ops.color import _LAB_CBRT_SOFTFLOAT_DELTAS
    for i, d in _LAB_CBRT_SOFTFLOAT_DELTAS.items():
        ftab[i] += d
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


# ---------------------------------------------------------------------------
# Inverse: OpenCV's integer u8 Lab→BGR (Lab2RGBinteger). Scalar per-pixel
# transcription of the published pipeline: L→(y, ify) table in 2^14 fixed
# point, integer a/b de-scalings (5·53687>>13 ≈ BASE/500, 41943>>9 ≈
# BASE/200), f→t inverse table (linear toe below 6/29, C-truncated integer
# cube above), 12-bit XYZ→linear-sRGB matrix, CV_DESCALE(·,14), 4096-entry
# inverse-gamma table. Golden reference for
# roadvision_tpu.ops.color.lab_to_bgr_u8_fixed; every rounding choice is
# verified bit-for-bit against cv2 over all 2^24 inputs where OpenCV is
# installed (tests/test_cv2_crosscheck.py).
# ---------------------------------------------------------------------------
INV_BASE = 1 << 14
INV_MINAB = -8145

RGB_FROM_XYZ = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311],
])


def _inv_tables():
    li = np.arange(256) * 100.0 / 255.0
    toe = li <= 0.008856 * 903.3
    fy = (li + 16.0) / 116.0
    y_tab = np.where(toe, np.rint(INV_BASE * li / 903.3),
                     np.rint(INV_BASE * fy ** 3)).astype(np.int64)
    ify_tab = np.where(
        toe, np.rint(INV_BASE * (7.787 * li / 903.3 + 16.0 / 116.0)),
        np.rint(INV_BASE * fy)).astype(np.int64)

    def ctrunc(a, d):
        return -((-a) // d) if a < 0 else a // d

    ab = np.empty(INV_BASE * 9 // 4 - INV_MINAB, np.int64)
    for i in range(INV_MINAB, INV_BASE * 9 // 4):
        if i <= 3390:
            v = ctrunc(i * 108, 841) - 290
        else:
            v = ctrunc(ctrunc(i * i, INV_BASE) * i, INV_BASE)
        ab[i - INV_MINAB] = v
    coeffs = np.rint(RGB_FROM_XYZ * WHITE[None, :] * (1 << 12)).astype(np.int64)
    t = np.arange(4096) / 4096.0
    g = np.where(t <= 0.0031308, t * 12.92, 1.055 * t ** (1 / 2.4) - 0.055)
    gamma = np.rint(g * 255.0).astype(np.int64)
    return y_tab, ify_tab, ab, coeffs, gamma


_IY, _IIFY, _IAB, _ICOEFFS, _IGAMMA = _inv_tables()


def lab_to_bgr_u8(lab: np.ndarray) -> np.ndarray:
    assert lab.ndim == 3 and lab.dtype == np.uint8
    out = np.empty_like(lab)
    for yy in range(lab.shape[0]):
        for xx in range(lab.shape[1]):
            ll, aa, bb = (int(v) for v in lab[yy, xx])
            y = int(_IY[ll])
            ify = int(_IIFY[ll])
            adiv = ((5 * aa * 53687 + (1 << 7)) >> 13) - 128 * INV_BASE // 500
            bdiv = ((bb * 41943 + (1 << 4)) >> 9) - 128 * INV_BASE // 200 + 1
            x = int(_IAB[ify + adiv - INV_MINAB])
            z = int(_IAB[ify - bdiv - INV_MINAB])
            rgb = []
            for row in range(3):
                v = (int(_ICOEFFS[row, 0]) * x + int(_ICOEFFS[row, 1]) * y
                     + int(_ICOEFFS[row, 2]) * z + (1 << 13)) >> 14
                rgb.append(int(_IGAMMA[min(max(v, 0), 4095)]))
            r_, g_, b_ = rgb
            out[yy, xx] = (min(max(b_, 0), 255), min(max(g_, 0), 255),
                           min(max(r_, 0), 255))
    return out
