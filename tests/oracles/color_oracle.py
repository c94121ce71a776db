"""Independent numpy oracle for OpenCV's uint8 fixed-point color math.

Derived from the documented OpenCV BT.601 conversion (14-bit fixed point,
CV_DESCALE rounding). Written against the published algebra, not against any
library implementation, to cross-check roadvision_tpu.ops.color.
"""
import numpy as np

SHIFT = 14
HALF = 1 << (SHIFT - 1)


def descale(x):
    return (x + HALF) >> SHIFT


def bgr_to_gray(bgr):
    """OpenCV's bit-exact gray: 15-bit coefficients summing to 1<<15
    (9798+19235+3735 = 32768), round-half-up descale. Verified against
    cv2 5.0 over all 2^24 inputs (tests/test_cv2_crosscheck.py)."""
    x = bgr.astype(np.int64)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    return ((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15) \
        .astype(np.uint8)


def bgr_to_ycrcb(bgr):
    x = bgr.astype(np.int64)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = descale(r * 4899 + g * 9617 + b * 1868)
    cr = descale((r - y) * 11682 + (128 << SHIFT))
    cb = descale((b - y) * 9241 + (128 << SHIFT))
    out = np.stack([y, cr, cb], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def ycrcb_to_bgr(ycrcb):
    x = ycrcb.astype(np.int64)
    y, cr, cb = x[..., 0], x[..., 1], x[..., 2]
    r = y + descale((cr - 128) * 22987)
    g = y + descale((cr - 128) * -11698 + (cb - 128) * -5636)
    b = y + descale((cb - 128) * 29049)
    out = np.stack([b, g, r], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)
