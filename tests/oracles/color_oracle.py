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
    x = bgr.astype(np.int64)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    return descale(r * 4899 + g * 9617 + b * 1868).astype(np.uint8)


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
