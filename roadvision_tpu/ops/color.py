"""Color-space transforms with OpenCV-compatible uint8 arithmetic.

TPU-native replacement for the reference's ``cv2.cvtColor`` call sites
(reference: src/preprocess/ops/clahe_dehaze.py:22-30,
src/preprocess/pipeline.py:26, src/augment/fog.py:183,218,223 — SURVEY.md
§2.3). The uint8 GRAY/YCrCb paths reproduce OpenCV's 14-bit fixed-point
rounding exactly (coefficients from the ITU-R BT.601 matrix, descale =
round-half-up via ``(x + 2^13) >> 14``), so PROC frames can be compared
bit-for-bit. The LAB path follows OpenCV's float formulation (sRGB gamma,
D65 white) — OpenCV's own u8 LAB path is LUT-quantized, so parity there is
±1 LSB, documented in tests.

All functions are jit-friendly, operate on channel-last arrays of any
leading batch shape, and keep data in int32 internally (uint8 in/out keeps
HBM traffic at 1 byte/px/channel).
"""
from __future__ import annotations

import jax.numpy as jnp

# BT.601 luma coefficients in 14-bit fixed point (descale shift = 14):
# round(0.299*16384)=4899, round(0.587*16384)=9617, round(0.114*16384)=1868.
# Used by the YCrCb conversions (bit-exact vs cv2, verified exhaustively).
_SHIFT = 14
_HALF = 1 << (_SHIFT - 1)
_R2Y, _G2Y, _B2Y = 4899, 9617, 1868
# GRAY uses OpenCV's newer bit-exact path (15-bit, coefficients summing
# to 1<<15 so neutral gray is a fixpoint): verified bit-for-bit against
# cv2 5.0 over ALL 2^24 BGR inputs (tests/test_cv2_crosscheck.py).
_GRAY_SHIFT = 15
_R2GRAY, _G2GRAY, _B2GRAY = 9798, 19235, 3735
# YCrCb chroma: round(0.713*16384)=11682, round(0.564*16384)=9241.
_CR_COEF, _CB_COEF = 11682, 9241
# Inverse: 1.403→22987, 0.714→11698, 0.344→5636, 1.773→29049.
_CR2R, _CR2G, _CB2G, _CB2B = 22987, -11698, -5636, 29049
_DELTA = 128 << _SHIFT


def _descale(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV CV_DESCALE: (x + 1<<(n-1)) >> n with arithmetic shift."""
    return jnp.right_shift(x + _HALF, _SHIFT)


def _sat_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def _clip255(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# Planar int32 paths — the fused-pipeline fast lane. Channel-last (..., 3)
# arrays put a 3-wide axis in the TPU lane dimension (3/128 utilization);
# the planar forms run each channel as a full-width (..., H, W) plane and
# keep everything in int32 between stages. Same fixed-point math, same
# saturation — bit-identical to the u8 functions below.
# ---------------------------------------------------------------------------

def gray_from_bgr_planes(b: jnp.ndarray, g: jnp.ndarray,
                         r: jnp.ndarray) -> jnp.ndarray:
    """Integer BGR planes → gray plane (BT.601 fixed point).

    Dtype-preserving: the 14-bit fixed-point products widen to int32
    internally (they exceed int16), and the u8-domain result narrows
    back to the input dtype — int16 planes are the fused pipeline's
    traffic-lean contract."""
    dt = b.dtype
    b32, g32, r32 = (p.astype(jnp.int32) for p in (b, g, r))
    return jnp.right_shift(
        r32 * _R2GRAY + g32 * _G2GRAY + b32 * _B2GRAY
        + (1 << (_GRAY_SHIFT - 1)), _GRAY_SHIFT).astype(dt)


def bgr_planes_to_ycrcb_i32(b: jnp.ndarray, g: jnp.ndarray, r: jnp.ndarray):
    """Integer BGR planes → (y, cr, cb) planes, OpenCV-exact + saturated.

    Dtype-preserving (see :func:`gray_from_bgr_planes`)."""
    dt = b.dtype
    b32, g32, r32 = (p.astype(jnp.int32) for p in (b, g, r))
    y = _descale(r32 * _R2Y + g32 * _G2Y + b32 * _B2Y)
    cr = _clip255(_descale((r32 - y) * _CR_COEF + _DELTA))
    cb = _clip255(_descale((b32 - y) * _CB_COEF + _DELTA))
    return y.astype(dt), cr.astype(dt), cb.astype(dt)


def ycrcb_planes_to_bgr_i32(y: jnp.ndarray, cr: jnp.ndarray, cb: jnp.ndarray):
    """Integer YCrCb planes → (b, g, r) planes, OpenCV-exact + saturated.

    Dtype-preserving (see :func:`gray_from_bgr_planes`)."""
    dt = y.dtype
    y32, cr32, cb32 = (p.astype(jnp.int32) for p in (y, cr, cb))
    r = _clip255(y32 + _descale((cr32 - 128) * _CR2R))
    g = _clip255(y32 + _descale((cr32 - 128) * _CR2G + (cb32 - 128) * _CB2G))
    b = _clip255(y32 + _descale((cb32 - 128) * _CB2B))
    return b.astype(dt), g.astype(dt), r.astype(dt)


def bgr_to_gray_u8(bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 → GRAY uint8, OpenCV's bit-exact 15-bit path."""
    x = bgr.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    return jnp.right_shift(
        r * _R2GRAY + g * _G2GRAY + b * _B2GRAY
        + (1 << (_GRAY_SHIFT - 1)), _GRAY_SHIFT).astype(jnp.uint8)


def bgr_to_ycrcb_u8(bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 → YCrCb uint8 (channel order Y, Cr, Cb), OpenCV-exact."""
    x = bgr.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = _descale(r * _R2Y + g * _G2Y + b * _B2Y)
    cr = _descale((r - y) * _CR_COEF + _DELTA)
    cb = _descale((b - y) * _CB_COEF + _DELTA)
    return jnp.stack([_sat_u8(y), _sat_u8(cr), _sat_u8(cb)], axis=-1)


def ycrcb_to_bgr_u8(ycrcb: jnp.ndarray) -> jnp.ndarray:
    """YCrCb uint8 → BGR uint8, OpenCV-exact fixed point."""
    x = ycrcb.astype(jnp.int32)
    y, cr, cb = x[..., 0], x[..., 1], x[..., 2]
    r = y + _descale((cr - 128) * _CR2R)
    g = y + _descale((cr - 128) * _CR2G + (cb - 128) * _CB2G)
    b = y + _descale((cb - 128) * _CB2B)
    return jnp.stack([_sat_u8(b), _sat_u8(g), _sat_u8(r)], axis=-1)


# ---------------------------------------------------------------------------
# LAB. Forward (BGR→LAB u8) follows OpenCV's published fixed-point u8
# algorithm (RGB2Lab_b): 256-entry sRGB gamma table scaled ×8, 12-bit XYZ
# coefficients divided by the D65 white point, a 3072-entry cube-root table
# in 15-bit fixed point, and CV_DESCALE rounding — bit-for-bit the integer
# pipeline. The inverse keeps the float formulation (OpenCV's u8 inverse is
# a trilinear-interpolated LUT scheme; the float path matches it to ±1 LSB)
# — sufficient for the optional "space: LAB" CLAHE mode (reference default
# is YCrCb; src/preprocess/ops/clahe_dehaze.py:22-26).
# ---------------------------------------------------------------------------
_LAB_SHIFT = 12           # xyz coefficient fixed point
_GAMMA_SHIFT = 3          # gamma table output scale (×8 → max 2040)
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT  # 15
_LAB_CBRT_TAB_N = (255 * 3 // 2 + 1) * (1 << _GAMMA_SHIFT)  # x ∈ [0, ~1.5]


# OpenCV builds LabCbrtTab_b with its softfloat cbrt (frozen since 3.4.1
# for cross-platform bit-exactness); a correctly-rounded float64 cbrt
# lands on the other side of the rounding half at exactly these 2 of
# 3064 entries. Solved as a difference-bound system over every one of
# cv2's 2^24 outputs (each pixel constrains fx-fy, fy-fz and fy; the
# tightest feasible table nearest the float64 prior differs only here)
# and validated by an exhaustive sweep (tests/test_cv2_crosscheck.py);
# the softfloat freeze makes the values stable across OpenCV
# versions/platforms.
_LAB_CBRT_SOFTFLOAT_DELTAS = {49: -1, 628: 1}


def _build_lab_tables():
    import numpy as np
    # gamma: u8 → linear, scaled to [0, 255·8]
    i = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(i <= 0.04045, i / 12.92, ((i + 0.055) / 1.055) ** 2.4)
    gamma_tab = np.rint(lin * 255.0 * (1 << _GAMMA_SHIFT)).astype(np.int32)
    # f(t) table over t = idx/2040 with the linear toe below 0.008856
    x = np.arange(_LAB_CBRT_TAB_N, dtype=np.float64) \
        / (255.0 * (1 << _GAMMA_SHIFT))
    f = np.where(x < 0.008856, x * 7.787 + 16.0 / 116.0, np.cbrt(x))
    cbrt_tab = np.rint(f * (1 << _LAB_SHIFT2)).astype(np.int32)
    for idx, d in _LAB_CBRT_SOFTFLOAT_DELTAS.items():
        cbrt_tab[idx] += d
    # 12-bit XYZ-over-white coefficients (rows X, Y, Z × cols R, G, B)
    m = np.asarray(_XYZ_FROM_RGB, np.float64)
    white = np.asarray(_WHITE, np.float64)
    coeffs = np.rint(m / white[:, None] * (1 << _LAB_SHIFT)).astype(np.int64)
    # each white-relative row happens to round to exactly 1<<12, so white
    # indexes the f-table at exactly 1.0 (matches the cvRound-only setup)
    assert (coeffs.sum(axis=1) == (1 << _LAB_SHIFT)).all()
    return gamma_tab, cbrt_tab, coeffs


_LAB_TABLES = None


def _lab_tables():
    """Lazy: the builder reads _XYZ_FROM_RGB/_WHITE defined further down."""
    global _LAB_TABLES
    if _LAB_TABLES is None:
        _LAB_TABLES = _build_lab_tables()
    return _LAB_TABLES


_LAB_LSCALE = (116 * 255 + 50) // 100
_LAB_LSHIFT = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)


def _descale_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.right_shift(x + (1 << (n - 1)), n)


def bgr_to_lab_u8_fixed(bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 → LAB uint8 via OpenCV's integer u8 pipeline (RGB2Lab_b).

    Table lookups are jnp gathers — fine for this opt-in path; the default
    YCrCb CLAHE mode stays gather-free.
    """
    gamma_np, cbrt_np, c = _lab_tables()
    gamma = jnp.asarray(gamma_np)
    cbrt = jnp.asarray(cbrt_np)
    x = bgr.astype(jnp.int32)
    b = jnp.take(gamma, x[..., 0])
    g = jnp.take(gamma, x[..., 1])
    r = jnp.take(gamma, x[..., 2])

    def fchan(row):
        idx = _descale_n(r * int(c[row, 0]) + g * int(c[row, 1])
                         + b * int(c[row, 2]), _LAB_SHIFT)
        return jnp.take(cbrt, jnp.clip(idx, 0, _LAB_CBRT_TAB_N - 1))

    fx, fy, fz = fchan(0), fchan(1), fchan(2)
    l_ = _descale_n(_LAB_LSCALE * fy + _LAB_LSHIFT, _LAB_SHIFT2)
    a_ = _descale_n(500 * (fx - fy) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    b_ = _descale_n(200 * (fy - fz) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    return jnp.stack([_sat_u8(l_), _sat_u8(a_), _sat_u8(b_)], axis=-1)
_XYZ_FROM_RGB = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=jnp.float32)
_RGB_FROM_XYZ = jnp.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311],
], dtype=jnp.float32)
_WHITE = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    delta = 6.0 / 29.0
    return jnp.where(t > delta ** 3, jnp.cbrt(t), t / (3 * delta * delta) + 4.0 / 29.0)


def _lab_f_inv(t: jnp.ndarray) -> jnp.ndarray:
    delta = 6.0 / 29.0
    return jnp.where(t > delta, t ** 3, 3 * delta * delta * (t - 4.0 / 29.0))


def bgr_to_lab_u8(bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 → LAB uint8 with OpenCV's u8 scaling (L*255/100, a/b+128)."""
    rgb = bgr[..., ::-1].astype(jnp.float32) / 255.0
    lin = _srgb_to_linear(rgb)
    xyz = jnp.einsum("...c,kc->...k", lin, _XYZ_FROM_RGB) / _WHITE
    f = _lab_f(xyz)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([
        _sat_u8(jnp.rint(l * 255.0 / 100.0).astype(jnp.int32)),
        _sat_u8(jnp.rint(a + 128.0).astype(jnp.int32)),
        _sat_u8(jnp.rint(b + 128.0).astype(jnp.int32)),
    ], axis=-1)


# ---------------------------------------------------------------------------
# Integer LAB→BGR inverse (OpenCV's Lab2RGBinteger pipeline). Structure:
# a 256-entry L→(y, ify) table (BASE=2^14 fixed point), integer a/b
# de-scalings with OpenCV's exact magic divisors (5·53687>>13 ≈ BASE/500,
# 41943>>9 ≈ BASE/200), a 36864-entry f→t inverse table (linear toe /
# integer cube with C truncation semantics), a 12-bit XYZ→linearRGB
# matrix with CV_DESCALE(·,14), and a 4096-entry inverse-gamma table.
# Every rounding choice below was pinned by fitting against cv2 and then
# verified bit-for-bit over ALL 2^24 LAB inputs (tests/test_cv2_crosscheck.py).
# ---------------------------------------------------------------------------
_INV_BASE_SHIFT = 14
_INV_BASE = 1 << _INV_BASE_SHIFT
_INV_MINAB = -8145
_INV_GAMMA_N = 4096


def _build_lab_inv_tables():
    import numpy as np

    # L → (y, ify), both scaled by BASE
    li = np.arange(256, dtype=np.float64) * 100.0 / 255.0
    toe = li <= 0.008856 * 903.3
    y_toe = li / 903.3
    fy = (li + 16.0) / 116.0
    y_tab = np.where(toe, np.rint(_INV_BASE * y_toe),
                     np.rint(_INV_BASE * fy ** 3)).astype(np.int32)
    ify_tab = np.where(toe,
                       np.rint(_INV_BASE * (7.787 * y_toe + 16.0 / 116.0)),
                       np.rint(_INV_BASE * fy)).astype(np.int32)

    # f → t inverse over ify+adiv ∈ [minab, BASE*9/4): linear toe below
    # fThresh=3390 (6/29·BASE), integer cube above — C division truncates
    # toward zero, matching OpenCV's expression i*i/BASE*i/BASE
    i = np.arange(_INV_MINAB, _INV_BASE * 9 // 4, dtype=np.int64)

    def ctrunc(a, d):
        q = np.abs(a) // d
        return np.where(a < 0, -q, q)

    lin = ctrunc(i * 108, 841) - 290
    cube = ctrunc(ctrunc(i * i, _INV_BASE) * i, _INV_BASE)
    ab_tab = np.where(i <= 3390, lin, cube).astype(np.int32)

    # 12-bit XYZ→linear-sRGB coefficients (white folded per column)
    m = np.asarray(_RGB_FROM_XYZ, np.float64)
    white = np.asarray(_WHITE, np.float64)
    coeffs = np.rint(m * white[None, :] * (1 << 12)).astype(np.int64)

    # linear (0..4095/4096) → 8-bit sRGB-encoded
    t = np.arange(_INV_GAMMA_N, dtype=np.float64) / _INV_GAMMA_N
    g = np.where(t <= 0.0031308, t * 12.92,
                 1.055 * t ** (1.0 / 2.4) - 0.055)
    gamma_tab = np.rint(g * 255.0).astype(np.int32)
    return y_tab, ify_tab, ab_tab, coeffs, gamma_tab


_LAB_INV_TABLES = None


def _lab_inv_tables():
    global _LAB_INV_TABLES
    if _LAB_INV_TABLES is None:
        _LAB_INV_TABLES = _build_lab_inv_tables()
    return _LAB_INV_TABLES


def lab_to_bgr_u8_fixed(lab: jnp.ndarray) -> jnp.ndarray:
    """LAB uint8 → BGR uint8 via OpenCV's integer pipeline (Lab2RGBinteger).

    Bit-exact vs cv2 over the full 2^24 input domain (exhaustive sweep in
    tests/test_cv2_crosscheck.py). Table lookups are jnp gathers — fine
    for this opt-in path (reference: src/preprocess/ops/clahe_dehaze.py:26,
    the ``space: LAB`` CLAHE mode's back-conversion)."""
    y_np, ify_np, ab_np, c, gamma_np = _lab_inv_tables()
    y_tab = jnp.asarray(y_np)
    ify_tab = jnp.asarray(ify_np)
    ab_tab = jnp.asarray(ab_np)
    gamma = jnp.asarray(gamma_np)
    x = lab.astype(jnp.int32)
    ll, aa, bb = x[..., 0], x[..., 1], x[..., 2]
    yy = jnp.take(y_tab, ll)
    ify = jnp.take(ify_tab, ll)
    adiv = jnp.right_shift(5 * aa * 53687 + (1 << 7), 13) \
        - 128 * _INV_BASE // 500
    bdiv = jnp.right_shift(bb * 41943 + (1 << 4), 9) \
        - 128 * _INV_BASE // 200 + 1
    nmax = ab_np.shape[0] - 1
    xx = jnp.take(ab_tab, jnp.clip(ify + adiv - _INV_MINAB, 0, nmax))
    zz = jnp.take(ab_tab, jnp.clip(ify - bdiv - _INV_MINAB, 0, nmax))

    def chan(row):
        v = jnp.right_shift(
            int(c[row, 0]) * xx + int(c[row, 1]) * yy + int(c[row, 2]) * zz
            + (1 << 13), 14)
        return jnp.take(gamma, jnp.clip(v, 0, _INV_GAMMA_N - 1))

    r, g, b = chan(0), chan(1), chan(2)
    return jnp.stack([_sat_u8(b), _sat_u8(g), _sat_u8(r)], axis=-1)


def lab_to_bgr_u8(lab: jnp.ndarray) -> jnp.ndarray:
    """LAB uint8 (OpenCV scaling) → BGR uint8 (float path)."""
    l = lab[..., 0].astype(jnp.float32) * (100.0 / 255.0)
    a = lab[..., 1].astype(jnp.float32) - 128.0
    b = lab[..., 2].astype(jnp.float32) - 128.0
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1) * _WHITE
    lin = jnp.einsum("...c,kc->...k", xyz, _RGB_FROM_XYZ)
    rgb = _linear_to_srgb(lin)
    out = jnp.rint(rgb * 255.0).astype(jnp.int32)
    return _sat_u8(out)[..., ::-1]
