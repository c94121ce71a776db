"""Color kernels vs the independent numpy oracle + analytic spot checks."""
import numpy as np

from roadvision_tpu.ops import color
from tests.oracles import color_oracle


def _rand_bgr(shape=(2, 33, 47, 3), seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


def test_gray_matches_oracle():
    bgr = _rand_bgr()
    got = np.asarray(color.bgr_to_gray_u8(bgr))
    want = color_oracle.bgr_to_gray(bgr)
    np.testing.assert_array_equal(got, want)


def test_gray_known_values():
    # pure white/black/red
    px = np.array([[[255, 255, 255], [0, 0, 0], [0, 0, 255]]], dtype=np.uint8)
    got = np.asarray(color.bgr_to_gray_u8(px))[0]
    assert got[0] == 255 and got[1] == 0
    # 0.299*255 = 76.245 → bit-exact 15-bit path gives 76 too
    assert got[2] == 76


def test_ycrcb_roundtrip_and_oracle():
    bgr = _rand_bgr(seed=1)
    ycc = np.asarray(color.bgr_to_ycrcb_u8(bgr))
    np.testing.assert_array_equal(ycc, color_oracle.bgr_to_ycrcb(bgr))
    back = np.asarray(color.ycrcb_to_bgr_u8(ycc))
    np.testing.assert_array_equal(back, color_oracle.ycrcb_to_bgr(ycc))
    # fixed-point roundtrip error is bounded (|err| <= 2 per channel typical)
    err = np.abs(back.astype(int) - bgr.astype(int))
    assert err.max() <= 3


def test_gray_neutral_equals_channels():
    v = np.arange(256, dtype=np.uint8)
    bgr = np.stack([v, v, v], axis=-1)[None]
    got = np.asarray(color.bgr_to_gray_u8(bgr))[0]
    # coefficients sum to 1<<15 exactly → neutral gray maps to itself
    np.testing.assert_array_equal(got, v)


def test_lab_roundtrip_reasonable():
    bgr = _rand_bgr(shape=(1, 16, 16, 3), seed=2)
    lab = np.asarray(color.bgr_to_lab_u8(bgr))
    assert lab.dtype == np.uint8
    back = np.asarray(color.lab_to_bgr_u8(lab))
    err = np.abs(back.astype(int) - bgr.astype(int))
    # u8 LAB is inherently lossy (a/b quantization steepened by sRGB gamma on
    # dark saturated pixels — OpenCV's own u8 path behaves the same). Bound
    # the distribution, not the worst pixel.
    assert err.mean() < 1.5
    assert np.percentile(err, 99) <= 10
    assert err.max() <= 32


def test_lab_white_black():
    px = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
    lab = np.asarray(color.bgr_to_lab_u8(px))[0]
    assert lab[0, 0] == 255  # L of white = 100 → 255
    assert abs(int(lab[0, 1]) - 128) <= 1 and abs(int(lab[0, 2]) - 128) <= 1
    assert lab[1, 0] == 0


def test_lab_fixed_matches_scalar_oracle():
    """The integer u8 BGR→LAB path is bit-exact vs the published-algorithm
    scalar oracle (OpenCV RGB2Lab_b; tests/oracles/lab_oracle.py)."""
    from tests.oracles import lab_oracle
    rng = np.random.RandomState(11)
    bgr = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    got = np.asarray(color.bgr_to_lab_u8_fixed(bgr))
    want = lab_oracle.bgr_to_lab_u8(bgr)
    np.testing.assert_array_equal(got, want)


def test_lab_fixed_close_to_float_path():
    """Independent float formulation agrees with the integer pipeline to
    LUT-quantization error — a cross-check that both are the same math."""
    rng = np.random.RandomState(12)
    bgr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    fixed = np.asarray(color.bgr_to_lab_u8_fixed(bgr)).astype(int)
    flt = np.asarray(color.bgr_to_lab_u8(bgr)).astype(int)
    assert np.abs(fixed - flt).max() <= 2
    assert (fixed != flt).mean() < 0.15


def test_lab_fixed_white_black():
    px = np.array([[[255, 255, 255], [0, 0, 0]]], np.uint8)
    lab = np.asarray(color.bgr_to_lab_u8_fixed(px))[0]
    assert lab[0, 0] == 255 and lab[1, 0] == 0
    assert abs(int(lab[0, 1]) - 128) <= 1 and abs(int(lab[0, 2]) - 128) <= 1
