"""Median + CLAHE kernels vs scalar numpy oracles (SURVEY.md §4 unit tier)."""
import numpy as np
import pytest

from roadvision_tpu.ops.clahe import clahe_u8, compute_tile_luts
from roadvision_tpu.ops.median import median_blur_u8
from tests.oracles import clahe_oracle


def _median_oracle(img: np.ndarray, k: int) -> np.ndarray:
    pad = k // 2
    xp = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    h, w, c = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            win = xp[y:y + k, x:x + k]
            out[y, x] = np.median(win.reshape(-1, c), axis=0)
    return out


@pytest.mark.parametrize("k", [3, 5, 7, 9])
def test_median_matches_oracle(k):
    rng = np.random.RandomState(k)
    img = rng.randint(0, 256, (21, 17, 3), dtype=np.uint8)
    got = np.asarray(median_blur_u8(img, ksize=k))
    want = _median_oracle(img, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [3, 5, 9])
def test_median_matches_scipy(k):
    """Independent cross-library check: scipy.ndimage with mode='nearest'
    implements the same replicate-border odd-window median as
    cv2.medianBlur (both pick the exact middle order statistic)."""
    from scipy import ndimage

    rng = np.random.RandomState(100 + k)
    img = rng.randint(0, 256, (33, 29, 3), dtype=np.uint8)
    got = np.asarray(median_blur_u8(img, ksize=k))
    want = np.stack([
        ndimage.median_filter(img[..., c], size=k, mode="nearest")
        for c in range(3)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_median_even_and_clamped_ksize():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (12, 12, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(median_blur_u8(img, ksize=4)),
        np.asarray(median_blur_u8(img, ksize=5)))
    np.testing.assert_array_equal(
        np.asarray(median_blur_u8(img, ksize=11)),
        np.asarray(median_blur_u8(img, ksize=9)))
    np.testing.assert_array_equal(
        np.asarray(median_blur_u8(img, ksize=1)),
        np.asarray(median_blur_u8(img, ksize=3)))


def test_median_batched_matches_single():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (3, 15, 19, 3), dtype=np.uint8)
    got = np.asarray(median_blur_u8(imgs, ksize=3))
    for i in range(3):
        np.testing.assert_array_equal(
            got[i], np.asarray(median_blur_u8(imgs[i], ksize=3)))


@pytest.mark.parametrize("shape,grid,clip", [
    ((64, 64), (8, 8), 2.0),
    ((60, 52), (8, 8), 2.0),    # non-divisible → reflect-101 pad
    ((64, 64), (4, 4), 40.0),   # large clip (little clipping)
    ((48, 40), (2, 2), 1.0),    # aggressive clipping
])
def test_clahe_matches_oracle(shape, grid, clip):
    rng = np.random.RandomState(sum(shape))
    # mix of low-contrast region + noise to exercise clipping paths
    base = np.linspace(80, 140, shape[0] * shape[1]).reshape(shape)
    plane = np.clip(base + rng.randn(*shape) * 20, 0, 255).astype(np.uint8)
    # integer LUT stage: bit-exact
    got_luts = np.asarray(compute_tile_luts(plane, clip_limit=clip, grid=grid))
    want_luts = clahe_oracle.tile_luts(plane, clip_limit=clip, grid=grid)
    np.testing.assert_array_equal(got_luts, want_luts)
    # full output: ±1 LSB (float bilinear blend is FMA-contraction sensitive,
    # exactly as OpenCV's own SIMD vs scalar paths differ by ±1)
    got = np.asarray(clahe_u8(plane, clip_limit=clip, grid=grid)).astype(int)
    want = clahe_oracle.clahe(plane, clip_limit=clip, grid=grid).astype(int)
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 0.05


def test_clahe_batched_matches_single():
    rng = np.random.RandomState(7)
    planes = rng.randint(0, 256, (4, 40, 40), dtype=np.uint8)
    got = np.asarray(clahe_u8(planes, clip_limit=2.0, grid=(8, 8)))
    for i in range(4):
        np.testing.assert_array_equal(
            got[i], np.asarray(clahe_u8(planes[i], clip_limit=2.0, grid=(8, 8))))


def test_clahe_uniform_plane_stays_uniform():
    plane = np.full((32, 32), 100, np.uint8)
    out = np.asarray(clahe_u8(plane, clip_limit=2.0, grid=(8, 8)))
    # all tiles identical → every pixel maps through the same LUT value
    assert len(np.unique(out)) == 1
    # and it matches the scalar oracle exactly
    want = clahe_oracle.clahe(plane, clip_limit=2.0, grid=(8, 8))
    np.testing.assert_array_equal(out, want)


def test_int8_histogram_variant_exact():
    """RVT_CLAHE_HIST_DTYPE=int8 one-hot matmul counts match bincount
    (int8 0/1 operands, int32 accumulate — exact like the bf16/f32 path)."""
    import numpy as np

    from roadvision_tpu.ops import clahe as clahe_mod

    rng = np.random.RandomState(3)
    b, gy, th, gx, tw = 2, 3, 16, 4, 24
    tiled = rng.randint(0, 256, (b, gy, th, gx, tw)).astype(np.int32)
    want = np.stack([
        np.stack([
            np.stack([np.bincount(tiled[i, y, :, x, :].ravel(),
                                  minlength=256)
                      for x in range(gx)])
            for y in range(gy)])
        for i in range(b)])
    old = clahe_mod._HIST_DTYPE
    try:
        for dtype in ("bf16", "int8"):
            clahe_mod._HIST_DTYPE = dtype
            got = np.asarray(clahe_mod._tile_histograms_sweep(tiled))
            np.testing.assert_array_equal(got, want, err_msg=dtype)
    finally:
        clahe_mod._HIST_DTYPE = old
