"""Pallas kernels in interpret mode vs the jnp/oracle paths."""
import numpy as np
import pytest

from roadvision_tpu.ops.median import median_blur_u8
from roadvision_tpu.ops.pallas_median import median3_pallas
from roadvision_tpu.ops.pallas_clahe import sweep_pallas


@pytest.mark.parametrize("shape", [(140, 150, 3), (2, 128, 128, 3),
                                   (64, 200, 1)])
def test_pallas_median3_matches_jnp(shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    got = np.asarray(median3_pallas(img, interpret=True))
    want = np.asarray(median_blur_u8(img, ksize=3))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,r,w", [
    (2, 68, 256),     # lane-aligned W, first-band height
    (1, 135, 1920),   # 1080p full-tile band
    (2, 9, 854),      # ragged rows AND lanes (480p width)
])
def test_pallas_clahe_sweep_matches_gather(n, r, w):
    """sweep_pallas == packed[n, vals[n,y,x], x], full uint32 range incl.
    words with the top bit set (the int32 reinterpret must be sign-safe)."""
    rng = np.random.RandomState(n * r + w)
    vals = rng.randint(0, 256, (n, r, w)).astype(np.int32)
    packed = rng.randint(0, 2**32, (n, 256, w), dtype=np.uint64) \
        .astype(np.uint32)
    got = np.asarray(sweep_pallas(vals, packed, interpret=True))
    want = np.empty((n, r, w), np.uint32)
    for i in range(n):
        want[i] = packed[i][vals[i], np.arange(w)[None, :]]
    np.testing.assert_array_equal(got, want)


def test_pallas_clahe_sweep_matches_xla_band_sweep():
    """End-to-end CLAHE band-apply parity: the Pallas sweep feeds the same
    XLA blend, so routing through it must reproduce clahe_planar_i32
    bit-for-bit (both blend modes)."""
    import jax.numpy as jnp

    from roadvision_tpu.ops import clahe as C

    rng = np.random.RandomState(7)
    plane = rng.randint(0, 256, (2, 96, 128)).astype(np.int32)
    want_cv2 = np.asarray(C.clahe_planar_i32(jnp.asarray(plane), 2.0, (4, 4)))
    want_fix = np.asarray(C.clahe_planar_i32(jnp.asarray(plane), 2.0, (4, 4),
                                             blend="fixed"))

    orig = C._pallas_sweep_active
    C._pallas_sweep_active = lambda: True
    try:
        # interpret mode: monkeypatch sweep_pallas to its interpreted form
        import roadvision_tpu.ops.pallas_clahe as PC
        orig_sweep = PC.sweep_pallas
        import functools
        C_sweep = functools.partial(orig_sweep, interpret=True)
        PC.sweep_pallas = C_sweep
        try:
            got_cv2 = np.asarray(C.clahe_planar_i32(
                jnp.asarray(plane), 2.0, (4, 4)))
            got_fix = np.asarray(C.clahe_planar_i32(
                jnp.asarray(plane), 2.0, (4, 4), blend="fixed"))
        finally:
            PC.sweep_pallas = orig_sweep
    finally:
        C._pallas_sweep_active = orig
    np.testing.assert_array_equal(got_cv2, want_cv2)
    np.testing.assert_array_equal(got_fix, want_fix)
