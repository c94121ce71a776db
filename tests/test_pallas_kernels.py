"""Pallas kernels in interpret mode vs the jnp/oracle paths."""
import numpy as np
import pytest

from roadvision_tpu.ops.median import median_blur_u8
from roadvision_tpu.ops.pallas_median import median3_pallas


@pytest.mark.parametrize("shape", [(140, 150, 3), (2, 128, 128, 3),
                                   (64, 200, 1)])
def test_pallas_median3_matches_jnp(shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    got = np.asarray(median3_pallas(img, interpret=True))
    want = np.asarray(median_blur_u8(img, ksize=3))
    np.testing.assert_array_equal(got, want)
