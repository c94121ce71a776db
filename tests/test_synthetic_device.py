"""Device-side synthetic source parity vs the host renderer."""
import numpy as np

from roadvision_tpu.io_video.capture import SyntheticRoadSource
from roadvision_tpu.io_video.synthetic_device import DeviceSyntheticSource


def test_device_render_close_to_host():
    host = SyntheticRoadSource(160, 120, num_vehicles=3)
    dev = DeviceSyntheticSource(160, 120, num_vehicles=3)
    render = dev.make_render_fn(batch=4)
    got = np.asarray(render(np.int32(5)))
    assert got.shape == (4, 120, 160, 3) and got.dtype == np.uint8
    for i in range(4):
        want = host.render(5 + i)
        # same geometry formulas; float rounding at rect edges may differ by
        # a pixel row/col — demand near-exact agreement
        frac_diff = (got[i] != want).mean()
        assert frac_diff < 0.02, frac_diff


def test_device_render_advances_with_index():
    dev = DeviceSyntheticSource(160, 120, num_vehicles=3)
    render = dev.make_render_fn(batch=2)
    a = np.asarray(render(np.int32(0)))
    b = np.asarray(render(np.int32(50)))
    assert not np.array_equal(a[0], b[0])
