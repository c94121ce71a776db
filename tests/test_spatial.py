"""Spatial partitioning (SP): rows-over-mesh forward equals single-device.

The input image's H axis is sharded over the 8-virtual-CPU-device mesh
(conftest) and the SAME yolov8 graph runs under GSPMD, which inserts the
conv halo exchanges. Correctness bar: outputs match the unsharded forward
(per-element conv reductions are unchanged by band partitioning, so the
tolerance is tight), and the input really spans all devices (the test
would silently pass on a replicated fallback otherwise).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import init_params, yolov8
from roadvision_tpu.parallel import make_mesh
from roadvision_tpu.parallel.spatial import (make_spatial_forward,
                                             spatial_sharding)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(8, model_parallel=1)
    params = init_params(jax.random.PRNGKey(0), "n")
    rng = np.random.RandomState(7)
    # 256 rows / 8 devices = 32-row bands: one stride-32 cell per device
    # at the deepest level, so every pyramid level is genuinely sharded.
    x = rng.rand(1, 256, 192, 3).astype(np.float32)
    return mesh, params, x


def test_spatial_forward_matches_single_device(setup):
    mesh, params, x = setup
    run = make_spatial_forward("n", 80, mesh)
    boxes_sp, scores_sp = run(params, x)
    boxes_1, scores_1 = jax.jit(
        lambda p, v: yolov8.forward_raw(p, v, "n", 80))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(boxes_sp), np.asarray(boxes_1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores_sp), np.asarray(scores_1),
                               rtol=1e-5, atol=1e-6)


def test_input_spans_all_devices(setup):
    mesh, params, x = setup
    sh = spatial_sharding(mesh)
    xd = jax.device_put(jnp.asarray(x), sh)
    assert len(xd.sharding.device_set) == 8
    # each device holds a 32-row band, not the full image
    shard_shapes = {s.data.shape for s in xd.addressable_shards}
    assert shard_shapes == {(1, 32, 192, 3)}


def test_uneven_height_still_correct(setup):
    """H not divisible by the mesh (GSPMD pads internally)."""
    mesh, params, _ = setup
    rng = np.random.RandomState(11)
    x = rng.rand(1, 224, 160, 3).astype(np.float32)  # 224/8 = 28-row bands
    run = make_spatial_forward("n", 80, mesh)
    boxes_sp, scores_sp = run(params, x)
    boxes_1, scores_1 = jax.jit(
        lambda p, v: yolov8.forward_raw(p, v, "n", 80))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(boxes_sp), np.asarray(boxes_1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores_sp), np.asarray(scores_1),
                               rtol=1e-5, atol=1e-6)
