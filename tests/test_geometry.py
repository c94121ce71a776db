"""Homography DLT + projector semantics vs analytic ground truth."""
import numpy as np
import pytest

from roadvision_tpu.geometry import (HomographyProjector, build_projector,
                                     distance_device, find_homography_dlt,
                                     project_boxes_device)


def _affine_cfg(**over):
    # image (x, y) -> world (x/100, (480-y)/10): a simple analytic map
    img = [[0, 480], [640, 480], [0, 80], [640, 80]]
    world = [[0.0, 0.0], [6.4, 0.0], [0.0, 40.0], [6.4, 40.0]]
    cfg = {"type": "homography", "image_points": img, "world_points": world,
           "origin": [0.0, 0.0], "max_distance": 1000.0}
    cfg.update(over)
    return cfg


def test_dlt_exact_on_four_points():
    cfg = _affine_cfg()
    H = find_homography_dlt(np.array(cfg["image_points"], float),
                            np.array(cfg["world_points"], float))
    for (x, y), (X, Y) in zip(cfg["image_points"], cfg["world_points"]):
        v = H @ [x, y, 1.0]
        np.testing.assert_allclose(v[:2] / v[2], [X, Y], atol=1e-9)


def test_dlt_projective_case():
    # true projective H, 6 noisy-free points → recovered exactly
    H_true = np.array([[1.2, 0.1, 5.0], [0.05, 0.9, -3.0], [1e-3, 2e-3, 1.0]])
    rng = np.random.RandomState(0)
    src = rng.uniform(0, 500, (6, 2))
    homog = (H_true @ np.c_[src, np.ones(6)].T).T
    dst = homog[:, :2] / homog[:, 2:3]
    H = find_homography_dlt(src, dst)
    np.testing.assert_allclose(H, H_true, rtol=1e-8)


def test_projector_validation_errors():
    with pytest.raises(ValueError):
        HomographyProjector({"image_points": [[0, 0], [1, 1], [2, 2]],
                             "world_points": [[0, 0], [1, 1], [2, 2]]})
    with pytest.raises(ValueError):
        HomographyProjector(_affine_cfg(world_points=[[0, 0], [1, 1]]))
    with pytest.raises(ValueError):
        build_projector({"projector": _affine_cfg(type="fisheye")})


def test_project_bbox_bottom_center_and_distance_clamp():
    proj = build_projector({"projector": _affine_cfg(max_distance=30.0)})
    # bbox bottom-center (320, 280) → world (3.2, 20.0)
    pt = proj.project_bbox((300, 100, 340, 280))
    np.testing.assert_allclose(pt, (3.2, 20.0), atol=1e-6)
    d = proj.distance(pt)
    assert abs(d - np.hypot(3.2, 20.0)) < 1e-5
    # far bbox distance clamped, not rejected
    far = proj.distance_for_bbox((300, 50, 340, 85))
    assert far == 30.0


def test_device_path_matches_scalar():
    proj = build_projector({"projector": _affine_cfg()})
    H, origin, maxd = proj.device_params()
    boxes = np.array([[300, 100, 340, 280],
                      [100, 200, 200, 400],
                      [0, 0, 10, 480]], np.float32)
    ground, valid = project_boxes_device(H, boxes)
    dists = np.asarray(distance_device(ground, valid, origin, maxd))
    for i, b in enumerate(boxes):
        want_pt = proj.project_bbox(tuple(b))
        np.testing.assert_allclose(np.asarray(ground)[i], want_pt, atol=1e-3)
        assert abs(dists[i] - proj.distance_for_bbox(tuple(b))) < 1e-3


def test_device_w_guard():
    # H with a row making w = 0 along a line → those boxes invalid
    import jax.numpy as jnp
    H = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, -1.0, 100.0]], jnp.float32)
    boxes = np.array([[0, 50, 10, 100.0],   # w = 0 → invalid
                      [0, 50, 10, 99.0]], np.float32)
    ground, valid = project_boxes_device(H, boxes)
    assert not bool(valid[0]) and bool(valid[1])
