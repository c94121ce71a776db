"""Real-data loaders for the task families: YOLO-OBB quad labels,
COCO keypoints, COCO polygon segmentations — geometry-pinned against
hand-computed letterbox transforms, plus train-CLI smoke on each.

The reference trains nothing (SURVEY.md §5); these loaders make the
beyond-reference task trainers consumable with the standard public
dataset layouts (ultralytics DOTA txt, COCO person_keypoints /
instances JSON).
"""
import json

import numpy as np
import pytest

from PIL import Image

from roadvision_tpu.detect.dataset import (corners_to_rbox,
                                           load_coco_kpts_json,
                                           load_coco_seg_json,
                                           load_yolo_obb_dir)


def _save_img(path, w, h):
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(path)


def test_corners_to_rbox_roundtrip():
    import jax.numpy as jnp

    from roadvision_tpu.ops.obb import rbox_corners

    rng = np.random.RandomState(3)
    for _ in range(20):
        rb = np.array([rng.uniform(40, 80), rng.uniform(40, 80),
                       rng.uniform(20, 40), rng.uniform(6, 18),
                       rng.uniform(-np.pi / 4, 3 * np.pi / 4)], np.float32)
        if rb[2] < rb[3]:
            rb[2], rb[3] = rb[3], rb[2]
        corners = np.asarray(rbox_corners(jnp.asarray(rb[None])))[0]
        out = np.array(corners_to_rbox(corners))
        np.testing.assert_allclose(out[:2], rb[:2], atol=1e-3)
        np.testing.assert_allclose(sorted(out[2:4]), sorted(rb[2:4]),
                                   atol=1e-3)
        # θ equal modulo π (the box's 180° symmetry)
        dth = (out[4] - rb[4]) % np.pi
        assert min(dth, np.pi - dth) < 1e-3


def test_load_yolo_obb_dir_geometry(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    w, h = 64, 32
    _save_img(tmp_path / "images" / "a.png", w, h)
    # axis-aligned quad: center (0.5, 0.5), w 0.5·W, h 0.25·H
    quad = [0.25, 0.375, 0.75, 0.375, 0.75, 0.625, 0.25, 0.625]
    (tmp_path / "labels" / "a.txt").write_text(
        "3 " + " ".join(str(v) for v in quad) + "\n")
    imgs, rb, cls, mask = load_yolo_obb_dir(str(tmp_path), imgsz=64,
                                            max_boxes=4)
    assert imgs.shape == (1, 64, 64, 3)
    assert mask[0, 0] and not mask[0, 1:].any()
    assert cls[0, 0] == 3
    # letterbox: r = 1 (64/64 width-bound), dh = 16
    cx, cy, bw, bh, th = rb[0, 0]
    assert cx == pytest.approx(32.0, abs=1e-3)
    assert cy == pytest.approx(0.5 * 32 + 16, abs=1e-3)
    assert bw == pytest.approx(32.0, abs=1e-3)      # 0.5 · 64
    assert bh == pytest.approx(8.0, abs=1e-3)       # 0.25 · 32
    assert abs(th) < 1e-5 or abs(abs(th) - np.pi) < 1e-5


def _coco_base(w, h, fname):
    return {
        "images": [{"id": 1, "file_name": fname, "width": w, "height": h}],
        "categories": [{"id": 7, "name": "person"}],
    }


def test_load_coco_kpts_json_geometry(tmp_path):
    w, h = 64, 32
    _save_img(tmp_path / "im.png", w, h)
    kpts = [0.0] * 51
    kpts[0:3] = [10.0, 8.0, 2.0]    # nose labelled
    kpts[3:6] = [20.0, 16.0, 0.0]   # left eye unlabelled
    spec = _coco_base(w, h, "im.png")
    spec["annotations"] = [{
        "id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
        "bbox": [8.0, 6.0, 20.0, 18.0], "keypoints": kpts,
        "num_keypoints": 1,
    }]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(spec))
    imgs, boxes, cls, mask, kk = load_coco_kpts_json(str(p), imgsz=64)
    assert imgs.shape == (1, 64, 64, 3) and kk.shape == (1, 50, 17, 3)
    assert mask[0, 0] and (cls == 0).all()
    # r = 1, dh = 16
    np.testing.assert_allclose(boxes[0, 0], [8, 22, 28, 40], atol=1e-4)
    np.testing.assert_allclose(kk[0, 0, 0], [10, 24, 2.0], atol=1e-4)
    assert kk[0, 0, 1, 2] == 0.0    # v flag preserved


def test_load_coco_seg_json_masks(tmp_path):
    w, h = 64, 64
    _save_img(tmp_path / "im.png", w, h)
    spec = _coco_base(w, h, "im.png")
    # square polygon covering x∈[16,48), y∈[16,48) → S/4 cells [4,12)
    poly = [16.0, 16.0, 48.0, 16.0, 48.0, 48.0, 16.0, 48.0]
    spec["annotations"] = [
        {"id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
         "bbox": [16.0, 16.0, 32.0, 32.0], "segmentation": [poly]},
        {"id": 2, "image_id": 1, "category_id": 7, "iscrowd": 0,
         "bbox": [0.0, 0.0, 8.0, 8.0],
         "segmentation": {"counts": "rle-blob", "size": [h, w]}},
    ]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(spec))
    imgs, boxes, cls, mask, seg = load_coco_seg_json(str(p), imgsz=64)
    assert seg.shape == (1, 50, 16, 16)
    inside = seg[0, 0, 5:11, 5:11]
    outside = seg[0, 0, :3, :]
    assert inside.min() >= 0.99
    assert outside.max() == 0.0
    # RLE ann: box kept, mask empty
    assert mask[0, 1] and seg[0, 1].sum() == 0.0


def test_eval_map_cli_obb_task(tmp_path, capsys):
    from tools.eval_map import main as eval_main

    root = tmp_path / "dota"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    _save_img(root / "images" / "a.png", 96, 96)
    quad = [0.3, 0.4, 0.7, 0.4, 0.7, 0.6, 0.3, 0.6]
    (root / "labels" / "a.txt").write_text(
        "2 " + " ".join(map(str, quad)) + "\n")
    rc = eval_main(["--data", str(root), "--weights", "none-obb.pt",
                    "--imgsz", "96"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rbox_mAP@0.5" in out
    assert 0.0 <= out["rbox_mAP@0.5"] <= 1.0


def test_train_cli_obb_real_dir(tmp_path):
    from tools.train import main as train_main

    root = tmp_path / "dota"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        _save_img(root / "images" / f"{i}.png", 96, 96)
        quad = [0.3, 0.4, 0.7, 0.4, 0.7, 0.6, 0.3, 0.6]
        (root / "labels" / f"{i}.txt").write_text(
            f"{rng.randint(0, 5)} " + " ".join(map(str, quad)) + "\n")
    out = tmp_path / "obb_dir_run.npz"
    rc = train_main(["--data", str(root), "--steps", "1",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "none-obb.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    assert out.with_suffix(".weights.npz").exists()


def test_train_cli_pose_coco_json(tmp_path):
    from tools.train import main as train_main

    w = h = 96
    _save_img(tmp_path / "im.png", w, h)
    spec = _coco_base(w, h, "im.png")
    kpts = list(np.tile([30.0, 30.0, 2.0], 17))
    spec["annotations"] = [{
        "id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
        "bbox": [20.0, 20.0, 30.0, 40.0], "keypoints": kpts,
        "num_keypoints": 17,
    }]
    p = tmp_path / "kp.json"
    p.write_text(json.dumps(spec))
    out = tmp_path / "pose_json_run.npz"
    rc = train_main(["--data", str(p), "--steps", "1",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "none-pose.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    assert out.with_suffix(".weights.npz").exists()


def test_train_cli_seg_coco_json(tmp_path):
    from tools.train import main as train_main

    w = h = 96
    _save_img(tmp_path / "im.png", w, h)
    spec = _coco_base(w, h, "im.png")
    poly = [20.0, 20.0, 60.0, 20.0, 60.0, 60.0, 20.0, 60.0]
    spec["annotations"] = [{
        "id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
        "bbox": [20.0, 20.0, 40.0, 40.0], "segmentation": [poly],
    }]
    p = tmp_path / "seg.json"
    p.write_text(json.dumps(spec))
    out = tmp_path / "seg_json_run.npz"
    rc = train_main(["--data", str(p), "--steps", "1",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "none-seg.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    assert out.with_suffix(".weights.npz").exists()


def test_fog_augment_batch_photometric_only():
    import numpy as np

    from roadvision_tpu.detect.dataset import fog_augment_batch
    rng = np.random.RandomState(0)
    imgs = np.asarray(np.random.default_rng(1).integers(
        0, 255, (3, 96, 96, 3)), np.uint8)
    # p=0: bit-identical
    np.testing.assert_array_equal(
        fog_augment_batch(imgs, rng, p=0.0), imgs)
    # p=1: every image changed, dtype/shape preserved, input untouched
    before = imgs.copy()
    out = fog_augment_batch(imgs, rng, p=1.0, level="heavy")
    assert out.shape == imgs.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(imgs, before)
    for i in range(3):
        assert np.abs(out[i].astype(int) - imgs[i].astype(int)).mean() > 2
    # heavy fog raises brightness toward the airlight on a dark scene
    dark = np.full((1, 96, 96, 3), 20, np.uint8)
    foggy = fog_augment_batch(dark, rng, p=1.0, level="heavy")
    assert foggy.mean() > dark.mean() + 10


def test_train_cli_fog_smoke(tmp_path):
    import tools.train as train
    rc = train.main(["--data", "synthetic", "--steps", "2", "--imgsz",
                     "96", "--batch", "2", "--weights", "none.pt",
                     "--fog", "1.0", "--fog-level", "medium",
                     "--no-ema", "--out", str(tmp_path / "fog.npz")])
    assert rc == 0
    assert (tmp_path / "fog.weights.npz").exists()
