"""YOLOv8-pose: torch-twin parity, decode oracle, importer, end-to-end.

Pose is a beyond-reference model family (the reference wrapper serves
detection only, src/detect/yolo_ultralytics.py:16); same parity strategy
as the seg/cls families (tests/oracles/torch_yolo.py:v8_pose_forward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import weights, yolov8_pose

from tests.oracles import torch_yolo


def _max_err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def test_pose_spec():
    s = yolov8_pose.pose_spec("n")
    assert s["nk"] == 51
    assert s["c4"] == max(s["ch_det"][0] // 4, 51)


def test_pose_forward_matches_torch():
    params = yolov8_pose.init_params_pose(jax.random.PRNGKey(4), "n")
    rng = np.random.RandomState(0)
    x = rng.rand(2, 128, 128, 3).astype(np.float32)

    jb, js, jk = yolov8_pose.forward_pose(params, jnp.asarray(x),
                                          size="n", nc=1,
                                          dtype=jnp.float32)
    tb, ts, tk = torch_yolo.v8_pose_forward(params, x)
    n = 16 * 16 + 8 * 8 + 4 * 4
    assert jk.shape == tk.shape == (2, n, 17, 3)
    assert _max_err(jb, tb) < 0.05
    assert _max_err(js, ts) < 2e-3
    assert _max_err(jk, tk) < 0.05, _max_err(jk, tk)


def test_kpts_decode_oracle():
    """Scalar check of the decode: xy = (raw*2 + cell_origin) * stride,
    vis = sigmoid(raw)."""
    raw = np.zeros((1, 16 + 4 + 1, 51), np.float32)
    raw[0, 0, 0] = 0.25   # first anchor of the stride-8 level, kpt0 x
    raw[0, 0, 1] = -0.5   # kpt0 y
    raw[0, 0, 2] = 0.0    # kpt0 vis logit
    hw = [(4, 4), (2, 2), (1, 1)]
    out = np.asarray(yolov8_pose.decode_kpts(jnp.asarray(raw), hw))
    # anchor (0,0): grid origin 0; stride 8
    assert out[0, 0, 0, 0] == pytest.approx(0.25 * 2 * 8)
    assert out[0, 0, 0, 1] == pytest.approx(-0.5 * 2 * 8)
    assert out[0, 0, 0, 2] == pytest.approx(0.5)
    # second anchor of the first row: grid origin x = 1 → (raw*2+1)*8
    assert out[0, 1, 0, 0] == pytest.approx((0.0 * 2 + 1.0) * 8)
    # stride-16 level first anchor (index 16)
    raw2 = np.zeros_like(raw)
    raw2[0, 16, 3] = 1.0  # kpt1 x at the 16-stride level
    out2 = np.asarray(yolov8_pose.decode_kpts(jnp.asarray(raw2), hw))
    assert out2[0, 16, 1, 0] == pytest.approx(1.0 * 2 * 16)


def test_pose_state_dict_import():
    torch = pytest.importorskip("torch")
    ref = yolov8_pose.init_params_pose(jax.random.PRNGKey(0), "n")
    g = torch.Generator().manual_seed(9)
    sd = {}

    def add_convbn(prefix, tree):
        k, _, cin, cout = tree["w"].shape
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k,
                                                  generator=g) * 0.05
        sd[f"{prefix}.bn.weight"] = torch.rand(cout, generator=g) + 0.5
        sd[f"{prefix}.bn.bias"] = torch.randn(cout, generator=g) * 0.01
        sd[f"{prefix}.bn.running_mean"] = torch.randn(cout,
                                                      generator=g) * 0.01
        sd[f"{prefix}.bn.running_var"] = torch.rand(cout, generator=g) + 0.5

    def add_plain(prefix, tree):
        k, _, cin, cout = tree["w"].shape
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, k, k,
                                             generator=g) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(cout, generator=g) * 0.01

    for i in ("0", "1", "3", "5", "7", "16", "19"):
        add_convbn(f"model.{i}", ref[i])
    for i in ("2", "4", "6", "8", "12", "15", "18", "21"):
        blk = ref[i]
        add_convbn(f"model.{i}.cv1", blk["cv1"])
        add_convbn(f"model.{i}.cv2", blk["cv2"])
        for j, m in enumerate(blk["m"]):
            add_convbn(f"model.{i}.m.{j}.cv1", m["cv1"])
            add_convbn(f"model.{i}.m.{j}.cv2", m["cv2"])
    add_convbn("model.9.cv1", ref["9"]["cv1"])
    add_convbn("model.9.cv2", ref["9"]["cv2"])
    for branch in ("cv2", "cv3", "cv4"):
        for lvl in range(3):
            stages = ref["22"][branch][lvl]
            add_convbn(f"model.22.{branch}.{lvl}.0", stages[0])
            add_convbn(f"model.22.{branch}.{lvl}.1", stages[1])
            add_plain(f"model.22.{branch}.{lvl}.2", stages[2])

    assert weights.detect_task(sd) == "pose"
    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and arch == "v8" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)


def test_infer_keypoints_end_to_end():
    """Production detector vs twin chain incl. keypoint rescale to
    source pixels."""
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    params = yolov8_pose.init_params_pose(jax.random.PRNGKey(11), "n")
    rng = np.random.RandomState(6)
    frame = rng.randint(0, 256, (90, 160, 3), dtype=np.uint8)

    det = YOLOJax({"model": "yolov8n-pose.pt", "conf_thres": 2e-5,
                   "iou_thres": 0.7, "max_det": 10, "imgsz": 160,
                   "compute_dtype": "float32", "device": "cpu"})
    assert det.task == "pose"
    assert det.names == {0: "person"}
    det.set_params(params)
    dets = det.infer(frame)
    assert dets and all(d.keypoints is not None
                        and d.keypoints.shape == (17, 3) for d in dets)

    timgs, tratio, tpad = torch_yolo.letterbox(frame[None], 160,
                                               auto=True)
    tb, ts, tk = torch_yolo.v8_pose_forward(params, timgs)
    nb, nconf, ncls, nidx = torch_yolo.greedy_nms(
        tb[0], ts[0], conf_thres=2e-5, iou_thres=0.7, max_det=10,
        pre_topk=300, return_idx=True)
    kk = tk[0][nidx].copy()
    kk[..., 0] = np.clip((kk[..., 0] - tpad[0]) / tratio, 0, 160)
    kk[..., 1] = np.clip((kk[..., 1] - tpad[1]) / tratio, 0, 90)

    assert len(dets) == len(nb)
    for i, d in enumerate(dets):
        assert _max_err(d.keypoints, kk[i]) < 0.1, i


def test_engine_pose_task_keypoints():
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing-pose.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.detector.task == "pose"
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.keypoints is not None for d in dets)
    assert all(d.mask is None for d in dets)
    # engine keypoints equal the standalone detector's
    direct = eng.detector.infer_batch(frames)
    v = direct.valid[0]
    got = np.stack([d.keypoints for d in res[0].detections])
    np.testing.assert_allclose(got, direct.keypoints[0][v], atol=1e-4)


def test_detect_cli_pose_task(tmp_path):
    from tools.detect import main as detect_main

    out = tmp_path / "pose_out"
    rc = detect_main(["--source", "synthetic", "--frames", "1",
                      "--out", str(out), "--weights", "yolov8n-pose.pt",
                      "--task", "pose", "--imgsz", "96",
                      "--conf", "1e-4", "--max-det", "5",
                      "--dtype", "float32"])
    assert rc == 0
    assert len(list(out.glob("frame_*.jpg"))) == 1


def test_draw_keypoints_renders():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.vis import draw_keypoints

    img = np.zeros((60, 80, 3), np.uint8)
    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = np.linspace(10, 70, 17)
    kp[:, 1] = np.linspace(10, 50, 17)
    kp[:, 2] = 0.9
    kp[3, 2] = 0.1   # one invisible joint
    d = Detection(5, 5, 75, 55, 0.9, 0, "person", keypoints=kp)
    draw_keypoints(img, [d])
    assert (img != 0).any()
    # invisible joint has no white marker at its location
    x, y = int(kp[3, 0]), int(kp[3, 1])
    assert not (img[y, x] == (255, 255, 255)).all()


def test_oks_matrix_properties():
    from roadvision_tpu.detect.eval import oks_matrix

    rng = np.random.RandomState(0)
    gt = np.zeros((2, 17, 3), np.float32)
    gt[..., :2] = rng.uniform(20, 80, (2, 17, 2))
    gt[..., 2] = 1.0
    gt[1, :5, 2] = 0.0            # second instance: 5 unlabelled joints
    areas = np.array([900.0, 1600.0], np.float32)
    # exact prediction → OKS 1 on the diagonal
    m = oks_matrix(gt.copy(), gt, areas)
    assert m.shape == (2, 2)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)
    # moving an UNLABELLED gt joint's prediction changes nothing
    pred = gt.copy()
    pred[1, 0, :2] += 1000.0
    m2 = oks_matrix(pred, gt, areas)
    np.testing.assert_allclose(m2[1, 1], 1.0, atol=1e-6)
    # a labelled-joint error lowers OKS, more so for smaller areas
    pred = gt.copy()
    pred[:, 6, :2] += 15.0
    m3 = oks_matrix(pred, gt, areas)
    assert m3[0, 0] < 1.0 and m3[1, 1] < 1.0
    # same error and labelling, smaller gt area → lower OKS
    full = gt[:1]                 # instance 0: all 17 joints labelled
    perr = full.copy()
    perr[0, 6, :2] += 15.0
    small = oks_matrix(perr, full, np.array([900.0], np.float32))
    big = oks_matrix(perr, full, np.array([1600.0], np.float32))
    assert small[0, 0] < big[0, 0]


def test_average_precision_oks():
    from roadvision_tpu.detect.eval import average_precision_oks

    gt = np.zeros((3, 17, 3), np.float32)
    gt[..., 0] = np.linspace(10, 90, 3)[:, None]
    gt[..., 1] = 50.0
    gt[..., 2] = 1.0
    areas = np.full(3, 400.0, np.float32)
    conf = np.array([0.9, 0.8, 0.7], np.float32)
    assert average_precision_oks([gt.copy()], [conf], [gt],
                                 [areas]) == pytest.approx(1.0)
    # one prediction far off → AP drops
    bad = gt.copy()
    bad[2, :, :2] += 500.0
    ap = average_precision_oks([bad], [conf], [gt], [areas])
    assert 0.0 < ap < 1.0


def test_evaluate_pose_runs():
    from roadvision_tpu.detect.eval import evaluate_pose
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    det = YOLOJax({"model": "missing-pose.pt", "conf_thres": 1e-4,
                   "max_det": 8, "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32", "device": "cpu"})
    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, (2, 72, 96, 3), np.uint8)
    gt_boxes = np.zeros((2, 3, 4), np.float32)
    gt_boxes[..., 2:] = 30.0
    gt_kpts = np.zeros((2, 3, 17, 3), np.float32)
    gt_kpts[..., :2] = 15.0
    gt_kpts[..., 2] = 1.0
    gt_mask = np.ones((2, 3), bool)
    res = evaluate_pose(det, images, gt_boxes, gt_kpts, gt_mask,
                        oks_thresholds=(0.5, 0.75))
    assert set(res) == {"oks_mAP@0.5", "oks_mAP@0.75"}
    assert all(0.0 <= v <= 1.0 for v in res.values())
