"""YOLOv8-OBB: ProbIoU oracle, rotated NMS greedy parity, decode
oracle, torch-twin forward parity, importer, end-to-end, engine, vis.

OBB is a beyond-reference model family (the reference wrapper serves
axis-aligned detection only, src/detect/yolo_ultralytics.py:16); same
parity strategy as the seg/cls/pose families
(tests/oracles/torch_yolo.py:v8_obb_forward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import weights, yolov8_obb
from roadvision_tpu.ops import obb as obb_ops

from tests.oracles import torch_yolo


def _max_err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def _rand_rboxes(rng, n, span=100.0):
    rb = np.zeros((n, 5), np.float32)
    rb[:, :2] = rng.uniform(10, span, (n, 2))
    rb[:, 2:4] = rng.uniform(5, 40, (n, 2))
    rb[:, 4] = rng.uniform(-np.pi / 4, 3 * np.pi / 4, n)
    return rb


def test_probiou_properties():
    rng = np.random.RandomState(0)
    rb = _rand_rboxes(rng, 8)
    m = np.asarray(obb_ops.probiou_matrix(jnp.asarray(rb)))
    # identical boxes ≈ 1 (eps-clipped Bhattacharyya → ~0.9995)
    assert (np.diag(m) > 0.99).all()
    # symmetric
    np.testing.assert_allclose(m, m.T, atol=1e-5)
    # far-apart boxes ≈ 0
    far = rb.copy()
    far[:, 0] += 1e4
    pf = np.asarray(obb_ops.probiou_pairs(jnp.asarray(rb),
                                          jnp.asarray(far)))
    assert (pf < 1e-3).all()
    # rotating a non-square box away lowers the overlap
    a = np.array([50, 50, 40, 10, 0.0], np.float32)
    b_same = a.copy()
    b_rot = a.copy()
    b_rot[4] = np.pi / 2
    s_same = float(obb_ops.probiou_pairs(jnp.asarray(a), jnp.asarray(b_same)))
    s_rot = float(obb_ops.probiou_pairs(jnp.asarray(a), jnp.asarray(b_rot)))
    assert s_rot < s_same - 0.2


def test_probiou_matches_numpy_twin():
    rng = np.random.RandomState(1)
    a = _rand_rboxes(rng, 32)
    b = _rand_rboxes(rng, 32)
    ours = np.asarray(obb_ops.probiou_pairs(jnp.asarray(a),
                                            jnp.asarray(b)))
    ref = torch_yolo.probiou_np(a, b)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_rbox_corners_and_aabb():
    # axis-aligned: corners are the box corners, AABB == the box
    rb = jnp.asarray([[50.0, 40.0, 20.0, 10.0, 0.0]])
    ab = np.asarray(obb_ops.rbox_to_aabb(rb))[0]
    np.testing.assert_allclose(ab, [40, 35, 60, 45], atol=1e-5)
    # 90° rotation swaps width/height in the AABB
    rb90 = jnp.asarray([[50.0, 40.0, 20.0, 10.0, np.pi / 2]])
    ab90 = np.asarray(obb_ops.rbox_to_aabb(rb90))[0]
    np.testing.assert_allclose(ab90, [45, 30, 55, 50], atol=1e-4)
    c = np.asarray(obb_ops.rbox_corners(rb))[0]
    assert sorted(map(tuple, c.round(4))) == \
        [(40.0, 35.0), (40.0, 45.0), (60.0, 35.0), (60.0, 45.0)]


def test_nms_rotated_matches_greedy_oracle():
    rng = np.random.RandomState(2)
    for trial in range(4):
        n = 60
        rb = _rand_rboxes(rng, n, span=120.0)
        scores = rng.rand(n, 3).astype(np.float32) * 0.9
        kb, kc, kk, kv = (np.asarray(a) for a in obb_ops.nms_rotated_single(
            jnp.asarray(rb), jnp.asarray(scores), conf_thres=0.25,
            iou_thres=0.45, max_det=20, pre_topk=64))
        gb, gc, gcls, gidx = torch_yolo.greedy_nms_rotated(
            rb, scores, conf_thres=0.25, iou_thres=0.45, max_det=20,
            pre_topk=64)
        nv = int(kv.sum())
        assert nv == len(gb), trial
        np.testing.assert_allclose(kb[:nv], gb, atol=1e-4)
        np.testing.assert_allclose(kc[:nv], gc, atol=1e-6)
        np.testing.assert_array_equal(kk[:nv], gcls)


def test_decode_rbox_oracle():
    """Zero logits: DFL expectation 7.5 per side, θ = π/4; the anchor
    center maps through unchanged and w = h = 15·stride."""
    n = 16 + 4 + 1
    box_logits = np.zeros((1, n, 64), np.float32)
    angle = np.full((1, n), np.pi / 4, np.float32)
    hw = [(4, 4), (2, 2), (1, 1)]
    rb = np.asarray(yolov8_obb.decode_rbox(jnp.asarray(box_logits),
                                           jnp.asarray(angle), hw))
    # first stride-8 anchor center = (0.5, 0.5) grid → (4, 4) px
    np.testing.assert_allclose(rb[0, 0], [4.0, 4.0, 120.0, 120.0,
                                          np.pi / 4], atol=1e-4)
    # stride-16 level first anchor (index 16)
    np.testing.assert_allclose(rb[0, 16], [8.0, 8.0, 240.0, 240.0,
                                           np.pi / 4], atol=1e-4)
    # asymmetric ltrb rotates its midpoint: lt=(0,0), rb=(4,0) at θ=π/2
    bl = np.zeros((1, 1, 4, 16), np.float32)
    bl[..., :] = -1e9
    bl[0, 0, 0, 0] = 0.0   # l = 0
    bl[0, 0, 1, 0] = 0.0   # t = 0
    bl[0, 0, 2, 4] = 0.0   # r = 4
    bl[0, 0, 3, 0] = 0.0   # b = 0
    ang = np.full((1, 1), np.pi / 2, np.float32)
    rb2 = np.asarray(yolov8_obb.decode_rbox(
        jnp.asarray(bl.reshape(1, 1, 64)), jnp.asarray(ang), [(1, 1)]))
    # xf=2, yf=0 rotated 90° → (0, 2); anchor (0.5, 0.5); stride 8
    np.testing.assert_allclose(rb2[0, 0, :2], [0.5 * 8, 2.5 * 8],
                               atol=1e-3)
    np.testing.assert_allclose(rb2[0, 0, 2:4], [4 * 8, 0.0], atol=1e-3)


def test_obb_forward_matches_torch():
    params = yolov8_obb.init_params_obb(jax.random.PRNGKey(4), "n",
                                        nc=15)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 128, 128, 3).astype(np.float32)
    jr, js = yolov8_obb.forward_obb(params, jnp.asarray(x), size="n",
                                    nc=15, dtype=jnp.float32)
    tr, ts = torch_yolo.v8_obb_forward(params, x)
    n = 16 * 16 + 8 * 8 + 4 * 4
    assert jr.shape == tr.shape == (2, n, 5)
    assert _max_err(js, ts) < 2e-3
    assert _max_err(jr, tr) < 0.05, _max_err(jr, tr)


def test_obb_state_dict_import():
    torch = pytest.importorskip("torch")
    ref = yolov8_obb.init_params_obb(jax.random.PRNGKey(0), "n", nc=15)
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

    assert weights.detect_task(sd) == "obb"
    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and arch == "v8" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)


def test_infer_obb_end_to_end():
    """Production detector: rboxes on every Detection, AABB encloses
    the rotated box (clipped to the frame), twin NMS agreement."""
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    params = yolov8_obb.init_params_obb(jax.random.PRNGKey(11), "n",
                                        nc=15)
    rng = np.random.RandomState(6)
    frame = rng.randint(0, 256, (90, 160, 3), dtype=np.uint8)

    det = YOLOJax({"model": "yolov8n-obb.pt", "conf_thres": 2e-5,
                   "iou_thres": 0.7, "max_det": 10, "imgsz": 160,
                   "compute_dtype": "float32", "device": "cpu"})
    assert det.task == "obb"
    assert det.names[0] == "plane" and det.nc == 15
    det.set_params(params)
    dets = det.infer(frame)
    assert dets and all(d.rbox is not None and d.rbox.shape == (5,)
                        for d in dets)
    for d in dets:
        cx, cy = d.rbox[0], d.rbox[1]
        # the AABB contains the (clipped) center
        assert d.x1 - 1e-3 <= cx <= d.x2 + 1e-3
        assert d.y1 - 1e-3 <= cy <= d.y2 + 1e-3

    # twin chain: letterbox → twin forward → greedy rotated NMS
    timgs, tratio, tpad = torch_yolo.letterbox(frame[None], 160,
                                               auto=True)
    trb, ts = torch_yolo.v8_obb_forward(params, timgs)
    grb, gconf, gcls, _ = torch_yolo.greedy_nms_rotated(
        trb[0], ts[0], conf_thres=2e-5, iou_thres=0.7, max_det=10,
        pre_topk=300)
    grb = grb.copy()
    grb[:, 0] = np.clip((grb[:, 0] - tpad[0]) / tratio, 0, 160)
    grb[:, 1] = np.clip((grb[:, 1] - tpad[1]) / tratio, 0, 90)
    grb[:, 2:4] /= tratio
    assert len(dets) == len(grb)
    for i, d in enumerate(dets):
        assert _max_err(d.rbox, grb[i]) < 0.1, i
        assert d.conf == pytest.approx(float(gconf[i]), abs=1e-5)
        assert d.cls_id == int(gcls[i])


def test_engine_obb_task_rboxes():
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing-obb.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.detector.task == "obb"
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.rbox is not None for d in dets)
    assert all(d.mask is None and d.keypoints is None for d in dets)
    # engine rboxes equal the standalone detector's
    direct = eng.detector.infer_batch(frames)
    v = direct.valid[0]
    got = np.stack([d.rbox for d in res[0].detections])
    np.testing.assert_allclose(got, direct.rboxes[0][v], atol=1e-4)
    # ... and so do the enclosing AABBs: rounds 1-3 double-transformed
    # them in the fused step (scale_boxes applied to AABBs already
    # built from scaled rboxes) — pinned here against the standalone
    # detector path, which was always correct
    got_ab = np.stack([[d.x1, d.y1, d.x2, d.y2]
                       for d in res[0].detections])
    np.testing.assert_allclose(got_ab, direct.boxes[0][v], atol=1e-4)


def test_params_onnx_roundtrip_obb(tmp_path):
    from roadvision_tpu.models.yolo import onnx_io

    params = yolov8_obb.init_params_obb(jax.random.PRNGKey(7), "n",
                                        nc=15)
    path = tmp_path / "yolov8n-obb.onnx"
    onnx_io.export_onnx(params, path, arch="v8")
    assert weights.detect_task(onnx_io.load_onnx(path)) == "obb"
    params2, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "v8" and size == "n"
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3),
                    jnp.float32)
    o1 = yolov8_obb.forward_obb(params, x, size="n", nc=15)
    o2 = yolov8_obb.forward_obb(params2, x, size="n", nc=15)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_detect_cli_obb_task(tmp_path):
    from tools.detect import main as detect_main

    out = tmp_path / "obb_out"
    rc = detect_main(["--source", "synthetic", "--frames", "1",
                      "--out", str(out), "--weights", "yolov8n-obb.pt",
                      "--task", "obb", "--imgsz", "96",
                      "--conf", "1e-4", "--max-det", "5",
                      "--dtype", "float32"])
    assert rc == 0
    assert len(list(out.glob("frame_*.jpg"))) == 1


def test_draw_rboxes_renders():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.vis import draw_rboxes

    img = np.zeros((60, 80, 3), np.uint8)
    rb = np.array([40, 30, 30, 14, np.pi / 6], np.float32)
    d = Detection(20, 15, 60, 45, 0.9, 0, "plane", rbox=rb)
    draw_rboxes(img, [d])
    assert (img != 0).any()
    # the box is rotated: the strict AABB corner stays unpainted
    assert (img[16, 21] == 0).all()


def test_draw_overlays_dispatches_by_payload():
    """The one-call overlay draws the rotated outline for obb
    detections and the skeleton for pose detections (the driver/serve
    path after the refactor)."""
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.vis import draw_overlays

    img = np.zeros((60, 80, 3), np.uint8)
    rb = np.array([40, 30, 30, 14, np.pi / 6], np.float32)
    draw_overlays(img, [Detection(20, 15, 60, 45, 0.9, 0, "plane",
                                  rbox=rb)])
    assert (img != 0).any()
    assert (img[16, 21] == 0).all()     # rotated, not just the AABB

    img2 = np.zeros((60, 80, 3), np.uint8)
    kk = np.zeros((17, 3), np.float32)
    kk[:, 0] = np.linspace(20, 60, 17)
    kk[:, 1] = np.linspace(10, 50, 17)
    kk[:, 2] = 0.9
    draw_overlays(img2, [Detection(15, 5, 65, 55, 0.9, 0, "person",
                                   keypoints=kk)])
    assert (img2 == 255).any()          # white joint markers

    img3 = np.zeros((60, 80, 3), np.uint8)
    draw_overlays(img3, [])             # no detections: no-op
    assert not (img3 != 0).any()
