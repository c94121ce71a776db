"""YOLOv8-seg: torch-twin parity, mask composition oracle, importer.

The segment task is a beyond-reference model family (the reference
wrapper loads detection checkpoints only,
src/detect/yolo_ultralytics.py:16). Parity strategy mirrors
tests/test_torch_parity.py: the SAME param pytree through two
independently written implementations — jax NHWC einsum-deconv
(roadvision_tpu/models/yolo/yolov8_seg.py) vs torch NCHW
ConvTranspose2d (tests/oracles/torch_yolo.py:v8_seg_forward) — plus the
ultralytics-style ``process_mask`` twin for the composition/crop math.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import weights, yolov8_seg
from roadvision_tpu.ops.masks import compose_masks, mask_iou, paste_masks

from tests.oracles import torch_yolo


def _max_err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def test_seg_spec_channels():
    s = yolov8_seg.seg_spec("n")
    assert s["nm"] == 32
    assert s["npr"] == 64          # 256 × width 0.25
    assert s["c4"] == max(s["ch_det"][0] // 4, 32)
    assert yolov8_seg.seg_spec("l")["npr"] == 256


def test_seg_forward_matches_torch():
    params = yolov8_seg.init_params_seg(jax.random.PRNGKey(7), "n")
    rng = np.random.RandomState(0)
    x = rng.rand(2, 128, 128, 3).astype(np.float32)

    jb, js, jc, jp = yolov8_seg.forward_seg(params, jnp.asarray(x),
                                            size="n", nc=80,
                                            dtype=jnp.float32)
    tb, ts, tc, tp = torch_yolo.v8_seg_forward(params, x)

    assert jc.shape == tc.shape == (2, 16 * 16 + 8 * 8 + 4 * 4, 32)
    assert jp.shape == tp.shape == (2, 32, 32, 32)  # nm protos at in/4
    assert _max_err(jb, tb) < 0.05
    assert _max_err(js, ts) < 2e-3
    assert _max_err(jc, tc) < 2e-3, _max_err(jc, tc)
    assert _max_err(jp, tp) < 2e-3, _max_err(jp, tp)


def test_deconv_upsample_matches_torch():
    """The einsum+interleave ConvTranspose(k=2,s=2) formulation equals
    torch's conv_transpose2d tap-for-tap."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)
    w = rng.randn(2, 2, 6, 4).astype(np.float32)   # HWIO
    b = rng.randn(4).astype(np.float32)

    jy = yolov8_seg._upsample_deconv2(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b))
    ty = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(2, 3, 0, 1).copy()),
        torch.from_numpy(b), stride=2).permute(0, 2, 3, 1).numpy()
    assert jy.shape == ty.shape == (2, 10, 14, 4)
    assert _max_err(jy, ty) < 1e-4


def test_compose_masks_matches_twin():
    rng = np.random.RandomState(5)
    coeffs = rng.randn(1, 6, 32).astype(np.float32)
    protos = rng.randn(1, 40, 40, 32).astype(np.float32)
    boxes = np.array([[[8, 12, 100, 120], [0, 0, 160, 160],
                       [40, 40, 41, 41], [150, 150, 160, 160],
                       [0, 0, 0, 0], [10, 10, 30, 30]]], np.float32)
    valid = np.array([[True, True, True, True, True, False]])

    jm = np.asarray(compose_masks(jnp.asarray(coeffs), jnp.asarray(protos),
                                  jnp.asarray(boxes), jnp.asarray(valid)))
    tm = torch_yolo.process_mask(coeffs[0], protos[0], boxes[0])

    assert jm.shape == (1, 6, 40, 40)
    assert _max_err(jm[0, :5], tm[:5]) < 1e-5
    assert jm[0, 5].max() == 0.0            # invalid slot zeroed
    # degenerate box (0,0,0,0) has empty crop
    assert jm[0, 4].max() == 0.0


def test_infer_masks_end_to_end_match_twin():
    """uint8 frame → rect letterbox → seg forward → NMS → coefficient
    gather → compose: the production detector vs the torch twin chain."""
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    params = yolov8_seg.init_params_seg(jax.random.PRNGKey(21), "n")
    rng = np.random.RandomState(6)
    frame = rng.randint(0, 256, (90, 160, 3), dtype=np.uint8)

    det = YOLOJax({"model": "yolov8n-seg.pt", "conf_thres": 2e-5,
                   "iou_thres": 0.7, "max_det": 12, "imgsz": 160,
                   "compute_dtype": "float32", "device": "cpu"})
    assert det.task == "segment"
    det.set_params(params)
    dets = det.infer(frame)
    assert len(dets) > 0

    timgs, tratio, tpad = torch_yolo.letterbox(frame[None], 160, auto=True)
    tb, ts, tc, tp = torch_yolo.v8_seg_forward(params, timgs)
    nb, nconf, ncls, nidx = torch_yolo.greedy_nms(
        tb[0], ts[0], conf_thres=2e-5, iou_thres=0.7, max_det=12,
        pre_topk=300, return_idx=True)
    tm = torch_yolo.process_mask(tc[0][nidx], tp[0], nb)
    nb_r = torch_yolo.unletterbox_boxes(nb, tratio, tpad, (90, 160))

    assert len(dets) == len(nb)
    for i, d in enumerate(dets):
        got = np.array([d.x1, d.y1, d.x2, d.y2])
        assert np.abs(got - nb_r[i]).max() < 0.1
        assert d.mask is not None and d.mask.shape == tm[i].shape
        assert _max_err(d.mask, tm[i]) < 1e-3, i


def test_paste_masks_geometry():
    """Un-letterbox at prototype scale: a rectangle in the letterbox
    content band maps onto the right source-frame pixels (IoU vs the
    analytic box mask); invalid slots come back all-zero."""
    mh, mw = 40, 40   # 160×160 letterbox canvas → proto 40×40
    oh, ow = 80, 160  # source: ratio 1.0, pad (0, 40) — top/bottom bars
    # content band: letterbox y ∈ [40, 120) ↔ source y ∈ [0, 80)
    masks = np.zeros((2, mh, mw), np.float32)
    masks[0, 12:18, 8:24] = 1.0   # letterbox y [48,72) → source y [8,32)
    valid = np.array([True, False])

    out = paste_masks(masks, valid, 1.0, (0.0, 40.0), (oh, ow))
    assert out.shape == (2, oh, ow) and out.dtype == bool
    assert out[1].sum() == 0
    want = np.zeros((oh, ow), bool)
    want[8:32, 32:96] = True
    assert mask_iou(out[0], want) > 0.85

    # soft mode returns float32 in [0, 1]
    soft = paste_masks(masks, valid, 1.0, (0.0, 40.0), (oh, ow),
                       thresh=None)
    assert soft.dtype == np.float32
    assert 0.0 <= soft.min() and soft.max() <= 1.0


def test_npz_roundtrip_seg(tmp_path):
    """export_npz/import_npz preserve the Segment subtrees (cv4 lists,
    proto dict incl. the deconv weight)."""
    ref = yolov8_seg.init_params_seg(jax.random.PRNGKey(1), "n")
    path = tmp_path / "seg.npz"
    weights.export_npz(ref, path)
    back, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "v8" and size == "n"
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(ref)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onnx_roundtrip_seg(tmp_path):
    """export_onnx → load_params restores the Segment head numerically
    (fused-carrier ONNX layout, IOHW ConvTranspose both directions)."""
    from roadvision_tpu.models.yolo import onnx_io

    ref = yolov8_seg.init_params_seg(jax.random.PRNGKey(4), "n")
    path = tmp_path / "seg.onnx"
    onnx_io.export_onnx(ref, path)
    back, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "v8" and size == "n"
    assert "cv4" in back["22"] and "proto" in back["22"]
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(ref)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_draw_masks_blends_inside_only():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.vis import draw_masks

    img = np.full((40, 60, 3), 100, np.uint8)
    mask = np.zeros((40, 60), bool)
    mask[10:20, 15:30] = True
    d = Detection(15, 10, 30, 20, 0.9, 2, "car", mask=mask)
    draw_masks(img, [d], alpha=0.5)
    assert (img[mask] != 100).any()            # blended inside
    assert (img[~mask] == 100).all()           # untouched outside
    # proto-res float mask + lb meta path
    img2 = np.full((40, 60, 3), 100, np.uint8)
    small = np.zeros((16, 16), np.float32)
    small[4:8, 4:8] = 1.0
    d2 = Detection(0, 0, 10, 10, 0.9, 2, "car", mask=small)
    draw_masks(img2, [d2], lb_meta=(1.0, (0.0, 0.0)), alpha=0.5)
    assert (img2 != 100).any()


def test_detect_cli_segment_task(tmp_path):
    """tools/detect.py --task segment writes mask-overlaid frames."""
    from tools.detect import main as detect_main

    out = tmp_path / "seg_out"
    rc = detect_main(["--source", "synthetic", "--frames", "2",
                      "--out", str(out), "--weights", "yolov8n-seg.pt",
                      "--task", "segment", "--imgsz", "96",
                      "--conf", "1e-4", "--max-det", "8",
                      "--dtype", "float32", "--json"])
    assert rc == 0
    frames = sorted(out.glob("frame_*.jpg"))
    assert len(frames) == 2
    import json
    recs = json.loads((out / "detections.json").read_text())
    assert len(recs) == 2


def test_letterbox_meta_matches_device_scalars():
    from roadvision_tpu.ops.letterbox import (letterbox_meta,
                                              letterbox_rect_u8,
                                              letterbox_u8)
    for hw in ((90, 160), (270, 480), (97, 153), (320, 320)):
        frames = jnp.zeros((1, hw[0], hw[1], 3), jnp.uint8)
        for rect in (True, False):
            if rect:
                _, r, p = letterbox_rect_u8(frames, size=160)
            else:
                _, r, p = letterbox_u8(frames, size=160)
            hr, hp = letterbox_meta(hw[0], hw[1], size=160, rect=rect)
            assert float(r) == pytest.approx(hr), (hw, rect)
            assert tuple(np.asarray(p)) == hp, (hw, rect)


def test_engine_segment_task_masks():
    """The fused engine path (detect.task via config) produces the same
    masks as the standalone detector, and Detections carry them."""
    from roadvision_tpu.runtime.engine import PipelineEngine

    params = yolov8_seg.init_params_seg(jax.random.PRNGKey(9), "n")
    cfg = {
        "tpu": {"batch_size": 2},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "yolov8n-seg.pt",
                   "device": "cpu", "max_det": 8, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": False},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    eng.detector.set_params(params)
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.mask is not None for d in dets)

    direct = eng.detector.infer_batch(frames)
    assert direct.masks is not None
    # engine masks equal the standalone detector's (same step math)
    fi = 0
    eng_masks = [d.mask for d in res[fi].detections]
    v = direct.valid[fi]
    np.testing.assert_allclose(np.stack(eng_masks),
                               direct.masks[fi][v], atol=1e-5)
    # lb_meta matches what the detector recorded
    r, p = eng.lb_meta(72, 96)
    dr, dp = eng.detector.last_letterbox_meta()
    assert r == pytest.approx(dr) and tuple(p) == tuple(dp)


def test_mask_ap_metrics():
    from roadvision_tpu.detect.eval import (average_precision_masks,
                                            mask_iou_matrix)

    a = np.zeros((2, 8, 8), bool)
    a[0, :4, :4] = True          # 16 px
    a[1, 4:, 4:] = True
    b = np.zeros((2, 8, 8), bool)
    b[0, :4, :4] = True          # identical to a0
    b[1, :4, 2:6] = True         # half-row overlap with a0: 8 px
    m = mask_iou_matrix(a, b)
    assert m.shape == (2, 2)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(8 / 24)
    assert m[1, 0] == 0.0

    # perfect single-image predictions → AP 1.0
    ap = average_precision_masks([a], [np.array([0.9, 0.8])], [a.copy()])
    assert ap == pytest.approx(1.0)
    # one spurious high-confidence prediction drags precision
    extra = np.zeros((3, 8, 8), bool)
    extra[:2] = a
    extra[2, 2:4, 6:8] = True
    ap2 = average_precision_masks([extra],
                                  [np.array([0.9, 0.8, 0.95])],
                                  [a.copy()])
    assert ap2 < 1.0
    # empty gt → 0
    assert average_precision_masks([a], [np.array([0.9, 0.8])],
                                   [np.zeros((0, 8, 8), bool)]) == 0.0


def test_evaluate_segmenter_runs():
    from roadvision_tpu.detect.eval import evaluate_segmenter
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    det = YOLOJax({"model": "yolov8n-seg.pt", "device": "cpu",
                   "imgsz": 96, "max_det": 8, "conf_thres": 1e-4,
                   "compute_dtype": "float32"})
    rng = np.random.default_rng(1)
    images = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    gm0 = np.zeros((1, 72, 96), bool)
    gm0[0, 10:30, 10:40] = True
    res = evaluate_segmenter(det, images, [gm0, np.zeros((0, 72, 96),
                                                         bool)],
                             [np.array([2]), np.zeros((0,), np.int64)],
                             iou_thresholds=(0.5, 0.75))
    assert set(res) == {"mask_mAP@0.5", "mask_mAP@0.75"}
    assert all(0.0 <= v <= 1.0 for v in res.values())


def test_int8_segment_path_runs():
    """Quantized conv path composes with the Segment head: cv4/proto
    convs quantize (the deconv stays float), masks still produced and
    close to the float path (int8 is lossy — loose tolerance on mask
    probabilities)."""
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    params = yolov8_seg.init_params_seg(jax.random.PRNGKey(5), "n")
    frame = np.random.default_rng(2).integers(
        0, 255, (72, 96, 3)).astype(np.uint8)
    base = {"model": "yolov8n-seg.pt", "imgsz": 96, "max_det": 6,
            "conf_thres": 1e-4, "device": "cpu"}

    d32 = YOLOJax(dict(base, compute_dtype="float32"))
    d32.set_params(jax.tree_util.tree_map(jnp.array, params))
    b32 = d32.infer_batch(frame[None])

    d8 = YOLOJax(dict(base, compute_dtype="int8"))
    assert d8.task == "segment"
    from roadvision_tpu.models.yolo.quant import quantize_params
    d8.set_params(quantize_params(
        jax.tree_util.tree_map(jnp.array, params)))
    b8 = d8.infer_batch(frame[None])
    assert b8.masks is not None and b8.masks.shape == b32.masks.shape
    assert np.isfinite(b8.masks).all()
    assert 0.0 <= b8.masks.min() and b8.masks.max() <= 1.0


def test_sharded_streams_carry_masks():
    """The segment task survives the stream-sharded multi-chip path:
    the vmapped/sharded step emits the 8th masks output per stream,
    bit-identical to per-stream single-device runs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from roadvision_tpu.config import DEFAULTS, merge
    from roadvision_tpu.parallel import make_mesh, make_sharded_stream_step
    from roadvision_tpu.runtime import PipelineEngine
    from roadvision_tpu.track.sort_tpu import init_state

    s, b, h, w = 8, 2, 72, 96
    cfg = merge(DEFAULTS, {
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing-seg.pt",
                   "device": "cpu", "max_det": 6, "imgsz": 96,
                   "classes_keep": [], "conf_thres": 1e-4,
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
        "tpu": {"batch_size": b, "track_slots": 8},
    })
    eng = PipelineEngine(cfg)
    assert eng.detector.task == "segment"
    mesh = make_mesh(8, model_parallel=1)
    step, init_states = make_sharded_stream_step(eng, (b, h, w), mesh)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (s, b, h, w, 3), dtype=np.uint8)
    ts = np.arange(s * b, dtype=np.float32).reshape(s, b) / 30.0

    outs, _ = step(eng.detector.params, init_states(s),
                   jnp.asarray(frames), jnp.asarray(ts))
    outs = jax.tree_util.tree_map(np.asarray, outs)
    assert len(outs) == 8
    assert outs[7].shape[:2] == (s, b)

    raw = jax.jit(eng.build_raw_step((b, h, w), want_proc=False))
    for si in (0, 5):
        st = init_state(eng.track_slots)
        _, ref, _ = raw(eng.detector.params, st,
                        jnp.asarray(frames[si]), jnp.asarray(ts[si]))
        np.testing.assert_array_equal(outs[7][si], np.asarray(ref[7]))


def test_state_dict_import_seg():
    """Synthetic ultralytics-style -seg state dict (BN pairs, IOHW
    ConvTranspose) → pytree: structure matches random init, the task is
    detected, and the forward agrees with the torch twin run on the
    imported tree."""
    torch = pytest.importorskip("torch")
    ref = yolov8_seg.init_params_seg(jax.random.PRNGKey(0), "n")
    g = torch.Generator().manual_seed(11)

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

    def add_c2f(prefix, tree):
        add_convbn(f"{prefix}.cv1", tree["cv1"])
        add_convbn(f"{prefix}.cv2", tree["cv2"])
        for j, m in enumerate(tree["m"]):
            add_convbn(f"{prefix}.m.{j}.cv1", m["cv1"])
            add_convbn(f"{prefix}.m.{j}.cv2", m["cv2"])

    for i in ("0", "1", "3", "5", "7", "16", "19"):
        add_convbn(f"model.{i}", ref[i])
    for i in ("2", "4", "6", "8", "12", "15", "18", "21"):
        add_c2f(f"model.{i}", ref[i])
    add_convbn("model.9.cv1", ref["9"]["cv1"])
    add_convbn("model.9.cv2", ref["9"]["cv2"])
    for branch in ("cv2", "cv3", "cv4"):
        for lvl in range(3):
            stages = ref["22"][branch][lvl]
            add_convbn(f"model.22.{branch}.{lvl}.0", stages[0])
            add_convbn(f"model.22.{branch}.{lvl}.1", stages[1])
            add_plain(f"model.22.{branch}.{lvl}.2", stages[2])
    pr = ref["22"]["proto"]
    add_convbn("model.22.proto.cv1", pr["cv1"])
    npr = pr["up_w"].shape[2]
    sd["model.22.proto.upsample.weight"] = torch.randn(
        npr, npr, 2, 2, generator=g) * 0.05
    sd["model.22.proto.upsample.bias"] = torch.randn(npr,
                                                     generator=g) * 0.01
    add_convbn("model.22.proto.cv2", pr["cv2"])
    add_convbn("model.22.proto.cv3", pr["cv3"])

    assert weights.detect_task(sd) == "segment"
    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and arch == "v8" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)

    # the imported ConvTranspose weight drives the jax deconv exactly
    # like torch drives the ORIGINAL state-dict tensor (IOHW→HWIO
    # transpose validated against torch itself, not round-tripped)
    import torch.nn.functional as F
    xin = torch.randn(1, npr, 6, 6, generator=g)
    ty = F.conv_transpose2d(xin, sd["model.22.proto.upsample.weight"],
                            sd["model.22.proto.upsample.bias"], stride=2)
    jy = yolov8_seg._upsample_deconv2(
        jnp.asarray(xin.numpy().transpose(0, 2, 3, 1)),
        params["22"]["proto"]["up_w"], params["22"]["proto"]["up_b"])
    assert _max_err(jy, ty.permute(0, 2, 3, 1).numpy()) < 1e-4

    rng = np.random.RandomState(2)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    jb, js, jc, jp = yolov8_seg.forward_seg(params, jnp.asarray(x),
                                            size="n", nc=80,
                                            dtype=jnp.float32)
    tb, ts, tc, tp = torch_yolo.v8_seg_forward(params, x)
    assert _max_err(jc, tc) < 2e-3
    assert _max_err(jp, tp) < 2e-3
