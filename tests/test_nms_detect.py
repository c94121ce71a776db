"""Fixed-shape NMS vs a scalar oracle + the full detector backend."""
import numpy as np
import pytest

from roadvision_tpu.detect import Detection, build_detector
from roadvision_tpu.ops.letterbox import letterbox_u8, scale_boxes
from roadvision_tpu.ops.nms import nms_single


def _nms_oracle(boxes, scores, conf_thres, iou_thres, max_det):
    """Scalar greedy NMS with torchvision semantics (suppress IoU > thresh),
    class-aware via max-coordinate offset."""
    conf = scores.max(-1)
    cls = scores.argmax(-1)
    idx = [i for i in np.argsort(-conf, kind="stable") if conf[i] > conf_thres]
    out = []
    offs = boxes + cls[:, None] * 7680.0

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua if ua > 0 else 0.0

    for i in idx:
        if all(iou(offs[i], offs[j]) <= iou_thres for j in out):
            out.append(i)
        if len(out) >= max_det:
            break
    return [(tuple(boxes[i]), float(conf[i]), int(cls[i])) for i in out]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    n, nc = 60, 6
    xy = rng.uniform(0, 500, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = (rng.dirichlet(np.ones(nc), n) * rng.uniform(0, 1, (n, 1))
              ).astype(np.float32)
    b, c, k, v = (np.asarray(a) for a in nms_single(
        boxes, scores, conf_thres=0.1, iou_thres=0.5, max_det=20,
        pre_topk=64))
    got = [(tuple(b[i]), float(c[i]), int(k[i])) for i in range(20) if v[i]]
    want = _nms_oracle(boxes, scores, 0.1, 0.5, 20)
    assert len(got) == len(want)
    for (gb, gc, gk), (wb, wc, wk) in zip(got, want):
        assert gk == wk and abs(gc - wc) < 1e-6
        np.testing.assert_allclose(gb, wb, atol=1e-4)


def test_nms_classes_keep_filters_after_suppression():
    boxes = np.array([[0, 0, 10, 10], [100, 0, 110, 10]], np.float32)
    scores = np.zeros((2, 8), np.float32)
    scores[0, 2] = 0.9   # car
    scores[1, 4] = 0.8   # class 4, filtered
    b, c, k, v = nms_single(boxes, scores, conf_thres=0.25, iou_thres=0.7,
                            max_det=5, pre_topk=8, classes_keep=(0, 2))
    v = np.asarray(v)
    k = np.asarray(k)
    assert v.sum() == 1 and k[v][0] == 2


def test_nms_same_spot_different_class_both_survive():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (2, 1))
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 1] = 0.8
    _, _, _, v = nms_single(boxes, scores, conf_thres=0.2, iou_thres=0.5,
                            max_det=4, pre_topk=4)
    assert np.asarray(v).sum() == 2  # class-aware: no cross-class suppression


def test_letterbox_ratio_pad_inverse():
    frames = np.zeros((1, 480, 640, 3), np.uint8)
    imgs, r, pad = letterbox_u8(frames, size=640)
    assert float(r) == 1.0 and imgs.shape[1:3] == (640, 640)
    np.testing.assert_allclose(np.asarray(pad), [0, 80])  # dh = 160/2
    # inverse mapping
    boxes640 = np.array([[10.0, 90.0, 110.0, 190.0]], np.float32)
    back = np.asarray(scale_boxes(boxes640, r, pad, (480, 640)))
    np.testing.assert_allclose(back[0], [10, 10, 110, 110], atol=1e-4)


def test_letterbox_downscale():
    frames = np.zeros((1, 720, 1280, 3), np.uint8)
    imgs, r, pad = letterbox_u8(frames, size=640)
    assert abs(float(r) - 0.5) < 1e-6
    np.testing.assert_allclose(np.asarray(pad), [0, 140])  # (640-360)/2


def test_letterbox_gray_padding_value():
    frames = np.full((1, 320, 640, 3), 255, np.uint8)
    imgs, r, pad = letterbox_u8(frames, size=640)
    arr = np.asarray(imgs[0])
    assert abs(arr[0, 0, 0] - 114 / 255) < 1e-6     # pad region
    assert abs(arr[320, 320, 0] - 1.0) < 1e-6       # content region


def _detector_cfg(**over):
    cfg = {"enabled": True, "backend": "ultralytics", "model": "yolov8n.pt",
           "device": "cpu", "conf_thres": 0.25, "iou_thres": 0.7,
           "max_det": 10, "classes_keep": [0, 2, 3, 5, 7], "imgsz": 160}
    cfg.update(over)
    return cfg


def test_detector_backend_runs_random_weights():
    det = build_detector(_detector_cfg())
    frame = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    out = det.infer(frame)
    assert isinstance(out, list)
    for d in out:
        assert isinstance(d, Detection)
        assert 0 <= d.x1 <= d.x2 <= 160 + 1e-3
        assert 0 <= d.y1 <= d.y2 <= 120 + 1e-3
        assert d.cls_id in (0, 2, 3, 5, 7)
    # deterministic
    out2 = det.infer(frame)
    assert len(out) == len(out2)


def test_detector_batch_shapes():
    det = build_detector(_detector_cfg())
    frames = np.random.RandomState(1).randint(0, 255, (3, 120, 160, 3),
                                              np.uint8)
    batch = det.infer_batch(frames)
    assert batch.boxes.shape == (3, 10, 4)
    assert batch.valid.shape == (3, 10)


def test_detector_unknown_backend():
    with pytest.raises(ValueError):
        build_detector(_detector_cfg(backend="tensorrt"))


def test_nms_fixpoint_matches_sequential_greedy():
    """The Jacobi-fixpoint keep mask is bit-identical to the K-step
    sequential greedy loop, including adversarial suppression chains
    (A kills B, B would have killed C, so C survives)."""
    import jax.numpy as jnp
    from roadvision_tpu.ops.nms import _iou_matrix_xyxy

    def sequential_greedy(boxes, valid, thresh):
        k = boxes.shape[0]
        iou = np.asarray(_iou_matrix_xyxy(jnp.asarray(boxes)))
        keep = valid.copy()
        for i in range(k):
            if not keep[i]:
                continue
            for j in range(i):
                if keep[j] and iou[j, i] > thresh:
                    keep[i] = False
                    break
        return keep

    rng = np.random.RandomState(0)
    # chain case: three same-class boxes, each overlapping the next
    chain = np.array([
        [0, 0, 10, 10],      # A (highest score)
        [4, 0, 14, 10],      # B: IoU(A,B) ~ 0.43 > 0.4 → suppressed
        [8, 0, 18, 10],      # C: IoU(B,C) > 0.4 but IoU(A,C) = 0.11 → kept
    ], np.float32)
    cases = [chain]
    for _ in range(5):
        n = 64
        b = np.zeros((n, 4), np.float32)
        b[:, 0] = rng.uniform(0, 100, n)
        b[:, 1] = rng.uniform(0, 100, n)
        b[:, 2] = b[:, 0] + rng.uniform(5, 40, n)
        b[:, 3] = b[:, 1] + rng.uniform(5, 40, n)
        cases.append(b)

    for boxes in cases:
        n = boxes.shape[0]
        scores = np.zeros((n, 80), np.float32)
        scores[np.arange(n), 0] = np.linspace(0.9, 0.5, n)  # score-sorted
        got_b, got_c, got_k, got_v = map(np.asarray, nms_single(
            jnp.asarray(boxes), jnp.asarray(scores), conf_thres=0.25,
            iou_thres=0.4, max_det=n, pre_topk=n))
        want_keep = sequential_greedy(boxes, np.ones(n, bool), 0.4)
        np.testing.assert_array_equal(got_v, np.sort(~want_keep,
                                                     kind="stable") == False)  # noqa: E712
        # kept boxes are exactly the greedy survivors, in score order
        np.testing.assert_allclose(got_b[got_v], boxes[want_keep], rtol=0,
                                   atol=0)
    # the chain case specifically: A and C survive, B doesn't
    scores = np.zeros((3, 80), np.float32)
    scores[np.arange(3), 0] = [0.9, 0.8, 0.7]
    _, _, _, v = map(np.asarray, nms_single(
        jnp.asarray(chain), jnp.asarray(scores), conf_thres=0.25,
        iou_thres=0.4, max_det=3, pre_topk=3))
    assert v.tolist() == [True, True, False]  # A, C kept (compacted front)
