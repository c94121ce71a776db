"""Independent torch-cpu YOLOv8/v5 forward built from the SAME param dicts.

Cross-implementation oracle (VERDICT r1 missing #1): the environment has no
pretrained .pt blob and no network, so mAP parity vs ultralytics cannot be
run here. Instead this module re-implements the complete inference path —
letterbox, backbone, neck, head, DFL/anchor decode, box rescale — a second
time in torch (NCHW layout, torch ops), consuming the jax param pytree.
Agreement within fp32 tolerance catches layout, decode, and geometry bugs
that parameter-count checks cannot (reference semantics:
src/detect/yolo_ultralytics.py:26-53).

Tests-only code: torch never appears in the runtime framework.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

REG_MAX = 16
V8_STRIDES = (8, 16, 32)
V5_ANCHORS = np.array([
    [[10, 13], [16, 30], [33, 23]],
    [[30, 61], [62, 45], [59, 119]],
    [[116, 90], [156, 198], [373, 326]],
], np.float32)


def _weight(p):
    """HWIO jax kernel → torch OIHW tensor."""
    return torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())


def _bias(p):
    return torch.from_numpy(np.asarray(p["b"]).copy())


def conv(x, p, stride=1, act=True, pad=None):
    w = _weight(p)
    k = w.shape[-1]
    pad = k // 2 if pad is None else pad
    y = F.conv2d(x, w, _bias(p), stride=stride, padding=pad)
    return F.silu(y) if act else y


# --- v8 blocks --------------------------------------------------------------

def c2f(x, p, shortcut):
    y = conv(x, p["cv1"])
    c = y.shape[1] // 2
    parts = [y[:, :c], y[:, c:]]
    for mp in p["m"]:
        h = conv(conv(parts[-1], mp["cv1"]), mp["cv2"])
        parts.append(parts[-1] + h if shortcut else h)
    return conv(torch.cat(parts, dim=1), p["cv2"])


def sppf(x, p):
    y = conv(x, p["cv1"])
    y1 = F.max_pool2d(y, 5, stride=1, padding=2)
    y2 = F.max_pool2d(y1, 5, stride=1, padding=2)
    y3 = F.max_pool2d(y2, 5, stride=1, padding=2)
    return conv(torch.cat([y, y1, y2, y3], dim=1), p["cv2"])


def up2(x):
    return F.interpolate(x, scale_factor=2, mode="nearest")


def v8_forward(params, x_nhwc):
    """params: jax yolov8 pytree; x_nhwc: np float32 (B,H,W,3) in [0,1].
    Returns (boxes_xyxy (B,N,4), scores (B,N,nc)) as numpy."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = conv(x, params["0"], stride=2)
        y = conv(y, params["1"], stride=2)
        y = c2f(y, params["2"], True)
        y = conv(y, params["3"], stride=2)
        p3 = c2f(y, params["4"], True)
        y = conv(p3, params["5"], stride=2)
        p4 = c2f(y, params["6"], True)
        y = conv(p4, params["7"], stride=2)
        y = c2f(y, params["8"], True)
        p5 = sppf(y, params["9"])

        h4 = c2f(torch.cat([up2(p5), p4], 1), params["12"], False)
        o3 = c2f(torch.cat([up2(h4), p3], 1), params["15"], False)
        o4 = c2f(torch.cat([conv(o3, params["16"], stride=2), h4], 1),
                 params["18"], False)
        o5 = c2f(torch.cat([conv(o4, params["19"], stride=2), p5], 1),
                 params["21"], False)

        det = params["22"]
        boxes_l, scores_l = [], []
        for lvl, f in enumerate((o3, o4, o5)):
            b = conv(conv(f, det["cv2"][lvl][0]), det["cv2"][lvl][1])
            b = conv(b, det["cv2"][lvl][2], act=False)
            c = conv(conv(f, det["cv3"][lvl][0]), det["cv3"][lvl][1])
            c = conv(c, det["cv3"][lvl][2], act=False)
            bs, _, h, w = b.shape
            stride = float(V8_STRIDES[lvl])
            # DFL decode
            bl = b.permute(0, 2, 3, 1).reshape(bs, h * w, 4, REG_MAX)
            ltrb = (bl.softmax(-1)
                    * torch.arange(REG_MAX, dtype=torch.float32)).sum(-1)
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            pts = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1) + 0.5
            x1y1 = (pts[None] - ltrb[..., :2]) * stride
            x2y2 = (pts[None] + ltrb[..., 2:]) * stride
            boxes_l.append(torch.cat([x1y1, x2y2], -1))
            nc = c.shape[1]
            scores_l.append(
                c.permute(0, 2, 3, 1).reshape(bs, h * w, nc).sigmoid())
        return (torch.cat(boxes_l, 1).numpy(),
                torch.cat(scores_l, 1).numpy())


# --- v5 blocks --------------------------------------------------------------

def c3(x, p, shortcut):
    a = conv(x, p["cv1"])
    for mp in p["m"]:
        h = conv(conv(a, mp["cv1"]), mp["cv2"])
        a = a + h if shortcut else h
    b = conv(x, p["cv2"])
    return conv(torch.cat([a, b], 1), p["cv3"])


def v5_forward(params, x_nhwc):
    """params: jax yolov5 pytree; same I/O contract as :func:`v8_forward`."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = conv(x, params["0"], stride=2, pad=2)  # 6x6 stem
        y = conv(y, params["1"], stride=2)
        y = c3(y, params["2"], True)
        y = conv(y, params["3"], stride=2)
        p3 = c3(y, params["4"], True)
        y = conv(p3, params["5"], stride=2)
        p4 = c3(y, params["6"], True)
        y = conv(p4, params["7"], stride=2)
        y = c3(y, params["8"], True)
        p5 = sppf(y, params["9"])

        h5 = conv(p5, params["10"])
        y = c3(torch.cat([up2(h5), p4], 1), params["13"], False)
        h4 = conv(y, params["14"])
        o3 = c3(torch.cat([up2(h4), p3], 1), params["17"], False)
        o4 = c3(torch.cat([conv(o3, params["18"], stride=2), h4], 1),
                params["20"], False)
        o5 = c3(torch.cat([conv(o4, params["21"], stride=2), h5], 1),
                params["23"], False)

        boxes_l, scores_l = [], []
        for lvl, f in enumerate((o3, o4, o5)):
            raw = conv(f, params["24"]["m"][lvl], act=False)
            bs, no, h, w = raw.shape
            na = 3
            nc = no // na - 5
            stride = float((8, 16, 32)[lvl])
            sig = raw.permute(0, 2, 3, 1).reshape(bs, h, w, na, 5 + nc).sigmoid()
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            grid = torch.stack([gx, gy], -1)[None, :, :, None, :]
            anchors = torch.from_numpy(V5_ANCHORS[lvl])[None, None, None]
            xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
            wh = (sig[..., 2:4] * 2.0) ** 2 * anchors
            cls = sig[..., 5:] * sig[..., 4:5]
            boxes = torch.cat([xy - wh / 2, xy + wh / 2], -1)
            boxes_l.append(boxes.reshape(bs, -1, 4))
            scores_l.append(cls.reshape(bs, -1, nc))
        return (torch.cat(boxes_l, 1).numpy(),
                torch.cat(scores_l, 1).numpy())


# --- YOLO11 blocks (C3k2 / C2PSA / DW-separable head) ------------------------

def _gconv(x, p, stride=1, act=True):
    """Grouped conv twin: groups inferred from the kernel's input width
    (depthwise kernels arrive as HWIO (k, k, 1, C))."""
    w = _weight(p)
    k = w.shape[-1]
    g = x.shape[1] // w.shape[1]
    y = F.conv2d(x, w, _bias(p), stride=stride, padding=k // 2, groups=g)
    return F.silu(y) if act else y


def c3k(x, p):
    y1 = conv(x, p["cv1"])
    for mp in p["m"]:
        y1 = y1 + conv(conv(y1, mp["cv1"]), mp["cv2"])
    return conv(torch.cat([y1, conv(x, p["cv2"])], 1), p["cv3"])


def c3k2(x, p):
    y = conv(x, p["cv1"])
    c = y.shape[1] // 2
    parts = [y[:, :c], y[:, c:]]
    for mp in p["m"]:
        if "cv3" in mp:
            parts.append(c3k(parts[-1], mp))
        else:
            parts.append(parts[-1]
                         + conv(conv(parts[-1], mp["cv1"]), mp["cv2"]))
    return conv(torch.cat(parts, 1), p["cv2"])


def _attention_t(x, p):
    b, c, hh, ww = x.shape
    n = hh * ww
    nh = c // 64
    hd = c // nh
    kd = hd // 2
    qkv = _gconv(x, p["qkv"], act=False)
    qkv = qkv.view(b, nh, kd * 2 + hd, n)
    q, k, v = qkv.split([kd, kd, hd], dim=2)
    attn = (q.transpose(-2, -1) @ k) * (kd ** -0.5)
    attn = attn.softmax(dim=-1)
    out = (v @ attn.transpose(-2, -1)).view(b, c, hh, ww)
    out = out + _gconv(v.reshape(b, c, hh, ww), p["pe"], act=False)
    return _gconv(out, p["proj"], act=False)


def _psablock_t(x, p):
    x = x + _attention_t(x, p["attn"])
    return x + _gconv(_gconv(x, p["ffn"][0]), p["ffn"][1], act=False)


def c2psa(x, p):
    y = conv(x, p["cv1"])
    c = y.shape[1] // 2
    a, b = y[:, :c], y[:, c:]
    for mp in p["m"]:
        b = _psablock_t(b, mp)
    return conv(torch.cat([a, b], 1), p["cv2"])


def _v11_feats(params, x):
    """YOLO11 backbone + neck on an NCHW tensor → (o3, o4, o5)."""
    y = conv(x, params["0"], stride=2)
    y = conv(y, params["1"], stride=2)
    y = c3k2(y, params["2"])
    y = conv(y, params["3"], stride=2)
    p3 = c3k2(y, params["4"])
    y = conv(p3, params["5"], stride=2)
    p4 = c3k2(y, params["6"])
    y = conv(p4, params["7"], stride=2)
    y = c3k2(y, params["8"])
    y = sppf(y, params["9"])
    p5 = c2psa(y, params["10"])

    h4 = c3k2(torch.cat([up2(p5), p4], 1), params["13"])
    o3 = c3k2(torch.cat([up2(h4), p3], 1), params["16"])
    o4 = c3k2(torch.cat([conv(o3, params["17"], stride=2), h4], 1),
              params["19"])
    o5 = c3k2(torch.cat([conv(o4, params["20"], stride=2), p5], 1),
              params["22"])
    return o3, o4, o5


def _v11_det_decode(det, feats):
    """DW-separable v11 Detect head + DFL/anchor decode →
    (boxes (B,N,4), scores (B,N,nc)) torch tensors."""
    boxes_l, scores_l = [], []
    for lvl, f in enumerate(feats):
        b = conv(conv(f, det["cv2"][lvl][0]), det["cv2"][lvl][1])
        b = conv(b, det["cv2"][lvl][2], act=False)
        c = f
        for blk in det["cv3"][lvl][:2]:
            c = _gconv(_gconv(c, blk["dw"]), blk["pw"])
        c = conv(c, det["cv3"][lvl][2], act=False)
        bs, _, h, w = b.shape
        stride = float(V8_STRIDES[lvl])
        bl = b.permute(0, 2, 3, 1).reshape(bs, h * w, 4, REG_MAX)
        ltrb = (bl.softmax(-1)
                * torch.arange(REG_MAX, dtype=torch.float32)).sum(-1)
        gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        pts = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1) + 0.5
        x1y1 = (pts[None] - ltrb[..., :2]) * stride
        x2y2 = (pts[None] + ltrb[..., 2:]) * stride
        boxes_l.append(torch.cat([x1y1, x2y2], -1))
        nc = c.shape[1]
        scores_l.append(
            c.permute(0, 2, 3, 1).reshape(bs, h * w, nc).sigmoid())
    return torch.cat(boxes_l, 1), torch.cat(scores_l, 1)


def v11_forward(params, x_nhwc):
    """params: jax yolo11 pytree; x_nhwc: np float32 (B,H,W,3) in [0,1].
    Returns (boxes_xyxy (B,N,4), scores (B,N,nc)) as numpy."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        feats = _v11_feats(params, x)
        boxes, scores = _v11_det_decode(params["23"], feats)
        return boxes.numpy(), scores.numpy()


def v11_pose_forward(params, x_nhwc):
    """v11 twin of yolov8_pose.forward_pose_raw(arch="11"): the cv4
    keypoint branch on the YOLO11 feats, head layer 23."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        feats = _v11_feats(params, x)
        det = params["23"]
        boxes, scores = _v11_det_decode(det, feats)
        kraw_l, grid_l, stride_l = [], [], []
        for lvl, f in enumerate(feats):
            k = conv(conv(f, det["cv4"][lvl][0]), det["cv4"][lvl][1])
            k = conv(k, det["cv4"][lvl][2], act=False)
            bs, nk, h, w = k.shape
            kraw_l.append(k.permute(0, 2, 3, 1).reshape(bs, h * w, nk))
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            grid_l.append(torch.stack([gx.reshape(-1), gy.reshape(-1)],
                                      -1))
            stride_l.append(torch.full((h * w,), float(V8_STRIDES[lvl])))
        kraw = torch.cat(kraw_l, 1)
        grid = torch.cat(grid_l, 0)
        strides = torch.cat(stride_l, 0)
        bs, n, nk = kraw.shape
        yk = kraw.reshape(bs, n, nk // 3, 3)
        xy = (yk[..., :2] * 2.0 + grid[None, :, None, :]) \
            * strides[None, :, None, None]
        kpts = torch.cat([xy, yk[..., 2:3].sigmoid()], -1)
        return boxes.numpy(), scores.numpy(), kpts.numpy()


def v11_obb_forward(params, x_nhwc):
    """v11 twin of yolov8_obb.forward_obb_raw(arch="11"): cv4 angle
    branch + dist2rbox on the YOLO11 feats, head layer 23."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        feats = _v11_feats(params, x)
        det = params["23"]
        rb_l, scores_l = [], []
        for lvl, f in enumerate(feats):
            b = conv(conv(f, det["cv2"][lvl][0]), det["cv2"][lvl][1])
            b = conv(b, det["cv2"][lvl][2], act=False)
            c = f
            for blk in det["cv3"][lvl][:2]:
                c = _gconv(_gconv(c, blk["dw"]), blk["pw"])
            c = conv(c, det["cv3"][lvl][2], act=False)
            a = conv(conv(f, det["cv4"][lvl][0]), det["cv4"][lvl][1])
            a = conv(a, det["cv4"][lvl][2], act=False)
            bs, _, h, w = b.shape
            stride = float(V8_STRIDES[lvl])
            bl = b.permute(0, 2, 3, 1).reshape(bs, h * w, 4, REG_MAX)
            ltrb = (bl.softmax(-1)
                    * torch.arange(REG_MAX, dtype=torch.float32)).sum(-1)
            theta = (a.permute(0, 2, 3, 1).reshape(bs, h * w).sigmoid()
                     - 0.25) * np.pi
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            pts = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1) + 0.5
            lt, rb = ltrb[..., :2], ltrb[..., 2:]
            xf = (rb[..., 0] - lt[..., 0]) / 2.0
            yf = (rb[..., 1] - lt[..., 1]) / 2.0
            cos, sin = theta.cos(), theta.sin()
            cx = (xf * cos - yf * sin + pts[None, :, 0]) * stride
            cy = (xf * sin + yf * cos + pts[None, :, 1]) * stride
            wh = (lt + rb) * stride
            rb_l.append(torch.stack([cx, cy, wh[..., 0], wh[..., 1],
                                     theta], -1))
            nc = c.shape[1]
            scores_l.append(
                c.permute(0, 2, 3, 1).reshape(bs, h * w, nc).sigmoid())
        return (torch.cat(rb_l, 1).numpy(),
                torch.cat(scores_l, 1).numpy())


def v11_seg_forward(params, x_nhwc):
    """v11 twin of yolov8_seg.forward_seg_raw(arch="11"): cv4 mask
    coefficients + Proto prototypes on the YOLO11 feats, head 23."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        feats = _v11_feats(params, x)
        det = params["23"]
        boxes, scores = _v11_det_decode(det, feats)
        coeffs_l = []
        for lvl, f in enumerate(feats):
            m = conv(conv(f, det["cv4"][lvl][0]), det["cv4"][lvl][1])
            m = conv(m, det["cv4"][lvl][2], act=False)
            bs, nm, h, w = m.shape
            coeffs_l.append(m.permute(0, 2, 3, 1).reshape(bs, h * w, nm))
        coeffs = torch.cat(coeffs_l, 1)
        pr = det["proto"]
        t = conv(feats[0], pr["cv1"])
        up_w = torch.from_numpy(
            np.asarray(pr["up_w"]).transpose(2, 3, 0, 1).copy())
        up_b = torch.from_numpy(np.asarray(pr["up_b"]).copy())
        t = F.conv_transpose2d(t, up_w, up_b, stride=2)
        t = conv(t, pr["cv2"])
        protos = conv(t, pr["cv3"])
        return (boxes.numpy(), scores.numpy(), coeffs.numpy(),
                protos.permute(0, 2, 3, 1).numpy())


# --- letterbox + rescale (ultralytics geometry, torch/numpy) ----------------

def letterbox(frames_u8, size, auto=False, stride=32):
    """(B,H,W,3) uint8 BGR → letterboxed float32 RGB [0,1], ratio, pad.

    Bilinear resize via torch (align_corners=False — cv2 INTER_LINEAR
    convention), gray-114 pad, matching ultralytics LetterBox. With
    ``auto=True`` the canvas is the minimal stride-aligned rectangle
    (ultralytics' predict default — ``dw %= stride; dh %= stride``);
    otherwise a ``size``-square.
    """
    b, h, w = frames_u8.shape[:3]
    r = min(size / h, size / w)
    new_h, new_w = round(h * r), round(w * r)
    dw_total, dh_total = size - new_w, size - new_h
    if auto:
        dw_total %= stride
        dh_total %= stride
    th, tw = new_h + dh_total, new_w + dw_total
    x = torch.from_numpy(
        np.ascontiguousarray(frames_u8[..., ::-1].transpose(0, 3, 1, 2))
    ).float()
    x = F.interpolate(x, size=(new_h, new_w), mode="bilinear",
                      align_corners=False)
    dw, dh = dw_total / 2, dh_total / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    canvas = torch.full((b, 3, th, tw), 114.0)
    canvas[:, :, top:top + new_h, left:left + new_w] = x
    return (canvas.permute(0, 2, 3, 1).numpy() / 255.0,
            r, (float(left), float(top)))


def unletterbox_boxes(boxes, ratio, pad, orig_hw):
    h, w = orig_hw
    out = boxes.copy()
    out[..., [0, 2]] = (out[..., [0, 2]] - pad[0]) / ratio
    out[..., [1, 3]] = (out[..., [1, 3]] - pad[1]) / ratio
    out[..., [0, 2]] = out[..., [0, 2]].clip(0, w)
    out[..., [1, 3]] = out[..., [1, 3]].clip(0, h)
    return out


def greedy_nms(boxes, scores, conf_thres=0.25, iou_thres=0.7, max_det=100,
               pre_topk=300, classes_keep=None, return_idx=False):
    """Sequential greedy class-aware NMS in plain numpy — the torch twin's
    stand-in for the torchvision NMS that ultralytics predict runs
    (reference: src/detect/yolo_ultralytics.py:28-35). Same pinned
    semantics as roadvision_tpu.ops.nms: strict > thresholds, per-anchor
    best class, 7680 class offset, score-descending greedy, max_det cap,
    classes_keep filtered AFTER NMS/max_det. Written as the obvious
    O(K^2) sequential loop so it is an independent check of the Jacobi
    fixpoint formulation.

    Returns (boxes (M,4), conf (M,), cls (M,) int) for the M survivors,
    score-descending — variable length, the Python-list shape of the
    reference's predict output.
    """
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    conf = scores.max(-1)
    cls = scores.argmax(-1).astype(np.int64)
    cand = np.nonzero(conf > conf_thres)[0]
    # score-descending, stable for ties (top_k on the jax side is stable)
    cand = cand[np.argsort(-conf[cand], kind="stable")][:pre_topk]
    b = boxes[cand] + cls[cand, None].astype(np.float32) * 7680.0
    keep = []
    for i in range(len(cand)):
        x1, y1, x2, y2 = b[i]
        area_i = max(0.0, x2 - x1) * max(0.0, y2 - y1)
        ok = True
        for j in keep:
            jx1, jy1, jx2, jy2 = b[j]
            iw = min(x2, jx2) - max(x1, jx1)
            ih = min(y2, jy2) - max(y1, jy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            area_j = max(0.0, jx2 - jx1) * max(0.0, jy2 - jy1)
            union = area_i + area_j - inter
            if union > 0 and inter / union > iou_thres:
                ok = False
                break
        if ok:
            keep.append(i)
            if len(keep) == max_det:
                break
    sel = cand[keep]
    if classes_keep is not None:
        allowed = np.isin(cls[sel], np.asarray(list(classes_keep)))
        sel = sel[allowed]
    if return_idx:
        return boxes[sel], conf[sel], cls[sel], sel
    return boxes[sel], conf[sel], cls[sel]


# --- v8-cls twin ------------------------------------------------------------

def v8_cls_forward(params, x_nhwc):
    """Independent torch twin of yolov8_cls.forward_cls_raw: backbone
    layers 0-8 + Classify (1×1 conv → global avg pool → linear). Returns
    (B, nc) logits as numpy."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = conv(x, params["0"], stride=2)
        y = conv(y, params["1"], stride=2)
        y = c2f(y, params["2"], True)
        y = conv(y, params["3"], stride=2)
        y = c2f(y, params["4"], True)
        y = conv(y, params["5"], stride=2)
        y = c2f(y, params["6"], True)
        y = conv(y, params["7"], stride=2)
        y = c2f(y, params["8"], True)
        y = conv(y, params["9"]["conv"])
        pooled = y.mean((2, 3))
        lw = torch.from_numpy(np.asarray(params["9"]["lin_w"]).copy())
        lb = torch.from_numpy(np.asarray(params["9"]["lin_b"]).copy())
        return (pooled @ lw + lb).numpy()


# --- v8-pose twin -----------------------------------------------------------

def v8_pose_forward(params, x_nhwc):
    """Independent torch twin of yolov8_pose.forward_pose_raw: detection
    outputs + cv4 keypoint branch with the ultralytics kpts_decode
    (xy = (raw·2 + grid)·stride, sigmoid visibility). Returns
    (boxes (B,N,4), scores (B,N,nc), kpts (B,N,17,3)) as numpy."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = conv(x, params["0"], stride=2)
        y = conv(y, params["1"], stride=2)
        y = c2f(y, params["2"], True)
        y = conv(y, params["3"], stride=2)
        p3 = c2f(y, params["4"], True)
        y = conv(p3, params["5"], stride=2)
        p4 = c2f(y, params["6"], True)
        y = conv(p4, params["7"], stride=2)
        y = c2f(y, params["8"], True)
        p5 = sppf(y, params["9"])
        h4 = c2f(torch.cat([up2(p5), p4], 1), params["12"], False)
        o3 = c2f(torch.cat([up2(h4), p3], 1), params["15"], False)
        o4 = c2f(torch.cat([conv(o3, params["16"], stride=2), h4], 1),
                 params["18"], False)
        o5 = c2f(torch.cat([conv(o4, params["19"], stride=2), p5], 1),
                 params["21"], False)

        pose = params["22"]
        kraw_l, grid_l, stride_l = [], [], []
        for lvl, f in enumerate((o3, o4, o5)):
            k = conv(conv(f, pose["cv4"][lvl][0]), pose["cv4"][lvl][1])
            k = conv(k, pose["cv4"][lvl][2], act=False)
            bs, nk, h, w = k.shape
            kraw_l.append(k.permute(0, 2, 3, 1).reshape(bs, h * w, nk))
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            grid_l.append(torch.stack([gx.reshape(-1), gy.reshape(-1)],
                                      -1))
            stride_l.append(torch.full((h * w,),
                                       float(V8_STRIDES[lvl])))
        kraw = torch.cat(kraw_l, 1)
        grid = torch.cat(grid_l, 0)      # cell origin (anchor − 0.5)
        strides = torch.cat(stride_l, 0)
        bs, n, nk = kraw.shape
        yk = kraw.reshape(bs, n, nk // 3, 3)
        xy = (yk[..., :2] * 2.0 + grid[None, :, None, :]) \
            * strides[None, :, None, None]
        vis = yk[..., 2:3].sigmoid()
        kpts = torch.cat([xy, vis], -1)

    boxes, scores = v8_forward(params, x_nhwc)
    return boxes, scores, kpts.numpy()


# --- v8-obb twin ------------------------------------------------------------

def v8_obb_forward(params, x_nhwc):
    """Independent torch twin of yolov8_obb.forward_obb_raw: cv4 angle
    branch (θ = (sigmoid − 0.25)·π) + dist2rbox box decode (the ltrb
    midpoint rotated by θ about the anchor). Returns
    (rboxes (B,N,5) cx,cy,w,h px + θ rad, scores (B,N,nc)) as numpy."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = conv(x, params["0"], stride=2)
        y = conv(y, params["1"], stride=2)
        y = c2f(y, params["2"], True)
        y = conv(y, params["3"], stride=2)
        p3 = c2f(y, params["4"], True)
        y = conv(p3, params["5"], stride=2)
        p4 = c2f(y, params["6"], True)
        y = conv(p4, params["7"], stride=2)
        y = c2f(y, params["8"], True)
        p5 = sppf(y, params["9"])
        h4 = c2f(torch.cat([up2(p5), p4], 1), params["12"], False)
        o3 = c2f(torch.cat([up2(h4), p3], 1), params["15"], False)
        o4 = c2f(torch.cat([conv(o3, params["16"], stride=2), h4], 1),
                 params["18"], False)
        o5 = c2f(torch.cat([conv(o4, params["19"], stride=2), p5], 1),
                 params["21"], False)

        det = params["22"]
        rb_l, scores_l = [], []
        for lvl, f in enumerate((o3, o4, o5)):
            b = conv(conv(f, det["cv2"][lvl][0]), det["cv2"][lvl][1])
            b = conv(b, det["cv2"][lvl][2], act=False)
            c = conv(conv(f, det["cv3"][lvl][0]), det["cv3"][lvl][1])
            c = conv(c, det["cv3"][lvl][2], act=False)
            a = conv(conv(f, det["cv4"][lvl][0]), det["cv4"][lvl][1])
            a = conv(a, det["cv4"][lvl][2], act=False)
            bs, _, h, w = b.shape
            stride = float(V8_STRIDES[lvl])
            bl = b.permute(0, 2, 3, 1).reshape(bs, h * w, 4, REG_MAX)
            ltrb = (bl.softmax(-1)
                    * torch.arange(REG_MAX, dtype=torch.float32)).sum(-1)
            theta = (a.permute(0, 2, 3, 1).reshape(bs, h * w).sigmoid()
                     - 0.25) * np.pi
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            pts = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1) + 0.5
            lt, rb = ltrb[..., :2], ltrb[..., 2:]
            xf = (rb[..., 0] - lt[..., 0]) / 2.0
            yf = (rb[..., 1] - lt[..., 1]) / 2.0
            cos, sin = theta.cos(), theta.sin()
            cx = (xf * cos - yf * sin + pts[None, :, 0]) * stride
            cy = (xf * sin + yf * cos + pts[None, :, 1]) * stride
            wh = (lt + rb) * stride
            rb_l.append(torch.stack([cx, cy, wh[..., 0], wh[..., 1],
                                     theta], -1))
            nc = c.shape[1]
            scores_l.append(
                c.permute(0, 2, 3, 1).reshape(bs, h * w, nc).sigmoid())
        return (torch.cat(rb_l, 1).numpy(),
                torch.cat(scores_l, 1).numpy())


def probiou_np(rb1, rb2):
    """Scalar/broadcast numpy ProbIoU (the verification twin of
    ops.obb.probiou_pairs — same closed-form Bhattacharyya/Hellinger
    construction, written against the formula independently)."""
    rb1, rb2 = np.asarray(rb1, np.float64), np.asarray(rb2, np.float64)

    def cov(rb):
        a, b = rb[..., 2] ** 2 / 12.0, rb[..., 3] ** 2 / 12.0
        c, s = np.cos(rb[..., 4]), np.sin(rb[..., 4])
        return (a * c * c + b * s * s, a * s * s + b * c * c,
                (a - b) * c * s)

    eps = 1e-7
    x1, y1 = rb1[..., 0], rb1[..., 1]
    x2, y2 = rb2[..., 0], rb2[..., 1]
    a1, b1, c1 = cov(rb1)
    a2, b2, c2 = cov(rb2)
    den = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2
    t1 = ((a1 + a2) * (y1 - y2) ** 2
          + (b1 + b2) * (x1 - x2) ** 2) / (den + eps) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / (den + eps) * 0.5
    d1 = np.maximum(a1 * b1 - c1 ** 2, 0.0)
    d2 = np.maximum(a2 * b2 - c2 ** 2, 0.0)
    t3 = np.log(den / (4.0 * np.sqrt(d1 * d2) + eps) + eps) * 0.5
    bd = np.clip(t1 + t2 + t3, eps, 100.0)
    return 1.0 - np.sqrt(1.0 - np.exp(-bd) + eps)


def greedy_nms_rotated(rboxes, scores, conf_thres=0.25, iou_thres=0.7,
                       max_det=100, pre_topk=300):
    """Sequential greedy rotated NMS oracle (exact semantics of
    ops.obb.nms_rotated_single: strict > thresholds, class-aware via
    center offsets, score-descending)."""
    conf = scores.max(-1)
    cls = scores.argmax(-1)
    cand = np.nonzero(conf > conf_thres)[0]
    cand = cand[np.argsort(-conf[cand], kind="stable")][:pre_topk]
    kept = []
    for i in cand:
        ok = True
        for j in kept:
            if cls[j] != cls[i]:
                continue
            if probiou_np(rboxes[j], rboxes[i]) > iou_thres:
                ok = False
                break
        if ok:
            kept.append(int(i))
    kept = kept[:max_det]
    return (rboxes[kept], conf[kept], cls[kept], np.asarray(kept, int))


# --- v8-seg twin ------------------------------------------------------------

def v8_seg_forward(params, x_nhwc):
    """Independent torch twin of yolov8_seg.forward_seg_raw: detection
    outputs + cv4 mask coefficients + Proto prototypes (ConvTranspose2d
    upsample, the ultralytics Segment/Proto formulation). Returns
    (boxes (B,N,4), scores (B,N,nc), coeffs (B,N,nm),
    protos (B,mh,mw,nm)) as numpy."""
    x = torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = conv(x, params["0"], stride=2)
        y = conv(y, params["1"], stride=2)
        y = c2f(y, params["2"], True)
        y = conv(y, params["3"], stride=2)
        p3 = c2f(y, params["4"], True)
        y = conv(p3, params["5"], stride=2)
        p4 = c2f(y, params["6"], True)
        y = conv(p4, params["7"], stride=2)
        y = c2f(y, params["8"], True)
        p5 = sppf(y, params["9"])
        h4 = c2f(torch.cat([up2(p5), p4], 1), params["12"], False)
        o3 = c2f(torch.cat([up2(h4), p3], 1), params["15"], False)
        o4 = c2f(torch.cat([conv(o3, params["16"], stride=2), h4], 1),
                 params["18"], False)
        o5 = c2f(torch.cat([conv(o4, params["19"], stride=2), p5], 1),
                 params["21"], False)

        seg = params["22"]
        coeffs_l = []
        for lvl, f in enumerate((o3, o4, o5)):
            m = conv(conv(f, seg["cv4"][lvl][0]), seg["cv4"][lvl][1])
            m = conv(m, seg["cv4"][lvl][2], act=False)
            bs, nm, h, w = m.shape
            coeffs_l.append(m.permute(0, 2, 3, 1).reshape(bs, h * w, nm))
        coeffs = torch.cat(coeffs_l, 1)

        pr = seg["proto"]
        t = conv(o3, pr["cv1"])
        up_w = torch.from_numpy(  # HWIO → torch ConvTranspose (in,out,kh,kw)
            np.asarray(pr["up_w"]).transpose(2, 3, 0, 1).copy())
        up_b = torch.from_numpy(np.asarray(pr["up_b"]).copy())
        t = F.conv_transpose2d(t, up_w, up_b, stride=2)
        t = conv(t, pr["cv2"])
        protos = conv(t, pr["cv3"])  # (B, nm, mh, mw)

    # reuse the detect decode for boxes/scores
    boxes, scores = v8_forward(params, x_nhwc)
    return (boxes, scores, coeffs.numpy(),
            protos.permute(0, 2, 3, 1).numpy())


def process_mask(coeffs, protos, boxes_lb, stride=4.0):
    """Twin of ops.masks.compose_masks for ONE image, written the
    ultralytics way (torch): masks = (coeffs @ protos.view(nm,-1))
    .sigmoid(), cropped to boxes downscaled by ``stride``.
    coeffs (M, nm), protos (mh, mw, nm), boxes_lb (M, 4) letterbox px.
    Returns (M, mh, mw) float32."""
    c = torch.from_numpy(np.asarray(coeffs, np.float32))
    p = torch.from_numpy(np.asarray(protos, np.float32)).permute(2, 0, 1)
    nm, mh, mw = p.shape
    m = (c @ p.reshape(nm, -1)).sigmoid().reshape(-1, mh, mw)
    bb = torch.from_numpy(np.asarray(boxes_lb, np.float32)) / stride
    r = torch.arange(mw, dtype=torch.float32)[None, None, :]
    cc = torch.arange(mh, dtype=torch.float32)[None, :, None]
    x1, y1, x2, y2 = (bb[:, i][:, None, None] for i in range(4))
    keep = (r >= x1) & (r < x2) & (cc >= y1) & (cc < y2)
    return (m * keep).numpy()
