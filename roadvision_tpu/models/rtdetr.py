"""RT-DETR (Real-Time Detection Transformer) natively in JAX.

Beyond-reference model family: the reference pins ``yolov8n.pt`` through
the ultralytics wrapper (/root/reference/src/detect/yolo_ultralytics.py:16),
and RT-DETR is the other detector family that wrapper's ecosystem ships —
the NMS-free, set-prediction alternative (Lv et al. 2023,
"DETRs Beat YOLOs on Real-time Object Detection").

Structure (the "l" scale — HGNetv2-L backbone):

  * **HGNetv2 backbone** — HGStem + 4 stages of HGBlocks (6 inner
    Light/plain convs, squeeze/excite 1×1s, ReLU), DWConv downsamples;
    taps at /8 (512ch), /16 (1024), /32 (2048).
  * **Hybrid encoder** — AIFI (one post-norm transformer encoder layer
    with 2D sincos positional embedding on the flattened /32 map; GELU
    FFN) + CCFM cross-scale fusion (lateral 1×1s, nearest ×2 upsample,
    RepC3 blocks — stored REP-FUSED as single 3×3 convs, the deploy
    form — and stride-2 3×3 downsamples). All fusion at 256 channels.
  * **Decoder** — 6 deformable-attention layers over the 3 flattened
    level maps: 300 queries selected from the encoder memory by top
    class score (IoU-aware query selection), iterative sigmoid-space
    box refinement, per-layer score/bbox heads (training aux; the last
    layer serves inference), MLP query-position embedding.

TPU-first notes: everything is fixed-shape (300 queries, static level
grids); attention and the deformable sampling reduce to einsums plus a
4-corner `take_along_axis` bilinear gather (the grid_sample analog —
gathers of (B,300,8,4) indices, not scatter); convs ride the same
NHWC/HWIO MXU path as the YOLO families with optional bf16 compute.
No NMS exists anywhere — suppression is learned, which also removes the
one sequential-ish op of the YOLO post-process.

Parity: an independent torch twin (tests/oracles/torch_rtdetr.py) runs
the same param pytree through torch ops — including F.grid_sample for
the deformable sampling — and must agree end to end
(tests/test_rtdetr.py). Checkpoint import maps the ultralytics
``rtdetr-l.pt`` state-dict layout (models/yolo/weights.py) with
conv+BN and RepConv-branch fusing; the layout is written from the
published model YAML and cannot be cross-checked against a real blob in
this offline environment (documented in ROADMAP.md).
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Decoder gather A/B candidates (VERDICT r5 #8), measured on-chip at
# 720p (autotune rtdetr sweeps, BASELINE.md decoder-lever table):
#   RVT_RTDETR_BF16_VALS — value tensor cast to bf16 before the corner
#     gathers (halves gather HBM bytes; accumulation stays f32).
#     MEASURED WINNER: 232.7 vs 218.4 fps (+6.5%), held-out mAP
#     unchanged to 10 decimals → DEFAULT ON since round 5; set =0 for
#     bit-level f32 parity with the published formulation.
#   RVT_RTDETR_PAIRED_GATHERS=1 — the 4 corner gathers per level fuse
#     into ONE take_along_axis over stacked indices (12 -> 3
#     dispatches). Measured LOSER (215.1 vs 217.8) — stays opt-in.
_BF16_VALS = os.environ.get("RVT_RTDETR_BF16_VALS", "1") == "1"
_PAIRED_GATHERS = os.environ.get("RVT_RTDETR_PAIRED_GATHERS", "0") == "1"

HD = 256          # hidden dim
NQ = 300          # queries
NH = 8            # attention heads
NDP = 4           # deformable sampling points per level
NDL = 6           # decoder layers
D_FFN = 1024      # decoder FFN dim
AIFI_FFN = 1024   # AIFI FFN dim
NL = 3            # feature levels (/8, /16, /32)

# HGNetv2-L stage table: (cm, c2, k, n_blocks, lightconv)
_L_STAGES = (
    (48, 128, 3, 1, False),
    (96, 512, 3, 1, False),
    (192, 1024, 5, 3, True),
    (384, 2048, 5, 1, True),
)
_L_STEM = (32, 48)   # (cm, c2)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(x, p, stride: int = 1, act: Optional[str] = "relu",
          pad: Optional[int] = None, dtype=jnp.float32):
    """Conv(+bias)+activation, NHWC/HWIO, groups inferred from kernel
    input width (DWConv), autopad k//2. A leaf quantized by
    models/yolo/quant.quantize_params (``w_i8``) dispatches to the
    shared int8 kernel — the conv stages (HGNetv2 backbone + the hybrid
    encoder's CCFF convs) are where RT-DETR-L's conv FLOPs live."""
    if "w_i8" in p:
        from .yolo.quant import conv_i8
        return conv_i8(x, p, stride=stride, act=act, pad=pad).astype(
            jnp.float32 if act is None else dtype)
    k = p["w"].shape[0]
    pad = k // 2 if pad is None else pad
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1] // p["w"].shape[2],
        preferred_element_type=jnp.float32)
    out = out + p["b"]
    if act == "relu":
        out = jax.nn.relu(out)
    elif act == "silu":
        out = jax.nn.silu(out)
    elif act == "gelu":
        out = jax.nn.gelu(out)
    return out.astype(dtype) if act else out.astype(jnp.float32)


def _lin(x, p):
    return x @ p["w"] + p["b"]


def _ln(x, p, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _mlp(x, layers: Sequence[Dict[str, Any]]):
    """Linear stack with ReLU between (none after the last)."""
    for i, p in enumerate(layers):
        x = _lin(x, p)
        if i + 1 < len(layers):
            x = jax.nn.relu(x)
    return x


def _mha(q, k, v, p):
    """Standard multi-head attention (B, N, HD) with separate q/k/v/out
    projections; f32 math."""
    b, nq_, _ = q.shape
    dh = HD // NH

    def split(t, pp):
        return _lin(t, pp).reshape(b, -1, NH, dh)

    qh = split(q, p["q"])
    kh = split(k, p["k"])
    vh = split(v, p["v"])
    att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(dh)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(b, nq_, HD)
    return _lin(out, p["o"])


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv(key, cin, cout, k, groups: int = 1):
    fan_in = (cin // groups) * k * k
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (k, k, cin // groups, cout), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _init_lin(key, cin, cout, zero: bool = False):
    if zero:
        return {"w": jnp.zeros((cin, cout), jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32)}
    bound = math.sqrt(1.0 / cin)
    w = jax.random.uniform(key, (cin, cout), jnp.float32, -bound, bound)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _init_ln(dim):
    return {"g": jnp.ones((dim,), jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32)}


def _init_hgblock(key, c1, cm, c2, k, n, light):
    keys = jax.random.split(key, 2 * n + 2)
    m = []
    for i in range(n):
        cin = c1 if i == 0 else cm
        if light:
            m.append({"cv1": _init_conv(keys[2 * i], cin, cm, 1),
                      "cv2": _init_conv(keys[2 * i + 1], cm, cm, k,
                                        groups=cm)})
        else:
            m.append({"cv": _init_conv(keys[2 * i], cin, cm, k)})
    return {"m": m,
            "sc": _init_conv(keys[-2], c1 + n * cm, c2 // 2, 1),
            "ec": _init_conv(keys[-1], c2 // 2, c2, 1)}


def _init_repc3(key, c1, c2, n=3):
    keys = jax.random.split(key, n + 2)
    return {"cv1": _init_conv(keys[0], c1, c2, 1),
            "cv2": _init_conv(keys[1], c1, c2, 1),
            "m": [_init_conv(keys[2 + i], c2, c2, 3) for i in range(n)]}


def _init_mha(key, dim):
    ks = jax.random.split(key, 4)
    std = math.sqrt(1.0 / dim)
    out = {}
    for name, kk in zip(("q", "k", "v", "o"), ks):
        out[name] = {"w": jax.random.normal(kk, (dim, dim)) * std,
                     "b": jnp.zeros((dim,), jnp.float32)}
    return out


def _deform_offset_init() -> jnp.ndarray:
    """The canonical MSDeformAttn bias: 8 unit directions, scaled per
    point ring — gives each head a distinct initial looking direction."""
    theta = jnp.arange(NH, dtype=jnp.float32) * (2.0 * math.pi / NH)
    grid = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)  # (NH, 2)
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, NL, NDP, 1))
    scale = jnp.arange(1, NDP + 1, dtype=jnp.float32)[None, None, :, None]
    return (grid * scale).reshape(-1)


def init_params_rtdetr(key, nc: int = 80) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nxt = lambda: next(keys)  # noqa: E731

    cm, c2 = _L_STEM
    bk: Dict[str, Any] = {"stem": {
        "s1": _init_conv(nxt(), 3, cm, 3),
        "s2a": _init_conv(nxt(), cm, cm // 2, 2),
        "s2b": _init_conv(nxt(), cm // 2, cm, 2),
        "s3": _init_conv(nxt(), cm * 2, cm, 3),
        "s4": _init_conv(nxt(), cm, c2, 1),
    }}
    stages, downs = [], []
    cin = c2
    for si, (scm, sc2, k, n_blocks, light) in enumerate(_L_STAGES):
        if si > 0:
            downs.append(_init_conv(nxt(), cin, cin, 3, groups=cin))
        blocks = []
        for bi in range(n_blocks):
            blocks.append(_init_hgblock(nxt(), cin if bi == 0 else sc2,
                                        scm, sc2, k, 6, light))
        stages.append(blocks)
        cin = sc2
    bk["stages"] = stages
    bk["down"] = downs

    c3ch, c4ch, c5ch = _L_STAGES[1][1], _L_STAGES[2][1], _L_STAGES[3][1]
    enc = {
        "proj5": _init_conv(nxt(), c5ch, HD, 1),
        "proj4": _init_conv(nxt(), c4ch, HD, 1),
        "proj3": _init_conv(nxt(), c3ch, HD, 1),
        "aifi": {"mha": _init_mha(nxt(), HD),
                 "ln1": _init_ln(HD), "ln2": _init_ln(HD),
                 "fc1": _init_lin(nxt(), HD, AIFI_FFN),
                 "fc2": _init_lin(nxt(), AIFI_FFN, HD)},
        "lat0": _init_conv(nxt(), HD, HD, 1),
        "fpn0": _init_repc3(nxt(), 2 * HD, HD),
        "lat1": _init_conv(nxt(), HD, HD, 1),
        "fpn1": _init_repc3(nxt(), 2 * HD, HD),
        "down0": _init_conv(nxt(), HD, HD, 3),
        "pan0": _init_repc3(nxt(), 2 * HD, HD),
        "down1": _init_conv(nxt(), HD, HD, 3),
        "pan1": _init_repc3(nxt(), 2 * HD, HD),
    }

    bias_cls = float(-math.log((1 - 0.01) / 0.01))
    layers = []
    for _ in range(NDL):
        off = _init_lin(nxt(), HD, NH * NL * NDP * 2, zero=True)
        off["b"] = _deform_offset_init()
        layers.append({
            "sa": _init_mha(nxt(), HD), "ln1": _init_ln(HD),
            "ca": {"off": off,
                   "attw": _init_lin(nxt(), HD, NH * NL * NDP, zero=True),
                   "val": _init_lin(nxt(), HD, HD),
                   "out": _init_lin(nxt(), HD, HD)},
            "ln2": _init_ln(HD),
            "ffn1": _init_lin(nxt(), HD, D_FFN),
            "ffn2": _init_lin(nxt(), D_FFN, HD),
            "ln3": _init_ln(HD),
        })

    def score_head():
        p = _init_lin(nxt(), HD, nc)
        p["b"] = jnp.full((nc,), bias_cls, jnp.float32)
        return p

    def bbox_head():
        return [_init_lin(nxt(), HD, HD), _init_lin(nxt(), HD, HD),
                _init_lin(nxt(), HD, 4, zero=True)]

    dec = {
        "input_proj": [_init_conv(nxt(), HD, HD, 1) for _ in range(NL)],
        "layers": layers,
        "enc_output": {"lin": _init_lin(nxt(), HD, HD), "ln": _init_ln(HD)},
        "enc_score": score_head(),
        "enc_bbox": bbox_head(),
        "dec_score": [score_head() for _ in range(NDL)],
        "dec_bbox": [bbox_head() for _ in range(NDL)],
        "qpos": [_init_lin(nxt(), 4, 2 * HD), _init_lin(nxt(), 2 * HD, HD)],
    }
    return {"backbone": bk, "enc": enc, "dec": dec}


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------

def _hg_stem(p, x, dtype):
    x = _conv(x, p["s1"], stride=2, dtype=dtype)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    x2 = _conv(xp, p["s2a"], pad=0, dtype=dtype)
    x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
    x2 = _conv(x2, p["s2b"], pad=0, dtype=dtype)
    x1 = jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max,
                               (1, 2, 2, 1), (1, 1, 1, 1),
                               [(0, 0), (0, 0), (0, 0), (0, 0)])
    x = jnp.concatenate([x1, x2], axis=-1)
    x = _conv(x, p["s3"], stride=2, dtype=dtype)
    return _conv(x, p["s4"], dtype=dtype)


def _hg_block(p, x, light, shortcut, dtype):
    ys = [x]
    for mp in p["m"]:
        if light:
            h = _conv(ys[-1], mp["cv1"], act=None, dtype=dtype)
            h = _conv(h, mp["cv2"], dtype=dtype)
        else:
            h = _conv(ys[-1], mp["cv"], dtype=dtype)
        ys.append(h)
    y = _conv(jnp.concatenate(ys, axis=-1), p["sc"], dtype=dtype)
    y = _conv(y, p["ec"], dtype=dtype)
    return y + x if shortcut else y


def hgnet_forward(bk, x, dtype=jnp.float32) -> Tuple:
    """(B, H, W, 3) [0,1] → (c3 /8, c4 /16, c5 /32) feature maps."""
    y = _hg_stem(bk["stem"], x, dtype)
    taps = []
    for si, (scm, sc2, k, n_blocks, light) in enumerate(_L_STAGES):
        if si > 0:
            y = _conv(y, bk["down"][si - 1], stride=2, act=None, dtype=dtype)
        for bi in range(n_blocks):
            y = _hg_block(bk["stages"][si][bi], y, light, bi > 0, dtype)
        taps.append(y)
    return taps[1], taps[2], taps[3]


# ---------------------------------------------------------------------------
# hybrid encoder
# ---------------------------------------------------------------------------

def _sincos_pe(w: int, h: int, dim: int = HD, temp: float = 10000.0):
    """2D sincos positional embedding — replicates the published
    formulation verbatim, including its w-major flatten (the features
    are h-major; on the square /32 grid of a square input the two
    coincide)."""
    gw = jnp.arange(w, dtype=jnp.float32)
    gh = jnp.arange(h, dtype=jnp.float32)
    grid_w, grid_h = jnp.meshgrid(gw, gh, indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temp ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w),
                            jnp.sin(out_h), jnp.cos(out_h)], axis=1)


def _aifi(p, x):
    """Post-norm transformer encoder layer on the flattened /32 map."""
    b, h, w, c = x.shape
    s = x.reshape(b, h * w, c).astype(jnp.float32)
    pos = _sincos_pe(w, h, c)
    q = k = s + pos[None]
    s = _ln(s + _mha(q, k, s, p["mha"]), p["ln1"])
    f = _lin(jax.nn.gelu(_lin(s, p["fc1"])), p["fc2"])
    s = _ln(s + f, p["ln2"])
    return s.reshape(b, h, w, c)


def _repc3(p, x, dtype):
    y = _conv(x, p["cv1"], act="silu", dtype=dtype)
    for mp in p["m"]:
        y = _conv(y, mp, act="silu", dtype=dtype)
    return y + _conv(x, p["cv2"], act="silu", dtype=dtype)


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def encoder_forward(enc, c3, c4, c5, dtype=jnp.float32) -> List:
    """CCFM cross-scale fusion → [p3, p4, p5], each HD channels."""
    f5 = _conv(c5, enc["proj5"], act=None, dtype=dtype)
    f5 = _aifi(enc["aifi"], f5).astype(dtype)
    y5 = _conv(f5, enc["lat0"], act="silu", dtype=dtype)
    f4 = _conv(c4, enc["proj4"], act=None, dtype=dtype)
    h4 = _repc3(enc["fpn0"], jnp.concatenate([_up2(y5), f4], -1), dtype)
    y4 = _conv(h4, enc["lat1"], act="silu", dtype=dtype)
    f3 = _conv(c3, enc["proj3"], act=None, dtype=dtype)
    p3 = _repc3(enc["fpn1"], jnp.concatenate([_up2(y4), f3], -1), dtype)
    d3 = _conv(p3, enc["down0"], stride=2, act="silu", dtype=dtype)
    p4 = _repc3(enc["pan0"], jnp.concatenate([d3, y4], -1), dtype)
    d4 = _conv(p4, enc["down1"], stride=2, act="silu", dtype=dtype)
    p5 = _repc3(enc["pan1"], jnp.concatenate([d4, y5], -1), dtype)
    return [p3, p4, p5]


# ---------------------------------------------------------------------------
# deformable decoder
# ---------------------------------------------------------------------------

def _deform_attn(p, query, refer_sig, values, shapes,
                 bf16_vals: Optional[bool] = None):
    """Multi-scale deformable attention.

    query (B, NQ, HD); refer_sig (B, NQ, 4) sigmoid-space cxcywh;
    values: the COMBINED (B, ΣHl*Wl, NH, dh) level-concatenated value
    tensor (levels in `shapes` order — exactly how the decoder's value
    projection produces it; a per-level list is also accepted and
    concatenated). shapes: [(Hl, Wl)]. Sampling = 4-corner bilinear
    gather with zero out-of-range padding (grid_sample
    align_corners=False semantics). ``bf16_vals`` (None = the module
    default, env RVT_RTDETR_BF16_VALS) halves the gather bytes; the
    TRAIN path pins it False for f32 gradient fidelity.
    """
    use_bf16 = _BF16_VALS if bf16_vals is None else bf16_vals
    b, nq_, _ = query.shape
    dh = HD // NH
    off = _lin(query, p["off"]).reshape(b, nq_, NH, NL, NDP, 2)
    attw = _lin(query, p["attw"]).reshape(b, nq_, NH, NL * NDP)
    attw = jax.nn.softmax(attw, axis=-1).reshape(b, nq_, NH, NL, NDP)
    # sampling locations in [0,1] feature space
    ctr = refer_sig[:, :, None, None, None, :2]
    wh = refer_sig[:, :, None, None, None, 2:]
    loc = ctr + off.transpose(0, 1, 2, 3, 4, 5) / NDP * wh * 0.5
    # Per-(level, corner) gathers — 12 take_along_axis calls. A fused
    # single-gather alternative (all NL·4·NDP samples through ONE
    # take_along_axis over the combined tensor, weights folded into one
    # einsum) was built and measured on-chip in r4: decoder 9.72 vs
    # 6.77 ms/frame — the one big (B, NQ·48, NH) gather compiles WORSE
    # on this hardware than 12 small ones (with or without the level
    # concat), so the original formulation is kept as the measured
    # winner. The decoder remains RT-DETR's profiled bottleneck
    # (~6.8 of 9.1 ms/frame at batch 8), bound by gather dispatch and
    # 300-query small-matmul intensity (~2 TFLOP/s), not FLOPs.
    V = values if not isinstance(values, (list, tuple)) \
        else jnp.concatenate(values, axis=1)     # (B, ΣHW, NH, dh)
    offs = [0]
    for hl, wl in shapes:
        offs.append(offs[-1] + hl * wl)          # static python ints
    out = jnp.zeros((b, nq_, NH, dh), jnp.float32)
    for lvl, (hl, wl) in enumerate(shapes):
        v = jax.lax.slice_in_dim(V, offs[lvl], offs[lvl + 1], axis=1)
        if use_bf16:
            # measured +6.5%: halve the gather's HBM bytes;
            # weights/accum stay f32 (default on — header note)
            v = v.astype(jnp.bfloat16)
        l = loc[:, :, :, lvl]                    # (B, NQ, NH, NDP, 2)
        x = l[..., 0] * wl - 0.5
        y = l[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        corners = ((0, 0, (1 - fx) * (1 - fy)),
                   (1, 0, fx * (1 - fy)),
                   (0, 1, (1 - fx) * fy),
                   (1, 1, fx * fy))
        idxs, wgts = [], []
        for dx, dy, wgt in corners:
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
            idx = (jnp.clip(yi, 0, hl - 1) * wl +
                   jnp.clip(xi, 0, wl - 1)).astype(jnp.int32)
            # (B, NQ, NH, NDP) → gather on the flattened spatial axis
            idxs.append(idx.transpose(0, 1, 3, 2).reshape(b, nq_ * NDP, NH))
            wgts.append(wgt * inb)
        if _PAIRED_GATHERS:
            # A/B: ONE gather for all 4 corners (12 -> 3 dispatches)
            idx4 = jnp.concatenate(idxs, axis=1)   # (B, 4·NQ·NDP, NH)
            g4 = jnp.take_along_axis(v, idx4[..., None], axis=1)
            g4 = g4.reshape(b, 4, nq_, NDP, NH, dh) \
                .transpose(1, 0, 2, 4, 3, 5).astype(jnp.float32)
            w4 = jnp.stack(wgts)                   # (4, B, NQ, NH, NDP)
            acc = jnp.einsum("cbqhpd,cbqhp->bqhpd", g4, w4)
        else:
            acc = jnp.zeros((b, nq_, NH, NDP, dh), jnp.float32)
            for idxt, wgt in zip(idxs, wgts):
                g = jnp.take_along_axis(v, idxt[..., None], axis=1)
                g = g.reshape(b, nq_, NDP, NH, dh) \
                    .transpose(0, 1, 3, 2, 4).astype(jnp.float32)
                acc = acc + g * wgt[..., None]
        out = out + jnp.einsum("bqhpd,bqhp->bqhd", acc,
                               attw[:, :, :, lvl])
    return _lin(out.reshape(b, nq_, HD), p["out"])


def _anchors_for(shapes, grid_size: float = 0.05, eps: float = 1e-2):
    """Logit-space anchor priors per level grid + validity mask."""
    anchors = []
    for lvl, (h, w) in enumerate(shapes):
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        xy = (jnp.stack([gx, gy], -1) + 0.5) / jnp.asarray(
            [w, h], jnp.float32)
        wh = jnp.full((h, w, 2), grid_size * (2.0 ** lvl), jnp.float32)
        anchors.append(jnp.concatenate([xy, wh], -1).reshape(-1, 4))
    a = jnp.concatenate(anchors, axis=0)
    valid = jnp.all((a > eps) & (a < 1 - eps), axis=-1, keepdims=True)
    a = jnp.log(a / (1 - a))
    a = jnp.where(valid, a, jnp.inf)
    return a, valid.astype(jnp.float32)


def decoder_forward(dec, feats, nc: int, train: bool = False,
                    num_queries: Optional[int] = None,
                    decoder_layers: Optional[int] = None):
    """[p3, p4, p5] (HD ch) → (boxes (B,nq,4) sigmoid cxcywh, scores
    (B,nq,nc) logits[, aux]) — aux (train=True) carries the encoder
    head outputs and every decoder layer's predictions for the
    set-prediction loss.

    ``num_queries`` decodes only the top-N encoder proposals (default
    the published NQ=300). Valid with unchanged weights: RT-DETR has no
    learned query embeddings — queries ARE the encoder's top-k — so a
    smaller N is literally a smaller top-k, and the decoder's cost
    (the family's profiled bottleneck) is linear in N.

    ``decoder_layers`` runs only the FIRST K refinement layers and reads
    the K-th layer's prediction heads (default: all). Valid with
    unchanged weights for the same structural reason num_queries is:
    deep supervision trains a (dec_bbox, dec_score) head pair per
    layer against the same set-prediction objective, so layer K's
    heads are a trained full-quality exit, not an internal feature —
    the remaining layers are iterative refinement whose marginal value
    is measurable (BASELINE.md decoder ladder). Cost is linear in K."""
    b = feats[0].shape[0]
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = []
    for lvl, f in enumerate(feats):
        f = _conv(f, dec["input_proj"][lvl], act=None)
        flat.append(f.reshape(b, -1, HD))
    memory = jnp.concatenate(flat, axis=1).astype(jnp.float32)

    anchors, valid = _anchors_for(shapes)
    feats_q = _ln(_lin(memory * valid[None], dec["enc_output"]["lin"]),
                  dec["enc_output"]["ln"])
    enc_scores = _lin(feats_q, dec["enc_score"])          # (B, sumHW, nc)
    top_val = jnp.max(enc_scores, axis=-1)
    # static query count: 300 (or the caller's num_queries), clamped to
    # the anchor total so tiny inputs (tests, dryrun shapes) still
    # trace — ultralytics asserts instead; identical at deploy sizes
    # (640² → 8400 anchors)
    nq = min(NQ if num_queries is None else int(num_queries),
             memory.shape[1])
    _, topk = jax.lax.top_k(top_val, nq)                  # (B, nq)
    top_feats = jnp.take_along_axis(feats_q, topk[..., None], axis=1)
    top_anchor = jnp.take_along_axis(
        jnp.broadcast_to(anchors[None], (b,) + anchors.shape),
        topk[..., None], axis=1)
    refer_logit = _mlp(top_feats, dec["enc_bbox"]) + top_anchor
    enc_bboxes = jax.nn.sigmoid(refer_logit)
    enc_topk_scores = jnp.take_along_axis(enc_scores, topk[..., None],
                                          axis=1)

    # per-head split of the shared memory for deformable attention
    # (the level concatenation stays combined — _deform_attn gathers
    # over it with per-level static index offsets)
    dh = HD // NH

    output = top_feats
    if train:
        output = jax.lax.stop_gradient(output)
        refer = jax.nn.sigmoid(jax.lax.stop_gradient(refer_logit))
    else:
        refer = enc_bboxes
    layers = dec["layers"]
    if decoder_layers is not None:
        k = max(1, min(int(decoder_layers), len(layers)))
        layers = layers[:k]
    aux_boxes, aux_scores = [], []
    for i, lp in enumerate(layers):
        values = _lin(memory, lp["ca"]["val"]).reshape(b, -1, NH, dh)
        pos = _mlp(refer, dec["qpos"])
        q = k = output + pos
        output = _ln(output + _mha(q, k, output, lp["sa"]), lp["ln1"])
        ca = _deform_attn(lp["ca"], output + pos, refer, values, shapes,
                          bf16_vals=False if train else None)
        output = _ln(output + ca, lp["ln2"])
        f = _lin(jax.nn.relu(_lin(output, lp["ffn1"])), lp["ffn2"])
        output = _ln(output + f, lp["ln3"])
        delta = _mlp(output, dec["dec_bbox"][i])
        refined = jax.nn.sigmoid(delta + inverse_sigmoid(refer))
        if train:
            aux_boxes.append(refined)
            aux_scores.append(_lin(output, dec["dec_score"][i]))
            refer = jax.lax.stop_gradient(refined)
        else:
            refer = refined
    if train:
        aux = {"enc_boxes": enc_bboxes, "enc_scores": enc_topk_scores,
               "boxes": aux_boxes, "scores": aux_scores}
        return aux_boxes[-1], aux_scores[-1], aux
    # the LAST EXECUTED layer's trained score head (== dec_score[-1]
    # when decoder_layers is unset)
    scores = _lin(output, dec["dec_score"][len(layers) - 1])
    return refer, scores


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def forward_rtdetr_raw(params, x, nc: int = 80, dtype=jnp.float32,
                       num_queries: Optional[int] = None,
                       decoder_layers: Optional[int] = None):
    """(B, H, W, 3) float [0,1] → (boxes_xyxy normalized [0,1] (B,nq,4),
    scores (B,nq,nc) sigmoid probabilities). No NMS — suppression is
    learned (set prediction). nq = num_queries or the published 300;
    decoder_layers truncates refinement to the first K trained exits
    (see decoder_forward)."""
    c3, c4, c5 = hgnet_forward(params["backbone"], x, dtype)
    feats = encoder_forward(params["enc"], c3, c4, c5, dtype)
    boxes, logits = decoder_forward(params["dec"], feats, nc,
                                    num_queries=num_queries,
                                    decoder_layers=decoder_layers)
    cxy, wh = boxes[..., :2], boxes[..., 2:]
    xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    return xyxy, jax.nn.sigmoid(logits)


forward_rtdetr = jax.jit(forward_rtdetr_raw,
                         static_argnames=("nc", "dtype", "num_queries",
                                          "decoder_layers"))


def forward_rtdetr_train(params, x, nc: int = 80, dtype=jnp.float32):
    """Training forward: returns the aux dict (encoder head + all decoder
    layers, boxes in sigmoid cxcywh) for models/rtdetr_train.py."""
    c3, c4, c5 = hgnet_forward(params["backbone"], x, dtype)
    feats = encoder_forward(params["enc"], c3, c4, c5, dtype)
    _, _, aux = decoder_forward(params["dec"], feats, nc, train=True)
    return aux


# ---------------------------------------------------------------------------
# checkpoint import (ultralytics ``rtdetr-l.pt`` state-dict layout)
# ---------------------------------------------------------------------------
# The ultralytics graph (rtdetr-l.yaml) is a flat layer list; state-dict
# keys are ``model.<idx>.<submodule>...``. Index map (after the "model."
# strip of weights._normalize_keys):
#   0 HGStem · 1/3/5/6/7/9 HGBlocks · 2/4/8 DWConv downsamples
#   10 input_proj /32 · 11 AIFI · 12 lateral Y5 · 14 input_proj /16
#   16/21/24/27 RepC3 (fpn0/fpn1/pan0/pan1) · 17 lateral Y4
#   19 input_proj /8 · 22/25 downsample convs · 28 RTDETRDecoder.
# RepConv branches (3x3 conv+BN ∥ 1x1 conv+BN) are fused into the single
# deploy-form 3x3 this module stores. BN eps: ultralytics ``Conv`` uses
# 1e-3 (weights.BN_EPS, validated for the YOLO importers); the decoder's
# raw ``nn.BatchNorm2d`` input_proj uses the torch default 1e-5.

_SD_ENC_CONVS = (("10", "proj5", None), ("12", "lat0", "silu"),
                 ("14", "proj4", None), ("17", "lat1", "silu"),
                 ("19", "proj3", None), ("22", "down0", "silu"),
                 ("25", "down1", "silu"))
_SD_REPC3 = (("16", "fpn0"), ("21", "fpn1"), ("24", "pan0"), ("27", "pan1"))
_SD_HGBLOCKS = (("1", 0, 0), ("3", 1, 0), ("5", 2, 0), ("6", 2, 1),
                ("7", 2, 2), ("9", 3, 0))   # (sd idx, stage, block)


def _lin_t(sd, prefix: str) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear (out, in) → our {"w": (in, out), "b"}."""
    from .yolo.weights import _to_np
    w = _to_np(sd[f"{prefix}.weight"]).astype(np.float32)
    b = (_to_np(sd[f"{prefix}.bias"]).astype(np.float32)
         if f"{prefix}.bias" in sd else np.zeros(w.shape[0], np.float32))
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}


def _ln_t(sd, prefix: str) -> Dict[str, jnp.ndarray]:
    from .yolo.weights import _to_np
    return {"g": jnp.asarray(_to_np(sd[f"{prefix}.weight"]), jnp.float32),
            "b": jnp.asarray(_to_np(sd[f"{prefix}.bias"]), jnp.float32)}


def _mha_t(sd, prefix: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention → separate q/k/v/o projections."""
    from .yolo.weights import _to_np
    w = _to_np(sd[f"{prefix}.in_proj_weight"]).astype(np.float32)  # (3d, d)
    b = _to_np(sd[f"{prefix}.in_proj_bias"]).astype(np.float32)
    d = w.shape[1]
    out: Dict[str, Any] = {}
    for i, name in enumerate(("q", "k", "v")):
        out[name] = {"w": jnp.asarray(w[i * d:(i + 1) * d].T),
                     "b": jnp.asarray(b[i * d:(i + 1) * d])}
    out["o"] = _lin_t(sd, f"{prefix}.out_proj")
    return out


def _convbn_t(sd, conv_prefix: str, bn_prefix: str,
              eps: float) -> Dict[str, jnp.ndarray]:
    """Fuse a raw Conv2d (no bias) + BatchNorm2d pair → HWIO weight+bias."""
    from .yolo.weights import _to_np
    w = _to_np(sd[f"{conv_prefix}.weight"]).astype(np.float64)  # OIHW
    gamma = _to_np(sd[f"{bn_prefix}.weight"]).astype(np.float64)
    beta = _to_np(sd[f"{bn_prefix}.bias"]).astype(np.float64)
    mean = _to_np(sd[f"{bn_prefix}.running_mean"]).astype(np.float64)
    var = _to_np(sd[f"{bn_prefix}.running_var"]).astype(np.float64)
    scale = gamma / np.sqrt(var + eps)
    return {"w": jnp.asarray((w * scale[:, None, None, None])
                             .transpose(2, 3, 1, 0), jnp.float32),
            "b": jnp.asarray(beta - mean * scale, jnp.float32)}


def _rep_fuse(sd, prefix: str) -> Dict[str, jnp.ndarray]:
    """RepConv deploy fusion: BN-fused 3x3 branch + zero-padded BN-fused
    1x1 branch sum to one 3x3 conv (identical function — convolution is
    linear; rtdetr-l's RepConv has no identity-BN branch)."""
    from .yolo.weights import _fuse
    c3 = _fuse(sd, f"{prefix}.conv1")
    c1 = _fuse(sd, f"{prefix}.conv2")
    return {"w": c3["w"] + jnp.pad(c1["w"],
                                   ((1, 1), (1, 1), (0, 0), (0, 0))),
            "b": c3["b"] + c1["b"]}


def _repc3_t(sd, i: str) -> Dict[str, Any]:
    from .yolo.weights import _fuse
    out = {"cv1": _fuse(sd, f"{i}.cv1"), "cv2": _fuse(sd, f"{i}.cv2"),
           "m": []}
    j = 0
    while True:
        if f"{i}.m.{j}.conv1.conv.weight" in sd:        # training form
            out["m"].append(_rep_fuse(sd, f"{i}.m.{j}"))
        elif f"{i}.m.{j}.conv.weight" in sd:            # already fused
            # a checkpoint saved after ultralytics fuse(): RepConv is
            # one plain conv+bias (fuse_convs deletes the branches)
            out["m"].append(_fuse(sd, f"{i}.m.{j}"))
        else:
            break
        j += 1
    if not out["m"]:
        # cv1/cv2 imported but no inner blocks found: this would run and
        # produce silently wrong outputs — fail the import instead
        raise KeyError(f"{i}.m.0.conv1.conv.weight")
    return out


def state_dict_to_params_rtdetr(sd) -> Dict[str, Any]:
    """Ultralytics RT-DETR state dict → our param pytree (deploy form)."""
    from .yolo.weights import _fuse, _normalize_keys
    sd = _normalize_keys(sd)

    bk: Dict[str, Any] = {"stem": {
        "s1": _fuse(sd, "0.stem1"), "s2a": _fuse(sd, "0.stem2a"),
        "s2b": _fuse(sd, "0.stem2b"), "s3": _fuse(sd, "0.stem3"),
        "s4": _fuse(sd, "0.stem4")}}
    stages: List[List] = [[] for _ in _L_STAGES]
    for idx, si, bi in _SD_HGBLOCKS:
        light = _L_STAGES[si][4]
        m = []
        j = 0
        while (f"{idx}.m.{j}.conv.weight" in sd
               or f"{idx}.m.{j}.conv1.conv.weight" in sd):
            if light:
                m.append({"cv1": _fuse(sd, f"{idx}.m.{j}.conv1"),
                          "cv2": _fuse(sd, f"{idx}.m.{j}.conv2")})
            else:
                m.append({"cv": _fuse(sd, f"{idx}.m.{j}")})
            j += 1
        assert bi == len(stages[si]), "HGBlock import out of order"
        stages[si].append({"m": m, "sc": _fuse(sd, f"{idx}.sc"),
                           "ec": _fuse(sd, f"{idx}.ec")})
    bk["stages"] = stages
    bk["down"] = [_fuse(sd, i) for i in ("2", "4", "8")]

    enc: Dict[str, Any] = {
        "aifi": {"mha": _mha_t(sd, "11.ma"),
                 "ln1": _ln_t(sd, "11.norm1"), "ln2": _ln_t(sd, "11.norm2"),
                 "fc1": _lin_t(sd, "11.fc1"), "fc2": _lin_t(sd, "11.fc2")}}
    for idx, name, _act in _SD_ENC_CONVS:
        enc[name] = _fuse(sd, idx)
    for idx, name in _SD_REPC3:
        enc[name] = _repc3_t(sd, idx)

    d = "28"
    layers = []
    for i in range(NDL):
        li = f"{d}.decoder.layers.{i}"
        layers.append({
            "sa": _mha_t(sd, f"{li}.self_attn"),
            "ln1": _ln_t(sd, f"{li}.norm1"),
            "ca": {"off": _lin_t(sd, f"{li}.cross_attn.sampling_offsets"),
                   "attw": _lin_t(sd, f"{li}.cross_attn.attention_weights"),
                   "val": _lin_t(sd, f"{li}.cross_attn.value_proj"),
                   "out": _lin_t(sd, f"{li}.cross_attn.output_proj")},
            "ln2": _ln_t(sd, f"{li}.norm2"),
            "ffn1": _lin_t(sd, f"{li}.linear1"),
            "ffn2": _lin_t(sd, f"{li}.linear2"),
            "ln3": _ln_t(sd, f"{li}.norm3"),
        })
    dec = {
        "input_proj": [_convbn_t(sd, f"{d}.input_proj.{l}.0",
                                 f"{d}.input_proj.{l}.1", eps=1e-5)
                       for l in range(NL)],
        "layers": layers,
        "enc_output": {"lin": _lin_t(sd, f"{d}.enc_output.0"),
                       "ln": _ln_t(sd, f"{d}.enc_output.1")},
        "enc_score": _lin_t(sd, f"{d}.enc_score_head"),
        "enc_bbox": [_lin_t(sd, f"{d}.enc_bbox_head.layers.{j}")
                     for j in range(3)],
        "dec_score": [_lin_t(sd, f"{d}.dec_score_head.{i}")
                      for i in range(NDL)],
        "dec_bbox": [[_lin_t(sd, f"{d}.dec_bbox_head.{i}.layers.{j}")
                      for j in range(3)] for i in range(NDL)],
        "qpos": [_lin_t(sd, f"{d}.query_pos_head.layers.{j}")
                 for j in range(2)],
    }
    return {"backbone": bk, "enc": enc, "dec": dec}


def is_rtdetr_npz(path) -> bool:
    """True when ``path`` is an exported RT-DETR pytree .npz (top keys
    Lbackbone/Lenc/Ldec from weights.export_npz) — the content sniff the
    registry and tools use so a renamed weights file still dispatches
    here instead of silently falling through to YOLO random-init."""
    from pathlib import Path
    p = Path(path)
    if p.suffix != ".npz" or not p.exists():
        return False
    try:
        with np.load(p) as z:
            return any(k.startswith("Lbackbone") for k in z.files)
    except Exception:
        return False


def load_params_rtdetr(path_or_sd, nc: int = 80):
    """Load RT-DETR params from a checkpoint; fall back to random init.

    Returns (params, nc, loaded: bool). Accepts a live state dict, an
    ultralytics ``.pt``, a raw state-dict ``.npz``, or our own exported
    pytree ``.npz`` (weights.export_npz). The checkpoint's class count
    (enc_score head width) overrides the ``nc`` hint when present.
    """
    from pathlib import Path
    from typing import Mapping
    from .yolo import weights as yw
    sd = None
    if isinstance(path_or_sd, Mapping) and path_or_sd:
        sd = path_or_sd
    elif isinstance(path_or_sd, (str, Path)):
        p = Path(path_or_sd)
        if p.exists():
            if p.suffix == ".npz":
                raw = dict(np.load(p))
                if raw and all(k.startswith("L") for k in raw):
                    params = yw.import_npz(p)
                    try:
                        return (params,
                                int(params["dec"]["enc_score"]["b"]
                                    .shape[0]), True)
                    except KeyError as exc:
                        # an exported pytree of a DIFFERENT family (e.g.
                        # a YOLO tree in an rtdetr-named file): same
                        # degradation contract as a key mismatch below
                        print(f"[roadvision] .npz is not an rtdetr "
                              f"pytree ({exc}); using random init")
                        sd = None
                        raw = None
                else:
                    sd = raw
            else:
                sd = yw._load_torch(p)
    if sd is not None:
        try:
            params = state_dict_to_params_rtdetr(sd)
            return (params, int(params["dec"]["enc_score"]["b"].shape[0]),
                    True)
        except KeyError as exc:
            print(f"[roadvision] rtdetr checkpoint key mismatch ({exc}); "
                  f"using random init")
    return init_params_rtdetr(jax.random.PRNGKey(0), nc=nc), nc, False
