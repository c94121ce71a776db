"""Independent torch twin of models/rtdetr.py.

Runs the SAME param pytree through torch ops — including
``F.grid_sample`` (the canonical deformable-attention sampler) instead of
the JAX 4-corner gather, and torch's pad/max_pool2d(ceil_mode) instead of
the reduce_window formulation — so agreement checks the math, not the
implementation. Layout conventions: our convs are HWIO (→ OIHW via
transpose), linears are (in, out) (→ transposed matmul).
"""
import math

import numpy as np

HD, NQ, NH, NDP, NDL, NL = 256, 300, 8, 4, 6, 3

_L_STAGES = (
    (48, 128, 3, 1, False),
    (96, 512, 3, 1, False),
    (192, 1024, 5, 3, True),
    (384, 2048, 5, 1, True),
)


def _t(p):
    import torch
    return torch.from_numpy(np.asarray(p)).float()


def _conv(x, p, stride=1, act="relu", pad=None):
    import torch.nn.functional as F
    w = _t(p["w"]).permute(3, 2, 0, 1)
    k = w.shape[-1]
    pad = k // 2 if pad is None else pad
    groups = x.shape[1] // w.shape[1]
    out = F.conv2d(x, w, _t(p["b"]), stride=stride, padding=pad,
                   groups=groups)
    if act == "relu":
        return out.relu()
    if act == "silu":
        import torch
        return out * torch.sigmoid(out)
    if act == "gelu":
        return F.gelu(out)
    return out


def _lin(x, p):
    return x @ _t(p["w"]) + _t(p["b"])


def _ln(x, p):
    import torch.nn.functional as F
    return F.layer_norm(x, (x.shape[-1],), _t(p["g"]), _t(p["b"]))


def _mlp(x, layers):
    for i, p in enumerate(layers):
        x = _lin(x, p)
        if i + 1 < len(layers):
            x = x.relu()
    return x


def _mha(q, k, v, p):
    b = q.shape[0]
    dh = HD // NH
    qh = _lin(q, p["q"]).view(b, -1, NH, dh).transpose(1, 2)
    kh = _lin(k, p["k"]).view(b, -1, NH, dh).transpose(1, 2)
    vh = _lin(v, p["v"]).view(b, -1, NH, dh).transpose(1, 2)
    att = (qh @ kh.transpose(-1, -2)) / math.sqrt(dh)
    out = (att.softmax(-1) @ vh).transpose(1, 2).reshape(b, -1, HD)
    return _lin(out, p["o"])


def _stem(p, x):
    import torch
    import torch.nn.functional as F
    x = _conv(x, p["s1"], stride=2)
    x = F.pad(x, [0, 1, 0, 1])
    x2 = _conv(x, p["s2a"], pad=0)
    x2 = F.pad(x2, [0, 1, 0, 1])
    x2 = _conv(x2, p["s2b"], pad=0)
    x1 = F.max_pool2d(x, kernel_size=2, stride=1, padding=0, ceil_mode=True)
    x = torch.cat([x1, x2], dim=1)
    x = _conv(x, p["s3"], stride=2)
    return _conv(x, p["s4"])


def _hg_block(p, x, light, shortcut):
    import torch
    ys = [x]
    for mp in p["m"]:
        if light:
            h = _conv(ys[-1], mp["cv1"], act=None)
            h = _conv(h, mp["cv2"])
        else:
            h = _conv(ys[-1], mp["cv"])
        ys.append(h)
    y = _conv(torch.cat(ys, dim=1), p["sc"])
    y = _conv(y, p["ec"])
    return y + x if shortcut else y


def _backbone(bk, x):
    y = _stem(bk["stem"], x)
    taps = []
    for si, (_, _, _, n_blocks, light) in enumerate(_L_STAGES):
        if si > 0:
            y = _conv(y, bk["down"][si - 1], stride=2, act=None)
        for bi in range(n_blocks):
            y = _hg_block(bk["stages"][si][bi], y, light, bi > 0)
        taps.append(y)
    return taps[1], taps[2], taps[3]


def _pe(w, h, dim=HD, temp=10000.0):
    import torch
    gw = torch.arange(w, dtype=torch.float32)
    gh = torch.arange(h, dtype=torch.float32)
    grid_w, grid_h = torch.meshgrid(gw, gh, indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temp ** (torch.arange(pos_dim, dtype=torch.float32)
                            / pos_dim))
    out_w = grid_w.flatten()[..., None] @ omega[None]
    out_h = grid_h.flatten()[..., None] @ omega[None]
    return torch.cat([out_w.sin(), out_w.cos(),
                      out_h.sin(), out_h.cos()], dim=1)


def _aifi(p, x):
    b, c, h, w = x.shape
    s = x.flatten(2).permute(0, 2, 1)
    pos = _pe(w, h, c)[None]
    q = k = s + pos
    s = _ln(s + _mha(q, k, s, p["mha"]), p["ln1"])
    import torch.nn.functional as F
    f = _lin(F.gelu(_lin(s, p["fc1"])), p["fc2"])
    s = _ln(s + f, p["ln2"])
    return s.permute(0, 2, 1).view(b, c, h, w)


def _repc3(p, x):
    y = _conv(x, p["cv1"], act="silu")
    for mp in p["m"]:
        y = _conv(y, mp, act="silu")
    return y + _conv(x, p["cv2"], act="silu")


def _up2(x):
    import torch.nn.functional as F
    return F.interpolate(x, scale_factor=2, mode="nearest")


def _encoder(enc, c3, c4, c5):
    import torch
    f5 = _aifi(enc["aifi"], _conv(c5, enc["proj5"], act=None))
    y5 = _conv(f5, enc["lat0"], act="silu")
    f4 = _conv(c4, enc["proj4"], act=None)
    h4 = _repc3(enc["fpn0"], torch.cat([_up2(y5), f4], 1))
    y4 = _conv(h4, enc["lat1"], act="silu")
    f3 = _conv(c3, enc["proj3"], act=None)
    p3 = _repc3(enc["fpn1"], torch.cat([_up2(y4), f3], 1))
    d3 = _conv(p3, enc["down0"], stride=2, act="silu")
    p4 = _repc3(enc["pan0"], torch.cat([d3, y4], 1))
    d4 = _conv(p4, enc["down1"], stride=2, act="silu")
    p5 = _repc3(enc["pan1"], torch.cat([d4, y5], 1))
    return [p3, p4, p5]


def _anchors(shapes, grid_size=0.05, eps=1e-2):
    import torch
    out = []
    for lvl, (h, w) in enumerate(shapes):
        gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        xy = (torch.stack([gx, gy], -1) + 0.5) / torch.tensor(
            [w, h], dtype=torch.float32)
        wh = torch.full((h, w, 2), grid_size * (2.0 ** lvl))
        out.append(torch.cat([xy, wh], -1).view(-1, 4))
    a = torch.cat(out, 0)
    valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdim=True)
    a = torch.log(a / (1 - a))
    a = a.masked_fill(~valid, float("inf"))
    return a, valid.float()


def _inv_sigmoid(x, eps=1e-5):
    import torch
    x = x.clamp(0.0, 1.0)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def _decoder(dec, feats, nc):
    import torch
    b = feats[0].shape[0]
    shapes = [(f.shape[2], f.shape[3]) for f in feats]
    flat = [_conv(f, dec["input_proj"][l], act=None).flatten(2)
            .permute(0, 2, 1) for l, f in enumerate(feats)]
    memory = torch.cat(flat, 1)

    anchors, valid = _anchors(shapes)
    feats_q = _ln(_lin(memory * valid[None], dec["enc_output"]["lin"]),
                  dec["enc_output"]["ln"])
    enc_scores = _lin(feats_q, dec["enc_score"])
    topk = enc_scores.max(-1).values.topk(NQ, dim=1).indices
    top_feats = feats_q.gather(
        1, topk.unsqueeze(-1).expand(-1, -1, HD))
    top_anchor = anchors[None].expand(b, -1, -1).gather(
        1, topk.unsqueeze(-1).expand(-1, -1, 4))
    refer = torch.sigmoid(_mlp(top_feats, dec["enc_bbox"]) + top_anchor)

    dh = HD // NH
    sizes = [h * w for h, w in shapes]
    offs = np.cumsum([0] + sizes)
    output = top_feats
    for i, lp in enumerate(dec["layers"]):
        values_all = _lin(memory, lp["ca"]["val"]).view(b, -1, NH, dh)
        # per level: (B, Hl*Wl, NH, dh) → (B, NH, dh, Hl, Wl) images
        vals_for_gs = [
            values_all[:, offs[l]:offs[l + 1]]
            .view(b, shapes[l][0], shapes[l][1], NH, dh)
            .permute(0, 3, 4, 1, 2)
            for l in range(NL)]
        pos = _mlp(refer, dec["qpos"])
        q = k = output + pos
        output = _ln(output + _mha(q, k, output, lp["sa"]), lp["ln1"])
        ca = _deform_attn_gs(lp["ca"], output + pos, refer,
                             vals_for_gs, shapes)
        output = _ln(output + ca, lp["ln2"])
        f = _lin(_lin(output, lp["ffn1"]).relu(), lp["ffn2"])
        output = _ln(output + f, lp["ln3"])
        delta = _mlp(output, dec["dec_bbox"][i])
        refer = torch.sigmoid(delta + _inv_sigmoid(refer))
    scores = _lin(output, dec["dec_score"][-1])
    return refer, scores


def _deform_attn_gs(p, query, refer, vals_nhdh, shapes):
    """vals_nhdh: list of (B, NH, dh, H, W) per level."""
    import torch
    import torch.nn.functional as F
    b, nq_, _ = query.shape
    dh = HD // NH
    off = _lin(query, p["off"]).view(b, nq_, NH, NL, NDP, 2)
    attw = _lin(query, p["attw"]).view(b, nq_, NH, NL * NDP)
    attw = attw.softmax(-1).view(b, nq_, NH, NL, NDP)
    ctr = refer[:, :, None, None, None, :2]
    wh = refer[:, :, None, None, None, 2:]
    loc = ctr + off / NDP * wh * 0.5
    out = torch.zeros(b * NH, dh, nq_)
    for lvl, (h, w) in enumerate(shapes):
        vl = vals_nhdh[lvl].reshape(b * NH, dh, h, w)
        g = loc[:, :, :, lvl].permute(0, 2, 1, 3, 4) \
            .reshape(b * NH, nq_, NDP, 2)
        samp = F.grid_sample(vl, 2 * g - 1, mode="bilinear",
                             padding_mode="zeros", align_corners=False)
        wl = attw[:, :, :, lvl].permute(0, 2, 1, 3) \
            .reshape(b * NH, 1, nq_, NDP)
        out = out + (samp * wl).sum(-1)
    out = out.view(b, NH, dh, nq_).permute(0, 3, 1, 2).reshape(b, nq_, HD)
    return _lin(out, p["out"])


def rtdetr_forward(params, x_nhwc, nc=80):
    """Full twin forward → (boxes_xyxy normalized, scores sigmoid), numpy."""
    import torch
    torch.set_grad_enabled(False)
    x = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).float()
    c3, c4, c5 = _backbone(params["backbone"], x)
    feats = _encoder(params["enc"], c3, c4, c5)
    boxes, logits = _decoder(params["dec"], feats, nc)
    cxy, wh = boxes[..., :2], boxes[..., 2:]
    xyxy = torch.cat([cxy - wh / 2, cxy + wh / 2], -1)
    return xyxy.numpy(), torch.sigmoid(logits).numpy()
