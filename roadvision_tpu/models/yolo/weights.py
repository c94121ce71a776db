"""YOLOv8 checkpoint import: ultralytics ``.pt`` state dicts → JAX pytree.

The reference ships ``yolov8n.pt`` and loads it through the Ultralytics
wrapper with ``model.fuse()`` (src/detect/yolo_ultralytics.py:16-17). Here
the torch state dict is converted once at load time: conv+BN pairs are fused
(eps=1e-3, the ultralytics BatchNorm2d setting), OIHW kernels transposed to
HWIO, and keys mapped onto the layer-indexed param tree of yolov8.py.

Accepted inputs: a mapping of tensors/arrays (a state dict), a ``.pt`` file
(plain state dict via ``torch.load(weights_only=True)``, or a full
ultralytics checkpoint when the ultralytics package is importable), an
``.npz`` exported by :func:`export_npz`, or an ``.onnx`` export (ultralytics
``yolo export format=onnx`` convention: BN fused, named initializers) parsed
by models/yolo/onnx_io.py without the onnx package.
"""
from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .yolov8 import REG_MAX, arch_spec, init_params

_CONV_LAYERS = ("0", "1", "3", "5", "7", "16", "19")
_C2F_LAYERS = ("2", "4", "6", "8", "12", "15", "18", "21")
BN_EPS = 1e-3


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _fuse(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    """Fuse `{prefix}.conv` + `{prefix}.bn` into HWIO weight + bias."""
    w = _to_np(sd[f"{prefix}.conv.weight"]).astype(np.float64)  # OIHW
    if f"{prefix}.bn.weight" in sd:
        gamma = _to_np(sd[f"{prefix}.bn.weight"]).astype(np.float64)
        beta = _to_np(sd[f"{prefix}.bn.bias"]).astype(np.float64)
        mean = _to_np(sd[f"{prefix}.bn.running_mean"]).astype(np.float64)
        var = _to_np(sd[f"{prefix}.bn.running_var"]).astype(np.float64)
        scale = gamma / np.sqrt(var + BN_EPS)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
    elif f"{prefix}.conv.bias" in sd:
        b = _to_np(sd[f"{prefix}.conv.bias"]).astype(np.float64)
    else:
        b = np.zeros(w.shape[0], np.float64)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),
            "b": jnp.asarray(b, jnp.float32)}


def _plain(sd: Mapping[str, np.ndarray], wkey: str, bkey: str):
    w = _to_np(sd[wkey]).astype(np.float32)
    b = (_to_np(sd[bkey]).astype(np.float32) if bkey in sd
         else np.zeros(w.shape[0], np.float32))
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b)}


def _c2f(sd, i: str) -> Dict[str, Any]:
    out = {"cv1": _fuse(sd, f"{i}.cv1"), "cv2": _fuse(sd, f"{i}.cv2"), "m": []}
    j = 0
    while f"{i}.m.{j}.cv1.conv.weight" in sd:
        out["m"].append({"cv1": _fuse(sd, f"{i}.m.{j}.cv1"),
                         "cv2": _fuse(sd, f"{i}.m.{j}.cv2")})
        j += 1
    return out


def _normalize_keys(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        kk = k
        while not re.match(r"^\d+\.", kk):
            if "." not in kk:
                break
            head, kk = kk.split(".", 1)
            if head not in ("model", "module", "_orig_mod"):
                kk = k  # unknown prefix: keep original and bail
                break
        out[kk] = v
    return out


def state_dict_to_params(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert an ultralytics YOLOv8 detection state dict to our pytree."""
    sd = _normalize_keys(sd)
    p: Dict[str, Any] = {}
    for i in _CONV_LAYERS:
        p[i] = _fuse(sd, i)
    for i in _C2F_LAYERS:
        p[i] = _c2f(sd, i)
    p["9"] = {"cv1": _fuse(sd, "9.cv1"), "cv2": _fuse(sd, "9.cv2")}
    det: Dict[str, Any] = {"cv2": [], "cv3": []}
    for lvl in range(3):
        det["cv2"].append([
            _fuse(sd, f"22.cv2.{lvl}.0"),
            _fuse(sd, f"22.cv2.{lvl}.1"),
            _plain(sd, f"22.cv2.{lvl}.2.weight", f"22.cv2.{lvl}.2.bias"),
        ])
        det["cv3"].append([
            _fuse(sd, f"22.cv3.{lvl}.0"),
            _fuse(sd, f"22.cv3.{lvl}.1"),
            _plain(sd, f"22.cv3.{lvl}.2.weight", f"22.cv3.{lvl}.2.bias"),
        ])
    p["22"] = det
    return p


def state_dict_to_params_seg(sd: Mapping[str, Any],
                             arch: str = "v8") -> Dict[str, Any]:
    """Ultralytics YOLO seg state dict → pytree: the detection mapping
    plus the Segment head's ``cv4`` coefficient branch and ``proto``
    prototype head (models/yolo/yolov8_seg.py layout; arch "v8" or
    "11"). The ConvTranspose upsample weight arrives (in, out, kH, kW)
    and is stored HWIO."""
    base, head = _base_loader(arch)
    p = base(sd)
    sd = _normalize_keys(sd)
    p[head]["cv4"] = _cv4_branch(sd, head)
    up_w = _to_np(sd[f"{head}.proto.upsample.weight"]).astype(np.float32)
    up_b = (_to_np(sd[f"{head}.proto.upsample.bias"]).astype(np.float32)
            if f"{head}.proto.upsample.bias" in sd
            else np.zeros(up_w.shape[1], np.float32))
    p[head]["proto"] = {
        "cv1": _fuse(sd, f"{head}.proto.cv1"),
        "up_w": jnp.asarray(up_w.transpose(2, 3, 0, 1)),  # IOHW → HWIO
        "up_b": jnp.asarray(up_b),
        "cv2": _fuse(sd, f"{head}.proto.cv2"),
        "cv3": _fuse(sd, f"{head}.proto.cv3"),
    }
    return p


def detect_task(sd: Mapping[str, Any]) -> str:
    """"segment" (cv4 + proto at the detect layer — 22 for v8, 23 for
    YOLO11), "pose"/"obb" (cv4 without proto — the final cv4 conv is
    51-wide for keypoints, 1-wide for the angle), "classify" (linear
    head at layer 9/10) or "detect"."""
    sd = _normalize_keys(sd)
    head = "23" if any(k.startswith("23.cv2.") for k in sd) else "22"
    if any(k.startswith(f"{head}.proto.") for k in sd):
        return "segment"
    if f"{head}.cv4.0.2.weight" in sd:
        ne = _to_np(sd[f"{head}.cv4.0.2.weight"]).shape[0]
        return "obb" if ne == 1 else "pose"
    if "9.linear.weight" in sd or "10.linear.weight" in sd:
        return "classify"
    return "detect"


def _cv4_branch(sd: Mapping[str, Any], head: str = "22") -> list:
    """The shared 3-conv cv4 side branch (pose keypoints / obb angle /
    seg coefficients), at the generation's detect layer."""
    return [[
        _fuse(sd, f"{head}.cv4.{lvl}.0"),
        _fuse(sd, f"{head}.cv4.{lvl}.1"),
        _plain(sd, f"{head}.cv4.{lvl}.2.weight",
               f"{head}.cv4.{lvl}.2.bias"),
    ] for lvl in range(3)]


def _base_loader(arch: str):
    return (state_dict_to_params_11, "23") if arch == "11" \
        else (state_dict_to_params, "22")


def state_dict_to_params_pose(sd: Mapping[str, Any],
                              arch: str = "v8") -> Dict[str, Any]:
    """Ultralytics YOLO pose state dict → pytree: the detection mapping
    plus the Pose head's cv4 keypoint branch
    (models/yolo/yolov8_pose.py layout; arch "v8" or "11")."""
    base, head = _base_loader(arch)
    p = base(sd)
    p[head]["cv4"] = _cv4_branch(_normalize_keys(sd), head)
    return p


def state_dict_to_params_obb(sd: Mapping[str, Any],
                             arch: str = "v8") -> Dict[str, Any]:
    """Ultralytics YOLO obb state dict → pytree: the detection mapping
    plus the OBB head's cv4 angle branch (models/yolo/yolov8_obb.py
    layout — same shape family as pose, ne=1; arch "v8" or "11")."""
    base, head = _base_loader(arch)
    p = base(sd)
    p[head]["cv4"] = _cv4_branch(_normalize_keys(sd), head)
    return p


def state_dict_to_params_cls(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Ultralytics YOLOv8-cls state dict → pytree
    (models/yolo/yolov8_cls.py layout: backbone layers 0-8 + Classify
    conv/linear at 9)."""
    sd = _normalize_keys(sd)
    p: Dict[str, Any] = {}
    for i in ("0", "1", "3", "5", "7"):
        p[i] = _fuse(sd, i)
    for i in ("2", "4", "6", "8"):
        p[i] = _c2f(sd, i)
    lw = _to_np(sd["9.linear.weight"]).astype(np.float32)  # (nc, 1280)
    lb = (_to_np(sd["9.linear.bias"]).astype(np.float32)
          if "9.linear.bias" in sd else np.zeros(lw.shape[0], np.float32))
    p["9"] = {
        "conv": _fuse(sd, "9.conv"),
        "lin_w": jnp.asarray(lw.T),   # (1280, nc) for x @ W
        "lin_b": jnp.asarray(lb),
    }
    return p


def infer_size_from_state_dict(sd: Mapping[str, Any]) -> str:
    """Model size from the stem width (layer 0 output channels)."""
    sd = _normalize_keys(sd)
    c0 = int(_to_np(sd["0.conv.weight"]).shape[0])
    if detect_arch(sd) == "11":
        # YOLO11 widths: n .25, s .50, m/l 1.0 (depth splits them), x 1.5
        if c0 == 64:
            return "l" if "2.m.1.cv1.conv.weight" in sd else "m"
        return {16: "n", 32: "s", 96: "x"}[c0]
    return {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}[c0]


def detect_arch(sd: Mapping[str, Any]) -> str:
    """"v8" (anchor-free Detect at layer 22) vs "v5" (anchored at 24)
    vs "11" (Detect at 23 after the C2PSA block)."""
    sd = _normalize_keys(sd)
    if any(k.startswith("24.m.") for k in sd):
        return "v5"
    if any(k.startswith("23.cv2.") for k in sd):
        return "11"
    return "v8"


# ---------------------------------------------------------------------------
# YOLO11 import (C3k2 blocks, C2PSA attention, DW-separable head at 23)
# ---------------------------------------------------------------------------
_C11_CONV_LAYERS = ("0", "1", "3", "5", "7", "17", "20")
_C11_C3K2_LAYERS = ("2", "4", "6", "8", "13", "16", "19", "22")


def _c3k2_import(sd, i: str) -> Dict[str, Any]:
    """C3k2: the C2f shell whose m entries are either Bottlenecks
    (cv1/cv2) or full C3k blocks (cv1/cv2/cv3 + inner m bottlenecks)."""
    out = {"cv1": _fuse(sd, f"{i}.cv1"), "cv2": _fuse(sd, f"{i}.cv2"),
           "m": []}
    j = 0
    while f"{i}.m.{j}.cv1.conv.weight" in sd:
        if f"{i}.m.{j}.cv3.conv.weight" in sd:   # C3k
            blk = {"cv1": _fuse(sd, f"{i}.m.{j}.cv1"),
                   "cv2": _fuse(sd, f"{i}.m.{j}.cv2"),
                   "cv3": _fuse(sd, f"{i}.m.{j}.cv3"), "m": []}
            k = 0
            while f"{i}.m.{j}.m.{k}.cv1.conv.weight" in sd:
                blk["m"].append(
                    {"cv1": _fuse(sd, f"{i}.m.{j}.m.{k}.cv1"),
                     "cv2": _fuse(sd, f"{i}.m.{j}.m.{k}.cv2")})
                k += 1
        else:                                    # plain Bottleneck
            blk = {"cv1": _fuse(sd, f"{i}.m.{j}.cv1"),
                   "cv2": _fuse(sd, f"{i}.m.{j}.cv2")}
        out["m"].append(blk)
        j += 1
    return out


def state_dict_to_params_11(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert an ultralytics YOLO11 detection state dict to the pytree
    of models/yolo/yolo11.py. Depthwise convs keep their (k, k, 1, C)
    HWIO kernels — the forward infers feature_group_count from shape."""
    sd = _normalize_keys(sd)
    p: Dict[str, Any] = {}
    for i in _C11_CONV_LAYERS:
        p[i] = _fuse(sd, i)
    for i in _C11_C3K2_LAYERS:
        p[i] = _c3k2_import(sd, i)
    p["9"] = {"cv1": _fuse(sd, "9.cv1"), "cv2": _fuse(sd, "9.cv2")}
    psa = {"cv1": _fuse(sd, "10.cv1"), "cv2": _fuse(sd, "10.cv2"),
           "m": []}
    j = 0
    while f"10.m.{j}.attn.qkv.conv.weight" in sd:
        psa["m"].append({
            "attn": {"qkv": _fuse(sd, f"10.m.{j}.attn.qkv"),
                     "proj": _fuse(sd, f"10.m.{j}.attn.proj"),
                     "pe": _fuse(sd, f"10.m.{j}.attn.pe")},
            "ffn": [_fuse(sd, f"10.m.{j}.ffn.0"),
                    _fuse(sd, f"10.m.{j}.ffn.1")],
        })
        j += 1
    p["10"] = psa
    det: Dict[str, Any] = {"cv2": [], "cv3": []}
    for lvl in range(3):
        det["cv2"].append([
            _fuse(sd, f"23.cv2.{lvl}.0"),
            _fuse(sd, f"23.cv2.{lvl}.1"),
            _plain(sd, f"23.cv2.{lvl}.2.weight", f"23.cv2.{lvl}.2.bias"),
        ])
        det["cv3"].append([
            {"dw": _fuse(sd, f"23.cv3.{lvl}.0.0"),
             "pw": _fuse(sd, f"23.cv3.{lvl}.0.1")},
            {"dw": _fuse(sd, f"23.cv3.{lvl}.1.0"),
             "pw": _fuse(sd, f"23.cv3.{lvl}.1.1")},
            _plain(sd, f"23.cv3.{lvl}.2.weight", f"23.cv3.{lvl}.2.bias"),
        ])
    p["23"] = det
    return p


# ---------------------------------------------------------------------------
# YOLOv5 import (C3 blocks, coupled anchored head at layer 24)
# ---------------------------------------------------------------------------
_V5_CONV_LAYERS = ("0", "1", "3", "5", "7", "10", "14", "18", "21")
_V5_C3_LAYERS = ("2", "4", "6", "8", "13", "17", "20", "23")


def _c3_import(sd, i: str) -> Dict[str, Any]:
    out = {"cv1": _fuse(sd, f"{i}.cv1"), "cv2": _fuse(sd, f"{i}.cv2"),
           "cv3": _fuse(sd, f"{i}.cv3"), "m": []}
    j = 0
    while f"{i}.m.{j}.cv1.conv.weight" in sd:
        out["m"].append({"cv1": _fuse(sd, f"{i}.m.{j}.cv1"),
                         "cv2": _fuse(sd, f"{i}.m.{j}.cv2")})
        j += 1
    return out


def state_dict_to_params_v5(sd: Mapping[str, Any]) -> Dict[str, Any]:
    sd = _normalize_keys(sd)
    p: Dict[str, Any] = {}
    for i in _V5_CONV_LAYERS:
        p[i] = _fuse(sd, i)
    for i in _V5_C3_LAYERS:
        p[i] = _c3_import(sd, i)
    p["9"] = {"cv1": _fuse(sd, "9.cv1"), "cv2": _fuse(sd, "9.cv2")}
    det = []
    for lvl in range(3):
        det.append(_plain(sd, f"24.m.{lvl}.weight", f"24.m.{lvl}.bias"))
    p["24"] = {"m": det}
    return p


def load_params(path_or_sd, size: str = "n", nc: int = 80,
                allow_random: bool = True, arch: str = "v8",
                task: str = "detect"):
    """Load params from a checkpoint; fall back to random init.

    Returns (params, arch ("v8"|"v5"), size, loaded: bool). The checkpoint
    overrides the arch/size hints when present; a Segment head in the
    checkpoint (or ``task="segment"`` for the random-init fallback) adds
    the ``22.cv4``/``22.proto`` subtrees — callers detect the task from
    the returned tree (``"cv4" in params.get("22", {})``).
    """
    sd = None
    if isinstance(path_or_sd, Mapping) and path_or_sd:
        sd = path_or_sd
    elif isinstance(path_or_sd, (str, Path)):
        p = Path(path_or_sd)
        if p.exists():
            if p.suffix == ".onnx":
                from .onnx_io import load_onnx
                try:
                    sd = load_onnx(p)
                except ValueError as exc:
                    # same degradation contract as a corrupt .pt
                    # (_load_torch → None): random init unless forbidden
                    if not allow_random:
                        raise
                    print(f"[roadvision] unreadable ONNX ({exc}); "
                          f"using random init")
            elif p.suffix == ".npz":
                raw = dict(np.load(p))
                if raw and all(k.startswith("L") for k in raw):
                    params = import_npz(p)  # our own exported pytree
                    c0 = int(params["0"]["w"].shape[-1])
                    arch = "v5" if "24" in params \
                        else "11" if "23" in params else "v8"
                    if arch == "11":
                        size = ("l" if len(params["2"]["m"]) > 1 else "m") \
                            if c0 == 64 else {16: "n", 32: "s",
                                              96: "x"}[c0]
                    else:
                        size = {16: "n", 32: "s", 48: "m", 64: "l",
                                80: "x"}[c0]
                    return params, arch, size, True
                sd = raw
            else:
                sd = _load_torch(p)
    if sd is not None:
        try:
            arch = detect_arch(sd)
            size = infer_size_from_state_dict(sd)
            if arch == "v5":
                params = state_dict_to_params_v5(sd)
            else:
                found = detect_task(sd)
                if found == "detect":
                    params = (state_dict_to_params_11(sd) if arch == "11"
                              else state_dict_to_params(sd))
                else:
                    loaders = {"segment": state_dict_to_params_seg,
                               "pose": state_dict_to_params_pose,
                               "obb": state_dict_to_params_obb}
                    params = loaders[found](sd, arch=arch)
            return params, arch, size, True
        except KeyError as exc:
            if not allow_random:
                raise
            print(f"[roadvision] checkpoint key mismatch ({exc}); "
                  f"using random init")
    if not allow_random:
        raise FileNotFoundError(f"cannot load weights from {path_or_sd}")
    import jax
    if arch == "v5":
        from .yolov5 import init_params as v5_init
        return v5_init(jax.random.PRNGKey(0), size, nc), "v5", size, False
    if task == "segment":
        from .yolov8_seg import init_params_seg
        return (init_params_seg(jax.random.PRNGKey(0), size, nc,
                                arch=arch),
                arch, size, False)
    if task == "pose":
        from .yolov8_pose import init_params_pose
        return (init_params_pose(jax.random.PRNGKey(0), size,
                                 nc if nc != 80 else 1, arch=arch),
                arch, size, False)
    if task == "obb":
        from .yolov8_obb import init_params_obb
        return (init_params_obb(jax.random.PRNGKey(0), size,
                                nc if nc != 80 else 15, arch=arch),
                arch, size, False)
    if arch == "11":
        from .yolo11 import init_params_11
        return (init_params_11(jax.random.PRNGKey(0), size, nc),
                "11", size, False)
    return init_params(jax.random.PRNGKey(0), size, nc), "v8", size, False


def _load_torch(path: Path):
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        except Exception as exc:
            print(f"[roadvision] failed to load {path}: {exc}")
            return None
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"],
                                                            "state_dict"):
        return {k: v.float() for k, v in obj["model"].state_dict().items()}
    if isinstance(obj, dict) and all(hasattr(v, "shape") for v in obj.values()):
        return obj
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    return None


def export_npz(params, path) -> None:
    """Flatten the param pytree to an .npz (portable, torch-free).

    Top-level layer keys are prefixed with "L" so that on import, any
    remaining all-digit dict level can be unambiguously restored to a list
    (C2f "m" and Detect "cv2"/"cv3" entries).
    """
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else f"L{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
        else:
            flat[prefix] = np.asarray(node)
    walk(params, "")
    np.savez(path, **flat)


def import_npz(path) -> Dict[str, Any]:
    flat = dict(np.load(path))
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        # float16 is a STORAGE format (halves large shipped checkpoints
        # like assets/rtdetr_l_synthetic_256.npz); params are f32 —
        # compute dtype is a separate knob (detect.compute_dtype)
        if val.dtype == np.float16:
            val = val.astype(np.float32)
        node[parts[-1]] = jnp.asarray(val)

    def restore(tree):
        if not isinstance(tree, dict):
            return tree
        # all-digit AND contiguous 0..n-1 keys → was a list (C2f "m",
        # Detect branches). The layer-index dict has gaps (no 10/11/...)
        # so it stays a dict.
        if tree and all(k.isdigit() for k in tree) \
                and sorted(int(k) for k in tree) == list(range(len(tree))):
            return [restore(tree[str(i)]) for i in range(len(tree))]
        return {k: restore(v) for k, v in tree.items()}

    return {k[1:]: restore(v) for k, v in root.items()}  # strip "L"


def random_params(size: str = "n", nc: int = 80, seed: int = 0):
    import jax
    return init_params(jax.random.PRNGKey(seed), size, nc)
