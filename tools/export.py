"""Checkpoint format converter: .pt / .npz / .onnx → .npz / .onnx.

The torch-free interchange surface for the reserved ``onnx`` backend
(reference configs/default.yaml:38): any checkpoint the framework can load
(ultralytics ``.pt``, our ``.npz``, an ultralytics ``.onnx`` export) is
re-emitted as a portable weights file. The ONNX output is a weights-carrier
ModelProto with ultralytics-style fused initializer names (readable by
models/yolo/onnx_io.load_onnx and by the standard onnx package alike).

    python tools/export.py --weights yolov8n.pt --format onnx --out w.onnx
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", required=True,
                    help="input checkpoint (.pt / .npz / .onnx)")
    ap.add_argument("--format", choices=("onnx", "npz"), default="onnx")
    ap.add_argument("--out", default=None,
                    help="output path (default: input stem + new suffix)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # pure host-side conversion

    from roadvision_tpu.models.yolo import onnx_io, weights

    from roadvision_tpu.models.rtdetr import is_rtdetr_npz
    if "rtdetr" in str(args.weights).lower() or is_rtdetr_npz(args.weights):
        # set-prediction family: .pt/.npz → .npz (no ONNX weight-carrier
        # name scheme exists for the decoder — models/rtdetr.py)
        if args.format == "onnx":
            print("[roadvision] rtdetr supports --format npz only",
                  file=sys.stderr)
            return 2
        from roadvision_tpu.models.rtdetr import load_params_rtdetr
        params, nc, loaded = load_params_rtdetr(args.weights)
        if not loaded:
            print(f"[roadvision] cannot load weights from {args.weights}",
                  file=sys.stderr)
            return 2
        out = Path(args.out) if args.out else \
            Path(args.weights).with_suffix(".npz")
        if out.resolve() == Path(args.weights).resolve():
            print(f"[roadvision] refusing to overwrite the input {out} — "
                  f"pass --out for an in-place-style rewrite",
                  file=sys.stderr)
            return 2
        weights.export_npz(params, out)
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"[roadvision] exported rtdetr-l ({n:,} params, nc={nc}) "
              f"-> {out}")
        return 0

    params, arch, size, loaded = weights.load_params(
        args.weights, allow_random=False)
    out = Path(args.out) if args.out else \
        Path(args.weights).with_suffix(f".{args.format}")
    if out.resolve() == Path(args.weights).resolve():
        print(f"[roadvision] refusing to overwrite the input {out} — "
              f"pass --out for an in-place-style rewrite", file=sys.stderr)
        return 2
    if args.format == "npz":
        weights.export_npz(params, out)
    else:
        onnx_io.export_onnx(params, out, arch=arch)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[roadvision] exported yolo{arch}{size} ({n:,} params) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
