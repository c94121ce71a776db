"""Batch fog augmentation CLI (reference: tools/fog_batch.py:7-45).

Mirrors the reference tool: rglob jpg/png/jpeg under --input, synthesize
each requested level with a fresh synthesizer (same per-level constructor
overrides, incl. global_veil=0.5 — fog_batch.py:18-27), write to
<output>/<level>/<relative path>. Decoding/encoding uses PIL (no OpenCV).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from roadvision_tpu.augment import EnhancedFogSynthesizer  # noqa: E402


def _imread_bgr(path: Path):
    from PIL import Image
    try:
        return np.asarray(Image.open(path).convert("RGB"))[..., ::-1].copy()
    except Exception:
        return None


def _imwrite_bgr(path: Path, bgr: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(bgr[..., ::-1]).save(path)


def process_folder(inp, outp, levels=("light", "medium", "heavy"),
                   limit=None, seed=None):
    inp, outp = Path(inp), Path(outp)
    outp.mkdir(parents=True, exist_ok=True)
    files = [p for p in sorted(inp.rglob("*"))
             if p.suffix.lower() in (".jpg", ".png", ".jpeg")]
    if limit:
        files = files[:limit]

    for i, p in enumerate(files, 1):
        img = _imread_bgr(p)
        if img is None:
            print("Skip unreadable:", p)
            continue
        for lv in levels:
            synth = EnhancedFogSynthesizer(
                level=lv,
                y_h_ratio=0.42,
                perlin_scale_ratio=0.18,
                perlin_octaves=2,
                horizon_softness=0.07,
                global_veil=0.5,
                depth_blur_max=4.0,
                seed=seed,
            )
            hazy, _meta = synth.synthesize(img)
            rel = p.relative_to(inp)
            out_dir = outp / lv / rel.parent
            out_dir.mkdir(parents=True, exist_ok=True)
            _imwrite_bgr(out_dir / rel.name, hazy)
        if i % 20 == 0:
            print(f"[{i}/{len(files)}] {p}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="clear road image dir")
    ap.add_argument("--output", required=True, help="fogged output dir")
    ap.add_argument("--levels", default="light,medium,heavy")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    lv = [s.strip() for s in args.levels.split(",") if s.strip()]
    process_folder(args.input, args.output, lv, limit=(args.limit or None),
                   seed=args.seed)
