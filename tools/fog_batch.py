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


# Per-level constructor overrides used by the reference CLI (notably
# global_veil=0.5 vs the synthesizer's 0.06 default) — behavior parity.
_CLI_OVERRIDES = dict(
    y_h_ratio=0.42,
    perlin_scale_ratio=0.18,
    perlin_octaves=2,
    horizon_softness=0.07,
    global_veil=0.5,
    depth_blur_max=4.0,
)

_IMAGE_SUFFIXES = frozenset({".jpg", ".jpeg", ".png"})


def _synthesize_all_levels(img, levels, seed):
    """A fresh synthesizer per level, as the reference tool constructs."""
    for lv in levels:
        synth = EnhancedFogSynthesizer(level=lv, seed=seed, **_CLI_OVERRIDES)
        hazy, _ = synth.synthesize(img)
        yield lv, hazy


def process_folder(inp, outp, levels=("light", "medium", "heavy"),
                   limit=None, seed=None, progress_every=25):
    inp, outp = Path(inp), Path(outp)
    outp.mkdir(parents=True, exist_ok=True)
    files = sorted(p for p in inp.rglob("*")
                   if p.suffix.lower() in _IMAGE_SUFFIXES)
    files = files[:limit] if limit else files

    done = 0
    for p in files:
        img = _imread_bgr(p)
        if img is None:
            print(f"[fog_batch] unreadable image, skipping: {p}")
            continue
        rel = p.relative_to(inp)
        for lv, hazy in _synthesize_all_levels(img, levels, seed):
            dest = outp / lv / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            _imwrite_bgr(dest, hazy)
        done += 1
        if done % progress_every == 0:
            print(f"[fog_batch] {done}/{len(files)} images done "
                  f"(latest: {rel})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="clear road image dir")
    ap.add_argument("--output", required=True, help="fogged output dir")
    ap.add_argument("--levels", default="light,medium,heavy")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--device", default="auto", choices=["auto", "cpu"],
                    help="cpu: force the host backend — this offline tool "
                         "is many small ops, so a high-latency remote "
                         "attach (per-dispatch round-trips) can be slower "
                         "than the local CPU")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    lv = [s.strip() for s in args.levels.split(",") if s.strip()]
    process_folder(args.input, args.output, lv, limit=(args.limit or None),
                   seed=args.seed)
