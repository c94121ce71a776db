"""Per-stage detection profiler for the TPU attach.

Times the detect step's components — letterbox, YOLO forward, DFL decode +
NMS, box rescale — plus the composed step, so kernel work is guided by
measurement (same method as tools/profile_preprocess.py).

Run: python tools/profile_detect.py [--res 1080] [--batch 8] [--iters 8]
     [--size n] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from roadvision_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _probe(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timed(name, fn, *args, iters=8, warmup=1):
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    out = jitted(*args)
    scalar = _probe(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = jitted(*args)
        scalar = _probe(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    scalar = _probe(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"[profile] {name:32s} {dt * 1e3:9.2f} ms  "
          f"(compile {compile_s:.1f}s, probe {scalar})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1080)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", type=str, default="n")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    h = args.res
    w = {480: 854, 720: 1280, 1080: 1920}[args.res]
    b = args.batch
    it = args.iters
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8))
    print(f"[profile] device={jax.devices()[0].platform} res={h}p batch={b} "
          f"yolov8{args.size} {args.dtype}", flush=True)

    from roadvision_tpu.models.yolo import init_params, yolov8
    from roadvision_tpu.ops.letterbox import letterbox_u8, scale_boxes
    from roadvision_tpu.ops.nms import nms_batch

    params = init_params(jax.random.PRNGKey(0), args.size)
    want = set(args.only.split(",")) if args.only else None

    def sel(name):
        return want is None or name in want

    imgs0, ratio0, pad0 = jax.jit(lambda f: letterbox_u8(f, size=640))(frames)
    nc = 80

    if sel("letterbox"):
        timed("letterbox 1080p->640", lambda f: letterbox_u8(f, size=640)[0],
              frames, iters=it)

    if sel("forward"):
        def fwd(p, im):
            return yolov8.forward(p, im, size=args.size, nc=nc, dtype=dtype)
        timed("yolov8 forward+decode", fwd, params, imgs0, iters=it)

    boxes, scores = jax.jit(
        lambda p, im: yolov8.forward(p, im, size=args.size, nc=nc,
                                     dtype=dtype))(params, imgs0)

    if sel("nms"):
        def donms(bx, sc):
            return nms_batch(bx, sc, conf_thres=0.25, iou_thres=0.7,
                             max_det=100, pre_topk=300,
                             classes_keep=(0, 2, 3, 5, 7))
        timed("nms (300 cand)", donms, boxes, scores, iters=it)

    if sel("full"):
        def full(p, f):
            imgs, ratio, pad = letterbox_u8(f, size=640)
            bx, sc = yolov8.forward(p, imgs, size=args.size, nc=nc,
                                    dtype=dtype)
            bb, c, k, v = nms_batch(bx, sc, conf_thres=0.25, iou_thres=0.7,
                                    max_det=100, pre_topk=300,
                                    classes_keep=(0, 2, 3, 5, 7))
            return scale_boxes(bb, ratio, pad, (h, w)), c, k, v
        timed("full detect step", full, params, frames, iters=it)


if __name__ == "__main__":
    main()
