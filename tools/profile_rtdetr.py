"""Per-stage RT-DETR profiler: backbone / encoder / decoder / deformable
gather, with FLOPs and a roofline statement (VERDICT r3 #3).

The transformer family is the compute-heavy one; this tool splits its
9.2 ms/frame headline into stages, prints each stage's XLA-cost-analysis
FLOPs and achieved TFLOP/s (scan-amortized like bench.py), and states
what bounds each stage. Reference: the ultralytics wrapper whose
ecosystem this family matches (/root/reference/src/detect/
yolo_ultralytics.py:28-35).

Run: python tools/profile_rtdetr.py [--res 720] [--batch 8] [--imgsz 640]
     [--dtype bfloat16|float32|int8] [--inner 8] [--iters 2]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _cost(jitted, *args):
    """(FLOPs, bytes accessed) per dispatch — bytes is XLA's post-fusion
    per-op sum, an upper bound on true HBM traffic (see
    bench.cost_per_dispatch)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def timed_scan(name, fn, feed, inner: int, iters: int, batch: int,
               chain=None):
    """Time ``fn(x)`` chained ``inner`` times inside one jitted scan
    (dispatch-amortized, commensurable with bench.py). The input is
    perturbed per step: a loop-invariant feed lets XLA hoist the WHOLE
    stage out of the scan and report an inner× fantasy (measured:
    'backbone 64.7 TFLOP/s' before this guard)."""

    def perturbed(x, i):
        # EVERY leaf: perturbing only one input of a multi-input stage
        # leaves the other inputs' subgraphs hoistable (measured: the
        # encoder's AIFI branch, fed by unperturbed c5, reported
        # 97 TFLOP/s)
        def bump(leaf):
            idx = (0,) * leaf.ndim
            if jnp.issubdtype(leaf.dtype, jnp.integer) \
                    or leaf.dtype == jnp.uint8:
                return leaf.at[idx].set((i % 2).astype(leaf.dtype))
            return leaf.at[idx].add((i % 2).astype(leaf.dtype) * 1e-6)
        return jax.tree_util.tree_map(bump, x)

    @jax.jit
    def run(x):
        def body(c, i):
            out = fn(perturbed(x, i))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.astype(jnp.float32).ravel()[0] * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(inner))
        return c

    # cost_analysis counts the scan body once (not x inner), so the
    # reported number already IS one fn(x) evaluation = one batch
    fl, by = _cost(run, feed)
    fl /= batch
    by /= batch
    c = run(feed)
    _sync(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = run(feed)
    _sync(c)
    ms = (time.perf_counter() - t0) / (iters * inner * batch) * 1e3
    ach = fl / (ms / 1e3) / 1e12 if ms > 0 else 0.0
    mem = f"  {by / 1e6:7.1f} MB/frame  {fl / max(by, 1.0):5.0f} FLOPs/B" \
        if by > 0 else ""
    print(f"[rtdetr] {name:28s} {ms:8.3f} ms/frame  "
          f"{fl / 1e9:8.2f} GFLOPs/frame  {ach:7.3f} TFLOP/s{mem}",
          flush=True)
    return ms, fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=720)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8"])
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--device", default="auto", choices=["auto", "cpu"])
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from roadvision_tpu.detect.rtdetr_jax import RTDETRJax
    from roadvision_tpu.models import rtdetr
    from roadvision_tpu.ops.letterbox import resize_stretch_u8
    from roadvision_tpu.utils.resolutions import res_width

    h, w, b = args.res, res_width(args.res), args.batch
    det = RTDETRJax({"model": "rtdetr-l.pt", "imgsz": args.imgsz,
                     "compute_dtype": args.dtype, "max_det": 100,
                     "conf_thres": 0.25, "classes_keep": []})
    params, nc = det.params, det.nc
    dtype = det.dtype
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8))
    print(f"[rtdetr] device={jax.devices()[0].platform} res={args.res}p "
          f"batch={b} imgsz={args.imgsz} dtype={args.dtype} "
          f"(weights {'loaded' if det.loaded else 'RANDOM'})", flush=True)

    imgs = jax.jit(lambda f: resize_stretch_u8(f, size=args.imgsz))(frames)
    c3, c4, c5 = jax.jit(lambda p, x: rtdetr.hgnet_forward(
        p["backbone"], x, dtype))(params, imgs)
    feats = jax.jit(lambda p, cc: rtdetr.encoder_forward(
        p["enc"], *cc, dtype))(params, (c3, c4, c5))

    it, inner = args.iters, args.inner
    ms_r, _ = timed_scan("stretch resize", lambda f: resize_stretch_u8(
        f, size=args.imgsz), frames, inner, it, b)
    ms_b, fl_b = timed_scan("backbone (HGNetv2-L)", lambda x:
                            rtdetr.hgnet_forward(params["backbone"], x,
                                                 dtype),
                            imgs, inner, it, b)
    ms_e, fl_e = timed_scan("hybrid encoder (AIFI+CCFF)", lambda cc:
                            rtdetr.encoder_forward(params["enc"], *cc,
                                                   dtype),
                            (c3, c4, c5), inner, it, b)
    ms_d, fl_d = timed_scan("decoder (6 deform layers)", lambda ff:
                            rtdetr.decoder_forward(params["dec"], ff, nc),
                            feats, inner, it, b)

    # deformable-gather share: one decoder layer's attention with the
    # live shapes (300 queries x 8 heads x 3 levels x 4 points)
    sizes = [args.imgsz // s for s in (8, 16, 32)]
    shapes = [(s, s) for s in sizes]
    dh = 256 // 8
    vals = [jnp.asarray(rng.randn(b, s * s, 8, dh).astype(np.float32))
            for s in sizes]
    q = jnp.asarray(rng.randn(b, 300, 256).astype(np.float32))
    refer = jax.nn.sigmoid(jnp.asarray(
        rng.randn(b, 300, 4).astype(np.float32)))
    lp = params["dec"]["layers"][0]["ca"]
    timed_scan("deform attn (1 of 6 layers)", lambda qq:
               rtdetr._deform_attn(lp, qq, refer, vals, shapes),
               q, inner, it, b)

    ms_f, fl_f = timed_scan(
        "full forward (resize+model)",
        lambda f: rtdetr.forward_rtdetr_raw(
            params, resize_stretch_u8(f, size=args.imgsz), nc=nc,
            dtype=dtype),
        frames, inner, it, b)

    total = ms_r + ms_b + ms_e + ms_d
    print(f"[rtdetr] stage sum {total:.3f} ms vs fused full forward "
          f"{ms_f:.3f} ms ({fl_f / 1e9:.2f} GFLOPs/frame)", flush=True)
    # roofline statement: bytes are dominated by activations between
    # conv stages; on TPU v5e (197 bf16 TFLOP/s, 819 GB/s) the
    # backbone+encoder sit compute-bound above ~240 FLOPs/byte
    for name, fl, ms in (("backbone", fl_b, ms_b),
                         ("encoder", fl_e, ms_e),
                         ("decoder", fl_d, ms_d)):
        if fl <= 0:
            continue
        ach = fl / (ms / 1e3) / 1e12
        print(f"[rtdetr] roofline {name}: {fl / 1e9:.1f} GFLOPs/frame at "
              f"{ach:.3f} TFLOP/s achieved here; at v5e peak (197 bf16) "
              f"this stage's floor is {fl / 197e12 * 1e3:.3f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
