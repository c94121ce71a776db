"""Per-stage preprocess profiler for the TPU attach.

Times each preprocess component and a set of candidate gather-free
re-formulations (bin-sweep LUT apply, sweep histogram) so kernel work is
guided by measurement, not guesswork. Prints one line per candidate.

Timing method (see CLAUDE.md): chained dependencies inside one jitted
fori_loop + a scalar fetch at the end — `block_until_ready` is unreliable
on this backend.

Run: python tools/profile_preprocess.py [--res 720] [--batch 4] [--iters 8]
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
from jax import lax

from roadvision_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _probe(out):
    """1-element device fetch — forces completion without pulling the
    whole output through the ~100 MB/s relay (which would dominate)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timed(name, fn, *args, iters=8, warmup=1):
    """Compile, warm up, then time `iters` sequential dispatches."""
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
    ap.add_argument("--res", type=int, default=720)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    h = args.res
    w = {480: 854, 720: 1280, 1080: 1920}[args.res]
    b = args.batch
    gy = gx = 8
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8))
    plane = jnp.asarray(rng.randint(0, 256, (b, h, w), dtype=np.uint8))
    luts = jnp.asarray(rng.randint(0, 256, (b, gy, gx, 256), dtype=np.uint8))
    print(f"[profile] device={jax.devices()[0].platform} res={h}p batch={b}",
          flush=True)

    from roadvision_tpu.ops import clahe as C
    from roadvision_tpu.ops.color import bgr_to_ycrcb_u8, ycrcb_to_bgr_u8

    want = set(args.only.split(",")) if args.only else None

    def sel(name):
        return want is None or name in want

    it = args.iters

    # --- microbenchmarks -------------------------------------------------
    if sel("gather"):
        table = jnp.asarray(rng.randint(0, 256, (b, gy * gx * 256),
                                        dtype=np.uint8))
        idx = jnp.asarray(rng.randint(0, gy * gx * 256, (b, h * w)),
                          dtype=jnp.int32)

        def micro_gather(tb, ix):
            g = jnp.take_along_axis(tb, ix, axis=1)
            return jnp.sum(g.astype(jnp.int32))

        timed("micro: gather 16K-table", micro_gather, table, idx, iters=it)

    if sel("scatter"):
        keys = jnp.asarray(
            rng.randint(0, b * gy * gx * 256, (b * h * w,)), dtype=jnp.int32)

        def micro_scatter(k):
            return jnp.sum(jnp.bincount(k, length=b * gy * gx * 256))

        timed("micro: bincount scatter", micro_scatter, keys, iters=it)

    # --- current stages ---------------------------------------------------
    if sel("color"):
        def color_rt(x):
            return ycrcb_to_bgr_u8(bgr_to_ycrcb_u8(x))
        timed("color: ycrcb roundtrip", color_rt, frames, iters=it)

    if sel("clahe"):
        timed("clahe: full (current)",
              lambda p: C.clahe_u8(p, 2.0, (gy, gx)), plane, iters=it)

    if sel("hist"):
        def hist_current(p):
            return C.compute_tile_luts(p, 2.0, (gy, gx))
        timed("clahe: hist+lut (bincount)", hist_current, plane, iters=it)

    # tiles for standalone hist candidates (720p: 90x160 tiles)
    th, tw = h // gy, w // gx
    tiles = jnp.asarray(
        rng.randint(0, 256, (b * gy * gx, th * tw), dtype=np.uint8))

    if sel("histsweep"):
        def hist_sweep_fori(t):
            t32 = t.astype(jnp.int32)

            def body(v, acc):
                cnt = jnp.sum((t32 == v).astype(jnp.int32), axis=1)
                return acc.at[:, v].set(cnt)

            acc = jnp.zeros((t.shape[0], 256), jnp.int32)
            return lax.fori_loop(0, 256, body, acc)
        timed("hist: fori sweep", hist_sweep_fori, tiles, iters=it)

    if sel("histbcast"):
        def hist_bcast(t):
            t32 = t.astype(jnp.int32)
            iota = jnp.arange(256, dtype=jnp.int32)
            return jnp.sum((t32[:, :, None] == iota).astype(jnp.int32),
                           axis=1)
        timed("hist: broadcast reduce", hist_bcast, tiles, iters=it)

    if sel("histnib"):
        # nibble decomposition: hist[16*hi + lo] = sum_p [hi_p==hi][lo_p==lo]
        # = one 16x16 matmul of one-hot nibble planes per tile (MXU), with
        # only 32 VPU compares/pixel instead of a 256-step sweep.
        def hist_nib(t):
            t32 = t.astype(jnp.int32)
            i16 = jnp.arange(16, dtype=jnp.int32)
            hi_oh = ((t32 >> 4)[:, :, None] == i16).astype(jnp.bfloat16)
            lo_oh = ((t32 & 15)[:, :, None] == i16).astype(jnp.bfloat16)
            cnt = lax.dot_general(
                hi_oh, lo_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (N, 16, 16)
            return cnt.reshape(t.shape[0], 256).astype(jnp.int32)
        timed("hist: nibble 16x16 matmul", hist_nib, tiles, iters=it)

    if sel("histi8"):
        # same nibble decomposition, int8 one-hots with int32 accumulation
        # — the TPU MXU has a native int8 mode at 2x bf16 rate; exact for
        # any tile area < 2^31
        def hist_i8(t):
            t32 = t.astype(jnp.int32)
            i16 = jnp.arange(16, dtype=jnp.int32)
            hi_oh = ((t32 >> 4)[:, :, None] == i16).astype(jnp.int8)
            lo_oh = ((t32 & 15)[:, :, None] == i16).astype(jnp.int8)
            cnt = lax.dot_general(
                hi_oh, lo_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)      # (N, 16, 16)
            return cnt.reshape(t.shape[0], 256)
        timed("hist: nibble int8 matmul", hist_i8, tiles, iters=it)

    if sel("histdot"):
        def hist_dot(t):
            t32 = t.astype(jnp.int32)
            iota = jnp.arange(256, dtype=jnp.int32)
            oh = (t32[:, :, None] == iota).astype(jnp.bfloat16)
            ones = jnp.ones((t.shape[0], 1, t.shape[1]), jnp.bfloat16)
            return lax.dot_general(
                ones, oh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        timed("hist: onehot matmul", hist_dot, tiles, iters=it)

    # --- apply candidates ---------------------------------------------------
    if sel("apply"):
        def apply_gather(p, lt):
            x = p.astype(jnp.int32)
            ty1, ty2, ya = C._interp_coords(h, th, gy)
            tx1, tx2, xa = C._interp_coords(w, tw, gx)
            lf = lt.reshape(b, gy * gx * 256)

            def gather(tyi, txi):
                idx = (tyi[:, None] * gx + txi[None, :]) * 256 + x
                return jnp.take_along_axis(
                    lf, idx.reshape(b, -1),
                    axis=1).reshape(b, h, w).astype(jnp.float32)

            ya_ = ya[None, :, None]
            xa_ = xa[None, None, :]
            top = gather(ty1, tx1) * (1 - xa_) + gather(ty1, tx2) * xa_
            bot = gather(ty2, tx1) * (1 - xa_) + gather(ty2, tx2) * xa_
            res = top * (1 - ya_) + bot * ya_
            return jnp.clip(jnp.rint(res), 0, 255).astype(jnp.uint8)
        timed("apply: 4-gather (current)", apply_gather, plane, luts,
              iters=it)

    if sel("applysweep"):
        # gather-free: x-blend tables via one-hot matmul, then a 256-bin
        # select sweep per row band (ty1/ty2 constant within a band).
        ty1, ty2, ya = map(np.asarray, C._interp_coords(h, th, gy))
        tx1, tx2, xa = map(np.asarray, C._interp_coords(w, tw, gx))
        # band boundaries: maximal runs of constant (ty1, ty2)
        bands = []
        s = 0
        for y in range(1, h + 1):
            if y == h or ty1[y] != ty1[s] or ty2[y] != ty2[s]:
                bands.append((s, y, int(ty1[s]), int(ty2[s])))
                s = y
        m1 = jnp.asarray(np.eye(gx, dtype=np.float32)[tx1])   # (w, gx)
        m2 = jnp.asarray(np.eye(gx, dtype=np.float32)[tx2])
        xa_j = jnp.asarray(xa)
        ya_j = jnp.asarray(ya)

        def apply_sweep(p, lt):
            x = p.astype(jnp.int32)
            lf = lt.astype(jnp.float32)            # (b, gy, gx, 256)
            bx1 = jnp.einsum("wk,bgkv->bgwv", m1, lf)
            bx2 = jnp.einsum("wk,bgkv->bgwv", m2, lf)
            top_tab = bx1 * (1 - xa_j)[None, None, :, None] \
                + bx2 * xa_j[None, None, :, None]  # (b, gy, w, 256)
            outs = []
            for (y0, y1, t1, t2) in bands:
                vals = x[:, y0:y1]                 # (b, r, w)
                t1tab = top_tab[:, t1]             # (b, w, 256)
                t2tab = top_tab[:, t2]
                yab = ya_j[y0:y1][None, :, None]

                def body(v, acc, vals=vals, t1tab=t1tab, t2tab=t2tab,
                         yab=yab):
                    tv1 = lax.dynamic_slice_in_dim(t1tab, v, 1, 2)[..., 0]
                    tv2 = lax.dynamic_slice_in_dim(t2tab, v, 1, 2)[..., 0]
                    term = tv1[:, None, :] * (1 - yab) + tv2[:, None, :] * yab
                    return jnp.where(vals == v, term, acc)

                acc = jnp.zeros(vals.shape, jnp.float32)
                outs.append(lax.fori_loop(0, 256, body, acc))
            res = jnp.concatenate(outs, axis=1)
            return jnp.clip(jnp.rint(res), 0, 255).astype(jnp.uint8)
        timed("apply: band bin-sweep", apply_sweep, plane, luts, iters=it)

    if sel("applymac"):
        # like the shipped packed sweep, but each chunk accumulates with a
        # masked SUM over an added bin axis instead of a serial
        # where-chain — exactly one bin matches per pixel, so the sum
        # equals the select; the adds form a tree (better ILP) and the
        # mask compares vectorize over the chunk axis in one op.
        ty1, ty2, _ = map(np.asarray, C._interp_coords(h, th, gy))
        bands = []
        s = 0
        for y in range(1, h + 1):
            if y == h or ty1[y] != ty1[s] or ty2[y] != ty2[s]:
                bands.append((s, y, int(ty1[s]), int(ty2[s])))
                s = y
        tx1, tx2, _ = C._interp_coords(w, tw, gx)
        m1 = jnp.asarray(np.eye(gx, dtype=np.float32)[tx1])
        m2 = jnp.asarray(np.eye(gx, dtype=np.float32)[tx2])
        CH = int(__import__("os").environ.get("RVT_CLAHE_CHUNK", "16"))
        n_chunks = 256 // CH
        iota_c = jnp.arange(CH, dtype=jnp.int32)

        def apply_mac(p, lt):
            x = p.astype(jnp.int32)
            lf = lt.astype(jnp.float32)
            outs = []
            for (y0, y1, t1, t2) in bands:
                vals = x[:, y0:y1]
                lp = lf[:, t1] + 65536.0 * lf[:, t2]
                e1 = jnp.einsum("wk,bkv->bwv", m1, lp)
                e2 = jnp.einsum("wk,bkv->bwv", m2, lp)
                packed = e1.astype(jnp.uint32) + e2.astype(jnp.uint32) * 256

                def body(t, acc, vals=vals, packed=packed):
                    v0 = t * CH
                    chunk = lax.dynamic_slice(packed, (0, 0, v0),
                                              (b, w, CH))
                    m = vals[..., None] == (v0 + iota_c)
                    return acc + jnp.sum(
                        jnp.where(m, chunk[:, None, :, :], jnp.uint32(0)),
                        axis=-1)

                z = jnp.zeros(vals.shape, jnp.uint32)
                acc = lax.fori_loop(0, n_chunks, body, z)
                outs.append((acc & 255).astype(jnp.uint8))
            return jnp.concatenate(outs, axis=1)
        timed(f"apply: mask-MAC chunk{CH}", apply_mac, plane, luts, iters=it)

    if sel("applynib"):
        # two-level nibble: 16 lo one-hot masks built ONCE (16 compares),
        # then for each hi value a masked sum over its 16-entry packed
        # sub-table — 32 compares total instead of 256, same packed-u32
        # payload as the shipped sweep.
        ty1, ty2, _ = map(np.asarray, C._interp_coords(h, th, gy))
        bands = []
        s = 0
        for y in range(1, h + 1):
            if y == h or ty1[y] != ty1[s] or ty2[y] != ty2[s]:
                bands.append((s, y, int(ty1[s]), int(ty2[s])))
                s = y
        tx1, tx2, _ = C._interp_coords(w, tw, gx)
        m1 = jnp.asarray(np.eye(gx, dtype=np.float32)[tx1])
        m2 = jnp.asarray(np.eye(gx, dtype=np.float32)[tx2])
        i16_ = jnp.arange(16, dtype=jnp.int32)

        def apply_nib(p, lt):
            x = p.astype(jnp.int32)
            lf = lt.astype(jnp.float32)
            outs = []
            for (y0, y1, t1, t2) in bands:
                vals = x[:, y0:y1]
                hi = vals >> 4
                lo_oh = (vals & 15)[..., None] == i16_  # (b,r,w,16) bool
                lp = lf[:, t1] + 65536.0 * lf[:, t2]
                e1 = jnp.einsum("wk,bkv->bwv", m1, lp)
                e2 = jnp.einsum("wk,bkv->bwv", m2, lp)
                packed = (e1.astype(jnp.uint32)
                          + e2.astype(jnp.uint32) * 256)  # (b, w, 256)

                def body(hv, acc, vals=vals, hi=hi, lo_oh=lo_oh,
                         packed=packed):
                    sub = lax.dynamic_slice(packed, (0, 0, hv * 16),
                                            (b, w, 16))
                    part = jnp.sum(
                        jnp.where(lo_oh, sub[:, None, :, :], jnp.uint32(0)),
                        axis=-1)
                    return acc + jnp.where(hi == hv, part, jnp.uint32(0))

                z = jnp.zeros(vals.shape, jnp.uint32)
                acc = lax.fori_loop(0, 16, body, z)
                outs.append((acc & 255).astype(jnp.uint8))
            return jnp.concatenate(outs, axis=1)
        timed("apply: nibble two-level", apply_nib, plane, luts, iters=it)

    if sel("applypack"):
        # the shipped formulation (ops/clahe.py): grouped regions + packed
        # uint32 LUT + high-nibble sweep with a low-nibble select tree
        def apply_pack(p, lt):
            x = p.astype(jnp.int32)
            out = C._apply_band_sweep(x, lt.astype(jnp.int32), th, tw, gy, gx)
            return out.astype(jnp.uint8)
        timed("apply: packed nibble sweep", apply_pack, plane, luts, iters=it)

    # --- letterbox hand-off -------------------------------------------------
    # the engine's preprocess→detect seam: planar int32 planes are stacked
    # to a full-res channel-last u8 frame that letterbox immediately
    # strided-slices 9× smaller. Does a planar letterbox (slice planes
    # first, stack at target res) beat paying the full-res materialization?
    if sel("lbstack") or sel("lbplanar"):
        from roadvision_tpu.ops.letterbox import letterbox_u8
        planes3 = tuple(jnp.asarray(
            rng.randint(0, 256, (b, h, w), dtype=np.int32)) for _ in range(3))

    if sel("lbstack"):
        def lb_stack(pb, pg, pr):
            u8 = jnp.stack((pb, pg, pr), -1).astype(jnp.uint8)
            return letterbox_u8(u8, size=640)[0]
        timed("letterbox: stack u8 then slice", lb_stack, *planes3, iters=it)

    if sel("lbplanar"):
        def lb_planar(pb, pg, pr):
            # 1080p→640: stride-3 slice both axes, offset 1 (s-1)/2
            r, hh, ww = 640.0 / 1920.0, 360, 640
            small = [p[:, 1::3, 1::3][:, :hh, :ww].astype(jnp.float32)
                     for p in (pr, pg, pb)]          # RGB order
            x = jnp.stack(small, -1)
            x = jnp.pad(x, ((0, 0), (140, 140), (0, 0), (0, 0)),
                        constant_values=114.0)
            return x / 255.0
        timed("letterbox: planar slice first", lb_planar, *planes3, iters=it)

    # --- median ------------------------------------------------------------
    if sel("medpallas") and jax.default_backend() == "tpu":
        from roadvision_tpu.ops.pallas_median import median3_pallas
        timed("median3: pallas", median3_pallas, frames, iters=it)

    if sel("medjnp"):
        from roadvision_tpu.ops.median import median_planar_i32

        def med_jnp(x):
            planes = jnp.moveaxis(x, -1, 0).astype(jnp.int32)
            return median_planar_i32(planes, 3)
        timed("median3: jnp planar", med_jnp, frames, iters=it)

    if sel("medi16"):
        from roadvision_tpu.ops.median import median_planar_i32 as _med

        def med_i16(x):
            planes = jnp.moveaxis(x, -1, 0).astype(jnp.int16)
            return _med(planes, 3)
        timed("median3: jnp planar int16", med_i16, frames, iters=it)


if __name__ == "__main__":
    main()
