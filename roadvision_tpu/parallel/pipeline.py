"""Pipeline parallelism: stage-per-device microbatched YOLO inference.

The reference has no parallelism at all (SURVEY.md §2.5); this module adds
the pipeline axis (pp) to the framework's parallel story, alongside data
parallelism (batch axis over the mesh), tensor parallelism (conv output
channels, `sharding.param_shardings`) and stream sharding (whole camera
streams, `inference.make_sharded_stream_step`).

When is pp the right tool here? Large model sizes (v8l/x) served on a pod
slice where one chip either cannot hold the fused graph at the target
batch or where stage-level overlap beats a pure dp split (dp replicates
all weights per chip; pp holds 1/S of them). For yolov8n on one chip the
fused single-device step remains the default and fastest path.

Design (TPU-first, not a torch-style translation):

  * The v8 graph is cut at its natural FPN boundaries into 4 *fine*
    stages with explicit, typed carry pytrees (the skip tensors p3/p4/p5
    that the PAN neck re-reads later travel in the carry — a CNN with
    lateral connections cannot be pipelined with a single homogeneous
    carry the way a transformer stack can).
  * Fine stages are grouped into ``n_stages`` contiguous coarse stages,
    balanced by parameter count; each coarse stage is jitted once and its
    params are committed to its own device.
  * The GPipe schedule is not hand-written: JAX's async dispatch IS the
    scheduler. The host enqueues microbatch i's stage s, then immediately
    enqueues microbatch i+1's stage s-1 on the previous device; execution
    overlaps because the stages live on different devices and the
    device→device `jax.device_put` edges (ICI on real hardware) carry the
    data dependencies. No sequencing code, no bubbles beyond the
    unavoidable fill/drain ramp.

The pipelined forward is numerically the same graph as
`models.yolo.yolov8.forward_raw` (same helpers, same op order) — the
equivalence is asserted in tests/test_pipeline.py and exercised by
`__graft_entry__.dryrun_multichip` on the virtual CPU mesh.
"""
from __future__ import annotations

from itertools import combinations
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolo import yolov8

# Parameter keys of each fine stage (ultralytics layer indices; see
# models/yolo/yolov8.py init_params for the layout).
STAGE_KEYS: Sequence[Sequence[str]] = (
    ("0", "1", "2", "3", "4"),          # stem → P3 backbone
    ("5", "6"),                          # P4 backbone
    ("7", "8", "9", "12"),               # P5 backbone + SPPF + top-down h4
    ("15", "16", "18", "19", "21", "22"),  # PAN bottom-up + detect head
)


def _fine0(p, c, spec, dtype):
    y = yolov8._conv(c["x"], p["0"], stride=2, dtype=dtype)
    y = yolov8._conv(y, p["1"], stride=2, dtype=dtype)
    y = yolov8._c2f(y, p["2"], True, dtype)
    y = yolov8._conv(y, p["3"], stride=2, dtype=dtype)
    p3 = yolov8._c2f(y, p["4"], True, dtype)
    return {"p3": p3}


def _fine1(p, c, spec, dtype):
    y = yolov8._conv(c["p3"], p["5"], stride=2, dtype=dtype)
    p4 = yolov8._c2f(y, p["6"], True, dtype)
    return {"p3": c["p3"], "p4": p4}


def _fine2(p, c, spec, dtype):
    y = yolov8._conv(c["p4"], p["7"], stride=2, dtype=dtype)
    y = yolov8._c2f(y, p["8"], True, dtype)
    p5 = yolov8._sppf(y, p["9"], dtype)
    u = jnp.concatenate([yolov8._upsample2(p5), c["p4"]], axis=-1)
    h4 = yolov8._c2f(u, p["12"], False, dtype)
    return {"p3": c["p3"], "h4": h4, "p5": p5}


def _fine3(p, c, spec, dtype):
    u = jnp.concatenate([yolov8._upsample2(c["h4"]), c["p3"]], axis=-1)
    out3 = yolov8._c2f(u, p["15"], False, dtype)
    u = jnp.concatenate(
        [yolov8._conv(out3, p["16"], stride=2, dtype=dtype), c["h4"]], axis=-1)
    out4 = yolov8._c2f(u, p["18"], False, dtype)
    u = jnp.concatenate(
        [yolov8._conv(out4, p["19"], stride=2, dtype=dtype), c["p5"]], axis=-1)
    out5 = yolov8._c2f(u, p["21"], False, dtype)
    outs = yolov8.forward_head(p, [out3, out4, out5], spec, dtype)
    boxes, scores = yolov8.decode(outs, spec["nc"])
    return {"boxes": boxes, "scores": scores}


_FINE_FNS = (_fine0, _fine1, _fine2, _fine3)


def _leaf_count(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def _balanced_groups(weights: Sequence[int], n_groups: int) -> List[range]:
    """Contiguous partition of fine stages minimizing the max group weight
    (brute force over cut points — there are at most C(3, n-1) options)."""
    n = len(weights)
    best, best_cost = None, None
    for cuts in combinations(range(1, n), n_groups - 1):
        bounds = [0, *cuts, n]
        groups = [range(bounds[i], bounds[i + 1]) for i in range(n_groups)]
        cost = max(sum(weights[j] for j in g) for g in groups)
        if best_cost is None or cost < best_cost:
            best, best_cost = groups, cost
    return best


class PipelinedYOLO:
    """YOLOv8 forward split over ``n_stages`` devices (2 ≤ n ≤ 4).

    Produces the same (boxes, scores) as the single-device
    ``yolov8.forward_raw``; NMS/rescale run downstream wherever the caller
    runs them today (the last stage's device holds the outputs).

    ``microbatch`` controls the pipeline grain: smaller microbatches fill
    the pipe faster (less ramp bubble) at more dispatch overhead. The
    default picks the largest divisor of the batch that yields at least
    2·n_stages microbatches, the conventional GPipe fill ratio.
    """

    def __init__(self, params: Dict[str, Any], size: str = "n", nc: int = 80,
                 n_stages: int = 2,
                 devices: Optional[Sequence[jax.Device]] = None,
                 microbatch: Optional[int] = None, dtype=jnp.float32):
        if not 2 <= n_stages <= len(STAGE_KEYS):
            raise ValueError(
                f"n_stages={n_stages} unsupported (2..{len(STAGE_KEYS)})")
        devices = list(devices) if devices is not None else jax.devices()
        if len(devices) < n_stages:
            raise ValueError(
                f"pipeline needs {n_stages} devices, have {len(devices)}")
        missing = [k for g in STAGE_KEYS for k in g if k not in params]
        if missing:
            raise ValueError(f"param tree missing layers {missing} "
                             "(PipelinedYOLO supports the v8 detect graph)")
        self.spec = yolov8.arch_spec(size, nc)
        self.n_stages = n_stages
        self.microbatch = microbatch
        self.devices = devices[:n_stages]

        weights = [_leaf_count({k: params[k] for k in g}) for g in STAGE_KEYS]
        self.groups = _balanced_groups(weights, n_stages)

        self.stage_params: List[Dict[str, Any]] = []
        self.stage_fns = []
        for gi, grp in enumerate(self.groups):
            keys = [k for j in grp for k in STAGE_KEYS[j]]
            sub = {k: params[k] for k in keys}
            self.stage_params.append(jax.device_put(sub, self.devices[gi]))

            def make_stage(grp=grp):
                def run(p, c):
                    for j in grp:
                        c = _FINE_FNS[j](p, c, self.spec, dtype)
                    return c
                return jax.jit(run)

            self.stage_fns.append(make_stage())

    def _pick_microbatch(self, batch: int) -> int:
        if self.microbatch is not None:
            if batch % self.microbatch != 0:
                raise ValueError(
                    f"batch {batch} not divisible by microbatch "
                    f"{self.microbatch} (uneven tail would recompile)")
            return self.microbatch
        target = 2 * self.n_stages  # GPipe fill ratio
        for mb in range(max(1, batch // target), 0, -1):
            if batch % mb == 0:
                return mb
        return 1

    def __call__(self, x) -> tuple:
        """(B, H, W, 3) float in [0,1] → (boxes (B,N,4), scores (B,N,nc))."""
        x = jnp.asarray(x)
        mb = self._pick_microbatch(x.shape[0])
        outs = []
        for s in range(0, x.shape[0], mb):
            carry: Any = {"x": jax.device_put(x[s:s + mb], self.devices[0])}
            for i, (fn, sp) in enumerate(zip(self.stage_fns,
                                             self.stage_params)):
                if i:
                    carry = jax.tree_util.tree_map(
                        lambda a, d=self.devices[i]: jax.device_put(a, d),
                        carry)
                carry = fn(sp, carry)
            outs.append(carry)
        boxes = jnp.concatenate([o["boxes"] for o in outs])
        scores = jnp.concatenate([o["scores"] for o in outs])
        return boxes, scores


# ---------------------------------------------------------------------------
# RT-DETR pipeline — the heavy family (32M params) where pp matters most:
# a v5e slice serves rtdetr-l with 1/S of the weights per chip instead of
# dp's full replication. Same fine-stage/carry design as PipelinedYOLO;
# the natural cuts are the model's own subsystem boundaries (HGNetv2
# halves → hybrid encoder → deformable decoder).
# ---------------------------------------------------------------------------

def _rt_fine0(p, c, nc, dtype):
    from ..models import rtdetr as rt
    y = rt._hg_stem(p["stem"], c["x"], dtype)
    for bi, blk in enumerate(p["s0"]):
        y = rt._hg_block(blk, y, rt._L_STAGES[0][4], bi > 0, dtype)
    y = rt._conv(y, p["d0"], stride=2, act=None, dtype=dtype)
    for bi, blk in enumerate(p["s1"]):
        y = rt._hg_block(blk, y, rt._L_STAGES[1][4], bi > 0, dtype)
    return {"c3": y}


def _rt_fine1(p, c, nc, dtype):
    from ..models import rtdetr as rt
    y = rt._conv(c["c3"], p["d1"], stride=2, act=None, dtype=dtype)
    for bi, blk in enumerate(p["s2"]):
        y = rt._hg_block(blk, y, rt._L_STAGES[2][4], bi > 0, dtype)
    c4 = y
    y = rt._conv(c4, p["d2"], stride=2, act=None, dtype=dtype)
    for bi, blk in enumerate(p["s3"]):
        y = rt._hg_block(blk, y, rt._L_STAGES[3][4], bi > 0, dtype)
    return {"c3": c["c3"], "c4": c4, "c5": y}


def _rt_fine2(p, c, nc, dtype):
    from ..models import rtdetr as rt
    f3, f4, f5 = rt.encoder_forward(p, c["c3"], c["c4"], c["c5"], dtype)
    return {"f3": f3, "f4": f4, "f5": f5}


def _rt_fine3(p, c, nc, dtype):
    from ..models import rtdetr as rt
    boxes, logits = rt.decoder_forward(p, [c["f3"], c["f4"], c["f5"]], nc)
    cxy, wh = boxes[..., :2], boxes[..., 2:]
    xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    return {"boxes": xyxy, "scores": jax.nn.sigmoid(logits)}


_RT_FINE_FNS = (_rt_fine0, _rt_fine1, _rt_fine2, _rt_fine3)


def _rt_stage_params(params) -> List[Dict[str, Any]]:
    bk = params["backbone"]
    return [
        {"stem": bk["stem"], "s0": bk["stages"][0], "s1": bk["stages"][1],
         "d0": bk["down"][0]},
        {"s2": bk["stages"][2], "s3": bk["stages"][3],
         "d1": bk["down"][1], "d2": bk["down"][2]},
        params["enc"],
        params["dec"],
    ]


class PipelinedRTDETR:
    """RT-DETR forward split over ``n_stages`` devices (2 ≤ n ≤ 4).

    Produces the same (boxes_xyxy normalized, scores) as the
    single-device ``models.rtdetr.forward_rtdetr_raw`` — equivalence
    asserted in tests/test_pipeline.py. Downstream top-k/rescale runs
    wherever the caller runs it today (no NMS: set prediction).
    """

    def __init__(self, params: Dict[str, Any], nc: int = 80,
                 n_stages: int = 2,
                 devices: Optional[Sequence[jax.Device]] = None,
                 microbatch: Optional[int] = None, dtype=jnp.float32):
        if not 2 <= n_stages <= len(_RT_FINE_FNS):
            raise ValueError(
                f"n_stages={n_stages} unsupported (2..{len(_RT_FINE_FNS)})")
        devices = list(devices) if devices is not None else jax.devices()
        if len(devices) < n_stages:
            raise ValueError(
                f"pipeline needs {n_stages} devices, have {len(devices)}")
        for key in ("backbone", "enc", "dec"):
            if key not in params:
                raise ValueError(f"param tree missing '{key}' "
                                 "(PipelinedRTDETR wants the rtdetr pytree)")
        self.nc = nc
        self.n_stages = n_stages
        self.microbatch = microbatch
        self.devices = devices[:n_stages]

        fine_params = _rt_stage_params(params)
        weights = [_leaf_count(fp) for fp in fine_params]
        self.groups = _balanced_groups(weights, n_stages)

        self.stage_params: List[Any] = []
        self.stage_fns = []
        for gi, grp in enumerate(self.groups):
            sub = {str(j): fine_params[j] for j in grp}
            self.stage_params.append(jax.device_put(sub, self.devices[gi]))

            def make_stage(grp=grp):
                def run(p, c):
                    for j in grp:
                        c = _RT_FINE_FNS[j](p[str(j)], c, self.nc, dtype)
                    return c
                return jax.jit(run)

            self.stage_fns.append(make_stage())

    _pick_microbatch = PipelinedYOLO._pick_microbatch

    def __call__(self, x) -> tuple:
        """(B, H, W, 3) float [0,1] → (boxes_xyxy normalized (B,NQ,4),
        scores (B,NQ,nc))."""
        x = jnp.asarray(x)
        mb = self._pick_microbatch(x.shape[0])
        outs = []
        for s in range(0, x.shape[0], mb):
            carry: Any = {"x": jax.device_put(x[s:s + mb], self.devices[0])}
            for i, (fn, sp) in enumerate(zip(self.stage_fns,
                                             self.stage_params)):
                if i:
                    carry = jax.tree_util.tree_map(
                        lambda a, d=self.devices[i]: jax.device_put(a, d),
                        carry)
                carry = fn(sp, carry)
            outs.append(carry)
        boxes = jnp.concatenate([o["boxes"] for o in outs])
        scores = jnp.concatenate([o["scores"] for o in outs])
        return boxes, scores
