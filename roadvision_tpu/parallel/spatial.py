"""Spatial partitioning (SP): ONE frame's rows sharded over the mesh.

The reference has zero parallelism (SURVEY.md §2.5); the other parallel
axes here scale *throughput* (streams/dp, tensor/tp, pipeline/pp). This
module scales single-frame *latency*: for very large frames (4K/8K
aerial or gigapixel traffic mosaics) the image height axis is sharded
over the mesh, so each chip convolves a horizontal band and XLA's SPMD
partitioner inserts the halo exchanges (`collective-permute` of the
kernel-overlap rows over ICI) between bands. No hand-written
collectives: the model body is the SAME forward graph as single-chip
(models/yolo/yolov8.py); only the in/out shardings differ — the
XLA-idiomatic formulation of what a CUDA framework would hand-roll as
ring halo kernels.

Where each output lands:
  * convolutions / pools keep the H axis sharded (halo exchange);
  * the detect head's (B, h*w, ·) flatten re-shards to replicated —
    the head tensors are tiny (≤8400 anchors), so the gather is noise;
  * returned boxes/scores are replicated, ready for host NMS decode.

Divisibility: XLA handles uneven shards (it pads internally), so any H
works, but bands of at least 32 rows per device (one stride-32 cell)
keep every level genuinely partitioned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import replicated


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC images: shard H (axis 1) over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(None, axis, None, None))


def make_spatial_forward(size: str, nc: int, mesh: Mesh,
                         axis: str = "data", dtype=jnp.float32):
    """Jitted YOLO forward with the input image spatially sharded.

    Returns ``fwd(params, x)`` where x is (B, H, W, 3) float in [0, 1]
    with rows sharded over ``mesh[axis]``; output (boxes (B, N, 4),
    scores (B, N, nc)) is replicated. Params are replicated (every chip
    needs the full kernels for its band).
    """
    from ..models.yolo import yolov8

    rep = replicated(mesh)
    xsh = spatial_sharding(mesh, axis)

    @functools.partial(jax.jit, in_shardings=(rep, xsh),
                       out_shardings=(rep, rep))
    def fwd(params, x):
        x = jax.lax.with_sharding_constraint(x, xsh)
        return yolov8.forward_raw(params, x, size, nc, dtype=dtype)

    def run(params, x):
        x = jax.device_put(jnp.asarray(x), xsh)
        return fwd(params, x)

    run.jitted = fwd  # exposed for the HLO mechanism guards
    return run
