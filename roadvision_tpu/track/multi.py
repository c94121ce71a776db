"""Multi-stream (multi-camera) tracking: vmap over independent SortStates.

The reference tracks one camera per process (single-threaded loop); here a
fleet of camera streams tracks in ONE device call — the per-stream SORT
step is pure and fixed-shape, so ``jax.vmap`` lifts it over a leading
stream axis for free. Combined with batch sharding over a mesh, streams
scale across chips with no code changes (SURVEY.md §2.5: batch/data
parallelism is the DP analog of this domain).

IDs are per-stream (each stream carries its own ``next_id``), matching N
independent reference trackers exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .sort_tpu import SortState, init_state, make_sort_step


def init_multi_state(num_streams: int, num_slots: int) -> SortState:
    """A stacked SortState with leading stream axis."""
    one = init_state(num_slots)
    return jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf, (num_streams,) + leaf.shape),
        one)


def make_multi_sort_step(iou_threshold: float, max_staleness: float,
                         speed_window: float, min_hits: int = 3,
                         with_projector: bool = False,
                         association: str = "greedy"):
    """step(states, boxes (S,D,4), cls (S,D), conf (S,D), valid (S,D),
    ts (S,), proj?) → (states, SortOutput stacked over S)."""
    step = make_sort_step(iou_threshold, max_staleness, speed_window,
                          min_hits, association=association)

    if with_projector:
        # same calibration for all streams (H, origin, maxd broadcast)
        def one(state, boxes, cls_id, conf, valid, ts, proj):
            return step(state, boxes, cls_id, conf, valid, ts, proj)
        return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, None)))

    def one(state, boxes, cls_id, conf, valid, ts):
        return step(state, boxes, cls_id, conf, valid, ts, None)
    return jax.jit(jax.vmap(one))
