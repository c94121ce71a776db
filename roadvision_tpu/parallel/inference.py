"""Multi-chip *inference* scale-out: camera streams sharded over a mesh.

SURVEY.md §2.5: the DP analog of this domain is independent camera
streams — each stream carries its own SORT state and scans its own time
axis, so stream-parallelism needs NO collectives at all (detection params
are replicated; XLA broadcasts them once). The full fused pipeline step
(preprocess → letterbox → YOLO → NMS → SORT scan → geometry) is vmapped
over a leading stream axis and the stream axis is sharded over the mesh's
"data" axis: 8 chips run 8× the streams at the single-chip rate.

Within one stream the batch axis is TIME (the SORT scan is sequential),
so sharding streams — not frames — is the correct data-parallel cut; it
is also exactly how a fleet deployment maps cameras to chips.

The per-stream step is engine.build_raw_step, i.e. the SAME traced code
as single-chip — the correctness test asserts bit-identical outputs
between the sharded mesh run and per-stream single-device runs.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..track.multi import init_multi_state
from .sharding import replicated


def _stream_sharding(mesh: Mesh, axis: str = "data"):
    """Leading-axis sharding for stacked per-stream pytree leaves."""
    def leaf_spec(leaf):
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
    return leaf_spec


def make_sharded_stream_step(engine, shape: Tuple[int, int, int],
                             mesh: Mesh, axis: str = "data"):
    """Build (step, init_states) for S-stream inference over ``mesh``.

    Args:
      engine: a PipelineEngine (its config defines the per-stream step).
      shape: per-stream (batch, H, W) — batch is the time axis.
      mesh: device mesh; streams shard over ``axis``.

    Returns:
      step(params, states, frames (S, B, H, W, 3) u8, ts (S, B))
        → (outs stacked over S, states'), jitted with stream shardings.
      init_states(num_streams) → stacked SortState sharded over the mesh.
    """
    raw = engine.build_raw_step(shape, want_proc=False)
    gmc = bool(getattr(engine, "gmc_enabled", False))

    if gmc:
        # per-stream camera-motion compensation: each stream carries its
        # own previous-frame thumbnail (S, G, G), sharded with the rest
        def one(params, state, frames, ts, gprev, gvalid):
            _, outs, state, gray = raw(params, state, frames, ts,
                                       gprev, gvalid)
            return outs, state, gray

        vstep = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, None))
    else:
        def one(params, state, frames, ts):
            _, outs, state = raw(params, state, frames, ts)
            return outs, state

        vstep = jax.vmap(one, in_axes=(None, 0, 0, 0))

    spec = _stream_sharding(mesh, axis)
    rep = replicated(mesh)

    def constrain(tree):
        return jax.tree_util.tree_map(
            lambda leaf: jax.lax.with_sharding_constraint(leaf, spec(leaf)),
            tree)

    @jax.jit
    def step(params, states, frames, ts, gprev=None, gvalid=None):
        params = jax.tree_util.tree_map(
            lambda leaf: jax.lax.with_sharding_constraint(leaf, rep), params)
        states = constrain(states)
        frames = jax.lax.with_sharding_constraint(frames, spec(frames))
        if gmc:
            gprev = jax.lax.with_sharding_constraint(gprev, spec(gprev))
            outs, states, gray = vstep(params, states, frames, ts,
                                       gprev, gvalid)
            return (constrain(outs), constrain(states),
                    jax.lax.with_sharding_constraint(gray, spec(gray)))
        outs, states = vstep(params, states, frames, ts)
        return constrain(outs), constrain(states)

    def init_states(num_streams: int):
        states = init_multi_state(num_streams, engine.track_slots)
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, spec(leaf)), states)

    return step, init_states
