"""Multi-chip scaling via jax.sharding over a device Mesh.

The reference has zero parallelism (SURVEY.md §2.5); the TPU-native scaling
story is:

  * **data parallelism** — the frame/image batch axis sharded over the
    "data" mesh axis; XLA inserts the gradient psum over ICI;
  * **tensor parallelism** — conv output channels (and matching biases)
    sharded over the "model" axis for the wide layers; XLA propagates the
    sharding through the network and places all-gathers/reduce-scatters
    where layouts change;
  * single-chip needs no collectives at all (the default path).

Everything is expressed as NamedShardings + `with_sharding_constraint`;
there are no hand-written collectives in the model code — that is the
XLA-idiomatic design (compiler-scheduled comms overlap).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    mp = max(1, model_parallel)
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    grid = np.asarray(devs).reshape(n // mp, mp)
    return Mesh(grid, axes)


def batch_sharding(mesh: Mesh, ndim: int = 4,
                   axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, axis: str = "model",
                    min_channels: int = 64):
    """Tensor-parallel sharding rules for the YOLO param pytree.

    Conv kernels (H, W, I, O): shard O over the model axis when divisible
    and wide enough; biases (O,) follow their kernel. Everything else is
    replicated. XLA inserts the collectives where a sharded-O output feeds
    a replicated-I consumer.
    """
    mp = mesh.shape[axis]

    def rule(leaf):
        if leaf.ndim == 4:  # HWIO conv kernel
            o = leaf.shape[3]
            if mp > 1 and o % mp == 0 and o >= min_channels:
                return NamedSharding(mesh, P(None, None, None, axis))
        if leaf.ndim == 1:
            o = leaf.shape[0]
            if mp > 1 and o % mp == 0 and o >= min_channels:
                return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_pytree(tree, shardings):
    """Device-put a pytree with per-leaf shardings."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
