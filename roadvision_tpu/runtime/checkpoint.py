"""Checkpoint/resume for model + training state.

The reference persists nothing (SURVEY.md §5 — its recorder is dead code).
Here: model params round-trip through the portable .npz format
(models/yolo/weights.py), and full training state (params + momentum +
step counter) checkpoints via orbax when available with an .npz fallback —
so training runs survive restarts on any host.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..models.yolo import weights as yolo_weights

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    _HAS_ORBAX = False


def save_train_state(path: str, params, momentum, step: int,
                     use_orbax: Optional[bool] = None) -> str:
    """Persist training state; returns the path written."""
    p = Path(path)
    if use_orbax is None:
        use_orbax = _HAS_ORBAX and p.suffix == ""
    if use_orbax:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(p.resolve(), {"params": params, "momentum": momentum,
                                 "step": np.int64(step)}, force=True)
        ckptr.wait_until_finished()
        return str(p)
    p = p if p.suffix == ".npz" else p.with_suffix(".npz")
    p.parent.mkdir(parents=True, exist_ok=True)
    yolo_weights.export_npz({"P": params, "M": momentum,
                             "meta": {"step": np.asarray(step)}}, p)
    return str(p)


def load_train_state(path: str, shardings: Any = None,
                     mom_shardings: Any = None) -> Tuple[Any, Any, int]:
    """Load (params, momentum, step) saved by :func:`save_train_state`.

    ``shardings``: optional pytree of NamedShardings matching the params
    structure (e.g. ``parallel.param_shardings``) — applied to params AND
    momentum. ``mom_shardings`` overrides the momentum-slot shardings
    when its pytree structure differs from the params' (the rtdetr AdamW
    state dict). On the orbax path the restore is *sharded*: each leaf is
    materialized directly with its target sharding (on real multi-host
    meshes every process reads only its shards); the npz fallback loads
    host-side then device_puts per leaf.
    """
    p = Path(path)
    if mom_shardings is None:
        mom_shardings = shardings
    if p.is_dir():
        if not _HAS_ORBAX:
            raise RuntimeError("orbax checkpoint dir but orbax unavailable")
        ckptr = ocp.StandardCheckpointer()
        if shardings is None:
            state = ckptr.restore(p.resolve())
        else:
            meta = ckptr.metadata(p.resolve()).item_metadata.tree

            def abstract(m, s=None):
                return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                            sharding=s)

            target = {
                "params": jax.tree_util.tree_map(
                    abstract, meta["params"], shardings),
                "momentum": jax.tree_util.tree_map(
                    abstract, meta["momentum"], mom_shardings),
                "step": abstract(meta["step"]),
            }
            state = ckptr.restore(p.resolve(), target)
        return state["params"], state["momentum"], int(state["step"])
    tree = yolo_weights.import_npz(p if p.suffix == ".npz"
                                   else p.with_suffix(".npz"))
    params, momentum = tree["P"], tree["M"]
    if shardings is not None:
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        momentum = jax.tree_util.tree_map(jax.device_put, momentum,
                                          mom_shardings)
    return params, momentum, int(np.asarray(tree["meta"]["step"]))
