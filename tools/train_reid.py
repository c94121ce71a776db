"""Train the learned re-id appearance embedder (track/reid.py).

Beyond-reference tooling (the reference has no re-id at all,
src/track/sort_tracker.py is motion-only). Trains the tiny metric
network on the self-contained synthetic identity generator and saves an
``.npz`` usable as ``tracking.reid_weights``:

  python tools/train_reid.py --steps 600 --out runs/reid.npz
  # then: tracking: {backend: deepsort, reid_weights: runs/reid.npz}

Prints the held-out identity-separation score (mean same-identity
cosine minus mean cross-identity cosine) before/after so a run is
self-validating.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from roadvision_tpu.utils import get_logger  # noqa: E402
from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

log = get_logger("roadvision.train_reid")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--idents", type=int, default=8,
                    help="identities per batch (P)")
    ap.add_argument("--views", type=int, default=4,
                    help="views per identity per batch (K)")
    ap.add_argument("--pool", type=int, default=128,
                    help="training identity pool size")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--margin", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/reid.npz")
    args = ap.parse_args(argv)

    from roadvision_tpu.track.reid import (identity_separation,
                                           init_reid_params,
                                           save_reid_params, train_reid)

    # held-out identities: disjoint from the training pool
    held_out = np.arange(args.pool, args.pool + 16)
    sep0 = identity_separation(init_reid_params(args.seed), held_out)
    log.info("held-out separation before training: %.3f", sep0)

    t0 = time.perf_counter()
    params, history = train_reid(
        steps=args.steps, idents=args.idents, views=args.views,
        ident_pool=args.pool, lr=args.lr, margin=args.margin,
        seed=args.seed, log_every=max(1, args.steps // 10), log=log.info)
    log.info("trained %d steps in %.1fs (triplet %.4f → %.4f)",
             args.steps, time.perf_counter() - t0,
             history[0], history[-1])

    sep1 = identity_separation(params, held_out)
    log.info("held-out separation after training:  %.3f (was %.3f)",
             sep1, sep0)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_reid_params(out, params)
    log.info("saved %s — use it via tracking.reid_weights", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
