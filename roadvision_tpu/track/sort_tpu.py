"""SORT multi-object tracking as a vectorized, jit-compiled TPU step.

Re-design of the reference tracker (src/track/sort_tracker.py) for XLA:
Python object lists become a fixed-capacity slot array (``SortState``) whose
entire update — Kalman predict, IoU matrix, greedy association, Kalman
update, metrics, pruning, track creation — is one traced function with
static shapes, suitable for ``jax.lax.scan`` over the time axis
(SURVEY.md §2.5: the "sequence dimension" of this domain is video time).

Exact behavioral parity with the reference's quirks (SURVEY.md §2.2):
  * measurement z = [cx, cy, s=w·h, r=w/h], w/h floored at 1e-3
    (sort_tracker.py:22-30); inverse with 1e-6 floors (:33-41);
  * 7-dim state [cx,cy,s,r,vcx,vcy,vs]; H = [I₄ 0]; R = diag(1,1,10,10);
    P₀ = diag(10,10,10,10,1e4,1e4,1e4) (:44-52);
  * real-timestamp dt, clamped ≥ 1e-3, rebuilt per step:
    F[0,4]=F[1,5]=F[2,6]=dt; Q = diag(.04dt², .04dt², .04dt², 0, dt, dt, dt)
    (:103-113) — note Q[3,3] = 0 (aspect has no process noise);
  * association is GREEDY global argmax over the IoU matrix (first-flat-index
    tie-breaking like np.argmax), accept while max ≥ iou_threshold, zero out
    row+col (:182-210) — NOT Hungarian;
  * every unmatched detection gets a new track and an ID immediately; IDs
    start at 1 and increment in detection order (:253-269) — min_hits is
    tracked but never gates output (:92-98,143-145);
  * unmatched tracks only reset hit_streak (:134-135); coasting tracks emit
    nothing;
  * prune when ts − last_update_ts > max_staleness (:271-276);
  * per-track metrics: ground-project the DET bbox bottom-center, distance
    clamped to max_distance, history windowed by speed_window seconds and
    capped at 32 entries, speed = first→last displacement / elapsed (≥1e-3 s)
    in m/s, ×3.6 for km/h (:147-168, :246-247);
  * KF update uses filterpy's Joseph-form covariance
    P ← (I−KH)P(I−KH)ᵀ + KRKᵀ.

Timestamps are float32 on device — callers must rebase to a small epoch
(the host wrapper subtracts the stream start time) because raw unix times
exceed f32 integer precision.

Capacity overflow (more simultaneous new detections than free slots) keeps
ID assignment identical but silently drops the overflow tracks — the
reference grows without bound; choose tpu.track_slots ≥ max_det for strict
parity.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

HISTORY = 32  # position history capacity (reference caps at 32, :158-159)
STATE_DIM = 7
MEAS_DIM = 4
# appearance-descriptor width (track/appearance.py; plain int here to
# keep this module import-light — the import-time assert below pins the
# two constants together so an EMB_GRID change cannot surface as an
# opaque shape error deep inside the traced step)
_EMB_DIM = 108
APP_EMA = 0.9  # matched-track appearance EMA factor (DeepSORT-style)


def _check_emb_dim() -> None:
    from .appearance import EMB_DIM
    assert EMB_DIM == _EMB_DIM, (
        f"appearance.EMB_DIM={EMB_DIM} != sort_tpu._EMB_DIM={_EMB_DIM}: "
        f"update both (SortState.app width must match the descriptor)")


_check_emb_dim()

_R = jnp.diag(jnp.array([1.0, 1.0, 10.0, 10.0], jnp.float32))
_P0 = jnp.diag(jnp.array([10.0, 10.0, 10.0, 10.0, 1e4, 1e4, 1e4], jnp.float32))
_I7 = jnp.eye(STATE_DIM, dtype=jnp.float32)
# E: positions of dt in F (cx←vcx, cy←vcy, s←vs)
_E = jnp.zeros((STATE_DIM, STATE_DIM), jnp.float32).at[0, 4].set(1.0) \
    .at[1, 5].set(1.0).at[2, 6].set(1.0)


class SortState(NamedTuple):
    mean: jnp.ndarray        # (T, 7) f32
    cov: jnp.ndarray         # (T, 7, 7) f32
    alive: jnp.ndarray       # (T,) bool
    ids: jnp.ndarray         # (T,) i32
    last_predict_ts: jnp.ndarray  # (T,) f32
    last_update_ts: jnp.ndarray   # (T,) f32
    hits: jnp.ndarray        # (T,) i32
    hit_streak: jnp.ndarray  # (T,) i32
    cls_id: jnp.ndarray      # (T,) i32
    conf: jnp.ndarray        # (T,) f32
    dist: jnp.ndarray        # (T,) f32 current_distance (NaN = None)
    speed: jnp.ndarray       # (T,) f32 current_speed m/s (NaN = None)
    hist_ts: jnp.ndarray     # (T, 32) f32 ring buffer
    hist_x: jnp.ndarray      # (T, 32) f32
    hist_y: jnp.ndarray      # (T, 32) f32
    hist_head: jnp.ndarray   # (T,) i32
    hist_len: jnp.ndarray    # (T,) i32
    next_id: jnp.ndarray     # () i32
    # observation memory (maintained for every backend; consumed by the
    # observation-centric strategies in ocsort.py — OCM velocity-direction
    # cost, OCR recovery on last observations, ORU virtual re-update from
    # the posterior snapshot at the last accepted observation)
    last_obs: jnp.ndarray    # (T, 4) f32 xyxy of the last observation
    last_obs_ts: jnp.ndarray  # (T,) f32
    prev_obs: jnp.ndarray    # (T, 4) f32 the observation before that
    prev_obs_ts: jnp.ndarray  # (T,) f32
    obs_mean: jnp.ndarray    # (T, 7) f32 KF posterior at last observation
    obs_cov: jnp.ndarray     # (T, 7, 7) f32
    # appearance memory (maintained whenever the step receives per-det
    # embeddings; consumed by the re-id association in deepsort.py) —
    # EMA of the matched detections' descriptors, L2-renormalized
    app: jnp.ndarray         # (T, appearance.EMB_DIM) f32


class SortOutput(NamedTuple):
    track_id: jnp.ndarray    # (D,) i32 (0 = no id / invalid det)
    distance_m: jnp.ndarray  # (D,) f32 (NaN = None)
    speed_kmh: jnp.ndarray   # (D,) f32 (NaN = None)


def init_state(num_slots: int) -> SortState:
    t = num_slots
    return SortState(
        mean=jnp.zeros((t, STATE_DIM), jnp.float32),
        cov=jnp.tile(_P0[None], (t, 1, 1)),
        alive=jnp.zeros((t,), bool),
        ids=jnp.zeros((t,), jnp.int32),
        last_predict_ts=jnp.zeros((t,), jnp.float32),
        last_update_ts=jnp.zeros((t,), jnp.float32),
        hits=jnp.zeros((t,), jnp.int32),
        hit_streak=jnp.zeros((t,), jnp.int32),
        cls_id=jnp.zeros((t,), jnp.int32),
        conf=jnp.zeros((t,), jnp.float32),
        dist=jnp.full((t,), jnp.nan, jnp.float32),
        speed=jnp.full((t,), jnp.nan, jnp.float32),
        hist_ts=jnp.zeros((t, HISTORY), jnp.float32),
        hist_x=jnp.zeros((t, HISTORY), jnp.float32),
        hist_y=jnp.zeros((t, HISTORY), jnp.float32),
        hist_head=jnp.zeros((t,), jnp.int32),
        hist_len=jnp.zeros((t,), jnp.int32),
        next_id=jnp.int32(1),  # IDs start at 1 (:180)
        last_obs=jnp.zeros((t, MEAS_DIM), jnp.float32),
        last_obs_ts=jnp.zeros((t,), jnp.float32),
        prev_obs=jnp.zeros((t, MEAS_DIM), jnp.float32),
        prev_obs_ts=jnp.zeros((t,), jnp.float32),
        obs_mean=jnp.zeros((t, STATE_DIM), jnp.float32),
        obs_cov=jnp.tile(_P0[None], (t, 1, 1)),
        app=jnp.zeros((t, _EMB_DIM), jnp.float32),
    )


def bbox_to_z(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy → (..., 4) [cx, cy, s, r] with 1e-3 floors (:22-30)."""
    w = jnp.maximum(1e-3, boxes[..., 2] - boxes[..., 0])
    h = jnp.maximum(1e-3, boxes[..., 3] - boxes[..., 1])
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return jnp.stack([cx, cy, w * h, w / h], axis=-1)


def x_to_bbox(mean: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) state → (..., 4) xyxy with 1e-6 floors (:33-41)."""
    cx, cy, s, r = mean[..., 0], mean[..., 1], mean[..., 2], mean[..., 3]
    w = jnp.sqrt(jnp.maximum(1e-6, s * r))
    h = s / jnp.maximum(1e-6, w)
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (Ta, 4) × (Db, 4) → (Ta, Db), one vectorized op.

    Replaces the reference's double Python loop (:73-80), its per-frame CPU
    hot spot. Degenerate denominators → 0 (:68-69).
    """
    ax1, ay1, ax2, ay2 = (a[:, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (b[None, :, i] for i in range(4))
    iw = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
    ih = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
    inter = iw * ih
    area_a = jnp.maximum(0.0, ax2 - ax1) * jnp.maximum(0.0, ay2 - ay1)
    area_b = jnp.maximum(0.0, bx2 - bx1) * jnp.maximum(0.0, by2 - by1)
    denom = area_a + area_b - inter
    return jnp.where(denom > 0.0, inter / jnp.where(denom > 0, denom, 1.0), 0.0)


def greedy_associate(iou: jnp.ndarray, alive: jnp.ndarray,
                     dvalid: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Greedy global-argmax matching (:197-208). Returns det→track (D,) i32,
    -1 for unmatched. First-flat-index tie-breaking matches np.argmax.

    Computed by parallel MUTUAL-MAXIMUM rounds instead of a
    min(T, D)-step sequential argmax loop: in each round, every pair
    that is simultaneously its row's and its column's (first-index)
    argmax is taken, then its row/column are retired. This is exactly
    the sequential greedy result — the global flat-first maximum is
    always mutual (a tied earlier index in its row or column would
    itself be the flat-first maximum), so each round takes precisely
    the pairs greedy would take consecutively without interference;
    induction over rounds gives equality, ties included. Round count =
    the longest strictly-descending dependency chain (typically 2-4)
    instead of up to min(T, D) = 100 sequential argmax steps; parity is
    pinned by the float64 oracle + stress tests (tests/test_sort*.py).
    """
    num_t, num_d = iou.shape
    masked = jnp.where(alive[:, None] & dvalid[None, :], iou, -1.0)
    t_ids = jnp.arange(num_t, dtype=jnp.int32)

    def cond(carry):
        _, _, changed = carry
        return changed

    def body(carry):
        mat, det2trk, _ = carry
        rbest = jnp.argmax(mat, axis=1)              # (T,) first-index
        cbest = jnp.argmax(mat, axis=0)              # (D,) first-index
        rval = jnp.max(mat, axis=1)
        mutual_t = (cbest[rbest] == t_ids) & (rval >= thresh) \
            & (rval > -0.5)
        # distinct columns among mutual rows → scatter-max is exact
        t_for_d = jnp.full((num_d,), -1, jnp.int32).at[rbest].max(
            jnp.where(mutual_t, t_ids, -1))
        taken_d = jnp.zeros((num_d,), bool).at[rbest].max(mutual_t)
        det2trk = jnp.where(taken_d & (det2trk < 0), t_for_d, det2trk)
        mat = jnp.where(mutual_t[:, None] | taken_d[None, :], -1.0, mat)
        return mat, det2trk, jnp.any(mutual_t)

    _, det2trk, _ = jax.lax.while_loop(
        cond, body,
        (masked, jnp.full((num_d,), -1, jnp.int32), jnp.bool_(True)))
    return det2trk


def auction_associate(iou: jnp.ndarray, alive: jnp.ndarray,
                      dvalid: jnp.ndarray, thresh: float,
                      eps: float = 0.01, max_iters: int = 512
                      ) -> jnp.ndarray:
    """Optimal-assignment association (the opt-in "hungarian" backend).

    Solves the linear assignment problem Hungarian-SORT variants feed to
    ``scipy.optimize.linear_sum_assignment`` (maximize total IoU over the
    full matrix, then reject matched pairs below ``thresh``), with the
    TPU-friendly **parallel ε-auction** (Bertsekas): every unassigned
    detection simultaneously bids ``best − second_best + ε`` for its
    best-value track; each track goes to its highest bidder. Fixed
    shapes, fixed iteration bound, pure vector ops — scan/jit-friendly.

    D dummy columns (value −1, rejected by the threshold afterwards)
    guarantee every valid detection can terminate assigned even when
    detections outnumber alive tracks. A single ε is used — ε-scaling
    with carried prices is unsound for asymmetric problems (unassigned
    columns keep inflated prices across rounds). At termination the
    total value is within D·ε of the exact optimum; sub-ε ties may
    resolve differently than scipy's solver — bounded and compared in
    tests/test_hungarian.py. IoU matrices from tracking are near-sparse
    (each det overlaps few tracks), so convergence is typically a
    handful of iterations; max_iters is a hard safety bound. Same
    return contract as :func:`greedy_associate`: det→track (D,), -1
    unmatched.
    """
    num_t, num_d = iou.shape
    neg = jnp.float32(-1e9)
    cols = num_t + num_d
    col_ids = jnp.arange(cols)
    det_ids = jnp.arange(num_d)
    # (D, T+D): eligible real edges, then the shared dummy pool at −1
    w_real = jnp.where(alive[:, None] & dvalid[None, :], iou, neg).T
    w = jnp.concatenate(
        [w_real, jnp.full((num_d, num_d), -1.0, jnp.float32)], axis=1)

    def run_auction(eps, prices):
        def body(carry):
            it, prices, assigned = carry
            values = w - prices[None, :]                   # (D, T+D)
            best_c = jnp.argmax(values, axis=1)            # (D,)
            v1 = jnp.max(values, axis=1)
            rest = values.at[det_ids, best_c].set(neg)
            v2 = jnp.max(rest, axis=1)
            bidding = (assigned < 0) & dvalid
            incr = v1 - v2 + eps
            bid_mat = jnp.where(
                bidding[:, None] & (best_c[:, None] == col_ids[None, :]),
                incr[:, None], -jnp.inf)
            top_bid = jnp.max(bid_mat, axis=0)             # (T+D,)
            winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
            has_bid = top_bid > -jnp.inf
            prices = jnp.where(has_bid, prices + top_bid, prices)
            # evict owners of re-auctioned columns that lost to a new bid
            own_c = jnp.clip(assigned, 0, cols - 1)
            evicted = (assigned >= 0) & has_bid[own_c] \
                & (winner[own_c] != det_ids)
            assigned = jnp.where(evicted, -1, assigned)
            won = bidding & has_bid[best_c] & (winner[best_c] == det_ids)
            assigned = jnp.where(won, best_c.astype(jnp.int32), assigned)
            return it + 1, prices, assigned

        def cond(carry):
            it, _, assigned = carry
            return (it < max_iters) & jnp.any(dvalid & (assigned < 0))

        _, prices, assigned = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), prices, jnp.full((num_d,), -1, jnp.int32)))
        return prices, assigned

    _, assigned = run_auction(float(eps), jnp.zeros((cols,), jnp.float32))

    # dummy columns and below-threshold / ineligible pairs are unmatched
    real = (assigned >= 0) & (assigned < num_t)
    trk = jnp.clip(assigned, 0, num_t - 1)
    good = real & (iou.T[det_ids, trk] >= thresh) & alive[trk] & dvalid
    return jnp.where(good, trk, -1)


def _kf_predict(mean, cov, dt):
    """Batched KF predict with per-track dt (already clamped)."""
    f = _I7[None] + dt[:, None, None] * _E[None]
    q_diag = jnp.stack([0.04 * dt * dt] * 3 + [jnp.zeros_like(dt)]
                       + [dt] * 3, axis=-1)
    new_mean = jnp.einsum("tij,tj->ti", f, mean)
    new_cov = jnp.einsum("tij,tjk,tlk->til", f, cov, f) \
        + q_diag[:, :, None] * _I7[None]
    return new_mean, new_cov


def _kf_update(mean, cov, z, r_scale=None):
    """Batched KF update, H = [I4 0], Joseph-form covariance (filterpy).

    ``r_scale`` (T,) optionally scales the measurement noise per track —
    the NSA Kalman of GIAOTracker/StrongSORT (Du et al.): R̃ = (1−conf)·R,
    so confident detections correct the state harder. None = plain R."""
    if r_scale is None:
        r = jnp.broadcast_to(_R[None], (mean.shape[0],) + _R.shape)
    else:
        r = r_scale[:, None, None] * _R[None]
    ph = cov[:, :, :MEAS_DIM]                      # P Hᵀ (T,7,4)
    s = cov[:, :MEAS_DIM, :MEAS_DIM] + r           # (T,4,4)
    k = jnp.linalg.solve(s, ph.transpose(0, 2, 1)).transpose(0, 2, 1)  # (T,7,4)
    innov = z - mean[:, :MEAS_DIM]
    new_mean = mean + jnp.einsum("tij,tj->ti", k, innov)
    kh = jnp.zeros_like(cov).at[:, :, :MEAS_DIM].set(k)
    i_kh = _I7[None] - kh
    new_cov = jnp.einsum("tij,tjk,tlk->til", i_kh, cov, i_kh) \
        + jnp.einsum("tij,tjk,tlk->til", k, r, k)
    return new_mean, new_cov


def nsa_r_scale(conf):
    """NSA measurement-noise scale (1 − conf), floored for numerical
    safety at conf → 1 (R must stay positive definite)."""
    return jnp.maximum(1.0 - conf, 1e-3)


def _history_append_and_window(state: SortState, sel, ts, gx, gy, window):
    """Append (ts, gx, gy) to selected tracks' ring buffers, expire entries
    older than `window` seconds, and compute the windowed speed (:147-168)."""
    t_slots = state.hist_ts.shape[0]
    head, length = state.hist_head, state.hist_len
    full = length >= HISTORY
    # append position: one past the last entry; on a full buffer that wraps
    # onto the oldest entry, which is dropped (cap-at-32 semantics)
    write_pos = (head + length) % HISTORY
    head_after = jnp.where(sel & full, (head + 1) % HISTORY, head)
    len_after = jnp.where(sel & ~full, length + 1, length)

    rows = jnp.arange(t_slots)
    hist_ts = state.hist_ts.at[rows, write_pos].set(
        jnp.where(sel, ts, state.hist_ts[rows, write_pos]))
    hist_x = state.hist_x.at[rows, write_pos].set(
        jnp.where(sel, gx, state.hist_x[rows, write_pos]))
    hist_y = state.hist_y.at[rows, write_pos].set(
        jnp.where(sel, gy, state.hist_y[rows, write_pos]))

    # expire the (time-ordered) prefix strictly older than the window
    slot = jnp.arange(HISTORY)[None, :]
    order = (slot - head_after[:, None]) % HISTORY
    in_buf = order < len_after[:, None]
    expired = in_buf & ((ts - hist_ts) > window)
    n_exp = jnp.sum(expired, axis=-1).astype(jnp.int32)
    head_new = jnp.where(sel, (head_after + n_exp) % HISTORY, head_after)
    len_new = jnp.where(sel, len_after - n_exp, len_after)

    # speed from first→last surviving entries
    first = head_new
    last = (head_new + jnp.maximum(len_new - 1, 0)) % HISTORY
    t0 = hist_ts[rows, first]
    t1 = hist_ts[rows, last]
    dx = hist_x[rows, last] - hist_x[rows, first]
    dy = hist_y[rows, last] - hist_y[rows, first]
    spd = jnp.hypot(dx, dy) / jnp.maximum(1e-3, t1 - t0)
    speed = jnp.where(len_new >= 2, spd, jnp.nan)

    return state._replace(hist_ts=hist_ts, hist_x=hist_x, hist_y=hist_y,
                          hist_head=head_new, hist_len=len_new), speed


def make_sort_step(iou_threshold: float, max_staleness: float,
                   speed_window: float, min_hits: int = 3,
                   association: str = "greedy",
                   associate_fn=None, new_track_fn=None, update_fn=None,
                   nsa: bool = False):
    """Build the jit-traceable single-frame SORT step.

    Returned signature:
      step(state, boxes (D,4), cls (D,), conf (D,), dvalid (D,), ts (),
           proj, emb=None, shift=None) -> (state', SortOutput)
    where proj is None (no projector) or (H (3,3), origin (2,), maxd ()),
    emb is an optional (D, appearance.EMB_DIM) per-detection appearance
    descriptor batch — when given, ``state.app`` is maintained (EMA on
    match, set on create) and the descriptors reach ``associate_fn``
    through ctx (the re-id seam deepsort.py plugs into) — and shift is
    an optional (2,) source-px camera translation since the previous
    frame (track/gmc.py) applied to the position memory pre-predict.

    ``association``: "greedy" (the reference's behavior, default) or
    "hungarian" (optimal assignment via the ε-auction,
    :func:`auction_associate`).

    Strategy hooks (the extension seam other trackers plug into —
    bytetrack.py and ocsort.py build their steps entirely from these):
      ``associate_fn(iou (T,D), alive (T,), dvalid (D,), conf (D,), ctx)
      → det→track (D,) i32, -1 unmatched`` replaces the association
      stage (``association`` is then ignored); ``ctx`` is
      ``(state, boxes, ts, emb)`` with state post-predict, pre-update —
      observation-centric strategies read the obs memory from it, re-id
      strategies the appearance memory + per-det ``emb`` (None when the
      caller supplies no embeddings);
      ``new_track_fn(dvalid, matched_d, conf) → (D,) bool`` replaces
      the new-track eligibility mask (default: every unmatched valid
      detection — the reference's immediate-ID behavior);
      ``update_fn(state, boxes, det_idx (T,), matched_t (T,), ts,
      conf (D,)) → (mean (T,7), cov (T,7,7))`` replaces the measurement
      update
      (default: one batched Joseph-form KF update; ocsort.py's ORU
      re-runs virtual updates from the last-observation posterior).
      Callers mask the result by ``matched_t`` — rows of unmatched
      tracks are ignored.
    """
    thresh = float(iou_threshold)
    staleness = float(max_staleness)
    window = max(0.05, float(speed_window))  # _Track floor (:93)
    del min_hits  # tracked in state but never gates output (parity quirk)
    if associate_fn is None:
        if association not in ("greedy", "hungarian"):
            raise ValueError(f"unknown association: {association!r} "
                             f"(expected 'greedy' or 'hungarian')")
        base_assoc = greedy_associate if association == "greedy" \
            else auction_associate

        def associate_fn(iou, alive, dvalid, conf, ctx):
            del conf, ctx
            return base_assoc(iou, alive, dvalid, thresh)
    if new_track_fn is None:
        def new_track_fn(dvalid, matched_d, conf):
            del conf
            return dvalid & ~matched_d
    use_nsa = bool(nsa)
    if update_fn is None:
        def update_fn(state, boxes, det_idx, matched_t, ts, conf):
            del matched_t, ts
            z = bbox_to_z(boxes)[det_idx]
            scale = nsa_r_scale(conf[det_idx]) if use_nsa else None
            return _kf_update(state.mean, state.cov, z, scale)

    from ..geometry.projector import project_boxes_device

    def step(state: SortState, boxes, cls_id, conf, dvalid, ts, proj=None,
             emb=None, shift=None):
        num_t = state.mean.shape[0]
        num_d = boxes.shape[0]
        rows = jnp.arange(num_t)

        # 0. global-motion compensation (optional, track/gmc.py): the
        # camera moved by ``shift`` (2,) source px since the previous
        # frame — translate every track's position memory so the motion
        # model stays scene-relative (BoT-SORT's GMC in translation form)
        if shift is not None:
            d4 = jnp.concatenate([shift, shift])            # xyxy boxes
            state = state._replace(
                mean=state.mean.at[:, :2].add(shift[None]),
                obs_mean=state.obs_mean.at[:, :2].add(shift[None]),
                last_obs=state.last_obs + d4[None],
                prev_obs=state.prev_obs + d4[None],
            )

        # 1. predict all alive tracks at frame ts (:228-229)
        dt = jnp.maximum(1e-3, ts - state.last_predict_ts)
        pmean, pcov = _kf_predict(state.mean, state.cov, dt)
        mean = jnp.where(state.alive[:, None], pmean, state.mean)
        cov = jnp.where(state.alive[:, None, None], pcov, state.cov)
        last_predict_ts = jnp.where(state.alive, ts, state.last_predict_ts)
        state = state._replace(mean=mean, cov=cov,
                               last_predict_ts=last_predict_ts)

        # 2. association on IoU of predicted boxes vs det boxes (greedy
        # default — reference behavior; "hungarian" = ε-auction LAP;
        # custom associate_fn = plugin strategies like ByteTrack's
        # two-stage high/low split)
        track_boxes = x_to_bbox(state.mean)
        det2trk = associate_fn(iou_matrix(track_boxes, boxes),
                               state.alive, dvalid, conf,
                               (state, boxes, ts, emb))
        matched_d = det2trk >= 0
        # inverse map track→det (association is one-to-one); unmatched dets
        # scatter out-of-bounds and are dropped
        trk2det = jnp.full((num_t,), -1, jnp.int32).at[
            jnp.where(matched_d, det2trk, num_t)
        ].set(jnp.arange(num_d, dtype=jnp.int32), mode="drop")
        matched_t = trk2det >= 0

        # 3. measurement update for matched tracks (:234-238) — default
        # one batched KF update; update_fn hook may substitute (ORU)
        det_idx = jnp.clip(trk2det, 0, num_d - 1)
        umean, ucov = update_fn(state, boxes, det_idx, matched_t, ts, conf)
        sel_t = matched_t[:, None]
        state = state._replace(
            mean=jnp.where(sel_t, umean, state.mean),
            cov=jnp.where(matched_t[:, None, None], ucov, state.cov),
            last_update_ts=jnp.where(matched_t, ts, state.last_update_ts),
            hits=state.hits + matched_t.astype(jnp.int32),
            hit_streak=jnp.where(matched_t, state.hit_streak + 1,
                                 jnp.where(state.alive, 0, state.hit_streak)),
            cls_id=jnp.where(matched_t, cls_id[det_idx], state.cls_id),
            conf=jnp.where(matched_t, conf[det_idx], state.conf),
            # observation memory: shift last→prev, record the accepted
            # det box and the post-update posterior snapshot
            prev_obs=jnp.where(sel_t, state.last_obs, state.prev_obs),
            prev_obs_ts=jnp.where(matched_t, state.last_obs_ts,
                                  state.prev_obs_ts),
            last_obs=jnp.where(sel_t, boxes[det_idx], state.last_obs),
            last_obs_ts=jnp.where(matched_t, ts, state.last_obs_ts),
            obs_mean=jnp.where(sel_t, umean, state.obs_mean),
            obs_cov=jnp.where(matched_t[:, None, None], ucov,
                              state.obs_cov),
        )
        if emb is not None:
            # appearance EMA on matched tracks, renormalized; a track
            # whose memory is still empty adopts the det descriptor
            mixed = APP_EMA * state.app + (1.0 - APP_EMA) * emb[det_idx]
            empty = jnp.sum(state.app * state.app, axis=-1) < 1e-9
            mixed = jnp.where(empty[:, None], emb[det_idx], mixed)
            nrm = jnp.sqrt(jnp.sum(mixed * mixed, axis=-1, keepdims=True))
            mixed = mixed / jnp.maximum(nrm, 1e-6)
            state = state._replace(
                app=jnp.where(sel_t, mixed, state.app))

        # 4. metrics for matched tracks using the DET bbox (:239-247)
        if proj is not None:
            h_mat, origin, maxd = proj
            ground, gvalid = project_boxes_device(h_mat, boxes[det_idx])
            ok = matched_t & gvalid
            gdist = jnp.minimum(
                jnp.hypot(ground[:, 0] - origin[0], ground[:, 1] - origin[1]),
                maxd)
            # ground invalid → distance/speed None, history untouched (:149-152)
            new_dist = jnp.where(ok, gdist,
                                 jnp.where(matched_t, jnp.nan, state.dist))
            state, w_speed = _history_append_and_window(
                state, ok, ts, ground[:, 0], ground[:, 1], window)
            new_speed = jnp.where(ok, w_speed,
                                  jnp.where(matched_t, jnp.nan, state.speed))
            state = state._replace(dist=new_dist, speed=new_speed)

        # 5. prune stale tracks (:271-276) — before creation so freed slots
        # are reusable this frame; observably identical order (SURVEY §2.2)
        state = state._replace(
            alive=state.alive & ((ts - state.last_update_ts) <= staleness))

        # 6. create tracks for unmatched valid dets, IDs in det order (:253-269)
        is_new = new_track_fn(dvalid, matched_d, conf)
        rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # (D,)
        new_ids = state.next_id + rank
        free_order = jnp.argsort(state.alive.astype(jnp.int32),
                                 stable=True)  # free slots first, index order
        n_free = jnp.sum(~state.alive)
        fits = is_new & (rank < n_free)
        slot = jnp.where(fits, free_order[jnp.clip(rank, 0, num_t - 1)], num_t)

        znew = bbox_to_z(boxes)
        init_mean = jnp.concatenate(
            [znew, jnp.zeros((num_d, 3), jnp.float32)], axis=-1)
        state = state._replace(
            mean=state.mean.at[slot].set(init_mean, mode="drop"),
            cov=state.cov.at[slot].set(_P0[None], mode="drop"),
            alive=state.alive.at[slot].set(True, mode="drop"),
            ids=state.ids.at[slot].set(new_ids, mode="drop"),
            last_predict_ts=state.last_predict_ts.at[slot].set(ts, mode="drop"),
            last_update_ts=state.last_update_ts.at[slot].set(ts, mode="drop"),
            hits=state.hits.at[slot].set(1, mode="drop"),
            hit_streak=state.hit_streak.at[slot].set(1, mode="drop"),
            cls_id=state.cls_id.at[slot].set(cls_id, mode="drop"),
            conf=state.conf.at[slot].set(conf, mode="drop"),
            dist=state.dist.at[slot].set(jnp.nan, mode="drop"),
            speed=state.speed.at[slot].set(jnp.nan, mode="drop"),
            hist_head=state.hist_head.at[slot].set(0, mode="drop"),
            hist_len=state.hist_len.at[slot].set(0, mode="drop"),
            next_id=state.next_id + jnp.sum(is_new, dtype=jnp.int32),
            # first observation: prev == last (no velocity yet — the
            # obs-centric consumers gate on hits >= 2)
            last_obs=state.last_obs.at[slot].set(boxes, mode="drop"),
            last_obs_ts=state.last_obs_ts.at[slot].set(ts, mode="drop"),
            prev_obs=state.prev_obs.at[slot].set(boxes, mode="drop"),
            prev_obs_ts=state.prev_obs_ts.at[slot].set(ts, mode="drop"),
            obs_mean=state.obs_mean.at[slot].set(init_mean, mode="drop"),
            obs_cov=state.obs_cov.at[slot].set(_P0[None], mode="drop"),
            app=(state.app.at[slot].set(emb, mode="drop")
                 if emb is not None else state.app),
        )

        # metrics for brand-new tracks (first history entry; speed None,
        # single-point history — :261-266)
        if proj is not None:
            h_mat, origin, maxd = proj
            ground_d, gvalid_d = project_boxes_device(h_mat, boxes)
            created_t = jnp.zeros((num_t,), bool).at[slot].set(fits, mode="drop")
            src_det = jnp.full((num_t,), 0, jnp.int32).at[slot].set(
                jnp.arange(num_d, dtype=jnp.int32), mode="drop")
            okc = created_t & gvalid_d[src_det]
            gdist_t = jnp.minimum(
                jnp.hypot(ground_d[src_det, 0] - origin[0],
                          ground_d[src_det, 1] - origin[1]), maxd)
            state = state._replace(
                dist=jnp.where(okc, gdist_t,
                               jnp.where(created_t, jnp.nan, state.dist)))
            state, _ = _history_append_and_window(
                state, okc, ts, ground_d[src_det, 0], ground_d[src_det, 1],
                window)

        # 7. per-detection outputs
        trk_of_d = jnp.clip(det2trk, 0, num_t - 1)
        out_id = jnp.where(matched_d, state.ids[trk_of_d],
                           jnp.where(is_new, new_ids, 0))
        if proj is not None:
            slot_of_new = jnp.clip(slot, 0, num_t - 1)
            out_dist = jnp.where(
                matched_d, state.dist[trk_of_d],
                jnp.where(fits, state.dist[slot_of_new], jnp.nan))
            out_spd = jnp.where(
                matched_d, state.speed[trk_of_d],
                jnp.where(fits, state.speed[slot_of_new], jnp.nan))
        else:
            out_dist = jnp.full((num_d,), jnp.nan, jnp.float32)
            out_spd = jnp.full((num_d,), jnp.nan, jnp.float32)
        out = SortOutput(
            track_id=jnp.where(dvalid, out_id, 0).astype(jnp.int32),
            distance_m=jnp.where(dvalid, out_dist, jnp.nan),
            speed_kmh=jnp.where(dvalid, out_spd * 3.6, jnp.nan),
        )
        return state, out

    return step


def make_sort_scan(iou_threshold: float, max_staleness: float,
                   speed_window: float, min_hits: int = 3,
                   with_projector: bool = False):
    """lax.scan over a frame sequence: (state, (boxes (F,D,4), cls, conf,
    valid, ts (F,)), proj?) → (state, SortOutput stacked over F)."""
    step = make_sort_step(iou_threshold, max_staleness, speed_window, min_hits)

    @functools.partial(jax.jit, static_argnames=())
    def scan(state: SortState, boxes, cls_id, conf, dvalid, ts, proj=None):
        def body(st, frame):
            b, c, cf, v, t = frame
            return step(st, b, c, cf, v, t,
                        proj if with_projector else None)
        return jax.lax.scan(body, state, (boxes, cls_id, conf, dvalid, ts))

    return scan
