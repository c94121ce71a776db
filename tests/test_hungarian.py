"""The opt-in "hungarian" association backend (ε-auction LAP solver).

Checks auction_associate against scipy.optimize.linear_sum_assignment
(the exact Hungarian solver the classic SORT uses) and pins the
one-to-one / threshold / swap semantics where greedy and optimal
assignment genuinely differ. Reference behavior stays greedy
(src/track/sort_tracker.py:182-210); this backend is a TPU-native
extension (tracking.association: "hungarian").
"""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from roadvision_tpu.track.sort_tpu import (auction_associate,
                                           greedy_associate, init_state,
                                           make_sort_step)


def _scipy_det2trk(iou, alive, dvalid, thresh):
    """Exact reference: LAP on the eligible matrix, then reject < thresh."""
    T, D = iou.shape
    w = np.where(alive[:, None] & dvalid[None, :], iou, -1e9)
    rows, cols = linear_sum_assignment(-w.T)  # rows = dets, cols = tracks
    out = np.full(D, -1, np.int32)
    for d, t in zip(rows, cols):
        if w[t, d] > -1e8 and iou[t, d] >= thresh:
            out[d] = t
    return out


def _total(iou, det2trk):
    return sum(iou[t, d] for d, t in enumerate(det2trk) if t >= 0)


@pytest.mark.parametrize("seed", range(6))
def test_auction_matches_scipy_on_random_matrices(seed):
    rng = np.random.RandomState(seed)
    T, D = 12, 9
    iou = rng.rand(T, D).astype(np.float32)
    alive = rng.rand(T) < 0.8
    dvalid = rng.rand(D) < 0.9
    thresh = 0.3

    got = np.asarray(auction_associate(
        jnp.asarray(iou), jnp.asarray(alive), jnp.asarray(dvalid), thresh))
    want = _scipy_det2trk(iou, alive, dvalid, thresh)

    # one-to-one
    matched = got[got >= 0]
    assert len(set(matched.tolist())) == len(matched)
    # every match eligible and above threshold
    for d, t in enumerate(got):
        if t >= 0:
            assert alive[t] and dvalid[d] and iou[t, d] >= thresh
    # total value within the documented D·ε bound of the exact optimum
    assert _total(iou, got) >= _total(iou, want) - D * 0.01 - 1e-5


def test_auction_beats_greedy_on_the_classic_swap_case():
    """Greedy takes the single best edge and starves the neighbor;
    the optimal assignment swaps for a higher total."""
    # tracks 0,1 × dets 0,1: greedy picks (t0,d0)=0.9 then (t1,d1)=0.4;
    # optimal is (t0,d1)=0.8 + (t1,d0)=0.7 = 1.5 > 1.3
    iou = np.array([[0.9, 0.8],
                    [0.7, 0.4]], np.float32)
    alive = np.ones(2, bool)
    dvalid = np.ones(2, bool)

    g = np.asarray(greedy_associate(jnp.asarray(iou), jnp.asarray(alive),
                                    jnp.asarray(dvalid), 0.3))
    a = np.asarray(auction_associate(jnp.asarray(iou), jnp.asarray(alive),
                                     jnp.asarray(dvalid), 0.3))
    assert g.tolist() == [0, 1]          # greedy: d0→t0, d1→t1
    assert a.tolist() == [1, 0]          # optimal: d0→t1, d1→t0
    assert _total(iou, a) > _total(iou, g)


def test_auction_more_dets_than_tracks_terminates():
    rng = np.random.RandomState(3)
    T, D = 4, 10
    iou = rng.rand(T, D).astype(np.float32)
    alive = np.array([True, True, False, True])
    dvalid = np.ones(D, bool)
    got = np.asarray(auction_associate(
        jnp.asarray(iou), jnp.asarray(alive), jnp.asarray(dvalid), 0.0))
    matched = got[got >= 0]
    assert len(matched) <= 3  # only 3 alive tracks
    assert len(set(matched.tolist())) == len(matched)
    want = _scipy_det2trk(iou, alive, dvalid, 0.0)
    assert _total(iou, got) >= _total(iou, want) - D * 0.01 - 1e-5


def test_auction_empty_inputs():
    iou = np.zeros((4, 3), np.float32)
    got = np.asarray(auction_associate(
        jnp.asarray(iou), jnp.zeros(4, bool), jnp.zeros(3, bool), 0.3))
    assert (got == -1).all()


def test_hungarian_step_runs_in_scan_and_tracks():
    """Full SORT step with the hungarian backend inside a scan: stable IDs
    on two crossing-cost objects over several frames."""
    import jax
    step = make_sort_step(0.2, 1.0, 0.8, association="hungarian")
    state = init_state(8)
    ids_seen = []
    for f in range(5):
        boxes = np.zeros((4, 4), np.float32)
        boxes[0] = (10 + 2 * f, 10, 40 + 2 * f, 40)
        boxes[1] = (100, 50 + 3 * f, 140, 90 + 3 * f)
        valid = np.array([True, True, False, False])
        state, out = jax.jit(step)(
            state, jnp.asarray(boxes),
            jnp.zeros(4, jnp.int32), jnp.full(4, 0.9, jnp.float32),
            jnp.asarray(valid), jnp.float32(f / 30.0), None)
        ids_seen.append(np.asarray(out.track_id)[:2].tolist())
    assert ids_seen[0] == [1, 2]
    for ids in ids_seen[1:]:
        assert ids == [1, 2]  # stable identity under motion


def test_make_sort_step_rejects_unknown_association():
    with pytest.raises(ValueError, match="unknown association"):
        make_sort_step(0.3, 1.0, 0.8, association="auctionz")
