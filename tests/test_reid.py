"""Learned re-id embedder: network properties, metric training, engine
integration, and the deepsort quality bar with learned descriptors.

Beyond-reference (the reference SORT is motion-only,
src/track/sort_tracker.py); mirrors tests/test_deepsort.py's standard:
the learned embedder must measurably beat its untrained self on
identity separation, and must carry the occlusion-rescue/gate behavior
through the same step interface as the handcrafted descriptor.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from roadvision_tpu.track.appearance import EMB_DIM
from roadvision_tpu.track.reid import (batch_hard_triplet, embed_frames,
                                       identity_separation,
                                       init_reid_params, load_reid_params,
                                       make_reid_embed, reid_embeddings,
                                       render_identity_view,
                                       save_reid_params,
                                       synthetic_reid_batch, train_reid)


@pytest.fixture(scope="module")
def trained():
    """A briefly-trained embedder (small but enough to separate)."""
    params, history = train_reid(steps=150, idents=6, views=4,
                                 ident_pool=64, seed=0)
    return params, history


def test_embedding_properties():
    params = init_reid_params(0)
    rng = np.random.default_rng(0)
    frame, box = render_identity_view(3, rng)
    boxes = np.concatenate([box, np.zeros((1, 4), np.float32)])
    valid = np.array([True, False])
    emb = np.asarray(reid_embeddings(params, jnp.asarray(frame),
                                     jnp.asarray(boxes),
                                     jnp.asarray(valid)))
    assert emb.shape == (2, EMB_DIM)
    np.testing.assert_allclose(np.linalg.norm(emb[0]), 1.0, atol=1e-5)
    assert np.abs(emb[1]).max() == 0.0
    # deterministic
    emb2 = np.asarray(reid_embeddings(params, jnp.asarray(frame),
                                      jnp.asarray(boxes),
                                      jnp.asarray(valid)))
    np.testing.assert_array_equal(emb, emb2)


def test_triplet_loss_prefers_separated_embeddings():
    labels = jnp.asarray([0, 0, 1, 1])
    tight = jnp.asarray([[1, 0], [1, 0], [0, 1], [0, 1]], jnp.float32)
    mixed = jnp.asarray([[1, 0], [0, 1], [1, 0], [0, 1]], jnp.float32)
    assert float(batch_hard_triplet(tight, labels)) < \
        float(batch_hard_triplet(mixed, labels))


def test_training_descends_and_separates(trained):
    params, history = trained
    assert history[-1] < 0.5 * history[0]
    # identities NEVER seen in training (pool was 64)
    held_out = np.arange(200, 212)
    sep0 = identity_separation(init_reid_params(0), held_out)
    sep1 = identity_separation(params, held_out)
    assert sep1 > sep0 + 0.15
    assert sep1 > 0.3


def test_scale_and_brightness_invariance(trained):
    """Same identity at different crop scale/brightness stays close;
    a different identity stays farther."""
    params, _ = trained
    rng = np.random.default_rng(7)
    frames, boxes, labels = synthetic_reid_batch(
        rng, np.asarray([300, 301]), views=4)
    emb = np.asarray(embed_frames(params, jnp.asarray(frames),
                                  jnp.asarray(boxes)))
    cos = emb @ emb.T
    same = labels[:, None] == labels[None, :]
    eye = np.eye(len(labels), dtype=bool)
    assert cos[same & ~eye].mean() > cos[~same].mean() + 0.2


def test_save_load_roundtrip(tmp_path, trained):
    params, _ = trained
    p = tmp_path / "reid.npz"
    save_reid_params(p, params)
    loaded = load_reid_params(p)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(loaded[k]))
    # corrupt: drop an array
    bad = {k: np.asarray(v) for k, v in params.items() if k != "wd"}
    np.savez(tmp_path / "bad.npz", **bad)
    with pytest.raises(ValueError, match="missing"):
        load_reid_params(tmp_path / "bad.npz")


def _occlusion_scenario(color_last):
    """Striped identity moves, occludes 3 frames, reappears stopped at
    the last seen spot (KF has drifted away) — from test_deepsort."""
    rng = np.random.default_rng(0)
    patch, _ = render_identity_view(42, rng, frame=64)

    def frame_with(box, ident):
        img = np.full((96, 128, 3), 30, np.uint8)
        if ident is not None:
            r, c = int(box[1]), int(box[0])
            h = int(box[3] - box[1])
            w = int(box[2] - box[0])
            prng = np.random.default_rng(5)
            view, vbox = render_identity_view(ident, prng, frame=64)
            x1, y1, x2, y2 = (int(v) for v in vbox[0])
            crop = view[y1:y2, x1:x2]
            from PIL import Image
            crop = np.asarray(Image.fromarray(crop).resize((w, h)))
            img[r:r + h, c:c + w] = crop
        return img

    frames, boxes_seq, valid_seq = [], [], []
    for x in (10, 30, 50):
        box = np.array([x, 40.0, x + 20, 60.0], np.float32)
        frames.append(frame_with(box, 42))
        boxes_seq.append(box[None])
        valid_seq.append(np.array([True]))
    for _ in range(3):
        frames.append(frame_with(None, None))
        boxes_seq.append(np.zeros((1, 4), np.float32))
        valid_seq.append(np.array([False]))
    box = np.array([50, 40.0, 70, 60.0], np.float32)
    frames.append(frame_with(box, color_last))
    boxes_seq.append(box[None])
    valid_seq.append(np.array([True]))
    return frames, boxes_seq, valid_seq


def _run(step, embed, frames, boxes_seq, valid_seq):
    from roadvision_tpu.track.sort_tpu import init_state

    state = init_state(16)
    first_id = last_id = None
    for i, (frame, boxes, valid) in enumerate(zip(frames, boxes_seq,
                                                  valid_seq)):
        b = jnp.asarray(boxes)
        v = jnp.asarray(valid)
        cls = jnp.zeros((1,), jnp.int32)
        conf = jnp.full((1,), 0.9, jnp.float32)
        emb = embed(jnp.asarray(frame), b, v)
        state, out = step(state, b, cls, conf, v,
                          jnp.float32(0.1 * (i + 1)), None, emb)
        if valid[0]:
            tid = int(out.track_id[0])
            first_id = tid if first_id is None else first_id
            last_id = tid
    return first_id, last_id


def test_learned_rescue_and_gate(trained):
    """Learned descriptors rescue the same identity through occlusion
    drift AND refuse to hand the id to a different-looking object."""
    from roadvision_tpu.track.deepsort import make_deepsort_step

    params, _ = trained
    embed = make_reid_embed(params)
    step = make_deepsort_step(iou_threshold=0.3, max_staleness=2.0,
                              speed_window=0.75, rescue_iou=0.0,
                              app_thresh=0.6)
    first, last = _run(step, embed, *_occlusion_scenario(42))
    assert first == last                    # same identity → rescued
    first, last = _run(step, embed, *_occlusion_scenario(57))
    assert first != last                    # different identity → gated


def test_engine_reid_weights(tmp_path, trained):
    from roadvision_tpu.runtime.engine import PipelineEngine

    params, _ = trained
    wpath = tmp_path / "reid.npz"
    save_reid_params(wpath, params)
    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "backend": "deepsort",
                     "new_track_thresh": 0.0,
                     "reid_weights": str(wpath)},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    from roadvision_tpu.track.appearance import box_embeddings
    assert eng._embed_fn is not box_embeddings   # learned path selected
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.track_id is not None for d in dets)
    assert float(jnp.abs(eng.sort_state.app).max()) > 0.0


def test_engine_bad_reid_weights_soft_fails(tmp_path):
    """Unreadable weights degrade to the grid descriptor (the
    reference's soft-fail convention, main_preview.py:66-70)."""
    from roadvision_tpu.runtime.engine import PipelineEngine
    from roadvision_tpu.track.appearance import box_embeddings

    cfg = {
        "tpu": {"batch_size": 1, "track_slots": 8},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt",
                   "device": "cpu", "max_det": 4, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "backend": "deepsort",
                     "reid_weights": str(tmp_path / "nope.npz")},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng._embed_fn is box_embeddings


def test_shipped_reid_asset_separates():
    """The committed checkpoint must actually work (guards against a
    stale asset after embedder changes)."""
    from pathlib import Path

    import numpy as np

    from roadvision_tpu.track.reid import (identity_separation,
                                           load_reid_params)
    path = Path(__file__).resolve().parent.parent / "assets" / \
        "reid_synthetic.npz"
    params = load_reid_params(path)
    assert identity_separation(params, np.arange(500, 512)) > 0.5


def test_analytics_demo_config_drives_preview(tmp_path):
    """The showcase config (learned re-id + analytics + trails) runs
    end-to-end through the driver."""
    import main_preview
    out = tmp_path / "ana.avi"
    rc = main_preview.main(["--config", "configs/analytics_demo.yaml",
                            "--max-frames", "8", "--no-show",
                            "--record", str(out)])
    assert rc == 0
    assert out.read_bytes().count(b"\xff\xd8\xff") == 8
