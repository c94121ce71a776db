"""Config-driven multi-stream engine: the ``tpu.mesh`` knob reaches users.

VERDICT r2 next-step #2: ``tpu.mesh.enable: true`` + ``camera.sources``
must construct the sharded stream step through the ENGINE surface (not
just tests/bench), and its per-stream outputs must be bit-equal to S
independent single-device runs. Runs on the 8-virtual-CPU-device mesh
from conftest (reference scale-out promise: SURVEY.md §2.5).
"""
import numpy as np
import pytest

import jax

from roadvision_tpu.config import DEFAULTS, merge
from roadvision_tpu.runtime import (MultiStreamEngine, PipelineEngine,
                                    build_sources)

S, B, H, W = 8, 4, 96, 128


def _cfg():
    return merge(DEFAULTS, {
        "camera": {"width": W, "height": H, "fps_request": 30,
                   "sources": [f"synthetic:{2 + i}" for i in range(S)]},
        "preprocess": {"enabled": True, "chain": [
            {"name": "CLAHEDehaze",
             "params": {"space": "YCrCb", "clip_limit": 2.0, "tile_grid": 4}},
        ]},
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 8, "imgsz": 96, "classes_keep": [],
                   "conf_thres": 0.0},
        "tracking": {"enabled": True},
        "tpu": {"batch_size": B, "track_slots": 8,
                "mesh": {"enable": True, "axis": "data"}},
    })


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = _cfg()
    sources = build_sources(cfg["camera"], max_frames=2 * B)
    engine = MultiStreamEngine(cfg, num_streams=len(sources))
    return cfg, sources, engine


def test_build_sources_inherits_and_overrides():
    cam = {"source": 0, "width": 64, "height": 48, "fps_request": 15,
           "backend": "auto",
           "sources": ["synthetic:3", {"source": "synthetic:5", "width": 32}]}
    srcs = build_sources(cam, max_frames=4)
    assert len(srcs) == 2
    f0 = srcs[0].read()
    f1 = srcs[1].read()
    assert f0.ok and f0.image.shape == (48, 64, 3)
    assert f1.ok and f1.image.shape == (48, 32, 3)  # per-stream override
    for s in srcs:
        s.release()


def test_config_path_matches_single_device_runs(setup):
    cfg, _, engine = setup
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (S, B, H, W, 3), dtype=np.uint8)
    ts = np.arange(S * B, dtype=np.float32).reshape(S, B) / 30.0

    multi = engine.process_batch(frames, ts)
    assert len(multi) == S and all(len(m) == B for m in multi)

    # reference: one single-stream engine per stream, fresh state each,
    # fed the same frames — Detection lists must match exactly
    for s in range(S):
        single = PipelineEngine(cfg)
        ref = single.process_batch(frames[s], ts[s])
        for i in range(B):
            got, want = multi[s][i].detections, ref[i].detections
            assert len(got) == len(want)
            for g, r in zip(got, want):
                assert g == r, f"stream {s} frame {i}: {g} != {r}"


def test_stream_lockstep_and_state_carry(setup):
    cfg, sources, engine = setup
    engine.reset()
    batches = list(engine.stream(sources, max_frames=2 * B))
    total = sum(len(b[0]) for b in batches)
    assert total == 2 * B
    assert all(len(b) == S for b in batches)
    # tracking state persisted across batches on the sharded mesh
    assert engine.states is not None
    assert np.asarray(engine.states.next_id).shape == (S,)


def test_states_span_the_mesh(setup):
    _, _, engine = setup
    assert engine.states is not None
    devs = {d for leaf in jax.tree_util.tree_leaves(engine.states)
            for d in leaf.sharding.device_set}
    assert len(devs) == 8, "config-built engine should shard over the mesh"


def test_main_preview_dispatches_multi():
    """main_preview routes to run_multi iff mesh enabled + >1 source."""
    import main_preview
    assert hasattr(main_preview, "run_multi")


def test_uneven_streams_pad_to_mesh(setup):
    """4 streams over the 8-way axis: padded shards, outputs unchanged."""
    cfg, _, _ = setup
    s4 = 4
    cfg4 = merge(cfg, {"camera": {
        "sources": [f"synthetic:{2 + i}" for i in range(s4)]}})
    engine = MultiStreamEngine(cfg4, num_streams=s4)
    assert engine.padded_streams == 8
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, (s4, B, H, W, 3), dtype=np.uint8)
    ts = np.arange(s4 * B, dtype=np.float32).reshape(s4, B) / 30.0
    multi = engine.process_batch(frames, ts)
    assert len(multi) == s4
    single = PipelineEngine(cfg4)
    for s in range(s4):
        single.reset()
        ref = single.process_batch(frames[s], ts[s])
        for i in range(B):
            assert multi[s][i].detections == ref[i].detections


def test_main_preview_runs_multi_end_to_end(tmp_path):
    """Drive the driver: mesh config + sources → tiled grid recording."""
    import yaml

    import main_preview

    cfgd = {
        "camera": {"width": 64, "height": 48,
                   "sources": ["synthetic:2", "synthetic:3"]},
        "preprocess": {"enabled": False},
        "detect": {"enabled": False},
        "tracking": {"enabled": False},
        "tpu": {"batch_size": 2, "mesh": {"enable": True, "axis": "data"}},
    }
    cfg_path = tmp_path / "multi.yaml"
    cfg_path.write_text(yaml.safe_dump(cfgd))
    out = tmp_path / "fleet.avi"
    rc = main_preview.main(["--config", str(cfg_path), "--no-show",
                            "--max-frames", "4", "--record", str(out)])
    assert rc == 0
    data = out.read_bytes()
    assert data[:4] == b"RIFF"
    assert data.count(b"\xff\xd8\xff") == 4  # one tiled canvas per frame


def _static_batch(s, b):
    """(S, B, H, W, 3) where every frame of every stream is identical."""
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (H, W, 3), dtype=np.uint8)
    return np.broadcast_to(frame, (s, b) + frame.shape).copy()


def test_fleet_gate_coasts_when_all_streams_static():
    """detect.temporal_gate under tpu.mesh (VERDICT r3 #5): global coast
    when ALL streams are static — batch 1 runs full (unknown past),
    batches 2+ coast, the coasted outputs replicate each stream's own
    held detections, and the counter reports."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = merge(_cfg(), {"detect": {"temporal_gate": {
        "enable": True, "thresh": 1.5, "max_skip_batches": 3}}})
    engine = MultiStreamEngine(cfg, num_streams=S)
    frames = _static_batch(S, B)
    ts0 = np.arange(B, dtype=np.float64)[None].repeat(S, 0) / 30.0
    r1 = engine.process_batch(frames, ts0)
    assert engine.gate_frames_coasted == 0
    r2 = engine.process_batch(frames, ts0 + B / 30.0)
    assert engine.gate_frames_coasted == S * B
    # coasted detections are the held last-frame set, per stream
    for si in range(S):
        held = [(d.x1, d.y1, d.x2, d.y2, d.cls_id)
                for d in r1[si][-1].detections]
        for fr in r2[si]:
            got = [(d.x1, d.y1, d.x2, d.y2, d.cls_id)
                   for d in fr.detections]
            assert got == held
    # max_skip budget: after 3 coasted batches the 5th runs full again
    engine.process_batch(frames, ts0 + 2 * B / 30.0)
    engine.process_batch(frames, ts0 + 3 * B / 30.0)
    c_before = engine.gate_frames_coasted
    engine.process_batch(frames, ts0 + 4 * B / 30.0)   # budget exhausted
    assert engine.gate_frames_coasted == c_before


def test_fleet_gate_one_moving_stream_wakes_the_fleet():
    """Global semantics: motion on ANY stream forces a full pass for
    every stream — no shard ever serves stale boxes to a moving scene."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = merge(_cfg(), {"detect": {"temporal_gate": {
        "enable": True, "thresh": 1.5, "max_skip_batches": 3}}})
    engine = MultiStreamEngine(cfg, num_streams=S)
    frames = _static_batch(S, B)
    ts0 = np.arange(B, dtype=np.float64)[None].repeat(S, 0) / 30.0
    engine.process_batch(frames, ts0)
    moving = frames.copy()
    rng = np.random.RandomState(1)
    moving[1, -1] = rng.randint(0, 256, (H, W, 3), dtype=np.uint8)
    engine.process_batch(moving, ts0 + B / 30.0)
    assert engine.gate_frames_coasted == 0


def test_fleet_gate_full_batches_match_ungated_engine():
    """On full (non-coasted) batches the gated fleet's outputs are
    bit-identical to the ungated sharded step — the gate only ever
    inserts coasts, never perturbs fresh passes."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    base = _cfg()
    gated = MultiStreamEngine(merge(base, {"detect": {"temporal_gate": {
        "enable": True, "thresh": 1.5, "max_skip_batches": 3}}}),
        num_streams=S)
    plain = MultiStreamEngine(base, num_streams=S)
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (S, B, H, W, 3), dtype=np.uint8)
    ts0 = np.arange(B, dtype=np.float64)[None].repeat(S, 0) / 30.0
    rg = gated.process_batch(frames, ts0)
    rp = plain.process_batch(frames, ts0)
    assert gated.gate_frames_coasted == 0  # noisy frames: motion
    for si in range(S):
        for fg, fp in zip(rg[si], rp[si]):
            a = [(d.x1, d.y1, d.x2, d.y2, d.conf, d.cls_id, d.track_id)
                 for d in fg.detections]
            b = [(d.x1, d.y1, d.x2, d.y2, d.conf, d.cls_id, d.track_id)
                 for d in fp.detections]
            assert a == b
