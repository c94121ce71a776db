"""CLI tools end-to-end on tiny synthetic data (CPU)."""
import json

import numpy as np
import pytest


def _make_yolo_dir(tmp_path, n=3, size=96):
    from PIL import Image
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        img[20:50, 30:70] = (200, 30, 30)
        Image.fromarray(img).save(tmp_path / "images" / f"im{i}.png")
        # one box: cls 2, centered on the painted rect (normalized)
        cx, cy = 50 / size, 35 / size
        w, h = 40 / size, 30 / size
        (tmp_path / "labels" / f"im{i}.txt").write_text(
            f"2 {cx} {cy} {w} {h}\n")
    return tmp_path


def test_dataset_loader_yolo_dir(tmp_path):
    from roadvision_tpu.detect.dataset import load_yolo_dir
    root = _make_yolo_dir(tmp_path)
    imgs, boxes, cls, mask = load_yolo_dir(root, imgsz=96, max_boxes=5)
    assert imgs.shape == (3, 96, 96, 3)
    assert mask.sum() == 3 and (cls[mask] == 2).all()
    np.testing.assert_allclose(boxes[0, 0], [30, 20, 70, 50], atol=1.5)


def _make_coco_json(tmp_path, n=3, size=96):
    """Same scene/labels as _make_yolo_dir, in COCO instances format.
    Non-contiguous category ids (3→contig 1) + one iscrowd annotation."""
    from PIL import Image
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(n):
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        img[20:50, 30:70] = (200, 30, 30)
        Image.fromarray(img).save(tmp_path / f"im{i}.png")
        images.append({"id": i + 10, "file_name": f"im{i}.png",
                       "width": size, "height": size})
        anns.append({"id": 100 + i, "image_id": i + 10, "category_id": 3,
                     "bbox": [30, 20, 40, 30], "iscrowd": 0})
    # an iscrowd region: must be excluded
    anns.append({"id": 999, "image_id": 10, "category_id": 3,
                 "bbox": [0, 0, 90, 90], "iscrowd": 1})
    spec = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"},
                           {"id": 3, "name": "car"}]}
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(spec))
    return p


def test_dataset_loader_coco_json(tmp_path):
    from roadvision_tpu.detect.dataset import coco_names, load_coco_json
    p = _make_coco_json(tmp_path)
    imgs, boxes, cls, mask = load_coco_json(p, imgsz=96, max_boxes=5)
    assert imgs.shape == (3, 96, 96, 3)
    assert mask.sum() == 3  # iscrowd excluded
    assert (cls[mask] == 1).all()  # category 3 → contiguous 1
    np.testing.assert_allclose(boxes[0, 0], [30, 20, 70, 50], atol=1.5)
    assert coco_names(p) == {0: "person", 1: "car"}


def test_load_dataset_dispatch_matches(tmp_path):
    """COCO and YOLO loads of the same scene agree (via load_dataset)."""
    from roadvision_tpu.detect.dataset import load_dataset
    ydir = tmp_path / "y"
    ydir.mkdir()
    _make_yolo_dir(ydir)
    cdir = tmp_path / "c"
    cdir.mkdir()
    cjson = _make_coco_json(cdir)
    yi, yb, _, ym = load_dataset(ydir, imgsz=96, max_boxes=5)
    ci, cb, _, cm = load_dataset(str(cjson), imgsz=96, max_boxes=5)
    np.testing.assert_array_equal(yi, ci)
    np.testing.assert_array_equal(ym, cm)
    np.testing.assert_allclose(yb[ym], cb[cm], atol=1e-4)


def test_eval_map_cli_coco(tmp_path, capsys):
    import tools.eval_map as ev
    p = _make_coco_json(tmp_path)
    rc = ev.main(["--data", str(p), "--weights", "none.pt",
                  "--imgsz", "96", "--limit", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mAP@0.5" in out


def test_train_cli_coco_json(tmp_path):
    import tools.train as tr
    p = _make_coco_json(tmp_path)
    out = tmp_path / "w.npz"
    rc = tr.main(["--data", str(p), "--steps", "1", "--imgsz", "96",
                  "--batch", "2", "--weights", "none.pt",
                  "--out", str(out), "--no-augment"])
    assert rc == 0 and out.exists()


def test_dataset_synthetic_batches():
    from roadvision_tpu.detect.dataset import synthetic_batches
    gen = synthetic_batches(2, imgsz=96, max_boxes=8)
    imgs, boxes, cls, mask = next(gen)
    assert imgs.shape == (2, 96, 96, 3)
    assert mask.any() and (cls[mask] == 2).all()
    valid = boxes[mask]
    assert (valid[:, 2] > valid[:, 0]).all()


def test_train_cli_synthetic(tmp_path):
    import tools.train as train
    rc = train.main(["--data", "synthetic", "--steps", "2", "--imgsz", "96",
                     "--batch", "2", "--weights", "none.pt",
                     "--out", str(tmp_path / "run.npz"), "--log-every", "1"])
    assert rc == 0
    assert (tmp_path / "run.npz").exists()
    assert (tmp_path / "run.weights.npz").exists()
    # saved weights load back as a v8 tree
    from roadvision_tpu.models.yolo import weights
    params, arch, size, loaded = weights.load_params(
        str(tmp_path / "run.weights.npz"))
    assert loaded and arch == "v8"
    # EMA is the default deploy export; raw weights saved alongside.
    # The ramped decay keeps early EMA CLOSE to raw (d ~ 5e-4 at step 1)
    # but never bit-identical once the raw weights have moved.
    assert (tmp_path / "run.raw.npz").exists()
    raw, _, _, _ = weights.load_params(str(tmp_path / "run.raw.npz"))
    assert not np.array_equal(np.asarray(params["0"]["w"]),
                              np.asarray(raw["0"]["w"]))


def test_augment_batch_flip_and_hsv():
    from roadvision_tpu.detect.dataset import (_hsv_to_rgb, _rgb_to_hsv,
                                               augment_batch)

    rng0 = np.random.RandomState(0)
    # HSV round-trip is exact (float path) for arbitrary colors
    rgb = rng0.rand(16, 16, 3).astype(np.float32)
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-6)

    imgs = rng0.randint(0, 256, (4, 32, 32, 3), np.uint8)
    boxes = np.zeros((4, 3, 4), np.float32)
    boxes[:, 0] = (4, 6, 10, 12)          # one real box per image
    mask = np.zeros((4, 3), bool)
    mask[:, 0] = True

    # hflip_p=1: every box mirrors, stays valid, same width
    out_i, out_b = augment_batch(imgs, boxes, mask,
                                 np.random.RandomState(1), hflip_p=1.0,
                                 hsv_h=0, hsv_s=0, hsv_v=0)
    np.testing.assert_allclose(out_b[:, 0], [(32 - 10, 6, 32 - 4, 12)] * 4)
    np.testing.assert_array_equal(out_i, imgs[:, :, ::-1])
    # masked slots untouched
    np.testing.assert_array_equal(out_b[:, 1:], boxes[:, 1:])

    # hsv-only: boxes unchanged, pixels changed, dtype preserved
    out_i, out_b = augment_batch(imgs, boxes, mask,
                                 np.random.RandomState(2), hflip_p=0.0)
    np.testing.assert_array_equal(out_b, boxes)
    assert out_i.dtype == np.uint8 and not np.array_equal(out_i, imgs)


def test_track_cli_mot_output(tmp_path):
    import tools.track as track
    out = tmp_path / "tracks.txt"
    rec = tmp_path / "annot.avi"
    rc = track.main(["--source", "synthetic:3", "--frames", "12",
                     "--out", str(out), "--record", str(rec),
                     "--weights",
                     "assets/yolov8n_synthetic_256.npz",
                     "--width", "256", "--height", "256"])
    assert rc == 0
    rows = [ln.split(",") for ln in out.read_text().splitlines()]
    assert rows, "trained weights on the synthetic scene must yield tracks"
    frames = {int(r[0]) for r in rows}
    ids = {int(r[1]) for r in rows}
    assert min(frames) >= 1 and max(frames) <= 12
    assert min(ids) >= 1
    for r in rows:
        assert len(r) == 10
        w, h = float(r[4]), float(r[5])
        assert w > 0 and h > 0
        assert 0.0 < float(r[6]) <= 1.0
    # annotated recording is a valid MJPEG AVI with one JPEG per frame
    data = rec.read_bytes()
    assert data[:4] == b"RIFF" and data.count(b"\xff\xd8\xff") == 12


def test_track_cli_gt_scoring(tmp_path, capsys):
    """--gt scores the run; own-output self-scoring must be perfect."""
    import tools.track as track
    out = tmp_path / "tracks.txt"
    rc = track.main(["--source", "synthetic:3", "--frames", "8",
                     "--out", str(out), "--gt", str(out),
                     "--weights", "assets/yolov8n_synthetic_256.npz",
                     "--width", "256", "--height", "256"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["mota"] == 1.0
    assert result["id_switches"] == 0
    assert result["misses"] == 0 and result["false_positives"] == 0
    assert result["matches"] == result["total_gt"] > 0


def test_read_mot_conf_zero_ignored(tmp_path):
    from tools.track import read_mot
    p = tmp_path / "gt.txt"
    p.write_text("1,1,10,10,20,20,1,-1,-1,-1\n"
                 "1,2,50,50,10,10,0,-1,-1,-1\n"   # conf 0: don't-care
                 "3,1,12,10,20,20,1,-1,-1,-1\n")
    frames = read_mot(p, 2)
    assert len(frames) == 3  # row beyond n_frames extends
    assert frames[0] == [(10.0, 10.0, 30.0, 30.0, 1)]
    assert frames[1] == []
    assert frames[2][0][4] == 1


def test_mosaic_batch_accounting():
    from roadvision_tpu.detect.dataset import mosaic_batch

    size, cap = 64, 6
    rng = np.random.RandomState(0)
    # each image is a flat color with one centered box
    imgs = np.stack([np.full((size, size, 3), 40 * (i + 1), np.uint8)
                     for i in range(4)])
    boxes = np.zeros((4, cap, 4), np.float32)
    boxes[:, 0] = (20, 20, 44, 44)
    cls = np.zeros((4, cap), np.int32)
    cls[:, 0] = np.arange(4)
    mask = np.zeros((4, cap), bool)
    mask[:, 0] = True

    oi, ob, oc, om = mosaic_batch(imgs, boxes, cls, mask, rng)
    assert oi.shape == imgs.shape and oi.dtype == np.uint8
    for i in range(4):
        # every canvas pixel came from a source image (flat colors)
        assert set(np.unique(oi[i])) <= {40, 80, 120, 160}
        # all surviving boxes are inside the canvas, positive-area, and
        # carry a class that identifies a real source image
        for s in range(cap):
            if om[i, s]:
                x1, y1, x2, y2 = ob[i, s]
                assert 0 <= x1 < x2 <= size and 0 <= y1 < y2 <= size
                assert 0 <= oc[i, s] < 4
        # capacity respected; valid slots are front-packed
        k = int(om[i].sum())
        assert k <= cap and om[i, :k].all() and not om[i, k:].any()


def test_train_cli_no_ema_constant_schedule(tmp_path):
    import tools.train as train
    rc = train.main(["--data", "synthetic", "--steps", "2", "--imgsz", "96",
                     "--batch", "2", "--weights", "none.pt", "--no-ema",
                     "--schedule", "constant", "--warmup", "1",
                     "--out", str(tmp_path / "run.npz"), "--log-every", "1"])
    assert rc == 0
    assert (tmp_path / "run.weights.npz").exists()
    assert not (tmp_path / "run.raw.npz").exists()


def test_detect_cli_synthetic(tmp_path):
    import tools.detect as detect
    out = tmp_path / "out"
    rc = detect.main(["--source", "synthetic:2", "--frames", "2",
                      "--out", str(out), "--weights", "none.pt",
                      "--imgsz", "96", "--json"])
    assert rc == 0
    assert (out / "frame_00000.jpg").exists()
    recs = json.loads((out / "detections.json").read_text())
    assert len(recs) == 2


def test_detect_cli_rect_int8(tmp_path):
    import tools.detect as detect
    out = tmp_path / "out8"
    rc = detect.main(["--source", "synthetic:2", "--frames", "2",
                      "--out", str(out), "--weights", "none.pt",
                      "--imgsz", "96", "--rect", "--dtype", "int8",
                      "--conf", "0.0", "--json"])
    assert rc == 0
    recs = json.loads((out / "detections.json").read_text())
    assert len(recs) == 2
    assert any(recs)  # conf 0 passes boxes in at least one frame


def test_warmup_cli(tmp_path):
    import yaml

    import tools.warmup as warmup
    cfg = {
        "camera": {"width": 96, "height": 64},
        "preprocess": {"enabled": True, "chain": [
            {"name": "CLAHEDehaze", "params": {"tile_grid": 2}},
            {"name": "MedianDerain", "params": {"ksize": 3}}]},
        "detect": {"enabled": True, "model": "none.pt", "imgsz": 64,
                   "max_det": 8},
        "tracking": {"enabled": True},
        "tpu": {"batch_size": 2, "track_slots": 8},
    }
    path = tmp_path / "warm.yaml"
    path.write_text(yaml.safe_dump(cfg))
    assert warmup.main(["--config", str(path)]) == 0
    # explicit resolution list takes precedence over the camera block
    assert warmup.main(["--config", str(path), "--res", "64",
                       "--batch", "1"]) == 0


def test_calibrate_cli(tmp_path, capsys):
    import yaml

    import tools.calibrate as calibrate

    # an exact plane mapping: x_m = px / 100, y_m = (480 - py) / 10
    img = [[0, 480], [640, 480], [0, 80], [640, 80], [320, 280]]
    wld = [[x / 100, (480 - y) / 10] for x, y in img]
    pts = tmp_path / "pts.yaml"
    pts.write_text(yaml.safe_dump(
        {"image_points": img, "world_points": wld, "origin": [3.2, 0.0]}))
    chk = tmp_path / "chk.yaml"
    chk.write_text(yaml.safe_dump(
        {"image_points": [[100, 400], [500, 160]],
         "world_points": [[1.0, 8.0], [5.0, 32.0]]}))

    rc = calibrate.main(["--points", str(pts), "--check", str(chk),
                         "--max-error", "0.05"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "reprojection error" in out and "held-out error" in out
    # the emitted YAML block round-trips into a working projector config
    block = yaml.safe_load(out[out.index("geometry:"):])
    from roadvision_tpu.geometry import build_projector
    proj = build_projector(block["geometry"])
    X, Y = proj.project_point(320, 280)
    assert abs(X - 3.2) < 1e-3 and abs(Y - 20.0) < 1e-3

    # degenerate (collinear) points: warns and fails the error gate —
    # with explicit messages, never NaN prints or numpy RuntimeWarnings
    import warnings

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump(
        {"image_points": [[0, 100], [100, 100], [200, 100], [300, 100]],
         "world_points": [[0, 0], [1, 0], [2, 0], [3, 1]]}))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        rc_bad = calibrate.main(["--points", str(bad), "--max-error", "0.01"])
    bad_out = capsys.readouterr()
    assert rc_bad != 0
    assert "collinear" in bad_out.out
    assert "nan" not in bad_out.out.lower()


def test_eval_map_cli(tmp_path, capsys):
    import tools.eval_map as ev
    root = _make_yolo_dir(tmp_path)
    rc = ev.main(["--data", str(root), "--weights", "none.pt",
                  "--imgsz", "96", "--limit", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mAP@0.5" in out and 0.0 <= out["mAP@0.5"] <= 1.0


def test_shipped_synthetic_weights_detect():
    """The shipped demo checkpoint (trained fully in-framework on the TPU:
    tools/train.py, 6k steps, TAL+CIoU/DFL/BCE, grad clipping) must detect
    synthetic vehicles — an end-to-end regression for train→save→load→infer."""
    from pathlib import Path
    import numpy as np
    from roadvision_tpu.detect import build_detector
    from roadvision_tpu.detect.dataset import synthetic_batches
    from roadvision_tpu.detect.eval import match_report

    w = Path(__file__).resolve().parent.parent / "assets" / \
        "yolov8n_synthetic_256.npz"
    det = build_detector({"backend": "ultralytics", "model": str(w),
                          "conf_thres": 0.25, "iou_thres": 0.7,
                          "max_det": 20, "imgsz": 256, "classes_keep": []})
    assert det.loaded
    images, gt_boxes, gt_cls, gt_mask = next(
        synthetic_batches(4, imgsz=256, max_boxes=12, seed=123))
    matched = total = 0
    for i in range(4):
        batch = det.infer_batch(images[i][..., ::-1][None])
        rep = match_report(batch.boxes[0][batch.valid[0]],
                           gt_boxes[i][gt_mask[i]], 0.5)
        matched += rep["matched"]
        total += rep["n_gt"]
    assert total > 0 and matched / total > 0.7, (matched, total)


def test_shipped_v5_synthetic_weights_detect():
    """The shipped v5 demo checkpoint (trained in-framework on the TPU via
    the anchored v5 objective: tools/train.py, 4k steps with --resume)
    must detect synthetic vehicles — end-to-end regression for the v5
    train→save→load→infer loop."""
    from pathlib import Path
    from roadvision_tpu.detect import build_detector
    from roadvision_tpu.detect.dataset import synthetic_batches
    from roadvision_tpu.detect.eval import match_report

    w = Path(__file__).resolve().parent.parent / "assets" / \
        "yolov5n_synthetic_256.npz"
    det = build_detector({"backend": "ultralytics", "model": str(w),
                          "conf_thres": 0.5, "iou_thres": 0.7,
                          "max_det": 20, "imgsz": 256, "classes_keep": []})
    assert det.loaded and det.arch == "v5"
    images, gt_boxes, gt_cls, gt_mask = next(
        synthetic_batches(4, imgsz=256, max_boxes=12, seed=123))
    matched = total = 0
    for i in range(4):
        batch = det.infer_batch(images[i][..., ::-1][None])
        rep = match_report(batch.boxes[0][batch.valid[0]],
                           gt_boxes[i][gt_mask[i]], 0.5)
        matched += rep["matched"]
        total += rep["n_gt"]
    assert total > 0 and matched / total > 0.7, (matched, total)


def test_autotune_run_trial_extra_env_overrides(monkeypatch):
    """Sweep-specific env pins (rtdetr sweeps set RVT_BENCH_RES=720)
    must OVERRIDE run_trial's base env, not collide with it (r5
    regression: dict(**kwargs) raised 'multiple values for keyword
    argument RVT_BENCH_RES' on every rtdetr sweep)."""
    import tools.autotune as at
    seen = {}

    class FakeProc:
        returncode = 0
        stdout = '{"metric": "fps", "value": 42.0}\n'
        stderr = ""

    def fake_run(cmd, env=None, **kw):
        seen.update(env)
        return FakeProc()

    monkeypatch.setattr(at.subprocess, "run", fake_run)
    fps, dt, tail = at.run_trial(
        "detect", "RVT_BENCH_NQ", "100", res=1080, iters=8, timeout=60,
        extra_env={"RVT_BENCH_MODEL": "rtdetr-l.pt",
                   "RVT_BENCH_RES": "720"})
    assert fps == 42.0
    assert seen["RVT_BENCH_RES"] == "720"      # sweep pin wins over --res
    assert seen["RVT_BENCH_MODEL"] == "rtdetr-l.pt"
    assert seen["RVT_BENCH_NQ"] == "100"
    assert seen["RVT_BENCH_MODE"] == "detect"


def test_autotune_harness(tmp_path, monkeypatch):
    """Autotune orchestration: trial collection, winner pick, dotted
    config recommendation — bench subprocesses stubbed for speed."""
    import tools.autotune as at

    fake = {("preprocess", "RVT_CLAHE_CHUNK", "1"): 100.0,
            ("preprocess", "RVT_CLAHE_CHUNK", "16"): 300.0,
            ("preprocess", "RVT_CLAHE_CHUNK", "32"): 400.0,
            ("preprocess", "RVT_CLAHE_CHUNK", "64"): 250.0,
            ("full", "RVT_BENCH_BATCH", "8"): 500.0,
            ("full", "RVT_BENCH_BATCH", "16"): 450.0}

    def fake_trial(mode, var, value, res, iters, timeout, extra_env=None):
        fps = fake.get((mode, var, value))
        return fps, 0.01, "" if fps is not None else "boom"

    monkeypatch.setattr(at, "run_trial", fake_trial)
    out = tmp_path / "tune.json"
    rc = at.main(["--sweeps", "clahe_chunk,batch", "--out", str(out),
                  "--iters", "2", "--res", "480"])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["sweeps"]["clahe_chunk"]["winner"] == "32"
    assert rep["sweeps"]["clahe_chunk"]["matches_pinned"]
    assert rep["sweeps"]["batch"]["winner"] == "8"
    assert rep["recommended"]["env"]["RVT_CLAHE_CHUNK"] == "32"
    assert rep["recommended"]["config"]["tpu"]["batch_size"] == 8

    # re-decide from the written report (no re-measurement)
    rc = at.main(["--redecide", str(out), "--out", str(out)])
    assert rc == 0
    rep2 = json.loads(out.read_text())
    assert rep2["sweeps"]["clahe_chunk"]["winner"] == "32"


def test_autotune_tie_prefers_pinned():
    """Sub-threshold wins do not displace the pinned default; real wins do."""
    import tools.autotune as at

    trials = {"8": {"fps": 500.0}, "16": {"fps": 505.0}}  # +1%: noise
    e = at.decide("batch", trials, tie_pct=2.0)
    assert e["winner"] == "8" and e["matches_pinned"]
    assert e["tie"]["best_measured"] == "16"

    trials = {"8": {"fps": 500.0}, "16": {"fps": 550.0}}  # +10%: real
    e = at.decide("batch", trials, tie_pct=2.0)
    assert e["winner"] == "16" and not e["matches_pinned"]
    assert "tie" not in e


def test_autotune_all_sweeps_declared():
    """Every measurement-pinned knob has a sweep, and each sweep's env
    hook actually exists in the code it tunes."""
    import tools.autotune as at

    assert set(at.SWEEPS) == {"clahe_chunk", "hist_dtype", "clahe_sweep",
                              "median_impl", "sampled_preprocess",
                              "conv_dtype", "batch",
                              # round-5 additions: rtdetr knobs + the
                              # temporal-gate coast budget
                              "rtdetr_nq", "rtdetr_gathers",
                              "rtdetr_val_dtype", "rtdetr_decl",
                              "gate_skip"}
    import pathlib
    root = pathlib.Path(at.ROOT)
    hooks = {
        "RVT_CLAHE_CHUNK": "roadvision_tpu/ops/clahe.py",
        "RVT_CLAHE_HIST_DTYPE": "roadvision_tpu/ops/clahe.py",
        "RVT_CLAHE_SWEEP": "roadvision_tpu/ops/clahe.py",
        "RVT_PALLAS": "roadvision_tpu/ops/median.py",
        "RVT_BENCH_SAMPLED": "bench.py",
        "RVT_BENCH_DTYPE": "bench.py",
        "RVT_BENCH_BATCH": "bench.py",
        "RVT_BENCH_NQ": "bench.py",
        "RVT_BENCH_DECL": "bench.py",
        "RVT_RTDETR_PAIRED_GATHERS": "roadvision_tpu/models/rtdetr.py",
        "RVT_RTDETR_BF16_VALS": "roadvision_tpu/models/rtdetr.py",
        "RVT_BENCH_GATE_SKIP": "bench.py",
    }
    for sw in at.SWEEPS.values():
        assert sw["var"] in hooks
        assert sw["var"] in (root / hooks[sw["var"]]).read_text()


def test_analyze_cli_report(tmp_path):
    import tools.analyze as analyze
    out = tmp_path / "report.json"
    rc = analyze.main([
        "--source", "synthetic:3", "--frames", "10",
        "--out", str(out), "--weights", "assets/yolov8n_synthetic_256.npz",
        "--width", "256", "--height", "256",
        "--line", "mid:0,128:256,128", "--wrong-way", "neg",
        "--zone", "left:0,0:128,0:128,256:0,256",
        "--stopped-after", "1.0"])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["frames"] == 10
    assert report["unique_track_ids"] > 0
    assert report["detections_total"] > 0
    lines = report["analytics"]["lines"]
    assert lines[0]["name"] == "mid" and "wrong_way_total" in lines[0]
    zones = report["analytics"]["zones"]
    assert zones[0]["name"] == "left" and "entered_total" in zones[0]
    assert report["analytics"]["stopped"]["currently_stopped"] >= 0
    assert isinstance(report["events"], list)
    # consistency: line totals equal the crossing events in the log
    n_cross = sum(1 for e in report["events"] if e.get("line") == "mid")
    assert lines[0]["total"] == n_cross


def test_analyze_parse_points_validation():
    from tools.analyze import _parse_points
    import pytest
    name, pts = _parse_points("z:1,2:3,4:5,6")
    assert name == "z" and pts == [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]
    with pytest.raises(ValueError, match="bad geometry"):
        _parse_points("justname")


def test_benchmark_trackers_cli(tmp_path, capsys):
    import tools.benchmark_trackers as bt
    out = tmp_path / "trk.json"
    rc = bt.main(["--backends", "sort,bytetrack",
                  "--scenarios", "clutter,occlusion",
                  "--out", str(out)])
    assert rc == 0
    results = json.loads(out.read_text())
    # the ByteTrack start policy ignores low-conf clutter; SORT births
    # an id per blip (reference behavior) — the table must show it
    assert results["bytetrack"]["clutter"]["hota"] > \
        results["sort"]["clutter"]["hota"]
    assert results["sort"]["clutter"]["false_positives"] >= 3
    assert results["bytetrack"]["clutter"]["false_positives"] == 0
    table = capsys.readouterr().out
    assert "| backend |" in table and "| sort |" in table
