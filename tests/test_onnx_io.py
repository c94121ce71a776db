"""ONNX weight interchange (models/yolo/onnx_io.py).

Covers the reserved "onnx" detect backend (reference
configs/default.yaml:38): wire-format reader/writer round trips, ultralytics
export conventions (fused BN names, raw_data, fp16/unpacked variants), the
load_params .onnx path, and the registry surface.
"""
from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roadvision_tpu.detect.registry import build_detector
from roadvision_tpu.models.yolo import onnx_io, weights
from roadvision_tpu.models.yolo.yolov8 import forward, init_params


def test_tensor_roundtrip_dtypes():
    sd = {
        "a": np.random.RandomState(0).rand(3, 4).astype(np.float32),
        "b": np.arange(6, dtype=np.int64).reshape(2, 3),
        "c": np.float32(2.5).reshape(()),  # scalar, no dims field
        "d": np.random.RandomState(1).rand(5).astype(np.float16),
    }
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/w.onnx"
        onnx_io.save_onnx(sd, path)
        back = onnx_io.load_onnx(path)
    assert set(back) == set(sd)
    for k in sd:
        assert back[k].dtype == np.asarray(sd[k]).dtype, k
        np.testing.assert_array_equal(back[k], np.asarray(sd[k]))


def _tensor_unpacked(name: str, arr: np.ndarray) -> bytes:
    """Hand-encode a TensorProto with UNPACKED dims and float_data (the
    proto2-style encoding some producers emit) to prove reader tolerance."""
    _vi, _ld, _tag = onnx_io._vi, onnx_io._ld, onnx_io._tag
    msg = b""
    for d in arr.shape:
        msg += _vi(1, d)  # dims, unpacked varints
    msg += _vi(2, 1)  # data_type float32
    for v in arr.ravel():
        msg += _tag(4, 5) + struct.pack("<f", float(v))  # float_data fixed32
    msg += _ld(8, name.encode())
    return msg


def test_reader_accepts_unpacked_fields(tmp_path):
    arr = np.random.RandomState(2).rand(2, 3).astype(np.float32)
    _vi, _ld = onnx_io._vi, onnx_io._ld
    graph = _ld(5, _tensor_unpacked("w", arr))
    model = _vi(1, 8) + _ld(7, graph)
    p = tmp_path / "unpacked.onnx"
    p.write_bytes(model)
    back = onnx_io.load_onnx(p)
    np.testing.assert_allclose(back["w"], arr, rtol=1e-6)


def test_reader_bad_file(tmp_path):
    p = tmp_path / "junk.onnx"
    p.write_bytes(b"\x00\x01\x02not onnx")
    with pytest.raises(ValueError):
        onnx_io.load_onnx(p)


def test_params_onnx_roundtrip_v8(tmp_path):
    """params → fused state dict → .onnx → load_params: same forward."""
    params = init_params(jax.random.PRNGKey(3), "n")
    path = tmp_path / "v8n.onnx"
    onnx_io.export_onnx(params, path, arch="v8")
    params2, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "v8" and size == "n"
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    b1, s1 = forward(params, x, size="n")
    b2, s2 = forward(params2, x, size="n")
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-5)


def test_params_onnx_roundtrip_v5(tmp_path):
    from roadvision_tpu.models.yolo.yolov5 import forward as v5_forward
    from roadvision_tpu.models.yolo.yolov5 import init_params as v5_init
    params = v5_init(jax.random.PRNGKey(4), "n")
    path = tmp_path / "v5n.onnx"
    onnx_io.export_onnx(params, path, arch="v5")
    params2, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "v5" and size == "n"
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    o1 = v5_forward(params, x, size="n")
    o2 = v5_forward(params2, x, size="n")
    for a, b in zip(jax.tree_util.tree_leaves(o1),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_params_onnx_roundtrip_pose(tmp_path):
    """Pose head (cv4, no proto) survives the .onnx round trip: task is
    re-detected from the carrier and the keypoint branch matches."""
    from roadvision_tpu.models.yolo.yolov8_pose import (forward_pose,
                                                        init_params_pose)
    params = init_params_pose(jax.random.PRNGKey(7), "n", nc=1)
    path = tmp_path / "yolov8n-pose.onnx"
    onnx_io.export_onnx(params, path, arch="v8")
    sd = onnx_io.load_onnx(path)
    assert weights.detect_task(sd) == "pose"
    params2, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "v8" and size == "n"
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    o1 = forward_pose(params, x, size="n", nc=1)
    o2 = forward_pose(params2, x, size="n", nc=1)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the detector backend re-detects the pose task from the carrier
    det = build_detector({"backend": "onnx", "model": str(path),
                          "conf_thres": 0.0, "max_det": 5,
                          "classes_keep": [], "imgsz": 64})
    assert det.loaded and det.task == "pose" and det.nc == 1
    frame = np.random.RandomState(3).randint(0, 255, (48, 64, 3), np.uint8)
    dets = det.infer(frame)
    assert all(d.keypoints is not None and d.keypoints.shape == (17, 3)
               for d in dets)


def test_onnx_backend_detects(tmp_path):
    """detect.backend: onnx runs end-to-end through the jitted graph."""
    params = init_params(jax.random.PRNGKey(5), "n")
    path = tmp_path / "yolov8n.onnx"
    onnx_io.export_onnx(params, path, arch="v8")
    det = build_detector({"backend": "onnx", "model": str(path),
                          "conf_thres": 0.0, "max_det": 10,
                          "classes_keep": [], "imgsz": 64})
    assert det.loaded
    frame = np.random.RandomState(6).randint(0, 255, (48, 64, 3), np.uint8)
    dets = det.infer(frame)
    assert isinstance(dets, list)
    # same weights through the plain path → identical detections
    det2 = build_detector({"backend": "jax", "model": str(path),
                           "conf_thres": 0.0, "max_det": 10,
                           "classes_keep": [], "imgsz": 64})
    dets2 = det2.infer(frame)
    assert len(dets) == len(dets2)
    for a, b in zip(dets, dets2):
        assert a.cls_id == b.cls_id
        np.testing.assert_allclose([a.x1, a.y1, a.x2, a.y2, a.conf],
                                   [b.x1, b.y1, b.x2, b.y2, b.conf],
                                   atol=1e-4)


def test_onnx_backend_wants_onnx_model():
    with pytest.raises(ValueError, match="onnx"):
        build_detector({"backend": "onnx", "model": "yolov8n.pt"})


def test_onnx_backend_missing_file_fails_fast():
    with pytest.raises(FileNotFoundError, match="not found"):
        build_detector({"backend": "onnx", "model": "/nope/missing.onnx"})


def test_typed_int32_data_halffloats_and_negatives(tmp_path):
    """fp16 via int32_data is bit-patterns; negative ints are 10-byte
    varints — both per onnx.proto's typed-array encodings."""
    _vi, _ld = onnx_io._vi, onnx_io._ld
    # fp16 tensor [1.0, -2.0] as bit patterns 0x3C00, 0xC000 in int32_data
    t_half = (_vi(1, 2) + _vi(2, 10)
              + _vi(5, 0x3C00) + _vi(5, 0xC000)
              + _ld(8, b"half"))
    # int32 tensor [-1, 3]: -1 encodes as 2^64-1
    t_int = (_vi(1, 2) + _vi(2, 6)
             + _vi(5, (1 << 64) - 1) + _vi(5, 3)
             + _ld(8, b"ints"))
    graph = _ld(5, t_half) + _ld(5, t_int)
    p = tmp_path / "typed.onnx"
    p.write_bytes(_vi(1, 8) + _ld(7, graph))
    back = onnx_io.load_onnx(p)
    assert back["half"].dtype == np.float16
    np.testing.assert_array_equal(back["half"],
                                  np.array([1.0, -2.0], np.float16))
    assert back["ints"].dtype == np.int32
    np.testing.assert_array_equal(back["ints"], np.array([-1, 3], np.int32))


def test_unreadable_initializer_skipped(tmp_path, capsys):
    """A bad-payload initializer is skipped; readable ones still load."""
    _vi, _ld = onnx_io._vi, onnx_io._ld
    good = onnx_io._tensor_bytes("ok", np.arange(3, dtype=np.float32))
    # dims say 4 elements but raw_data carries one float → size mismatch
    bad = (_vi(1, 4) + _vi(2, 1) + _ld(8, b"bad")
           + _ld(9, struct.pack("<f", 1.0)))
    p = tmp_path / "mixed.onnx"
    p.write_bytes(_vi(1, 8) + _ld(7, _ld(5, bad) + _ld(5, good)))
    back = onnx_io.load_onnx(p)
    assert "skipped 1 unreadable" in capsys.readouterr().out
    assert set(back) == {"ok"}
    np.testing.assert_array_equal(back["ok"],
                                  np.arange(3, dtype=np.float32))


def test_corrupt_onnx_degrades_to_random_init(tmp_path, capsys):
    p = tmp_path / "corrupt.onnx"
    p.write_bytes(b"\x00\xffnot a model at all")
    params, arch, size, loaded = weights.load_params(str(p))
    assert not loaded and arch == "v8"
    assert "unreadable ONNX" in capsys.readouterr().out
    with pytest.raises(ValueError):
        weights.load_params(str(p), allow_random=False)


def test_export_tool_refuses_self_overwrite(tmp_path):
    from tools.export import main as export_main
    params = init_params(jax.random.PRNGKey(8), "n")
    path = tmp_path / "w.onnx"
    onnx_io.export_onnx(params, path, arch="v8")
    before = path.read_bytes()
    assert export_main(["--weights", str(path), "--format", "onnx"]) == 2
    assert path.read_bytes() == before


def test_tensorrt_backend_message():
    with pytest.raises(ValueError, match="tensorrt"):
        build_detector({"backend": "tensorrt"})


def test_export_tool(tmp_path):
    from tools.export import main as export_main
    params = init_params(jax.random.PRNGKey(7), "n")
    npz = tmp_path / "w.npz"
    weights.export_npz(params, npz)
    out = tmp_path / "w.onnx"
    assert export_main(["--weights", str(npz), "--format", "onnx",
                        "--out", str(out)]) == 0
    params2, arch, size, loaded = weights.load_params(str(out))
    assert loaded and arch == "v8" and size == "n"
    # and back to npz
    out2 = tmp_path / "w2.npz"
    assert export_main(["--weights", str(out), "--format", "npz",
                        "--out", str(out2)]) == 0
    params3, _, _, loaded3 = weights.load_params(str(out2))
    assert loaded3
    for a, b in zip(jax.tree_util.tree_leaves(params2),
                    jax.tree_util.tree_leaves(params3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
