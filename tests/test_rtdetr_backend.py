"""RT-DETR backend: checkpoint import, NMS-free selection, detector +
engine integration.

The reference reaches detectors through ``build_detector(cfg)`` →
``infer(bgr) -> List[Detection]`` (src/detect/registry.py:5-9,
src/detect/yolo_ultralytics.py:26-53); ``YOLO("rtdetr-l.pt")`` in its
ecosystem resolves to the RTDETR predictor (stretch resize, no NMS,
normalized-box rescale by (w, h)). These tests pin:

  * the ultralytics ``rtdetr-l.pt`` state-dict layout import (synthetic
    sd with the published key names, shape-matched against the init
    tree; BN / RepConv-branch fusion checked numerically);
  * ``select_topk_batch`` vs a numpy oracle;
  * the detector's Detection-list contract and the engine's nms_free
    fused-step path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models import rtdetr
from roadvision_tpu.models.yolo import weights
from roadvision_tpu.ops.nms import select_topk_batch


# ---------------------------------------------------------------------------
# select_topk_batch vs numpy oracle
# ---------------------------------------------------------------------------

def _topk_oracle(boxes, scores, conf_thres, max_det, keep):
    """Scalar reference: threshold → class filter → score-desc top-k."""
    out = []
    for b in range(boxes.shape[0]):
        conf = scores[b].max(-1)
        cls = scores[b].argmax(-1)
        ok = conf > conf_thres
        if keep:
            ok &= np.isin(cls, list(keep))
        idx = np.argsort(-conf, kind="stable")
        idx = [i for i in idx if ok[i]][:max_det]
        out.append((boxes[b][idx], conf[idx], cls[idx]))
    return out


@pytest.mark.parametrize("keep", [None, (1, 3)])
def test_select_topk_matches_oracle(keep):
    rng = np.random.RandomState(0)
    boxes = rng.rand(2, 40, 4).astype(np.float32)
    scores = rng.rand(2, 40, 5).astype(np.float32)
    b, c, k, v = select_topk_batch(jnp.asarray(boxes), jnp.asarray(scores),
                                   conf_thres=0.5, max_det=8,
                                   classes_keep=keep)
    assert b.shape == (2, 8, 4) and v.dtype == bool
    want = _topk_oracle(boxes, scores, 0.5, 8, keep)
    for i, (wb, wc, wk) in enumerate(want):
        n = len(wc)
        assert int(np.asarray(v[i]).sum()) == n
        np.testing.assert_allclose(np.asarray(b[i][:n]), wb, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c[i][:n]), wc, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(k[i][:n]), wk)
        # padded tail is zeroed, not garbage
        assert float(np.asarray(c[i][n:]).max(initial=0.0)) == 0.0


def test_select_topk_pads_when_fewer_candidates():
    boxes = jnp.zeros((1, 3, 4), jnp.float32)
    scores = jnp.asarray([[[0.9, 0.1], [0.2, 0.1], [0.1, 0.8]]], jnp.float32)
    b, c, k, v = select_topk_batch(boxes, scores, conf_thres=0.5, max_det=10)
    assert b.shape == (1, 10, 4)
    assert int(np.asarray(v).sum()) == 2
    np.testing.assert_allclose(np.asarray(c[0, :2]), [0.9, 0.8], atol=1e-6)


# ---------------------------------------------------------------------------
# checkpoint import: layout + fusion math
# ---------------------------------------------------------------------------

def _synth_sd_from_tree(ref):
    """Build an ultralytics-layout state dict whose shapes mirror the init
    tree — key names written from the published rtdetr-l module layout."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    sd = {}

    def convbn(prefix, w):
        k, cin, cout = w.shape[0], w.shape[2], w.shape[3]
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k) * 0.05
        sd[f"{prefix}.bn.weight"] = torch.rand(cout) + 0.5
        sd[f"{prefix}.bn.bias"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.running_mean"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.running_var"] = torch.rand(cout) + 0.5

    def lin(prefix, p):
        cin, cout = p["w"].shape
        sd[f"{prefix}.weight"] = torch.randn(cout, cin) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(cout) * 0.1

    def ln(prefix, p):
        d = p["g"].shape[0]
        sd[f"{prefix}.weight"] = torch.rand(d) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(d) * 0.1

    def mha(prefix, p):
        d = p["q"]["w"].shape[0]
        sd[f"{prefix}.in_proj_weight"] = torch.randn(3 * d, d) * 0.05
        sd[f"{prefix}.in_proj_bias"] = torch.randn(3 * d) * 0.1
        lin(f"{prefix}.out_proj", p["o"])

    def repc3(prefix, p):
        convbn(f"{prefix}.cv1", p["cv1"]["w"])
        convbn(f"{prefix}.cv2", p["cv2"]["w"])
        for j, m in enumerate(p["m"]):
            convbn(f"{prefix}.m.{j}.conv1", m["w"])          # 3x3 branch
            w1 = np.zeros((1, 1) + tuple(m["w"].shape[2:]), np.float32)
            convbn(f"{prefix}.m.{j}.conv2", jnp.asarray(w1))  # 1x1 branch

    bk = ref["backbone"]
    for name, key in (("s1", "stem1"), ("s2a", "stem2a"), ("s2b", "stem2b"),
                      ("s3", "stem3"), ("s4", "stem4")):
        convbn(f"model.0.{key}", bk["stem"][name]["w"])
    for (idx, si, bi) in rtdetr._SD_HGBLOCKS:
        blk = bk["stages"][si][bi]
        light = rtdetr._L_STAGES[si][4]
        for j, m in enumerate(blk["m"]):
            if light:
                convbn(f"model.{idx}.m.{j}.conv1", m["cv1"]["w"])
                convbn(f"model.{idx}.m.{j}.conv2", m["cv2"]["w"])
            else:
                convbn(f"model.{idx}.m.{j}", m["cv"]["w"])
        convbn(f"model.{idx}.sc", blk["sc"]["w"])
        convbn(f"model.{idx}.ec", blk["ec"]["w"])
    for i, idx in enumerate(("2", "4", "8")):
        convbn(f"model.{idx}", bk["down"][i]["w"])

    enc = ref["enc"]
    for idx, name, _act in rtdetr._SD_ENC_CONVS:
        convbn(f"model.{idx}", enc[name]["w"])
    for idx, name in rtdetr._SD_REPC3:
        repc3(f"model.{idx}", enc[name])
    mha("model.11.ma", enc["aifi"]["mha"])
    ln("model.11.norm1", enc["aifi"]["ln1"])
    ln("model.11.norm2", enc["aifi"]["ln2"])
    lin("model.11.fc1", enc["aifi"]["fc1"])
    lin("model.11.fc2", enc["aifi"]["fc2"])

    dec = ref["dec"]
    d = "model.28"
    for l, p in enumerate(dec["input_proj"]):
        cout = p["w"].shape[3]
        sd[f"{d}.input_proj.{l}.0.weight"] = \
            torch.randn(cout, p["w"].shape[2], 1, 1) * 0.05
        sd[f"{d}.input_proj.{l}.1.weight"] = torch.rand(cout) + 0.5
        sd[f"{d}.input_proj.{l}.1.bias"] = torch.randn(cout) * 0.1
        sd[f"{d}.input_proj.{l}.1.running_mean"] = torch.randn(cout) * 0.1
        sd[f"{d}.input_proj.{l}.1.running_var"] = torch.rand(cout) + 0.5
    for i, lp in enumerate(dec["layers"]):
        li = f"{d}.decoder.layers.{i}"
        mha(f"{li}.self_attn", lp["sa"])
        for torch_name, ours in (("sampling_offsets", "off"),
                                 ("attention_weights", "attw"),
                                 ("value_proj", "val"),
                                 ("output_proj", "out")):
            lin(f"{li}.cross_attn.{torch_name}", lp["ca"][ours])
        for j in (1, 2, 3):
            ln(f"{li}.norm{j}", lp[f"ln{j}"])
        lin(f"{li}.linear1", lp["ffn1"])
        lin(f"{li}.linear2", lp["ffn2"])
    lin(f"{d}.enc_output.0", dec["enc_output"]["lin"])
    ln(f"{d}.enc_output.1", dec["enc_output"]["ln"])
    lin(f"{d}.enc_score_head", dec["enc_score"])
    for j, p in enumerate(dec["enc_bbox"]):
        lin(f"{d}.enc_bbox_head.layers.{j}", p)
    for i in range(rtdetr.NDL):
        lin(f"{d}.dec_score_head.{i}", dec["dec_score"][i])
        for j, p in enumerate(dec["dec_bbox"][i]):
            lin(f"{d}.dec_bbox_head.{i}.layers.{j}", p)
    for j, p in enumerate(dec["qpos"]):
        lin(f"{d}.query_pos_head.layers.{j}", p)
    # training-only leaves the importer must ignore
    sd["model.28.denoising_class_embed.weight"] = torch.randn(81, 256)
    return sd


@pytest.fixture(scope="module")
def ref_tree():
    return rtdetr.init_params_rtdetr(jax.random.PRNGKey(1), nc=80)


def test_state_dict_import_layout(ref_tree):
    sd = _synth_sd_from_tree(ref_tree)
    params = rtdetr.state_dict_to_params_rtdetr(sd)
    # identical tree structure AND leaf shapes as the init tree
    got = jax.tree.map(lambda x: x.shape, params)
    want = jax.tree.map(lambda x: x.shape, ref_tree)
    assert got == want
    # loader surface: nc comes from the score-head width
    p2, nc, loaded = rtdetr.load_params_rtdetr(sd)
    assert loaded and nc == 80


def test_repc3_import_fused_form_and_empty_guard():
    """RepC3 import handles a fuse()-saved checkpoint (RepConv collapsed
    to one conv+bias) and REFUSES a block-less RepC3 instead of silently
    importing a wrong model."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(5)
    sd = {}
    for cv in ("cv1", "cv2"):
        sd[f"r.{cv}.conv.weight"] = torch.randn(4, 4, 1, 1)
        sd[f"r.{cv}.conv.bias"] = torch.randn(4)
    sd["r.m.0.conv.weight"] = torch.randn(4, 4, 3, 3)
    sd["r.m.0.conv.bias"] = torch.randn(4)
    out = rtdetr._repc3_t(sd, "r")
    assert len(out["m"]) == 1 and out["m"][0]["w"].shape == (3, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(out["m"][0]["b"]),
                               sd["r.m.0.conv.bias"].numpy(), atol=1e-6)
    for k in ("r.m.0.conv.weight", "r.m.0.conv.bias"):
        del sd[k]
    with pytest.raises(KeyError):
        rtdetr._repc3_t(sd, "r")


def test_load_rejects_foreign_npz_pytree(tmp_path):
    """A YOLO-exported pytree in an rtdetr-named file degrades to random
    init (with a notice) instead of an uncaught KeyError."""
    from roadvision_tpu.models.yolo.yolov8 import init_params
    p = tmp_path / "rtdetr-actually-yolo.npz"
    weights.export_npz(init_params(jax.random.PRNGKey(0), "n"), p)
    params, nc, loaded = rtdetr.load_params_rtdetr(str(p), nc=7)
    assert not loaded and nc == 7
    assert "backbone" in params   # a usable random-init rtdetr tree


def test_rep_fusion_is_branch_sum():
    """Deploy-form RepConv: fused 3x3 ≡ 3x3 branch + 1x1 branch outputs."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(3)
    sd = {}
    for branch, k in (("conv1", 3), ("conv2", 1)):
        sd[f"r.{branch}.conv.weight"] = torch.randn(6, 4, k, k) * 0.1
        sd[f"r.{branch}.bn.weight"] = torch.rand(6) + 0.5
        sd[f"r.{branch}.bn.bias"] = torch.randn(6) * 0.1
        sd[f"r.{branch}.bn.running_mean"] = torch.randn(6) * 0.1
        sd[f"r.{branch}.bn.running_var"] = torch.rand(6) + 0.5
    fused = rtdetr._rep_fuse(sd, "r")
    b3 = weights._fuse(sd, "r.conv1")
    b1 = weights._fuse(sd, "r.conv2")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)

    def conv(p, pad):
        return jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]

    np.testing.assert_allclose(np.asarray(conv(fused, 1)),
                               np.asarray(conv(b3, 1) + conv(b1, 0)),
                               atol=1e-5)


def test_mha_import_matches_torch():
    """in_proj split + out_proj vs torch's nn.MultiheadAttention."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(4)
    d = rtdetr.HD
    m = torch.nn.MultiheadAttention(d, rtdetr.NH, batch_first=True)
    m.eval()
    sd = {f"a.{k}": v for k, v in m.state_dict().items()}
    p = rtdetr._mha_t(sd, "a")
    x = np.random.RandomState(1).randn(2, 5, d).astype(np.float32) * 0.3
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(x),
                    torch.from_numpy(x))
    got = rtdetr._mha(jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), p)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_export_tool_rtdetr(tmp_path, ref_tree):
    from tools.export import main as export_main
    src = tmp_path / "rtdetr-l.src.npz"
    weights.export_npz(ref_tree, src)
    out = tmp_path / "rtdetr-l.out.npz"
    assert export_main(["--weights", str(src), "--format", "npz",
                        "--out", str(out)]) == 0
    params, nc, loaded = rtdetr.load_params_rtdetr(str(out))
    assert loaded and nc == 80
    # onnx has no rtdetr weight-carrier scheme: explicit refusal
    assert export_main(["--weights", str(src), "--format", "onnx",
                        "--out", str(tmp_path / "x.onnx")]) == 2


def test_npz_roundtrip(tmp_path, ref_tree):
    path = tmp_path / "rtdetr.npz"
    weights.export_npz(ref_tree, path)
    params, nc, loaded = rtdetr.load_params_rtdetr(str(path))
    assert loaded and nc == 80
    flat1 = jax.tree.leaves(ref_tree)
    flat2 = jax.tree.leaves(params)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# detector + engine integration (random init — weights-free CI mode)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def detector():
    from roadvision_tpu.detect.registry import build_detector
    return build_detector({"backend": "ultralytics", "model": "rtdetr-l.pt",
                           "conf_thres": 1e-6, "max_det": 10, "imgsz": 64,
                           "device": "cpu", "classes_keep": [0, 2]})


def test_registry_dispatches_rtdetr(detector):
    from roadvision_tpu.detect.rtdetr_jax import RTDETRJax
    assert isinstance(detector, RTDETRJax)
    assert detector.nms_free and detector.task == "detect"


def test_registry_sniffs_renamed_npz(tmp_path, ref_tree):
    """An exported rtdetr pytree dispatches by CONTENT even when the
    filename doesn't say rtdetr (otherwise it would silently fall
    through to YOLO random-init)."""
    from roadvision_tpu.detect.registry import build_detector
    from roadvision_tpu.detect.rtdetr_jax import RTDETRJax
    p = tmp_path / "mystery.npz"
    weights.export_npz(ref_tree, p)
    det = build_detector({"model": str(p), "conf_thres": 0.5})
    assert isinstance(det, RTDETRJax) and det.loaded and det.nc == 80


def test_infer_contract(detector):
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (48, 72, 3), np.uint8)
    dets = detector.infer(frame)
    assert len(dets) <= 10
    for d in dets:
        assert 0 <= d.x1 <= d.x2 <= 72 and 0 <= d.y1 <= d.y2 <= 48
        assert d.cls_id in (0, 2)
        assert d.conf > 1e-6
        assert d.cls_name in ("person", "car")


def test_num_queries_knob_shapes_and_validation():
    """detect.num_queries decodes only the top-N encoder proposals —
    the RT-DETR decoder is the family's profiled bottleneck and its
    cost is linear in N (BASELINE.md); N queries is a valid smaller
    top-k because RT-DETR has no learned query embeddings. Pins the
    forward's output width, the detector contract, and the config
    validation (N must cover max_det and fit the model's 300)."""
    from roadvision_tpu.detect.rtdetr_jax import RTDETRJax
    params = rtdetr.init_params_rtdetr(jax.random.PRNGKey(3), nc=4)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    # imgsz 64 -> 84 anchors; nq clamps to min(requested, anchors)
    boxes, probs = rtdetr.forward_rtdetr_raw(params, x, nc=4,
                                             num_queries=16)
    assert boxes.shape == (1, 16, 4) and probs.shape == (1, 16, 4)

    det = RTDETRJax({"model": "rtdetr-l.absent.pt", "conf_thres": 1e-6,
                     "max_det": 8, "imgsz": 64, "device": "cpu",
                     "num_queries": 16})
    assert det.num_queries == 16
    frame = np.random.RandomState(1).randint(0, 255, (48, 72, 3), np.uint8)
    dets = det.infer(frame)
    assert len(dets) <= 8
    for d in dets:
        assert 0 <= d.x1 <= d.x2 <= 72 and 0 <= d.y1 <= d.y2 <= 48

    with pytest.raises(ValueError, match="max_det"):
        RTDETRJax({"model": "rtdetr-l.absent.pt", "max_det": 100,
                   "num_queries": 50})
    with pytest.raises(ValueError, match="num_queries"):
        RTDETRJax({"model": "rtdetr-l.absent.pt", "num_queries": 0})
    with pytest.raises(ValueError, match="num_queries"):
        RTDETRJax({"model": "rtdetr-l.absent.pt", "num_queries": 301})


def test_num_queries_is_encoder_topk_prefix():
    """The N queries selected under num_queries=N are exactly the first
    N of the default run's top-300: the encoder-side proposals
    (aux enc_boxes/enc_scores, read via train=True) must be a prefix —
    lax.top_k sorts descending. (Decoded outputs then differ because
    self-attention mixes a different query set; the knob's semantic
    change is ONLY the smaller candidate pool.)"""
    params = rtdetr.init_params_rtdetr(jax.random.PRNGKey(5), nc=4)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 64, 64, 3),
                    jnp.float32)
    c3, c4, c5 = rtdetr.hgnet_forward(params["backbone"], x)
    feats = rtdetr.encoder_forward(params["enc"], c3, c4, c5)
    _, _, aux_full = rtdetr.decoder_forward(params["dec"], feats, 4,
                                            train=True)
    _, _, aux_16 = rtdetr.decoder_forward(params["dec"], feats, 4,
                                          train=True, num_queries=16)
    np.testing.assert_allclose(np.asarray(aux_16["enc_boxes"]),
                               np.asarray(aux_full["enc_boxes"][:, :16]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_16["enc_scores"]),
                               np.asarray(aux_full["enc_scores"][:, :16]),
                               rtol=1e-5, atol=1e-6)


def test_set_params_refreshes_names_and_nc(tmp_path):
    """set_params with a different-width score head updates nc AND the
    class-name table (stale COCO names would mislabel Detections)."""
    from roadvision_tpu.detect.rtdetr_jax import RTDETRJax
    det = RTDETRJax({"model": "rtdetr-l.absent.pt", "conf_thres": 0.5})
    assert det.nc == 80 and det.names[2] == "car"
    det.set_params(rtdetr.init_params_rtdetr(jax.random.PRNGKey(7), nc=5))
    assert det.nc == 5 and det.names[2] == "2"


def test_engine_nms_free_step(detector):
    """The fused engine step runs the rtdetr branch end-to-end with
    tracking downstream (select → rescale → SORT scan)."""
    from roadvision_tpu.runtime.engine import PipelineEngine
    cfg = {"detect": {"enabled": True, "model": "rtdetr-l.pt",
                      "conf_thres": 1e-6, "max_det": 8, "imgsz": 64,
                      "device": "cpu"},
           "tracking": {"enabled": True, "backend": "sort"},
           "preprocess": {"enabled": False},
           "tpu": {"batch_size": 2}}
    eng = PipelineEngine(cfg)
    assert getattr(eng.detector, "nms_free", False)
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (2, 48, 72, 3), np.uint8)
    ts = np.array([0.0, 0.033])
    res = eng.process_batch(frames, ts)
    assert len(res) == 2
    for r in res:
        for d in r.detections:
            assert 0 <= d.x1 <= d.x2 <= 72 and 0 <= d.y1 <= d.y2 <= 48
            assert d.track_id is not None and d.track_id >= 1
