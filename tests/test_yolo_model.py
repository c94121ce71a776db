"""YOLOv8-JAX: architecture shapes, conv/BN-fusion parity vs torch, DFL,
anchors, weight export round-trip (weights-free CI per SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import (arch_spec, count_params, decode,
                                        forward, forward_features,
                                        forward_head, init_params, weights,
                                        yolov8)


def test_arch_spec_n():
    spec = arch_spec("n")
    assert spec["widths"] == [16, 32, 64, 128, 256]
    assert spec["n1"] == 1 and spec["n2"] == 2
    assert spec["ch_det"] == (64, 128, 256)
    assert spec["c2"] == 64 and spec["c3"] == 80


def test_arch_spec_m():
    spec = arch_spec("m")
    assert spec["widths"] == [48, 96, 192, 384, 576]
    assert spec["n1"] == 2 and spec["n2"] == 4


def test_param_count_yolov8n():
    params = init_params(jax.random.PRNGKey(0), "n")
    n = count_params(params)
    # ultralytics yolov8n: ~3.15M (fused); ours stores fused conv+bias
    assert 2.9e6 < n < 3.3e6, n


def test_forward_shapes_and_anchor_count():
    params = init_params(jax.random.PRNGKey(0), "n")
    x = jnp.zeros((2, 640, 640, 3), jnp.float32)
    feats = forward_features(params, x, arch_spec("n"))
    assert [f.shape for f in feats] == [(2, 80, 80, 64), (2, 40, 40, 128),
                                        (2, 20, 20, 256)]
    outs = forward_head(params, feats, arch_spec("n"))
    assert outs[0][0].shape == (2, 80, 80, 64)   # 4*reg_max
    assert outs[0][1].shape == (2, 80, 80, 80)   # nc
    boxes, scores = decode(outs, 80)
    n_anchors = 80 * 80 + 40 * 40 + 20 * 20
    assert boxes.shape == (2, n_anchors, 4)
    assert scores.shape == (2, n_anchors, 80)
    assert float(scores.min()) >= 0 and float(scores.max()) <= 1


def test_conv_block_matches_torch_with_bn_fusion():
    """Fusion + NHWC/HWIO layout + SAME padding vs a real torch conv+bn+silu."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    cin, cout, k, stride = 5, 8, 3, 2
    conv = torch.nn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
    bn = torch.nn.BatchNorm2d(cout, eps=1e-3)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.running_mean.data.uniform_(-0.2, 0.2)
    bn.running_var.data.uniform_(0.5, 1.5)
    conv.eval(), bn.eval()

    x = torch.randn(2, cin, 16, 16)
    with torch.no_grad():
        want = torch.nn.functional.silu(bn(conv(x))).numpy()

    sd = {"m.conv.weight": conv.weight, "m.bn.weight": bn.weight,
          "m.bn.bias": bn.bias, "m.bn.running_mean": bn.running_mean,
          "m.bn.running_var": bn.running_var}
    p = weights._fuse(sd, "m")

    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = yolov8._conv(x_nhwc, p, stride=stride)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    # fused-BN reassociates float ops vs torch's sequential conv→bn;
    # agreement is ~1e-4 in f32
    np.testing.assert_allclose(got_nchw, want, atol=5e-4)


def test_dfl_decode_analytic():
    # put all probability mass on bin 7 for l, bin 2 for t, etc.
    logits = np.full((1, 4, 16), -20.0, np.float32)
    for i, b in enumerate([7, 2, 0, 15]):
        logits[0, i, b] = 20.0
    out = np.asarray(yolov8.dfl_decode(jnp.asarray(logits.reshape(1, 64))))
    np.testing.assert_allclose(out[0], [7, 2, 0, 15], atol=1e-4)


def test_anchor_points():
    pts, strides = yolov8.anchor_points([(2, 3), (1, 1)])
    assert pts.shape == (7, 2)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(pts[2]), [2.5, 0.5])
    np.testing.assert_allclose(np.asarray(strides), [8, 8, 8, 8, 8, 8, 16])


def test_npz_export_import_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(1), "n")
    path = tmp_path / "w.npz"
    weights.export_npz(params, path)
    params2, arch, size, loaded = weights.load_params(str(path))
    assert loaded and size == "n" and arch == "v8"
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    b1, s1 = forward(params, x, size="n")
    b2, s2 = forward(params2, x, size="n")
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_state_dict_import_shapes():
    """A synthetic ultralytics-style state dict maps onto the param tree."""
    torch = pytest.importorskip("torch")
    ref = init_params(jax.random.PRNGKey(0), "n")

    sd = {}

    def add_convbn(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k)
        sd[f"{prefix}.bn.weight"] = torch.ones(cout)
        sd[f"{prefix}.bn.bias"] = torch.zeros(cout)
        sd[f"{prefix}.bn.running_mean"] = torch.zeros(cout)
        sd[f"{prefix}.bn.running_var"] = torch.ones(cout) - 1e-3  # scale == 1

    def add_c2f(prefix, tree):
        add_convbn(f"{prefix}.cv1", tree["cv1"]["w"].shape[2],
                   tree["cv1"]["w"].shape[3], 1)
        add_convbn(f"{prefix}.cv2", tree["cv2"]["w"].shape[2],
                   tree["cv2"]["w"].shape[3], 1)
        for j, m in enumerate(tree["m"]):
            add_convbn(f"{prefix}.m.{j}.cv1", m["cv1"]["w"].shape[2],
                       m["cv1"]["w"].shape[3], 3)
            add_convbn(f"{prefix}.m.{j}.cv2", m["cv2"]["w"].shape[2],
                       m["cv2"]["w"].shape[3], 3)

    for i in ("0", "1", "3", "5", "7", "16", "19"):
        w = ref[i]["w"]
        add_convbn(f"model.{i}", w.shape[2], w.shape[3], w.shape[0])
    for i in ("2", "4", "6", "8", "12", "15", "18", "21"):
        add_c2f(f"model.{i}", ref[i])
    add_convbn("model.9.cv1", ref["9"]["cv1"]["w"].shape[2],
               ref["9"]["cv1"]["w"].shape[3], 1)
    add_convbn("model.9.cv2", ref["9"]["cv2"]["w"].shape[2],
               ref["9"]["cv2"]["w"].shape[3], 1)
    for branch in ("cv2", "cv3"):
        for lvl in range(3):
            stages = ref["22"][branch][lvl]
            for si in range(2):
                w = stages[si]["w"]
                add_convbn(f"model.22.{branch}.{lvl}.{si}",
                           w.shape[2], w.shape[3], w.shape[0])
            w = stages[2]["w"]
            sd[f"model.22.{branch}.{lvl}.2.weight"] = \
                torch.randn(w.shape[3], w.shape[2], 1, 1)
            sd[f"model.22.{branch}.{lvl}.2.bias"] = torch.randn(w.shape[3])

    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and size == "n" and arch == "v8"
    # tree structure identical to random init
    ref_td = jax.tree_util.tree_structure(ref)
    got_td = jax.tree_util.tree_structure(params)
    assert ref_td == got_td
    # identity-scale BN fusion preserves conv weights exactly
    w0 = np.asarray(params["0"]["w"])
    np.testing.assert_allclose(
        w0, sd["model.0.conv.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6)
    # forward runs
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes, scores = forward(params, x, size="n")
    assert boxes.shape[1] == 8 * 8 + 4 * 4 + 2 * 2


def test_param_count_yolov8s():
    params = init_params(jax.random.PRNGKey(0), "s")
    n = count_params(params)
    assert 10.5e6 < n < 11.5e6, n  # ultralytics yolov8s ~11.2M
