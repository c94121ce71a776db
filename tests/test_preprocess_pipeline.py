"""Pipeline semantics: chain build, auto-gate, registry errors."""
import numpy as np
import pytest

from roadvision_tpu.preprocess import PreprocessPipeline, get_op_class
from roadvision_tpu.preprocess.ops import CLAHEDehaze, MedianDerain


def _cfg(enabled=True, chain=None, gate=False, thresh=20.0):
    return {
        "enabled": enabled,
        "chain": chain if chain is not None else [
            {"name": "CLAHEDehaze",
             "params": {"space": "YCrCb", "clip_limit": 2.0, "tile_grid": 8}},
            {"name": "MedianDerain", "params": {"ksize": 3}},
        ],
        "auto_gate": {"enable_low_contrast_gate": gate,
                      "contrast_thresh": thresh},
    }


def _frame(seed=0, h=48, w=64, lo=0, hi=256):
    return np.random.RandomState(seed).randint(lo, hi, (h, w, 3), dtype=np.uint8)


def test_registry_lookup_and_cuda_aliases():
    assert get_op_class("CLAHEDehaze") is CLAHEDehaze
    assert get_op_class("CUDACLAHEDehaze") is CLAHEDehaze
    assert get_op_class("MedianDerain") is MedianDerain
    assert get_op_class("CUDAMedianDerain") is MedianDerain
    with pytest.raises(KeyError, match="Available"):
        get_op_class("NoSuchOp")


def test_disabled_or_empty_is_identity():
    img = _frame()
    assert PreprocessPipeline(_cfg(enabled=False))(img) is img
    assert PreprocessPipeline(_cfg(chain=[]))(img) is img


def test_chain_folds_left_to_right():
    img = _frame(1)
    pipe = PreprocessPipeline(_cfg())
    manual = MedianDerain(ksize=3)(CLAHEDehaze(space="YCrCb", clip_limit=2.0,
                                               tile_grid=8)(img))
    np.testing.assert_array_equal(pipe(img), manual)


def test_auto_gate_skips_high_contrast():
    high = _frame(2)  # full-range noise → span ~255 → gate skips chain
    pipe = PreprocessPipeline(_cfg(gate=True, thresh=20.0))
    np.testing.assert_array_equal(pipe(high), high)


def test_auto_gate_processes_low_contrast():
    low = _frame(3, lo=100, hi=110)  # span < 20 → chain runs
    gated = PreprocessPipeline(_cfg(gate=True, thresh=20.0))
    ungated = PreprocessPipeline(_cfg(gate=False))
    np.testing.assert_array_equal(gated(low), ungated(low))
    assert not np.array_equal(np.asarray(gated(low)), low)


def test_batched_gate_is_per_frame():
    high = _frame(4)
    low = _frame(5, lo=100, hi=110)
    batch = np.stack([high, low])
    pipe = PreprocessPipeline(_cfg(gate=True, thresh=20.0))
    out = np.asarray(pipe.apply_batch(batch))
    np.testing.assert_array_equal(out[0], high)      # skipped
    np.testing.assert_array_equal(out[1], pipe(low))  # processed


def test_batch_matches_per_frame():
    frames = np.stack([_frame(i) for i in range(3)])
    pipe = PreprocessPipeline(_cfg())
    out = np.asarray(pipe.apply_batch(frames))
    for i in range(3):
        np.testing.assert_array_equal(out[i], pipe(frames[i]))


def test_ts_param_accepted_and_ignored():
    img = _frame(6)
    pipe = PreprocessPipeline(_cfg())
    np.testing.assert_array_equal(pipe(img, ts=123.456), pipe(img))


def test_sampled_terminal_op_matches_full_then_slice():
    """The sampled fast path (terminal op evaluated at the letterbox
    sample grid) must be bit-identical to running the chain fully and
    strided-slicing the result."""
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (2, 48, 96, 3), np.uint8)
    # stride-3 grids with the half-pixel "slice" offset (s-1)/2 = 1
    plan_y, plan_x = (3, 1, 16), (3, 1, 32)

    for chain in (
        [{"name": "CLAHEDehaze", "params": {"tile_grid": 2}},
         {"name": "MedianDerain", "params": {"ksize": 3}}],
        [{"name": "CLAHEDehaze", "params": {"tile_grid": 2}}],
        [{"name": "MedianDerain", "params": {"ksize": 5}}],
    ):
        pipe = PreprocessPipeline({"enabled": True, "chain": chain})
        assert pipe.supports_sampled()
        full = np.asarray(pipe.apply_batch(jnp.asarray(frames)))
        want = full[:, 1::3, 1::3].astype(np.int32)
        got = pipe.sampled_planes_fn(plan_y, plan_x)(jnp.asarray(frames))
        got = np.stack([np.asarray(p) for p in got], axis=-1)
        np.testing.assert_array_equal(got, want), chain


def test_sampled_unsupported_when_gated_or_lab():
    gated = PreprocessPipeline({
        "enabled": True,
        "chain": [{"name": "MedianDerain", "params": {"ksize": 3}}],
        "auto_gate": {"enable_low_contrast_gate": True}})
    assert not gated.supports_sampled()
    lab = PreprocessPipeline({
        "enabled": True,
        "chain": [{"name": "CLAHEDehaze", "params": {"space": "LAB"}}]})
    assert not lab.supports_sampled()


def _cfg_stat(stat, thresh):
    cfg = _cfg(gate=True, thresh=thresh)
    cfg["auto_gate"]["stat"] = stat
    return cfg


def test_pspan_gate_robust_to_impulse_outliers():
    """auto_gate.stat 'pspan' (additive): the reference-exact max-min
    span is defeated by a single bright/dark pixel (the WEATHER.json
    caveat — impulse rain and thin fog never engage it); p99.5-p0.5
    ignores <=0.5% outliers."""
    low = _frame(6, lo=100, hi=110)       # genuinely low contrast
    spiked = low.copy()
    spiked[0, 0] = 255                     # one impulse "raindrop"
    spiked[-1, -1] = 0
    # reference span statistic: the two outlier pixels raise the span
    # to 255 -> gate skips the chain even though the scene is flat
    span_pipe = PreprocessPipeline(_cfg_stat("span", 50.0))
    np.testing.assert_array_equal(span_pipe(spiked), spiked)
    # robust statistic: outliers ignored, chain runs
    pspan_pipe = PreprocessPipeline(_cfg_stat("pspan", 50.0))
    ungated = PreprocessPipeline(_cfg(gate=False))
    np.testing.assert_array_equal(pspan_pipe(spiked),
                                  ungated(spiked))
    # and on a genuinely high-contrast frame pspan still skips
    high = _frame(7)
    np.testing.assert_array_equal(pspan_pipe(high), high)


def test_gate_stat_unknown_raises():
    pipe = PreprocessPipeline(_cfg_stat("median", 50.0))
    with pytest.raises(ValueError, match="span"):
        pipe(_frame(8))
