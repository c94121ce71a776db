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
    # validated at construction (round 5) — a bad stat must not wait
    # for the first traced batch to surface
    with pytest.raises(ValueError, match="span"):
        PreprocessPipeline(_cfg_stat("median", 50.0))


# ---------------------------------------------------------------------------
# impulse (rain) gate statistic + auto threshold (round 5)
# ---------------------------------------------------------------------------

def _rain(frame, density=0.05, seed=0):
    """Impulse speckle like tools/eval_weather.add_rain."""
    out = frame.copy()
    h, w = frame.shape[:2]
    rng = np.random.RandomState(seed)
    k = max(1, int(density * h * w))
    ys, xs = rng.randint(0, h, k), rng.randint(0, w, k)
    out[ys, xs] = rng.randint(200, 256, (k, 1)).astype(np.uint8)
    return out


def _smooth_frame(seed=0, h=48, w=64):
    """Smooth mid-contrast scene: gradient + soft blobs (no pixel
    noise), impulse residual ~0 but full gray span."""
    y = np.linspace(40, 215, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 30, w, dtype=np.float32)[None, :]
    base = (y + x) % 256
    img = np.stack([base, base * 0.9, base * 0.8], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_impulse_gate_sees_rain_contrast_gate_misses():
    """The structural fix for the WEATHER.json rain blindness: impulse
    noise RAISES contrast, so no contrast statistic can engage the
    chain on rain — the impulse residual does, and clean frames stay
    bit-equal to gate-off."""
    clean = _smooth_frame()
    rain = _rain(clean)
    cfg = _cfg_stat("pspan", 50.0)       # contrast never fires here
    cfg["auto_gate"]["impulse_thresh"] = 2.5
    pipe = PreprocessPipeline(cfg)
    # clean: neither statistic fires -> chain skipped, bit-equal
    np.testing.assert_array_equal(pipe(clean), clean)
    # rain: contrast-only gate misses it...
    contrast_only = PreprocessPipeline(_cfg_stat("pspan", 50.0))
    np.testing.assert_array_equal(contrast_only(rain), rain)
    # ...the impulse statistic engages the chain
    ungated = PreprocessPipeline(_cfg(gate=False))
    np.testing.assert_array_equal(pipe(rain), ungated(rain))


def test_impulse_stat_matches_host_oracle():
    """Device impulse residual == the tool's numpy mirror (same gray
    input; exact 9-element median both sides)."""
    import jax.numpy as jnp
    from tools.eval_weather import impulse_stats
    frames = np.stack([_rain(_smooth_frame(), 0.02, s) for s in range(3)])
    cfg = _cfg_stat("span", 0.0)         # contrast term never true
    cfg["auto_gate"]["impulse_thresh"] = 1.0
    pipe = PreprocessPipeline(cfg)
    want = impulse_stats(frames) >= 1.0
    f = frames.astype(np.float32)
    gray = (0.114 * f[..., 0] + 0.587 * f[..., 1] + 0.299 * f[..., 2]) \
        .astype(np.uint8).astype(np.int32)
    got = np.asarray(pipe._gate_from_gray(jnp.asarray(gray)))
    np.testing.assert_array_equal(got, want)


def test_auto_thresh_calibrates_and_gates():
    """contrast_thresh 'auto': ratio x percentile of the clean frames'
    statistic, resolved lazily from the first batch; the learned
    threshold then gates exactly like the numeric one."""
    clean = np.stack([_frame(i, lo=60, hi=200) for i in range(4)])
    cfg = _cfg_stat("pspan", "auto")
    pipe = PreprocessPipeline(cfg)
    out = np.asarray(pipe.apply_batch(clean))      # lazy calibration
    stats = pipe.host_gate_stats(clean)
    want = 0.85 * np.percentile(stats, 10.0)
    assert pipe._auto_thresh == pytest.approx(want)
    # clean frames sit ABOVE the learned threshold -> untouched
    np.testing.assert_array_equal(out, clean)
    # a flat (foggy) frame falls below it -> chain runs
    low = _frame(9, lo=100, hi=110)
    ungated = PreprocessPipeline(_cfg(gate=False))
    np.testing.assert_array_equal(pipe(low), ungated(low))


def test_auto_thresh_unresolved_raises():
    """A gated 'auto' pipeline whose compiled fn is traced before any
    calibration must fail loudly, not bake a silent default."""
    import jax.numpy as jnp
    pipe = PreprocessPipeline(_cfg_stat("span", "auto"))
    with pytest.raises(RuntimeError, match="calibrate_gate"):
        pipe._batch_fn(jnp.asarray(_frame(1)[None]))
    with pytest.raises(ValueError, match="auto"):
        PreprocessPipeline(_cfg_stat("span", "instant"))
