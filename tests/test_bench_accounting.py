"""bench.py perf-accounting unit tests (CPU).

Pins the FLOPs/bytes cost_analysis normalization and the MFU/roofline
stderr fragment that BENCH_r* carries (VERDICT r3 weak #1 — the perf
story must be self-consistent; round 4 extended the FLOPs/MFU side
with bytes-accessed/GB/s/arithmetic-intensity). The reference has no
perf accounting at all (SURVEY.md §6: `published: {}`) — this is
rebuild-only surface.
"""

import jax
import jax.numpy as jnp
import pytest

import bench


def _scan_fn(length):
    @jax.jit
    def f(x):
        def body(c, _):
            return c * 1.5 + 0.5, ()
        y, _ = jax.lax.scan(body, x, None, length=length)
        return y
    return f


def test_cost_per_dispatch_reports_flops_and_bytes():
    x = jnp.ones((256, 256), jnp.float32)
    flops, nbytes = bench.cost_per_dispatch(_scan_fn(4), x)
    if flops == 0.0:
        pytest.skip("backend reports no cost_analysis")
    # body: one fma over 256^2 elements = 2 flops/elem, counted once
    assert flops >= 2 * 256 * 256
    # at least read + write of the 256 KiB carry
    assert nbytes >= 2 * 4 * 256 * 256


def test_cost_analysis_scan_body_counted_once():
    """The bench divides per-dispatch cost by ONE batch: XLA must report
    a scan body once, not x trip count, for both flops and bytes."""
    x = jnp.ones((256, 256), jnp.float32)
    f2, b2 = bench.cost_per_dispatch(_scan_fn(2), x)
    f32, b32 = bench.cost_per_dispatch(_scan_fn(32), x)
    if f2 == 0.0:
        pytest.skip("backend reports no cost_analysis")
    assert f32 == pytest.approx(f2, rel=1e-6)
    assert b32 == pytest.approx(b2, rel=1e-6)


def test_flops_per_dispatch_matches_cost_flops():
    x = jnp.ones((64, 64), jnp.float32)
    fn = _scan_fn(4)
    assert bench.flops_per_dispatch(fn, x) == bench.cost_per_dispatch(fn, x)[0]


def test_mfu_part_roofline_fragment():
    # 100 GFLOPs + 100 MB per frame at 10 fps: 1 TFLOP/s, 1 GB/s,
    # intensity 1000 FLOPs/B -> compute-bound side of the v5e ridge
    s = bench._mfu_part(10.0, 100e9, 100e6)
    assert "100.00 GFLOPs/frame" in s
    assert "1.000 TFLOP/s" in s
    assert "100.0 MB/frame" in s
    assert "implied 1.0 GB/s" in s
    assert "compute-bound" in s
    # intensity 10 FLOPs/B -> memory-bound side
    s = bench._mfu_part(10.0, 1e9, 100e6)
    assert "memory-bound" in s
    # bytes unavailable -> FLOPs-only fragment, no roofline claim
    s = bench._mfu_part(10.0, 1e9, 0.0)
    assert "GFLOPs/frame" in s and "GB/s" not in s
    assert bench._mfu_part(10.0, 0.0) == " FLOPs/frame unavailable"


def test_mfu_part_int8_peak_switch(monkeypatch):
    monkeypatch.setattr(bench, "_BENCH_DTYPE", "int8-static")
    s = bench._mfu_part(10.0, 394e9, 0.0)
    assert "(394 int8-static)" in s
    assert "1.00% MFU" in s


@pytest.mark.slow
def test_calibrate_gbps_runs_tiny():
    """Formula/shape check only (CPU rate is meaningless): returns a
    positive finite GB/s for a tiny sweep."""
    rate = bench.calibrate_gbps(steps=2, par=1, reps=1)
    assert rate > 0.0 and jnp.isfinite(rate)
