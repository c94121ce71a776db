"""Pluggable preprocess pipeline (reference: src/preprocess/pipeline.py:7-45).

Semantics preserved:
  - built from ``cfg.chain = [{name, params}, ...]`` via the registry;
  - disabled or empty chain → identity;
  - optional low-contrast auto-gate: when enabled, the WHOLE chain is
    skipped for frames whose gray-level span (max-min) is >= contrast_thresh
    (i.e. the chain only runs on low-contrast frames, pipeline.py:37-40);
  - ops fold left-to-right;
  - ``ts`` accepted and ignored (pipeline.py:32).

TPU-native form: :meth:`apply_batch` is a single jitted function over a
frame batch. The auto-gate becomes a per-frame mask and a ``jnp.where``
select — both branches are computed on device (static shapes, no host
round-trip), which is the XLA-idiomatic way to express per-element
control flow.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import bgr_to_gray_u8, gray_from_bgr_planes
from .registry import get_op_class


# ---------------------------------------------------------------------------
# Host (numpy) mirrors of the device gate statistics — the SINGLE source
# for threshold calibration (calibrate_gate / tools/calibrate_gate.py),
# the weather-eval report columns (tools/eval_weather.py), and tests.
# Float-luma gray here: the calibration margin dwarfs the ±1 LSB
# difference from the device's fixed-point gray.

def host_contrast_stats(frames_u8: np.ndarray,
                        stat: str = "span") -> np.ndarray:
    """Per-frame contrast statistic: 'span' = gray max−min (the
    reference-exact gate statistic, ref pipeline.py:24-30); 'pspan' =
    p99.5−p0.5 of the stride-4 gray subsample (the outlier-robust
    additive variant)."""
    f = np.asarray(frames_u8).astype(np.float32)
    gray = (0.114 * f[..., 0] + 0.587 * f[..., 1]
            + 0.299 * f[..., 2]).astype(np.uint8).astype(np.int32)
    if str(stat) == "pspan":
        sub = gray[..., ::4, ::4]
        flat = sub.reshape(sub.shape[:-2] + (-1,))
        n = flat.shape[-1]
        s = np.sort(flat, axis=-1)
        lo = s[..., max(0, int(0.005 * (n - 1)))]
        hi = s[..., min(n - 1, int(0.995 * (n - 1)))]
        return (hi - lo).astype(np.float64)
    return (gray.max(axis=(-2, -1))
            - gray.min(axis=(-2, -1))).astype(np.float64)


def host_impulse_stats(frames_u8: np.ndarray) -> np.ndarray:
    """Per-frame impulse residual, mirroring the device rain statistic:
    mean |gray − median3x3(gray)| on the stride-4 subsample. Contrast
    statistics are structurally blind to impulse noise (it RAISES
    contrast); this is what lets the gate see the degradation the
    MedianDerain op exists for."""
    f = np.asarray(frames_u8).astype(np.float32)
    gray = (0.114 * f[..., 0] + 0.587 * f[..., 1]
            + 0.299 * f[..., 2]).astype(np.uint8).astype(np.int32)
    sub = gray[..., ::4, ::4]
    p = np.pad(sub, ((0, 0), (1, 1), (1, 1)), mode="edge")
    h, w = sub.shape[1:]
    neigh = np.stack([p[:, dy:dy + h, dx:dx + w]
                      for dy in range(3) for dx in range(3)], axis=-1)
    med = np.median(neigh, axis=-1)
    return np.abs(sub - med).mean(axis=(1, 2)).astype(np.float64)


class PreprocessPipeline:
    def __init__(self, config: Dict[str, Any]):
        self.enabled = bool(config.get("enabled", True))
        self.chain_cfg = config.get("chain", []) or []
        self.auto_gate_cfg = config.get("auto_gate", {}) or {}
        stat = str(self.auto_gate_cfg.get("stat", "span"))
        if stat not in ("span", "pspan"):
            raise ValueError(f"auto_gate.stat {stat!r} unknown "
                             f"(span | pspan)")
        t = self.auto_gate_cfg.get("contrast_thresh", 20.0)
        self._auto_thresh: Optional[float] = None   # resolved "auto" value
        if isinstance(t, str) and t != "auto":
            raise ValueError(f"auto_gate.contrast_thresh must be a number "
                             f"or 'auto', got {t!r}")
        self.ops = []
        for node in self.chain_cfg:
            cls = get_op_class(node.get("name"))
            self.ops.append(cls(**(node.get("params", {}) or {})))
        self._jitted = jax.jit(self._batch_fn)

    @property
    def identity(self) -> bool:
        return not self.enabled or not self.ops

    # ------------------------------------------------------------------
    # auto-gate threshold resolution (auto_gate.contrast_thresh: "auto")
    @property
    def _thresh_is_auto(self) -> bool:
        return self.auto_gate_cfg.get("contrast_thresh", 20.0) == "auto"

    def _gate_thresh(self) -> float:
        """The compile-time gate threshold. "auto" must be resolved by
        :meth:`calibrate_gate` (or the first batch seen by apply_batch /
        the engine) BEFORE the gated function traces — raising here
        keeps a missed call-site loud instead of silently baking a
        default."""
        if self._thresh_is_auto:
            if self._auto_thresh is None:
                raise RuntimeError(
                    "auto_gate.contrast_thresh: 'auto' is unresolved — "
                    "call calibrate_gate(clean_frames) before the first "
                    "gated batch (the engine does this from its first "
                    "batch; tools/calibrate_gate.py emits an explicit "
                    "value from representative clean content)")
            return self._auto_thresh
        return float(self.auto_gate_cfg.get("contrast_thresh", 20.0))

    def host_gate_stats(self, frames_u8: np.ndarray) -> np.ndarray:
        """Per-frame contrast statistic (auto_gate.stat) on the host —
        numpy mirror of the device gate, for threshold calibration
        (module-level :func:`host_contrast_stats` is the one
        implementation)."""
        return host_contrast_stats(
            frames_u8, str(self.auto_gate_cfg.get("stat", "span")))

    def calibrate_gate(self, frames_u8: np.ndarray = None,
                       stats: np.ndarray = None) -> float:
        """Resolve the "auto" contrast threshold from representative
        CLEAN frames: ``auto_ratio`` (default 0.85) x the
        ``auto_pct``-th percentile (default 10) of the per-frame
        statistic. The ratio places the threshold below the clean
        distribution but above reference-tool fog (which compresses the
        span to ~0.78 of clean on the measured content — WEATHER.json).

        The value is frozen before the gated function traces — a
        runtime-varying threshold would either retrace per change or
        thread a traced scalar through every compiled step and scan
        carry; freezing keeps the device-resident paths valid. For
        drifting deployments, re-run tools/calibrate_gate.py and
        hot-reload the numeric threshold.

        ``stats``: optional precomputed host_gate_stats array (callers
        that also report the statistics avoid computing them twice).
        """
        if stats is None:
            stats = self.host_gate_stats(frames_u8)
        ratio = float(self.auto_gate_cfg.get("auto_ratio", 0.85))
        pct = float(self.auto_gate_cfg.get("auto_pct", 10.0))
        self._auto_thresh = float(ratio * np.percentile(stats, pct))
        return self._auto_thresh

    def ensure_gate_calibrated(self, frames_u8: np.ndarray) -> None:
        """Lazy auto-calibration hook for streaming callers: resolves
        the "auto" threshold from the FIRST batch (assumed clean — the
        deployment contract; startup-in-fog needs the explicit tool).
        No-op once resolved or when the threshold is numeric."""
        if self._gated and self._thresh_is_auto \
                and self._auto_thresh is None:
            # np.asarray only here: on the common (resolved / numeric)
            # path the frames must never round-trip device -> host
            self.calibrate_gate(np.asarray(frames_u8))

    def _gate_from_gray(self, gray: jnp.ndarray) -> jnp.ndarray:
        """True where the chain should run, from an int32 gray plane.

        ``auto_gate.stat`` picks the contrast statistic:
          * "span" (default, reference-exact): max−min gray level
            (reference pipeline.py:24-30). Fragile by construction — a
            single bright/dark pixel defeats it (measured: impulse
            "rain" noise and default-veil fog leave the span at clean-
            scene levels, WEATHER.json caveat).
          * "pspan" (additive): p99.5−p0.5 of the gray values on a
            stride-4 subsample — robust to outlier pixels (≤0.5% of the
            frame can't move it), one fused per-frame sort of ~N/16
            values, fixed shapes, no histogram materialization.

        ``auto_gate.impulse_thresh`` (additive, default off) closes the
        gate's structural rain blindness: ANY contrast statistic reads
        impulse noise as normal-or-better contrast, yet the chain's
        median op exists exactly for rain (reference
        median_derain.py:10-14). When set, the chain ALSO runs on
        frames whose impulse residual — mean |gray − median3x3(gray)|
        on the stride-4 subsample — is >= the threshold. Measured on
        the WEATHER content: clean scenes <= 1.6, 2% impulse rain
        >= 2.7 at every fog level, so the shipped 2.5 splits cleanly
        (tools/eval_weather.py; same fixed-shape fused-reduction
        discipline as pspan).
        """
        thresh = self._gate_thresh()
        stat = str(self.auto_gate_cfg.get("stat", "span"))
        if stat == "pspan":
            sub = gray[..., ::4, ::4]
            flat = sub.reshape(sub.shape[:-2] + (-1,))
            n = flat.shape[-1]
            s = jnp.sort(flat, axis=-1)
            lo = s[..., max(0, int(0.005 * (n - 1)))]
            hi = s[..., min(n - 1, int(0.995 * (n - 1)))]
            run = (hi - lo).astype(jnp.float32) < thresh
        else:
            span = (jnp.max(gray, axis=(-2, -1))
                    - jnp.min(gray, axis=(-2, -1)))
            run = span.astype(jnp.float32) < thresh
        # `or None`: YAML null arrives as {} through sanitize_none, and
        # 0 disables — both mean "off"
        imp_t = self.auto_gate_cfg.get("impulse_thresh") or None
        if imp_t is not None:
            sub = gray[..., ::4, ::4]
            h, w = sub.shape[-2], sub.shape[-1]
            pad = [(0, 0)] * (sub.ndim - 2) + [(1, 1), (1, 1)]
            p = jnp.pad(sub, pad, mode="edge")
            neigh = jnp.stack([p[..., dy:dy + h, dx:dx + w]
                               for dy in range(3) for dx in range(3)],
                              axis=-1)
            med = jnp.sort(neigh, axis=-1)[..., 4]   # exact 9-median
            resid = jnp.abs(sub - med).astype(jnp.float32)
            run = run | (resid.mean(axis=(-2, -1)) >= float(imp_t))
        return run

    @property
    def _gated(self) -> bool:
        return bool(self.auto_gate_cfg.get("enable_low_contrast_gate", False))

    def _batch_fn(self, frames: jnp.ndarray) -> jnp.ndarray:
        if all(op.supports_planar() for op in self.ops):
            return self._planar_fn(frames)
        out = frames
        for op in self.ops:
            out = op.apply_batch(out)
        if self._gated:
            run = self._gate_from_gray(bgr_to_gray_u8(frames).astype(jnp.int32))
            # broadcast per-frame mask over (H, W, 3)
            run = run.reshape(run.shape + (1, 1, 1))
            out = jnp.where(run, out, frames)
        return out

    def _planar_fn(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Fused planar path: one unpack, op chain on int16 channel planes
        (full-lane layout, half the inter-op HBM traffic of int32 for the
        u8-domain values — the fixed-point color products widen to int32
        in registers; see ops/color.py), one repack."""
        x = frames.astype(jnp.int16)
        planes = (x[..., 0], x[..., 1], x[..., 2])
        out = planes
        for op in self.ops:
            out = op.apply_planar(out)
        if self._gated:
            run = self._gate_from_gray(gray_from_bgr_planes(*planes))
            run = run.reshape(run.shape + (1, 1))
            out = tuple(jnp.where(run, o, p) for o, p in zip(out, planes))
        return jnp.stack(out, axis=-1).astype(jnp.uint8)

    def supports_sampled(self) -> bool:
        """True when the chain can produce output directly at a strided
        sample grid: planar-capable, un-gated (the gate reads full-res
        output), and the terminal op implements the sampled path."""
        return (not self.identity
                and not self._gated
                and all(op.supports_planar() for op in self.ops)
                and self.ops[-1].supports_planar_sampled())

    def sampled_planes_fn(self, plan_y, plan_x):
        """(..., H, W, 3) u8 → int32 (b, g, r) planes at the sample grid.

        All ops but the last run full-resolution (downstream ops read
        full neighborhoods/histograms); the terminal op evaluates only
        the ``(stride, offset, count)`` grid — bit-identical to running
        the chain fully and then slicing (tested in
        tests/test_preprocess_pipeline.py).
        """
        assert self.supports_sampled()

        def fn(frames):
            x = frames.astype(jnp.int16)
            out = (x[..., 0], x[..., 1], x[..., 2])
            for op in self.ops[:-1]:
                out = op.apply_planar(out)
            return self.ops[-1].apply_planar_sampled(out, plan_y, plan_x)

        return fn

    def apply_batch(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Device path: (..., H, W, 3) uint8 → processed uint8 batch."""
        if self.identity:
            return frames
        self.ensure_gate_calibrated(frames)
        return self._jitted(frames)

    def __call__(self, image: np.ndarray, ts: Optional[float] = None) -> np.ndarray:
        """Host single-frame API, parity with the reference (ts ignored)."""
        if self.identity:
            return image
        self.ensure_gate_calibrated(image[None])
        return np.asarray(self._jitted(jnp.asarray(image)))
