"""Atmospheric-scattering fog synthesis (reference: src/augment/fog.py).

Offline dataset augmentation: I = J·t + A·(1−t), t = exp(−β·d) (fog.py:85-90)
with the reference's full effect stack — multi-octave value-noise β field
(:8-46,167-170), horizon/vanishing-point depth proxy with sigmoid sky/road
blending (:142-164), adaptive airlight from the top band's bright pixels
with vertical/horizontal gradients and guided-filter smoothing (:120-139),
edge-preserving transmission (:173-179), global veil (:269-270), soft glow
(:182-191), 3-band depth blur (:194-214), local contrast fade in YCrCb
(:217-224), and random tint/gamma/sensor noise (:284-291). Presets
light/medium/heavy (:72-76) or MOR-driven β = 3.912/MOR Koschmieder
(:239-243).

TPU-native notes: all filtering is expressed as box-filter algebra (guided
filter, :55-67 — reimplemented exactly as integral-image box means, no
OpenCV) and separable Gaussian convolutions in jnp; this is an offline tool,
so plain jnp is fine (SURVEY.md §2.3). Randomness uses a numpy RandomState
like the reference — seeds give deterministic output for tests.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import bgr_to_gray_u8, bgr_to_ycrcb_u8, ycrcb_to_bgr_u8

FOG_PRESETS = {
    "light": dict(beta=(0.03, 0.06), airlight=(0.82, 0.93),
                  glow=(0.12, 0.22), contrast_drop=(0.06, 0.12)),
    "medium": dict(beta=(0.06, 0.12), airlight=(0.86, 0.96),
                   glow=(0.18, 0.34), contrast_drop=(0.10, 0.18)),
    "heavy": dict(beta=(0.12, 0.22), airlight=(0.90, 0.99),
                  glow=(0.28, 0.48), contrast_drop=(0.15, 0.26)),
}


def _value_noise_octave(rng, out_hw, lattice_hw) -> np.ndarray:
    """One octave: a coarse uniform-random lattice bilinearly resampled.

    Rows are lerped first, then columns, with the a+(b-a)*t form; lattice
    samples are drawn once per octave from ``rng``.
    """
    h, w = out_hw
    gh, gw = lattice_hw
    lattice = rng.rand(gh + 1, gw + 1).astype(np.float32)
    yy = np.linspace(0.0, gh, h, endpoint=False)
    xx = np.linspace(0.0, gw, w, endpoint=False)
    yi = yy.astype(np.intp)
    xi = xx.astype(np.intp)
    fy = (yy - yi).astype(np.float32)[:, None]
    fx = (xx - xi).astype(np.float32)[None, :]

    def lerp_cols(rows: np.ndarray) -> np.ndarray:
        left = rows[:, xi]
        return left + (rows[:, np.minimum(xi + 1, gw)] - left) * fx

    upper = lerp_cols(lattice[yi])
    lower = lerp_cols(lattice[np.minimum(yi + 1, gh)])
    return upper + (lower - upper) * fy


def rand_perlin(h: int, w: int, scale: int = 128, octaves: int = 2,
                persistence: float = 0.5, lacunarity: float = 2.0,
                seed: Optional[int] = None) -> np.ndarray:
    """Multi-octave bilinear value noise in [0, 1] (fog.py:8-46).

    Octave o uses a lattice of ~(h, w)·lacunarity^o / scale cells and
    weight persistence^o; the weighted sum is min-max normalized.
    """
    rng = np.random.RandomState(seed) if seed is not None else np.random
    fields, weights = [], []
    cell_density = 1.0 / max(1, scale)
    for octave in range(max(1, octaves)):
        lattice_hw = (max(1, int(h * cell_density)),
                      max(1, int(w * cell_density)))
        fields.append(_value_noise_octave(rng, (h, w), lattice_hw))
        weights.append(persistence ** octave)
        cell_density *= lacunarity
    mixed = sum(wt * f for wt, f in zip(weights, fields))
    mixed /= max(1e-6, sum(weights))
    lo, hi = float(mixed.min()), float(mixed.max())
    return ((mixed - lo) / max(1e-6, hi - lo)).astype(np.float32)


# ---------------------------------------------------------------------------
# Filtering primitives (jnp)
# ---------------------------------------------------------------------------

def _box_sum_axis0(v: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sliding-window sum over [i-r, i+r] ∩ [0, n) along axis 0 (cumsum)."""
    n = v.shape[0]
    c = jnp.cumsum(v, axis=0)
    hi = jnp.clip(jnp.arange(n) + radius, 0, n - 1)
    lo = jnp.arange(n) - radius - 1
    upper = jnp.take(c, hi, axis=0)
    mask = (lo >= 0).reshape((n,) + (1,) * (v.ndim - 1))
    lower = jnp.where(mask, jnp.take(c, jnp.clip(lo, 0, n - 1), axis=0), 0.0)
    return upper - lower


def box_mean(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Normalized box filter with edge-correct counts (integral images)."""
    if x.ndim == 3:
        return jnp.stack([box_mean(x[..., c], radius)
                          for c in range(x.shape[-1])], axis=-1)
    num = _box_sum_axis0(_box_sum_axis0(x, radius).T, radius).T
    ones = jnp.ones_like(x)
    den = _box_sum_axis0(_box_sum_axis0(ones, radius).T, radius).T
    return num / den


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int = 8,
                  eps: float = 1e-3) -> jnp.ndarray:
    """Edge-preserving guided filter (He et al.) as box-filter algebra.

    guide, src: (H, W) float32 in [0, 1]. Replaces
    cv2.ximgproc.guidedFilter (fog.py:55-67).
    """
    mean_i = box_mean(guide, radius)
    mean_p = box_mean(src, radius)
    corr_ip = box_mean(guide * src, radius)
    corr_ii = box_mean(guide * guide, radius)
    var_i = corr_ii - mean_i * mean_i
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return box_mean(a, radius) * guide + box_mean(b, radius)


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian, reflect-101 border (cv2.GaussianBlur parity)."""
    ksize = int(ksize) | 1
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = ksize // 2
    t = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(t * t) / (2 * sigma * sigma))
    k = jnp.asarray(k / k.sum(), jnp.float32)

    def conv_axis(v, axis):
        vp = jnp.pad(v, [(r, r) if i == axis else (0, 0)
                         for i in range(v.ndim)], mode="reflect")
        idx = jnp.arange(v.shape[axis])
        out = jnp.zeros_like(v)
        for j in range(ksize):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(j, j + v.shape[axis])
            out = out + k[j] * vp[tuple(sl)]
        return out

    return conv_axis(conv_axis(x, 0), 1)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _ensure_3c(x: jnp.ndarray) -> jnp.ndarray:
    return x if x.ndim == 3 else jnp.stack([x, x, x], axis=-1)


def _rand_range(lo, hi, rng) -> float:
    return float(lo + (hi - lo) * rng.rand())


class EnhancedFogSynthesizer:
    """Road fog synthesis with the reference's parameters (fog.py:84-117)."""

    def __init__(self, level: str = "medium", mor: Optional[float] = None,
                 y_h_ratio: float = 0.42, vanishing_x_ratio: float = 0.5,
                 perlin_scale_ratio: float = 0.18, perlin_octaves: int = 2,
                 sky_boost: float = 1.25, road_damp: float = 0.9,
                 edge_guided: bool = True, horizon_softness: float = 0.06,
                 depth_blur_max: float = 3.5, global_veil: float = 0.06,
                 seed: Optional[int] = None):
        self.level = level
        self.mor = mor
        self.y_h_ratio = y_h_ratio
        self.vx_ratio = vanishing_x_ratio
        self.perlin_scale_ratio = perlin_scale_ratio
        self.perlin_octaves = perlin_octaves
        self.sky_boost = sky_boost
        self.road_damp = road_damp
        self.edge_guided = edge_guided
        self.horizon_softness = horizon_softness
        self.depth_blur_max = depth_blur_max
        self.global_veil = global_veil
        self.rng = np.random.RandomState(seed) if seed is not None else np.random

    # -- adaptive airlight (fog.py:120-139) --
    def _airlight(self, img: jnp.ndarray) -> jnp.ndarray:
        h, w = img.shape[:2]
        band_h = max(10, int(0.12 * h))
        top = np.asarray(img[:band_h])
        lum = 0.299 * top[:, :, 2] + 0.587 * top[:, :, 1] + 0.114 * top[:, :, 0]
        thr = np.quantile(lum, 0.9)
        mask = lum >= thr
        if mask.sum() < 100:
            a_rgb = top.mean(axis=(0, 1))
        else:
            a_rgb = top[mask].mean(axis=0)
        tint = self.rng.uniform(-0.02, 0.02, size=3).astype(np.float32)
        a_rgb = np.clip(a_rgb + tint, 0.7, 1.0).astype(np.float32)
        vgrad = jnp.linspace(1.0, 0.85, h)[:, None]
        xgrad = jnp.linspace(0.95, 1.05, w)[None, :]
        a_map = _ensure_3c(vgrad * xgrad) * jnp.asarray(a_rgb)[None, None, :]
        guide = jnp.mean(img, axis=2)
        chans = [guided_filter(guide, a_map[:, :, c], radius=16, eps=1e-3)
                 for c in range(3)]
        return jnp.clip(jnp.stack(chans, axis=-1), 0.7, 1.0)

    # -- depth prior (fog.py:142-164) --
    def _depth_proxy(self, h: int, w: int):
        y_h = int(self.y_h_ratio * h)
        yy, xx = jnp.mgrid[0:h, 0:w]
        yy = yy.astype(jnp.float32)
        xx = xx.astype(jnp.float32)
        d_persp = 1.0 / jnp.maximum(yy - y_h, 1.0)
        vx, vy = float(self.vx_ratio * w), float(y_h)
        r = jnp.sqrt((xx - vx) ** 2 + (yy - vy) ** 2) + 1.0
        d_vanish = 1.0 / r
        d = 0.7 * (d_persp / d_persp.max()) + 0.3 * (d_vanish / d_vanish.max())
        d = (d - d.min()) / jnp.maximum(1e-6, d.max() - d.min())
        softness = max(1e-3, self.horizon_softness) * h
        sky_weight = _sigmoid((y_h - yy) / softness)
        d = d * (1.0 + (self.sky_boost - 1.0) * sky_weight) \
            * (self.road_damp ** (1.0 - sky_weight))
        return jnp.clip(d, 0, 1), y_h, sky_weight

    def _beta_map(self, h: int, w: int, base_beta: float) -> jnp.ndarray:
        scale = max(16, int(self.perlin_scale_ratio * w))
        noise = rand_perlin(h, w, scale=scale, octaves=self.perlin_octaves,
                            seed=int(self.rng.randint(int(1e9))))
        return jnp.asarray(base_beta * (0.85 + 0.35 * noise), jnp.float32)

    def _transmission(self, beta_map, depth, guide):
        t = jnp.clip(jnp.exp(-beta_map * depth), 0.05, 1.0)
        if self.edge_guided:
            t = jnp.clip(guided_filter(guide, t, radius=8, eps=1e-3),
                         0.05, 1.0)
        return t

    # -- soft glow (fog.py:182-191) --
    def _glow(self, img: jnp.ndarray, strength: float) -> jnp.ndarray:
        gray = bgr_to_gray_u8(jnp.clip(img * 255 + 0.5, 0, 255)
                              .astype(jnp.uint8)).astype(jnp.float32) / 255.0
        thr = jnp.clip(gray.mean() + 0.6 * gray.std(), 0.65, 0.9)
        hard = (gray > thr).astype(jnp.float32)
        k = int(9 + 20 * strength) | 1
        soft = jnp.clip(gaussian_blur(hard, k, k * 0.35), 0, 1)
        k2 = int(max(7, (img.shape[0] + img.shape[1])
                     * (0.003 + 0.01 * strength))) | 1
        blur = gaussian_blur(img, k2, k2 * 0.25)
        soft3 = soft[..., None]
        return jnp.clip(img * (1 - soft3) + (img + strength * blur) * soft3,
                        0, 1)

    # -- 3-band depth blur (fog.py:194-214) --
    def _depth_blur(self, hazy, depth, strength: float):
        r = jnp.clip(depth * self.depth_blur_max * (0.5 + strength),
                     0.0, self.depth_blur_max * 1.5)
        out = hazy
        prev = 0.0
        for band in (0.33, 0.66, 1.0):
            mask = ((depth >= prev) & (depth < band)).astype(jnp.float32)
            prev = band
            count = float(mask.sum())
            if count < 100:
                continue
            rad = int(max(1, float((r * mask).sum() / count) * 1.5)) | 1
            if rad <= 1:
                continue
            blurred = gaussian_blur(hazy, rad, rad * 0.5)
            m3 = _ensure_3c(gaussian_blur(mask, rad | 1, rad * 0.5))
            out = out * (1 - m3) + blurred * m3
        return jnp.clip(out, 0, 1)

    # -- local contrast fade (fog.py:217-224) --
    def _contrast_fade(self, img, amount: float):
        u8 = jnp.clip(img * 255 + 0.5, 0, 255).astype(jnp.uint8)
        ycc = bgr_to_ycrcb_u8(u8)
        y = ycc[..., 0].astype(jnp.float32) / 255.0
        # edge-preserving smooth of luma (guided filter stands in for the
        # reference's bilateral — same role: keep edges, kill local contrast)
        rad = (int(5 + amount * 20) | 1) // 2
        y_smooth = guided_filter(y, y, radius=max(2, rad), eps=1e-2)
        y_mix = jnp.clip((1.0 - amount) * y + amount * y_smooth, 0, 1)
        y_u8 = jnp.clip(jnp.rint(y_mix * 255), 0, 255).astype(jnp.uint8)
        merged = jnp.concatenate([y_u8[..., None], ycc[..., 1:]], axis=-1)
        return ycrcb_to_bgr_u8(merged).astype(jnp.float32) / 255.0

    # -- main entry (fog.py:227-299) --
    def synthesize(self, bgr_uint8: np.ndarray,
                   level: Optional[str] = None
                   ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        img = jnp.asarray(bgr_uint8, jnp.float32) / 255.0
        h, w = img.shape[:2]
        if level is not None:
            self.level = level

        if self.mor is not None and self.mor > 0:
            base_beta = 3.912 / float(self.mor)  # Koschmieder
            glow_rng = (0.12, 0.45)
            cdrop_rng = (0.08, 0.22)
            a_rng = (0.86, 0.98)
        else:
            preset = FOG_PRESETS[self.level]
            base_beta = _rand_range(*preset["beta"], self.rng)
            glow_rng = preset["glow"]
            cdrop_rng = preset["contrast_drop"]
            a_rng = preset["airlight"]

        depth, y_h, sky_weight = self._depth_proxy(h, w)
        beta_map = self._beta_map(h, w, base_beta)

        a_map = self._airlight(img)
        scale = _rand_range(*a_rng, self.rng) / max(1e-6, float(a_map.mean()))
        a_map = jnp.clip(a_map * scale, 0.75, 1.0)

        guide = bgr_to_gray_u8(bgr_uint8).astype(jnp.float32) / 255.0
        t = self._transmission(beta_map, depth, guide)
        t3 = _ensure_3c(t)

        hazy = img * t3 + a_map * (1.0 - t3)

        gv = self.global_veil * (0.6 + 0.4 * sky_weight)
        gv3 = _ensure_3c(gv)
        hazy = jnp.clip(hazy * (1.0 - gv3) + a_map * gv3, 0, 1)

        hazy = self._glow(hazy, _rand_range(*glow_rng, self.rng))
        hazy = self._depth_blur(hazy, depth, strength=base_beta)
        hazy = self._contrast_fade(hazy, _rand_range(*cdrop_rng, self.rng))

        tint = (1.0 + self.rng.uniform(-0.015, 0.02, size=3)).astype(np.float32)
        hazy = jnp.clip(hazy * jnp.asarray(tint)[None, None, :], 0, 1)
        if self.rng.rand() < 0.35:
            gamma = 1.0 + self.rng.uniform(-0.04, 0.05)
            hazy = jnp.clip(hazy ** gamma, 0, 1)
        if self.rng.rand() < 0.3:
            noise = self.rng.normal(0, 0.0035, size=hazy.shape).astype(np.float32)
            hazy = jnp.clip(hazy + jnp.asarray(noise), 0, 1)

        out = np.asarray(jnp.clip(hazy * 255.0 + 0.5, 0, 255)).astype(np.uint8)
        return out, {
            "beta_map": np.asarray(beta_map),
            "A_map": np.asarray(a_map),
            "depth": np.asarray(depth),
            "y_h": y_h,
            "t": np.asarray(t),
        }
