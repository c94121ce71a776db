"""Global (camera) motion compensation for tracking — on device.

Beyond-reference tracking support: the reference assumes a fixed camera
(src/track/sort_tracker.py — the Kalman motion model is scene-relative),
so a dashcam jolt or a PTZ pan moves EVERY box in image space at once
and the predicted-IoU association collapses (identities reshuffle).
``tracking.gmc: true`` estimates the global translation between
consecutive frames and shifts the tracker's position memory before
association — the translation-model analogue of BoT-SORT's GMC module
(which runs sparse optical flow on the host CPU).

TPU-native formulation: **phase correlation**. Both frames are
downsampled to a fixed G×G gray thumbnail (strided mean — no resize
kernels), and the normalized cross-power spectrum
``R = F₁·conj(F₂) / |F₁·conj(F₂)|`` peaks at the circular shift between
them; two batched 2-D FFTs + one elementwise normalize + an argmax.
Everything is fixed-shape and rides the device — no host round-trip,
no feature detection, no RANSAC. Rotation/zoom are out of scope (the
translation term dominates vehicle-camera jitter); the estimate is
clamped to ±G/4 thumbnail pixels so a scene cut cannot catapult tracks.
"""
from __future__ import annotations

import jax.numpy as jnp

GMC_SIZE = 128          # gray thumbnail side (power of two: fast FFT)
MAX_SHIFT_FRAC = 0.25   # clamp |shift| to this fraction of the thumbnail


def gray_thumbnail(frame_u8: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8 BGR → (G, G) f32 gray thumbnail.

    Strided-mean downsample (gather-free reshape averaging); frames
    smaller than G×G along an axis are zero-padded — padding is common
    to both frames of a correlation pair, so the peak is unaffected."""
    h, w = frame_u8.shape[:2]
    sy = max(1, h // GMC_SIZE)
    sx = max(1, w // GMC_SIZE)
    gh = min(GMC_SIZE, h // sy)
    gw = min(GMC_SIZE, w // sx)
    crop = frame_u8[: sy * gh, : sx * gw]
    g = jnp.mean(crop.astype(jnp.float32), axis=-1)
    g = g.reshape(gh, sy, gw, sx).mean(axis=(1, 3))
    return jnp.pad(g, ((0, GMC_SIZE - gh), (0, GMC_SIZE - gw)))


def phase_shift(prev_g: jnp.ndarray, cur_g: jnp.ndarray) -> jnp.ndarray:
    """(G, G) × (G, G) → (2,) f32 (dx, dy): the translation that maps
    ``prev`` content onto ``cur`` (thumbnail pixels, signed)."""
    g = prev_g.shape[0]
    # remove DC so blank regions don't dominate the spectrum
    f1 = jnp.fft.rfft2(prev_g - prev_g.mean())
    f2 = jnp.fft.rfft2(cur_g - cur_g.mean())
    cross = f2 * jnp.conj(f1)
    r = jnp.fft.irfft2(cross / jnp.maximum(jnp.abs(cross), 1e-9),
                       s=(g, g))
    idx = jnp.argmax(r)
    dy = idx // g
    dx = idx % g
    # wrap circular indices to signed shifts
    dx = jnp.where(dx > g // 2, dx - g, dx).astype(jnp.float32)
    dy = jnp.where(dy > g // 2, dy - g, dy).astype(jnp.float32)
    lim = g * MAX_SHIFT_FRAC
    return jnp.stack([jnp.clip(dx, -lim, lim), jnp.clip(dy, -lim, lim)])


def batch_shifts(prev_gray: jnp.ndarray, grays: jnp.ndarray,
                 prev_valid: jnp.ndarray, scale_xy) -> jnp.ndarray:
    """Per-frame camera shifts for a batch, in SOURCE pixels.

    prev_gray (G, G): carried thumbnail of the previous batch's last
    frame; grays (B, G, G): this batch's thumbnails; prev_valid ():
    0.0 on the very first batch (no previous frame — shift forced 0);
    scale_xy: (sx, sy) thumbnail→source pixel factors.
    Returns (B, 2) f32 (dx, dy) source-pixel shifts.
    """
    import jax

    prevs = jnp.concatenate([prev_gray[None], grays[:-1]], axis=0)
    shifts = jax.vmap(phase_shift)(prevs, grays)         # (B, 2) thumb px
    first_w = jnp.concatenate(
        [prev_valid[None], jnp.ones((grays.shape[0] - 1,))])
    shifts = shifts * first_w[:, None]
    return shifts * jnp.asarray(scale_xy, jnp.float32)[None]
