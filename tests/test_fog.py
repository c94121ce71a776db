"""Fog synthesizer: filtering primitives vs oracles + end-to-end behavior."""
import numpy as np
import pytest

from roadvision_tpu.augment import (EnhancedFogSynthesizer, box_mean,
                                    gaussian_blur, guided_filter, rand_perlin)


def test_rand_perlin_range_and_determinism():
    a = rand_perlin(40, 60, scale=16, octaves=2, seed=7)
    b = rand_perlin(40, 60, scale=16, octaves=2, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() <= 1 and a.std() > 0.01


def test_box_mean_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.rand(13, 17).astype(np.float32)
    r = 3
    got = np.asarray(box_mean(x, r))
    want = np.zeros_like(x)
    for i in range(13):
        for j in range(17):
            win = x[max(0, i - r):i + r + 1, max(0, j - r):j + r + 1]
            want[i, j] = win.mean()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_blur_preserves_mean_and_smooths():
    rng = np.random.RandomState(1)
    x = rng.rand(32, 32).astype(np.float32)
    out = np.asarray(gaussian_blur(x, 9, 2.0))
    assert abs(out.mean() - x.mean()) < 1e-2
    assert out.std() < x.std()
    # constant image unchanged
    const = np.full((16, 16), 0.7, np.float32)
    np.testing.assert_allclose(np.asarray(gaussian_blur(const, 7, 1.5)),
                               const, atol=1e-6)


def test_guided_filter_edge_preserving():
    # step edge: guided filter keeps it much sharper than a box filter
    x = np.zeros((32, 32), np.float32)
    x[:, 16:] = 1.0
    noisy = x + np.random.RandomState(0).randn(32, 32).astype(np.float32) * 0.05
    gf = np.asarray(guided_filter(x, noisy, radius=6, eps=1e-4))
    bm = np.asarray(box_mean(noisy, 6))
    edge_gf = abs(gf[:, 17].mean() - gf[:, 14].mean())
    edge_bm = abs(bm[:, 17].mean() - bm[:, 14].mean())
    assert edge_gf > 0.8 and edge_bm < 0.5


def _road_image(h=96, w=128):
    img = np.zeros((h, w, 3), np.uint8)
    img[:40] = (230, 205, 190)    # sky
    img[40:] = (90, 90, 90)       # road
    img[60:80, 50:80] = (40, 40, 170)  # a red-ish car
    return img


def test_synthesize_scattering_behavior():
    img = _road_image()
    synth = EnhancedFogSynthesizer(level="heavy", seed=3)
    hazy, meta = synth.synthesize(img)
    assert hazy.shape == img.shape and hazy.dtype == np.uint8
    # scattering pulls dark road pixels toward the (bright) airlight
    road_in = img[45:, :, :].mean()
    road_out = hazy[45:, :, :].mean()
    assert road_out > road_in + 5
    # overall brightening from airlight/veil/glow
    assert hazy.mean() > img.mean()
    for key in ("beta_map", "A_map", "depth", "y_h", "t"):
        assert key in meta
    assert meta["t"].min() >= 0.05 - 1e-5 and meta["t"].max() <= 1.0 + 1e-5
    assert 0.7 <= meta["A_map"].min() and meta["A_map"].max() <= 1.0


def test_levels_ordered_by_severity():
    img = _road_image()
    t_mean = {}
    for lv in ("light", "heavy"):
        _, meta = EnhancedFogSynthesizer(level=lv, seed=11).synthesize(img)
        t_mean[lv] = meta["t"].mean()
    # heavier fog → lower transmission (β ranges don't overlap: ≤.06 vs ≥.12)
    assert t_mean["heavy"] < t_mean["light"]


def test_mor_controls_beta():
    img = _road_image()
    _, meta_far = EnhancedFogSynthesizer(mor=1000.0, seed=5).synthesize(img)
    _, meta_near = EnhancedFogSynthesizer(mor=50.0, seed=5).synthesize(img)
    assert meta_near["beta_map"].mean() > meta_far["beta_map"].mean() * 10


def test_seeded_determinism():
    img = _road_image()
    h1, _ = EnhancedFogSynthesizer(level="medium", seed=9).synthesize(img)
    h2, _ = EnhancedFogSynthesizer(level="medium", seed=9).synthesize(img)
    np.testing.assert_array_equal(h1, h2)


def test_fog_batch_tool(tmp_path):
    from PIL import Image
    src = tmp_path / "in" / "sub"
    src.mkdir(parents=True)
    Image.fromarray(_road_image()[..., ::-1]).save(src / "road.png")
    out = tmp_path / "out"
    import tools.fog_batch as fb
    fb.process_folder(tmp_path / "in", out, levels=("light", "heavy"),
                      seed=1)
    assert (out / "light" / "sub" / "road.png").exists()
    assert (out / "heavy" / "sub" / "road.png").exists()
