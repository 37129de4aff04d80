"""Native C++ host runtime vs the Python/JAX references.

The native layer (photobundle_tpu/native) replaces the reference's
OpenCV/C++ dataset pipeline (pb:src/dataset.cc) with our own libpng decode
+ OpenMP block matcher + prefetching loader; these tests pin it to the
PIL decode and the JAX block_match semantics."""

import os

import numpy as np
import pytest

from photobundle_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}")


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def test_png_decode_matches_pil(tmp_path, rng):
    arr = rng.integers(0, 256, (37, 61), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    _write_png(p, arr)
    h, w = native.png_size(p)
    assert (h, w) == arr.shape
    img = native.imread_gray(p)
    np.testing.assert_allclose(img, arr.astype(np.float32) / 255.0, atol=1e-7)


def test_png_decode_rgb_matches_pil(tmp_path, rng):
    arr = rng.integers(0, 256, (25, 33, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    _write_png(p, arr)
    img = native.imread_gray(p)
    from PIL import Image

    ref = np.asarray(Image.open(p).convert("L")).astype(np.float32) / 255.0
    np.testing.assert_allclose(img, ref, atol=1.01 / 255)


def _stereo_pair(rng, h=64, w=96, disp=7.3):
    """Smooth textured left/right pair with constant disparity."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((h, w + 32), np.float32)
    xs_w = np.arange(w + 32)
    for _ in range(30):
        fx_ = rng.uniform(0.05, 0.8)
        fy_ = rng.uniform(0.05, 0.8)
        ph = rng.uniform(0, 6.28)
        img += np.sin(fx_ * xs_w[None, :] + fy_ * np.arange(h)[:, None] + ph).astype(np.float32)
    img = 0.5 + img / 40.0
    # left sees scene at x, right sees it shifted left by disp
    xf = np.arange(w) + 16.0
    left = np.stack([np.interp(xf, xs_w, img[y]) for y in range(h)]).astype(np.float32)
    right = np.stack([np.interp(xf + disp, xs_w, img[y]) for y in range(h)]).astype(np.float32)
    return left, right


def test_block_match_matches_jax(rng):
    left, right = _stereo_pair(rng)
    kw = dict(num_disparities=24, min_disparity=1, sad_radius=3)
    d_c, v_c = native.block_match(left, right, **kw)
    from photobundle_tpu.image import stereo as stereo_jax

    d_j, v_j = stereo_jax.block_match(left, right, **kw)
    d_j = np.asarray(d_j)
    v_j = np.asarray(v_j)
    # Identical gating decisions except at float ties; identical sub-pixel
    # disparities where both accept.
    agree = (v_c == v_j)
    assert agree.mean() > 0.995, f"validity agreement {agree.mean()}"
    both = v_c & v_j
    assert both.sum() > 0.25 * both.size
    np.testing.assert_allclose(d_c[both], d_j[both], atol=5e-3)
    # And the disparity should be near the true shift where valid.
    med = np.median(d_c[v_c])
    assert abs(med - 7.3) < 0.5


def test_prefetching_loader(tmp_path, rng):
    h, w = 48, 80
    n = 6
    lefts, rights = [], []
    for i in range(n):
        L, R = _stereo_pair(rng, h, w, disp=5.0 + 0.3 * i)
        lp = str(tmp_path / f"l{i}.png")
        rp = str(tmp_path / f"r{i}.png")
        _write_png(lp, np.clip(L * 255, 0, 255).astype(np.uint8))
        _write_png(rp, np.clip(R * 255, 0, 255).astype(np.uint8))
        lefts.append(lp)
        rights.append(rp)
    loader = native.PrefetchingLoader(
        lefts, rights, num_disparities=16, min_disparity=1, sad_radius=3,
        uniqueness_ratio=0.97, texture_threshold=0.02, fx=100.0, baseline=0.5,
        min_depth=0.5, max_depth=100.0, n_threads=2, prefetch_ahead=3)
    assert loader.shape == (h, w)
    for i in range(n):
        img, depth, ok = loader.get(i)
        assert img.shape == (h, w)
        assert ok.any(), f"frame {i} produced no valid depth"
        d = depth[ok]
        # depth = fx*b/disp = 50 / ~(5+0.3i)
        expected = 50.0 / (5.0 + 0.3 * i)
        assert abs(np.median(d) - expected) / expected < 0.2
    loader.close()


def test_native_sgbm_matches_jax(rng):
    left, right = _stereo_pair(rng)
    kw = dict(num_disparities=24, min_disparity=1, sad_radius=2)
    d_c, v_c = native.semi_global_match(left, right, **kw)
    import jax.numpy as jnp
    from photobundle_tpu.image import stereo as stereo_jax

    d_j, v_j = stereo_jax.semi_global_match(jnp.asarray(left),
                                            jnp.asarray(right), **kw)
    d_j, v_j = np.asarray(d_j), np.asarray(v_j)
    agree = (v_c == v_j)
    assert agree.mean() > 0.99, agree.mean()
    both = v_c & v_j
    assert both.sum() > 0.25 * both.size
    np.testing.assert_allclose(d_c[both], d_j[both], atol=2e-2)
    assert abs(np.median(d_c[v_c]) - 7.3) < 0.5


def test_prefetching_loader_seek(tmp_path, rng):
    """Resume path: seek(i) must serve frame i promptly without producing
    or retaining the prefix."""
    h, w = 48, 80
    n = 8
    lefts, rights = [], []
    for i in range(n):
        L, R = _stereo_pair(rng, h, w, disp=5.0)
        lp = str(tmp_path / f"l{i}.png")
        rp = str(tmp_path / f"r{i}.png")
        _write_png(lp, np.clip(L * 255, 0, 255).astype(np.uint8))
        _write_png(rp, np.clip(R * 255, 0, 255).astype(np.uint8))
        lefts.append(lp)
        rights.append(rp)
    loader = native.PrefetchingLoader(
        lefts, rights, num_disparities=16, min_disparity=1, sad_radius=3,
        uniqueness_ratio=0.97, texture_threshold=0.02, fx=100.0, baseline=0.5,
        min_depth=0.5, max_depth=100.0, n_threads=2, prefetch_ahead=2)
    loader.seek(5)
    for i in range(5, n):
        img, depth, ok = loader.get(i)
        assert img.shape == (h, w) and ok.any()
    loader.close()


def test_speckle_filter(rng):
    """cv::filterSpeckles semantics: small connected disparity components
    are invalidated, the large smooth surface survives."""
    h, w = 40, 60
    disp = np.full((h, w), 10.0, np.float32)
    valid = np.ones((h, w), np.uint8)
    # A small aliased patch (wrong lobe) and a tiny isolated dot.
    disp[5:8, 5:9] = 25.0
    disp[20, 30] = 3.0
    # A large second surface that must survive (bigger than min_region).
    disp[25:40, 0:30] = 18.0
    d2, v2 = native.speckle_filter(disp, valid, max_diff=1.0, min_region=50)
    assert not v2[6, 6] and d2[6, 6] == 0.0       # aliased patch gone
    assert not v2[20, 30]                          # dot gone
    assert v2[30, 10] and d2[30, 10] == 18.0       # big surface kept
    assert v2[0, 50] and d2[0, 50] == 10.0         # background kept


def test_speckle_filter_numpy_matches_native(rng):
    """The pure-Python fallback (used when the toolchain is missing) must
    make bit-identical validity decisions — same config, same depth mask,
    regardless of toolchain availability (ADVICE round 1)."""
    h, w = 48, 72
    disp = (10.0 + np.cumsum(rng.normal(0, 0.3, (h, w)), axis=1)).astype(np.float32)
    valid = (rng.random((h, w)) > 0.15).astype(np.uint8)
    disp[~valid.astype(bool)] = 0.0
    d_c, v_c = native.speckle_filter(disp, valid, max_diff=0.8, min_region=20)
    d_p, v_p = native.speckle_filter_numpy(disp, valid, max_diff=0.8,
                                           min_region=20)
    np.testing.assert_array_equal(v_c, v_p)
    np.testing.assert_array_equal(d_c, d_p)


def test_native_prefilter_and_bm_match_jax(rng):
    """pb_prefilter_xsobel == image/stereo.prefilter_xsobel, and the
    prefiltered native BM stays pinned to the prefiltered JAX BM."""
    import jax.numpy as jnp

    from photobundle_tpu.image import stereo as stereo_jax

    left, right = _stereo_pair(rng)
    f_c = native.prefilter_xsobel(left, 0.12)
    f_j = np.asarray(stereo_jax.prefilter_xsobel(jnp.asarray(left), 0.12))
    np.testing.assert_allclose(f_c, f_j, atol=1e-6)

    kw = dict(num_disparities=24, min_disparity=1, sad_radius=3,
              prefilter_cap=0.12)
    d_c, v_c = native.block_match(left, right, **kw)
    d_j, v_j = stereo_jax.block_match(left, right, **kw)
    d_j, v_j = np.asarray(d_j), np.asarray(v_j)
    agree = (v_c == v_j)
    assert agree.mean() > 0.995, f"validity agreement {agree.mean()}"
    both = v_c & v_j
    assert both.sum() > 0.2 * both.size
    np.testing.assert_allclose(d_c[both], d_j[both], atol=5e-3)


def test_prefetching_loader_prefilter(tmp_path, rng):
    """The loader's in-pipeline X-Sobel prefilter: matching runs on the
    filtered pair (depth recovered despite a right-view illumination
    mismatch) while the returned image stays the RAW left frame."""
    h, w = 48, 80
    L, R = _stereo_pair(rng, h, w, disp=6.0)
    R = np.clip(0.7 * R + 0.2, 0.0, 1.0).astype(np.float32)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    _write_png(lp, np.clip(L * 255, 0, 255).astype(np.uint8))
    _write_png(rp, np.clip(R * 255, 0, 255).astype(np.uint8))
    loader = native.PrefetchingLoader(
        [lp], [rp], num_disparities=16, min_disparity=1, sad_radius=3,
        uniqueness_ratio=0.97, texture_threshold=0.02, fx=100.0, baseline=0.5,
        min_depth=0.5, max_depth=100.0, n_threads=1, prefetch_ahead=1,
        prefilter_cap=0.12)
    img, depth, ok = loader.get(0)
    loader.close()
    # Raw image out (8-bit roundtrip, matching the uint8 write above),
    # not the Sobel response.
    expected_img = np.clip(L * 255, 0, 255).astype(np.uint8).astype(
        np.float32) * (1.0 / 255.0)
    np.testing.assert_allclose(img, expected_img, atol=1e-6)
    assert ok.mean() > 0.3, ok.mean()
    expected = 50.0 / 6.0
    assert abs(np.median(depth[ok]) - expected) / expected < 0.2
