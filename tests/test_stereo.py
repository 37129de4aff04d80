"""JAX block-matching stereo tests vs known disparity."""

import jax.numpy as jnp
import numpy as np

from photobundle_tpu.image import stereo


def shifted_pair(rng, h=80, w=160, d=6):
    import scipy.ndimage

    base = rng.uniform(0, 1, size=(h, w + d)).astype(np.float32)
    base = scipy.ndimage.gaussian_filter(base, 1.2)
    # Stereo convention: left[x] = right[x - d] for disparity d > 0.
    left = base[:, :-d]
    right = base[:, d:]
    return left, right


def test_block_match_uniform_disparity(rng):
    d_true = 6
    left, right = shifted_pair(rng, d=d_true)
    disp, valid = stereo.block_match(jnp.asarray(left), jnp.asarray(right),
                                     num_disparities=16, min_disparity=1,
                                     sad_radius=3)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    assert valid.mean() > 0.5
    err = np.abs(disp[valid] - d_true)
    assert np.median(err) < 0.5
    assert (err < 1.0).mean() > 0.9


def test_block_match_flat_region_invalid():
    left = jnp.ones((60, 100)) * 0.5
    right = jnp.ones((60, 100)) * 0.5
    disp, valid = stereo.block_match(left, right, num_disparities=16)
    # Textureless surface: nothing should validate.
    assert float(jnp.mean(valid.astype(jnp.float32))) < 0.05


def test_block_match_subpixel(rng):
    """Half-pixel shift should be recovered to ~0.3 px by the parabola."""
    import scipy.ndimage

    h, w, d_true = 60, 120, 5.5
    base = scipy.ndimage.gaussian_filter(
        rng.uniform(0, 1, size=(h, w + 20)).astype(np.float32), 2.0)
    xs = np.arange(w)
    left = base[:, 10:10 + w]
    # left[x] = right[x - d] -> right[x] = left[x + d] = base[x + 10 + d]
    right = np.stack([np.interp(xs + 10 + d_true, np.arange(w + 20), row)
                      for row in base]).astype(np.float32)
    disp, valid = stereo.block_match(jnp.asarray(left), jnp.asarray(right),
                                     num_disparities=16, min_disparity=1,
                                     sad_radius=4, texture_threshold=0.002)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    assert valid.mean() > 0.3
    err = np.abs(disp[valid] - d_true)
    assert np.median(err) < 0.35, np.median(err)


class TestSGBM:
    def test_recovers_constant_disparity(self, rng):
        from test_native import _stereo_pair
        from photobundle_tpu.image import stereo

        left, right = _stereo_pair(rng, h=64, w=96, disp=7.3)
        disp, valid = stereo.semi_global_match(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=24, min_disparity=1, sad_radius=2)
        disp, valid = np.asarray(disp), np.asarray(valid)
        assert valid.mean() > 0.3
        med = np.median(disp[valid])
        assert abs(med - 7.3) < 0.5, med
        # sub-pixel spread should be tight on this noiseless pair
        assert np.abs(disp[valid] - 7.3).mean() < 0.35

    def test_smoother_than_bm_in_low_texture(self, rng):
        """SGM's smoothness prior should keep more valid pixels and less
        disparity variance than BM on a weakly textured pair."""
        from test_native import _stereo_pair
        from photobundle_tpu.image import stereo

        left, right = _stereo_pair(rng, h=64, w=96, disp=6.0)
        # wash out texture
        left = 0.5 + (left - 0.5) * 0.15
        right = 0.5 + (right - 0.5) * 0.15
        kw = dict(num_disparities=24, min_disparity=1)
        d_bm, v_bm = stereo.block_match(jnp.asarray(left), jnp.asarray(right),
                                        sad_radius=2, texture_threshold=0.005,
                                        **kw)
        d_sg, v_sg = stereo.semi_global_match(
            jnp.asarray(left), jnp.asarray(right), sad_radius=2,
            texture_threshold=0.005, **kw)
        d_bm, v_bm = np.asarray(d_bm), np.asarray(v_bm)
        d_sg, v_sg = np.asarray(d_sg), np.asarray(v_sg)
        err_bm = np.abs(d_bm[v_bm] - 6.0).mean() if v_bm.any() else np.inf
        err_sg = np.abs(d_sg[v_sg] - 6.0).mean() if v_sg.any() else np.inf
        assert err_sg <= err_bm + 0.05, (err_sg, err_bm)


def test_block_match_prefilter_illumination_robust(rng):
    """X-Sobel prefilter (cv::StereoBM PREFILTER_XSOBEL, the reference's
    dataset-layer default): a gain+bias difference between the two views
    collapses raw-intensity SAD matching, while the prefiltered matcher
    recovers the disparity field."""
    d_true = 6
    left, right = shifted_pair(rng, d=d_true)
    right_il = np.clip(0.7 * right + 0.2, 0.0, 1.0).astype(np.float32)
    kw = dict(num_disparities=16, min_disparity=1, sad_radius=3)

    disp_pf, valid_pf = stereo.block_match(
        jnp.asarray(left), jnp.asarray(right_il), prefilter_cap=0.12, **kw)
    disp_pf, valid_pf = np.asarray(disp_pf), np.asarray(valid_pf)
    assert valid_pf.mean() > 0.4, valid_pf.mean()
    err_pf = np.abs(disp_pf[valid_pf] - d_true)
    assert np.median(err_pf) < 0.5
    good_pf = (err_pf < 1.0).mean()
    assert good_pf > 0.85, good_pf

    disp_raw, valid_raw = stereo.block_match(
        jnp.asarray(left), jnp.asarray(right_il), **kw)
    disp_raw, valid_raw = np.asarray(disp_raw), np.asarray(valid_raw)
    good_raw = ((np.abs(disp_raw[valid_raw] - d_true) < 1.0).mean()
                if valid_raw.any() else 0.0)
    # Raw SAD under a 0.7x gain + 0.2 bias mismatch must be clearly worse
    # on accuracy x coverage (the illumination difference IS the signal it
    # matches on).
    assert good_pf * valid_pf.mean() > 2.0 * good_raw * valid_raw.mean(), (
        good_pf, valid_pf.mean(), good_raw, valid_raw.mean())
