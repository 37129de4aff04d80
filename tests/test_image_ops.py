"""Pyramid, patches, ZNCC, saliency, descriptor tests."""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from photobundle_tpu.image import descriptor, patches, pyramid, saliency
from photobundle_tpu.config import (
    DESCRIPTOR_BITPLANES,
    DESCRIPTOR_INTENSITY,
    DESCRIPTOR_INTENSITY_AND_GRADIENT,
)


def test_blur_preserves_constant():
    img = jnp.full((20, 24), 3.5)
    np.testing.assert_allclose(np.asarray(pyramid.gaussian_blur5(img)), 3.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pyramid.gaussian_blur_sigma(img, 1.5)), 3.5, atol=1e-5)


def test_blur_matches_scipy(rng):
    img = rng.standard_normal((30, 40)).astype(np.float32)
    out = np.asarray(pyramid.gaussian_blur5(jnp.asarray(img)))
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16.0
    ref = scipy.ndimage.correlate1d(img, k, axis=1, mode="nearest")
    ref = scipy.ndimage.correlate1d(ref, k, axis=0, mode="nearest")
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pyramid_shapes(rng):
    img = jnp.asarray(rng.standard_normal((370, 1226)).astype(np.float32))
    levels = pyramid.build_pyramid(img, 3)
    assert levels[0].shape == (370, 1226)
    assert levels[1].shape == (185, 613)
    assert levels[2].shape == (92, 306)


def test_downsample_average():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    out = np.asarray(pyramid.downsample2(img))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0, 0], (0 + 1 + 4 + 5) / 4.0)


def test_patch_offsets():
    off = np.asarray(patches.patch_offsets(1))
    assert off.shape == (9, 2)
    np.testing.assert_array_equal(off[0], [-1, -1])  # [dx, dy]
    np.testing.assert_array_equal(off[4], [0, 0])
    np.testing.assert_array_equal(off[8], [1, 1])


def test_extract_patches_integer_centers(rng):
    img = rng.standard_normal((1, 15, 17)).astype(np.float32)
    centers = jnp.asarray([[5.0, 7.0], [2.0, 3.0]])
    off = patches.patch_offsets(1)
    p, valid = patches.extract_patches(jnp.asarray(img), centers, off)
    assert p.shape == (2, 1, 9)
    assert bool(jnp.all(valid))
    ref = img[0, 6:9, 4:7].reshape(-1)  # rows y=7±1, cols x=5±1
    np.testing.assert_allclose(np.asarray(p[0, 0]), ref, atol=1e-6)


def test_mean_normalize():
    p = jnp.asarray(np.random.default_rng(1).standard_normal((4, 2, 25)).astype(np.float32))
    out = patches.mean_normalize(p)
    np.testing.assert_allclose(np.asarray(jnp.mean(out, axis=-1)), 0.0, atol=1e-6)


def test_zncc_properties(rng):
    a = jnp.asarray(rng.standard_normal((5, 1, 25)).astype(np.float32))
    # Self-correlation = 1; affine-invariant; negated = -1.
    np.testing.assert_allclose(np.asarray(patches.zncc(a, a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(patches.zncc(a, 2.0 * a + 3.0)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(patches.zncc(a, -a)), -1.0, atol=1e-5)
    const = jnp.ones_like(a)
    assert bool(jnp.all(jnp.abs(patches.zncc(a, const)) < 1e-3))


def test_nms_finds_isolated_peak():
    s = np.zeros((11, 11), np.float32)
    s[5, 5] = 10.0
    s[2, 8] = 7.0
    mask = np.asarray(saliency.non_max_suppression(jnp.asarray(s), radius=2, threshold=1.0))
    assert mask[5, 5] and mask[2, 8]
    assert mask.sum() == 2


def test_nms_suppresses_neighbors():
    s = np.zeros((9, 9), np.float32)
    s[4, 4] = 10.0
    s[4, 5] = 9.0  # within radius of the stronger peak
    mask = np.asarray(saliency.non_max_suppression(jnp.asarray(s), radius=1, threshold=1.0))
    assert mask[4, 4] and not mask[4, 5]


def test_descriptor_channel_counts(rng):
    img = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32))
    for name, c in [(DESCRIPTOR_INTENSITY, 1), (DESCRIPTOR_INTENSITY_AND_GRADIENT, 3), (DESCRIPTOR_BITPLANES, 8)]:
        lvl = descriptor.build_descriptor_level(img, name)
        assert lvl.channels.shape == (c, 32, 48)
        assert lvl.grads.shape == (c, 32, 48, 2)
        assert lvl.saliency.shape == (32, 48)


def test_bitplanes_contrast_invariant(rng):
    """BitPlanes channels depend on local intensity *order*, so they are
    invariant to affine brightness changes."""
    img = rng.standard_normal((24, 24)).astype(np.float32)
    a = descriptor.make_channels(jnp.asarray(img), DESCRIPTOR_BITPLANES)
    b = descriptor.make_channels(jnp.asarray(2.0 * img + 5.0), DESCRIPTOR_BITPLANES)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradient_sigma_smooths_planes_only():
    """gradientSigma computes the gradient planes from a blurred copy
    (gradient-of-Gaussian) while the value channels stay sharp."""
    import numpy as np
    from photobundle_tpu.image import descriptor, interp, pyramid

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((64, 96)), jnp.float32)
    base = descriptor.build_descriptor_level(img, "Intensity")
    smoothed = descriptor.build_descriptor_level(img, "Intensity",
                                                 gradient_sigma=1.0)
    np.testing.assert_array_equal(np.asarray(base.channels),
                                  np.asarray(smoothed.channels))
    assert float(jnp.abs(base.grads - smoothed.grads).max()) > 1e-4
    gx, gy = interp.image_gradients(
        pyramid.gaussian_blur_sigma(base.channels, 1.0))
    np.testing.assert_allclose(np.asarray(smoothed.grads),
                               np.asarray(jnp.stack([gx, gy], axis=-1)),
                               atol=1e-7)
    # Blurred gradients are strictly smoother (smaller second differences).
    d2 = lambda g: float(jnp.abs(jnp.diff(g[..., 0], n=2, axis=-1)).mean())
    assert d2(smoothed.grads) < d2(base.grads)
