"""Bilinear interpolation tests vs scipy.ndimage and jax.grad."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from photobundle_tpu.image import interp


def test_bilinear_matches_scipy(rng):
    img = rng.standard_normal((37, 53)).astype(np.float32)
    pts = rng.uniform([0, 0], [52, 36], size=(200, 2)).astype(np.float32)
    vals, valid = interp.bilinear(jnp.asarray(img), jnp.asarray(pts))
    assert bool(jnp.all(valid))
    # scipy map_coordinates takes (row, col) = (y, x)
    ref = scipy.ndimage.map_coordinates(img, [pts[:, 1], pts[:, 0]], order=1)
    np.testing.assert_allclose(np.asarray(vals), ref, atol=1e-5)


def test_bilinear_multichannel(rng):
    img = rng.standard_normal((3, 20, 30)).astype(np.float32)
    pts = rng.uniform([1, 1], [28, 18], size=(11, 2)).astype(np.float32)
    vals, valid = interp.bilinear(jnp.asarray(img), jnp.asarray(pts))
    assert vals.shape == (3, 11)
    for c in range(3):
        ref = scipy.ndimage.map_coordinates(img[c], [pts[:, 1], pts[:, 0]], order=1)
        np.testing.assert_allclose(np.asarray(vals[c]), ref, atol=1e-5)


def test_bilinear_exact_at_integer_pixels(rng):
    img = rng.standard_normal((16, 16)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    pts = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
    vals, _ = interp.bilinear(jnp.asarray(img), jnp.asarray(pts))
    # Border rows/cols are sampled at W-1-1e-6 (clip guard), so allow 1e-4.
    np.testing.assert_allclose(np.asarray(vals), img.reshape(-1), atol=1e-4)


def test_out_of_bounds_masked(rng):
    img = jnp.ones((8, 8))
    pts = jnp.asarray([[-0.5, 3.0], [7.5, 3.0], [3.0, 3.0], [3.0, 8.0]])
    vals, valid = interp.bilinear(img, pts)
    np.testing.assert_array_equal(np.asarray(valid), [False, False, True, False])
    assert bool(jnp.all(jnp.isfinite(vals)))


def test_exact_gradient_matches_jax_grad(rng):
    """The 'exact' analytic gradient must match autodiff to float precision
    (SURVEY.md 'hard parts': analytic Jacobians through interpolation)."""
    img = jnp.asarray(rng.standard_normal((25, 25)).astype(np.float32))
    # Stay strictly inside pixel cells to avoid the (measure-zero) kinks.
    pts = jnp.asarray(rng.uniform(1.3, 22.7, size=(100, 2)).astype(np.float32))
    _, grad, _ = interp.bilinear_with_grad(img, pts)

    def sample_one(p):
        return interp.bilinear(img, p)[0]

    g_auto = jax.vmap(jax.grad(sample_one))(pts)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_auto), atol=1e-6)


def test_image_gradients_central_difference(rng):
    img = rng.standard_normal((12, 14)).astype(np.float32)
    gx, gy = interp.image_gradients(jnp.asarray(img))
    gx_ref = np.gradient(img, axis=1)
    gy_ref = np.gradient(img, axis=0)
    # Borders use replicated edges (half the one-sided value); compare interior.
    np.testing.assert_allclose(np.asarray(gx)[:, 1:-1], gx_ref[:, 1:-1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, :], gy_ref[1:-1, :], atol=1e-6)
