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


class TestBicubic:
    """Catmull-Rom bicubic (the Ceres BiCubicInterpolator parity mode)."""

    def test_interpolates_grid_points_exactly(self, rng):
        from photobundle_tpu.image import interp

        img = jnp.asarray(rng.standard_normal((24, 30)).astype(np.float32))
        ys, xs = np.meshgrid(np.arange(2, 20), np.arange(2, 26), indexing="ij")
        uv = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
        v, g, ok = interp.bicubic_with_grad(img, uv)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(img)[ys.ravel(), xs.ravel()], atol=1e-5)

    def test_reproduces_linear_ramp_and_gradient(self, rng):
        from photobundle_tpu.image import interp

        ys, xs = np.meshgrid(np.arange(24), np.arange(30), indexing="ij")
        img = jnp.asarray((0.3 * xs + 0.7 * ys + 0.1).astype(np.float32))
        uv = jnp.asarray(rng.uniform(2, 20, (50, 2)).astype(np.float32))
        v, g, ok = interp.bicubic_with_grad(img, uv)
        exp = 0.3 * np.asarray(uv)[:, 0] + 0.7 * np.asarray(uv)[:, 1] + 0.1
        np.testing.assert_allclose(np.asarray(v), exp, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g)[:, 0], 0.3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g)[:, 1], 0.7, atol=1e-4)

    def test_gradient_matches_autodiff(self, rng):
        from photobundle_tpu.image import interp

        img = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
        uv0 = jnp.asarray(rng.uniform(4, 26, (20, 2)).astype(np.float32))

        def sample(uv):
            v, _, _ = interp.bicubic_with_grad(img, uv)
            return jnp.sum(v)

        g_auto = jax.grad(lambda uv: sample(uv))(uv0)
        _, g_ana, _ = interp.bicubic_with_grad(img, uv0)
        np.testing.assert_allclose(np.asarray(g_ana), np.asarray(g_auto),
                                   atol=1e-4, rtol=1e-4)

    def test_matches_catmull_rom_oracle(self, rng):
        """1D slice against a direct numpy Catmull-Rom evaluation."""
        from photobundle_tpu.image import interp

        img_row = rng.standard_normal(16).astype(np.float32)
        img = jnp.asarray(np.tile(img_row, (8, 1)))
        xq = np.linspace(2.0, 12.9, 40).astype(np.float32)
        uv = jnp.asarray(np.stack([xq, np.full_like(xq, 4.0)], -1))
        v, _, ok = interp.bicubic_with_grad(img, uv)
        x0 = np.floor(xq).astype(int)
        t = xq - x0
        p = np.stack([img_row[x0 - 1], img_row[x0], img_row[x0 + 1],
                      img_row[x0 + 2]])
        exp = 0.5 * (2 * p[1] + (-p[0] + p[2]) * t
                     + (2 * p[0] - 5 * p[1] + 4 * p[2] - p[3]) * t ** 2
                     + (-p[0] + 3 * p[1] - 3 * p[2] + p[3]) * t ** 3)
        np.testing.assert_allclose(np.asarray(v), exp, atol=1e-5)
