"""Camera model tests: projection round-trips and analytic Jacobians vs jax.jacfwd."""

import jax
import jax.numpy as jnp
import numpy as np

from photobundle_tpu.geometry import camera as cam_mod
from photobundle_tpu.geometry.camera import Camera


def make_cam():
    return Camera.create(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, baseline=0.5371)


def test_project_backproject_roundtrip(rng):
    cam = make_cam()
    uv = jnp.asarray(rng.uniform([0, 0], [1226, 370], size=(64, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 50.0, size=(64,)).astype(np.float32))
    x = cam_mod.backproject(cam, uv, depth)
    uv2, valid = cam_mod.project(cam, x)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)


def test_project_jacobian_matches_autodiff(rng):
    cam = make_cam()
    x = jnp.asarray(np.abs(rng.standard_normal((32, 3))).astype(np.float32) + np.array([0, 0, 2.0], np.float32))
    J_analytic = cam_mod.project_jacobian(cam, x)
    J_auto = jax.vmap(jax.jacfwd(lambda p: cam_mod.project(cam, p)[0]))(x)
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J_auto), atol=1e-4, rtol=1e-4)


def test_behind_camera_flagged():
    cam = make_cam()
    _, valid = cam_mod.project(cam, jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]))
    assert not bool(valid[0]) and bool(valid[1])


def test_disparity_to_depth():
    cam = make_cam()
    disp = jnp.asarray([[10.0, 0.0], [1.0, 386.0]])
    depth, valid = cam_mod.disparity_to_depth(cam, disp)
    expected = float(cam.fx * cam.baseline / 10.0)
    assert np.isclose(float(depth[0, 0]), expected, rtol=1e-5)
    assert not bool(valid[0, 1]) and float(depth[0, 1]) == 0.0


def test_scaled_intrinsics_consistent():
    # Projecting with level-1 intrinsics should equal half-res pixel coords.
    cam = make_cam()
    cam1 = cam.scaled(0.5)
    x = jnp.asarray([[1.0, 2.0, 10.0]])
    uv0, _ = cam_mod.project(cam, x)
    uv1, _ = cam_mod.project(cam1, x)
    np.testing.assert_allclose(np.asarray(uv1), (np.asarray(uv0) + 0.5) * 0.5 - 0.5, atol=1e-4)
