"""SE(3)/SO(3) unit tests vs. scipy oracles and group axioms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from photobundle_tpu.geometry import se3


def random_twists(rng, n, scale=1.0):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_hat_vee_roundtrip(rng):
    w = rng.standard_normal((7, 3)).astype(np.float32)
    np.testing.assert_allclose(se3.vee(se3.hat(jnp.asarray(w))), w, atol=1e-7)


def test_so3_exp_matches_scipy(rng):
    w = rng.standard_normal((32, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = (rng.standard_normal((8, 3)) * 1e-6).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_so3_log_roundtrip(rng):
    w = rng.standard_normal((32, 3)).astype(np.float32)
    w_back = np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w))))
    rv = Rotation.from_rotvec(w).as_rotvec()  # canonical angle in [0, pi]
    np.testing.assert_allclose(w_back, rv, atol=2e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, 32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.se3_log(T))
    T_back = np.asarray(se3.se3_exp(jnp.asarray(xi_back)))
    np.testing.assert_allclose(np.asarray(T), T_back, atol=1e-5)


def test_se3_exp_is_rigid(rng):
    xi = random_twists(rng, 16)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    R = T[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.eye(3)[None].repeat(16, 0), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1.0], (16, 1)), atol=0)


def test_se3_inverse(rng):
    xi = random_twists(rng, 16)
    T = se3.se3_exp(jnp.asarray(xi))
    TTinv = np.asarray(T @ se3.se3_inverse(T))
    np.testing.assert_allclose(TTinv, np.eye(4)[None].repeat(16, 0), atol=1e-5)


def test_exp_additivity_along_axis(rng):
    # exp(a xi) exp(b xi) = exp((a+b) xi) for colinear twists.
    xi = jnp.asarray(random_twists(rng, 1)[0])
    lhs = np.asarray(se3.se3_exp(0.3 * xi) @ se3.se3_exp(0.5 * xi))
    rhs = np.asarray(se3.se3_exp(0.8 * xi))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_transform_points(rng):
    xi = jnp.asarray(random_twists(rng, 1)[0])
    T = se3.se3_exp(xi)
    x = rng.standard_normal((10, 3)).astype(np.float32)
    expected = (np.asarray(T[:3, :3]) @ x.T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(se3.transform_points(T, jnp.asarray(x))), expected, atol=1e-5)


def test_retract_right_first_order(rng):
    # d/deps [T exp(eps xi)] matches the analytic generator at eps=0.
    xi = jnp.asarray(random_twists(rng, 1)[0])
    T = se3.se3_exp(jnp.asarray(random_twists(rng, 1)[0]))
    eps = 1e-4
    numeric = (np.asarray(se3.retract_right(T, eps * xi)) - np.asarray(T)) / eps
    gen = np.zeros((4, 4), np.float64)
    gen[:3, :3] = np.asarray(se3.hat(xi[3:]))
    gen[:3, 3] = np.asarray(xi[:3])
    np.testing.assert_allclose(numeric, np.asarray(T) @ gen, atol=1e-2)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis = axis / np.linalg.norm(axis)
    for angle in [3.05, 3.13, np.pi - 1e-4]:
        w = (axis * angle).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(w))
        w_back = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(w_back, w, atol=5e-3)


def test_jit_and_vmap():
    xi = jnp.ones((4, 6)) * 0.1
    out = jax.jit(jax.vmap(se3.se3_exp))(xi)
    assert out.shape == (4, 4, 4)
