"""Schur complement vs dense-solve oracle, 3x3 inverses, damping semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photobundle_tpu.core import residuals as res_mod
from photobundle_tpu.core import schur

from test_residuals import setup_problem


def make_eq(rng, n=8, w=3):
    cam, t_wc, x, patch, ch, g, obs, off = setup_problem(rng, n_pts=n, w=w)
    out = res_mod.evaluate(cam, t_wc, x + 0.01, patch, ch, g, obs, off,
                           huber_delta=1e9, gradient_mode="exact")
    return schur.build_normal_equations(out), out


def test_inv3x3_matches_numpy(rng):
    m = rng.standard_normal((20, 3, 3)).astype(np.float32)
    m = m @ m.transpose(0, 2, 1) + 0.5 * np.eye(3)  # SPD, well-conditioned
    inv = np.asarray(schur.inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(inv, np.linalg.inv(m), atol=1e-3, rtol=1e-3)


def test_inv3x3_singular_returns_zero():
    m = jnp.zeros((2, 3, 3))
    inv = np.asarray(schur.inv3x3(m))
    assert (inv == 0).all()


def test_inv3x3_respects_valid_mask(rng):
    m = jnp.asarray(np.eye(3, dtype=np.float32)[None].repeat(3, 0))
    valid = jnp.asarray([True, False, True])
    inv = np.asarray(schur.inv3x3(m, valid))
    assert (inv[1] == 0).all() and np.allclose(inv[0], np.eye(3))


def test_normal_equations_match_dense_jtj(rng):
    """Hpp/Hpc/Hcc blocks must equal the dense J^T J of the stacked system."""
    eq, out = make_eq(rng, n=5, w=3)
    n, w, d = out.r.shape
    # Build the dense Jacobian: rows = (p, f, d), cols = [poses | points].
    j = np.zeros((n * w * d, 6 * w + 3 * n), np.float32)
    r_flat = np.zeros((n * w * d,), np.float32)
    jp = np.asarray(out.j_pose)
    jx = np.asarray(out.j_point)
    rr = np.asarray(out.r)
    for p in range(n):
        for f in range(w):
            rows = slice((p * w + f) * d, (p * w + f + 1) * d)
            j[rows, 6 * f:6 * f + 6] = jp[p, f]
            j[rows, 6 * w + 3 * p:6 * w + 3 * p + 3] = jx[p, f]
            r_flat[rows] = rr[p, f]
    h = j.T @ j
    b = -j.T @ r_flat
    hcc = np.asarray(eq.hcc)
    hpp = np.asarray(eq.hpp)
    hpc = np.asarray(eq.hpc)
    for f in range(w):
        np.testing.assert_allclose(hcc[f], h[6 * f:6 * f + 6, 6 * f:6 * f + 6], atol=1e-3)
    for p in range(n):
        o = 6 * w + 3 * p
        np.testing.assert_allclose(hpp[p], h[o:o + 3, o:o + 3], atol=1e-3)
        for f in range(w):
            np.testing.assert_allclose(hpc[p, f], h[o:o + 3, 6 * f:6 * f + 6], atol=1e-3)
    np.testing.assert_allclose(np.asarray(eq.bc).reshape(-1), b[:6 * w], atol=1e-3)
    np.testing.assert_allclose(np.asarray(eq.bp).reshape(-1), b[6 * w:], atol=1e-3)


def test_schur_equals_dense_solve(rng):
    """The Schur-complement solve must equal solving the full damped system
    densely (SURVEY.md section 4: 'Schur complement vs dense lstsq')."""
    eq, out = make_eq(rng, n=6, w=3)
    n = eq.hpp.shape[0]
    w = eq.hcc.shape[0]
    lam = jnp.asarray(1e-3)
    point_valid = jnp.ones((n,), bool)
    frozen = jnp.asarray([True, False, False])

    sys_parts = schur.reduce_camera_system(schur.to_point_minor(eq), lam,
                                           point_valid, frozen)
    dc_s, dp_s = schur.solve_reduced(sys_parts)
    dc_d, dp_d = schur.solve_dense_full(eq, lam, point_valid, frozen)

    np.testing.assert_allclose(np.asarray(dc_s), np.asarray(dc_d), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dp_s), np.asarray(dp_d), atol=1e-4, rtol=1e-3)
    # Gauge: frozen pose gets exactly zero update.
    assert float(np.abs(np.asarray(dc_s[0])).max()) == 0.0


def test_schur_invalid_points_zero_update(rng):
    eq, out = make_eq(rng, n=6, w=3)
    point_valid = jnp.asarray([True, True, False, True, False, True])
    frozen = jnp.asarray([True, False, False])
    sys_parts = schur.reduce_camera_system(schur.to_point_minor(eq),
                                           jnp.asarray(1e-3), point_valid,
                                           frozen)
    dc, dp = schur.solve_reduced(sys_parts)
    dp = np.asarray(dp)
    assert (dp[2] == 0).all() and (dp[4] == 0).all()
    assert (np.abs(dp[0]) > 0).any()


def test_gauss_newton_step_decreases_cost(rng):
    """One damped GN step from a perturbed state must reduce the true cost."""
    cam, t_wc, x, patch, ch, g, obs, off = setup_problem(rng, n_pts=10, w=3)
    x_pert = x + 0.02
    out = res_mod.evaluate(cam, t_wc, x_pert, patch, ch, g, obs, off,
                           huber_delta=1e9, gradient_mode="exact")
    eq = schur.build_normal_equations(out)
    n = x.shape[0]
    frozen = jnp.asarray([True, True, True])  # only points move
    sys_parts = schur.reduce_camera_system(schur.to_point_minor(eq),
                                           jnp.asarray(1e-4),
                                           jnp.ones((n,), bool), frozen)
    dc, dp = schur.solve_reduced(sys_parts)
    out2 = res_mod.evaluate(cam, t_wc, x_pert + dp, patch, ch, g, obs, off,
                            huber_delta=1e9, gradient_mode="exact",
                            with_jacobians=False)
    assert float(out2.cost) < float(out.cost)


def _assert_eq_close(eq_a, eq_b, atol):
    for name in NormalEqFields:
        np.testing.assert_allclose(
            np.asarray(getattr(eq_a, name)), np.asarray(getattr(eq_b, name)),
            atol=atol, rtol=1e-4, err_msg=name)


NormalEqFields = ("hpp", "hpc", "hcc", "bp", "bc")


def test_compressed_normal_equations_match_full(rng):
    """build_normal_equations_compressed(evaluate_compressed(...)) must equal
    build_normal_equations(evaluate(...)) — the production rank-2-factored
    path vs the oracle path, including Huber whitening and masking."""
    cam, t_wc, x, patch, ch, g, obs, off = setup_problem(rng, n_pts=9, w=3)
    obs = obs.at[1, 2].set(False).at[4, 0].set(False)
    x = x + 0.02
    kw = dict(huber_delta=0.05, gradient_mode="sampled")
    full = res_mod.evaluate(cam, t_wc, x, patch, ch, g, obs, off, **kw)
    comp = res_mod.evaluate_compressed(cam, t_wc, x, patch, ch, g, obs, off, **kw)
    np.testing.assert_allclose(float(comp.cost), float(full.cost), rtol=1e-5)
    assert int(comp.n_residuals) == int(full.n_residuals)
    _assert_eq_close(
        schur.to_point_major(schur.build_normal_equations_compressed(comp)),
        schur.build_normal_equations(full), atol=2e-3)


def test_compressed_normal_equations_match_full_with_prior(rng):
    """Same equivalence with the inverse-depth prior pseudo-pixel active."""
    cam, t_wc, x, patch, ch, g, obs, off = setup_problem(rng, n_pts=7, w=3)
    n = x.shape[0]
    ref_slot = jnp.asarray(rng.integers(0, 3, size=n), jnp.int32)
    q_seed = jnp.asarray(rng.uniform(0.05, 0.4, size=n).astype(np.float32))
    prior = (ref_slot, q_seed, 5.0)
    kw = dict(huber_delta=0.05, gradient_mode="sampled", depth_prior=prior)
    full = res_mod.evaluate(cam, t_wc, x + 0.02, patch, ch, g, obs, off, **kw)
    comp = res_mod.evaluate_compressed(cam, t_wc, x + 0.02, patch, ch, g, obs,
                                       off, **kw)
    np.testing.assert_allclose(float(comp.cost), float(full.cost), rtol=1e-5)
    _assert_eq_close(
        schur.to_point_major(schur.build_normal_equations_compressed(comp)),
        schur.build_normal_equations(full), atol=2e-3)


