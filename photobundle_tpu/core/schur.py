"""Gauss-Newton normal equations + Schur complement — the reference's L1.

TPU-native replacement for Ceres' `SPARSE_SCHUR` linear solver with
points-first elimination (reference: pb:src/photobundle.cc solver options;
SURVEY.md sections 1/3.3). Ceres builds sparse block matrices and runs a
sparse Schur eliminator on CPU threads. Here the normal equations are built
directly from the dense masked residual tensor (core/residuals.py) with a
handful of einsums, so the entire elimination is batched dense linear
algebra:

    Hpp  (N, 3, 3)   per-point blocks          -> batched closed-form inverse
    Hpc  (N, W, 3, 6) point-pose coupling      -> one einsum
    Hcc  (W, 6, 6)   pose diagonal blocks      -> one einsum
    S    (W, W, 6, 6) reduced camera system    -> one einsum over points
    solve 6W x 6W    dense Cholesky (W is the sliding window: tiny)

Invalid observations contribute exact zeros (residuals are pre-masked), so
no index lists or scatters are needed — this is what makes the same code
shard over a device mesh with one `psum` (parallel/sharded.py).

Damping follows Ceres' LEVENBERG_MARQUARDT: H + lam * diag(H) with the
diagonal clamped, applied consistently to the eliminated point blocks and
the reduced system (SURVEY.md 'hard parts').
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .residuals import CompressedResiduals, Residuals

_DIAG_MIN = 1e-6
_DIAG_MAX = 1e32


class NormalEq(NamedTuple):
    hpp: jax.Array    # (N, 3, 3)
    hpc: jax.Array    # (N, W, 3, 6)
    hcc: jax.Array    # (W, 6, 6)
    bp: jax.Array     # (N, 3)   right-hand side -J^T r (point part)
    bc: jax.Array     # (W, 6)   right-hand side -J^T r (pose part)


def build_normal_equations(res: Residuals) -> NormalEq:
    """One pass of einsums over the (N, W, D) residual tensor. Each is a
    batched matmul XLA maps onto the MXU; masked entries are exact zeros."""
    jp, jc, r = res.j_point, res.j_pose, res.r
    hpp = jnp.einsum("nwdi,nwdj->nij", jp, jp)
    hpc = jnp.einsum("nwdi,nwdj->nwij", jp, jc)
    hcc = jnp.einsum("nwdi,nwdj->wij", jc, jc)
    bp = -jnp.einsum("nwdi,nwd->ni", jp, r)
    bc = -jnp.einsum("nwdi,nwd->wi", jc, r)
    return NormalEq(hpp=hpp, hpc=hpc, hcc=hcc, bp=bp, bc=bc)


def build_normal_equations_compressed(res: CompressedResiduals) -> NormalEq:
    """Normal equations from the rank-2-factored statistics
    (residuals.evaluate_compressed): per observation

        H_obs = A^T gtg A + jp jp^T          (9, 9)
        b_obs = -(A^T gtr + rp * jp)         (9,)

    then Hpp / Hpc / Hcc / bp / bc are block partitions summed over frames /
    points. Identical result to build_normal_equations(evaluate(...)) without
    ever forming the (N, W, D, 9) Jacobian — every contraction here is over
    the tiny factored axes, so the pass is compute-light and HBM-cheap."""
    ga = jnp.einsum("nwab,nwbj->nwaj", res.gtg, res.a)        # (N, W, 2, 9)
    haa = jnp.einsum("nwai,nwaj->nwij", res.a, ga)            # (N, W, 9, 9)
    haa = haa + res.jp[..., :, None] * res.jp[..., None, :]
    b_obs = -(jnp.einsum("nwai,nwa->nwi", res.a, res.gtr)
              + res.jp * res.rp[..., None])                   # (N, W, 9)
    return NormalEq(
        hpp=jnp.sum(haa[..., 6:, 6:], axis=1),
        hpc=haa[..., 6:, :6],
        hcc=jnp.sum(haa[..., :6, :6], axis=0),
        bp=jnp.sum(b_obs[..., 6:], axis=1),
        bc=jnp.sum(b_obs[..., :6], axis=0),
    )


def _damped(h: jax.Array, lam: jax.Array) -> jax.Array:
    """H + lam * clamp(diag(H)) * I, batched over leading dims."""
    d = jnp.clip(jnp.diagonal(h, axis1=-2, axis2=-1), _DIAG_MIN, _DIAG_MAX)
    k = h.shape[-1]
    return h + lam * d[..., None] * jnp.eye(k, dtype=h.dtype)


def inv3x3(m: jax.Array, valid: jax.Array | None = None, eps: float = 1e-12) -> jax.Array:
    """Batched closed-form (adjugate) 3x3 inverse. Singular or invalid
    blocks return zeros, which makes the corresponding point update zero —
    the masked-point mechanism of the static-shape design."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    ca = e * i - f * h
    cb = f * g - d * i
    cc = d * h - e * g
    det = a * ca + b * cb + c * cc
    ok = jnp.abs(det) > eps
    if valid is not None:
        ok = ok & valid
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    adj = jnp.stack(
        [
            jnp.stack([ca, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([cb, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([cc, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


class SchurSystem(NamedTuple):
    s: jax.Array          # (6W, 6W) reduced camera matrix (gauge-fixed)
    rhs: jax.Array        # (6W,)
    hpp_inv: jax.Array    # (N, 3, 3) damped inverses (for back-substitution)
    hpc_d: jax.Array      # (N, W, 3, 6) (damped coupling, = hpc)
    bp: jax.Array         # (N, 3)


def reduce_camera_system(eq: NormalEq, lam: jax.Array, point_valid: jax.Array,
                         frozen: jax.Array, reduce_fn=None,
                         pose_coupling: jax.Array | None = None) -> SchurSystem:
    """Eliminate point blocks; assemble the reduced (6W, 6W) camera system.

    frozen: (W,) bool — gauge-fixed poses (identity rows/cols, zero rhs).
    point_valid: (N,) bool — points that may move.
    reduce_fn: cross-shard sum (e.g. lax.psum) applied to the point-summed
        Schur terms only — `eq.hcc`/`eq.bc` must ALREADY be globally reduced
        by the caller, so the distributed Schur reduction is exactly one
        psum of a (W, W, 6, 6) + (W, 6) contribution per shard
        (SURVEY.md section 5.7: the 'ring-attention of BA').
    """
    if reduce_fn is None:
        reduce_fn = lambda x: x
    w = eq.hcc.shape[0]
    hpp_inv = inv3x3(_damped(eq.hpp, lam), point_valid)           # (N, 3, 3)
    # T[p, f] = W_p @ Hpc[p, f]  -> (N, W, 3, 6)
    t = jnp.einsum("nij,nfjk->nfik", hpp_inv, eq.hpc)
    # S[f, g] -= sum_p Hpc[p, f]^T T[p, g]
    s_off = reduce_fn(jnp.einsum("nfji,ngjk->fgik", eq.hpc, t))   # (W, W, 6, 6)
    hcc_d = _damped(eq.hcc, lam)
    s = -s_off
    s = s.at[jnp.arange(w), jnp.arange(w)].add(hcc_d)
    if pose_coupling is not None:
        # Off-diagonal pose-pose blocks (e.g. the relative-motion prior);
        # replicated — must NOT go through reduce_fn.
        s = s + pose_coupling
    rhs = eq.bc - reduce_fn(jnp.einsum("nfji,nj->fi", t, eq.bp))  # (W, 6)

    # Gauge fixing: frozen pose blocks become identity rows/cols with zero
    # rhs, so their update is exactly zero. Must be identical on every shard
    # (SURVEY.md 'hard parts': gauge handling across shards) — `frozen` is
    # replicated, so it is.
    free = (~frozen).astype(s.dtype)
    mask2 = free[:, None] * free[None, :]                          # (W, W)
    s = s * mask2[:, :, None, None]
    s = s.at[jnp.arange(w), jnp.arange(w)].add(
        jnp.eye(6, dtype=s.dtype)[None] * frozen.astype(s.dtype)[:, None, None]
    )
    rhs = rhs * free[:, None]

    s_flat = s.transpose(0, 2, 1, 3).reshape(6 * w, 6 * w)
    return SchurSystem(s=s_flat, rhs=rhs.reshape(-1), hpp_inv=hpp_inv,
                       hpc_d=eq.hpc, bp=eq.bp)


def solve_reduced(sys: SchurSystem):
    """Cholesky solve of the reduced system; returns (dc (W,6), dp (N,3)).

    The reduced matrix is SPD after damping + gauge fixing; a tiny jitter
    guards float32 round-off. Back-substitution recovers point updates:
    dp = W_p (bp - Hpc dc).
    """
    w6 = sys.s.shape[0]
    s = sys.s + 1e-8 * jnp.eye(w6, dtype=sys.s.dtype)
    chol = jax.scipy.linalg.cho_factor(s, lower=True)
    dc_flat = jax.scipy.linalg.cho_solve(chol, sys.rhs)
    dc = dc_flat.reshape(-1, 6)
    rhs_p = sys.bp - jnp.einsum("nfij,fj->ni", sys.hpc_d, dc)
    dp = jnp.einsum("nij,nj->ni", sys.hpp_inv, rhs_p)
    return dc, dp


def solve_dense_full(eq: NormalEq, lam: jax.Array, point_valid: jax.Array,
                     frozen: jax.Array):
    """Reference oracle: assemble and solve the FULL (6W + 3N) system
    densely. O((6W + 3N)^3) — tests only (SURVEY.md section 4: Schur vs
    dense lstsq on tiny problems)."""
    n = eq.hpp.shape[0]
    w = eq.hcc.shape[0]
    dim = 6 * w + 3 * n
    h = jnp.zeros((dim, dim), eq.hpp.dtype)
    hcc_d = _damped(eq.hcc, lam)
    hpp_d = _damped(eq.hpp, lam)
    for f in range(w):
        h = h.at[6 * f:6 * f + 6, 6 * f:6 * f + 6].set(hcc_d[f])
    for p in range(n):
        o = 6 * w + 3 * p
        h = h.at[o:o + 3, o:o + 3].set(hpp_d[p])
        for f in range(w):
            h = h.at[o:o + 3, 6 * f:6 * f + 6].set(eq.hpc[p, f])
            h = h.at[6 * f:6 * f + 6, o:o + 3].set(eq.hpc[p, f].T)
    b = jnp.concatenate([eq.bc.reshape(-1), eq.bp.reshape(-1)])

    # Freeze gauge poses and invalid points by identity rows/cols.
    fixed = jnp.concatenate([
        jnp.repeat(frozen, 6),
        jnp.repeat(~point_valid, 3),
    ])
    free = (~fixed).astype(h.dtype)
    h = h * free[:, None] * free[None, :] + jnp.diag(fixed.astype(h.dtype))
    b = b * free
    sol = jnp.linalg.solve(h + 1e-8 * jnp.eye(dim, dtype=h.dtype), b)
    dc = sol[: 6 * w].reshape(w, 6)
    dp = sol[6 * w:].reshape(n, 3)
    return dc, dp


def predicted_reduction(eq: NormalEq, lam: jax.Array, dc: jax.Array, dp: jax.Array,
                        reduce_fn=None) -> jax.Array:
    """LM model decrease 0.5 * dx^T (lam * D dx + b) for the gain ratio
    (Madsen/Nielsen form), over both pose and point blocks. The point term
    sums over shard-local points and is cross-shard reduced; the pose term
    uses the already-replicated reduced blocks."""
    if reduce_fn is None:
        reduce_fn = lambda x: x
    d_c = jnp.clip(jnp.diagonal(eq.hcc, axis1=-2, axis2=-1), _DIAG_MIN, _DIAG_MAX)
    d_p = jnp.clip(jnp.diagonal(eq.hpp, axis1=-2, axis2=-1), _DIAG_MIN, _DIAG_MAX)
    term_c = jnp.sum(dc * (lam * d_c * dc + eq.bc))
    term_p = reduce_fn(jnp.sum(dp * (lam * d_p * dp + eq.bp)))
    return 0.5 * (term_c + term_p)
