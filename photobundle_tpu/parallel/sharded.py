"""Multi-chip BA solver: the LM + Schur solve under `shard_map`.

TPU-native replacement for Ceres' pthread parallel Jacobian evaluation /
Schur eliminator (reference: Solver::Options::num_threads,
pb:src/photobundle.cc) — SURVEY.md sections 2a/2b/5.7/5.8.

Sharding layout (the "residual-block sharding" strategy):
  - All (N, ...) point tensors (positions, patches, obs masks) are sharded
    over the 'points' mesh axis. Each chip evaluates residuals/Jacobians and
    per-point Schur blocks for its shard only.
  - Window images and poses are replicated (a 5-50 frame window is a few MB
    — cheap next to the (N, W, D, 9) Jacobian tensor).
  - The distributed Schur reduction is exactly TWO psums per LM iteration:
    the (W, 6, 6)+(W, 6) pose blocks and the (W, W, 6, 6)+(W, 6) reduced
    contributions (see core/schur.reduce_camera_system). Both ride ICI.
  - The reduced 6W x 6W solve is tiny and replicated on every chip, so the
    accepted/rejected LM branch and the pose update are bitwise identical
    across shards — the gauge-consistency requirement of SURVEY.md 'hard
    parts'.
  - Point back-substitution and point updates stay shard-local. Zero
    gather/scatter of point state between chips.

The 'windows' mesh axis vmaps independent window problems (multi-sequence /
multi-window DP, BASELINE configs 3/5): batched solves shard over it with no
cross-communication at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import lm
from ..geometry.camera import Camera


class ShardedLMSolver:
    """Points-sharded LM solve with the same signature as core.lm.lm_solve.

    Capacity padding: the point table must be divisible by the 'points' axis
    size; the engine's capacity (cfg.maxNumPoints) is validated at
    construction. Inactive slots are dead weight but keep shapes static —
    the load-imbalance strategy of SURVEY.md 'hard parts' (capacity padding
    + occupancy masks).
    """

    def __init__(self, mesh: Mesh, cam: Camera, offsets: jax.Array, *,
                 n_points: int, huber_delta: float,
                 gradient_mode: str = "sampled", backend: str = "xla",
                 max_iterations: int = 50,
                 initial_lambda: float = 1e-4, function_tolerance: float = 1e-6,
                 parameter_tolerance: float = 1e-8):
        if "points" not in mesh.axis_names:
            raise ValueError("mesh must have a 'points' axis")
        n_shards = mesh.shape["points"]
        if n_points % n_shards != 0:
            raise ValueError(
                f"point capacity {n_points} not divisible by points axis {n_shards}")
        self.mesh = mesh
        self.cam = cam
        self.offsets = offsets

        reduce_fn = lambda x: jax.lax.psum(x, "points")

        def solve_local(t_wc, x_world, patch, channels, grads, obs_mask,
                        point_valid, frozen):
            return lm.lm_solve(
                cam, t_wc, x_world, patch, channels, grads, obs_mask,
                point_valid, frozen, offsets,
                huber_delta=huber_delta, gradient_mode=gradient_mode,
                backend=backend,
                max_iterations=max_iterations, initial_lambda=initial_lambda,
                function_tolerance=function_tolerance,
                parameter_tolerance=parameter_tolerance,
                reduce_fn=reduce_fn,
            )

        pt = P("points")
        rep = P()
        self._solve = jax.jit(
            jax.shard_map(
                solve_local,
                mesh=mesh,
                in_specs=(rep, pt, pt, rep, rep, pt, pt, rep),
                out_specs=(rep, pt, lm.LMStats(*([rep] * 10))),
                check_vma=False,
            )
        )

    def __call__(self, t_wc, x_world, patch, channels, grads, obs_mask,
                 point_valid, frozen):
        return self._solve(t_wc, x_world, patch, channels, grads, obs_mask,
                           point_valid, frozen)


def make_batched_sharded_solver(mesh: Mesh, cam: Camera, offsets: jax.Array, *,
                                n_points: int, huber_delta: float,
                                gradient_mode: str = "sampled",
                                max_iterations: int = 20):
    """Batched multi-window solve: vmap over a leading window-batch axis,
    sharded over ('windows', 'points') — BASELINE configs 3/5 (concurrent
    sequence refinement). Inputs gain a leading B axis; B must be divisible
    by the 'windows' axis size."""
    reduce_fn = lambda x: jax.lax.psum(x, "points")

    def solve_one(t_wc, x_world, patch, channels, grads, obs_mask,
                  point_valid, frozen):
        return lm.lm_solve(
            cam, t_wc, x_world, patch, channels, grads, obs_mask,
            point_valid, frozen, offsets,
            huber_delta=huber_delta, gradient_mode=gradient_mode,
            max_iterations=max_iterations, reduce_fn=reduce_fn,
        )

    batched = jax.vmap(solve_one)
    wpt = P("windows", "points")
    wrep = P("windows")
    return jax.jit(
        jax.shard_map(
            batched,
            mesh=mesh,
            in_specs=(wrep, wpt, wpt, wrep, wrep, wpt, wpt, wrep),
            out_specs=(wrep, wpt, lm.LMStats(*([wrep] * 10))),
            check_vma=False,
        )
    )
