"""Device-mesh construction helpers.

TPU-native replacement for the reference's (nonexistent) distribution layer
— SURVEY.md section 2b/5.8: the reference is a single-process CPU program
(OpenMP + Ceres threads); here scaling is `jax.sharding.Mesh` axes:

    'points'  — residual-block sharding (the TP-analog): the point table and
                all (N, ...) tensors are sharded; the Schur reduction is a
                single psum over this axis riding ICI.
    'windows' — window/sequence data-parallelism (the DP-analog): independent
                sliding windows solved concurrently.

Multi-host: `jax.distributed.initialize()` then the same mesh spans hosts
(DCN for cross-host edges). No hand-written transport — XLA collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(points: int = 1, windows: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('windows', 'points') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = points * windows
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(windows, points)
    return Mesh(arr, axis_names=("windows", "points"))


def points_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("points"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed). Safe no-op when single-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
