"""Dependency-free shared constants.

PATCH_SCALE_MIN/MAX: the patch-grid warp clamp (cfg.patchWarp — see
core/residuals.patch_warp_frame for the model). Lives here rather than in
core/residuals or ops/patch_warp so that the residual math and the Pallas
kernels (which sizes its gather window from PATCH_SCALE_MAX) can share one
definition without core importing jax.experimental.pallas at module load
(the ops module stays a lazy, pallas-path-only import).
"""

PATCH_SCALE_MIN = 0.5
PATCH_SCALE_MAX = 2.0
