"""photobundle-tpu: a TPU-native photometric bundle adjustment engine.

Built from scratch in JAX/XLA/Pallas — not a port — reproducing the
capability surface of the C++/Ceres reference `halismai/photobundle`
(ACCV 2016): sliding-window photometric refinement of a VO trajectory on
KITTI-style sequences. See SURVEY.md for the structural analysis of the
reference and the design rationale of this package.

Layer map (mirrors SURVEY.md section 1, TPU-first):
    cli            — app driver (reference L6)
    config         — ConfigFile / PBAConfig (L5)
    io             — KITTI dataset + trajectory I/O (L4)
    image          — pyramids, interpolation, descriptors, saliency (L3)
    core           — the BA engine: state, residuals, Schur, LM (L2 + L1)
    ops            — Pallas TPU kernels for the hot paths
    parallel       — mesh / shard_map multi-chip solver
    utils          — timing, logging, results
"""

import jax as _jax

# TPU MXU matmuls default to bfloat16 operand precision. That silently
# QUANTIZES every pose product (T @ exp(xi), se3_inverse, transform_points)
# and the world->camera point transform to ~8 mantissa bits: at KITTI world
# coordinates (|t| ~ 30-500 m) a pose translation rounds by up to ~0.1 m
# and projected pixels by several px — measured as frozen poses "moving"
# 0.05 m per solve and refinement DEGRADING trajectories at scale, while
# small-coordinate toy scenes hid it below test tolerances. Geometry needs
# full f32; the few true MXU contractions here (Hcc, the reduced Schur
# system) are tiny, so forcing the highest precision costs nothing
# measurable (bench.py before/after is identical within noise).
_jax.config.update("jax_default_matmul_precision", "highest")

# Honor JAX_PLATFORMS=cpu from the environment. Some deployment images
# pre-register a remote TPU backend at interpreter boot (sitecustomize)
# with a jax_platforms config override, which silently WINS over the env
# var — `JAX_PLATFORMS=cpu python tools/...` then hangs dialing a dead
# tunnel instead of running on CPU. Re-applying the env var's choice at
# package import restores the documented JAX contract for every CLI/tool;
# TPU runs (bench.py, __graft_entry__.py) are unaffected because their
# environment requests the TPU platform.
import os as _os

_env_platforms = _os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and _env_platforms != _jax.config.jax_platforms:
    _jax.config.update("jax_platforms", _env_platforms)

from .config import ConfigFile, PBAConfig
from .geometry.camera import Camera

__version__ = "0.1.0"

__all__ = ["ConfigFile", "PBAConfig", "Camera", "__version__"]
