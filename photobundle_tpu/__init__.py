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

from .config import ConfigFile, PBAConfig
from .geometry.camera import Camera

__version__ = "0.1.0"

__all__ = ["ConfigFile", "PBAConfig", "Camera", "__version__"]
