"""Saliency maps and non-maximum suppression for point selection.

Reference counterparts: the gradient-magnitude saliency map and NMS-based
new-point selection in pb:src/imgproc.cc + pb:src/photobundle.cc (hot loop
no. 2 in SURVEY.md section 3.2). The reference does this with OpenMP loops;
here saliency is fused elementwise XLA and NMS is a single
`lax.reduce_window` max-pool comparison — no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import interp


def gradient_magnitude(img: jax.Array) -> jax.Array:
    """|grad I| saliency. img: (..., H, W)."""
    gx, gy = interp.image_gradients(img)
    return jnp.abs(gx) + jnp.abs(gy)


def channel_saliency(channels: jax.Array) -> jax.Array:
    """Descriptor-frame saliency = sum of per-channel gradient magnitudes.
    channels: (C, H, W) -> (H, W)."""
    return jnp.sum(gradient_magnitude(channels), axis=0)


def non_max_suppression(s: jax.Array, radius: int, threshold: float) -> jax.Array:
    """Boolean map of strict local maxima of s within a (2r+1)^2 window that
    also exceed `threshold`. s: (H, W)."""
    k = 2 * radius + 1
    local_max = jax.lax.reduce_window(
        s,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding="SAME",
    )
    return (s >= local_max) & (s >= threshold)
