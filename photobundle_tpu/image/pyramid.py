"""Gaussian image pyramids and smoothing, fully jittable.

Reference counterpart: the reference builds per-frame descriptor channels
with Gaussian smoothing (pb:src/photobundle.cc DescriptorFrame::Create) and
works at a configured refinement level; here the pyramid is a tuple of
static-shape arrays (one per level), built by separable [1 4 6 4 1]/16
convolution + 2x2 average-pool decimation, all in one fused XLA program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BINOMIAL5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_conv(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D convolution with reflect padding. img: (H, W)."""
    r = (k.shape[0] - 1) // 2
    k = k.astype(img.dtype)
    p = jnp.pad(img, ((0, 0), (r, r)), mode="edge")
    # Horizontal pass via shifted adds (small static kernel -> fully fused).
    out = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[1], axis=1)
    p = jnp.pad(out, ((r, r), (0, 0)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[0], axis=0)
    return out2


def gaussian_blur5(img: jax.Array) -> jax.Array:
    """5-tap binomial blur (sigma ~= 1.0). img: (..., H, W)."""
    fn = _sep_conv
    for _ in range(img.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, None))
    return fn(img, _BINOMIAL5)


def gaussian_blur_sigma(img: jax.Array, sigma: float, radius: int | None = None) -> jax.Array:
    """Gaussian blur with explicit sigma (static), truncated at ~3 sigma."""
    if sigma <= 0:
        return img
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)
    fn = _sep_conv
    for _ in range(img.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, None))
    return fn(img, k)


def downsample2(img: jax.Array) -> jax.Array:
    """2x2 average-pool decimation. Odd trailing row/col dropped. (..., H, W)."""
    H, W = img.shape[-2], img.shape[-1]
    H2, W2 = H // 2, W // 2
    x = img[..., : H2 * 2, : W2 * 2]
    x = x.reshape(*img.shape[:-2], H2, 2, W2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(img: jax.Array, num_levels: int) -> Tuple[jax.Array, ...]:
    """Blur-then-decimate pyramid; level 0 = full resolution. (..., H, W)."""
    levels = [img]
    for _ in range(num_levels - 1):
        levels.append(downsample2(gaussian_blur5(levels[-1])))
    return tuple(levels)


def level_scale(level: int) -> float:
    return 0.5 ** level
