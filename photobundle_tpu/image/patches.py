"""Patch extraction, brightness normalization, and ZNCC scoring.

Reference counterparts: the per-point descriptor patches and `ZnccPatch`
visibility scoring in pb:src/photobundle.cc. Patches are fronto-parallel:
a patch at projected center u is sampled at {u + o : o in offsets}, the same
integer offset grid the reference uses (side = 2*patchRadius + 1).

Everything is batched: one `extract_patches` call samples all points of a
frame in a single gather, and ZNCC over the whole point table is one fused
reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import interp


def patch_offsets(radius: int, dtype=jnp.float32) -> jax.Array:
    """Integer offset grid, row-major: ((2r+1)^2, 2) as [dx, dy]."""
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)


def extract_patches(img: jax.Array, centers: jax.Array, offsets: jax.Array):
    """Sample patches at float centers.

    img:     (C, H, W)
    centers: (..., 2) pixel coords [x, y]
    offsets: (P, 2)
    Returns (patches (..., C, P), valid (...,)) — valid iff every sample of
    the patch has full bilinear support inside the image.
    """
    pts = centers[..., None, :] + offsets  # (..., P, 2)
    values, valid = interp.bilinear(img, pts)  # (C, ..., P), (..., P)
    # Move channel axis next to the patch axis: (..., C, P).
    values = jnp.moveaxis(values, 0, -2)
    return values, jnp.all(valid, axis=-1)


def mean_normalize(patches: jax.Array) -> jax.Array:
    """Remove the per-(channel, patch) mean — the reference's per-patch
    brightness normalization. patches: (..., C, P) -> same shape."""
    return patches - jnp.mean(patches, axis=-1, keepdims=True)


def zncc(a: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Zero-mean normalized cross-correlation over the last axis, averaged
    over channels. a, b: (..., C, P) -> (...,). Range [-1, 1].

    Constant patches (zero variance) score 0, not NaN.
    """
    am = a - jnp.mean(a, axis=-1, keepdims=True)
    bm = b - jnp.mean(b, axis=-1, keepdims=True)
    num = jnp.sum(am * bm, axis=-1)
    den = jnp.sqrt(jnp.sum(am * am, axis=-1) * jnp.sum(bm * bm, axis=-1))
    score = num / jnp.maximum(den, eps)
    return jnp.mean(score, axis=-1)
