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


# Smoothing floor for affine normalization: n = sqrt(sum c^2 + EPS^2) keeps
# the division (and its Jacobian) finite on textureless patches without a
# branch. For [0,1]-intensity 5x5 patches the centered norm of any patch
# worth selecting is >= ~1e-2, so the floor perturbs ŝ by < 1e-6 relative.
AFFINE_NORM_EPS = 1e-4


def affine_normalize(patches: jax.Array,
                     eps: float = AFFINE_NORM_EPS) -> jax.Array:
    """ZNCC-style per-(channel, patch) affine normalization: remove the mean,
    divide by the (smoothed) centered norm. Makes the descriptor invariant
    to per-frame gain AND offset (mean removal alone is offset-only — the
    reference's choice, which leaves plain Intensity descriptors exposed to
    exposure/gain flicker). patches: (..., C, P) -> same shape, unit-norm."""
    c = patches - jnp.mean(patches, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.sum(c * c, axis=-1, keepdims=True) + eps * eps)
    return c / n


def norm_mode(normalize) -> str:
    """Canonicalize the normalization knob: legacy bools map to
    'mean'/'off'; strings pass through validated."""
    if normalize is True:
        return "mean"
    if normalize is False or normalize is None:
        return "off"
    if normalize not in ("mean", "affine", "off"):
        raise ValueError(f"unknown patch normalization '{normalize}'")
    return normalize


def normalize_patches(patches: jax.Array, mode) -> jax.Array:
    """Apply the configured per-patch normalization to stored descriptors
    (selection / coarse-level re-extraction use this; the residual paths
    apply the matching transform to warped patches in-solve)."""
    mode = norm_mode(mode)
    if mode == "mean":
        return mean_normalize(patches)
    if mode == "affine":
        return affine_normalize(patches)
    return patches


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
