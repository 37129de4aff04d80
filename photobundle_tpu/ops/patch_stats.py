"""Pallas TPU kernel: fused patch sampling + Gauss-Newton sufficient stats.

STATUS: superseded in the production LM loop by ops/patch_warp.py.
Measured on TPU v5e, the fully-fused design below spends most of its
per-observation budget on cross-lane reductions over tiny (P, P) tiles
(~227 ns/obs) — the warp-only kernel + dense-XLA statistics runs the same
math at ~91 ns/obs. This module is kept as the measured fusion baseline
(its equivalence tests also pin the stat math both kernels must satisfy)
and as the starting point if a future TPU generation makes small-tile
reductions cheap.

Original role: the TPU-native replacement for the reference's innermost
Ceres autodiff loop (pb:src/photobundle.cc residual functor over a
BiCubicInterpolator; SURVEY.md section 3.4).

Why a kernel: XLA lowers per-pixel bilinear sampling to element gathers,
which run at ~100M elem/s on TPU — the entire LM iteration was gather-bound.
Two structural facts make a far better program possible:

1. Patch offsets are an integer grid, so every pixel of a patch shares ONE
   fractional offset: a whole patch needs only a contiguous
   (2R+2, 2R+2) window and 4 shifted multiply-adds.
2. Downstream (core/residuals.evaluate_compressed) only needs per-observation
   sufficient statistics — gtg (2x2), gtr (2), |r|^2 — because the Jacobian
   factors as J = G @ A. The (N, W, D) sample tensors never need to leave
   the kernel.

Layout: images are pre-sliced into overlapping 128-lane column panels
(stride 122 = 128 - (2R+2) for R=2), so any window lives in exactly one
panel. Per observation the kernel dynamic-slices 2R+2 rows of that panel
(unaligned sublane start on a 128-lane ref — the one dynamic-slice shape
this TPU generation supports), lane-rolls the window to offset 0, applies
the 4 bilinear taps, mean-centers, and reduces to the 6 statistics.

Per-observation scalars (row, panel, lane offset, fractional weights) ride
in SMEM, grid-chunked to respect SMEM capacity (~8 KB of operands per
step). Points are processed frame-major so each frame's panels are DMA'd
to VMEM once and reused across its point chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PANEL_W = 128          # lane width of one image panel (hardware lane count)
_MAX_SMEM_CHUNK = 256  # observations per grid step (SMEM operand budget)


def panel_stride(patch_radius: int) -> int:
    """Panel overlap so any (2R+2)-wide window fits in one 128-lane panel."""
    return PANEL_W - (2 * patch_radius + 2)


def num_panels(width: int, patch_radius: int) -> int:
    stride = panel_stride(patch_radius)
    if width <= PANEL_W:
        return 1
    return int(np.ceil((width - PANEL_W) / stride)) + 1


def build_panels(planes: jax.Array, patch_radius: int) -> jax.Array:
    """(..., H, W) image planes -> (..., NPANEL, H, 128) overlapping panels.

    Static slicing only — XLA fuses this into a single relayout copy. Done
    once per solve (images are loop-invariant across LM iterations).
    """
    h, w = planes.shape[-2], planes.shape[-1]
    stride = panel_stride(patch_radius)
    n_pan = num_panels(w, patch_radius)
    need = (n_pan - 1) * stride + PANEL_W
    if need > w:
        pad = [(0, 0)] * (planes.ndim - 1) + [(0, need - w)]
        planes = jnp.pad(planes, pad)
    pans = [planes[..., p * stride:p * stride + PANEL_W] for p in range(n_pan)]
    return jnp.stack(pans, axis=-3)


def build_interleaved_panels(channels: jax.Array, grads: jax.Array,
                             patch_radius: int) -> jax.Array:
    """(W, C, H, Wi) values + (W, C, H, Wi, 2) gradients ->
    (W, C, NPANEL, 3H, 128) panels with rows interleaved as 3y+k
    (k = value, d/dx, d/dy) so the kernel loads one window for all three
    planes. Built once per solve (loop-invariant)."""
    w, c, h, wi = channels.shape
    inter = jnp.stack(
        [channels, grads[..., 0], grads[..., 1]], axis=3)    # (W, C, H, 3, Wi)
    return build_panels(inter.reshape(w, c, 3 * h, wi), patch_radius)


def _stats_kernel(y_ref, pan_ref, off_ref, fxfy_ref, img_ref, d_ref, out_ref,
                  *, chunk: int, n_panels: int, n_channels: int,
                  patch_radius: int, cost_only: bool = False):
    """One grid step: `chunk` observations against one frame's panels.

    img_ref (full mode): (1, C * NPANEL, 3H, 128) — per channel, panels of
        the row-INTERLEAVED plane stack (row 3y+k: k = value, d/dx, d/dy),
        so one window = ONE contiguous (3*win, 128) load + ONE lane roll.
    img_ref (cost_only): (1, C * NPANEL, H, 128) — value planes only.
    d_ref:   (chunk, C, P, P) reference descriptor patches (mean-normalized).
    out_ref: (chunk, 8) -> [gxx, gxy, gyy, gxr, gyr, rr, 0, 0].
    """
    win = 2 * patch_radius + 2
    ps = 2 * patch_radius + 1
    unroll = next(u for u in (8, 4, 2, 1) if chunk % u == 0)

    def body(g, _):
        for u in range(unroll):
            one(g * unroll + u)
        return 0

    def one(i):
        y0 = y_ref[0, 0, i]
        p = pan_ref[0, 0, i]
        o = off_ref[0, 0, i]
        fx = fxfy_ref[0, 0, i]
        fy = fxfy_ref[0, 1, i]
        w00 = (1.0 - fx) * (1.0 - fy)
        w01 = fx * (1.0 - fy)
        w10 = (1.0 - fx) * fy
        w11 = fx * fy

        gxx = 0.0
        gxy = 0.0
        gyy = 0.0
        gxr = 0.0
        gyr = 0.0
        rr = 0.0
        for c in range(n_channels):
            if cost_only:
                rows = img_ref[0, c * n_panels + p, pl.ds(y0, win), :]
                wnd = pltpu.roll(rows, -o, 1)[:, :win]       # (win, win)
                s = (w00 * wnd[:ps, :ps] + w01 * wnd[:ps, 1:]
                     + w10 * wnd[1:, :ps] + w11 * wnd[1:, 1:])
                r = (s - jnp.mean(s)) - d_ref[i, c]
                rr += jnp.sum(r * r)
                continue
            # Interleaved: rows 3y+k -> one load covers all three planes;
            # a y-shift of 1 is a row-shift of 3.
            rows = img_ref[0, c * n_panels + p, pl.ds(3 * y0, 3 * win), :]
            wnd = pltpu.roll(rows, -o, 1)[:, :win]           # (3win, win)
            s3 = (w00 * wnd[:3 * ps, :ps] + w01 * wnd[:3 * ps, 1:]
                  + w10 * wnd[3:, :ps] + w11 * wnd[3:, 1:])  # (3ps, ps)
            s3 = s3.reshape(ps, 3, ps)  # de-interleave (strided slices
            s = s3[:, 0, :]             # don't lower on Mosaic; a sublane
            gx = s3[:, 1, :]            # split reshape does)
            gy = s3[:, 2, :]
            s = s - jnp.mean(s)
            gx = gx - jnp.mean(gx)
            gy = gy - jnp.mean(gy)
            r = s - d_ref[i, c]
            rr += jnp.sum(r * r)
            gxx += jnp.sum(gx * gx)
            gxy += jnp.sum(gx * gy)
            gyy += jnp.sum(gy * gy)
            gxr += jnp.sum(gx * r)
            gyr += jnp.sum(gy * r)
        out_ref[i, :] = jnp.stack([gxx, gxy, gyy, gxr, gyr, rr, 0.0, 0.0])

    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("patch_radius", "interpret",
                                             "cost_only"))
def patch_stats(panels: jax.Array, uv: jax.Array, valid: jax.Array,
                descriptors: jax.Array, patch_radius: int,
                interpret: bool = False, cost_only: bool = False):
    """Fused sample + center + Gauss-Newton statistics for all observations.

    Args:
      panels: full mode: (W, C, NPANEL, 3H, 128) panels of the
          row-interleaved (value, d/dx, d/dy) plane stack (see
          build_interleaved_panels); cost_only: (W, C, NPANEL, H, 128)
          value-plane panels (build_panels).
      uv: (N, W, 2) projected pixel coordinates (x, y).
      valid: (N, W) observation validity (geometry + bounds); invalid
          observations get zero stats.
      descriptors: (N, C, P, P) mean-normalized reference patches.
      patch_radius: R (P = 2R+1).

    Returns (gtg (N, W, 2, 2), gtr (N, W, 2), rnorm2 (N, W)) — unwhitened
    (Huber/validity weighting happens in the caller, where the weights live).
    """
    n, w, _ = uv.shape
    n_channels = descriptors.shape[1]
    n_pan = panels.shape[2]
    hrows = panels.shape[3]
    h = hrows if cost_only else hrows // 3
    stride = panel_stride(patch_radius)
    ps = 2 * patch_radius + 1
    win = ps + 1

    # Per-observation integer geometry (frame-major flattening). Invalid
    # observations may carry NaN/inf coordinates (points behind the camera)
    # — zero them before floor/int casts, which are undefined on NaN.
    x = jnp.where(valid, uv[..., 0], 0.0)
    y = jnp.where(valid, uv[..., 1], 0.0)
    x0 = jnp.floor(x).astype(jnp.int32) - patch_radius   # window origin
    y0 = jnp.floor(y).astype(jnp.int32) - patch_radius
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    # Clamp to safe in-bounds windows; invalid obs are masked to zero below.
    max_x0 = (n_pan - 1) * stride + PANEL_W - win
    x0 = jnp.clip(x0, 0, max_x0)
    y0 = jnp.clip(y0, 0, h - win)
    pan = jnp.minimum(x0 // stride, n_pan - 1).astype(jnp.int32)
    off = (x0 - pan * stride).astype(jnp.int32)

    m = n * w
    chunk = min(_MAX_SMEM_CHUNK, n)
    while n % chunk != 0:
        chunk //= 2
    steps_per_frame = n // chunk

    def fm(a):  # (N, W, ...) -> frame-major (W*N, ...)
        return jnp.moveaxis(a, 0, 1).reshape((m,) + a.shape[2:])

    kern = functools.partial(
        _stats_kernel, chunk=chunk, n_panels=n_pan,
        n_channels=n_channels, patch_radius=patch_radius,
        cost_only=cost_only)

    # Scalar operands as 2D (steps, chunk): 1D SMEM operands hit an
    # XLA-vs-Mosaic tiling mismatch (T(1024) vs T(chunk)); a (1, chunk)
    # block sidesteps it.
    n_steps = m // chunk
    grid = (n_steps,)
    smem_vec = lambda: pl.BlockSpec(
        (1, 1, chunk), lambda s: (s, 0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            smem_vec(),  # y0
            smem_vec(),  # panel
            smem_vec(),  # lane offset
            pl.BlockSpec((1, 2, chunk), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, panels.shape[1] * n_pan, hrows, PANEL_W),
                         lambda s: (s // steps_per_frame, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, n_channels, ps, ps),
                         lambda s: (s % steps_per_frame, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 8), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 8), jnp.float32),
        interpret=interpret,
    )(
        fm(y0).reshape(n_steps, 1, chunk),
        fm(pan).reshape(n_steps, 1, chunk),
        fm(off).reshape(n_steps, 1, chunk),
        jnp.stack([fm(fx).reshape(n_steps, chunk),
                   fm(fy).reshape(n_steps, chunk)],
                  axis=1).astype(jnp.float32),
        panels.reshape(w, -1, hrows, PANEL_W).astype(jnp.float32),
        descriptors.astype(jnp.float32),
    )

    out = out.reshape(w, n, 8)
    out = jnp.moveaxis(out, 0, 1)                        # (N, W, 8)
    vf = valid.astype(out.dtype)[..., None]
    out = out * vf
    gtg = jnp.stack([
        jnp.stack([out[..., 0], out[..., 1]], axis=-1),
        jnp.stack([out[..., 1], out[..., 2]], axis=-1),
    ], axis=-2)
    gtr = out[..., 3:5]
    rnorm2 = out[..., 5]
    return gtg, gtr, rnorm2
