"""Pallas TPU kernel: bilinear patch warping (sampling only).

Second-generation hot kernel (supersedes ops/patch_stats.py in the LM
loop). Profiling showed the per-observation cost of the fused
sample+reduce kernel was dominated by the cross-lane REDUCTIONS on tiny
(P, P) tiles, not by the loads — while XLA executes the same reductions on
dense (N*W, ...) tensors at negligible cost. So this kernel does the one
thing XLA is catastrophically bad at on TPU (the data-dependent window
gather) and nothing else:

    per observation: one (2R+2, 128) row load -> one dynamic lane roll ->
    four bilinear taps -> P row stores.

Layout trick: the three planes a channel needs (value, d/dx, d/dy) are
interleaved across LANES (column 3x+k of a panel is plane k at pixel x),
so one load covers all three and the bilinear x-shift becomes a static
lane shift by 3. Panels overlap with a lane stride that is a multiple of 3
so any window lives in one panel at a lane offset that preserves the
interleave phase.

All statistics (mean-centering, Gram/residual reductions, Huber) happen in
plain XLA downstream (core/residuals._evaluate_compressed_pallas).
Reference counterpart: the interpolation inside Ceres' autodiff cost
(pb:src/photobundle.cc; SURVEY.md 3.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PANEL_W = 128
_MAX_SMEM_CHUNK = 256


def lane_stride(patch_radius: int) -> int:
    """Panel lane stride: multiple of 3 (interleave phase) leaving room for
    one 3*(2R+2)-lane window."""
    win_lanes = 3 * (2 * patch_radius + 2)
    return ((PANEL_W - win_lanes) // 3) * 3


def num_panels(width: int, patch_radius: int) -> int:
    lanes = 3 * width
    if lanes <= PANEL_W:
        return 1
    return int(np.ceil((lanes - PANEL_W) / lane_stride(patch_radius))) + 1


def build_interleaved_panels(channels: jax.Array, grads: jax.Array,
                             patch_radius: int) -> jax.Array:
    """(W, C, H, Wi) values + (W, C, H, Wi, 2) gradients ->
    (W, C, NPANEL, H, 128) lane-interleaved overlapping panels."""
    w, c, h, wi = channels.shape
    inter = jnp.stack([channels, grads[..., 0], grads[..., 1]],
                      axis=-1).reshape(w, c, h, 3 * wi)
    stride = lane_stride(patch_radius)
    n_pan = num_panels(wi, patch_radius)
    need = (n_pan - 1) * stride + PANEL_W
    if need > 3 * wi:
        inter = jnp.pad(inter, ((0, 0), (0, 0), (0, 0), (0, need - 3 * wi)))
    pans = [inter[..., p * stride:p * stride + PANEL_W] for p in range(n_pan)]
    return jnp.stack(pans, axis=2)


def _warp_kernel(y_ref, pan_ref, off_ref, fxfy_ref, img_ref, out_ref, *,
                 chunk: int, patch_radius: int):
    ps = 2 * patch_radius + 1
    win = ps + 1
    unroll = next(u for u in (16, 8, 4, 2, 1) if chunk % u == 0)

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
        rows = img_ref[0, 0, p, pl.ds(y0, win), :]         # (win, 128)
        wnd = pltpu.roll(rows, -o, 1)[:, :3 * win]         # (win, 3win)
        s3 = (w00 * wnd[:ps, :3 * ps] + w01 * wnd[:ps, 3:]
              + w10 * wnd[1:, :3 * ps] + w11 * wnd[1:, 3:])  # (ps, 3ps)
        for k in range(ps):
            out_ref[0, k, i, :] = s3[k]

    def body(g, _):
        for u in range(unroll):
            one(g * unroll + u)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)


def value_lane_stride(patch_radius: int) -> int:
    """Panel lane stride for VALUE-ONLY panels (bicubic kernel): window =
    ps+3 lanes (4x4 Catmull-Rom support across a ps-wide patch), no
    interleave phase constraint."""
    return PANEL_W - (2 * patch_radius + 1 + 3)


def num_value_panels(width: int, patch_radius: int) -> int:
    if width <= PANEL_W:
        return 1
    return int(np.ceil((width - PANEL_W) / value_lane_stride(patch_radius))) + 1


def build_value_panels(channels: jax.Array, patch_radius: int) -> jax.Array:
    """(W, C, H, Wi) channel values -> (W, C, NPANEL, H, 128) overlapping
    panels (no gradient interleave — the bicubic kernel computes exact
    surface gradients from values alone)."""
    w, c, h, wi = channels.shape
    stride = value_lane_stride(patch_radius)
    n_pan = num_value_panels(wi, patch_radius)
    need = (n_pan - 1) * stride + PANEL_W
    img = channels
    if need > wi:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, need - wi)))
    pans = [img[..., p * stride:p * stride + PANEL_W] for p in range(n_pan)]
    return jnp.stack(pans, axis=2)


def _catmull_rom_w(t):
    t2 = t * t
    t3 = t2 * t
    return (0.5 * (-t3 + 2.0 * t2 - t),
            0.5 * (3.0 * t3 - 5.0 * t2 + 2.0),
            0.5 * (-3.0 * t3 + 4.0 * t2 + t),
            0.5 * (t3 - t2))


def _catmull_rom_dw(t):
    t2 = t * t
    return (0.5 * (-3.0 * t2 + 4.0 * t - 1.0),
            0.5 * (9.0 * t2 - 10.0 * t),
            0.5 * (-9.0 * t2 + 8.0 * t + 1.0),
            0.5 * (3.0 * t2 - 2.0 * t))


def _bicubic_kernel(y_ref, pan_ref, off_ref, txty_ref, img_ref, out_ref, *,
                    chunk: int, patch_radius: int):
    """Catmull-Rom warp with EXACT analytic surface gradients (Ceres'
    BiCubicInterpolator semantics, reference pb:src/photobundle.cc): per
    observation one (ps+3, 128) row load, one roll, separable row/column
    weight combines (8 + 12 FMAs on (ps+3, ps)/(ps, ps) slices), ps row
    stores of the lane-concatenated (ps, 3ps) [value | d/dx | d/dy]."""
    ps = 2 * patch_radius + 1
    win = ps + 3
    unroll = next(u for u in (16, 8, 4, 2, 1) if chunk % u == 0)

    def one(i):
        y0 = y_ref[0, 0, i]
        p = pan_ref[0, 0, i]
        o = off_ref[0, 0, i]
        tx = txty_ref[0, 0, i]
        ty = txty_ref[0, 1, i]
        wx = _catmull_rom_w(tx)
        dwx = _catmull_rom_dw(tx)
        wy = _catmull_rom_w(ty)
        dwy = _catmull_rom_dw(ty)
        rows = img_ref[0, 0, p, pl.ds(y0, win), :]          # (win, 128)
        wnd = pltpu.roll(rows, -o, 1)[:, :win]              # (win, win)
        rv = sum(wx[j] * wnd[:, j:j + ps] for j in range(4))   # (win, ps)
        rd = sum(dwx[j] * wnd[:, j:j + ps] for j in range(4))  # (win, ps)
        v = sum(wy[j] * rv[j:j + ps, :] for j in range(4))     # (ps, ps)
        gx = sum(wy[j] * rd[j:j + ps, :] for j in range(4))
        gy = sum(dwy[j] * rv[j:j + ps, :] for j in range(4))
        s3 = jnp.concatenate([v, gx, gy], axis=1)           # (ps, 3ps)
        for k in range(ps):
            out_ref[0, k, i, :] = s3[k]

    def body(g, _):
        for u in range(unroll):
            one(g * unroll + u)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("patch_radius", "interpret"))
def warp_patches_bicubic(panels: jax.Array, uv: jax.Array, valid: jax.Array,
                         patch_radius: int, interpret: bool = False):
    """Catmull-Rom sample (value, exact d/dx, exact d/dy) patches.

    Args:
      panels: (W, C, NPANEL, H, 128) from build_value_panels.
      uv: (N, W, 2); valid: (N, W) (invalid coords clamped, mask downstream).

    Returns (s, gx, gy), each (N, W, C, P). For observations whose full
    (patch + 4x4) support is interior, values are identical to
    image/interp.bicubic_with_grad (same weights, same separable order).
    """
    n, w, _ = uv.shape
    c = panels.shape[1]
    n_pan = panels.shape[2]
    h = panels.shape[3]
    stride = value_lane_stride(patch_radius)
    ps = 2 * patch_radius + 1
    win = ps + 3

    x = jnp.where(valid, uv[..., 0], jnp.asarray(patch_radius + 2.0))
    y = jnp.where(valid, uv[..., 1], jnp.asarray(patch_radius + 2.0))
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    x0 = xf.astype(jnp.int32) - patch_radius - 1
    y0 = yf.astype(jnp.int32) - patch_radius - 1
    tx = (x - xf).astype(jnp.float32)
    ty = (y - yf).astype(jnp.float32)
    max_lane0 = (n_pan - 1) * stride + PANEL_W - win
    lane0 = jnp.clip(x0, 0, max_lane0)
    y0 = jnp.clip(y0, 0, h - win)
    pan = jnp.minimum(lane0 // stride, n_pan - 1).astype(jnp.int32)
    off = (lane0 - pan * stride).astype(jnp.int32)

    m = n * w
    chunk = min(_MAX_SMEM_CHUNK, n)
    while n % chunk != 0:
        chunk //= 2
    steps_per_frame = n // chunk
    n_steps = m // chunk

    def fm(a):
        return jnp.moveaxis(a, 0, 1).reshape(n_steps, 1, chunk)

    kern = functools.partial(_bicubic_kernel, chunk=chunk,
                             patch_radius=patch_radius)
    smem_vec = lambda: pl.BlockSpec(
        (1, 1, chunk), lambda ci, s: (s, 0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=(c, n_steps),
        in_specs=[
            smem_vec(),  # y0
            smem_vec(),  # panel
            smem_vec(),  # lane offset
            pl.BlockSpec((1, 2, chunk), lambda ci, s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_pan, h, PANEL_W),
                         lambda ci, s: (s // steps_per_frame, ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ps, chunk, 3 * ps),
                               lambda ci, s: (ci, 0, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, ps, m, 3 * ps), jnp.float32),
        interpret=interpret,
    )(
        fm(y0), fm(pan), fm(off),
        jnp.stack([jnp.moveaxis(tx, 0, 1).reshape(n_steps, chunk),
                   jnp.moveaxis(ty, 0, 1).reshape(n_steps, chunk)], axis=1),
        panels.astype(jnp.float32),
    )

    # (C, PS, m, 3PS) with lanes = [v(ps) | gx(ps) | gy(ps)] per row.
    out = out.reshape(c, ps, w, n, 3, ps)
    out = jnp.moveaxis(out, (3, 2, 0), (0, 1, 2))   # (N, W, C, PSy, 3, PSx)
    s = out[..., 0, :].reshape(n, w, c, ps * ps)
    gx = out[..., 1, :].reshape(n, w, c, ps * ps)
    gy = out[..., 2, :].reshape(n, w, c, ps * ps)
    return s, gx, gy


def _warp_kernel_block(y_ref, pan_ref, off_ref, fxfy_ref, img_ref, out_ref, *,
                       chunk: int, patch_radius: int, raw: bool):
    """Round-2 variants of _warp_kernel with ONE store per observation
    (out pages = observations, (rows, lanes) tile per page) instead of ps
    row stores — the per-row store addressing dominated the sequential
    loop. raw=True additionally skips the 4-tap combine and stores the
    rolled integer-aligned (win, 3win) window; the bilinear combine then
    runs as dense XLA downstream at memory speed."""
    ps = 2 * patch_radius + 1
    win = ps + 1
    unroll = next(u for u in (16, 8, 4, 2, 1) if chunk % u == 0)

    def one(i):
        y0 = y_ref[0, 0, i]
        p = pan_ref[0, 0, i]
        o = off_ref[0, 0, i]
        rows = img_ref[0, 0, p, pl.ds(y0, win), :]         # (win, 128)
        wnd = pltpu.roll(rows, -o, 1)[:, :3 * win]         # (win, 3win)
        if raw:
            out_ref[0, i] = wnd
        else:
            fx = fxfy_ref[0, 0, i]
            fy = fxfy_ref[0, 1, i]
            w00 = (1.0 - fx) * (1.0 - fy)
            w01 = fx * (1.0 - fy)
            w10 = (1.0 - fx) * fy
            w11 = fx * fy
            out_ref[0, i] = (w00 * wnd[:ps, :3 * ps] + w01 * wnd[:ps, 3:]
                             + w10 * wnd[1:, :3 * ps] + w11 * wnd[1:, 3:])

    def body(g, _):
        for u in range(unroll):
            one(g * unroll + u)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("patch_radius", "interpret",
                                             "variant"))
def warp_patches(panels: jax.Array, uv: jax.Array, valid: jax.Array,
                 patch_radius: int, interpret: bool = False,
                 variant: str = "rows"):
    """Bilinear-sample (value, d/dx, d/dy) patches at all observations.

    Args:
      panels: (W, C, NPANEL, H, 128) from build_interleaved_panels.
      uv: (N, W, 2) projected pixel coordinates (x, y).
      valid: (N, W) bool; invalid coords are clamped (mask downstream).
      patch_radius: R.
      variant: kernel store layout (tools/bench_warp_kernel.py, v5e,
        4096 x 5 obs):
        'rows':  round-1 kernel, ps row stores per obs — 14.5 ns/obs,
                 MEASURED FASTEST and the default,
        'block': one (ps, 3ps) tile store per observation — 16.7 ns/obs
                 (the padded (8,128) tile store costs more than 5 row
                 stores),
        'raw':   store the rolled (win, 3win) integer window, bilinear
                 combine in XLA downstream — 20.9 ns/obs.
        Round-2 finding: the kernel is ~0.3 ms of a ~2.5 ms LM iteration —
        NOT the bottleneck round 1 assumed (see BASELINE.md roofline).

    Returns (s, gx, gy), each (N, W, C, P) with P = (2R+1)^2.
    """
    n, w, _ = uv.shape
    c = panels.shape[1]
    n_pan = panels.shape[2]
    h = panels.shape[3]
    stride = lane_stride(patch_radius)
    ps = 2 * patch_radius + 1
    win = ps + 1

    x = jnp.where(valid, uv[..., 0], 0.0)
    y = jnp.where(valid, uv[..., 1], 0.0)
    x0 = jnp.floor(x).astype(jnp.int32) - patch_radius
    y0 = jnp.floor(y).astype(jnp.int32) - patch_radius
    fx = (x - jnp.floor(x)).astype(jnp.float32)
    fy = (y - jnp.floor(y)).astype(jnp.float32)
    max_lane0 = (n_pan - 1) * stride + PANEL_W - 3 * win
    lane0 = jnp.clip(3 * x0, 0, max_lane0)
    y0 = jnp.clip(y0, 0, h - win)
    pan = jnp.minimum(lane0 // stride, n_pan - 1).astype(jnp.int32)
    off = (lane0 - pan * stride).astype(jnp.int32)

    m = n * w
    chunk = min(_MAX_SMEM_CHUNK, n)
    while n % chunk != 0:
        chunk //= 2
    steps_per_frame = n // chunk
    n_steps = m // chunk

    def fm(a):  # (N, W) -> frame-major (n_steps, 1, chunk)
        return jnp.moveaxis(a, 0, 1).reshape(n_steps, 1, chunk)

    smem_vec = lambda: pl.BlockSpec(
        (1, 1, chunk), lambda ci, s: (s, 0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        smem_vec(),  # y0
        smem_vec(),  # panel
        smem_vec(),  # lane offset
        pl.BlockSpec((1, 2, chunk), lambda ci, s: (s, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_pan, h, PANEL_W),
                     lambda ci, s: (s // steps_per_frame, ci, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = (
        fm(y0), fm(pan), fm(off),
        jnp.stack([jnp.moveaxis(fx, 0, 1).reshape(n_steps, chunk),
                   jnp.moveaxis(fy, 0, 1).reshape(n_steps, chunk)], axis=1),
        panels.astype(jnp.float32),
    )

    if variant == "rows":
        kern = functools.partial(_warp_kernel, chunk=chunk,
                                 patch_radius=patch_radius)
        out = pl.pallas_call(
            kern,
            grid=(c, n_steps),  # channel-major so panel blocks are reused
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, ps, chunk, 3 * ps),
                                   lambda ci, s: (ci, 0, s, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, ps, m, 3 * ps), jnp.float32),
            interpret=interpret,
        )(*inputs)
        # (C, PS, m, 3PS) -> (N, W, C, PSy, PSx, 3). Lane index = 3*wx + k.
        out = out.reshape(c, ps, w, n, ps, 3)
        out = jnp.moveaxis(out, (3, 2, 0), (0, 1, 2))
    else:
        raw = variant == "raw"
        rows_out = win if raw else ps
        lanes_out = 3 * win if raw else 3 * ps
        kern = functools.partial(_warp_kernel_block, chunk=chunk,
                                 patch_radius=patch_radius, raw=raw)
        out = pl.pallas_call(
            kern,
            grid=(c, n_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, chunk, rows_out, lanes_out),
                                   lambda ci, s: (ci, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, m, rows_out, lanes_out),
                                           jnp.float32),
            interpret=interpret,
        )(*inputs)
        if raw:
            # Bilinear combine as dense XLA (memory-speed, no gathers):
            # weights per observation, frame-major like the kernel layout.
            fxm = jnp.moveaxis(fx, 0, 1).reshape(1, m, 1, 1)
            fym = jnp.moveaxis(fy, 0, 1).reshape(1, m, 1, 1)
            out = ((1 - fxm) * (1 - fym) * out[..., :ps, :3 * ps]
                   + fxm * (1 - fym) * out[..., :ps, 3:]
                   + (1 - fxm) * fym * out[..., 1:, :3 * ps]
                   + fxm * fym * out[..., 1:, 3:])
        # (C, m, PS, 3PS) -> (N, W, C, PSy, PSx, 3).
        out = out.reshape(c, w, n, ps, ps, 3)
        out = jnp.moveaxis(out, (2, 1, 0), (0, 1, 2))

    s = out[..., 0].reshape(n, w, c, ps * ps)
    gx = out[..., 1].reshape(n, w, c, ps * ps)
    gy = out[..., 2].reshape(n, w, c, ps * ps)
    return s, gx, gy
