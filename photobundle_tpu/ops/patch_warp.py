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

# Patch-grid warp clamp (one definition with the residual model — the
# scaled gather kernel sizes its load window from PATCH_SCALE_MAX).
from ..constants import PATCH_SCALE_MIN, PATCH_SCALE_MAX  # noqa: E402


def default_win_px(patch_radius: int) -> int:
    """Fixed-grid load window in pixels: patch span + 1 bilinear tap."""
    return 2 * patch_radius + 2


def scaled_win_px(patch_radius: int) -> int:
    """Load window (pixels, = rows) covering a patch warped by any
    rho <= PATCH_SCALE_MAX plus the bilinear tap."""
    return 2 * int(np.ceil(PATCH_SCALE_MAX * patch_radius)) + 2


def lane_stride(patch_radius: int, win_px: int | None = None) -> int:
    """Panel lane stride: multiple of 3 (interleave phase) leaving room for
    one 3*win_px-lane window."""
    if win_px is None:
        win_px = default_win_px(patch_radius)
    stride = ((PANEL_W - 3 * win_px) // 3) * 3
    if stride <= 0:
        raise ValueError(
            f"window of {win_px} px (3*{win_px} lanes) does not fit a "
            f"{PANEL_W}-lane panel with a positive stride — patchRadius "
            f"{patch_radius} is too large for this kernel (the scaled "
            "path supports patchRadius <= 9; use solverBackend=xla)")
    return stride


def num_panels(width: int, patch_radius: int,
               win_px: int | None = None) -> int:
    lanes = 3 * width
    if lanes <= PANEL_W:
        return 1
    return int(np.ceil((lanes - PANEL_W)
                       / lane_stride(patch_radius, win_px))) + 1


def build_interleaved_panels(channels: jax.Array, grads: jax.Array,
                             patch_radius: int,
                             win_px: int | None = None) -> jax.Array:
    """(W, C, H, Wi) values + (W, C, H, Wi, 2) gradients ->
    (W, C, NPANEL, H, 128) lane-interleaved overlapping panels.

    win_px widens the per-window lane budget (smaller stride, more panels)
    for the scaled gather kernel's rho-expanded windows."""
    w, c, h, wi = channels.shape
    inter = jnp.stack([channels, grads[..., 0], grads[..., 1]],
                      axis=-1).reshape(w, c, h, 3 * wi)
    stride = lane_stride(patch_radius, win_px)
    n_pan = num_panels(wi, patch_radius, win_px)
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


def _packed_epilogue(s3, g, dpk_ref, out_ref, mseg, inv_p, *, sub_d: bool,
                     center: bool, fuse_stats: bool):
    """Shared tail of the packed kernels: descriptor subtraction, segment
    -mean centering, fused Gauss-Newton statistics, store. `s3` is the
    (ps, 128) combined sample tile (value/gx/gy lane-interleaved at
    3*(ps+1)-lane observation segments)."""
    if sub_d:
        # Pre-packed reference descriptor (value lanes only, zero on
        # gradient lanes): value lanes now hold v - d, so downstream
        # residual statistics are products of SMALL quantities.
        s3 = s3 - dpk_ref[0, g]
    if center:
        # Per-patch mean removal (cfg.normalizePatches), per plane —
        # planes live on disjoint lanes, so one segment-mean matmul
        # centers value AND both gradients at once. Subtracting d
        # first shifts the value mean by mean(d) = 0 (mean-normalized
        # descriptors), so (v - d) - mean(v - d) == (v - mean v) - d.
        colsum = jnp.sum(s3, axis=0, keepdims=True)     # (1, 128)
        mean_vec = jax.lax.dot_general(
            colsum, mseg, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)         # (1, 128)
        s3 = s3 - mean_vec * inv_p
    if fuse_stats:
        # Emit the six Gauss-Newton product row-sums instead of the
        # samples: rows [gx*gx, gx*gy, gy*gy, gx*r, gy*r, r*r], each
        # (1, 128) with observation j's per-column partial sums on its
        # wl*j+3k value lanes (core/residuals._grouped_stats contracts
        # them 128 -> G on the MXU). r = centered (v - d) at value
        # lanes; t1/t2 = the +1/+2 lane rolls putting gx/gy there.
        t1 = pltpu.roll(s3, PANEL_W - 1, 1)
        t2 = pltpu.roll(s3, PANEL_W - 2, 1)
        out_ref[0, g] = jnp.concatenate(
            [jnp.sum(t1 * t1, axis=0, keepdims=True),
             jnp.sum(t1 * t2, axis=0, keepdims=True),
             jnp.sum(t2 * t2, axis=0, keepdims=True),
             jnp.sum(t1 * s3, axis=0, keepdims=True),
             jnp.sum(t2 * s3, axis=0, keepdims=True),
             jnp.sum(s3 * s3, axis=0, keepdims=True)], axis=0)
    else:
        out_ref[0, g] = s3


def _make_mseg(wl: int, ps: int):
    """Segment-mean matrix for _packed_epilogue's centering matmul."""
    li = jax.lax.broadcasted_iota(jnp.int32, (PANEL_W, PANEL_W), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (PANEL_W, PANEL_W), 1)
    return (((li // wl) == (lj // wl)) & (((lj - li) % 3) == 0)
            & ((li % wl) < 3 * ps)).astype(jnp.float32)


def _warp_kernel_packed(y_ref, pan_ref, off_ref, fxl_ref, img_ref, dpk_ref,
                        out_ref, *, gchunk: int, patch_radius: int,
                        g_obs: int, sub_d: bool, center: bool,
                        fuse_stats: bool = False, sort_reuse: bool = False):
    """Round-4 variant: G = 128 // (3*(ps+1)) observations are LANE-PACKED
    into each vector op. The round-3 'rows' kernel spends ~20 VPU ops per
    observation on (win, 128) tiles of which only 3*win = 18 lanes carry
    data — issue-bound at ~14-22 ns/obs, which at 65 536 x 5 obs is 70x the
    eval's HBM floor (round-3 verdict task 1). Here each observation's
    rolled window lands at lane offset 18*j of a shared accumulator
    (load + roll + masked select per obs = 3 ops), the bilinear weights
    arrive as PRECOMPUTED lane vectors (XLA-side repeat, one (2, 128) VMEM
    row per group), and the 4-tap combine + store amortize over the G
    packed observations — ~5 ops/obs.

    Bitwise-identical to the 'rows' kernel: same loads, exact lane rolls,
    and the combine multiplies/adds in the same order with the same
    f32 weight products."""
    ps = 2 * patch_radius + 1
    win = ps + 1
    wl = 3 * win
    lane = jax.lax.broadcasted_iota(jnp.int32, (win, PANEL_W), 1)
    masks = [(lane >= wl * j) & (lane < wl * (j + 1)) for j in range(g_obs)]
    if center:
        # Segment-mean matrix: (colsum @ mseg)[l] = sum of the SAME plane's
        # ps valid patch-column sums in l's observation segment — exact
        # per-patch mean removal in ONE tiny MXU op (a lane roll-tree costs
        # ~20 VPU issues/group; measured +2.5 ms at 65k x 5).
        mseg = _make_mseg(wl, ps)
        inv_p = 1.0 / float(ps * ps)

    def one(g):
        # Masked-zero + tree sum (NOT a select chain: that would serialize
        # the per-observation load/roll dependency graph; the disjoint-lane
        # masked parts are independent, so the compiler can overlap all G
        # loads+rolls).
        parts = []
        prev = None                     # (panel, y0, rows) carried cache
        for j in range(g_obs):
            i = g * g_obs + j
            y0 = y_ref[0, 0, i]
            p = pan_ref[0, 0, i]
            o = off_ref[0, 0, i]
            if sort_reuse and prev is not None:
                # Sorted dispatch (round-4 verdict task 4): the caller fed
                # this group G consecutive (panel, y-row)-sorted points, so
                # consecutive lanes usually want the IDENTICAL (win, 128)
                # row window — elide the reload behind a scalar branch.
                # This serializes the in-group load chain (each rows value
                # depends on the previous via the cond), but groups stay
                # independent and the g-loop is fully unrolled, so Mosaic
                # still overlaps across groups.
                p_prev, y_prev, rows_prev = prev
                same = (p == p_prev) & (y0 == y_prev)
                rows = jax.lax.cond(
                    same,
                    lambda: rows_prev,
                    lambda: img_ref[0, 0, p, pl.ds(y0, win), :])
            else:
                rows = img_ref[0, 0, p, pl.ds(y0, win), :]  # (win, 128)
            if sort_reuse:
                prev = (p, y0, rows)
            wnd = pltpu.roll(rows, wl * j - o, 1)
            parts.append(jnp.where(masks[j], wnd, 0.0) if g_obs > 1 else wnd)
        while len(parts) > 1:
            parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
                [parts[-1]] if len(parts) % 2 else [])
        acc = parts[0]
        # Weights as full (win, 128) tiles: ONE sublane broadcast per
        # fx/fy instead of an implicit broadcast per product (measured
        # ~3% at 65k; values and product order unchanged — bitwise
        # identical to the per-lane-vector form).
        fx = jnp.broadcast_to(fxl_ref[0, g, 0:1, :], (win, PANEL_W))
        fy = jnp.broadcast_to(fxl_ref[0, g, 1:2, :], (win, PANEL_W))
        one_fy = 1.0 - fy
        w00 = (1.0 - fx) * one_fy
        w01 = fx * one_fy
        w10 = (1.0 - fx) * fy
        w11 = fx * fy
        r3 = pltpu.roll(acc, PANEL_W - 3, 1)               # the +3-lane taps
        s3 = (w00[:ps] * acc[:ps, :] + w01[:ps] * r3[:ps, :]
              + w10[:ps] * acc[1:, :] + w11[:ps] * r3[1:, :])  # (ps, 128)
        _packed_epilogue(s3, g, dpk_ref, out_ref, mseg if center else None,
                         inv_p if center else 0.0, sub_d=sub_d,
                         center=center, fuse_stats=fuse_stats)

    # FULLY unrolled: a lax.fori_loop here makes every per-group index
    # dynamic (SMEM scalar reads, fxl loads, the out store) and costs 2.1x
    # measured at 65 536 x 5 (6.9 -> 3.28 ms/eval, benchlogs/r4_ablate.log)
    # — with static indices Mosaic software-pipelines the whole straight
    # -line group sequence.
    for g in range(gchunk):
        one(g)


def packed_group_size(patch_radius: int, win_px: int | None = None) -> int:
    """Observations lane-packed per 128-lane group: G = 128 // (3*win_px)."""
    if win_px is None:
        win_px = default_win_px(patch_radius)
    return PANEL_W // (3 * win_px)


def packed_geometry(n: int, patch_radius: int, gchunk: int = 32,
                    win_px: int | None = None):
    """Padding plan for the packed kernel: (g_obs, gchunk, gpf, n_pad).

    Points are padded so each frame is a whole number of `gchunk`-group
    grid steps of `g_obs` lane-packed observations each."""
    g_obs = packed_group_size(patch_radius, win_px)
    gchunk = min(gchunk, max(1, -(-n // g_obs)))
    gpf = gchunk * (-(-n // (g_obs * gchunk)))             # groups per frame
    return g_obs, gchunk, gpf, gpf * g_obs


def dispatch_geometry(x, y, h: int, n_pan: int, patch_radius: int):
    """The (y0, panel, lane-offset) integer dispatch the packed kernel uses
    for coordinates (x, y) — shared by the kernel launch and the sorted-
    dispatch key so the sort groups EXACTLY the loads the kernel will
    issue."""
    stride = lane_stride(patch_radius)
    win = 2 * patch_radius + 2
    wl = 3 * win
    x0 = jnp.floor(x).astype(jnp.int32) - patch_radius
    y0 = jnp.floor(y).astype(jnp.int32) - patch_radius
    max_lane0 = (n_pan - 1) * stride + PANEL_W - wl
    lane0 = jnp.clip(3 * x0, 0, max_lane0)
    y0 = jnp.clip(y0, 0, h - win)
    pan = jnp.minimum(lane0 // stride, n_pan - 1).astype(jnp.int32)
    off = (lane0 - pan * stride).astype(jnp.int32)
    return y0, pan, off


def warp_patches_grouped(panels, uv, valid, patch_radius: int,
                         interpret: bool = False, gchunk: int = 32,
                         dpack=None, center: bool = False,
                         fuse_stats: bool = False,
                         sort_reuse: bool = False):
    """Run the lane-packed kernel and return the RAW packed output.

    Returns (packed, n_pad) with packed (C, W, GPF, ps, 128): group g of
    frame f holds observations (j * GPF + g, f) for j < G at lane offsets
    wl*j (wl = 3*(ps+1)); lane wl*j + 3*k + c is plane c (0=value, 1=d/dx,
    2=d/dy) of patch column k (k < ps valid; the k = ps column and the
    tail lanes >= G*wl are garbage). Patch row = sublane index.

    The point -> (j, g) assignment is INTERLEAVED (point n = j * GPF + g)
    so the downstream 128->G mask-contraction can emit j-major/g-minor
    (.., G, GPF) outputs whose flatten IS point order with the large GPF
    axis minor — a dense TPU layout. A g-major assignment would need
    j-minor outputs, whose 7-wide minor dim tile-pads 18x.

    dpack: optional (C, GPF, ps, 128) pre-packed reference descriptors
    (core/residuals._pack_descriptors); when given, the kernel subtracts
    them after the bilinear combine, so value lanes hold v - d.

    This is the production large-N layout: consuming the statistics
    directly from it (core/residuals grouped-stats path) avoids both the
    15->128 lane padding of the 'rows' variant output (~56x physical
    write inflation) and the (N, W, C, P) unpack relayouts.
    """
    n, w, _ = uv.shape
    c = panels.shape[1]
    n_pan = panels.shape[2]
    h = panels.shape[3]
    ps = 2 * patch_radius + 1
    win = ps + 1
    wl = 3 * win
    g_obs, gchunk, gpf, n_pad = packed_geometry(n, patch_radius, gchunk)
    steps_per_frame = gpf // gchunk
    n_steps = w * steps_per_frame

    x = jnp.where(valid, uv[..., 0], 0.0)
    y = jnp.where(valid, uv[..., 1], 0.0)
    pad = ((0, n_pad - n), (0, 0))
    x = jnp.pad(x, pad)
    y = jnp.pad(y, pad)
    fx = (x - jnp.floor(x)).astype(jnp.float32)
    fy = (y - jnp.floor(y)).astype(jnp.float32)
    y0, pan, off = dispatch_geometry(x, y, h, n_pan, patch_radius)

    def groups(a):  # (N_pad, W) -> (W, GPF, G): [w, g, j] = point j*GPF+g
        return jnp.moveaxis(a, 0, 1).reshape(w, g_obs, gpf).swapaxes(1, 2)

    def fm(a):  # (N_pad, W) -> frame-major (n_steps, 1, gchunk * G)
        return groups(a).reshape(n_steps, 1, gchunk * g_obs)

    def lanes(a):  # (N_pad, W) -> per-group lane vectors (groups, 128)
        gm = groups(a).reshape(w * gpf, g_obs)
        lv = jnp.repeat(gm, wl, axis=1)                    # (groups, G*wl)
        return jnp.pad(lv, ((0, 0), (0, PANEL_W - g_obs * wl)))

    fxl = jnp.stack([lanes(fx), lanes(fy)], axis=1)        # (groups, 2, 128)
    fxl = fxl.reshape(n_steps, gchunk, 2, PANEL_W)

    smem_vec = lambda: pl.BlockSpec(
        (1, 1, gchunk * g_obs), lambda ci, s: (s, 0, 0),
        memory_space=pltpu.SMEM)
    in_specs = [
        smem_vec(),  # y0
        smem_vec(),  # panel
        smem_vec(),  # lane offset
        pl.BlockSpec((1, gchunk, 2, PANEL_W), lambda ci, s: (s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pan, h, PANEL_W),
                     lambda ci, s: (s // steps_per_frame, ci, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [fm(y0), fm(pan), fm(off), fxl, panels.astype(jnp.float32)]
    if dpack is not None:
        in_specs.append(
            pl.BlockSpec((1, gchunk, ps, PANEL_W),
                         lambda ci, s: (ci, s % steps_per_frame, 0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(dpack.astype(jnp.float32))
        kern = functools.partial(_warp_kernel_packed, gchunk=gchunk,
                                 patch_radius=patch_radius, g_obs=g_obs,
                                 sub_d=True, center=center,
                                 fuse_stats=fuse_stats,
                                 sort_reuse=sort_reuse)
    else:
        base = functools.partial(_warp_kernel_packed, gchunk=gchunk,
                                 patch_radius=patch_radius, g_obs=g_obs,
                                 sub_d=False, center=center,
                                 fuse_stats=fuse_stats,
                                 sort_reuse=sort_reuse)
        kern = lambda y, p, o, f, i, out: base(y, p, o, f, i, None, out)
    rows_out = 6 if fuse_stats else ps
    out = pl.pallas_call(
        kern,
        grid=(c, n_steps),  # channel-major so panel blocks are reused
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, gchunk, rows_out, PANEL_W),
                               lambda ci, s: (ci, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, w * gpf, rows_out, PANEL_W),
                                       jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out.reshape(c, w, gpf, rows_out, PANEL_W), n_pad


def _warp_patches_packed(panels, uv, valid, patch_radius: int,
                         interpret: bool):
    """Unpack the grouped kernel output back to (N, W, C, psy, psx, 3) —
    parity/benchmark wrapper only; the unpack relayouts cost more than the
    kernel at large N (use warp_patches_grouped + grouped stats there)."""
    n, w, _ = uv.shape
    c = panels.shape[1]
    ps = 2 * patch_radius + 1
    win = ps + 1
    wl = 3 * win
    g_obs, _, gpf, n_pad = packed_geometry(n, patch_radius)
    out, _ = warp_patches_grouped(panels, uv, valid, patch_radius, interpret)
    # (C, W, GPF, PS, 128): lanes [wl*j : wl*j + 3ps) hold obs j's combined
    # (v, gx, gy)-interleaved row; the wl*j+3ps.. tail lanes are garbage.
    out = out[..., :g_obs * wl].reshape(c, w, gpf, ps, g_obs, win, 3)
    out = out[..., :ps, :]
    # Interleaved assignment: point n = j * GPF + g -> (G, GPF) major order.
    out = jnp.moveaxis(out, (4, 2, 1, 0), (0, 1, 2, 3))  # (G, GPF, W, C, ..)
    out = out.reshape(n_pad, w, c, ps, ps, 3)[:n]
    return out


def _gather_kernel_scaled(y_ref, pan_ref, off_ref, img_ref, out_ref, *,
                          gchunk: int, g_obs: int, win_px: int):
    """Raw gather for WARPED patch grids (cfg.patchWarp='scale'): per
    observation one (win_px, 128) row load -> one lane roll -> masked
    pack at lane segment 3*win_px*j. No bilinear combine — with a
    per-observation scale rho the ps patch columns each carry their own
    integer offset and subpixel phase, so the separable resample runs as
    two dense one-hot contractions in XLA downstream (warp_patches_scaled)
    where it is memory-speed; the kernel keeps only the data-dependent
    window gather XLA cannot tile."""
    wl = 3 * win_px
    lane = jax.lax.broadcasted_iota(jnp.int32, (win_px, PANEL_W), 1)
    masks = [(lane >= wl * j) & (lane < wl * (j + 1)) for j in range(g_obs)]

    def one(g):
        parts = []
        for j in range(g_obs):
            i = g * g_obs + j
            y0 = y_ref[0, 0, i]
            p = pan_ref[0, 0, i]
            o = off_ref[0, 0, i]
            rows = img_ref[0, 0, p, pl.ds(y0, win_px), :]   # (win_px, 128)
            wnd = pltpu.roll(rows, wl * j - o, 1)           # phase-preserving
            parts.append(jnp.where(masks[j], wnd, 0.0) if g_obs > 1 else wnd)
        while len(parts) > 1:
            parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
                [parts[-1]] if len(parts) % 2 else [])
        out_ref[0, g] = parts[0]

    for g in range(gchunk):
        one(g)


def warp_patches_scaled(panels, uv, rho, valid, patch_radius: int,
                        interpret: bool = False, gchunk: int = 32):
    """Bilinear-sample (value, d/dx, d/dy) patches on a PER-OBSERVATION
    isotropically scaled grid: sample k of the patch row/column grid lands
    at uv + rho * (k - R) (cfg.patchWarp='scale'; the XLA reference is
    core/residuals._sample_patches with a 1-D `scale`).

    Args:
      panels: (W, C, NPANEL, H, 128) from
        build_interleaved_panels(..., win_px=scaled_win_px(R)) — the WIDE
        layout; fixed-grid panels have the wrong stride.
      uv: (N, W, 2); rho: (N, W) clamped to [PATCH_SCALE_MIN, MAX];
      valid: (N, W) (invalid coords clamped, mask downstream).

    Returns (s, gx, gy), each (N, W, C, P), patch pixels y-major like
    image/patches.patch_offsets. Two stages: the Pallas gather packs
    G = 128 // (3*win_px) raw integer-aligned (win_px x win_px) windows
    per 128-lane group (~4 ops/observation); XLA then contracts each
    window with per-observation one-hot bilinear row/column weight
    matrices on dense tiles. Values match the XLA gather path to float32
    reassociation (the 4-tap sum is evaluated y-major here).

    This is an accuracy-mode path (production patchWarp runs are
    4-16k-point golden windows); at 65k+ points the raw-window writeback
    (~2 KB/obs physical) makes the fixed-grid fused-stats kernel the
    right default — documented, not silently capped."""
    n, w, _ = uv.shape
    c = panels.shape[1]
    n_pan = panels.shape[2]
    h = panels.shape[3]
    ps = 2 * patch_radius + 1
    win = scaled_win_px(patch_radius)
    wl = 3 * win
    stride = lane_stride(patch_radius, win)
    g_obs, gchunk, gpf, n_pad = packed_geometry(n, patch_radius, gchunk, win)
    steps_per_frame = gpf // gchunk
    n_steps = w * steps_per_frame

    safe_c = float(PATCH_SCALE_MAX * patch_radius + 2)
    x = jnp.where(valid, uv[..., 0], safe_c)
    y = jnp.where(valid, uv[..., 1], safe_c)
    r = jnp.where(valid,
                  jnp.clip(rho, PATCH_SCALE_MIN, PATCH_SCALE_MAX), 1.0)
    pad = ((0, n_pad - n), (0, 0))
    x = jnp.pad(x, pad, constant_values=safe_c)
    y = jnp.pad(y, pad, constant_values=safe_c)
    r = jnp.pad(r, pad, constant_values=1.0)

    x0 = jnp.floor(x - r * patch_radius).astype(jnp.int32)
    y0 = jnp.floor(y - r * patch_radius).astype(jnp.int32)
    # Floored to a multiple of 3: a raw (... + PANEL_W - wl) clamp bound is
    # ≡ 2 (mod 3), so a clamped right-edge window would start mid-triple
    # and every "value" tap would read a gradient lane (review round 5;
    # regression: test_patch_stats.py::test_scaled_right_edge_exact). The
    # panels' padded tail still covers [max_lane0, max_lane0 + wl), and
    # in-bounds observations keep exact taps after the clamp because the
    # window is PATCH_SCALE_MAX-sized while their span is rho-sized.
    max_lane0 = (((n_pan - 1) * stride + PANEL_W - wl) // 3) * 3
    lane0 = jnp.clip(3 * x0, 0, max_lane0)
    y0 = jnp.clip(y0, 0, h - win)
    pan = jnp.minimum(lane0 // stride, n_pan - 1).astype(jnp.int32)
    off = (lane0 - pan * stride).astype(jnp.int32)
    x_start = (lane0 // 3).astype(x.dtype)     # true window-start pixel
    y_start = y0.astype(y.dtype)

    def groups(a):  # (N_pad, W) -> (W, GPF, G): [w, g, j] = point j*GPF+g
        return jnp.moveaxis(a, 0, 1).reshape(w, g_obs, gpf).swapaxes(1, 2)

    def fm(a):  # (N_pad, W) -> frame-major (n_steps, 1, gchunk * G)
        return groups(a).reshape(n_steps, 1, gchunk * g_obs)

    smem_vec = lambda: pl.BlockSpec(
        (1, 1, gchunk * g_obs), lambda ci, s: (s, 0, 0),
        memory_space=pltpu.SMEM)
    kern = functools.partial(_gather_kernel_scaled, gchunk=gchunk,
                             g_obs=g_obs, win_px=win)
    raw = pl.pallas_call(
        kern,
        grid=(c, n_steps),  # channel-major so panel blocks are reused
        in_specs=[
            smem_vec(),  # y0
            smem_vec(),  # panel
            smem_vec(),  # lane offset
            pl.BlockSpec((1, 1, n_pan, h, PANEL_W),
                         lambda ci, s: (s // steps_per_frame, ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gchunk, win, PANEL_W),
                               lambda ci, s: (ci, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, w * gpf, win, PANEL_W),
                                       jnp.float32),
        interpret=interpret,
    )(fm(y0), fm(pan), fm(off), panels.astype(jnp.float32))

    # Lane wl*j + 3*m + p of group g is plane p (0=value, 1=d/dx, 2=d/dy)
    # at window pixel m of observation j*GPF + g.
    raw6 = raw.reshape(c, w, gpf, win, PANEL_W)[..., :g_obs * wl]
    raw6 = raw6.reshape(c, w, gpf, win, g_obs, win, 3)

    # Per-observation separable bilinear weights over the raw window:
    # sample k (row OR column) sits at uv + r*(k - R), i.e. window-relative
    # position fm in [0, win-1); one-hot floor tap (1-f) + next tap (f).
    ks = jnp.arange(ps, dtype=x.dtype) - patch_radius       # (ps,)
    fmx = x[..., None] + r[..., None] * ks - x_start[..., None]
    fmy = y[..., None] + r[..., None] * ks - y_start[..., None]
    mx = jnp.clip(jnp.floor(fmx).astype(jnp.int32), 0, win - 2)
    my = jnp.clip(jnp.floor(fmy).astype(jnp.int32), 0, win - 2)
    fx = jnp.clip(fmx - mx, 0.0, 1.0)   # clamped windows distort; caller
    fy = jnp.clip(fmy - my, 0.0, 1.0)   # masks border observations
    # One-hot taps as dense iota comparisons (an eye[idx] gather would put
    # the data-dependent indexing XLA is worst at right back on the path
    # the kernel exists to remove).
    iw = jnp.arange(win, dtype=jnp.int32)
    wx = (jnp.where(mx[..., None] == iw, 1.0 - fx[..., None], 0.0)
          + jnp.where(mx[..., None] + 1 == iw, fx[..., None], 0.0))
    wy = (jnp.where(my[..., None] == iw, 1.0 - fy[..., None], 0.0)
          + jnp.where(my[..., None] + 1 == iw, fy[..., None], 0.0))

    def wgt(a):  # (N_pad, W, ps, win) -> (G, GPF, W, ps, win)
        return a.reshape(g_obs, gpf, w, ps, win)

    t1 = jnp.einsum("cwgrjmp,jgwyr->cwgjymp", raw6, wgt(wy))
    out = jnp.einsum("cwgjymp,jgwxm->cwgjyxp", t1, wgt(wx))
    out = jnp.moveaxis(out, (3, 2, 1, 0), (0, 1, 2, 3))  # (G, GPF, W, C, ..)
    out = out.reshape(n_pad, w, c, ps * ps, 3)[:n]
    return out[..., 0], out[..., 1], out[..., 2]


def _warp_kernel_scaled_packed(ytap_ref, pan_ref, rx_ref, fy_ref, fxl_ref,
                               img_ref, dpk_ref, out_ref, *, gchunk: int,
                               patch_radius: int, g_obs: int, sub_d: bool,
                               center: bool, fuse_stats: bool):
    """Fused WARPED-grid packed kernel (cfg.patchWarp='scale'), round 5.

    Same output contract as _warp_kernel_packed (G = 128 // (3*(ps+1))
    observations per group at 3*(ps+1)-lane segments, optional in-kernel
    descriptor subtraction / centering / fused GN statistics) — but each
    observation's patch grid is scaled by its own rho, so neither the
    unit row spacing nor the shared subpixel phase of the fixed kernel
    hold. Schedule per observation:

      y-phase: ps two-row loads at per-(obs, patch-row) absolute rows
        (img rows floor(v + rho*(yr-R))), blended with the per-row phase
        fy — no dynamic sublane ops, the row gather IS the load;
      x-phase: per (obs, column) one dynamic lane roll placing the
        column's floor pixel at its output lane (roll amount precomputed
        XLA-side: wl*j + 3k - o - 3*mx), plus the rx-3 roll for the
        +1-pixel tap; masked into shared floor/next accumulators;
      combine: one (1-fx)*F + fx*N with fx as a precomputed lane vector.

    ~37 VPU ops/observation vs the fixed kernel's ~5 — the honest cost of
    a per-observation warp; still ~10x the XLA gather path (the
    alternative dense formulation pays 68x tile padding on (.., win, 3)
    intermediates — measured 3.3 ms vs 0.43 at 4096x5)."""
    ps = 2 * patch_radius + 1
    wl = 3 * (ps + 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ps, PANEL_W), 1)
    col_masks = [[(lane >= wl * j + 3 * k) & (lane < wl * j + 3 * k + 3)
                  for k in range(ps)] for j in range(g_obs)]
    if center:
        mseg = _make_mseg(wl, ps)
        inv_p = 1.0 / float(ps * ps)

    def one(g):
        parts_f = []
        parts_n = []
        for j in range(g_obs):
            i = g * g_obs + j
            p = pan_ref[0, 0, i]
            rows = []
            for yr in range(ps):
                yt = ytap_ref[0, 0, i * ps + yr]
                fy = fy_ref[0, 0, i * ps + yr]
                r2 = img_ref[0, 0, p, pl.ds(yt, 2), :]      # (2, 128)
                rows.append(r2[0:1] * (1.0 - fy) + r2[1:2] * fy)
            accj = jnp.concatenate(rows, axis=0)            # (ps, 128)
            for k in range(ps):
                rx = rx_ref[0, 0, i * ps + k]
                parts_f.append(jnp.where(col_masks[j][k],
                                         pltpu.roll(accj, rx, 1), 0.0))
                parts_n.append(jnp.where(col_masks[j][k],
                                         pltpu.roll(accj, rx - 3, 1), 0.0))

        def tree(parts):
            while len(parts) > 1:
                parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
                    [parts[-1]] if len(parts) % 2 else [])
            return parts[0]

        acc_f = tree(parts_f)
        acc_n = tree(parts_n)
        fx = jnp.broadcast_to(fxl_ref[0, g, 0:1, :], (ps, PANEL_W))
        s3 = (1.0 - fx) * acc_f + fx * acc_n               # (ps, 128)
        _packed_epilogue(s3, g, dpk_ref, out_ref,
                         mseg if center else None,
                         inv_p if center else 0.0, sub_d=sub_d,
                         center=center, fuse_stats=fuse_stats)

    # Fully unrolled like the fixed packed kernel (static indices let
    # Mosaic software-pipeline the group sequence).
    for g in range(gchunk):
        one(g)


def warp_patches_grouped_scaled(panels, uv, rho, valid, patch_radius: int,
                                interpret: bool = False, gchunk: int = 32,
                                dpack=None, center: bool = False,
                                fuse_stats: bool = False):
    """Run the fused warped-grid kernel; same output contract as
    warp_patches_grouped ((C, W, GPF, rows, 128) packed layout, consumed
    by core/residuals._grouped_stats with NO unpack) but sampling on the
    per-observation scaled grid uv + rho * (k - R).

    panels must be the WIDE layout (build_interleaved_panels with
    win_px=scaled_win_px(R)): a rho<=2 window spans 3*scaled_win_px lanes,
    so the wide stride guarantees it fits one panel at an interleave-
    preserving offset. Output segments stay at the FIXED 3*(ps+1)-lane
    stride, so descriptor packs, segment masks and the grouped-stats
    contraction are shared with the fixed-grid path verbatim."""
    n, w, _ = uv.shape
    c = panels.shape[1]
    n_pan = panels.shape[2]
    h = panels.shape[3]
    ps = 2 * patch_radius + 1
    win_w = scaled_win_px(patch_radius)
    stride = lane_stride(patch_radius, win_w)
    g_obs, gchunk, gpf, n_pad = packed_geometry(n, patch_radius, gchunk)
    steps_per_frame = gpf // gchunk
    n_steps = w * steps_per_frame
    wl = 3 * (ps + 1)

    safe_c = float(PATCH_SCALE_MAX * patch_radius + 2)
    x = jnp.where(valid, uv[..., 0], safe_c)
    y = jnp.where(valid, uv[..., 1], safe_c)
    r = jnp.where(valid,
                  jnp.clip(rho, PATCH_SCALE_MIN, PATCH_SCALE_MAX), 1.0)
    pad = ((0, n_pad - n), (0, 0))
    x = jnp.pad(x, pad, constant_values=safe_c)
    y = jnp.pad(y, pad, constant_values=safe_c)
    r = jnp.pad(r, pad, constant_values=1.0)

    x0 = jnp.floor(x - r * patch_radius).astype(jnp.int32)
    # Multiple of 3 — see the matching clamp in warp_patches_scaled (a
    # mod-3 remainder here breaks the value/gx/gy interleave phase for
    # clamped-but-valid right-edge windows).
    max_lane0 = (((n_pan - 1) * stride + PANEL_W - 3 * win_w) // 3) * 3
    lane0 = jnp.clip(3 * x0, 0, max_lane0)
    pan = jnp.minimum(lane0 // stride, n_pan - 1).astype(jnp.int32)
    o = lane0 - pan * stride                               # window lane

    ks = jnp.arange(ps, dtype=x.dtype) - patch_radius      # (ps,)
    ys = y[..., None] + r[..., None] * ks                  # (N_pad, W, ps)
    ytap = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    fy = jnp.clip(ys - ytap, 0.0, 1.0)
    xs = x[..., None] + r[..., None] * ks
    x_start = (lane0 // 3)[..., None]                      # window pixel
    mx = jnp.clip(jnp.floor(xs).astype(jnp.int32) - x_start, 0, win_w - 2)
    fx = jnp.clip(xs - (x_start + mx), 0.0, 1.0)
    # Per-(obs, column) roll: output lane wl*j + 3k <- window lane
    # o + 3*mx. The lane slot j of padded point n is n // GPF.
    jn = (jnp.arange(n_pad, dtype=jnp.int32) // gpf)[:, None, None]
    rx = (wl * jn + 3 * jnp.arange(ps, dtype=jnp.int32)
          - o[..., None] - 3 * mx)

    def fm(a):  # (N_pad, W) -> frame-major (n_steps, 1, gchunk * G)
        b = jnp.moveaxis(a, 0, 1).reshape(w, g_obs, gpf).swapaxes(1, 2)
        return b.reshape(n_steps, 1, gchunk * g_obs)

    def fm3(a):  # (N_pad, W, ps) -> (n_steps, 1, gchunk * G * ps)
        b = jnp.moveaxis(a, 0, 1).reshape(w, g_obs, gpf, ps)
        return b.transpose(0, 2, 1, 3).reshape(n_steps, 1,
                                               gchunk * g_obs * ps)

    def lanes3(a):  # (N_pad, W, ps) -> per-group lane vectors (groups, 128)
        b = jnp.moveaxis(a, 0, 1).reshape(w, g_obs, gpf, ps)
        b = b.transpose(0, 2, 1, 3).reshape(w * gpf, g_obs, ps)
        lv = jnp.repeat(b, 3, axis=2)                      # (groups, G, 3ps)
        lv = jnp.pad(lv, ((0, 0), (0, 0), (0, wl - 3 * ps)))
        lv = lv.reshape(w * gpf, g_obs * wl)
        return jnp.pad(lv, ((0, 0), (0, PANEL_W - g_obs * wl)))

    fxl = lanes3(fx).reshape(n_steps, gchunk, 1, PANEL_W)

    smem_i = lambda m: pl.BlockSpec(
        (1, 1, gchunk * g_obs * m), lambda ci, s: (s, 0, 0),
        memory_space=pltpu.SMEM)
    in_specs = [
        smem_i(ps),   # ytap
        smem_i(1),    # panel
        smem_i(ps),   # rx
        smem_i(ps),   # fy
        pl.BlockSpec((1, gchunk, 1, PANEL_W), lambda ci, s: (s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pan, h, PANEL_W),
                     lambda ci, s: (s // steps_per_frame, ci, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [fm3(ytap), fm(pan), fm3(rx), fm3(fy), fxl,
              panels.astype(jnp.float32)]
    if dpack is not None:
        in_specs.append(
            pl.BlockSpec((1, gchunk, ps, PANEL_W),
                         lambda ci, s: (ci, s % steps_per_frame, 0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(dpack.astype(jnp.float32))
        kern = functools.partial(_warp_kernel_scaled_packed, gchunk=gchunk,
                                 patch_radius=patch_radius, g_obs=g_obs,
                                 sub_d=True, center=center,
                                 fuse_stats=fuse_stats)
    else:
        base = functools.partial(_warp_kernel_scaled_packed, gchunk=gchunk,
                                 patch_radius=patch_radius, g_obs=g_obs,
                                 sub_d=False, center=center,
                                 fuse_stats=fuse_stats)
        kern = lambda yt, p, rxr, fyr, fxr, i, out: base(yt, p, rxr, fyr,
                                                         fxr, i, None, out)
    rows_out = 6 if fuse_stats else ps
    out = pl.pallas_call(
        kern,
        grid=(c, n_steps),  # channel-major so panel blocks are reused
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, gchunk, rows_out, PANEL_W),
                               lambda ci, s: (ci, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, w * gpf, rows_out, PANEL_W),
                                       jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out.reshape(c, w, gpf, rows_out, PANEL_W), n_pad


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
      variant: kernel structure (tools/bench_warp_kernel.py, v5e,
        4096 x 5 obs unless noted):
        'rows':  round-1 kernel, one obs per vector op, ps row stores —
                 14.5 ns/obs at 4k, degrading to ~16 ns/obs at 65k; the
                 default for THIS (N, W, C, P)-returning API,
        'packed': round-4 kernel, G = 128 // (3*(ps+1)) observations
                 lane-packed per vector op (~9 ns/obs at 65k in-kernel,
                 bitwise-identical outputs to 'rows') — but the unpack
                 back to (N, W, C, P) costs MORE than the kernel saves,
                 so through this API it is parity/benchmark only. The
                 production consumer is warp_patches_grouped + the
                 grouped-stats path (core/residuals), which never unpacks,
        'block': one (ps, 3ps) tile store per observation — 16.7 ns/obs
                 (the padded (8,128) tile store costs more than 5 row
                 stores),
        'raw':   store the rolled (win, 3win) integer window, bilinear
                 combine in XLA downstream — 20.9 ns/obs.
        Round-2 finding: the kernel is ~0.3 ms of a ~2.5 ms LM iteration at
        4096x5 — but at 65 536x5 the eval IS the bottleneck (70x its HBM
        floor, round-3 verdict), which the grouped path fixes.

    Returns (s, gx, gy), each (N, W, C, P) with P = (2R+1)^2.
    """
    n, w, _ = uv.shape
    if variant == "packed":
        out = _warp_patches_packed(panels, uv, valid, patch_radius,
                                   interpret)
        ps = 2 * patch_radius + 1
        c = panels.shape[1]
        s = out[..., 0].reshape(n, w, c, ps * ps)
        gx = out[..., 1].reshape(n, w, c, ps * ps)
        gy = out[..., 2].reshape(n, w, c, ps * ps)
        return s, gx, gy
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
