"""Ablation timing of the packed warp kernel (verdict-4 task 1).

The fused packed kernel measures ~6.9 ms at 65536x5 (~147 ns per 7-obs
group; ~21 ns/obs) against a 0.102 ms HBM floor. This times kernel
variants with individual op classes stubbed out (results are WRONG — only
the op mix matters) to attribute the per-group cost:

    python tools/ablate_packed_kernel.py [n_pts] [w] [K]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from photobundle_tpu.core import residuals as R
from photobundle_tpu.ops import patch_warp as pw
from __graft_entry__ import _make_problem

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
W = int(sys.argv[2]) if len(sys.argv) > 2 else 5
K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
H, WI, PR = 370, 1226, 2

cam, offsets, args = _make_problem(N, W, H, WI, PR, seed=1)
t_wc, x_world, patch, channels, grads, obs, pv, frozen = args
obs = obs & pv[:, None]
ctx = R.make_pallas_ctx(channels, grads, patch, PR)
_, panels = ctx

f = jax.jit(lambda x: x + 1.0)
_ = float(f(jnp.zeros(())))
RTT = min(time.perf_counter() - t0 if False else 0 for t0 in [0]) or None
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    _ = float(f(jnp.zeros(())))
    ts.append(time.perf_counter() - t0)
RTT = min(ts)
print(f"[N={N} W={W} K={K}; RTT {RTT*1e3:.1f} ms]")

PANEL_W = pw.PANEL_W


def ablate_kernel(y_ref, pan_ref, off_ref, fxl_ref, img_ref, dpk_ref,
                  out_ref, *, gchunk, patch_radius, g_obs,
                  static_y0=False, static_pan=False, roll_mode="dyn",
                  do_select=True, do_combine=True, do_subd=True,
                  do_center=True, do_stats=True, combine_mode="orig",
                  stats_mode="concat", load_mode="per_obs"):
    ps = 2 * patch_radius + 1
    win = ps + 1
    wl = 3 * win
    sup_h = 16  # superwindow height for load_mode='superwindow'
    lane = jax.lax.broadcasted_iota(jnp.int32, (win, PANEL_W), 1)
    masks = [(lane >= wl * j) & (lane < wl * (j + 1)) for j in range(g_obs)]
    li = jax.lax.broadcasted_iota(jnp.int32, (PANEL_W, PANEL_W), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (PANEL_W, PANEL_W), 1)
    mseg = (((li // wl) == (lj // wl)) & (((lj - li) % 3) == 0)
            & ((li % wl) < 3 * ps)).astype(jnp.float32)
    inv_p = 1.0 / float(ps * ps)

    def one(g):
        parts = []
        if load_mode == "superwindow":
            # Round-5 sorted-dispatch design-B probe (branch-free): ONE
            # (sup_h, 128) load per group at the group's base window, each
            # observation extracted by a DYNAMIC SUBLANE roll instead of
            # its own load. Results are WRONG (the delta is taken mod
            # sup_h and the base is obs 0's window, with no coverage
            # fallback) — this times the op mix a bucket-padded dispatch
            # would run: 1 load / G + 1 sublane roll per obs.
            h_img = img_ref.shape[3]
            y0g = jnp.minimum(y_ref[0, 0, g * g_obs], h_img - sup_h)
            pg = 0 if static_pan else pan_ref[0, 0, g * g_obs]
            sup = img_ref[0, 0, pg, pl.ds(y0g, sup_h), :]   # (sup_h, 128)
        for j in range(g_obs):
            i = g * g_obs + j
            y0 = 0 if static_y0 else y_ref[0, 0, i]
            p = 0 if static_pan else pan_ref[0, 0, i]
            o = off_ref[0, 0, i]
            if load_mode == "superwindow":
                d = (y0 - y0g) & (sup_h - 1)
                rows = pltpu.roll(sup, sup_h - d, 0)[:win]
            else:
                rows = img_ref[0, 0, p, pl.ds(y0, win), :]
            if roll_mode == "dyn":
                wnd = pltpu.roll(rows, wl * j - o, 1)
            elif roll_mode == "static":
                wnd = pltpu.roll(rows, wl * j + 1, 1)
            else:
                wnd = rows
            parts.append(jnp.where(masks[j], wnd, 0.0)
                         if (do_select and g_obs > 1) else wnd)
        while len(parts) > 1:
            parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
                [parts[-1]] if len(parts) % 2 else [])
        acc = parts[0]
        if do_combine and combine_mode == "orig":
            fx = fxl_ref[0, g, 0, :]
            fy = fxl_ref[0, g, 1, :]
            w00 = (1.0 - fx) * (1.0 - fy)
            w01 = fx * (1.0 - fy)
            w10 = (1.0 - fx) * fy
            w11 = fx * fy
            r3 = pltpu.roll(acc, PANEL_W - 3, 1)
            s3 = (w00 * acc[:ps, :] + w01 * r3[:ps, :]
                  + w10 * acc[1:, :] + w11 * r3[1:, :])
        elif do_combine and combine_mode == "hoist":
            # Broadcast fx/fy to the full (win, 128) tile ONCE, compute the
            # four weights as full tiles, slice — no per-product implicit
            # sublane broadcasts.
            fx = jnp.broadcast_to(fxl_ref[0, g, 0:1, :], (win, PANEL_W))
            fy = jnp.broadcast_to(fxl_ref[0, g, 1:2, :], (win, PANEL_W))
            one_fx = 1.0 - fx
            w00 = one_fx * (1.0 - fy)
            w01 = fx * (1.0 - fy)
            w10 = one_fx * fy
            w11 = fx * fy
            r3 = pltpu.roll(acc, PANEL_W - 3, 1)
            s3 = (w00[:ps] * acc[:ps, :] + w01[:ps] * r3[:ps, :]
                  + w10[:ps] * acc[1:, :] + w11[:ps] * r3[1:, :])
        elif do_combine and combine_mode == "lerp":
            # Factored bilinear: lerp rows then columns.
            # s(y,x) = (1-fy)*row0 + fy*row1 applied on the full (win,128)
            # acc via the sublane shift, then the x-lerp with the +3 roll.
            fy = jnp.broadcast_to(fxl_ref[0, g, 1:2, :], (win, PANEL_W))
            fx = jnp.broadcast_to(fxl_ref[0, g, 0:1, :], (win, PANEL_W))
            ylerp = acc[:ps, :] + fy[:ps] * (acc[1:, :] - acc[:ps, :])
            r3 = pltpu.roll(ylerp, PANEL_W - 3, 1)
            s3 = ylerp + fx[:ps] * (r3 - ylerp)
        else:
            s3 = acc[:ps, :]
        if do_subd:
            s3 = s3 - dpk_ref[0, g]
        if do_center:
            colsum = jnp.sum(s3, axis=0, keepdims=True)
            mean_vec = jax.lax.dot_general(
                colsum, mseg, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            s3 = s3 - mean_vec * inv_p
        if do_stats and stats_mode == "concat":
            t1 = pltpu.roll(s3, PANEL_W - 1, 1)
            t2 = pltpu.roll(s3, PANEL_W - 2, 1)
            out_ref[0, g] = jnp.concatenate(
                [jnp.sum(t1 * t1, axis=0, keepdims=True),
                 jnp.sum(t1 * t2, axis=0, keepdims=True),
                 jnp.sum(t2 * t2, axis=0, keepdims=True),
                 jnp.sum(t1 * s3, axis=0, keepdims=True),
                 jnp.sum(t2 * s3, axis=0, keepdims=True),
                 jnp.sum(s3 * s3, axis=0, keepdims=True)], axis=0)
        elif do_stats and stats_mode == "matmul":
            # One sublane-sum matmul on the stacked products: build
            # (3*ps, 128) [t1;t2;s3]-aligned products in two tiles and
            # reduce each ps-row band with a (6, 3ps) constant matrix...
            # simplest exact variant: stack the six product tiles
            # (6*ps, 128) then ONE segment-sum matmul (6, 6ps) @ (6ps, 128).
            t1 = pltpu.roll(s3, PANEL_W - 1, 1)
            t2 = pltpu.roll(s3, PANEL_W - 2, 1)
            prods = jnp.concatenate(
                [t1 * t1, t1 * t2, t2 * t2, t1 * s3, t2 * s3, s3 * s3],
                axis=0)                                    # (6ps, 128)
            si = jax.lax.broadcasted_iota(jnp.int32, (6, 6 * ps), 0)
            sj = jax.lax.broadcasted_iota(jnp.int32, (6, 6 * ps), 1)
            msum = ((sj // ps) == si).astype(jnp.float32)
            out_ref[0, g] = jax.lax.dot_general(
                msum, prods, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        else:
            out_ref[0, g] = jnp.pad(s3 + 0.0, ((0, 6 - ps if 6 > ps else 0),
                                               (0, 0)))[:6]

    for g in range(gchunk):
        one(g)


def run_variant(name, gchunk=32, **knobs):
    n, w = N, W
    c = panels.shape[1]
    n_pan = panels.shape[2]
    h = panels.shape[3]
    stride = pw.lane_stride(PR)
    ps = 2 * PR + 1
    win = ps + 1
    wl = 3 * win
    g_obs, gchunk, gpf, n_pad = pw.packed_geometry(n, PR, gchunk)
    steps_per_frame = gpf // gchunk
    n_steps = w * steps_per_frame
    dpack = R._pack_descriptors(patch, PR, n_pad)

    y, uv_g, in_front, a, r_cw = R._observation_geometry_pm(
        cam, t_wc, x_world)
    valid = (obs.T & in_front)
    uv = jnp.transpose(uv_g, (2, 0, 1))

    def prep(uv, valid):
        x = jnp.where(valid, uv[..., 0], 0.0)
        yv = jnp.where(valid, uv[..., 1], 0.0)
        pad = ((0, n_pad - n), (0, 0))
        x = jnp.pad(x, pad)
        yv = jnp.pad(yv, pad)
        x0 = jnp.floor(x).astype(jnp.int32) - PR
        y0 = jnp.floor(yv).astype(jnp.int32) - PR
        fx = (x - jnp.floor(x)).astype(jnp.float32)
        fy = (yv - jnp.floor(yv)).astype(jnp.float32)
        max_lane0 = (n_pan - 1) * stride + PANEL_W - wl
        lane0 = jnp.clip(3 * x0, 0, max_lane0)
        y0 = jnp.clip(y0, 0, h - win)
        pan = jnp.minimum(lane0 // stride, n_pan - 1).astype(jnp.int32)
        off = (lane0 - pan * stride).astype(jnp.int32)

        def groups(aa):
            return jnp.moveaxis(aa, 0, 1).reshape(w, g_obs, gpf).swapaxes(
                1, 2)

        def fm(aa):
            return groups(aa).reshape(n_steps, 1, gchunk * g_obs)

        def lanes_(aa):
            gm = groups(aa).reshape(w * gpf, g_obs)
            lv = jnp.repeat(gm, wl, axis=1)
            return jnp.pad(lv, ((0, 0), (0, PANEL_W - g_obs * wl)))

        fxl = jnp.stack([lanes_(fx), lanes_(fy)], axis=1)
        fxl = fxl.reshape(n_steps, gchunk, 2, PANEL_W)
        return fm(y0), fm(pan), fm(off), fxl

    smem_vec = lambda: pl.BlockSpec(
        (1, 1, gchunk * g_obs), lambda ci, s: (s, 0, 0),
        memory_space=pltpu.SMEM)
    in_specs = [
        smem_vec(), smem_vec(), smem_vec(),
        pl.BlockSpec((1, gchunk, 2, PANEL_W), lambda ci, s: (s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pan, h, PANEL_W),
                     lambda ci, s: (s // steps_per_frame, ci, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gchunk, ps, PANEL_W),
                     lambda ci, s: (ci, s % steps_per_frame, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(ablate_kernel, gchunk=gchunk,
                             patch_radius=PR, g_obs=g_obs, **knobs)

    def call(x):
        yy, uvv, inf, aa, rcw = R._observation_geometry_pm(cam, t_wc, x)
        vv = (obs.T & inf)
        uvn = jnp.transpose(uvv, (2, 0, 1))
        y0a, pana, offa, fxla = prep(uvn, vv.T)
        out = pl.pallas_call(
            kern,
            grid=(c, n_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, gchunk, 6, PANEL_W),
                                   lambda ci, s: (ci, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, w * gpf, 6, PANEL_W),
                                           jnp.float32),
        )(y0a, pana, offa, fxla, panels.astype(jnp.float32),
          dpack.astype(jnp.float32))
        return out

    def chained(x0):
        def step(i, acc):
            return acc + jnp.sum(call(x0 + 1e-4 * i))
        return jax.lax.fori_loop(0, K, step, 0.0)

    jfn = jax.jit(chained)
    out = jfn(x_world)
    _ = float(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jfn(x_world))
        best = min(best, time.perf_counter() - t0)
    t = (best - RTT) / K
    groups_total = w * gpf
    print(f"{name:34s}: {t*1e3:7.3f} ms/iter  "
          f"({t/groups_total*1e9:6.1f} ns/group)")
    return t


import os
if os.environ.get("PB_ABL_FULLSET", "1") == "1":
    run_variant("full (baseline)")
    run_variant("gchunk=64", gchunk=64)
    run_variant("gchunk=128", gchunk=128)
    run_variant("no stats tail", do_stats=False)
    run_variant("no center matmul", do_center=False)
    run_variant("no subd", do_subd=False, do_center=False)
    run_variant("no combine", do_combine=False, do_center=False,
                do_subd=False, do_stats=False)
if os.environ.get("PB_ABL_SET2", "0") == "1":
    run_variant("static roll", roll_mode="static")
    run_variant("no roll", roll_mode="none")
    run_variant("no select", do_select=False)
    run_variant("static y0", static_y0=True)
    run_variant("static pan", static_pan=True)
    run_variant("static y0+pan", static_y0=True, static_pan=True)
    run_variant("loads only", roll_mode="none", do_select=False,
                do_combine=False, do_subd=False, do_center=False,
                do_stats=False)
    run_variant("static everything", static_y0=True, static_pan=True,
                roll_mode="static")
if os.environ.get("PB_ABL_SET4", "0") == "1":
    # Round-5: branch-free load-sharing probes (sorted-dispatch design B).
    run_variant("superwindow loads", load_mode="superwindow")
    run_variant("superwindow, loads only", load_mode="superwindow",
                roll_mode="none", do_select=False, do_combine=False,
                do_subd=False, do_center=False, do_stats=False)
if os.environ.get("PB_ABL_SET3", "0") == "1":
    run_variant("combine=hoist", combine_mode="hoist")
    run_variant("combine=lerp", combine_mode="lerp")
    run_variant("stats=matmul", stats_mode="matmul")
    run_variant("hoist+matmul", combine_mode="hoist", stats_mode="matmul")
    run_variant("lerp+matmul", combine_mode="lerp", stats_mode="matmul")
    run_variant("hoist+matmul g64", combine_mode="hoist",
                stats_mode="matmul", gchunk=64)
