"""Fused normal-equation assembly kernel (Pallas/Mosaic).

TPU-native replacement for the hot half of Ceres' Schur eliminator setup
(reference: ceres::Problem normal-equation assembly inside Solve,
pb:src/photobundle.cc solver options; SURVEY.md 3.3 hot loop #3).

Round-2 left normal-equation assembly as ~60 fused XLA elementwise planes
over packed (W, N) point-minor tensors: correct layout, but 0.45 ms of the
0.55 ms LM iteration at 4096x5 — ~45x above its HBM floor (the planes are
tiny, so per-op issue overhead dominates, and XLA materializes plane
groups between fusions). This kernel performs the WHOLE per-point
assembly in one pass over the point axis: a grid over N-chunks, all
small indices (frame, gradient row, twist column) fully unrolled as
Python loops over lane vectors held in VMEM registers.

Per observation (factored statistics, core/residuals.py):

    H_obs = A^T gtg A + jp jp^T      b_obs = -(A^T gtr + rp jp)

partitioned into
    hpp (3, 3, N)     summed over frames in-kernel
    hpc (W, 3, 6, N)  written per frame
    bp  (3, N)        summed over frames in-kernel
    b6  (W, 6, N)     pose rhs BEFORE the point-axis reduction
    ga6 (W, 2, 6, N)  gtg @ A pose columns — feeds the (MXU) hcc einsum

The point-axis contractions (hcc, bc) stay OUTSIDE the kernel: they are
true matmul/reduce shapes the MXU/XLA already handle at speed
(core/schur.py). Everything is point-minor so every ref row is one packed
lane vector — no relayouts, no gathers, no masks (invalid observations
carry exact-zero statistics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest frame count the unrolled kernel builds for; beyond this the
# caller should use the XLA path (compile time and VMEM both scale with W,
# and large windows run frames-sharded with small W_local anyway).
MAX_UNROLL_W = 16


def _assemble_kernel(a_ref, gtg_ref, gtr_ref, jp_ref, rp_ref,
                     hpp_ref, hpc_ref, bp_ref, b6_ref, ga6_ref,
                     *, w: int, use_prior: bool):
    """One N-chunk: refs a (W,2,9,c), gtg (W,2,2,c), gtr (W,2,c),
    jp (W,9,c), rp (W,c) -> hpp (3,3,c), hpc (W,3,6,c), bp (3,c),
    b6 (W,6,c), ga6 (W,2,6,c)."""
    hpp = [[None] * 3 for _ in range(3)]
    bp = [None] * 3
    for f in range(w):
        a = [[a_ref[f, b, j, :] for j in range(9)] for b in range(2)]
        g00 = gtg_ref[f, 0, 0, :]
        g01 = gtg_ref[f, 0, 1, :]
        g10 = gtg_ref[f, 1, 0, :]
        g11 = gtg_ref[f, 1, 1, :]
        gr0 = gtr_ref[f, 0, :]
        gr1 = gtr_ref[f, 1, :]
        # ga[b][j] = sum_s gtg[b, s] * a[s][j]
        ga = [[g00 * a[0][j] + g01 * a[1][j] for j in range(9)],
              [g10 * a[0][j] + g11 * a[1][j] for j in range(9)]]
        if use_prior:
            jpf = [jp_ref[f, j, :] for j in range(9)]
            rpf = rp_ref[f, :]
        for b in range(2):
            for j in range(6):
                ga6_ref[f, b, j, :] = ga[b][j]
        # b_obs[j] = -(a[0][j] gr0 + a[1][j] gr1 [+ jp[j] rp])
        for j in range(6):
            v = a[0][j] * gr0 + a[1][j] * gr1
            if use_prior:
                v = v + jpf[j] * rpf
            b6_ref[f, j, :] = -v
        for p in range(3):
            v = a[0][6 + p] * gr0 + a[1][6 + p] * gr1
            if use_prior:
                v = v + jpf[6 + p] * rpf
            bp[p] = -v if bp[p] is None else bp[p] - v
        # hpc[f, p, c] = sum_b a[b][6+p] ga[b][c] [+ jp[6+p] jp[c]]
        for p in range(3):
            for cc in range(6):
                v = a[0][6 + p] * ga[0][cc] + a[1][6 + p] * ga[1][cc]
                if use_prior:
                    v = v + jpf[6 + p] * jpf[cc]
                hpc_ref[f, p, cc, :] = v
        # hpp[p, q] += sum_b a[b][6+p] ga[b][6+q] [+ jp[6+p] jp[6+q]]
        for p in range(3):
            for q in range(3):
                v = (a[0][6 + p] * ga[0][6 + q]
                     + a[1][6 + p] * ga[1][6 + q])
                if use_prior:
                    v = v + jpf[6 + p] * jpf[6 + q]
                hpp[p][q] = v if hpp[p][q] is None else hpp[p][q] + v
    for p in range(3):
        bp_ref[p, :] = bp[p]
        for q in range(3):
            hpp_ref[p, q, :] = hpp[p][q]


def _pick_chunk(n: int, w: int) -> int:
    """Largest 128-multiple chunk dividing n with a bounded VMEM block set
    (~1.3 kB/lane at W=5; scales with W)."""
    budget_lanes = max(128, int(6e6 / (1300 * max(1, w) / 5)))
    chunk = 128
    while chunk * 2 <= min(n, budget_lanes) and n % (chunk * 2) == 0:
        chunk *= 2
    return chunk if n % chunk == 0 else 0


@functools.partial(jax.jit, static_argnames=("use_prior", "interpret"))
def assemble_point_blocks(a, gtg, gtr, jp, rp, *, use_prior: bool = True,
                          interpret: bool = False):
    """Fused per-point assembly. Inputs are the point-minor factored
    statistics (residuals.CompressedResiduals fields); returns
    (hpp, hpc, bp, b6, ga6) as documented in the module docstring.

    Requires N % 128 == 0 and W <= MAX_UNROLL_W (callers fall back to the
    XLA path otherwise — core/schur.py keeps both in lockstep via the
    pinning tests)."""
    w, _, _, n = a.shape
    chunk = _pick_chunk(n, w)
    if chunk == 0 or w > MAX_UNROLL_W:
        raise ValueError(f"unsupported shape for fused assembly: W={w} N={n}")
    grid = (n // chunk,)

    def spec(*lead):
        ix = lambda c: (0,) * len(lead) + (c,)
        return pl.BlockSpec((*lead, chunk), ix, memory_space=pltpu.VMEM)

    kern = functools.partial(_assemble_kernel, w=w, use_prior=use_prior)
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec(w, 2, 9), spec(w, 2, 2), spec(w, 2), spec(w, 9),
                  spec(w)],
        out_specs=[spec(3, 3), spec(w, 3, 6), spec(3), spec(w, 6),
                   spec(w, 2, 6)],
        out_shape=[jax.ShapeDtypeStruct((3, 3, n), f32),
                   jax.ShapeDtypeStruct((w, 3, 6, n), f32),
                   jax.ShapeDtypeStruct((3, n), f32),
                   jax.ShapeDtypeStruct((w, 6, n), f32),
                   jax.ShapeDtypeStruct((w, 2, 6, n), f32)],
        interpret=interpret,
    )(a.astype(f32), gtg.astype(f32), gtr.astype(f32), jp.astype(f32),
      rp.astype(f32))
