"""Component attribution of the 65k Pallas evaluation (verdict-4 task 1).

Times each stage of _evaluate_compressed_pallas in isolation with the
K-chained methodology (varied inputs, consume-all-outputs, RTT-subtracted).

    python tools/probe_eval65k.py [n_pts] [w] [K]
"""
import sys
import time

import jax
import jax.numpy as jnp

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
ts = [0.0] * 5
for i in range(5):
    t0 = time.perf_counter()
    _ = float(f(jnp.zeros(())))
    ts[i] = time.perf_counter() - t0
RTT = min(ts)
print(f"[N={N} W={W} K={K}; RTT {RTT*1e3:.1f} ms]")


def consume(tree):
    return sum(jnp.sum(a) for a in jax.tree.leaves(tree)
               if hasattr(a, "dtype") and
               jnp.issubdtype(a.dtype, jnp.floating))


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    t = (best - RTT) / K
    print(f"{name:36s}: {t*1e3:7.3f} ms/iter")
    return t


def chain(body):
    def run(x0):
        def step(i, acc):
            return acc + consume(body(x0 + 1e-4 * i))
        return jax.lax.fori_loop(0, K, step, 0.0)
    return run


# 1. geometry only
timeit("geometry (pm)", chain(
    lambda x: R._observation_geometry_pm(cam, t_wc, x)), x_world)

# shared precomputes for the kernel stages
n = N
_, _, _, n_pad = pw.packed_geometry(n, PR)
dpack = R._pack_descriptors(patch, PR, n_pad)


def kernel_only(x):
    y, uv, in_front, a, r_cw = R._observation_geometry_pm(cam, t_wc, x)
    valid = obs.T & in_front
    uv_nm = jnp.transpose(uv, (2, 0, 1))
    packed, _ = pw.warp_patches_grouped(panels, uv_nm, valid.T, PR,
                                        dpack=dpack, center=True,
                                        fuse_stats=True)
    return packed


# 2. geometry + kernel (incl wrapper index prep)
t_gk = timeit("geometry + kernel(fused)", chain(kernel_only), x_world)


def through_stats(x):
    packed = kernel_only(x)
    return R._grouped_stats(packed, n, n_pad, PR, "mean")


# 3. + grouped stats contraction
timeit("geometry + kernel + stats", chain(through_stats), x_world)


# 4. full evaluate_compressed
def full(x):
    return R.evaluate_compressed(cam, t_wc, x, patch, channels, grads,
                                 obs, offsets, 0.05, backend="pallas",
                                 ctx=ctx)


timeit("full evaluate_compressed", chain(full), x_world)

# 5. kernel with fuse_stats OFF (packed samples out) for kernel-cost compare
def kernel_nofuse(x):
    y, uv, in_front, a, r_cw = R._observation_geometry_pm(cam, t_wc, x)
    valid = obs.T & in_front
    uv_nm = jnp.transpose(uv, (2, 0, 1))
    packed, _ = pw.warp_patches_grouped(panels, uv_nm, valid.T, PR,
                                        dpack=dpack, center=True,
                                        fuse_stats=False)
    return packed


timeit("geometry + kernel(nofuse)", chain(kernel_nofuse), x_world)
