"""Sorted-dispatch A/B: the round-4 verdict's last known single-chip 2x.

Measures evaluate_compressed (pallas, grouped-stats path) with and without
the point-sorted-by-panel dispatch (core/residuals.sorted_dispatch_order +
the sort_reuse kernel variant), K-chained inside one jit with a host
readback barrier (the bench_lm_breakdown methodology — out-of-loop timings
are invalidated by hoisting, two-point slopes by tunnel RTT noise).

Also reports the per-solve sort cost (argsort + index build) amortized per
iteration, and the measured group coherence (distinct (panel, y0) windows
per lane-packed group — the theoretical load-elision factor).

    python tools/bench_sorted_dispatch.py [n_pts ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from photobundle_tpu.core import residuals as res_mod
from photobundle_tpu.core.residuals import (evaluate_compressed,
                                            make_pallas_ctx)
from photobundle_tpu.geometry import se3
from photobundle_tpu.geometry import camera as cam_mod
from photobundle_tpu.ops import patch_warp as pw_mod
from __graft_entry__ import _make_problem

H, WI = 370, 1226
R = 2
W = 5


def measure_rtt() -> float:
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    _ = float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def consume(tree):
    return sum(jnp.sum(a) for a in jax.tree.leaves(tree)
               if hasattr(a, "dtype") and
               jnp.issubdtype(a.dtype, jnp.floating))


def run(n):
    k = max(30, (1 << 22) // n)
    rtt = measure_rtt()
    cam, offsets, args = _make_problem(n, W, H, WI, R, seed=1)
    t_wc, x_world, patch, channels, grads, obs, pv, frozen = args
    obs = obs & pv[:, None]
    ctx = make_pallas_ctx(channels, grads, patch, R)

    # The dispatch key lm_solve would build (middle frame of the window).
    def build_order(x0):
        panels0 = ctx[1]
        n_pan, img_h = panels0.shape[2], panels0.shape[3]
        mid = W // 2
        t_cw = se3.se3_inverse(t_wc[mid])
        y_mid = x0 @ t_cw[:3, :3].T + t_cw[:3, 3]
        uv_mid, in_front = cam_mod.project(cam, y_mid)
        y0k, pank, _ = pw_mod.dispatch_geometry(
            uv_mid[:, 0], uv_mid[:, 1], img_h, n_pan, R)
        key = jnp.where(in_front & obs[:, mid],
                        pank * img_h + y0k, n_pan * img_h)
        return key, res_mod.sorted_dispatch_order(
            key.astype(jnp.int32), n, R)

    key, order = jax.jit(build_order)(x_world)
    order = jax.tree.map(jnp.asarray, order)

    # Group coherence: distinct windows per group along the rank order.
    g_obs, _, gpf, n_pad = pw_mod.packed_geometry(n, R)
    keys_sorted = np.sort(np.asarray(key))
    grp = keys_sorted[: (n // g_obs) * g_obs].reshape(-1, g_obs)
    distinct = 1 + (np.diff(grp, axis=1) != 0).sum(axis=1)
    print(f"[N={n}] coherence: {distinct.mean():.2f} distinct windows per "
          f"{g_obs}-obs group (ideal elision {g_obs / distinct.mean():.2f}x)")

    def eval_k(x0, po):
        def body(i, acc):
            res = evaluate_compressed(cam, t_wc, x0 + 1e-4 * i, patch,
                                      channels, grads, obs, offsets, 0.05,
                                      backend="pallas", ctx=ctx,
                                      point_order=po)
            return acc + consume(res)
        return jax.lax.fori_loop(0, k, body, 0.0)

    results = {}
    for name, po in (("unsorted", None), ("sorted", order)):
        jfn = jax.jit(functools.partial(eval_k))
        out = jfn(x_world, po)
        _ = float(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(x_world, po)
            _ = float(out)
            times.append(time.perf_counter() - t0)
        t = (min(times) - rtt) / k
        if t <= 0:
            raise RuntimeError(f"non-physical eval slope ({t * 1e3:.3f} ms)"
                               " — increase K")
        results[name] = t
        print(f"[N={n}] eval ({name:8s}): {t * 1e3:7.3f} ms/iter "
              f"({n * W * offsets.shape[0] / t / 1e6:7.1f} M obs/s)")

    # Sort/index-build cost (once per solve; amortize over ~15 LM iters).
    jb = jax.jit(build_order)
    _ = jax.block_until_ready(jb(x_world))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = jax.block_until_ready(jb(x_world + 1e-4))
        ts.append(time.perf_counter() - t0)
    t_sort = min(ts) - rtt
    speed = results["unsorted"] / results["sorted"]
    print(f"[N={n}] sort+index build: {t_sort * 1e3:.3f} ms/solve "
          f"({t_sort / 15 * 1e3:.3f} ms/iter at 15 iters); "
          f"eval speedup {speed:.2f}x")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]
    for n in sizes:
        run(n)
