"""Per-phase breakdown of one LM iteration on TPU — where do the
milliseconds actually go? (Round-2 finding: the warp kernel is ~0.3 ms of
the ~2.5 ms iteration; the roofline work belongs in the XLA stats/Schur
phases, not the kernel.)

Methodology per the verify skill: K chained varied-input calls inside one
jit, host readback barrier, subtract one tunnel RTT.

    python tools/bench_lm_breakdown.py [n_pts] [w]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from photobundle_tpu.core import lm, schur
from photobundle_tpu.core.residuals import (evaluate_compressed,
                                            make_pallas_ctx)
from __graft_entry__ import _make_problem

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
W = int(sys.argv[2]) if len(sys.argv) > 2 else 5
H, WI = 370, 1226
R = 2
K = 30


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        times.append(time.perf_counter() - t0)
    t = (min(times) - 0.036) / K
    print(f"{name:34s}: {t * 1e3:7.3f} ms/iter")
    return t


def main():
    cam, offsets, args = _make_problem(N, W, H, WI, R, seed=1)
    t_wc, x_world, patch, channels, grads, obs, pv, frozen = args
    obs = obs & pv[:, None]
    ctx = make_pallas_ctx(channels, grads, patch, R)

    def eval_k(x0):
        def body(i, acc):
            res = evaluate_compressed(cam, t_wc, x0 + 1e-4 * i, patch,
                                      channels, grads, obs, offsets, 0.05,
                                      backend="pallas", ctx=ctx)
            return acc + res.cost
        return jax.lax.fori_loop(0, K, body, 0.0)

    timeit("evaluate_compressed (pallas)", eval_k, x_world)

    res0 = evaluate_compressed(cam, t_wc, x_world, patch, channels, grads,
                               obs, offsets, 0.05, backend="pallas", ctx=ctx)
    res0 = jax.tree.map(jnp.asarray, res0)

    def normal_eq_k(gtr0):
        def body(i, acc):
            eq = schur.build_normal_equations_compressed(
                res0._replace(gtr=gtr0 + 1e-6 * i))
            return acc + eq.bc[0, 0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    timeit("build_normal_equations", normal_eq_k, res0.gtr)

    eq0 = schur.build_normal_equations_compressed(res0)

    def schur_k(bc0):
        def body(i, acc):
            sys_parts = schur.reduce_camera_system(
                eq0._replace(bc=bc0 + 1e-6 * i), jnp.asarray(1e-4), pv,
                frozen)
            dc, dp = schur.solve_reduced(sys_parts)
            return acc + dc[0, 0] + dp[0, 0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    timeit("schur reduce+solve", schur_k, eq0.bc)

    def full_k(x0):
        def body(i, carry):
            t, x, s = lm.lm_solve(cam, t_wc, x0 + 1e-4 * i, patch, channels,
                                  grads, obs, pv, frozen, offsets,
                                  huber_delta=0.05, backend="pallas",
                                  max_iterations=1, function_tolerance=0.0,
                                  parameter_tolerance=0.0)
            return carry + s.final_cost
        return jax.lax.fori_loop(0, K, body, 0.0)

    t_full = timeit("full LM iteration (1-iter solve)", full_k, x_world)
    print(f"(full includes init eval + 1 body = 2 evals + eq + schur + "
          f"bookkeeping)")


if __name__ == "__main__":
    main()
