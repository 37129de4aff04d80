"""Sampling-path comparison at the headline shape (BASELINE.md table):
ms per LM iteration for each (interpolation, backend, patch grid) pair.

Methodology (round 5, shared with tools/bench_scaling.py): K chained
fixed-length 8-iteration solves inside ONE jit with a measured tunnel
RTT — the old form (one 20-iteration solve minus a hardcoded 36 ms)
printed -0.21 ms/iter for the fast path once the kernel got quicker
than the constant's error. Refuses to print non-physical slopes.

    python tools/bench_sampling.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from photobundle_tpu.core import lm, residuals as res_mod
from __graft_entry__ import _make_problem

N, W, H, WI, R = 4096, 5, 370, 1226, 2
M = 8          # iterations per chain link (fixed-length, fresh lambda)


def measure_rtt() -> float:
    f = jax.jit(lambda x: x + 1.0)
    x = np.zeros(())
    _ = float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(label, backend, gradient_mode, patch_warp=None, k=64):
    cam, offsets, args = _make_problem(N, W, H, WI, R, seed=1)
    t_wc, x_world, *rest = args
    rtt = measure_rtt()
    try:
        def solve(x0):
            return lm.lm_solve(
                cam, t_wc, x0, *rest, offsets,
                huber_delta=0.05, gradient_mode=gradient_mode,
                backend=backend, patch_warp=patch_warp, max_iterations=M,
                function_tolerance=0.0, parameter_tolerance=0.0)

        n_probe = int(jax.jit(solve)(x_world)[2].iterations)
        assert n_probe == M, f"probe ran {n_probe} != {M} iterations"

        for _ in range(3):  # lengthen the chain rather than print noise
            def chain(x0):
                def body(i, acc):
                    _, _, s = solve(x0 + 1e-4 * i)
                    return acc + s.final_cost
                return jax.lax.fori_loop(0, k, body, 0.0)

            fn = jax.jit(chain)
            _ = float(fn(x_world))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(x_world)
                _ = float(out)
                best = min(best, time.perf_counter() - t0)
            t_iter = (best - rtt) / (k * M)
            if t_iter > 0 and best > 3 * rtt:
                break
            k *= 4
        else:
            raise RuntimeError(
                f"non-physical slope: best={best * 1e3:.2f} ms vs "
                f"RTT={rtt * 1e3:.2f} ms over {k * M} iters")
        print(f"{label:44s}: {t_iter * 1e3:7.2f} ms/iter "
              f"({1.0 / t_iter:6.1f} it/s)")
    except Exception as e:
        print(f"{label:44s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    ref_slot = jnp.zeros((N,), jnp.int32)
    run("bilinear + pallas warp kernel", "pallas", "sampled")
    run("bilinear + xla gathers", "xla", "sampled", k=4)
    run("bicubic + pallas kernel (Ceres parity)", "pallas", "bicubic", k=16)
    run("bicubic + xla gathers", "xla", "bicubic", k=2)
    run("patchWarp=scale + pallas scaled kernel", "pallas", "sampled",
        patch_warp=("scale", ref_slot), k=32)
    run("patchWarp=scale + xla gathers", "xla", "sampled",
        patch_warp=("scale", ref_slot), k=4)
