"""Sampling-path comparison at the headline shape (BASELINE.md table):
ms per LM iteration for each (interpolation, backend) pair.

    python tools/bench_sampling.py
"""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from photobundle_tpu.core import lm
from __graft_entry__ import _make_problem

N, W, H, WI, R = 4096, 5, 370, 1226, 2
ITERS = 20


def run(label, backend, gradient_mode):
    cam, offsets, args = _make_problem(N, W, H, WI, R, seed=1)
    try:
        fn = jax.jit(lambda *a: lm.lm_solve(
            cam, *a[:2], *a[2:6], a[6], a[7], offsets,
            huber_delta=0.05, gradient_mode=gradient_mode, backend=backend,
            max_iterations=ITERS, function_tolerance=0.0,
            parameter_tolerance=0.0))
        out = fn(*args)
        _ = float(out[2].final_cost)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(out[2].final_cost)
            times.append(time.perf_counter() - t0)
        n = int(out[2].iterations)
        t_iter = (min(times) - 0.036) / n
        print(f"{label:40s}: {t_iter * 1e3:7.2f} ms/iter "
              f"({1.0 / t_iter:6.1f} it/s)")
    except Exception as e:
        print(f"{label:40s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    run("bilinear + pallas warp kernel", "pallas", "sampled")
    run("bilinear + xla gathers", "xla", "sampled")
    run("bicubic + pallas kernel (Ceres parity)", "pallas", "bicubic")
    run("bicubic + xla gathers", "xla", "bicubic")
