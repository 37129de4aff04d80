"""Scaling study: LM iterations/s vs problem size (window x points).

The reference caps window=5 and a few thousand points because its reduced
camera system and per-point loops are CPU-serial (SURVEY.md 5.7); this
framework's design target is 50+ keyframes / 100k+ points. Prints one JSON
line per configuration.
"""
import json
import time

import jax
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from photobundle_tpu.core import lm
from __graft_entry__ import _make_problem

H, WI = 370, 1226


def measure_rtt() -> float:
    """Per-call host->device->host round trip (dispatch + tunnel)."""
    f = jax.jit(lambda x: x + 1.0)
    x = np.zeros(())
    _ = float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(n_pts, w, iters=None):
    # Enough while_loop iterations inside ONE jit that the per-iteration
    # slope dwarfs the tunnel RTT (round 4: a 0.55 ms iteration over a
    # fixed 20-iter chain went NEGATIVE under the old hardcoded 36 ms
    # subtraction).
    if iters is None:
        iters = max(30, min(3000, (1 << 26) // (n_pts * w)))
    rtt = measure_rtt()
    cam, offsets, args = _make_problem(n_pts, w, H, WI, 2, seed=1)
    backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    fn = jax.jit(lambda *a: lm.lm_solve(
        cam, *a[:2], *a[2:6], a[6], a[7], offsets,
        huber_delta=0.05, gradient_mode="sampled", backend=backend,
        max_iterations=iters, function_tolerance=0.0, parameter_tolerance=0.0))
    out = fn(*args)
    _ = float(out[2].final_cost)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out[2].final_cost)
        best = min(best, time.perf_counter() - t0)
    n = int(out[2].iterations)
    t_iter = (best - rtt) / n
    # Refuse to emit non-physical numbers (round-4 verdict: the two-point
    # predecessor of this tool committed -0.083 ms/iter into a published
    # log). A negative/zero slope means the chained run did not dwarf the
    # RTT — a methodology failure, never a measurement.
    if not (t_iter > 0) or best < 3 * rtt:
        raise RuntimeError(
            f"non-physical slope at {n_pts}x{w}: best={best * 1e3:.2f} ms "
            f"vs RTT={rtt * 1e3:.2f} ms over {n} iters — increase `iters`")
    print(json.dumps({
        "points": n_pts, "window": w, "observations": n_pts * w,
        "ms_per_lm_iteration": round(t_iter * 1e3, 3),
        "lm_iterations_per_s": round(1.0 / t_iter, 1),
        "obs_per_s_millions": round(n_pts * w / t_iter / 1e6, 1),
    }))


if __name__ == "__main__":
    for n_pts, w in [(4096, 5), (16384, 5), (65536, 5),
                     (4096, 16), (16384, 16), (32768, 32)]:
        run(n_pts, w)
