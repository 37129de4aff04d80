import time, jax, numpy as np
from photobundle_tpu.core import lm
from __graft_entry__ import _make_problem

N_PTS, W, H, WI = 4096, 5, 370, 1226
def time_lm(backend, iters=30):
    cam, offsets, args = _make_problem(N_PTS, W, H, WI, 2, seed=1)
    fn = jax.jit(lambda *a: lm.lm_solve(cam, *a[:2], *a[2:6], a[6], a[7], offsets,
        huber_delta=0.05, gradient_mode="sampled", backend=backend,
        max_iterations=iters, function_tolerance=0.0, parameter_tolerance=0.0))
    out = fn(*args); fc = float(out[2].final_cost)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); fc = float(out[2].final_cost)
        best = min(best, time.perf_counter()-t0)
    n = int(out[2].iterations)
    print(f"backend={backend}: {best/n*1e3:7.2f} ms/iter cost -> {fc:.6f} acc={int(out[2].accepted_steps)}")

time_lm("pallas")
