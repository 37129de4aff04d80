"""patchWarp='scale' backend cost on TPU (round-5 verdict task 5).

Compares fixed 30-iteration LM solves at the headline KITTI-scale shape
(4096 pts x 5 frames x 5x5 patches, 370x1226) across:
  - pallas, fixed grid        (the production default — the 2x bar)
  - pallas, patchWarp='scale' (the round-5 scaled gather kernel)
  - xla,    patchWarp='scale' (the pre-round-5 only option)

Methodology: bench.py's (median of 5 timed solves, host readback
barrier). One JSON line per variant.
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_PTS, W, H, WI, R = 4096, 5, 370, 1226, 2
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from photobundle_tpu.core import lm
    from __graft_entry__ import _make_problem

    cam, offsets, args = _make_problem(N_PTS, W, H, WI, R, seed=1)
    ref_slot = jnp.zeros((N_PTS,), jnp.int32)   # all points ref frame 0
    on_tpu = jax.default_backend() not in ("cpu", "gpu")

    variants = [("pallas_fixed", "pallas" if on_tpu else "xla", None),
                ("pallas_warp_scale", "pallas" if on_tpu else "xla",
                 ("scale", ref_slot)),
                ("xla_warp_scale", "xla", ("scale", ref_slot))]
    base_ips = None
    for name, backend, pw in variants:
        fn = jax.jit(lambda *a, _b=backend, _pw=pw: lm.lm_solve(
            cam, *a[:2], *a[2:6], a[6], a[7], offsets,
            huber_delta=0.05, gradient_mode="sampled", backend=_b,
            patch_warp=_pw, max_iterations=ITERS,
            function_tolerance=0.0, parameter_tolerance=0.0))
        out = fn(*args)
        _ = float(out[2].final_cost)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(out[2].final_cost)
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        n_done = int(out[2].iterations)
        ips = n_done / med
        if base_ips is None:
            base_ips = ips
        print(json.dumps({
            "variant": name, "backend": backend,
            "lm_iterations_per_s": round(ips, 1),
            "vs_pallas_fixed": round(ips / base_ips, 3),
            "final_cost": float(out[2].final_cost),
        }))


if __name__ == "__main__":
    main()
