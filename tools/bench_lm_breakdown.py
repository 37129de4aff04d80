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
# Chain enough iterations that the phase cost dwarfs the tunnel RTT —
# at 4096 x 5 the round-4 eval is ~0.2 ms so K = 30 (the round-3 value)
# left every phase BELOW one RTT and the subtraction printed noise.
K = int(sys.argv[3]) if len(sys.argv) > 3 else max(30, (1 << 22) // N)


HBM_GBPS = 820.0  # v5e


def measure_rtt() -> float:
    """Per-call host->device->host round trip (dispatch + tunnel), measured
    instead of the stale 36 ms constant."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    _ = float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


RTT = None  # set in main()


def tree_bytes(t) -> int:
    return sum(a.size * a.dtype.itemsize
               for a in jax.tree.leaves(t) if hasattr(a, "dtype"))


def consume(tree):
    """Fold EVERY output leaf into the timing accumulator. Consuming a
    single element (the round-3 tool) lets XLA dead-code-eliminate the
    rest of the phase — build_normal_equations measured NEGATIVE. The
    jnp.sum passes add one HBM read of the outputs (~45 MB at 65k, ~0.05
    ms) — a small, uniform overestimate instead of an unbounded
    underestimate."""
    return sum(jnp.sum(a) for a in jax.tree.leaves(tree)
               if hasattr(a, "dtype") and
               jnp.issubdtype(a.dtype, jnp.floating))


def timeit(name, fn, *args, touched_bytes=None):
    """touched_bytes: HBM bytes one call reads+writes (roofline floor at
    HBM_GBPS). The VERDICT-4 attribution question is whether the large-N
    slowdown tracks this floor (HBM-bound: fine) or diverges from it
    (fusion/layout regression: fixable)."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        times.append(time.perf_counter() - t0)
    t = (min(times) - RTT) / K
    floor = ""
    if touched_bytes is not None:
        floor_ms = touched_bytes / (HBM_GBPS * 1e9) * 1e3
        floor = (f"  [mem floor {floor_ms:6.3f} ms @ "
                 f"{touched_bytes / 1e6:.1f} MB]")
    print(f"{name:34s}: {t * 1e3:7.3f} ms/iter{floor}")
    return t


def main():
    global RTT
    RTT = measure_rtt()
    print(f"[K={K} chained iters; measured RTT {RTT * 1e3:.1f} ms]")
    cam, offsets, args = _make_problem(N, W, H, WI, R, seed=1)
    t_wc, x_world, patch, channels, grads, obs, pv, frozen = args
    obs = obs & pv[:, None]
    ctx = make_pallas_ctx(channels, grads, patch, R)

    def eval_k(x0):
        def body(i, acc):
            res = evaluate_compressed(cam, t_wc, x0 + 1e-4 * i, patch,
                                      channels, grads, obs, offsets, 0.05,
                                      backend="pallas", ctx=ctx)
            return acc + consume(res)
        return jax.lax.fori_loop(0, K, body, 0.0)

    res0 = evaluate_compressed(cam, t_wc, x_world, patch, channels, grads,
                               obs, offsets, 0.05, backend="pallas", ctx=ctx)
    res0 = jax.tree.map(jnp.asarray, res0)

    n_obs = N * W * offsets.shape[0]
    eval_bytes = tree_bytes(ctx) + tree_bytes((patch, obs)) + tree_bytes(res0)
    timeit("evaluate_compressed (pallas)", eval_k, x_world,
           touched_bytes=eval_bytes)

    import os
    asm_backend = ("pallas"
                   if os.environ.get("PB_FUSED_ASSEMBLY", "0") == "1"
                   else "xla")
    if asm_backend != "xla":
        print(f"[assembly backend: {asm_backend} (PB_FUSED_ASSEMBLY)]")

    def normal_eq_k(gtr0):
        def body(i, acc):
            eq = schur.build_normal_equations_compressed(
                res0._replace(gtr=gtr0 + 1e-6 * i), backend=asm_backend)
            return acc + consume(eq)
        return jax.lax.fori_loop(0, K, body, 0.0)

    eq0 = schur.build_normal_equations_compressed(res0)
    timeit("build_normal_equations", normal_eq_k, res0.gtr,
           touched_bytes=tree_bytes(res0) + tree_bytes(eq0))

    def schur_k(bc0):
        def body(i, acc):
            sys_parts = schur.reduce_camera_system(
                eq0._replace(bc=bc0 + 1e-6 * i), jnp.asarray(1e-4), pv,
                frozen)
            dc, dp = schur.solve_reduced(sys_parts)
            return acc + consume((dc, dp))
        return jax.lax.fori_loop(0, K, body, 0.0)

    timeit("schur reduce+solve", schur_k, eq0.bc,
           touched_bytes=tree_bytes(eq0))

    def full_k(x0):
        def body(i, carry):
            t, x, s = lm.lm_solve(cam, t_wc, x0 + 1e-4 * i, patch, channels,
                                  grads, obs, pv, frozen, offsets,
                                  huber_delta=0.05, backend="pallas",
                                  max_iterations=1, function_tolerance=0.0,
                                  parameter_tolerance=0.0)
            return carry + s.final_cost
        return jax.lax.fori_loop(0, K, body, 0.0)

    full_bytes = 2 * eval_bytes + tree_bytes(res0) + 2 * tree_bytes(eq0)
    t_full = timeit("full LM iteration (1-iter solve)", full_k, x_world,
                    touched_bytes=full_bytes)
    print(f"(full includes init eval + 1 body = 2 evals + eq + schur + "
          f"bookkeeping)")
    print(f"obs = {n_obs / 1e6:.2f} M; full-iter throughput "
          f"{n_obs / t_full / 1e6:7.1f} M obs/s "
          f"(mem-floor {n_obs / (full_bytes / (HBM_GBPS * 1e9)) / 1e6:.1f})")


if __name__ == "__main__":
    main()
