"""Micro-benchmark of the warp-kernel store variants on real TPU.

Timing per the verify-skill methodology: K chained varied-input evaluations
inside ONE jit (lax.fori_loop), host readback as the completion barrier, so
tunnel RTT amortizes to nothing. Prints ns/observation per variant.

    python tools/bench_warp_kernel.py [n_pts] [w]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from photobundle_tpu.ops import patch_warp as pw

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
W = int(sys.argv[2]) if len(sys.argv) > 2 else 5
H, WI = 370, 1226
R = 2
K = 50


def main():
    rng = np.random.default_rng(0)
    imgs = rng.random((W, 1, H, WI), np.float32)
    grads = rng.random((W, 1, H, WI, 2), np.float32)
    panels = pw.build_interleaved_panels(jnp.asarray(imgs), jnp.asarray(grads), R)
    uv0 = jnp.asarray(
        rng.uniform([8, 8], [WI - 8, H - 8], size=(N, W, 2)).astype(np.float32))
    valid = jnp.ones((N, W), bool)

    for variant in ("packed", "rows", "block", "raw"):
        def chained(u0):
            def body(i, acc):
                s, gx, gy = pw.warp_patches(
                    panels, u0 + 0.013 * i, valid, R, variant=variant)
                return acc + s[0, 0, 0, 0] + gx[0, 0, 0, 0]
            return jax.lax.fori_loop(0, K, body, 0.0)

        try:
            fn = jax.jit(chained)
            _ = float(fn(uv0))   # compile + warmup
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(fn(uv0))
                times.append(time.perf_counter() - t0)
            t = (min(times) - 0.036) / K   # subtract one tunnel RTT
            print(f"{variant:6s}: {t * 1e3:7.3f} ms/eval  "
                  f"{t / (N * W) * 1e9:6.1f} ns/obs")
        except Exception as e:
            print(f"{variant:6s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
