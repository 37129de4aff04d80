"""Benchmark: BA iterations/s on a KITTI-scale sliding-window problem.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Problem (BASELINE.json config-2 scale): 4096 points x 5-frame window x
5x5 patches at full KITTI resolution (370 x 1226), LM forced to run a fixed
iteration count (tolerances zeroed). The baseline divisor is the SAME solver
on the host CPU backend — the reference publishes no numbers
("published": {}), so per BASELINE.md the CPU measurement of the identical
workload is the baseline our >=10x target is judged against.
"""

import json
import sys
import time

import numpy as np


N_PTS = 4096
W = 5
H, WI = 370, 1226
PATCH_RADIUS = 2
M_ITERS = 8     # iterations per chain link (fixed-length, fresh lambda)
K_TPU = 32      # chain links per timed call (TPU)
K_CPU = 2       # CPU pass is slow; shorter chain, same link length


def build(platform_device):
    import jax
    import jax.numpy as jnp

    from photobundle_tpu.core import lm
    from __graft_entry__ import _make_problem

    cam, offsets, args = _make_problem(N_PTS, W, H, WI, PATCH_RADIUS, seed=1)

    backend = "pallas" if platform_device.platform not in ("cpu", "gpu") else "xla"

    def solve(x0, rest):
        return lm.lm_solve(
            cam, rest[0], x0, *rest[1:5], rest[5], rest[6], offsets,
            huber_delta=0.05, gradient_mode="sampled", backend=backend,
            max_iterations=M_ITERS,
            function_tolerance=0.0, parameter_tolerance=0.0,
        )

    args = jax.device_put(args, platform_device)
    return solve, args


def _measure_rtt(device) -> float:
    """Per-call host->device->host round trip (dispatch + tunnel)."""
    import jax

    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros(()), device)
    _ = float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_solve(device, k, repeats=5):
    """MEDIAN of `repeats` timed K-chained runs (round-2 + round-5
    methodology).

    Round 2 pinned the median (the round-1 min-of-3 TPU / single-run CPU
    mix swung the reported speedup 13-28x across documents). Round 5
    moved the body to K chained fixed-length 8-iteration solves inside
    ONE jit (fresh lambda and a perturbed start per link) with the tunnel
    RTT measured and subtracted: the old single 30-iteration solve spent
    ~27 of its ~37 ms in ONE tunnel round-trip, so the published number
    measured the tunnel, not the device (833 "it/s" vs the 3068 it/s
    marginal rate — BASELINE.md scaling section). CPU and TPU run the
    IDENTICAL chain, so vs_baseline compares device compute to device
    compute. Refuses to emit a number when the chain fails to dwarf the
    RTT (round-4 verdict: bench tools must not print non-physical
    values)."""
    import statistics

    import jax

    solve, args = build(device)
    t_wc, x_world, *rest_tail = args
    rest = (t_wc, *rest_tail)

    # Probe: the chain denominator assumes every link runs all M_ITERS
    # (with tolerances zeroed only the ~97-iteration lambda-overflow exit
    # can end a solve early; 8 fresh-lambda iterations never reach it).
    n_probe = int(jax.jit(solve)(x_world, rest)[2].iterations)
    assert n_probe == M_ITERS, f"probe ran {n_probe} != {M_ITERS} iters"

    def chain(x0):
        def body(i, acc):
            _, _, s = solve(x0 + 1e-4 * i, rest)
            return acc + s.final_cost
        return jax.lax.fori_loop(0, k, body, 0.0)

    rtt = _measure_rtt(device)
    fn = jax.jit(chain)
    _ = float(fn(x_world))   # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(x_world)
        # A host readback of the result is the only reliable completion
        # barrier on tunneled backends (block_until_ready can return before
        # remote execution finishes).
        _ = float(out)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    n_done = k * M_ITERS
    if med - rtt <= 0 or med < 3 * rtt:
        raise RuntimeError(
            f"non-physical: chain {med * 1e3:.1f} ms vs RTT "
            f"{rtt * 1e3:.1f} ms — lengthen the chain")
    return n_done / (med - rtt), n_done, med


def _devices_with_watchdog(timeout_s=240.0):
    """Backend bring-up with a timeout. The TPU backend here is a remote
    chip behind a tunnel; when the tunnel is down, jax.devices() blocks
    forever inside PJRT client init — which would hang the whole benchmark
    harness. Probe in a daemon thread and give up after `timeout_s`."""
    import threading

    result = {}

    def probe():
        # The package import applies JAX_PLATFORMS from the environment
        # over any boot-time jax_platforms config override, so
        # `JAX_PLATFORMS=cpu python bench.py` really probes CPU.
        import photobundle_tpu  # noqa: F401
        import jax

        result["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return result.get("devices")


def _cpu_probe_subprocess(timeout_s=1500.0):
    """CPU baseline in a fresh process with JAX_PLATFORMS=cpu.

    Under the axon environment the in-process route
    (`jax.local_devices(backend="cpu")`) fails — once JAX_PLATFORMS pins the
    accelerator platform, the CPU client is never registered ("Unknown
    backend cpu"). A subprocess with the env var overridden is the only
    reliable way to measure the identical solver on the host CPU."""
    import os
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single-device CPU, no virtual mesh
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--cpu-probe"], env=env,
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("CPU_IPS "):
            return float(line.split()[1])
    # Print the FULL stderr tail (advisor round 3): a misrouted probe that
    # timed the TPU as "CPU" asserts with a platform message that a 200-char
    # truncation can swallow — the failure must be diagnosable from the log.
    tail = "\n".join(out.stderr.strip().splitlines()[-15:])
    print(f"# cpu probe subprocess failed:\n{tail}", file=sys.stderr)
    return None


def main():
    if "--cpu-probe" in sys.argv:
        # Import the package FIRST: it re-applies JAX_PLATFORMS from the
        # environment over the axon sitecustomize's jax_platforms config
        # override (which otherwise silently wins and this probe would
        # time the TPU, not the CPU).
        import photobundle_tpu  # noqa: F401
        import jax

        dev = jax.devices()[0]
        assert dev.platform == "cpu", f"cpu probe got {dev.platform}"
        cpu_ips, _, _ = time_solve(dev, K_CPU, repeats=3)
        print(f"CPU_IPS {cpu_ips}")
        return

    devices = _devices_with_watchdog()
    if devices is None:
        print(json.dumps({
            "metric": "BA_iterations_per_s_kitti_scale_window",
            "value": None,   # no measurement — a numeric 0.0 would be
                             # ingested as a real (regressed) data point
            "unit": "LM iterations/s (4096 pts x 5 frames x 5x5 patches, 370x1226)",
            "vs_baseline": None,
            "error": "accelerator backend init timed out (TPU tunnel down?) "
                     "— no measurement taken",
        }))
        import os

        os._exit(1)
    import jax

    accel = devices[0]
    tpu_ips, tpu_n, tpu_t = time_solve(accel, K_TPU, repeats=5)

    vs_baseline = None
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        cpu_ips, _, _ = time_solve(cpu, K_CPU, repeats=3)
        vs_baseline = tpu_ips / cpu_ips
    except Exception:  # no in-process CPU backend — probe in a subprocess
        cpu_ips = _cpu_probe_subprocess()
        if cpu_ips:
            vs_baseline = tpu_ips / cpu_ips
        else:
            print("# cpu baseline unavailable — reporting TPU-only",
                  file=sys.stderr)

    record = {
        "metric": "BA_iterations_per_s_kitti_scale_window",
        "value": round(tpu_ips, 3),
        "unit": "LM iterations/s (4096 pts x 5 frames x 5x5 patches, 370x1226)",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
