"""Multi-process (multi-host-style) sharded solve on local CPU processes.

SURVEY.md section 4: JAX's standard substitute for a pod — N OS processes,
each owning CPU devices, joined by jax.distributed.initialize, running the
SAME points-sharded engine solve over a global mesh. Exercises the
process-spanning collective path (psum over DCN in a real deployment).

    python tools/demo_multiprocess.py        # spawns 2 worker processes
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
PORT = 9357


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=N_PROC, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from photobundle_tpu.core import lm
    from photobundle_tpu.parallel import make_mesh
    from synthetic import make_sequence
    from test_residuals import setup_problem

    rng = np.random.default_rng(0)
    cam, t_wc, x, patch, ch, g, obs, off = setup_problem(rng, n_pts=32, w=3)
    mesh = make_mesh(points=N_PROC * 2)   # 4 global devices, 2 per process

    def put(a, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(a))

    pt, rep = P("points"), P()
    frozen = jnp.asarray([True, False, False])
    pv = np.ones((32,), bool)
    args_global = (
        put(t_wc, rep), put(np.asarray(x) + 0.01, pt), put(patch, pt),
        put(ch, rep), put(g, rep), put(obs, pt), put(pv, pt),
        put(frozen, rep))

    import functools
    from jax.sharding import PartitionSpec

    solve = jax.jit(jax.shard_map(
        functools.partial(
            lm.lm_solve, cam, offsets=off, huber_delta=0.05,
            max_iterations=6,
            reduce_fn=lambda v: jax.lax.psum(v, "points")),
        mesh=mesh,
        in_specs=(rep, pt, pt, rep, rep, pt, pt, rep),
        out_specs=(rep, pt, lm.LMStats(*([rep] * len(lm.LMStats._fields)))),
        check_vma=False,
    ))
    t_out, x_out, stats = solve(*args_global)
    ic = float(stats.initial_cost.addressable_data(0).item())
    fc = float(stats.final_cost.addressable_data(0).item())
    print(f"[proc {pid}] cost {ic:.6f} -> {fc:.6f} "
          f"acc={int(stats.accepted_steps.addressable_data(0).item())}",
          flush=True)
    assert fc <= ic + 1e-9
    if pid == 0:
        print("MULTIPROCESS OK", flush=True)


def main() -> int:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return 0
    procs = [subprocess.Popen([sys.executable, __file__, str(k)])
             for k in range(N_PROC)]
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=600)
    return rc


if __name__ == "__main__":
    sys.exit(main())
