"""Worker process for tests/test_multiprocess.py — runs the points-sharded
LM solve (and optionally the full engine) under `jax.distributed` across N
OS processes, writing per-rank results to disk for the test to compare.

Usage:  python tests/mp_worker.py <pid> <n_proc> <port> <outdir> <mode>
        mode: 'solve' (lm-level) | 'engine' (full-engine e2e)

SURVEY.md section 4 "distributed without a cluster": each process owns 2
virtual CPU devices; the global mesh spans 4; psum rides the (local) DCN
path, exactly the multi-host layout of a real pod deployment.
"""
import os
import sys

pid, n_proc, port, outdir, mode = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4], sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n_proc, process_id=pid)

import functools

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from photobundle_tpu.core import lm
from photobundle_tpu.parallel import make_mesh
from test_residuals import setup_problem


def replicate_to_host(mesh, arr):
    """Reshard a (possibly points-sharded) global array to fully-replicated
    and pull it to the host — every rank gets the identical full value."""
    rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(arr)
    return np.asarray(rep)


def run_solve():
    rng = np.random.default_rng(0)
    cam, t_wc, x, patch, ch, g, obs, off = setup_problem(rng, n_pts=32, w=3)
    mesh = make_mesh(points=n_proc * 2)

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
    np.savez(os.path.join(outdir, f"rank{pid}.npz"),
             t_wc=np.asarray(t_out),
             x_world=replicate_to_host(mesh, x_out),
             initial_cost=np.asarray(stats.initial_cost),
             final_cost=np.asarray(stats.final_cost),
             accepted=np.asarray(stats.accepted_steps))


def run_engine():
    from synthetic import make_sequence, perturb_poses
    from photobundle_tpu.config import PBAConfig
    from photobundle_tpu.core.engine import PhotometricBundleAdjustment

    rng = np.random.default_rng(3)
    cam, images, depths, poses_gt = make_sequence(rng, n_frames=5,
                                                  shape=(48, 64))
    noisy = perturb_poses(rng, poses_gt, trans_sigma=0.01, rot_sigma=0.002)
    cfg = PBAConfig(maxNumPoints=256, maxPointsPerFrame=64,
                    slidingWindowSize=3, maxIterations=8,
                    meshPoints=n_proc * 2, depthPriorWeight=0.1)
    pba = PhotometricBundleAdjustment(cam, (48, 64), cfg)
    poses = []
    for i in range(5):
        r = pba.add_frame(images[i], depths[i], noisy[i], frame_id=i)
        if r is not None:
            poses.append(r.poses)
    np.savez(os.path.join(outdir, f"rank{pid}.npz"),
             poses=np.concatenate(poses, axis=0))


def run_engine_frames():
    """FULL engine on a ('frames'=2, 'points'=2) mesh SPANNING the two OS
    processes — the window ring's image leaves live sharded across process
    boundaries (host-side frame routing: every rank feeds identical
    replicated inputs; the pinned ingest out_shardings route each slot to
    its owning process; cross-process movement is XLA collective traffic)."""
    from synthetic import make_sequence, perturb_poses
    from photobundle_tpu.config import PBAConfig
    from photobundle_tpu.core.engine import PhotometricBundleAdjustment

    rng = np.random.default_rng(3)
    cam, images, depths, poses_gt = make_sequence(rng, n_frames=6,
                                                  shape=(48, 64))
    noisy = perturb_poses(rng, poses_gt, trans_sigma=0.01, rot_sigma=0.002)
    cfg = PBAConfig(maxNumPoints=256, maxPointsPerFrame=64,
                    slidingWindowSize=4, maxIterations=8,
                    meshFrames=2, meshPoints=n_proc,
                    depthPriorWeight=0.1)
    pba = PhotometricBundleAdjustment(cam, (48, 64), cfg)
    assert pba.window.channels.sharding.spec[0] == "frames"
    poses = []
    for i in range(6):
        r = pba.add_frame(images[i], depths[i], noisy[i], frame_id=i)
        if r is not None:
            poses.append(r.poses)
    np.savez(os.path.join(outdir, f"rank{pid}.npz"),
             poses=np.concatenate(poses, axis=0))


if mode == "solve":
    run_solve()
elif mode == "engine_frames":
    run_engine_frames()
else:
    run_engine()
print(f"RANK {pid} DONE", flush=True)
