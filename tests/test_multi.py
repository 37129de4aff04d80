"""Multi-sequence DP driver + elastic scheduler end-to-end (CPU)."""

import os
import pytest
import sys

import numpy as np

from synthetic import write_kitti_dataset, drift_poses
from photobundle_tpu import multi as multi_mod
from photobundle_tpu.io import trajectory as traj_mod


def _make_dataset(tmp_path, rng, seqs, n_frames=8):
    root = str(tmp_path / "kitti")
    gts = {}
    for s in seqs:
        gt, _ = write_kitti_dataset(root, s, rng, n_frames=n_frames,
                                    shape=(64, 96))
        gts[s] = gt
        vo = drift_poses(rng, gt, trans_sigma=0.003, rot_sigma=0.0008)
        with open(os.path.join(root, "poses", f"{s:02d}.txt"), "w") as f:
            for p in vo:
                f.write(" ".join(f"{v:.9f}" for v in p[:3].reshape(-1)) + "\n")
    return root, gts


def _write_cfg(tmp_path, root):
    cfgp = str(tmp_path / "multi.cfg")
    with open(cfgp, "w") as f:
        f.write(f"""dataDir = {root}
descriptor = Intensity
patchRadius = 1
slidingWindowSize = 4
maxNumPoints = 256
maxPointsPerFrame = 64
maxIterations = 10
pyramidLevels = 1
numDisparities = 32
minDepth = 0.5
maxDepth = 60.0
""")
    return cfgp


@pytest.mark.slow
def test_multi_sequence_inline(tmp_path, rng):
    root, gts = _make_dataset(tmp_path, rng, [0, 1])
    cfgp = _write_cfg(tmp_path, root)
    outdir = str(tmp_path / "out")
    rc = multi_mod.main(["--config", cfgp, "--sequences", "0,1",
                         "--output-dir", outdir, "--workers", "1"])
    assert rc == 0
    for s in (0, 1):
        out = os.path.join(outdir, f"{s:02d}.txt")
        assert os.path.exists(out)
        t = traj_mod.load_poses_kitti(out)
        assert len(t) == len(gts[s])
    # scheduler bookkeeping: every unit done
    sched = os.path.join(outdir, ".sched")
    assert len([f for f in os.listdir(sched) if f.endswith(".done")]) == 2


def test_multi_sequence_chunked_merge(tmp_path, rng):
    root, gts = _make_dataset(tmp_path, rng, [0], n_frames=12)
    cfgp = _write_cfg(tmp_path, root)
    outdir = str(tmp_path / "out")
    rc = multi_mod.main(["--config", cfgp, "--sequences", "0",
                         "--output-dir", outdir, "--workers", "1",
                         "--frames-per-unit", "6"])
    assert rc == 0
    merged = traj_mod.load_poses_kitti(os.path.join(outdir, "00.txt"))
    assert len(merged) == 12
    sched = os.path.join(outdir, ".sched")
    assert len([f for f in os.listdir(sched) if f.endswith(".done")]) == 2


@pytest.mark.slow
def test_multi_sequence_spawned_workers(tmp_path, rng):
    """Two spawned worker processes share the elastic scheduler and refine
    disjoint units (the real DP deployment shape)."""
    root, gts = _make_dataset(tmp_path, rng, [0, 1], n_frames=7)
    cfgp = _write_cfg(tmp_path, root)
    outdir = str(tmp_path / "out")
    rc = multi_mod.main(["--config", cfgp, "--sequences", "0,1",
                         "--output-dir", outdir, "--workers", "2"])
    assert rc == 0
    sched = os.path.join(outdir, ".sched")
    done = [f for f in os.listdir(sched) if f.endswith(".done")]
    assert len(done) == 2
    for s in (0, 1):
        t = traj_mod.load_poses_kitti(os.path.join(outdir, f"{s:02d}.txt"))
        assert len(t) == len(gts[s])
