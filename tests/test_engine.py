"""End-to-end engine test: synthetic sequence, perturbed VO trajectory in,
refined trajectory out — ATE must drop (the golden test of SURVEY.md 4)."""

import os

import numpy as np
import pytest

from photobundle_tpu.config import PBAConfig
from photobundle_tpu.core.engine import PhotometricBundleAdjustment
from photobundle_tpu.io import trajectory as traj_mod

from synthetic import make_sequence, perturb_poses


def small_cfg(**kw):
    base = dict(
        maxNumPoints=512,
        maxPointsPerFrame=128,
        slidingWindowSize=5,
        patchRadius=2,
        maxIterations=30,
        minSaliency=0.005,
        minScore=0.6,
        numFixedPoses=2,
        maxDepth=30.0,
        nonMaxSuppRadius=2,
        maskBlockRadius=2,
        # The synthetic scene has weak parallax (0.1 m/frame at 4-16 m depth)
        # and exact GT depth seeds, so a strong prior is right here; KITTI
        # configs with noisy stereo + strong parallax use the small default.
        depthPriorWeight=1.0,
    )
    base.update(kw)
    return PBAConfig(**base)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    cam, images, depths, poses = make_sequence(rng, n_frames=10, shape=(96, 144))
    return cam, images, depths, poses


def run_engine(scene, cfg, init_poses):
    cam, images, depths, poses_gt = scene
    pba = PhotometricBundleAdjustment(cam, images[0].shape, cfg)
    refined = traj_mod.Trajectory(init_poses.copy().astype(np.float64))
    results = []
    for i, (img, depth) in enumerate(zip(images, depths)):
        res = pba.add_frame(img, depth, init_poses[i])
        if res is not None:
            refined.update(res.frame_ids, res.poses)
            results.append(res)
    return refined, results, pba


def test_engine_tracks_and_selects(scene):
    cam, images, depths, poses_gt = scene
    cfg = small_cfg()
    pba = PhotometricBundleAdjustment(cam, images[0].shape, cfg)
    for i in range(3):
        pba.add_frame(images[i], depths[i], poses_gt[i])
    assert pba.num_active_points > 50
    obs = np.asarray(pba.points.obs)
    active = np.asarray(pba.points.active)
    # Some points must have been re-observed (tracked) across frames.
    assert (obs[active].sum(1) >= 2).sum() > 20


def test_engine_improves_jittered_trajectory(scene):
    """iid per-frame pose jitter in, substantially reduced ATE out."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(11)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    gt_traj = traj_mod.Trajectory(poses_gt.astype(np.float64))
    init_traj = traj_mod.Trajectory(init.astype(np.float64))

    refined, results, _ = run_engine(scene, small_cfg(), init)
    assert len(results) >= 5, "window never filled or solved"
    for r in results:
        assert r.final_cost <= r.initial_cost + 1e-9

    ate_init = traj_mod.ate_rmse(init_traj, gt_traj, align=False)
    ate_ref = traj_mod.ate_rmse(refined, gt_traj, align=False)
    assert ate_ref < 0.65 * ate_init, (ate_init, ate_ref)


def test_engine_improves_drifting_trajectory(scene):
    """VO-style random-walk drift in, reduced ATE out (the realistic case —
    the depth prior must keep the window chain from amplifying scale)."""
    from synthetic import drift_poses

    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(17)
    init = drift_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                       keep_first=2)
    gt_traj = traj_mod.Trajectory(poses_gt.astype(np.float64))
    init_traj = traj_mod.Trajectory(init.astype(np.float64))

    refined, results, _ = run_engine(scene, small_cfg(), init)
    ate_init = traj_mod.ate_rmse(init_traj, gt_traj, align=False)
    ate_ref = traj_mod.ate_rmse(refined, gt_traj, align=False)
    assert ate_ref < 0.8 * ate_init, (ate_init, ate_ref)


@pytest.mark.slow
def test_engine_coarse_to_fine_extends_basin(scene):
    """cfg.coarseToFine (SURVEY.md 3.4, BASELINE config 2): with an initial
    pose error ~4x larger than the single-level convergence basin, the
    3-level coarse-to-fine schedule must still pull the trajectory toward
    ground truth, where single-level refinement fails (diverges or leaves
    the error essentially uncorrected)."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(29)
    # Large perturbation: single-level bilinear refinement has a ~1-px
    # basin; this is several pixels of reprojection error.
    init = perturb_poses(rng, poses_gt, trans_sigma=0.12, rot_sigma=0.012,
                         keep_first=2)
    gt_traj = traj_mod.Trajectory(poses_gt.astype(np.float64))
    init_traj = traj_mod.Trajectory(init.astype(np.float64))
    ate_init = traj_mod.ate_rmse(init_traj, gt_traj, align=False)

    single, _, _ = run_engine(scene, small_cfg(), init)
    c2f, results, _ = run_engine(
        scene, small_cfg(pyramidLevels=3, coarseToFine=True), init)
    assert len(results) >= 5
    ate_single = traj_mod.ate_rmse(single, gt_traj, align=False)
    ate_c2f = traj_mod.ate_rmse(c2f, gt_traj, align=False)
    # Coarse-to-fine must improve on the initialization AND beat the
    # single-level result on this far-from-basin start.
    assert ate_c2f < 0.75 * ate_init, (ate_init, ate_single, ate_c2f)
    assert ate_c2f < ate_single, (ate_init, ate_single, ate_c2f)


def test_engine_coarse_to_fine_noop_single_level(scene):
    """coarseToFine with pyramidLevels=1 has no coarse levels: trajectories
    must be IDENTICAL to the plain single-level engine."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(31)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.02, rot_sigma=0.002,
                         keep_first=2)
    a, _, _ = run_engine(scene, small_cfg(), init)
    b, _, _ = run_engine(scene, small_cfg(coarseToFine=True), init)
    np.testing.assert_array_equal(a.poses, b.poses)


def test_engine_on_ground_truth_stays_near(scene):
    """Fed the ground-truth trajectory, the engine must stay within the
    photometric noise floor (bilinear-interpolation error lets young frames
    wander by a fraction of a percent of depth; a relative-pose prior is the
    planned fix — see core/lm.py roadmap)."""
    cam, images, depths, poses_gt = scene
    gt_traj = traj_mod.Trajectory(poses_gt.astype(np.float64))
    refined, results, _ = run_engine(scene, small_cfg(), poses_gt.copy())
    assert len(results) >= 1
    ate = traj_mod.ate_rmse(refined, gt_traj, align=False)
    assert ate < 0.05, ate


def test_engine_point_depths_sane(scene):
    cam, images, depths, poses_gt = scene
    _, _, pba = run_engine(scene, small_cfg(), poses_gt.copy())
    active = np.asarray(pba.points.active)
    x = np.asarray(pba.points.x_world)[active]
    # Synthetic sphere points are within ~4-16 m of the world origin.
    r = np.linalg.norm(x - np.array([0, 0, 10.0]), axis=1)
    assert (np.abs(r - 6.0) < 1.0).mean() > 0.9


@pytest.mark.parametrize("descriptor", ["IntensityAndGradient", "BitPlanes"])
def test_engine_descriptor_families(scene, descriptor):
    """Every descriptor family (reference: Intensity | IntensityAndGradient
    | BitPlanes, pb:src/photobundle.cc DescriptorFrame::Create) must run the
    full engine loop and reduce trajectory error on jittered input."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(11)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    cfg = small_cfg(descriptor=descriptor, maxIterations=20)
    refined, results, _ = run_engine(scene, cfg, init)
    assert results, "no window solves ran"
    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    a_init = traj_mod.ate_rmse(traj_mod.Trajectory(init.astype(np.float64)),
                               gt, align=False)
    a_ref = traj_mod.ate_rmse(refined, gt, align=False)
    assert np.isfinite(a_ref)
    assert a_ref < 0.8 * a_init, f"{descriptor}: {a_ref} !< 0.8*{a_init}"
    for r in results:
        assert r.final_cost <= r.initial_cost + 1e-9


def test_engine_point_cloud_output(scene):
    cam, images, depths, poses_gt = scene
    cfg = small_cfg()
    refined, results, _ = run_engine(scene, cfg, poses_gt.copy())
    r = results[-1]
    assert r.points_xyz.shape[0] == r.num_points
    assert r.points_xyz.shape[1] == 3
    assert np.isfinite(r.points_xyz).all()
    # Points were seeded from GT depth at GT poses: they must sit within the
    # scene's depth budget of the cameras.
    cam_pos = r.poses[-1][:3, 3]
    d = np.linalg.norm(r.points_xyz - cam_pos, axis=1)
    assert (d < 2 * cfg.maxDepth).all()


def test_engine_state_snapshot_exact_resume(scene, tmp_path):
    """save_state/load_state must make a resumed engine bitwise-equivalent:
    continuing after a snapshot produces the same window results as the
    uninterrupted run (SURVEY.md 5.4 optimizer-state snapshot)."""
    cam, images, depths, poses_gt = scene
    cfg = small_cfg(maxIterations=8)

    # Uninterrupted run.
    pba_a = PhotometricBundleAdjustment(cam, images[0].shape, cfg)
    res_a = []
    for i, (img, depth) in enumerate(zip(images, depths)):
        r = pba_a.add_frame(img, depth, poses_gt[i])
        if i == 5:
            pba_a.save_state(str(tmp_path / "snap.npz"))
        if r is not None:
            res_a.append(r)

    # Interrupted: fresh engine, restore after frame 5, continue.
    pba_b = PhotometricBundleAdjustment(cam, images[0].shape, cfg)
    pba_b.load_state(str(tmp_path / "snap.npz"))
    assert pba_b._frame_count == 6
    res_b = []
    for i in range(6, len(images)):
        r = pba_b.add_frame(images[i], depths[i], poses_gt[i])
        if r is not None:
            res_b.append(r)

    tail_a = res_a[-len(res_b):]
    assert len(res_b) == len(tail_a) > 0
    for ra, rb in zip(tail_a, res_b):
        np.testing.assert_array_equal(ra.frame_ids, rb.frame_ids)
        np.testing.assert_allclose(ra.poses, rb.poses, atol=1e-7)
        np.testing.assert_allclose(ra.final_cost, rb.final_cost, rtol=1e-5)


def test_engine_bicubic_interpolation(scene):
    """cfg.interpolation='bicubic' (Ceres-parity sampling) end to end."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(11)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    cfg = small_cfg(interpolation="bicubic", maxIterations=20)
    refined, results, _ = run_engine(scene, cfg, init)
    assert results
    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    a_init = traj_mod.ate_rmse(traj_mod.Trajectory(init.astype(np.float64)),
                               gt, align=False)
    a_ref = traj_mod.ate_rmse(refined, gt, align=False)
    assert a_ref < 0.8 * a_init, (a_init, a_ref)


def test_engine_refinement_level(scene):
    """refinementLevel=1: the solve runs on the half-resolution pyramid
    level (reference: descriptor frames are built per pyramid level and BA
    refines at a configured level)."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(11)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    # Half-resolution tracking needs level-appropriate gates: blurred
    # patches score lower ZNCC and the pixel budget shrinks 4x.
    cfg = small_cfg(pyramidLevels=2, refinementLevel=1, patchRadius=1,
                    maxIterations=20, minSaliency=0.002, minScore=0.4,
                    maxFrameDistance=2, nonMaxSuppRadius=1, maskBlockRadius=1)
    refined, results, pba = run_engine(scene, cfg, init)
    assert results
    assert pba.level_shape == (48, 72)
    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    a_init = traj_mod.ate_rmse(traj_mod.Trajectory(init.astype(np.float64)),
                               gt, align=False)
    a_ref = traj_mod.ate_rmse(refined, gt, align=False)
    assert a_ref < a_init, (a_init, a_ref)


def test_engine_long_sequence_no_drift_amplification():
    """Golden long run: 24 frames of windowed refinement on a drifting VO
    input. The sliding-window chain must IMPROVE the trajectory end to end —
    a window-to-window error-compounding bug shows up here long before it
    shows in 10-frame tests."""
    from synthetic import make_sequence, drift_poses

    rng = np.random.default_rng(7)
    cam, images, depths, poses_gt = make_sequence(rng, n_frames=24,
                                                  shape=(96, 144))
    init = drift_poses(rng, poses_gt, trans_sigma=0.02, rot_sigma=0.002,
                       keep_first=2)
    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    cfg = small_cfg(maxIterations=15)
    refined, results, _ = run_engine(
        (cam, images, depths, poses_gt), cfg, init)
    assert len(results) == 20
    a_init = traj_mod.ate_rmse(traj_mod.Trajectory(init.astype(np.float64)),
                               gt, align=False)
    a_ref = traj_mod.ate_rmse(refined, gt, align=False)
    assert a_ref < 0.75 * a_init, (a_init, a_ref)
    # The TAIL must also improve (drift not merely front-loaded away):
    tail_init = np.linalg.norm(init[-5:, :3, 3] - poses_gt[-5:, :3, 3],
                               axis=1).mean()
    tail_ref = np.linalg.norm(
        np.asarray(refined.poses[-5:, :3, 3], np.float64)
        - poses_gt[-5:, :3, 3], axis=1).mean()
    assert tail_ref < tail_init, (tail_init, tail_ref)


def test_engine_pipelined_results_match_sync(scene):
    """cfg.pipelineResults=True returns the same WindowResults, one frame
    late, with a final flush — the CLI contract stays exact."""
    cam, images, depths, poses_gt = scene
    outs = {}
    for pipelined in (False, True):
        cfg = small_cfg(maxIterations=8, pipelineResults=pipelined)
        pba = PhotometricBundleAdjustment(cam, images[0].shape, cfg)
        results = []
        for i, (img, depth) in enumerate(zip(images, depths)):
            r = pba.add_frame(img, depth, poses_gt[i])
            if r is not None:
                results.append(r)
        tail = pba.flush_result()
        if tail is not None:
            results.append(tail)
        outs[pipelined] = results
    assert len(outs[False]) == len(outs[True])
    for ra, rb in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(ra.frame_ids, rb.frame_ids)
        np.testing.assert_allclose(ra.poses, rb.poses, atol=1e-7)
        assert ra.num_points == rb.num_points


@pytest.mark.slow
def test_batched_engine_matches_individual(scene):
    """BatchedPhotometricBundleAdjustment must reproduce B independent
    engines' trajectories (vmapped state machine == B state machines)."""
    from photobundle_tpu.core.batched import BatchedPhotometricBundleAdjustment
    from synthetic import make_sequence

    cam, images0, depths0, poses0 = scene
    rng = np.random.default_rng(21)
    cam_b, images1, depths1, poses1 = make_sequence(rng, n_frames=10,
                                                    shape=(96, 144))
    cfg = small_cfg(maxIterations=8)

    # Individual runs.
    indiv = []
    for imgs, deps, poses in ((images0, depths0, poses0),
                              (images1, depths1, poses1)):
        pba = PhotometricBundleAdjustment(cam, imgs[0].shape, cfg)
        rs = []
        for i in range(len(imgs)):
            r = pba.add_frame(imgs[i], deps[i], poses[i])
            if r is not None:
                rs.append(r)
        indiv.append(rs)

    # Batched run (shared camera; sequence 1 rendered with the same
    # intrinsics by make_sequence).
    bpba = BatchedPhotometricBundleAdjustment(cam, images0[0].shape, cfg,
                                              batch=2)
    batched = [[], []]
    for i in range(len(images0)):
        rs = bpba.add_frames([images0[i], images1[i]],
                             [depths0[i], depths1[i]],
                             [poses0[i], poses1[i]])
        if rs is not None:
            for k in range(2):
                batched[k].append(rs[k])

    for k in range(2):
        assert len(batched[k]) == len(indiv[k]) > 0
        for ra, rb in zip(indiv[k], batched[k]):
            np.testing.assert_array_equal(ra.frame_ids, rb.frame_ids)
            # fp-schedule differences between vmapped and single programs
            # accumulate along gauge-weak directions across chained windows;
            # point sets and costs stay identical.
            np.testing.assert_allclose(ra.poses, rb.poses, atol=1e-3)
            assert ra.num_points == rb.num_points
            np.testing.assert_allclose(ra.final_cost, rb.final_cost,
                                       rtol=1e-3)


def test_min_keyframe_motion(scene, tmp_path):
    """cfg.minKeyframeMotion: stationary frames are skipped (never
    ingested), keep their VO pose relative to the last refined keyframe,
    and re-tracking ages count INGESTED frames (the skip must not sever
    tracks through maxFrameDistance)."""
    from photobundle_tpu import cli as cli_mod
    from photobundle_tpu.io.kitti import PrecomputedDepthDataset

    cam, images, depths, poses_gt = scene
    # Insert a stationary segment: frames 4..6 replicate frame 3.
    imgs = list(images[:4]) + [images[3]] * 3 + list(images[4:])
    dpts = list(depths[:4]) + [depths[3]] * 3 + list(depths[4:])
    gt = np.concatenate([poses_gt[:4], np.repeat(poses_gt[3:4], 3, axis=0),
                         poses_gt[4:]], axis=0)
    rng = np.random.default_rng(5)
    init = perturb_poses(rng, gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    # Keep the stationary segment exactly stationary in the VO input too.
    init[4:7] = init[3]
    init_traj = traj_mod.Trajectory(init.astype(np.float64))
    ds = PrecomputedDepthDataset(images=imgs, depths=dpts, camera=cam)

    cfg = small_cfg(minKeyframeMotion=0.02)
    out = str(tmp_path / "refined.txt")
    refined = cli_mod.run(cfg, ds, init_traj, output=out, progress=False)

    assert len(refined) == len(imgs)
    # Skipped stationary frames ride with their anchor keyframe (identical
    # init rel pose => identical refined pose).
    for i in (4, 5, 6):
        np.testing.assert_allclose(refined.poses[i], refined.poses[3],
                                   atol=1e-12)
    # The gate must not hurt accuracy vs ground truth.
    gt_traj = traj_mod.Trajectory(gt.astype(np.float64))
    ate_init = traj_mod.ate_rmse(init_traj, gt_traj, align=False)
    ate_ref = traj_mod.ate_rmse(refined, gt_traj, align=False)
    assert ate_ref < ate_init, (ate_init, ate_ref)

    # Gate off = reference semantics: every frame ingested (solves start at
    # window W => first result frame id == W-1 == 4 with no skips).
    cfg_off = small_cfg()
    out2 = str(tmp_path / "refined_off.txt")
    refined_off = cli_mod.run(cfg_off, ds, init_traj, output=out2,
                              progress=False)
    assert len(refined_off) == len(imgs)


def test_engine_absolute_pose_prior_anchors_iid_noise(scene):
    """posePriorWeight fuses the VO input's absolute poses back into every
    window solve (the sliding chain otherwise discards them and integrates
    photometric relative noise into a walk — observable only on long
    chains; tools/golden_kitti.py carries the chain-level rows). On this
    short scene the pinned properties are the mechanism itself: the
    anchored refinement (a) still beats the noisy init and (b) stays
    strictly closer to the VO input than the unanchored refinement."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(23)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    gt_traj = traj_mod.Trajectory(poses_gt.astype(np.float64))
    init_traj = traj_mod.Trajectory(init.astype(np.float64))

    base, _, _ = run_engine(scene, small_cfg(), init)
    anchored, results, _ = run_engine(
        scene, small_cfg(posePriorWeight=20.0), init)
    assert len(results) >= 5
    ate_init = traj_mod.ate_rmse(init_traj, gt_traj, align=False)
    ate_anch = traj_mod.ate_rmse(anchored, gt_traj, align=False)
    assert ate_anch < ate_init, (ate_init, ate_anch)
    dev_base = traj_mod.ate_rmse(base, init_traj, align=False)
    dev_anch = traj_mod.ate_rmse(anchored, init_traj, align=False)
    assert dev_anch < dev_base, (dev_base, dev_anch)


def test_cli_resume_preserves_refined_prefix(scene, tmp_path):
    """Resuming from a .ckpt must re-seed the trajectory from the
    interrupted run's OUTPUT (refined prefix), not from the raw VO init —
    regression for the round-3 review finding where every pre-resume frame
    was silently written back as its init pose. Windows overlapping the
    resume point are re-solved; frames strictly before the re-ingest
    window must be byte-identical to the crash-time output."""
    import pytest as _pytest
    from photobundle_tpu import cli as cli_mod
    from photobundle_tpu.io.kitti import PrecomputedDepthDataset

    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(11)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    init_traj = traj_mod.Trajectory(init.astype(np.float64))
    ds = PrecomputedDepthDataset(images=list(images), depths=list(depths),
                                 camera=cam)
    cfg = small_cfg()
    out = str(tmp_path / "refined.txt")

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        if calls["n"] >= 4:
            raise RuntimeError("simulated crash")

    with _pytest.raises(RuntimeError, match="simulated crash"):
        cli_mod.run(cfg, ds, init_traj, output=out, progress=False,
                    on_window=boom)
    assert os.path.exists(out + ".ckpt")
    crash = traj_mod.load_poses_kitti(out)
    # The crash-time output must already hold refined (non-init) poses.
    assert not np.allclose(crash.poses[2], init_traj.poses[2])

    resumed = cli_mod.run(cfg, ds, init_traj, output=out, progress=False,
                          resume=True)
    assert not os.path.exists(out + ".ckpt")
    # done=7 (4th window), W=5 -> re-ingest starts at frame 4; frames 0-3
    # keep the crash-time refinement exactly.
    np.testing.assert_allclose(resumed.poses[:4], crash.poses[:4],
                               atol=1e-12)
    # And are NOT the raw init (the regressed behavior).
    assert not np.allclose(resumed.poses[2], init_traj.poses[2])
    assert not np.allclose(resumed.poses[3], init_traj.poses[3])


def test_cli_resume_with_keyframe_gate(scene, tmp_path):
    """minKeyframeMotion + resume: the gate's decisions are replayed from
    the init trajectory, so a resumed run keeps pre-resume skipped frames
    anchored to their (refined) keyframes and completes with every frame
    present."""
    import pytest as _pytest
    from photobundle_tpu import cli as cli_mod
    from photobundle_tpu.io.kitti import PrecomputedDepthDataset

    cam, images, depths, poses_gt = scene
    imgs = list(images[:4]) + [images[3]] * 3 + list(images[4:])
    dpts = list(depths[:4]) + [depths[3]] * 3 + list(depths[4:])
    gt = np.concatenate([poses_gt[:4], np.repeat(poses_gt[3:4], 3, axis=0),
                         poses_gt[4:]], axis=0)
    rng = np.random.default_rng(5)
    init = perturb_poses(rng, gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    init[4:7] = init[3]
    init_traj = traj_mod.Trajectory(init.astype(np.float64))
    ds = PrecomputedDepthDataset(images=imgs, depths=dpts, camera=cam)
    cfg = small_cfg(minKeyframeMotion=0.02)
    out = str(tmp_path / "refined.txt")

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        if calls["n"] >= 5:
            raise RuntimeError("simulated crash")

    with _pytest.raises(RuntimeError, match="simulated crash"):
        cli_mod.run(cfg, ds, init_traj, output=out, progress=False,
                    on_window=boom)
    resumed = cli_mod.run(cfg, ds, init_traj, output=out, progress=False,
                          resume=True)
    assert len(resumed) == len(imgs)
    # Stationary frames (4..6, skipped by the gate pre-crash) still ride
    # with their anchor keyframe after the resume.
    for i in (4, 5, 6):
        np.testing.assert_allclose(resumed.poses[i], resumed.poses[3],
                                   atol=1e-12)


def test_engine_exposure_invariance(scene):
    """Per-frame exposure offsets (auto-exposure flicker) must not change
    the refined trajectory when normalizePatches is on (the reference's
    per-patch brightness normalization): bilinear sampling is linear and
    the mean removal cancels a constant offset exactly, end-to-end through
    selection (gradient saliency), ZNCC tracking, and the solver. With
    normalizePatches=False the exposure leaks into the photometric
    residual and refinement degrades."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(7)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    biases = rng.uniform(0.08, 0.3, size=len(images)).astype(np.float32)
    images_b = [img + b for img, b in zip(images, biases)]
    scene_b = (cam, images_b, depths, poses_gt)

    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    init_t = traj_mod.Trajectory(init.astype(np.float64))
    ate_init = traj_mod.ate_rmse(init_t, gt, align=False)

    ref_clean, _, _ = run_engine(scene, small_cfg(), init)
    ref_norm, _, _ = run_engine(scene_b, small_cfg(), init)
    ref_raw, _, _ = run_engine(scene_b, small_cfg(normalizePatches=False),
                               init)

    # Chain-level invariance: biased-input trajectory == clean trajectory.
    # Not bitwise: the bias perturbs float reassociation inside XLA fusions,
    # and sub-ulp cost differences can flip an LM accept/reject boundary —
    # measured divergence is ~8e-4 m over this 10-frame chain, vs the
    # centimeter-scale pose error being corrected.
    np.testing.assert_allclose(ref_norm.poses, ref_clean.poses, atol=3e-3)

    ate_norm = traj_mod.ate_rmse(ref_norm, gt, align=False)
    ate_raw = traj_mod.ate_rmse(ref_raw, gt, align=False)
    assert ate_norm < 0.65 * ate_init, (ate_init, ate_norm)
    assert ate_raw > ate_norm, (ate_raw, ate_norm)


def test_engine_bitplanes_gain_robustness(scene):
    """Per-frame multiplicative exposure (gain flicker) defeats the mean
    normalization (it removes additive offsets only, so intensity residuals
    scale with the gain mismatch) but NOT the BitPlanes census channels,
    which depend on local intensity ORDER (test_image_ops pins the
    channel-level invariance): the BitPlanes engine must still refine a
    jittered trajectory on gain-flickering video."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(7)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    gains = rng.uniform(0.7, 1.3, size=len(images)).astype(np.float32)
    images_g = [img * g for img, g in zip(images, gains)]
    scene_g = (cam, images_g, depths, poses_gt)

    cfg = small_cfg(descriptor="BitPlanes", maxIterations=20)
    refined, results, _ = run_engine(scene_g, cfg, init)
    assert results, "no window solves ran"
    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    a_init = traj_mod.ate_rmse(traj_mod.Trajectory(init.astype(np.float64)),
                               gt, align=False)
    a_ref = traj_mod.ate_rmse(refined, gt, align=False)
    assert a_ref < 0.8 * a_init, (a_init, a_ref)
    for r in results:
        assert r.final_cost <= r.initial_cost + 1e-9


def test_engine_affine_normalization_gain_robustness(scene):
    """patchNormalization='affine' (ZNCC-style unit-norm descriptors) gives
    the PLAIN Intensity descriptor the gain robustness that otherwise
    requires BitPlanes: on the same gain-flickering video that defeats
    mean-only normalization, the affine-normalized Intensity engine must
    still refine the jittered trajectory — and beat its mean-normalized
    counterpart."""
    cam, images, depths, poses_gt = scene
    rng = np.random.default_rng(7)
    init = perturb_poses(rng, poses_gt, trans_sigma=0.03, rot_sigma=0.003,
                         keep_first=2)
    gains = rng.uniform(0.7, 1.3, size=len(images)).astype(np.float32)
    images_g = [img * g for img, g in zip(images, gains)]
    scene_g = (cam, images_g, depths, poses_gt)

    gt = traj_mod.Trajectory(poses_gt.astype(np.float64))
    a_init = traj_mod.ate_rmse(traj_mod.Trajectory(init.astype(np.float64)),
                               gt, align=False)

    refined_aff, results, _ = run_engine(
        scene_g, small_cfg(patchNormalization="affine"), init)
    assert results, "no window solves ran"
    a_aff = traj_mod.ate_rmse(refined_aff, gt, align=False)
    refined_mean, _, _ = run_engine(scene_g, small_cfg(), init)
    a_mean = traj_mod.ate_rmse(refined_mean, gt, align=False)

    assert a_aff < 0.65 * a_init, (a_init, a_aff)
    assert a_aff < a_mean, (a_aff, a_mean)
    for r in results:
        assert r.final_cost <= r.initial_cost + 1e-9
