"""Trajectory I/O, metrics, KITTI parsing, config-driven dataset tests."""

import numpy as np
import pytest

from photobundle_tpu.geometry.camera import Camera
from photobundle_tpu.io import kitti as kitti_mod
from photobundle_tpu.io import trajectory as traj_mod


def random_trajectory(rng, n=20):
    from photobundle_tpu.geometry import se3
    import jax.numpy as jnp

    poses = [np.eye(4)]
    for _ in range(n - 1):
        xi = np.concatenate([rng.standard_normal(3) * 0.5,
                             rng.standard_normal(3) * 0.1]).astype(np.float32)
        poses.append(poses[-1] @ np.asarray(se3.se3_exp(jnp.asarray(xi)), np.float64))
    return traj_mod.Trajectory(np.stack(poses))


def test_kitti_pose_roundtrip(tmp_path, rng):
    traj = random_trajectory(rng)
    path = str(tmp_path / "poses.txt")
    traj_mod.write_poses_kitti(path, traj)
    back = traj_mod.load_poses_kitti(path)
    np.testing.assert_allclose(back.poses, traj.poses, atol=1e-7)
    np.testing.assert_allclose(back.poses[:, 3], np.tile([0, 0, 0, 1.0], (len(traj), 1)))


def test_trajectory_update():
    traj = traj_mod.Trajectory(np.stack([np.eye(4)] * 5))
    new = np.eye(4)
    new[0, 3] = 7.0
    traj.update([2, 3], np.stack([new, new]))
    assert traj.poses[2][0, 3] == 7.0
    assert traj.poses[0][0, 3] == 0.0
    # unseen frame id extends
    traj.update([9], new[None])
    assert len(traj) == 6 and traj.frame_ids[-1] == 9


def test_ate_zero_for_identical(rng):
    traj = random_trajectory(rng)
    assert traj_mod.ate_rmse(traj, traj) == pytest.approx(0.0, abs=1e-9)


def test_ate_alignment_removes_rigid_offset(rng):
    from photobundle_tpu.geometry import se3
    import jax.numpy as jnp

    traj = random_trajectory(rng)
    g = np.asarray(se3.se3_exp(jnp.asarray([1.0, -2.0, 0.5, 0.2, -0.1, 0.3])), np.float64)
    moved = traj_mod.Trajectory(np.einsum("ij,njk->nik", g, traj.poses))
    assert traj_mod.ate_rmse(moved, traj, align=False) > 1.0
    assert traj_mod.ate_rmse(moved, traj, align=True) < 1e-6


def test_ate_sim3_removes_scale(rng):
    traj = random_trajectory(rng)
    scaled = traj_mod.Trajectory(traj.poses.copy())
    scaled.poses[:, :3, 3] *= 1.3
    assert traj_mod.ate_rmse(scaled, traj, align=True, with_scale=True) < 1e-6
    assert traj_mod.ate_rmse(scaled, traj, align=True, with_scale=False) > 0.01


def test_rpe_detects_relative_error(rng):
    traj = random_trajectory(rng)
    noisy = traj_mod.Trajectory(traj.poses.copy())
    noisy.poses[5:, :3, 3] += 0.1  # a jump at frame 5 = one bad relative step
    t_err, r_err = traj_mod.rpe(noisy, traj)
    assert t_err > 0.01


def test_kitti_calib_parsing(tmp_path):
    calib = tmp_path / "calib.txt"
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371
    p0 = f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0"
    p1 = f"P1: {fx} 0 {cx} {-fx * b} 0 {fx} {cy} 0 0 0 1 0"
    calib.write_text(p0 + "\n" + p1 + "\n")
    mats = kitti_mod.parse_kitti_calib(str(calib))
    cam = kitti_mod.calibration_from_projections(mats["P0"], mats["P1"])
    assert float(cam.fx) == pytest.approx(fx)
    assert float(cam.cx) == pytest.approx(cx)
    assert float(cam.baseline) == pytest.approx(b, rel=1e-5)


def test_kitti_dataset_from_files(tmp_path, rng):
    """Full dataset path: synthetic PNG pair on disk -> frames with depth."""
    import cv2

    from photobundle_tpu.config import PBAConfig

    seq = tmp_path / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    h, w, d_true = 96, 160, 8
    base = (rng.uniform(0, 255, size=(h, w + d_true))).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.0)
    left = base[:, :-d_true]
    right = base[:, d_true:]  # left[x] = right[x - d]: uniform disparity
    for i in range(2):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), left)
        cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), right)
    fx, b = 100.0, 0.5
    (seq / "calib.txt").write_text(
        f"P0: {fx} 0 {w/2} 0 0 {fx} {h/2} 0 0 0 1 0\n"
        f"P1: {fx} 0 {w/2} {-fx*b} 0 {fx} {h/2} 0 0 0 1 0\n")
    (seq / "times.txt").write_text("0.0\n0.1\n")

    cfg = PBAConfig(dataDir=str(tmp_path), sequence=0, numDisparities=16,
                    minDepth=0.1, maxDepth=100.0)
    ds = kitti_mod.create_dataset(cfg)
    assert len(ds) == 2
    assert ds.image_shape == (h, w)
    frame = ds.get_frame(0)
    assert frame.image.shape == (h, w)
    expected_depth = fx * b / d_true
    valid_depths = frame.depth[frame.depth_valid]
    assert valid_depths.size > 100
    med = np.median(valid_depths)
    assert abs(med - expected_depth) / expected_depth < 0.05, (med, expected_depth)


def test_kitti_dataset_sgbm(tmp_path, rng):
    """stereoAlgorithm=SGBM routes through the semi-global matcher."""
    from synthetic import write_kitti_dataset
    from photobundle_tpu.config import PBAConfig
    from photobundle_tpu.io import kitti as K

    write_kitti_dataset(str(tmp_path), 0, rng, n_frames=2, shape=(64, 96))
    cfg = PBAConfig(dataDir=str(tmp_path), sequence=0,
                    stereoAlgorithm="SGBM", numDisparities=32,
                    sadWindowSize=5, minDepth=0.5, maxDepth=60.0)
    ds = K.create_dataset(cfg)
    f = ds.get_frame(0)
    assert f.depth_valid.any()
    d = f.depth[f.depth_valid]
    assert np.isfinite(d).all() and (d > 0.5).all() and (d < 60.0).all()


def test_depth_cache_roundtrip(tmp_path, rng):
    """depthCacheDir: a second dataset over the same sequence + stereo
    params loads identical depth without running the matcher; different
    stereo params miss (separate key)."""
    from synthetic import write_kitti_dataset
    from photobundle_tpu.config import PBAConfig
    from photobundle_tpu.io import kitti as K

    write_kitti_dataset(str(tmp_path), 0, rng, n_frames=2, shape=(64, 96))
    cache = str(tmp_path / "depth_cache")
    cfg = PBAConfig(dataDir=str(tmp_path), sequence=0, numDisparities=32,
                    sadWindowSize=5, minDepth=0.5, maxDepth=60.0,
                    depthCacheDir=cache)
    ds1 = K.create_dataset(cfg)
    assert not ds1._cache_all_hit
    frames1 = [ds1.get_frame(i) for i in range(2)]

    ds2 = K.create_dataset(cfg)
    assert ds2._cache_all_hit
    assert ds2._native is None  # stereo pipeline never started
    for i, f1 in enumerate(frames1):
        f2 = ds2.get_frame(i)
        np.testing.assert_array_equal(f1.depth, f2.depth)
        np.testing.assert_array_equal(f1.depth_valid, f2.depth_valid)
        np.testing.assert_array_equal(f1.image, f2.image)

    ds3 = K.create_dataset(cfg.replace(numDisparities=16))
    assert not ds3._cache_all_hit  # different stereo key
