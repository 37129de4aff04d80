"""Trajectory evaluation: ATE, RPE, and KITTI odometry segment errors.

    python tools/eval_traj.py <estimate.txt> <ground_truth.txt> [init.txt]

Prints one JSON line per trajectory (the paper's evaluation protocol:
KITTI odometry error of the initialization vs after photometric refinement).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from photobundle_tpu.io.trajectory import (Trajectory, ate_rmse,
                                           kitti_rotation_error,
                                           kitti_translation_error,
                                           load_poses_kitti, rpe)


def report(name, est, gt):
    t_rpe, r_rpe = rpe(est, gt)
    print(json.dumps({
        "trajectory": name,
        "ate_rmse_m": round(ate_rmse(est, gt), 6),
        "rpe_trans_m": round(t_rpe, 6),
        "rpe_rot_rad": round(r_rpe, 6),
        "kitti_t_err_pct": round(kitti_translation_error(est, gt), 4),
        "kitti_r_err_deg_per_100m": round(kitti_rotation_error(est, gt), 4),
    }))


def main():
    est = load_poses_kitti(sys.argv[1])
    gt = load_poses_kitti(sys.argv[2])
    if len(sys.argv) > 3:
        report("initialization", load_poses_kitti(sys.argv[3]), gt)
    report("refined", est, gt)


if __name__ == "__main__":
    main()
