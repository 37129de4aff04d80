from . import kitti, trajectory
from .trajectory import Trajectory, load_poses_kitti, write_poses_kitti, ate_rmse, rpe
