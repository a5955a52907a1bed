"""Depth/pseudo-lidar export roundtrips."""
import numpy as np

from eval_driving_safety_tpu.data.kitti import Calibration
from eval_driving_safety_tpu.inference.depth_export import (
    depth_to_disparity, depth_to_points, disparity_to_depth, load_velodyne,
    save_pseudo_lidar)

CALIB = Calibration.default()


def test_disp_depth_inverse():
    depth = np.array([[10.0, 20.0], [5.0, 40.0]])
    disp = depth_to_disparity(depth, CALIB)
    np.testing.assert_allclose(disparity_to_depth(disp, CALIB), depth,
                               rtol=1e-6)


def test_depth_to_points_center_pixel():
    calib = Calibration.default(f_u=100.0, c_u=100.0, c_v=50.0)
    h, w = 100, 200
    depth = np.full((h, w), 15.0)
    pts = depth_to_points(depth, calib)
    assert pts.shape[1] == 3
    np.testing.assert_allclose(pts[:, 2], 15.0)
    # the pixel at the principal point maps to x=y=0
    idx = 50 * w + 100
    np.testing.assert_allclose(pts[idx, :2], [0, 0], atol=15.0 / 100.0)


def test_pseudo_lidar_roundtrip(tmp_path):
    depth = np.random.RandomState(0).uniform(5, 30, (32, 64))
    path = str(tmp_path / "000001.bin")
    cloud = save_pseudo_lidar(path, depth, CALIB)
    back = load_velodyne(path)
    np.testing.assert_allclose(back, cloud)
    assert back.shape == (32 * 64, 4)
    np.testing.assert_allclose(back[:, 3], 1.0)
