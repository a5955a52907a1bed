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


def test_velodyne_to_depth_map_roundtrip():
    """Project synthetic camera-frame points (identity extrinsics) and
    recover their depths at the right pixels."""
    from eval_driving_safety_tpu.cli.make_depth_gt import velodyne_to_depth_map
    calib = Calibration.default(f_u=100.0, c_u=100.0, c_v=50.0)
    # pure pinhole (no stereo x-offset) so same-ray points share a pixel
    calib.P2 = np.array([[100.0, 0, 100.0, 0],
                         [0, 100.0, 50.0, 0],
                         [0, 0, 1.0, 0]])
    calib.Tr_velo_to_cam = None   # points already in camera frame
    pts = np.array([
        [0.0, 0.0, 10.0, 1.0],    # principal point, depth 10
        [2.0, 0.0, 10.0, 1.0],    # u = 100 + 100*2/10 = 120
        [0.0, 0.0, 5.0, 1.0],     # same pixel as first but CLOSER
    ], np.float32)
    depth = velodyne_to_depth_map(pts, calib, 100, 200)
    assert abs(depth[50, 100] - 5.0) < 1e-5   # nearest return won
    assert abs(depth[50, 120] - 10.0) < 1e-5
    assert (depth > 0).sum() == 2
