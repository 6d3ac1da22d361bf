"""KITTI calibration parsing + velodyne projection with synthetic files."""
import os

import numpy as np

from planedepth_tpu.data.kitti_utils import (
    generate_depth_map,
    read_calib_file,
    resize_depth_nearest,
)


def _write_calib(tmp_path):
    cam2cam = tmp_path / "calib_cam_to_cam.txt"
    r = np.eye(3).reshape(-1)
    p = np.array([[700.0, 0, 600, 0], [0, 700, 180, 0],
                  [0, 0, 1, 0]]).reshape(-1)
    cam2cam.write_text(
        "S_rect_02: 1242 375\n"
        f"R_rect_00: {' '.join(map(str, r))}\n"
        f"P_rect_02: {' '.join(map(str, p))}\n"
        f"P_rect_03: {' '.join(map(str, p))}\n"
        "calib_time: 09-Jan-2012 13:57:47\n"
    )
    velo2cam = tmp_path / "calib_velo_to_cam.txt"
    # velodyne x(fwd) y(left) z(up) -> camera x(right) y(down) z(fwd)
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float).reshape(-1)
    velo2cam.write_text(
        f"R: {' '.join(map(str, R))}\n"
        "T: 0 0 0\n"
    )


def test_read_calib_file(tmp_path):
    _write_calib(tmp_path)
    data = read_calib_file(str(tmp_path / "calib_cam_to_cam.txt"))
    assert data["S_rect_02"].tolist() == [1242.0, 375.0]
    assert data["R_rect_00"].shape == (9,)
    assert isinstance(data["calib_time"], str)


def test_generate_depth_map_projects_points(tmp_path):
    _write_calib(tmp_path)
    # a single point 10 m ahead, slightly left/up
    pts = np.array([[10.0, 0.5, 0.2, 1.0],
                    [-5.0, 0.0, 0.0, 1.0]], np.float32)  # second: behind
    velo = tmp_path / "scan.bin"
    pts.astype(np.float32).tofile(velo)
    depth = generate_depth_map(str(tmp_path), str(velo), cam=2)
    assert depth.shape == (375, 1242)
    nz = np.nonzero(depth)
    assert len(nz[0]) == 1
    np.testing.assert_allclose(depth[nz][0], 10.0, rtol=1e-5)
    # expected pixel: cam coords (x=-0.5, y=-0.2, z=10) ->
    # u = 700*(-0.05)+600 = 565, v = 700*(-0.02)+180 = 166; round-1
    assert nz[0][0] == 165 - 1 + 1 or abs(nz[0][0] - 165) <= 1
    assert abs(nz[1][0] - 564) <= 1


def test_resize_depth_nearest_preserves_values():
    d = np.zeros((10, 20))
    d[3, 7] = 5.0
    out = resize_depth_nearest(d, (5, 10))
    assert set(np.unique(out)) <= {0.0, 5.0}
