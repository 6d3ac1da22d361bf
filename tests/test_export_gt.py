"""GT exporters (SURVEY §2.1 #30) on a synthetic on-disk KITTI tree —
previously acknowledged as untestable; the synthetic velodyne/calib/PNG
fixtures make them testable without real KITTI data."""
import os

import numpy as np
import pytest
from PIL import Image

from planedepth_tpu.data.kitti_utils import generate_depth_map
from planedepth_tpu.eval.export_gt import (
    export_eigen_improved_gt,
    export_eigen_raw_gt,
)

from tests.test_kitti_utils import _write_calib

DATE = "2011_09_26"
DRIVE = f"{DATE}/{DATE}_drive_0002_sync"
N = 3


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "kitti"
    (root / DATE).mkdir(parents=True)
    _write_calib(root / DATE)
    rng = np.random.default_rng(1)
    vd = root / DRIVE / "velodyne_points" / "data"
    vd.mkdir(parents=True)
    for i in range(N):
        pts = np.empty((5000, 4), np.float32)
        pts[:, 0] = rng.uniform(2, 60, len(pts))
        pts[:, 1] = rng.uniform(-20, 20, len(pts))
        pts[:, 2] = rng.uniform(-2, 2, len(pts))
        pts[:, 3] = 1.0
        pts.tofile(vd / f"{i:010d}.bin")
    split = tmp_path / "split"
    split.mkdir()
    (split / "test_files.txt").write_text(
        "".join(f"{DRIVE} {i} l\n" for i in range(N))
    )
    return root, split


def test_export_eigen_raw_gt(tree):
    root, split = tree
    out = export_eigen_raw_gt(str(root), str(split))
    data = np.load(out, allow_pickle=True)["data"]
    assert len(data) == N
    for i, gt in enumerate(data):
        gt = np.asarray(gt, np.float32)   # npz object-array round trip
        ref = generate_depth_map(
            os.path.join(str(root), DATE),
            os.path.join(str(root), DRIVE,
                         f"velodyne_points/data/{i:010d}.bin"),
            2, True,
        )
        np.testing.assert_allclose(gt, ref.astype(np.float32), rtol=1e-6)
        assert gt.max() > 0


def test_export_eigen_improved_gt(tree, tmp_path):
    root, split = tree
    depth_root = tmp_path / "kitti_depth"
    drive = DRIVE.split("/")[1]
    d = depth_root / drive / "proj_depth" / "groundtruth" / "image_02"
    d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    raws = []
    for i in range(N):
        raw = rng.integers(0, 20000, (375, 1242), np.uint16)
        Image.fromarray(raw, mode="I;16").save(d / f"{i:010d}.png")
        raws.append(raw)
    out = export_eigen_improved_gt(str(depth_root), str(split))
    data = np.load(out, allow_pickle=True)["data"]
    for raw, gt in zip(raws, data):
        gt = np.asarray(gt, np.float32)
        # the reference divides by 255 (NOT the KITTI-standard 256) —
        # reproduced for score parity (prepare_groundtruth.py:46)
        np.testing.assert_allclose(gt, raw.astype(np.float32) / 255.0,
                                   rtol=1e-6)
