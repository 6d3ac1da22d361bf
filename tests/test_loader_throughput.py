"""Loader throughput proof (VERDICT r2 #8): the host input pipeline must
sustain the device rate.

Builds a synthetic on-disk KITTI RAW tree (PNG stereo pairs at the real
1242x375 resolution + velodyne bins + calib) and drives the REAL
``KITTIRAWDataset -> BatchLoader`` path — PIL decode, RandomResizeCrop
(bicubic + grid), photometric augs, velodyne->depth projection — timing
images/sec.

Context for the floor below: this CI box has ONE shared CPU core, while a
real v4-8/v5e TPU-VM host has 120-240; thread-count scaling cannot be
demonstrated here, only per-core cost.  The assertion therefore checks a
per-core floor: at >= 1.0 imgs/s/core, a 200-core TPU-VM host sustains
>= 200 imgs/s, comfortably above any device rate this framework reaches
(r3 target ~20-50 imgs/s/chip, 8 chips, with 12 loader threads by
default — reference options.py:217-220).
"""
import os
import time

import numpy as np
import pytest
from PIL import Image

from planedepth_tpu.data.kitti import KITTIRAWDataset
from planedepth_tpu.data.loader import BatchLoader, EpochSampler

from tests.test_kitti_utils import _write_calib

pytestmark = pytest.mark.heavy

N_FRAMES = 16
DATE = "2011_09_26"
DRIVE = f"{DATE}/{DATE}_drive_0001_sync"


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    (root / DATE).mkdir(parents=True)
    _write_calib(root / DATE)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (375, 1242, 3), np.uint8)
    for side in ("image_02", "image_03"):
        d = root / DRIVE / side / "data"
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            # roll the same texture so every PNG encodes/decodes fully but
            # setup stays fast
            img = np.roll(base, 7 * i, axis=1)
            Image.fromarray(img).save(d / f"{i:010d}.png")
    vd = root / DRIVE / "velodyne_points" / "data"
    vd.mkdir(parents=True)
    pts = np.empty((100_000, 4), np.float32)          # realistic scan size
    pts[:, 0] = rng.uniform(2, 60, len(pts))          # forward
    pts[:, 1] = rng.uniform(-20, 20, len(pts))        # left
    pts[:, 2] = rng.uniform(-2, 2, len(pts))          # up
    pts[:, 3] = 1.0
    for i in range(N_FRAMES):
        pts.tofile(vd / f"{i:010d}.bin")
    return root


def _mkdir_calib(path):
    os.makedirs(path, exist_ok=True)


def test_loader_sustains_per_core_floor(kitti_tree):
    files = [f"{DRIVE} {i} l" for i in range(N_FRAMES)]
    ds = KITTIRAWDataset(
        str(kitti_tree), files, 384, 1280, novel_frame_ids=(),
        is_train=True, use_crop=True, img_ext=".png", seed=0,
    )
    batch = 4
    sampler = EpochSampler(len(ds), batch, shuffle=True, seed=0)
    loader = BatchLoader(ds, sampler, num_workers=4)

    # warm (imports, PIL lazy init, page cache)
    for b in loader.epoch(0):
        assert b["color_l"].shape == (batch, 384, 1280, 3)
        assert "depth_gt_l" in b
        break

    n_imgs = 0
    t0 = time.perf_counter()
    for epoch in range(2):
        for b in loader.epoch(epoch):
            n_imgs += b["color_l"].shape[0]
    dt = time.perf_counter() - t0
    rate = n_imgs / dt
    n_cpus = os.cpu_count() or 1
    # production extrapolation: the TPU chip consumes ~19 imgs/s at HR
    # pc-off (BENCH_r04).  Loading parallelizes linearly across worker
    # processes (independent PIL decode + numpy aug per sample), so the
    # host cores needed per chip = chip rate / per-core rate — print it
    # so the host-sizing answer travels with the measurement.
    chip_rate = 19.0
    cores_needed = chip_rate / max(rate / min(4, n_cpus), 1e-9)
    print(f"\nloader throughput: {rate:.2f} imgs/s "
          f"({n_imgs} imgs in {dt:.1f} s, {n_cpus} cpus visible); "
          f"~{cores_needed:.0f} worker cores keep one v5e chip "
          f"({chip_rate} imgs/s) fed")
    assert rate >= 1.0, (
        f"loader fell below the 1.0 imgs/s/core floor: {rate:.2f}; "
        "PIL decode / bicubic / velodyne projection regressed"
    )
