"""Native C++ data-prep kernels vs. the numpy oracles."""
import numpy as np
import pytest

from planedepth_tpu.data import native
from planedepth_tpu.data.transforms import (
    _get_matrix,
    resize_nearest_np,
)

RNG = np.random.default_rng(11)

requires_native = pytest.mark.skipif(
    not native.available(), reason="libpdnative.so not built"
)


def _numpy_bicubic(img, out_hw):
    H, W, C = img.shape
    Ho, Wo = out_hw
    my = _get_matrix(H, Ho)
    mx = _get_matrix(W, Wo)
    out = np.einsum("oh,hwc->owc", my, img)
    return np.einsum("ow,hwc->hoc", mx, out)


@requires_native
@pytest.mark.parametrize("size", [(24, 40), (96, 128), (7, 9)])
def test_native_bicubic_matches_numpy(size):
    img = RNG.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    ours = native.resize_bicubic_native(img, size)
    ref = _numpy_bicubic(img, size)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@requires_native
def test_native_nearest_matches_numpy():
    img = RNG.uniform(0, 1, (30, 44, 2)).astype(np.float32)
    ours = native.resize_nearest_native(img, (17, 23))
    ref = resize_nearest_np(img, (17, 23))
    np.testing.assert_allclose(ours, ref)


@requires_native
def test_native_photometric_matches_numpy():
    img = RNG.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    gamma, brightness = 1.1, 1.7
    cf = np.array([0.9, 1.05, 1.15], np.float32)
    ref = img.copy() ** gamma
    ref = np.minimum(ref * brightness, 1.0)
    ref = np.minimum(ref * cf, 1.0)
    ours = native.photometric_aug_native(img.copy(), gamma, brightness, cf)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@requires_native
def test_native_velodyne_projection_matches_numpy():
    n = 5000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = RNG.uniform(-5, 40, n)       # forward
    pts[:, 1] = RNG.uniform(-20, 20, n)      # left
    pts[:, 2] = RNG.uniform(-3, 3, n)        # up
    pts[:, 3] = 1.0
    # simple projection: camera looks along +x of velodyne frame
    P = np.array(
        [[700.0, -700.0, 0.0, 600.0],
         [700.0, 0.0, -700.0, 180.0],
         [1.0, 0.0, 0.0, 0.0]], np.float64
    )
    H, W = 370, 1220

    # numpy oracle (kitti_utils semantics)
    velo = pts[pts[:, 0] >= 0]
    proj = (P @ velo.T).T
    z = proj[:, 2]
    u = np.round(proj[:, 0] / z) - 1
    v = np.round(proj[:, 1] / z) - 1
    valid = (u >= 0) & (v >= 0) & (u < W) & (v < H)
    u, v, z = u[valid].astype(int), v[valid].astype(int), z[valid]
    ref = np.full((H, W), np.inf)
    np.minimum.at(ref, (v, u), z)
    ref[np.isinf(ref)] = 0
    ref[ref < 0] = 0

    ours = native.velodyne_to_depth_native(pts, P, H, W)
    np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-5,
                               atol=1e-4)


@requires_native
def test_native_u8_to_f32():
    img = RNG.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    ours = native.u8_to_f32_native(img)
    np.testing.assert_allclose(ours, img.astype(np.float32) / 255.0,
                               rtol=1e-6)
