"""Golden-value and oracle tests for pose algebra, plane volumes, warps."""
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.config import PlaneConfig
from planedepth_tpu.geometry import (
    backproject_depth,
    build_plane_volume,
    create_camera_plane,
    disp_warp_coords,
    disp_warp_shift,
    depth_warp_coords,
    homography_warp_coords,
    identity_norm_grid,
    pixel_intrinsics,
    project_3d,
    rc_correction,
    rot_from_axisangle,
    transformation_from_parameters,
)

RNG = np.random.default_rng(1)


# --- pose algebra ----------------------------------------------------------

def test_rot_from_axisangle_z90():
    vec = jnp.array([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(rot_from_axisangle(vec))[0]
    expected = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    np.testing.assert_allclose(R, expected, atol=2e-5)


def test_transformation_invert_roundtrip():
    aa = jnp.asarray(RNG.uniform(-0.1, 0.1, (3, 1, 3)).astype(np.float32))
    t = jnp.asarray(RNG.uniform(-0.5, 0.5, (3, 1, 3)).astype(np.float32))
    T = transformation_from_parameters(aa[:, 0], t[:, 0], invert=False)
    Ti = transformation_from_parameters(aa[:, 0], t[:, 0], invert=True)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4))
    np.testing.assert_allclose(np.asarray(T @ Ti), eye, atol=1e-5)


def test_rc_identity_grid_is_identity_rotationish():
    grid = identity_norm_grid(8, 16)[None]
    Rc = np.asarray(rc_correction(grid))[0]
    # centered grid: gx0 = gy0 = 0, f = 1 -> Rc = I
    np.testing.assert_allclose(Rc, np.eye(3), atol=1e-6)


# --- camera ----------------------------------------------------------------

def test_backproject_project_roundtrip():
    H, W = 6, 8
    K = jnp.asarray(pixel_intrinsics(W, H))[None]
    inv_K = jnp.linalg.inv(K)
    depth = jnp.asarray(
        RNG.uniform(1.0, 10.0, (1, H, W)).astype(np.float32)
    )
    pts = backproject_depth(depth, inv_K)
    T = jnp.eye(4)[None]
    coords = np.asarray(project_3d(pts, K, T, H, W))
    # identity pose: projected coords == identity normalized grid
    expected = np.asarray(identity_norm_grid(H, W))
    np.testing.assert_allclose(coords[0], expected, atol=1e-4)


def test_camera_plane_center_ray():
    H, W = 10, 20
    plane = np.asarray(create_camera_plane(H, W))
    # principal point (0.5W, 0.5H) -> ray (0, 0, 1)
    # pixel (0.5*W) is index W/2 at x; K has cx=0.5*W so x=W/2 maps to 0
    ray = plane[H // 2, W // 2]
    assert abs(ray[2] - 1.0) < 1e-6
    assert abs(ray[0]) < 0.1 and abs(ray[1]) < 0.2


# --- plane volume ----------------------------------------------------------

def _grid(B, H, W):
    return jnp.broadcast_to(identity_norm_grid(H, W)[None], (B, H, W, 2))


def test_vertical_plane_spacing_geometric():
    cfg = PlaneConfig(disp_levels=49, xz_levels=0, yz_levels=0)
    H, W = 12, 40
    vol = build_plane_volume(_grid(1, H, W), cfg, W)
    d = np.asarray(vol.disp_layered)[0, 0, 0]
    assert d.shape == (49,)
    np.testing.assert_allclose(d[0], 300.0, rtol=1e-6)
    np.testing.assert_allclose(d[-1], 2.0, rtol=1e-6)
    ratios = d[1:] / d[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)
    # distance = 0.1*0.58*W/disp
    np.testing.assert_allclose(
        np.asarray(vol.distance)[0], 0.1 * 0.58 * W / d, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(vol.padding_mask), 1.0)


def test_ground_planes_vary_with_row_only():
    cfg = PlaneConfig(disp_levels=4, xz_levels=3, yz_levels=0)
    H, W = 16, 32
    vol = build_plane_volume(_grid(2, H, W), cfg, W)
    d = np.asarray(vol.disp_layered)
    assert d.shape == (2, H, W, 7)
    g = d[..., 4:]
    # constant along width
    np.testing.assert_allclose(
        g, np.broadcast_to(g[:, :, :1, :], g.shape), rtol=1e-6
    )
    # mask invalid above horizon (y < 1e-7 ~ top half)
    m = np.asarray(vol.padding_mask)[0, :, 0, 4]
    assert m[: H // 2].max() == 0.0
    assert m[-1] == 1.0
    # ground-plane normals point "down+forward", unit length
    n = np.asarray(vol.normal)[0, 4]
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, rtol=1e-6)
    assert n[0] == 0.0 and n[1] > 0.9


def test_ground_plane_disparity_formula():
    cfg = PlaneConfig(disp_levels=2, xz_levels=2, yz_levels=0)
    H, W = 8, 16
    vol = build_plane_volume(_grid(1, H, W), cfg, W)
    gy = np.asarray(identity_norm_grid(H, W))[..., 1]
    y = np.maximum(gy[-1, 0], 1e-7)  # bottom row
    h = cfg.xz_min  # first ground level
    # fs_row for identity grid = 1
    ground = h * 1.92 / (y / 2.0) * 1.0
    expected = 0.1 * 0.58 * W / ground
    got = np.asarray(vol.disp_layered)[0, -1, 0, cfg.disp_levels]
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_yz_planes_masks_and_shapes():
    cfg = PlaneConfig(disp_levels=2, xz_levels=2, yz_levels=4)
    H, W = 8, 16
    vol = build_plane_volume(_grid(1, H, W), cfg, W)
    assert vol.disp_layered.shape == (1, H, W, 8)
    assert vol.normal.shape == (1, 8, 3)
    m = np.asarray(vol.padding_mask)
    # right-set yz planes valid on right half, left-set on left half
    assert m[0, 0, -1, 4] == 1.0 and m[0, 0, 0, 4] == 0.0
    assert m[0, 0, 0, 6] == 1.0 and m[0, 0, -1, 6] == 0.0
    # left/right normals are opposite
    n = np.asarray(vol.normal)[0]
    np.testing.assert_allclose(n[4], -n[6], atol=1e-6)


def test_plane_residual_shifts_levels():
    cfg = PlaneConfig(disp_levels=8, xz_levels=0, yz_levels=0)
    H, W = 4, 8
    res = jnp.full((1, 8), 0.25)
    vol0 = build_plane_volume(_grid(1, H, W), cfg, W)
    vol1 = build_plane_volume(_grid(1, H, W), cfg, W, residual_levels=res)
    d0 = np.asarray(vol0.disp_layered)[0, 0, 0]
    d1 = np.asarray(vol1.disp_layered)[0, 0, 0]
    expected = 300.0 * (2.0 / 300.0) ** ((np.arange(8) + 0.25) / 7.0)
    np.testing.assert_allclose(d1, expected, rtol=1e-5)
    assert (d1 < d0).all()


# --- warps -----------------------------------------------------------------

def test_disp_warp_shift_sign():
    d = jnp.ones((1, 2, 3, 4))  # (B, H, W, N)
    s_r = np.asarray(disp_warp_shift(d, "r"))
    s_l = np.asarray(disp_warp_shift(d, "l"))
    assert s_r.shape == (1, 4, 2, 3)
    np.testing.assert_allclose(s_r, 1.0)
    np.testing.assert_allclose(s_l, -1.0)


def test_disp_and_depth_warp_agree_for_stereo():
    """depth_warp with a pure +0.1 x-translation of a constant-disparity
    plane equals the +disp horizontal shift.

    NOTE the reference's warp-mode sign asymmetry: with the stereo Rt_r
    (t_x = -0.1, mono_dataset.py:205-206) its depth_warp branch yields
    x - disp while its disp_warp branch uses x + disp — the modes are NOT
    interchangeable for stereo in the reference either (depth_warp is only
    exercised with learned/colmap poses, which absorb the convention)."""
    H, W, N = 6, 12, 3
    # moderate disparities: at disp_max=300 the projected depth is so small
    # that Project3D's +1e-7 z-guard shifts coords past the 1e-3 tolerance
    cfg = PlaneConfig(disp_levels=N, disp_min=2, disp_max=20,
                      xz_levels=0, yz_levels=0)
    grid = _grid(1, H, W)
    vol = build_plane_volume(grid, cfg, W)
    K = jnp.asarray(pixel_intrinsics(W, H))[None]
    inv_K = jnp.linalg.inv(K)
    T = jnp.eye(4).at[0, 3].set(0.1)[None]   # Rt_l (mono_dataset.py:203-204)
    coords_depth = np.asarray(
        depth_warp_coords(vol.disp_layered, T, K, inv_K, W)
    )
    coords_disp = np.asarray(disp_warp_coords(vol.disp_layered, "r", W, H))
    np.testing.assert_allclose(coords_depth, coords_disp, atol=1e-3)


def test_homography_warp_identity_pose_frontal_plane():
    """Identity pose: homography is identity -> coords = identity grid,
    all pixels visible for a frontal plane."""
    H, W = 6, 10
    d = jnp.array([[2.0]])
    n = jnp.array([[[0.0, 0.0, 1.0]]])
    K = jnp.asarray(pixel_intrinsics(W, H))[None]
    inv_K = jnp.linalg.inv(K)
    T = jnp.eye(4)[None]
    coords, mask = homography_warp_coords(d, n, T, K, inv_K, H, W)
    np.testing.assert_allclose(
        np.asarray(coords)[0, 0], np.asarray(identity_norm_grid(H, W)),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(mask), 1.0)


def test_homography_matches_disp_warp_frontal():
    """A frontal plane at depth d with the stereo Rt_r: the homography warp
    (which INVERTS H_s2t, layers.py:219-221) equals the +disp shift of the
    disp_warp branch — the two modes agree for stereo, unlike depth_warp."""
    H, W = 8, 16
    depth = 3.7
    d = jnp.array([[depth]])
    n = jnp.array([[[0.0, 0.0, 1.0]]])
    K = jnp.asarray(pixel_intrinsics(W, H))[None]
    inv_K = jnp.linalg.inv(K)
    T = jnp.eye(4).at[0, 3].set(-0.1)[None]  # Rt_r
    coords_h, mask = homography_warp_coords(d, n, T, K, inv_K, H, W)
    disp = jnp.full((1, H, W, 1), 0.1 * 0.58 * W / depth)
    coords_d = disp_warp_coords(disp, "r", W, H)
    np.testing.assert_allclose(
        np.asarray(coords_h), np.asarray(coords_d), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(mask), 1.0)
