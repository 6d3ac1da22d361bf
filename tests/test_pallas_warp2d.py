"""The fused 2-D warp kernel (ops/pallas_warp2d.py) == the grid_sample
oracle: forward, gradients, degenerate-coordinate safety, and the
static-tap spread statistics of realistic KITTI mono poses.

The kernel is the TPU path for the monocular homography_warp/depth_warp
training modes (reference trainer.py:533-538,556-560, layers.py:184-234);
the oracle reproduces F.grid_sample(zeros padding) + pmask semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.ops.pallas_warp2d import (
    oracle_warp2d,
    prepare_coords,
    tile_anchors,
    warp2d_sample,
)

B, N, H, W = 1, 3, 16, 128
ROWS, SX, SY = 8, 6, 4


def _data(seed=0, degenerate=False):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32))
    logits = jnp.asarray(rng.randn(B, N, H, W).astype(np.float32))
    sigma = jnp.asarray(
        (0.1 + 0.8 * rng.rand(B, N, H, W)).astype(np.float32))
    # smooth displacements with bounded per-tile windows, including
    # boundary-partial samples (the right edge reads the zero margins)
    dx = jnp.asarray(
        (4.0 * rng.rand(B, N, 1, 1) + 1.2 * rng.rand(B, N, H, W)
         - 2.0).astype(np.float32))
    dy = jnp.asarray(
        (1.5 * rng.randn(B, N, 1, 1) + 0.6 * rng.rand(B, N, H, W)
         - 0.3).astype(np.float32))
    if degenerate:
        # homography z -> 0 blowups: huge coordinates at scattered pixels
        blow = rng.rand(B, N, H, W) < 0.05
        dx = jnp.where(blow, 1e12, dx)
        dy = jnp.where(blow, -3e9, dy)
    mask = jnp.ones((B, N, H, W), jnp.float32)
    return src, logits, sigma, dx, dy, mask


def _pack(logits, sigma):
    if sigma is None:
        return logits
    return jnp.stack([logits, sigma], 2).reshape(B, 2 * N, H, W)


def _run_pair(src, ls, dx, dy, mask, with_sigma):
    out_k = warp2d_sample(src, ls, dx, dy, mask, rows=ROWS, sx=SX, sy=SY,
                          with_sigma=with_sigma, interpret=True)
    dxp, dyp, mp = prepare_coords(dx, dy, mask, H, W, rows=ROWS)
    out_o = oracle_warp2d(src, ls, dxp, dyp, mp, with_sigma=with_sigma)
    return out_k, out_o


@pytest.mark.parametrize("with_sigma", [True, False])
def test_forward_parity(with_sigma):
    src, logits, sigma, dx, dy, mask = _data()
    ls = _pack(logits, sigma if with_sigma else None)
    out_k, out_o = _run_pair(src, ls, dx, dy, mask, with_sigma)
    assert len(out_k) == (3 if with_sigma else 2)
    for a, b, name in zip(out_k, out_o, ["rgb", "logit", "sigma"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name)


def test_gradient_parity():
    src, logits, sigma, dx, dy, mask = _data(seed=1)
    ls = _pack(logits, sigma)
    weights = [1.0, 0.5, 0.25]

    def loss_k(ls, dx, dy):
        o = warp2d_sample(src, ls, dx, dy, mask, rows=ROWS, sx=SX, sy=SY,
                          with_sigma=True, interpret=True)
        return sum((x.astype(jnp.float32) ** 2).sum() * w
                   for x, w in zip(o, weights))

    def loss_o(ls, dx, dy):
        dxp, dyp, mp = prepare_coords(dx, dy, mask, H, W, rows=ROWS)
        o = oracle_warp2d(src, ls, dxp, dyp, mp, with_sigma=True)
        return sum((x.astype(jnp.float32) ** 2).sum() * w
                   for x, w in zip(o, weights))

    gk = jax.grad(loss_k, (0, 1, 2))(ls, dx, dy)
    go = jax.grad(loss_o, (0, 1, 2))(ls, dx, dy)
    for a, b, name in zip(gk, go, ["d_ls", "d_dx", "d_dy"]):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < 1e-5, (name, rel)


def test_degenerate_coords_safe():
    """1e12-scale homography blowups: folded into the mask outside the
    kernel, no NaN/inf anywhere, and still oracle-exact at the surviving
    pixels."""
    src, logits, sigma, dx, dy, mask = _data(seed=2, degenerate=True)
    ls = _pack(logits, sigma)
    out_k, out_o = _run_pair(src, ls, dx, dy, mask, True)
    for a, b, name in zip(out_k, out_o, ["rgb", "logit", "sigma"]):
        assert bool(jnp.all(jnp.isfinite(a))), name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name)
    # the degenerate pixels themselves sampled exactly 0
    dxp, dyp, mp = prepare_coords(dx, dy, mask, H, W, rows=ROWS)
    dead = np.asarray(mp) == 0.0
    assert dead.any()
    assert np.all(np.asarray(out_k[1])[dead] == 0.0)


def test_prepare_coords_fold():
    """Fully-out-of-range samples are folded into the mask and their
    displacement replaced by the tile's valid minimum; boundary-partial
    samples keep their true coordinates."""
    dx = jnp.zeros((1, 1, 8, 128), jnp.float32)
    dy = jnp.zeros((1, 1, 8, 128), jnp.float32)
    # lane 5: fully out along x; lane 6: boundary-partial (x in (-1, 0))
    dx = dx.at[0, 0, :, 5].set(-200.0)
    dx = dx.at[0, 0, :, 6].set(-6.5)
    mask = jnp.ones((1, 1, 8, 128), jnp.float32)
    dxp, dyp, mp = prepare_coords(dx, dy, mask, 8, 128, rows=8)
    assert float(mp[0, 0, 0, 5]) == 0.0
    assert float(mp[0, 0, 0, 6]) == 1.0
    assert float(dxp[0, 0, 0, 5]) == -6.5      # tile valid minimum
    assert float(dxp[0, 0, 0, 6]) == -6.5      # true coordinate kept
    # anchors are governed by valid samples only
    ax = tile_anchors(dxp, 8)
    assert int(ax[0, 0, 0, 0]) == -7


def _mono_pose(rng, t_fwd):
    """A realistic KITTI frame-to-frame pose in model units (stereo
    baseline 0.1 = 0.54 m): rotation up to ~0.6 deg per axis, lateral
    jitter ~0.01, forward translation ``t_fwd``."""
    from planedepth_tpu.geometry.pose import transformation_from_parameters

    aa = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, 3)).astype(np.float32))
    t = jnp.asarray(
        np.array([[[rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01),
                    t_fwd]]], np.float32))
    return transformation_from_parameters(aa[:, 0][:, None],
                                          t[:, 0][:, None])


def _spreads(d, rows=8, tile=128):
    """Per-(row-block, lane-tile) integer spread of a displacement field."""
    Bq, Nq, Hq, Wq = d.shape
    k = np.floor(np.asarray(d)).astype(np.int64)
    k = k.reshape(Bq, Nq, Hq // rows, rows, Wq // tile, tile)
    return (k.max(axis=(3, 5)) - k.min(axis=(3, 5))).reshape(Bq, Nq, -1)


@pytest.mark.heavy
def test_mono_pose_plan_coverage():
    """The production plane-group tap plan (train/mono.py:warp2d_plan)
    covers realistic KITTI mono poses exactly.

    The per-tile x-spread is zoom-dominated (~128 * |t_z| / Z_plane) and
    geometric in the plane index, so the plan assigns wide windows to the
    few near planes and cheap ones to the far bulk.  Pins: (a) every
    plane's measured spread at city-speed motion (t_z = 0.05, within the
    0.1 envelope x 1.5 aug margin) fits its group bound; (b) the plan's
    total tap cost stays bounded — a geometry change cannot silently
    blow compile time/VPU cost; (c) group bounds decrease near -> far."""
    from planedepth_tpu.config import PlaneConfig
    from planedepth_tpu.geometry import build_plane_volume, identity_norm_grid
    from planedepth_tpu.geometry.warp import homography_warp_coords
    from planedepth_tpu.train.mono import _coords_to_disp, warp2d_plan

    Hs, Ws = 192, 640
    cfgp = PlaneConfig(disp_levels=49, disp_min=2, disp_max=300,
                       xz_levels=14, yz_levels=0)
    plan = warp2d_plan(cfgp, "homography_warp", Hs, Ws, 8,
                       0.1, 1.5, 3, 4, 2, 96, 16)
    assert 1 <= len(plan) <= 3
    starts = [g[0] for g in plan]
    assert starts[0] == 0 and starts == sorted(starts)
    assert sum(g[1] for g in plan) == cfgp.all_levels
    # near -> far: non-increasing x bounds
    sxs = [g[2] for g in plan]
    assert sxs == sorted(sxs, reverse=True), plan
    # cost budget: <= 4x the uniform far-plane baseline (N * 18 * 10);
    # the r4 plan measures ~3.2x: ((0,10,96,13),(10,7,59,7),(17,46,32,9))
    cost = sum(n * (sx + 2) * (sy + 2) for (_, n, sx, sy) in plan)
    assert cost <= 4 * cfgp.all_levels * 18 * 10, (cost, plan)

    # measured spreads at city-speed motion fit the per-group bounds
    grid = jnp.broadcast_to(identity_norm_grid(Hs, Ws)[None],
                            (1, Hs, Ws, 2))
    vol = build_plane_volume(grid, cfgp, Ws)
    K = np.array([[0.58 * Ws, 0, 0.5 * Ws, 0],
                  [0, 1.92 * Hs, 0.5 * Hs, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)[None]
    inv_K = np.linalg.pinv(K[0])[None].astype(np.float32)
    rng = np.random.RandomState(0)
    T = _mono_pose(rng, 0.05)
    coords, pmask = homography_warp_coords(
        vol.distance, vol.normal, jnp.asarray(T), jnp.asarray(K),
        jnp.asarray(inv_K), Hs, Ws)
    dx, dy = _coords_to_disp(coords.astype(jnp.float32), Hs, Ws)
    dx, dy, _ = prepare_coords(dx, dy, pmask.astype(jnp.float32), Hs, Ws)
    sx_meas = _spreads(dx)[0].max(axis=-1)             # (N,)
    sy_meas = _spreads(dy)[0].max(axis=-1)
    for (s0, n, sx, sy) in plan:
        assert sx_meas[s0 : s0 + n].max() <= sx, (s0, n, sx)
        assert sy_meas[s0 : s0 + n].max() <= sy, (s0, n, sy)
