"""Golden / oracle tests for loss primitives and resize ops."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from planedepth_tpu.ops import (
    compute_depth_errors,
    laplacian_pdf,
    multimodal_nll,
    resize_bilinear_align_corners,
    resize_nearest,
    smooth_loss_disp,
    smooth_loss_probability,
    ssim,
    upsample2x_nearest,
)

RNG = np.random.default_rng(2)


def test_laplacian_golden():
    # 0.5*exp(-|e|/b)/b at e=0, b=1 -> 0.5
    assert float(laplacian_pdf(jnp.array(0.0), jnp.array(1.0))) == 0.5
    np.testing.assert_allclose(
        float(laplacian_pdf(jnp.array(2.0), jnp.array(0.5))),
        0.5 * np.exp(-4.0) / 0.5,
        rtol=1e-6,
    )


def test_multimodal_nll_single_mode():
    # single plane with pi=1: NLL = -log(lap(e, s) + 1e-7)
    e = jnp.full((1, 2, 2, 1), 0.3)
    s = jnp.full((1, 2, 2, 1), 0.2)
    pi = jnp.ones((1, 2, 2, 1))
    out = np.asarray(multimodal_nll(e, s, pi, dist="lap"))
    expected = -np.log(0.5 * np.exp(-0.3 / 0.2) / 0.2 + 1e-7)
    np.testing.assert_allclose(out, expected, rtol=1e-4)
    assert out.shape == (1, 2, 2, 1)


def test_smooth_loss_matches_torch_formula():
    disp = RNG.standard_normal((2, 6, 8, 1)).astype(np.float32)
    img = RNG.uniform(0, 1, (2, 6, 8, 3)).astype(np.float32)
    ours = float(smooth_loss_disp(jnp.asarray(disp), jnp.asarray(img), gamma=2.0))

    d = torch.from_numpy(np.moveaxis(disp, -1, 1).copy())
    im = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    gdx = torch.abs(d[..., :-1] - d[..., 1:])
    gdy = torch.abs(d[..., :-1, :] - d[..., 1:, :])
    gix = torch.mean(torch.abs(im[..., :-1] - im[..., 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(im[..., :-1, :] - im[..., 1:, :]), 1, keepdim=True)
    ref = (gdx * torch.exp(-2.0 * gix)).mean() + (gdy * torch.exp(-2.0 * giy)).mean()
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_smooth_loss_probability_runs():
    p = jnp.asarray(RNG.uniform(0, 1, (1, 5, 7, 4)).astype(np.float32))
    d = jnp.asarray(RNG.uniform(1, 10, (1, 5, 7, 4)).astype(np.float32))
    img = jnp.asarray(RNG.uniform(0, 1, (1, 5, 7, 3)).astype(np.float32))
    v = float(smooth_loss_probability(p, d, img, gamma=2.0))
    assert np.isfinite(v) and v > 0


def test_ssim_matches_torch():
    x = RNG.uniform(0, 1, (2, 8, 9, 3)).astype(np.float32)
    y = RNG.uniform(0, 1, (2, 8, 9, 3)).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))

    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    yt = torch.from_numpy(np.moveaxis(y, -1, 1).copy())
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    xt, yt = refl(xt), refl(yt)
    mu_x, mu_y = pool(xt), pool(yt)
    sig_x = pool(xt**2) - mu_x**2
    sig_y = pool(yt**2) - mu_y**2
    sig_xy = pool(xt * yt) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sig_xy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sig_x + sig_y + 0.03**2)
    ref = torch.clamp((1 - n / d) / 2, 0, 1)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_depth_errors_golden():
    gt = jnp.array([1.0, 2.0, 4.0])
    pred = jnp.array([1.0, 2.0, 4.0])
    m = compute_depth_errors(gt, pred)
    assert float(m["de/abs_rel"]) == 0.0
    assert float(m["da/a1"]) == 1.0
    pred2 = gt * 1.3
    m2 = compute_depth_errors(gt, pred2)
    np.testing.assert_allclose(float(m2["de/abs_rel"]), 0.3, rtol=1e-5)
    assert float(m2["da/a1"]) == 0.0  # 1.3 > 1.25
    assert float(m2["da/a2"]) == 1.0


def test_depth_errors_weighted_equals_subset():
    gt = jnp.asarray(RNG.uniform(1, 10, (20,)).astype(np.float32))
    pred = jnp.asarray(RNG.uniform(1, 10, (20,)).astype(np.float32))
    w = (np.arange(20) % 2 == 0).astype(np.float32)
    m_w = compute_depth_errors(gt, pred, weights=jnp.asarray(w))
    m_s = compute_depth_errors(gt[::2], pred[::2])
    for k in m_w:
        np.testing.assert_allclose(float(m_w[k]), float(m_s[k]), rtol=1e-5)


# --- resize ops ------------------------------------------------------------

def test_upsample2x_matches_torch():
    x = RNG.standard_normal((2, 3, 5, 4)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    ref = F.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()), scale_factor=2,
        mode="nearest",
    )
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1))


@pytest.mark.parametrize("size", [(7, 13), (3, 4), (12, 20)])
def test_bilinear_align_corners_matches_torch(size):
    x = RNG.standard_normal((2, 6, 8, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), size))
    ref = F.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()), size=size,
        mode="bilinear", align_corners=True,
    )
    np.testing.assert_allclose(
        ours, np.moveaxis(ref.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("size", [(3, 4), (6, 8), (5, 7)])
def test_nearest_resize_matches_torch(size):
    x = RNG.standard_normal((1, 6, 8, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), size))
    ref = F.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()), size=size,
        mode="nearest",
    )
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1))


def test_smooth_loss_disp_quad_matches_full_res():
    """Phase-domain smoothness == full-res smoothness on the unpacked
    tensors (same pixel pairs, different summation order)."""
    from planedepth_tpu.ops.losses import smooth_loss_disp, smooth_loss_disp_quad
    from planedepth_tpu.ops.pallas_sweep_quad import d2s_quad, s2d_image

    rng = np.random.default_rng(0)
    B, Hq, Wq = 2, 6, 10
    dq = jnp.asarray(rng.standard_normal((B, 4, Hq, Wq)), jnp.float32)
    img = jnp.asarray(rng.random((B, 2 * Hq, 2 * Wq, 3)), jnp.float32)

    full = smooth_loss_disp(d2s_quad(dq), img, gamma=2.0)
    quad = smooth_loss_disp_quad(dq, s2d_image(img), gamma=2.0)
    np.testing.assert_allclose(float(quad), float(full), rtol=1e-6)
