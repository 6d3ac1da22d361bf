"""Loss primitives: mixture NLL, edge-aware smoothness, depth metrics.

Reference semantics: layers.py:243-273 (smoothness), :356-374 (metrics),
:451-466 (Laplacian/Gaussian mixture NLL).  Plane axis is LAST here
(``(B, H, W, N)``), matching the rest of the TPU build.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_pdf(error: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """(reference layers.py:451-452)"""
    return (
        jnp.exp(-0.5 * error**2 / sigma**2) / sigma / np.sqrt(2.0 * np.pi)
    )


def laplacian_pdf(error: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(reference layers.py:454-455)"""
    return 0.5 * jnp.exp(-jnp.abs(error) / b) / b


def multimodal_nll(
    error: jnp.ndarray,
    sigma: jnp.ndarray,
    pi: jnp.ndarray,
    dist: str = "lap",
    axis: int = -1,
) -> jnp.ndarray:
    """Mixture negative log-likelihood over the plane axis.

    ``-log(sum_n pi_n * p(error_n; sigma_n) + 1e-7)``
    (reference layers.py:465-466).  Keeps the reduced axis with size 1.

    The clamp-to-zero guards the render_probability+ground-planes combo,
    where inter-plane distances go negative at the vertical->ground
    junction and the alpha-composited "probabilities" leave [0, 1] — the
    reference takes log of a negative mixture there (NaN).
    """
    pdf = gaussian_pdf if dist == "gaussian" else laplacian_pdf
    mix = jnp.sum(pi * pdf(error, sigma), axis=axis, keepdims=True)
    return -jnp.log(jnp.maximum(mix, 0.0) + 1e-7)


def smooth_loss_disp(
    disp: jnp.ndarray, img: jnp.ndarray, gamma: float = 1.0
) -> jnp.ndarray:
    """Edge-aware first-order smoothness on a disparity map.

    Reference layers.py:243-256.  Inputs are NHWC: disp ``(B, H, W, 1)``,
    img ``(B, H, W, 3)``.
    """
    dx = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    dy = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    ix = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), -1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), -1, keepdims=True)
    dx = dx * jnp.exp(-gamma * ix)
    dy = dy * jnp.exp(-gamma * iy)
    return jnp.mean(dx) + jnp.mean(dy)


def smooth_loss_disp_quad(
    dq: jnp.ndarray, iq: jnp.ndarray, gamma: float = 1.0
) -> jnp.ndarray:
    """``smooth_loss_disp`` computed directly on phase-split (quad)
    tensors — the same pixel pairs as the full-resolution version on
    ``d2s_quad(dq)`` / ``d2s_quad(iq)`` (summation order differs), so the
    production step never materializes a full-res disparity for the
    smoothness term (reference layers.py:243-256; crop trainer.py:768).

    dq: ``(B, 4, Hq, Wq)`` disparity, ph = 2*py + px.
    iq: ``(B, 12, Hq, Wq)`` image, channels (py, px, rgb).

    A full-res x-neighbor pair (2w+px, 2w+px+1) is a phase pair at the
    same half-column (px=0) or a (px=1, w) -> (px=0, w+1) pair; y pairs
    decompose identically over py.
    """
    B, _, Hq, Wq = dq.shape
    d = [dq[:, ph].astype(jnp.float32) for ph in range(4)]   # (B, Hq, Wq)
    im = iq.reshape(B, 4, 3, Hq, Wq)
    i = [im[:, ph].astype(jnp.float32) for ph in range(4)]   # (B, 3, Hq, Wq)

    def term(dA, dB, iA, iB):
        w = jnp.exp(-gamma * jnp.mean(jnp.abs(iA - iB), axis=1))
        return jnp.sum(jnp.abs(dA - dB) * w)

    # x gradients: even x = (px0, px1) at the same half-column; odd x =
    # (px1, w) -> (px0, w + 1)
    sx = (
        term(d[0], d[1], i[0], i[1]) + term(d[2], d[3], i[2], i[3])
        + term(d[1][:, :, :-1], d[0][:, :, 1:],
               i[1][:, :, :, :-1], i[0][:, :, :, 1:])
        + term(d[3][:, :, :-1], d[2][:, :, 1:],
               i[3][:, :, :, :-1], i[2][:, :, :, 1:])
    )
    n_x = B * Hq * 2 * (2 * Wq - 1)

    # y gradients: even y = (py0, py1) at the same half-row; odd y =
    # (py1, h) -> (py0, h + 1)
    sy = (
        term(d[0], d[2], i[0], i[2]) + term(d[1], d[3], i[1], i[3])
        + term(d[2][:, :-1], d[0][:, 1:],
               i[2][:, :, :-1], i[0][:, :, 1:])
        + term(d[3][:, :-1], d[1][:, 1:],
               i[3][:, :, :-1], i[1][:, :, 1:])
    )
    n_y = B * Wq * 2 * (2 * Hq - 1)
    return sx / n_x + sy / n_y


def smooth_loss_probability(
    probability: jnp.ndarray,
    disp_layered: jnp.ndarray,
    img: jnp.ndarray,
    gamma: float = 1.0,
) -> jnp.ndarray:
    """Probability-volume variant of the smoothness loss
    (reference layers.py:258-273).  Plane axis last: ``(B, H, W, N)``."""
    dpx = jnp.abs(probability[:, :, :-1, :] - probability[:, :, 1:, :]) * (
        disp_layered[:, :, :-1, :] + disp_layered[:, :, 1:, :]
    ) / 2.0
    dpx = jnp.sum(dpx, axis=-1, keepdims=True)
    dpy = jnp.abs(probability[:, :-1, :, :] - probability[:, 1:, :, :]) * (
        disp_layered[:, :-1, :, :] + disp_layered[:, 1:, :, :]
    ) / 2.0
    dpy = jnp.sum(dpy, axis=-1, keepdims=True)
    ix = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), -1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), -1, keepdims=True)
    dpx = dpx * jnp.exp(-gamma * ix)
    dpy = dpy * jnp.exp(-gamma * iy)
    return jnp.mean(dpx) + jnp.mean(dpy)


def compute_depth_errors(gt: jnp.ndarray, pred: jnp.ndarray, weights=None):
    """Seven standard depth metrics (reference layers.py:356-374).

    Args:
      gt, pred: flat (or broadcastable) positive depth arrays.
      weights: optional 0/1 mask for jit-friendly masked evaluation (the
        reference boolean-indexes, which is shape-dynamic; a weighted mean is
        the XLA-native equivalent).

    Returns:
      dict of scalars: abs_rel, sq_rel, rms, log_rms, a1, a2, a3.
    """
    if weights is None:
        weights = jnp.ones_like(gt)
    wsum = jnp.maximum(jnp.sum(weights), 1.0)

    def wmean(x):
        return jnp.sum(x * weights) / wsum

    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = wmean((thresh < 1.25).astype(gt.dtype))
    a2 = wmean((thresh < 1.25**2).astype(gt.dtype))
    a3 = wmean((thresh < 1.25**3).astype(gt.dtype))
    rmse = jnp.sqrt(wmean((gt - pred) ** 2))
    # guard the log against masked-out zeros
    safe_gt = jnp.where(weights > 0, gt, 1.0)
    safe_pred = jnp.where(weights > 0, pred, 1.0)
    rmse_log = jnp.sqrt(wmean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2))
    abs_rel = wmean(jnp.abs(gt - pred) / jnp.where(weights > 0, gt, 1.0))
    sq_rel = wmean((gt - pred) ** 2 / jnp.where(weights > 0, gt, 1.0))
    return {
        "de/abs_rel": abs_rel,
        "de/sq_rel": sq_rel,
        "de/rms": rmse,
        "de/log_rms": rmse_log,
        "da/a1": a1,
        "da/a2": a2,
        "da/a3": a3,
    }
