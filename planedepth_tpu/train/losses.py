"""Training loss assembly (reference trainer.py:672-810).

Replicates the reference's *effective* behavior, including two quirks that
shape the published numbers:

  * the per-side normalization loop (trainer.py:765-766) rebinds a local
    and never divides the stored losses — so side losses are SUMMED, not
    averaged (harmless for stereo-only where len(target_sides) == 1);
  * the self-distillation term is added once per target side
    (trainer.py:758-761).

All image tensors are NHWC; probability tensors are plane-last (B, H, W, N).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from planedepth_tpu.config import LossConfig
from planedepth_tpu.ops.losses import (
    compute_depth_errors,
    multimodal_nll,
    smooth_loss_disp,
)
from planedepth_tpu.ops.ssim import ssim


def reprojection_loss(
    pred: jnp.ndarray, target: jnp.ndarray, use_ssim: bool
) -> jnp.ndarray:
    """L1 or 0.85*SSIM + 0.15*L1 per pixel (reference trainer.py:687-699)."""
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if use_ssim:
        s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
        return 0.85 * s + 0.15 * l1
    return l1


def perceptual_loss(
    pc_apply: Callable,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    source: Optional[jnp.ndarray] = None,
    remat: bool = True,
    packed: bool = False,
) -> jnp.ndarray:
    """VGG/ResNet feature MSE over 3 slices with optional automask min
    (reference trainer.py:672-685).

    ``packed``: inputs are space-to-depth NHWC images (B, H/2, W/2, 12)
    — the VGG stem consumes them directly (models/perceptual.py).

    Only the ``pred`` extraction is checkpointed (when ``remat``): it is
    the sole input carrying a cotangent, and without remat XLA stores its
    every VGG activation at full resolution — enough to OOM the HR
    batch-4 step on a 16G chip in the r3b layout era.  The target/source
    extractions never need remat: no cotangent enters them, so their
    internals are dead in the backward either way while their slice
    OUTPUTS are loss-graph residuals stored regardless — wrapping them
    was a no-op.  ``remat=False`` trades ~2 GB of pred residuals for one
    VGG forward per step.
    """
    kw = {"packed": True} if packed else {}
    pc_in = lambda img: pc_apply(img, **kw)   # kw static under checkpoint
    pc_pred = jax.checkpoint(pc_in) if remat else pc_in
    pred_f = pc_pred(pred)
    target_f = pc_in(target)
    source_f = pc_in(source) if source is not None else None
    loss = 0.0
    for i in range(3):
        l_p = jnp.mean(
            (pred_f[i].astype(jnp.float32) - target_f[i].astype(jnp.float32))
            ** 2,
            axis=-1, keepdims=True,
        )
        if source_f is not None:
            l_auto = jnp.mean(
                (source_f[i].astype(jnp.float32)
                 - target_f[i].astype(jnp.float32)) ** 2,
                axis=-1, keepdims=True,
            )
            l_p = jnp.minimum(l_p, l_auto)
        loss += jnp.mean(l_p)
    return loss


def compute_losses(
    cfg: LossConfig,
    target_sides,
    inputs: Dict[str, jnp.ndarray],
    outputs: Dict[str, jnp.ndarray],
    rec: Dict,
    pc_apply: Optional[Callable],
    alpha_pc: float,
    alpha_smooth: float,
    gamma_smooth: float,
    alpha_self: float,
    self_distillation: float,
    automask: bool,
    use_mixture_loss: bool,
) -> Dict[str, jnp.ndarray]:
    """Full loss dict (reference trainer.py:701-773)."""
    color_name = "color_aug" if cfg.match_aug else "color"
    losses: Dict[str, jnp.ndarray] = {
        "loss/ph_loss": 0.0,
        "loss/pc_loss": 0.0,
        "loss/total_loss": 0.0,
    }
    if alpha_self > 0.0:
        losses["loss/self_loss"] = 0.0

    mask = outputs.get("mask_novel")          # (B, H, W, 1) or None
    source = inputs[f"{color_name}_l"]

    for side in target_sides:
        total = 0.0
        pred = rec[("rgb_rec", side)]
        target = inputs[f"{color_name}_{side}"]
        if mask is not None:
            pred = pred * mask + target * (1.0 - mask)

        if use_mixture_loss:
            # error over planes: (B, H, W, N)
            rgb_layered = rec[("rgb_rec_layered", side)]     # (B,N,H,W,3)
            err = jnp.mean(
                jnp.abs(rgb_layered - target[:, None]), axis=-1
            )
            err = jnp.moveaxis(err, 1, -1)                    # (B,H,W,N)
            ph = multimodal_nll(
                err, rec[("sigma_rec", side)], rec[("pi_rec", side)],
                dist="lap",
            )                                                 # (B,H,W,1)
            if automask:
                err_auto = jnp.mean(
                    jnp.abs(source - target), axis=-1, keepdims=True
                )                                             # (B,H,W,1)
                ph_auto = multimodal_nll(
                    err_auto,
                    jax.lax.stop_gradient(rec[("sigma_rec", side)]),
                    jax.lax.stop_gradient(rec[("pi_rec", side)]),
                    dist="lap",
                )
                ph = jnp.minimum(ph, ph_auto)
            if mask is not None:
                ph = ph * mask
        else:
            ph = jnp.mean(jnp.abs(pred - target), axis=-1, keepdims=True)
            if automask:
                ph_auto = jnp.mean(
                    jnp.abs(source - target), axis=-1, keepdims=True
                )
                ph = jnp.minimum(ph, ph_auto)

        ph_loss = jnp.mean(ph)
        losses["loss/ph_loss"] += ph_loss
        total += ph_loss

        if pc_apply is not None:
            pc = perceptual_loss(
                pc_apply, pred, target, source if automask else None
            )
            losses["loss/pc_loss"] += pc
            total += alpha_pc * pc

        if alpha_self > 0.0 and side == "r":
            # stereo-only by construction: the reference's
            # pred_self_images resamples the RIGHT image at the expected
            # disparity and notes "only stereo could compute as this"
            # (trainer.py:605-633; its own per-side read at :754 is a
            # latent KeyError — repaired here by scoping to side 'r')
            self_l = jnp.mean(
                reprojection_loss(
                    rec[("self_rec", side)], source, cfg.use_ssim
                )
            )
            losses["loss/self_loss"] += self_l
            total += alpha_self * self_l

        if self_distillation > 0.0:
            disp_loss = jnp.mean(
                jnp.abs(outputs["disp"] - outputs["disp_pp"])
            )
            losses["loss/disp_loss"] = disp_loss
            total += self_distillation * disp_loss

        losses["loss/total_loss"] += total

    # NOTE: the reference's divide-by-num-sides is a no-op (see module doc);
    # we intentionally keep the sum semantics.

    W = outputs["disp"].shape[2]
    x0 = int(0.2 * W)
    smooth = smooth_loss_disp(
        outputs["disp"][:, :, x0:, :],
        inputs["color_l"][:, :, x0:, :],
        gamma=gamma_smooth,
    )
    losses["loss/smooth_loss"] = smooth
    losses["loss/total_loss"] += alpha_smooth * smooth
    return losses


def compute_depth_metrics(
    depth_pred: jnp.ndarray,
    depth_gt: jnp.ndarray,
    grid: jnp.ndarray,
    stereo_scale: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Train-time depth metrics (reference trainer.py:775-810).

    Rescales the prediction by the crop-width ratio, clamps to [1e-3, 80],
    applies the Garg crop on valid GT, and scales x5.4 (stereo) or by the
    GT/pred median ratio (mono).  jit-friendly: boolean indexing of the
    reference becomes a weighted reduction.

    Args:
      depth_pred: ``(B, H, W, 1)``.
      depth_gt: ``(B, H, W, 1)``.
      grid: ``(B, H, W, 2)``.
    """
    depth_pred = jax.lax.stop_gradient(depth_pred)
    width_span = grid[:, 0:1, -1:, 0:1] - grid[:, 0:1, 0:1, 0:1]  # (B,1,1,1)
    depth_pred = depth_pred * 2.0 / width_span
    depth_pred = jnp.clip(depth_pred, 1e-3, 80.0)

    B, H, W, _ = depth_gt.shape
    valid = depth_gt > 0
    ys = jnp.arange(H)[None, :, None, None]
    xs = jnp.arange(W)[None, None, :, None]
    crop = (
        (ys >= int(0.40810811 * H))
        & (ys < int(0.99189189 * H))
        & (xs >= int(0.03594771 * W))
        & (xs < int(0.96405229 * W))
    )
    weights = (valid & crop).astype(depth_gt.dtype)

    gt = jnp.clip(depth_gt, 1e-3, 80.0)
    if stereo_scale:
        pred = depth_pred * 5.4
    else:
        # weighted median via masked sort is expensive; approximate the
        # reference's median scaling with the masked-median over the batch
        def masked_median(x, w):
            big = jnp.where(w > 0, x, jnp.nan)
            return jnp.nanmedian(big)

        ratio = masked_median(gt, weights) / masked_median(depth_pred, weights)
        pred = depth_pred * ratio

    return compute_depth_errors(gt, pred, weights=weights)
