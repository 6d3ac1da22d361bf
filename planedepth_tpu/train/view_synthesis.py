"""View synthesis: per-plane warp + probability re-normalization + composite.

The training hot path (reference trainer.py:523-603 ``pred_novel_images``).
For each target view, every plane induces a warp of the left image; the
warped per-plane stack is composited with the warped, re-normalized plane
probabilities.

TPU design:
  * plane axis LAST in all probability tensors ``(B, H, W, N)``;
  * the stereo ``disp_warp`` mode uses :func:`ops.sampling.shift_sample_x`
    (1-D interpolation along width — half the gather traffic of a full 2-D
    grid_sample);
  * the XLA path below is the correctness oracle; the fused Pallas kernel
    (ops/pallas_sweep.py, wired in train/step.py:fused_stereo_losses)
    replaces it on TPU for the stereo mode.

Reference quirk reproduced deliberately: with ``warp_type=depth_warp`` the
reference never assigns a padding mask (trainer.py:533-538 vs :554) and would
crash with a NameError; we use the decoder's plane validity mask there, which
is what the disp_warp branch does.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from planedepth_tpu.geometry.warp import (
    depth_warp_coords,
    disp_warp_shift,
    homography_warp_coords,
)
from planedepth_tpu.models.depth_decoder import (
    mixture_reweight,
    render_probability_from_logits,
)
from planedepth_tpu.ops.rowshift import rowshift_sample, rowshift_sample_shared
from planedepth_tpu.ops.sampling import grid_sample, shift_sample_x


def _sample_plane_stack_shift(
    rgb: jnp.ndarray,
    logits: jnp.ndarray,
    sigma: Optional[jnp.ndarray],
    shift: jnp.ndarray,
) -> jnp.ndarray:
    """disp_warp sampling of [rgb | logit_n | sigma_n] per plane.

    Args:
      rgb: ``(B, H, W, 3)`` source image (shared across planes).
      logits: ``(B, H, W, N)``.
      sigma: ``(B, H, W, N)`` or None.
      shift: ``(B, N, H, W)`` horizontal source offsets in pixels.

    Returns:
      ``(B, N, H, W, C)`` with C = 4 or 5.
    """

    def one_plane(shift_n, logit_n, sigma_n):
        chans = [rgb, logit_n[..., None]]
        if sigma_n is not None:
            chans.append(sigma_n[..., None])
        feats = jnp.concatenate(chans, axis=-1)          # (B, H, W, C)
        return shift_sample_x(feats, shift_n[:, None])[:, 0]

    if sigma is None:
        return jax.vmap(
            lambda s, l: one_plane(s, l, None), in_axes=(1, 3), out_axes=1
        )(shift, logits)
    return jax.vmap(one_plane, in_axes=(1, 3, 3), out_axes=1)(
        shift, logits, sigma
    )


def _sample_plane_stack_coords(
    rgb: jnp.ndarray,
    logits: jnp.ndarray,
    sigma: Optional[jnp.ndarray],
    coords: jnp.ndarray,
) -> jnp.ndarray:
    """General 2-D grid_sample of [rgb | logit_n | sigma_n] per plane.

    coords: ``(B, N, H, W, 2)``.
    """

    def one_plane(coords_n, logit_n, sigma_n):
        chans = [rgb, logit_n[..., None]]
        if sigma_n is not None:
            chans.append(sigma_n[..., None])
        feats = jnp.concatenate(chans, axis=-1)
        return grid_sample(feats, coords_n)

    if sigma is None:
        return jax.vmap(
            lambda c, l: one_plane(c, l, None), in_axes=(1, 3), out_axes=1
        )(coords, logits)
    return jax.vmap(one_plane, in_axes=(1, 3, 3), out_axes=1)(
        coords, logits, sigma
    )


def pred_novel_images(
    outputs: Dict[str, jnp.ndarray],
    source_rgb: jnp.ndarray,
    target_sides,
    poses: Dict,
    K: jnp.ndarray,
    inv_K: jnp.ndarray,
    warp_type: str = "disp_warp",
    use_mixture_loss: bool = True,
    render_probability: bool = False,
    rowshift: bool = False,
    sample_dtype=None,
) -> Dict:
    """Synthesize every target view (reference trainer.py:523-603).

    Args:
      outputs: decoder outputs (plane-last layout).
      source_rgb: ``(B, H, W, 3)`` left image (color or color_aug per
        ``match_aug``).
      target_sides: e.g. ("r",) or ("r", -1, 1).
      poses: dict side -> ``(B, 4, 4)`` relative pose (view change target->l,
        except "l"; see mono_dataset.py:208-211).
      K, inv_K: ``(B, 4, 4)``.

    Returns:
      dict with per-side keys: rgb_rec ``(B,H,W,3)``, rgb_rec_layered
      ``(B,N,H,W,3)``, logit_rec / probability_rec / sigma_rec / pi_rec
      ``(B,H,W,N)``.
    """
    disp_layered = outputs["disp_layered"]                # (B, H, W, N)
    B, H, W, N = disp_layered.shape
    logits = outputs["logits"]
    sigma = outputs.get("sigma") if use_mixture_loss else None
    # sample in bf16: the warped plane stacks are the activation-memory
    # peak at HR (f32[63,B,H,W,5] = 7.4G padded at batch 8); the softmax /
    # mixture math downstream recomputes in f32 from the bf16 samples
    if sample_dtype is not None:
        logits = logits.astype(sample_dtype)
        if sigma is not None:
            sigma = sigma.astype(sample_dtype)
        source_rgb = source_rgb.astype(sample_dtype)

    # Row-constant custom-VJP warp (ops/rowshift.py).  Benchmarked SLOWER
    # than XLA's native gather+scatter autodiff on v5e (137 vs 277 imgs/s
    # at 1280x384) — kept as an opt-in for other topologies.
    disp_rows = outputs.get("disp_rows") if rowshift else None

    rec: Dict = {}
    for side in target_sides:
        if (
            warp_type == "disp_warp"
            and side in ("l", "r")
            and disp_rows is not None
        ):
            # scatter-free custom-VJP path (ops/rowshift.py): disparity is
            # constant along each row for vertical+ground planes
            sgn = -1.0 if side == "l" else 1.0
            shift_rows = sgn * disp_rows
            rgb_l = rowshift_sample_shared(source_rgb, shift_rows)
            logit_s = rowshift_sample(logits, shift_rows)      # (B,H,W,N)
            parts = [rgb_l, jnp.moveaxis(logit_s, -1, 1)[..., None]]
            if sigma is not None:
                sigma_s = rowshift_sample(sigma, shift_rows)
                parts.append(jnp.moveaxis(sigma_s, -1, 1)[..., None])
            sampled = jnp.concatenate(parts, axis=-1)          # (B,N,H,W,C)
            pmask = jnp.moveaxis(outputs["padding_mask"], -1, 1)
        elif warp_type == "disp_warp" and side in ("l", "r"):
            shift = disp_warp_shift(disp_layered, side)
            sampled = _sample_plane_stack_shift(source_rgb, logits, sigma, shift)
            pmask = jnp.moveaxis(outputs["padding_mask"], -1, 1)  # (B,N,H,W)
        elif warp_type == "depth_warp" or (
            warp_type == "disp_warp" and side not in ("l", "r")
        ):
            coords = depth_warp_coords(disp_layered, poses[side], K, inv_K, W)
            sampled = _sample_plane_stack_coords(source_rgb, logits, sigma, coords)
            pmask = jnp.moveaxis(outputs["padding_mask"], -1, 1)
        elif warp_type == "homography_warp":
            coords, pmask = homography_warp_coords(
                outputs["distance"], outputs["norm"], poses[side], K, inv_K,
                H, W,
            )
            sampled = _sample_plane_stack_coords(source_rgb, logits, sigma, coords)
        else:
            raise ValueError(f"unknown warp_type {warp_type}")

        sampled = sampled * pmask[..., None].astype(sampled.dtype)

        rgb_layered = sampled[..., :3]                    # (B, N, H, W, 3)
        logit_rec = jnp.moveaxis(sampled[..., 3], 1, -1).astype(
            jnp.float32
        )                                                 # (B, H, W, N)

        if render_probability:
            # stereo pair shares the layered depths, so source-view dists are
            # reused (reference trainer.py:584-591)
            alpha_logits = logit_rec[..., : N - 1]
            prob_rec = render_probability_from_logits(
                alpha_logits, outputs["dists"]
            )
        else:
            prob_rec = nn.softmax(logit_rec, axis=-1)

        out_side = {
            "rgb_rec_layered": rgb_layered,
            "logit_rec": logit_rec,
        }
        if use_mixture_loss:
            sigma_rec = jnp.clip(
                jnp.moveaxis(sampled[..., 4], 1, -1).astype(jnp.float32),
                0.01, 1.0,
            )
            out_side["sigma_rec"] = sigma_rec
            out_side["pi_rec"] = prob_rec
            prob_rec = mixture_reweight(prob_rec, sigma_rec)
        out_side["probability_rec"] = prob_rec

        # composite: sum_n p_n * rgb_n  (reference trainer.py:603)
        prob_n = jnp.moveaxis(prob_rec, -1, 1)[..., None]  # (B, N, H, W, 1)
        out_side["rgb_rec"] = jnp.sum(
            rgb_layered.astype(jnp.float32) * prob_n, axis=1
        )

        for k, v in out_side.items():
            rec[(k, side)] = v
    return rec


def pred_self_images(
    disp: jnp.ndarray,
    target_rgb: jnp.ndarray,
    Rt_r: jnp.ndarray,
    K: jnp.ndarray,
    inv_K: jnp.ndarray,
) -> jnp.ndarray:
    """Self-reconstruction of the left view by warping the RIGHT image with
    the expected disparity (reference trainer.py:605-633, border padding).

    Args:
      disp: ``(B, H, W, 1)`` expected disparity.
      target_rgb: ``(B, H, W, 3)`` right image.

    Returns:
      ``(B, H, W, 3)`` reconstruction of the left view.
    """
    from planedepth_tpu.geometry.camera import (
        backproject_depth,
        disp_to_depth,
        project_3d,
    )

    B, H, W, _ = disp.shape
    depth = disp_to_depth(disp[..., 0], W)
    cam_points = backproject_depth(depth, inv_K)
    coords = project_3d(cam_points, K, Rt_r, H, W)
    return grid_sample(target_rgb, coords, padding_mode="border")
