"""flip_right batch doubling (reference trainer.py:252-276).

Concats the horizontally-flipped, L/R-swapped stereo pair onto the batch:
the flipped right image becomes a new "left" sample whose stereo partner is
the flipped left image.  The aug grid gets x negated + mirrored; intrinsics
and stereo extrinsics are repeated (the baseline direction is unchanged by a
flip+swap); temporal neighbors are flipped in place.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from planedepth_tpu.train.distill import flip_grid, flip_w


def add_flip_right_inputs(
    inputs: Dict[str, jnp.ndarray], novel_frame_ids=()
) -> Dict[str, jnp.ndarray]:
    new: Dict[str, jnp.ndarray] = {}
    cat = jnp.concatenate
    new["color_l"] = cat([inputs["color_l"], flip_w(inputs["color_r"])], 0)
    new["color_r"] = cat([inputs["color_r"], flip_w(inputs["color_l"])], 0)
    new["color_aug_l"] = cat(
        [inputs["color_aug_l"], flip_w(inputs["color_aug_r"])], 0
    )
    new["color_aug_r"] = cat(
        [inputs["color_aug_r"], flip_w(inputs["color_aug_l"])], 0
    )
    new["grid"] = cat([inputs["grid"], flip_grid(inputs["grid"])], 0)
    if "depth_gt_l" in inputs:
        new["depth_gt_l"] = cat(
            [inputs["depth_gt_l"], flip_w(inputs["depth_gt_r"])], 0
        )
        new["depth_gt_r"] = cat(
            [inputs["depth_gt_r"], flip_w(inputs["depth_gt_l"])], 0
        )
    for k in ("K", "inv_K", "Rt_l", "Rt_r"):
        new[k] = jnp.tile(inputs[k], (2,) + (1,) * (inputs[k].ndim - 1))
    for f in novel_frame_ids:
        for prefix in ("color", "color_aug"):
            k = f"{prefix}_{f}"
            new[k] = cat([inputs[k], flip_w(inputs[k])], 0)
        # COLMAP per-frame poses: the reference's add_flip_right_inputs
        # DROPS these keys and would KeyError in predict_poses under
        # use_colmap + flip_right (trainer.py:252-276 vs 363); repaired
        # here by repeating them like Rt_l/Rt_r (per the reference's own
        # comment, the flipped copies "should not affect the training")
        rt = f"Rt_{f}"
        if rt in inputs:
            new[rt] = jnp.tile(
                inputs[rt], (2,) + (1,) * (inputs[rt].ndim - 1)
            )
    return new
