"""Offline evaluator (reference evaluate_depth_HR.py:62-284).

Runs the trained model over a test split at train resolution on the TPU,
optionally flip post-processes, then scores against ``gt_depths.npz`` with
the exact Eigen protocol.  Also supports exporting .npy disparities, KITTI
benchmark PNGs, and evaluating external disparity files (including the
eigen -> benchmark id remap) for full parity with the reference CLI.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import TrainConfig
from planedepth_tpu.data.kitti import DATASETS, readlines, split_path
from planedepth_tpu.data.loader import BatchLoader, EpochSampler
from planedepth_tpu.eval.metrics import (
    batch_post_process_disparity,
    evaluate_disparities,
)
from planedepth_tpu.train.step import ModelBundle


def predict_split_disparities(
    bundle: ModelBundle,
    params,
    batch_stats,
    cfg: TrainConfig,
    filenames,
    batch_size: int = 4,
    post_process: bool = False,
) -> np.ndarray:
    """Forward the model over a file list, returning (num, H, W) disparities."""
    ds_cls = DATASETS[cfg.data.dataset]
    dataset = ds_cls(
        cfg.data.data_path, filenames, cfg.data.height, cfg.data.width,
        novel_frame_ids=(), is_train=False, use_crop=False,
        img_ext=".png" if cfg.data.png else ".jpg",
    )
    sampler = EpochSampler(
        len(dataset), batch_size, shuffle=False, drop_last=False
    )
    loader = BatchLoader(dataset, sampler, prefetch=1)

    @jax.jit
    def forward(image, grid):
        outputs, _ = bundle.depth_forward(
            params, batch_stats, image, grid, train=False
        )
        return outputs["disp"][..., 0], outputs["probability"]

    disps = []
    prob_max = []
    for batch in loader.epoch(0):
        image = jnp.asarray(batch["color_l"])
        grid = jnp.asarray(batch["grid"])
        if post_process:
            image = jnp.concatenate([image, image[:, :, ::-1]], axis=0)
            grid = jnp.concatenate(
                [grid, grid.at[..., 0].multiply(-1.0)[:, :, ::-1]], axis=0
            )
        disp, prob = forward(image, grid)
        disp = np.asarray(disp)
        if post_process:
            n = disp.shape[0] // 2
            disp = batch_post_process_disparity(
                disp[:n], disp[n:, :, ::-1]
            )
        disps.append(disp)
        prob_max.append(
            np.asarray(prob).max(-1).mean((-2, -1))[: disp.shape[0]]
        )
    return np.concatenate(disps), np.concatenate(prob_max)


def evaluate(
    cfg: TrainConfig,
    params,
    batch_stats,
    eval_split: str = "eigen_raw",
    post_process: bool = False,
    batch_size: int = 4,
    save_pred_disps: Optional[str] = None,
    ext_disp_to_eval: Optional[str] = None,
    eval_eigen_to_benchmark: bool = False,
    splits_dir: Optional[str] = None,
) -> Dict[str, float]:
    """End-to-end split evaluation (reference evaluate_depth_HR.py:62-279)."""
    splits_dir = splits_dir or os.path.join(
        os.path.dirname(split_path("x", "train")), ""
    ).rstrip("x/")

    if ext_disp_to_eval is None:
        filenames = readlines(split_path(eval_split, "test"))
        bundle = ModelBundle(cfg)
        pred_disps, prob_max = predict_split_disparities(
            bundle, params, batch_stats, cfg, filenames,
            batch_size=batch_size, post_process=post_process,
        )
        n = len(filenames)
        pred_disps = pred_disps[:n]
    else:
        pred_disps = np.load(ext_disp_to_eval)
        if eval_eigen_to_benchmark:
            remap = np.load(os.path.join(
                splits_dir, "benchmark", "eigen_to_benchmark_ids.npy"
            ))
            pred_disps = pred_disps[remap]

    if save_pred_disps:
        np.save(save_pred_disps, pred_disps)

    if eval_split == "benchmark":
        # export 16-bit benchmark PNGs — bit-faithful to the reference
        # (evaluate_depth_HR.py:200-208), including its raw
        # STEREO_SCALE_FACTOR/disp conversion WITHOUT the 0.1*0.58*W
        # disparity law used everywhere else (a reference quirk kept for
        # submission parity; do not "fix" to disp_to_depth here)
        import cv2

        out_dir = save_pred_disps or "benchmark_predictions"
        os.makedirs(out_dir, exist_ok=True)
        for idx in range(len(pred_disps)):
            disp = cv2.resize(pred_disps[idx], (1216, 352))
            depth = np.clip(5.4 / disp, 0, 80)
            cv2.imwrite(
                os.path.join(out_dir, f"{idx:010d}.png"),
                np.uint16(depth * 256),
            )
        return {}

    gt_path = os.path.join(splits_dir, eval_split, "gt_depths.npz")
    gt_depths = np.load(gt_path, fix_imports=True, encoding="latin1",
                        allow_pickle=True)["data"]
    return evaluate_disparities(
        pred_disps, gt_depths, cfg.data.width, eval_split=eval_split,
        stereo=not cfg.no_stereo,
    )
