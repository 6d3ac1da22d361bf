"""CLI flag surface (reference options.py:17-293) -> TrainConfig.

Keeps the reference's flag NAMES so existing run scripts translate 1:1,
but parses into the typed frozen config instead of a mutable namespace.
Deliberately NOT reproduced: the reference's dead/broken flags
(--scheduler_step_size, --avg_reprojection, --stage1_weights_folder are
parsed there but never read; --num_ep's help text is wrong).
"""
from __future__ import annotations

import argparse

from planedepth_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    PlaneConfig,
    TrainConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("PlaneDepth-TPU")
    # paths
    p.add_argument("--data_path", type=str, default="./kitti_data")
    p.add_argument("--log_dir", type=str, default="./log")
    p.add_argument("--model_name", type=str, default="planedepth")
    # training
    p.add_argument("--split", type=str, default="eigen_full_left")
    p.add_argument("--dataset", type=str, default="kitti")
    p.add_argument("--png", action="store_true")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--num_layers", type=int, default=50)
    p.add_argument("--net_type", type=str, default="ResNet",
                   choices=["ResNet", "PladeNet", "FalNet"])
    p.add_argument("--warp_type", type=str, default="disp_warp",
                   choices=["depth_warp", "disp_warp", "homography_warp"])
    p.add_argument("--novel_frame_ids", nargs="*", type=int, default=[])
    p.add_argument("--no_stereo", action="store_true")
    p.add_argument("--no_crop", action="store_true")
    # planes
    p.add_argument("--disp_levels", type=int, default=49)
    p.add_argument("--disp_min", type=float, default=2.0)
    p.add_argument("--disp_max", type=float, default=300.0)
    p.add_argument("--xz_levels", type=int, default=14)
    p.add_argument("--yz_levels", type=int, default=0)
    # model features
    p.add_argument("--num_ep", type=int, default=8)
    p.add_argument("--pe_type", type=str, default="neural",
                   choices=["neural", "frequency"])
    p.add_argument("--use_denseaspp", action="store_true")
    p.add_argument("--use_mixture_loss", action="store_true")
    p.add_argument("--plane_residual", action="store_true")
    p.add_argument("--render_probability", action="store_true")
    p.add_argument("--flip_right", action="store_true")
    p.add_argument("--use_mom", action="store_true")
    # losses
    p.add_argument("--alpha_smooth", type=float, default=0.04)
    p.add_argument("--gamma_smooth", type=float, default=2.0)
    p.add_argument("--alpha_pc", type=float, default=0.1)
    p.add_argument("--alpha_self", type=float, default=0.0)
    p.add_argument("--self_distillation", type=float, default=0.0)
    p.add_argument("--automask", action="store_true")
    p.add_argument("--use_ssim", action="store_true")
    p.add_argument("--match_aug", action="store_true")
    p.add_argument("--pc_net", type=str, default="vgg19",
                   choices=["vgg19", "resnet18"])
    # colmap
    p.add_argument("--use_colmap", action="store_true")
    p.add_argument("--colmap_path", type=str, default="./kitti_colmap")
    # optimization
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--beta_1", type=float, default=0.5)
    p.add_argument("--beta_2", type=float, default=0.999)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--milestones", nargs="*", type=int, default=[30, 40])
    p.add_argument("--start_epoch", type=int, default=0)
    # system
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--no_bf16", action="store_true")
    # loading
    p.add_argument("--load_weights_folder", type=str, default=None)
    p.add_argument("--models_to_load", nargs="+", type=str,
                   default=["encoder", "depth"])
    # logging
    p.add_argument("--log_frequency", type=int, default=500)
    p.add_argument("--log_img_frequency", type=int, default=250)
    # eval
    p.add_argument("--eval_split", type=str, default="eigen_raw")
    p.add_argument("--eval_stereo", action="store_true")
    p.add_argument("--eval_mono", action="store_true")
    p.add_argument("--post_process", action="store_true")
    p.add_argument("--save_pred_disps", action="store_true")
    p.add_argument("--ext_disp_to_eval", type=str, default=None)
    p.add_argument("--eval_eigen_to_benchmark", action="store_true")
    p.add_argument("--no_eval", action="store_true")
    return p


def args_to_config(a: argparse.Namespace) -> TrainConfig:
    return TrainConfig(
        model_name=a.model_name,
        log_dir=a.log_dir,
        batch_size=a.batch_size,
        seed=a.seed,
        warp_type=a.warp_type,
        novel_frame_ids=tuple(a.novel_frame_ids),
        no_stereo=a.no_stereo,
        flip_right=a.flip_right,
        load_weights_folder=a.load_weights_folder,
        models_to_load=tuple(a.models_to_load),
        log_frequency=a.log_frequency,
        log_img_frequency=a.log_img_frequency,
        bf16=not a.no_bf16,
        model=ModelConfig(
            net_type=a.net_type,
            num_layers=a.num_layers,
            num_ep=a.num_ep,
            pe_type=a.pe_type,
            use_denseaspp=a.use_denseaspp,
            use_mixture_loss=a.use_mixture_loss,
            plane_residual=a.plane_residual,
            render_probability=a.render_probability,
            planes=PlaneConfig(
                disp_levels=a.disp_levels,
                disp_min=a.disp_min,
                disp_max=a.disp_max,
                xz_levels=a.xz_levels,
                yz_levels=a.yz_levels,
            ),
        ),
        loss=LossConfig(
            alpha_smooth=a.alpha_smooth,
            gamma_smooth=a.gamma_smooth,
            alpha_pc=a.alpha_pc,
            alpha_self=a.alpha_self,
            self_distillation=a.self_distillation,
            automask=a.automask,
            use_ssim=a.use_ssim,
            match_aug=a.match_aug,
            pc_net=a.pc_net,
            use_mom=a.use_mom,
        ),
        data=DataConfig(
            data_path=a.data_path,
            dataset=a.dataset,
            split=a.split,
            height=a.height,
            width=a.width,
            png=a.png,
            no_crop=a.no_crop,
            use_colmap=a.use_colmap,
            colmap_path=a.colmap_path,
            num_workers=a.num_workers,
        ),
        optim=OptimConfig(
            learning_rate=a.learning_rate,
            beta_1=a.beta_1,
            beta_2=a.beta_2,
            num_epochs=a.num_epochs,
            milestones=tuple(a.milestones),
            start_epoch=a.start_epoch,
        ),
    )
