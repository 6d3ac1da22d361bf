#!/bin/bash
# Stage 1 recipe (reference train_ResNet.sh / README.md:36-38), TPU edition.
# DDP/torchrun is replaced by the jax device mesh — one process drives all
# local chips.
python -m planedepth_tpu.cli.train \
  --data_path "${KITTI_PATH:-./kitti_data}" \
  --weights_dir "${WEIGHTS_DIR:-weights}" \
  --model_name stage1 --png \
  --height 192 --width 640 --split eigen_full_left \
  --net_type ResNet --num_layers 50 \
  --use_denseaspp --use_mixture_loss --plane_residual --flip_right \
  --disp_levels 49 --disp_min 2 --disp_max 300 --xz_levels 14 \
  --num_ep 8 --warp_type disp_warp \
  --batch_size 8 --learning_rate 1e-4 --num_epochs 50 --milestones 30 40 \
  "$@"
