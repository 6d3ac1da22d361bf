#!/bin/bash
# Evaluation recipe (reference eval.sh): Eigen raw, stereo protocol.
python -m planedepth_tpu.cli.evaluate \
  --data_path "${KITTI_PATH:-./kitti_data}" \
  --height 384 --width 1280 \
  --net_type ResNet --num_layers 50 \
  --use_denseaspp --use_mixture_loss --plane_residual \
  --disp_levels 49 --disp_min 2 --disp_max 300 --xz_levels 14 --num_ep 8 \
  --eval_split eigen_raw --eval_stereo --post_process \
  --load_weights_folder "${WEIGHTS:-log/self_distillation_ResNet/best_models}" \
  "$@"
