#!/bin/bash
# Stage 3: self-distillation (reference README.md:56-74): 10 epochs,
# batch 4, lr 2e-5, milestone 5, frozen teacher = restored weights.
python -m planedepth_tpu.cli.train \
  --data_path "${KITTI_PATH:-./kitti_data}" \
  --weights_dir "${WEIGHTS_DIR:-weights}" \
  --model_name self_distillation --png \
  --height 384 --width 1280 --split eigen_full_left --no_crop \
  --net_type ResNet --num_layers 50 \
  --use_denseaspp --use_mixture_loss --plane_residual \
  --disp_levels 49 --disp_min 2 --disp_max 300 --xz_levels 14 \
  --num_ep 8 --warp_type disp_warp \
  --self_distillation 1.0 \
  --batch_size 4 --learning_rate 2e-5 --num_epochs 10 --milestones 5 \
  --load_weights_folder "${HR_WEIGHTS:-log/hr_finetune_ResNet/last_models}" \
  --models_to_load encoder depth \
  "$@"
