#!/bin/bash
# Stage 2: HR finetune (reference README.md:40-54): 1280x384, 1 epoch,
# lr 2.5e-5, partial restore of encoder+depth from stage1.
python -m planedepth_tpu.cli.train \
  --data_path "${KITTI_PATH:-./kitti_data}" \
  --weights_dir "${WEIGHTS_DIR:-weights}" \
  --model_name hr_finetune --png \
  --height 384 --width 1280 --split eigen_full_left --no_crop \
  --net_type ResNet --num_layers 50 \
  --use_denseaspp --use_mixture_loss --plane_residual --flip_right \
  --disp_levels 49 --disp_min 2 --disp_max 300 --xz_levels 14 \
  --num_ep 8 --warp_type disp_warp \
  --batch_size 8 --learning_rate 2.5e-5 --num_epochs 1 --milestones \
  --load_weights_folder "${STAGE1_WEIGHTS:-log/stage1_ResNet/last_models}" \
  --models_to_load encoder depth \
  "$@"
