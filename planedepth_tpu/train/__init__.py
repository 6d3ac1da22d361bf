from planedepth_tpu.train.flip import add_flip_right_inputs
from planedepth_tpu.train.losses import (
    compute_depth_metrics,
    compute_losses,
    perceptual_loss,
    reprojection_loss,
)
from planedepth_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    multistep_lr,
)
from planedepth_tpu.train.step import (
    ModelBundle,
    make_eval_step,
    make_train_step,
    process_batch,
)
from planedepth_tpu.train.view_synthesis import (
    pred_novel_images,
    pred_self_images,
)
from planedepth_tpu.train.distill import (
    generate_post_process_disp,
    mirror_occlusion_mask,
)
