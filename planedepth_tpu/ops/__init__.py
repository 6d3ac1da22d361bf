from planedepth_tpu.ops.sampling import (
    grid_sample,
    grid_sample_planes,
    shift_sample_x,
)
from planedepth_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    upsample2x_nearest,
)
from planedepth_tpu.ops.losses import (
    compute_depth_errors,
    gaussian_pdf,
    laplacian_pdf,
    multimodal_nll,
    smooth_loss_disp,
    smooth_loss_probability,
)
from planedepth_tpu.ops.ssim import ssim
