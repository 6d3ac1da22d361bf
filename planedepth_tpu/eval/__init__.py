from planedepth_tpu.eval.metrics import (
    batch_post_process_disparity,
    compute_errors,
    evaluate_disparities,
)
from planedepth_tpu.eval.evaluator import evaluate, predict_split_disparities
from planedepth_tpu.eval.export_gt import (
    export_eigen_improved_gt,
    export_eigen_raw_gt,
)
