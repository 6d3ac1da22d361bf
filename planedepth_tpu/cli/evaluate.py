"""Evaluation CLI (reference evaluate_depth_HR.py:282-284, eval.sh)."""
from __future__ import annotations

import sys

from planedepth_tpu.cli.options import args_to_config, build_parser
from planedepth_tpu.eval.evaluator import evaluate
from planedepth_tpu.utils.checkpoint import load_checkpoint


def main(argv=None):
    args = build_parser().parse_args(argv)
    assert args.eval_mono != args.eval_stereo, (
        "choose exactly one of --eval_mono / --eval_stereo"
    )
    cfg = args_to_config(args)
    if cfg.load_weights_folder:
        payload = load_checkpoint(cfg.load_weights_folder)
        params, batch_stats = payload["params"], payload["batch_stats"]
    else:
        params = batch_stats = None
    metrics = evaluate(
        cfg, params, batch_stats,
        eval_split=args.eval_split,
        post_process=args.post_process,
        save_pred_disps=(
            f"disps_{args.eval_split}_split.npy" if args.save_pred_disps
            else None
        ),
        ext_disp_to_eval=args.ext_disp_to_eval,
        eval_eigen_to_benchmark=args.eval_eigen_to_benchmark,
    )
    header = "\n  " + ("{:>8} | " * 7).format(
        "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"
    )
    row = ("&{: 8.5f}  " * 7).format(
        *[metrics[k] for k in
          ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")]
    ) + "\\\\"
    print(header)
    print(row)
    print("\n-> Done!")


if __name__ == "__main__":
    main(sys.argv[1:])
