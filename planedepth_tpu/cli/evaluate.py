"""Evaluation CLI (reference evaluate_depth_HR.py:282-284, eval.sh).

Resolution + network configuration are read from the checkpoint's
``.meta.json`` / the run's ``opt.json`` when the corresponding flags are not
explicitly passed (the reference embeds height/width in ``encoder.pth`` and
the evaluator reads them, trainer.py:879-882 / evaluate_depth_HR.py:98-106).
"""
from __future__ import annotations

import sys

from planedepth_tpu.cli.options import (
    args_to_config,
    build_parser,
    parse_with_explicit,
)
from planedepth_tpu.config import TrainConfig
from planedepth_tpu.eval.evaluator import evaluate
from planedepth_tpu.utils.checkpoint import load_checkpoint, load_checkpoint_meta

# model flags: if ANY is explicitly passed, the CLI's model config wins
# wholesale (mixing saved + CLI model fields would be ambiguous)
_MODEL_DESTS = frozenset({
    "net_type", "num_layers", "num_ep", "pe_type", "use_denseaspp",
    "use_mixture_loss", "plane_residual", "render_probability",
    "disp_levels", "disp_min", "disp_max", "xz_levels", "yz_levels",
})


def apply_checkpoint_meta(cfg, meta, explicit):
    """Adopt the checkpoint's train resolution + model config for every
    field the user did not explicitly set."""
    if not meta:
        return cfg
    saved = meta.get("config")
    if saved and not (_MODEL_DESTS & explicit):
        cfg = cfg.replace(model=TrainConfig.from_dict(saved).model)
    data_kw = {}
    if meta.get("height") and "height" not in explicit:
        data_kw["height"] = int(meta["height"])
    if meta.get("width") and "width" not in explicit:
        data_kw["width"] = int(meta["width"])
    if data_kw:
        import dataclasses

        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_kw))
    return cfg


def main(argv=None):
    args, explicit = parse_with_explicit(build_parser(), argv)
    assert args.eval_mono != args.eval_stereo, (
        "choose exactly one of --eval_mono / --eval_stereo"
    )
    cfg = args_to_config(args)
    if cfg.load_weights_folder:
        meta = load_checkpoint_meta(cfg.load_weights_folder)
        cfg = apply_checkpoint_meta(cfg, meta, explicit)
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
