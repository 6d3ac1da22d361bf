"""Training CLI (reference train.py:14-21).

    python -m planedepth_tpu.cli.train --net_type ResNet --use_denseaspp ...

Stage presets: ``--stage stage1|hr_finetune|self_distillation`` applies the
reference README recipe, then individual flags override.
"""
from __future__ import annotations

import sys

from planedepth_tpu.cli.options import (
    args_to_config,
    build_parser,
    parse_with_explicit,
)
from planedepth_tpu.config import STAGE_PRESETS
from planedepth_tpu.train.trainer import Trainer


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--stage", type=str, default=None,
                        choices=list(STAGE_PRESETS))
    args, explicit = parse_with_explicit(parser, argv)
    cfg = args_to_config(args, explicit=explicit, stage=args.stage)
    # append net_type to the run name (reference train.py:19)
    cfg = cfg.replace(model_name=f"{cfg.model_name}_{cfg.model.net_type}")
    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
