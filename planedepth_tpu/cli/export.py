"""Serving export: serialize the jitted inference forward with jax.export.

Produces a portable StableHLO artifact of ``(image, grid) -> disparity`` at
a fixed resolution — loadable in any jax (or XLA-compatible) runtime with
``jax.export.deserialize`` for production serving without the Python model
code.  A capability beyond the reference (which serves from torch
checkpoints only).

    python -m planedepth_tpu.cli.export --load_weights_folder ... \
        --height 384 --width 1280 --out model.stablehlo
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.cli.options import args_to_config, build_parser
from planedepth_tpu.train.step import ModelBundle
from planedepth_tpu.utils.checkpoint import load_checkpoint


def export_forward(cfg, params, batch_stats, out_path: str,
                   batch_size: int = 1):
    bundle = ModelBundle(cfg)
    H, W = cfg.data.height, cfg.data.width

    def forward(image, grid):
        outputs, _ = bundle.depth_forward(
            params, batch_stats, image, grid, train=False
        )
        return outputs["disp"]

    image = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.float32)
    grid = jax.ShapeDtypeStruct((batch_size, H, W, 2), jnp.float32)
    exported = jax.export.export(jax.jit(forward))(image, grid)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--out", type=str, default="planedepth.stablehlo")
    parser.add_argument("--export_batch", type=int, default=1)
    args = parser.parse_args(argv)
    cfg = args_to_config(args)
    if cfg.load_weights_folder:
        payload = load_checkpoint(cfg.load_weights_folder)
        params, batch_stats = payload["params"], payload["batch_stats"]
    else:
        # export with random init (useful for shape/serving validation)
        bundle = ModelBundle(cfg)
        params, batch_stats, _ = bundle.init(
            jax.random.PRNGKey(0), cfg.data.height, cfg.data.width
        )
    n = export_forward(cfg, params, batch_stats, args.out, args.export_batch)
    print(f"exported {args.out} ({n} bytes)")


if __name__ == "__main__":
    main(sys.argv[1:])
