#!/usr/bin/env python
"""Convert torchvision / reference .pth weights into this framework's
checkpoint format.

Examples:
    # ImageNet backbone for the depth encoder
    python scripts/convert_torch_weights.py resnet50 resnet50.pth out_dir/

    # VGG-19 for the perceptual loss
    python scripts/convert_torch_weights.py vgg19 vgg19.pth out_dir/

torch is only needed by this offline tool (utils/torch_convert.py imports it
lazily); training/eval never require it.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planedepth_tpu.utils.torch_convert import (  # noqa: E402
    convert_resnet_encoder,
    convert_vgg19_features,
    load_torch_state_dict,
    save_converted,
)


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    kind, pth, out_dir = sys.argv[1:4]
    sd = load_torch_state_dict(pth)
    if kind.startswith("resnet"):
        variables = convert_resnet_encoder(sd)
    elif kind == "vgg19":
        variables = convert_vgg19_features(sd)
    else:
        raise SystemExit(f"unknown kind {kind}")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{kind}.npz")
    n = save_converted(out, variables)
    print(f"wrote {out} ({n} arrays)")


if __name__ == "__main__":
    main()
