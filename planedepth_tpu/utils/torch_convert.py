"""One-shot torch -> jax weight conversion.

The reference loads ImageNet-pretrained torchvision backbones
(resnet_encoder.py:35, layers.py:381,430) and its own ``.pth`` checkpoints.
This module converts those state dicts into this framework's NHWC flax param
trees; torch is imported lazily and is NEVER needed at training time.

Conventions:
  * torch conv weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
  * torch BN {weight, bias, running_mean, running_var} -> flax
    {scale, bias} in params + {mean, var} in batch_stats
  * pose encoder conv1 weights for stacked inputs are tiled and averaged
    (reference pose_net.py:57-60).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_resnet_trunk(
    sd: Dict, prefix: str = "", num_input_images: int = 1
) -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, batch_stats) for
    models.resnet.ResNetTrunk."""

    def a(name):
        return np.asarray(sd[prefix + name])

    params: Dict = {}
    stats: Dict = {}

    w1 = _conv(a("conv1.weight"))
    if num_input_images > 1 and w1.shape[2] == 3:
        w1 = np.concatenate([w1] * num_input_images, axis=2) / num_input_images
    params["conv1"] = {"kernel": w1}
    params["bn1"] = {"bn": {"scale": a("bn1.weight"), "bias": a("bn1.bias")}}
    stats["bn1"] = {"bn": {"mean": a("bn1.running_mean"),
                           "var": a("bn1.running_var")}}

    # stages
    layer = 1
    while f"{prefix}layer{layer}.0.conv1.weight" in sd:
        b = 0
        while f"{prefix}layer{layer}.{b}.conv1.weight" in sd:
            tp = f"layer{layer}.{b}."
            name = f"layer{layer}_{b}"
            p: Dict = {}
            s: Dict = {}
            conv_i = 1
            while f"{prefix}{tp}conv{conv_i}.weight" in sd:
                p[f"conv{conv_i}"] = {
                    "kernel": _conv(a(f"{tp}conv{conv_i}.weight"))
                }
                p[f"bn{conv_i}"] = {"bn": {
                    "scale": a(f"{tp}bn{conv_i}.weight"),
                    "bias": a(f"{tp}bn{conv_i}.bias"),
                }}
                s[f"bn{conv_i}"] = {"bn": {
                    "mean": a(f"{tp}bn{conv_i}.running_mean"),
                    "var": a(f"{tp}bn{conv_i}.running_var"),
                }}
                conv_i += 1
            if f"{prefix}{tp}downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv(a(f"{tp}downsample.0.weight"))
                }
                p["downsample_bn"] = {"bn": {
                    "scale": a(f"{tp}downsample.1.weight"),
                    "bias": a(f"{tp}downsample.1.bias"),
                }}
                s["downsample_bn"] = {"bn": {
                    "mean": a(f"{tp}downsample.1.running_mean"),
                    "var": a(f"{tp}downsample.1.running_var"),
                }}
            params[name] = p
            stats[name] = s
            b += 1
        layer += 1
    return params, stats


def convert_resnet_encoder(sd: Dict, num_input_images: int = 1):
    """state_dict of torchvision resnet (or the reference's
    ``encoder.pth`` whose keys are prefixed ``encoder.``) -> variables for
    models.resnet.ResnetEncoder/ResnetPoseEncoder."""
    prefix = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    params, stats = convert_resnet_trunk(
        sd, prefix=prefix, num_input_images=num_input_images
    )
    return {"params": {"encoder": params},
            "batch_stats": {"encoder": stats}}


def convert_vgg19_features(sd: Dict) -> Dict:
    """torchvision vgg19 ``features`` state_dict -> Vgg19Features params.

    The torch indices of conv layers in config E features are
    0,2,5,7,10,12,14,16,19,21,23,25 (through relu4_4).
    """
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25]
    # accept either 'features.0.weight' or '0.weight'
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params = {}
    for i, cid in enumerate(conv_ids):
        k = f"{prefix}{cid}.weight"
        if k not in sd:
            break
        params[f"conv_{i}"] = {
            "kernel": _conv(np.asarray(sd[k])),
            "bias": np.asarray(sd[f"{prefix}{cid}.bias"]),
        }
    return {"params": params}


def save_converted(path: str, variables: Dict) -> int:
    """Write a nested variables dict ({"params": ..., ...}) as a flat .npz
    ('/'-joined keys); inverse of :func:`load_converted`."""
    flat: Dict[str, np.ndarray] = {}

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    flatten(variables)
    np.savez(path, **flat)
    return len(flat)


def load_converted(path: str) -> Dict:
    """Load an .npz written by scripts/convert_torch_weights.py back into a
    nested variables dict ({"params": ..., "batch_stats": ...})."""
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def load_torch_state_dict(path: str) -> Dict:
    """Load a .pth state dict (lazy torch import, CPU map)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
