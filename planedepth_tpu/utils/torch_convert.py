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


def _bn(sd, key: str) -> Tuple[Dict, Dict]:
    """torch BN params at ``key`` -> ({scale, bias}, {mean, var})."""
    return (
        {"bn": {"scale": np.asarray(sd[key + ".weight"]),
                "bias": np.asarray(sd[key + ".bias"])}},
        {"bn": {"mean": np.asarray(sd[key + ".running_mean"]),
                "var": np.asarray(sd[key + ".running_var"])}},
    )


def convert_depth_decoder(
    sd: Dict,
    num_ep: int = 8,
    pe_type: str = "neural",
    use_denseaspp: bool = True,
    use_mixture_loss: bool = True,
    plane_residual: bool = True,
) -> Tuple[Dict, Dict]:
    """Reference ``DepthDecoder`` state_dict -> (params, batch_stats) for
    models.depth_decoder.DepthDecoder.

    The reference registers its conv dict as ``nn.ModuleList`` in insertion
    order (networks/depth_decoder.py:61-118), so keys are ``decoder.{idx}.*``
    with idx = [epconv?] + upconv (4,0)..(0,1) + [denseaspp?] + dispconv +
    [sigmaconv?] + [residualconv?].
    """
    prefix = "decoder." if any(k.startswith("decoder.") for k in sd) else ""

    def cw(key):
        return _conv(np.asarray(sd[prefix + key + ".weight"]))

    def cb(key):
        return np.asarray(sd[prefix + key + ".bias"])

    params: Dict = {}
    stats: Dict = {}
    idx = 0
    if num_ep > 0 and pe_type == "neural":
        params["epconv"] = {
            "conv0": {"kernel": cw(f"{idx}.0"), "bias": cb(f"{idx}.0")},
            "conv1": {"kernel": cw(f"{idx}.2"), "bias": cb(f"{idx}.2")},
        }
        idx += 1
    for i in range(4, -1, -1):
        for j in (0, 1):
            params[f"upconv_{i}_{j}"] = {"conv": {"conv": {
                "kernel": cw(f"{idx}.conv.conv"),
                "bias": cb(f"{idx}.conv.conv"),
            }}}
            idx += 1
    if use_denseaspp:
        da_p: Dict = {}
        da_s: Dict = {}
        for d in (3, 6, 12, 18, 24):
            bp: Dict = {}
            bs: Dict = {}
            base = f"{prefix}{idx}.ASPP_{d}"
            if f"{base}.norm1.weight" in sd:
                bp["norm1"], bs["norm1"] = _bn(sd, base + ".norm1")
            bp["conv1"] = {"kernel": cw(f"{idx}.ASPP_{d}.conv1"),
                           "bias": cb(f"{idx}.ASPP_{d}.conv1")}
            bp["norm2"], bs["norm2"] = _bn(sd, base + ".norm2")
            bp["conv2"] = {"kernel": cw(f"{idx}.ASPP_{d}.conv2"),
                           "bias": cb(f"{idx}.ASPP_{d}.conv2")}
            da_p[f"aspp_{d}"] = bp
            da_s[f"aspp_{d}"] = bs
        da_p["classification"] = {
            "kernel": cw(f"{idx}.classification.1"),
            "bias": cb(f"{idx}.classification.1"),
        }
        params["denseaspp"] = da_p
        stats["denseaspp"] = da_s
        idx += 1
    params["dispconv"] = {"conv": {"kernel": cw(f"{idx}.conv"),
                                   "bias": cb(f"{idx}.conv")}}
    idx += 1
    if use_mixture_loss:
        params["sigmaconv"] = {"conv": {"kernel": cw(f"{idx}.conv"),
                                        "bias": cb(f"{idx}.conv")}}
        idx += 1
    if plane_residual:
        params["residualconv_0"] = {"kernel": cw(f"{idx}.0"),
                                    "bias": cb(f"{idx}.0")}
        params["residualconv_1"] = {"kernel": cw(f"{idx}.2"),
                                    "bias": cb(f"{idx}.2")}
        idx += 1
    return params, stats


def convert_pose_decoder(sd: Dict, num_ep: int = 8) -> Dict:
    """Reference ``PoseDecoder`` state_dict -> params for
    models.pose_net.PoseDecoder (num_input_features=1, the trainer's
    configuration — reference trainer.py:94).

    Reference module order (``net.{idx}``, networks/pose_net.py:111-126):
    squeeze, [epconv], pose_0, pose_1, pose_2.
    """
    prefix = "net." if any(k.startswith("net.") for k in sd) else ""

    def cw(key):
        return _conv(np.asarray(sd[prefix + key + ".weight"]))

    def cb(key):
        return np.asarray(sd[prefix + key + ".bias"])

    params: Dict = {}
    idx = 0
    params["squeeze_0"] = {"kernel": cw(f"{idx}"), "bias": cb(f"{idx}")}
    idx += 1
    if num_ep > 0:
        params["epconv"] = {
            "conv0": {"kernel": cw(f"{idx}.0"), "bias": cb(f"{idx}.0")},
            "conv1": {"kernel": cw(f"{idx}.2"), "bias": cb(f"{idx}.2")},
        }
        idx += 1
    for i in range(3):
        params[f"pose_{i}"] = {"kernel": cw(f"{idx}"), "bias": cb(f"{idx}")}
        idx += 1
    return params


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
