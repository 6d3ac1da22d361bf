"""Pretrained-weight wiring for training.

The reference trains from ImageNet-pretrained torchvision encoders
(reference networks/resnet_encoder.py:35 ``models.resnet50(pretrained)``)
and a frozen ImageNet VGG19/ResNet18 perceptual net (reference
layers.py:381,430).  Here the torch->jax conversion happens offline
(``scripts/convert_torch_weights.py`` -> ``.npz``); this module merges the
converted trees into a freshly-initialized train state at Trainer
construction time, so training itself never imports torch.

Expected files in ``TrainConfig.weights_dir``:

  ``resnet{num_layers}.npz``       depth encoder trunk (net_type ResNet)
  ``resnet{pose_num_layers}.npz``  pose encoder trunk (conv1 tiled/averaged
                                   here for the 2-frame input,
                                   reference pose_net.py:57-60)
  ``vgg19.npz`` / ``resnet18.npz`` perceptual net per ``LossConfig.pc_net``
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np

from planedepth_tpu.utils.torch_convert import load_converted


class PretrainedWeightsError(RuntimeError):
    pass


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, Any]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = v
    return flat


def merge_subtree(dst: Dict, src: Dict, what: str) -> Dict:
    """Replace ``dst``'s leaves with ``src``'s, requiring an exact
    structure + shape match in both directions (a mismatch means the
    offline conversion and the live model disagree — a bug, not a warning).
    """
    fd, fs = _flatten(dst), _flatten(src)
    missing = sorted(set(fd) - set(fs))
    extra = sorted(set(fs) - set(fd))
    if missing or extra:
        raise PretrainedWeightsError(
            f"{what}: converted tree does not match the live model "
            f"(missing from npz: {missing[:8]}, unexpected in npz: "
            f"{extra[:8]})"
        )
    bad = [
        k for k in fd
        if tuple(np.shape(fs[k])) != tuple(np.shape(fd[k]))
    ]
    if bad:
        raise PretrainedWeightsError(
            f"{what}: shape mismatch at {bad[:8]}: "
            f"{[(tuple(np.shape(fs[k])), tuple(np.shape(fd[k]))) for k in bad[:4]]}"
        )

    def rebuild(d: Dict, s: Dict) -> Dict:
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, s[k])
            else:
                out[k] = np.asarray(s[k], dtype=np.asarray(v).dtype)
        return out

    return rebuild(dst, src)


def _tile_conv1(tree: Dict, num_input_images: int) -> Dict:
    """Tile/average the trunk's conv1 kernel for stacked-frame input
    (reference pose_net.py:57-60)."""
    out = dict(tree)
    enc = dict(out["encoder"])
    conv1 = dict(enc["conv1"])
    k = np.asarray(conv1["kernel"])
    if k.shape[2] == 3 and num_input_images > 1:
        conv1["kernel"] = (
            np.concatenate([k] * num_input_images, axis=2) / num_input_images
        )
    enc["conv1"] = conv1
    out["encoder"] = enc
    return out


def apply_pretrained(
    cfg, params: Dict, batch_stats: Dict, pc_params
) -> Tuple[Dict, Dict, Any, List[str]]:
    """Merge converted ImageNet weights from ``cfg.weights_dir`` into the
    freshly-initialized collections.  Returns the updated
    (params, batch_stats, pc_params, loaded_names)."""
    loaded: List[str] = []
    wd = cfg.weights_dir
    if wd is None:
        return params, batch_stats, pc_params, loaded
    if not os.path.isdir(wd):
        raise PretrainedWeightsError(f"weights_dir does not exist: {wd}")

    # depth encoder (ResNet family only; PladeNet/FalNet train from scratch
    # in the reference, trainer.py:205-224)
    if cfg.model.net_type == "ResNet":
        path = os.path.join(wd, f"resnet{cfg.model.num_layers}.npz")
        if not os.path.exists(path):
            raise PretrainedWeightsError(
                f"net_type ResNet with weights_dir set requires {path} "
                f"(run scripts/convert_torch_weights.py "
                f"resnet{cfg.model.num_layers} <pth> {wd})"
            )
        tree = load_converted(path)
        params = dict(params)
        params["model"] = dict(params["model"])
        params["model"]["encoder"] = merge_subtree(
            params["model"]["encoder"], tree["params"], "depth encoder params"
        )
        batch_stats = dict(batch_stats)
        batch_stats["model"] = dict(batch_stats["model"])
        batch_stats["model"]["encoder"] = merge_subtree(
            batch_stats["model"]["encoder"], tree["batch_stats"],
            "depth encoder batch_stats",
        )
        loaded.append(f"encoder<-resnet{cfg.model.num_layers}")

    # pose encoder (2-frame stacked input)
    if cfg.use_pose_net and "pose_encoder" in params:
        path = os.path.join(wd, f"resnet{cfg.model.pose_num_layers}.npz")
        if os.path.exists(path):
            tree = load_converted(path)
            p = _tile_conv1(tree["params"], num_input_images=2)
            params = dict(params)
            params["pose_encoder"] = merge_subtree(
                params["pose_encoder"], p, "pose encoder params"
            )
            batch_stats = dict(batch_stats)
            batch_stats["pose_encoder"] = merge_subtree(
                batch_stats["pose_encoder"], tree["batch_stats"],
                "pose encoder batch_stats",
            )
            loaded.append(f"pose_encoder<-resnet{cfg.model.pose_num_layers}")

    # perceptual net
    if cfg.loss.alpha_pc > 0 and pc_params is not None:
        fname = "vgg19.npz" if cfg.loss.pc_net == "vgg19" else "resnet18.npz"
        path = os.path.join(wd, fname)
        if not os.path.exists(path):
            raise PretrainedWeightsError(
                f"alpha_pc={cfg.loss.alpha_pc} > 0 requires ImageNet "
                f"perceptual weights, but {path} is missing (run "
                f"scripts/convert_torch_weights.py {cfg.loss.pc_net} "
                f"<pth> {wd})"
            )
        tree = load_converted(path)
        new_pc = dict(pc_params)
        new_pc["params"] = merge_subtree(
            pc_params["params"], tree["params"], "perceptual params"
        )
        if "batch_stats" in pc_params and "batch_stats" in tree:
            new_pc["batch_stats"] = merge_subtree(
                pc_params["batch_stats"], tree["batch_stats"],
                "perceptual batch_stats",
            )
        pc_params = new_pc
        loaded.append(f"pc<-{fname}")

    return params, batch_stats, pc_params, loaded


def check_perceptual_weights(cfg, loaded: List[str]) -> None:
    """Hard-error when the perceptual loss would backprop through a RANDOM
    net: the reference always uses ImageNet features (layers.py:381) and
    alpha_pc=0.1 is the default, so silently training against noise is the
    single most damaging misconfiguration."""
    if cfg.loss.alpha_pc <= 0 or cfg.allow_random_pc:
        return
    if any(name.startswith("pc<-") for name in loaded):
        return
    raise PretrainedWeightsError(
        f"alpha_pc={cfg.loss.alpha_pc} > 0 but no converted "
        f"{cfg.loss.pc_net} ImageNet weights were loaded. Set "
        "--weights_dir to a directory containing the converted .npz "
        "(scripts/convert_torch_weights.py), set --alpha_pc 0, or pass "
        "--allow_random_pc to explicitly accept a random perceptual net."
    )
