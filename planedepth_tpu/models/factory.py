"""Model factory: config -> flax module(s).

Counterpart of ``Trainer.create_models`` (reference trainer.py:188-225) plus
the pose-net construction (trainer.py:92-94).  The three net types are
unified behind one module, ``DepthModel``, whose __call__ takes
``(image, grid)`` and returns the standard outputs dict — so the train step,
evaluator, and export path are identical for all families.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.config import ModelConfig
from planedepth_tpu.models.depth_decoder import DepthDecoder
from planedepth_tpu.models.fal_net import FalNet
from planedepth_tpu.models.plade_net import PladeNet
from planedepth_tpu.models.resnet import ResnetEncoder, encoder_channels

Dtype = Any


class DepthModel(nn.Module):
    """Unified depth network: encoder+decoder (ResNet) or PladeNet or FalNet."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, grid, train: bool = True) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        if c.net_type == "ResNet":
            features = ResnetEncoder(
                c.num_layers, remat=c.remat, s2d_stem=c.s2d_stem,
                dtype=self.dtype, name="encoder"
            )(image, train)
            return DepthDecoder(
                num_ch_enc=tuple(encoder_channels(c.num_layers)),
                planes=c.planes,
                num_ep=c.num_ep,
                pe_type=c.pe_type,
                use_denseaspp=c.use_denseaspp,
                use_mixture_loss=c.use_mixture_loss,
                render_probability=c.render_probability,
                plane_residual=c.plane_residual,
                fused_head=c.fused_head,
                fused_head_bf16=c.fused_head_bf16,
                fused_sweep_loss=c.fused_sweep_loss,
                s2d_tail=c.s2d_tail,
                dtype=self.dtype,
                name="depth",
            )(features, grid, train)
        if c.net_type == "PladeNet":
            return PladeNet(
                planes=c.planes,
                num_ep=c.num_ep,
                use_mixture_loss=c.use_mixture_loss,
                render_probability=c.render_probability,
                plane_residual=c.plane_residual,
                dtype=self.dtype,
                name="plade",
            )(image, grid, train)
        if c.net_type == "FalNet":
            return FalNet(
                planes=c.planes, dtype=self.dtype, name="fal"
            )(image, train)
        raise ValueError(f"unknown net_type {c.net_type}")


def build_depth_model(cfg: ModelConfig, bf16: bool = False) -> DepthModel:
    return DepthModel(cfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
