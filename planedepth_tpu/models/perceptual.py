"""Frozen perceptual feature extractors (reference layers.py:378-449).

``Vgg19Features``: VGG-19 config-E slices up to relu1_2 / relu2_2 / relu3_4
(optionally relu4_4), with torchvision ImageNet normalization
(layers.py:407-408).  ``Resnet18Features``: the 3-stage ResNet-18 variant
(layers.py:424-449).  Selected by ``LossConfig.pc_net`` (trainer.py:165-168).

These nets carry ImageNet weights converted from torchvision via
utils/torch_convert.py; at init time they are random (the training CLI loads
converted weights when available).  Parameters are kept in a separate
collection-free pytree and NEVER trained — the caller wraps calls in
``jax.lax.stop_gradient`` on the params side by simply not differentiating
w.r.t. them (they live outside the optimizer).
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.models.resnet import ResNetTrunk, max_pool_3x3_s2

Dtype = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# VGG-19 features config E. NOTE: the reference's slices INCLUDE the pool
# layers (slice1 = features[0:5] ends at pool1, layers.py:392-399), so the
# perceptual features compared are the POOLED maps.
_VGG_SLICES = (
    (64, 64, "pool"),
    (128, 128, "pool"),
    (256, 256, 256, 256, "pool"),
    (512, 512, 512, 512, "pool"),
)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class _ConvParams(nn.Module):
    """Raw 3x3 conv parameters with an nn.Conv-compatible tree
    ({name: {kernel, bias}}, lecun_normal/zeros inits) so converted
    torchvision weights load identically on both stem paths."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Vgg19Features(nn.Module):
    """(reference layers.py:378-422)

    ``packed=True`` consumes a space-to-depth image ``(B, H/2, W/2, 12)``
    (channels (py, px, c), models/s2d.py) and runs conv1_1 in the packed
    domain via the exact ``s2d_conv_kernel`` re-expression — the
    production quad train step feeds the sweep kernel's phase-split
    reconstruction (and the already-packed target/source) straight in,
    so no full-resolution C=3 tensor (stored ~21x lane-padded by XLA)
    enters the perceptual branch.  Identical parameters serve both paths.
    """

    full: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, packed: bool = False) -> List[jnp.ndarray]:
        import jax.lax as lax

        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        k0, b0 = _ConvParams(64, 3, name="conv_0")()
        if packed:
            from planedepth_tpu.models import s2d

            h = ((x - jnp.tile(mean, 4)) / jnp.tile(std, 4)).astype(
                self.dtype)
            h = s2d.conv_valid(
                s2d.phase_pad(h, "zero"), s2d.s2d_conv_kernel(k0),
                s2d.tile_bias(b0), self.dtype,
            )
            h = s2d.depth_to_space(nn.relu(h))
        else:
            h = ((x - mean) / std).astype(self.dtype)
            h = lax.conv_general_dilated(
                h, k0.astype(self.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b0.astype(self.dtype)
            h = nn.relu(h)
        feats = []
        conv_idx = 0
        n_slices = 4 if self.full else 3
        for s, spec in enumerate(_VGG_SLICES[:n_slices]):
            for item in spec:
                if item == "pool":
                    h = max_pool_2x2(h)
                elif conv_idx == 0:
                    conv_idx += 1        # conv_0 applied above
                else:
                    h = nn.Conv(
                        item, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv_{conv_idx}",
                    )(h)
                    h = nn.relu(h)
                    conv_idx += 1
            feats.append(h)
        return feats


class Resnet18Features(nn.Module):
    """(reference layers.py:424-449): relu1, layer1, layer2 features."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        h = ((x - mean) / std).astype(self.dtype)
        # frozen feature net: BN uses running stats (eval mode)
        feats = ResNetTrunk(18, dtype=self.dtype, name="encoder")(
            h, train=False
        )
        return feats[:3]


def make_perceptual_net(kind: str, dtype=jnp.float32) -> nn.Module:
    if kind == "vgg19":
        return Vgg19Features(dtype=dtype)
    if kind == "resnet18":
        return Resnet18Features(dtype=dtype)
    raise ValueError(f"unknown perceptual net: {kind}")
