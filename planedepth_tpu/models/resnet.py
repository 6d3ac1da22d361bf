"""ResNet encoder family (torchvision topology, flax/NHWC).

Counterpart of the reference's ``ResnetEncoder`` (networks/resnet_encoder.py:
18-55): a torchvision ResNet-18/34/50/101/152 trunk returning the 5 feature
maps [relu1, layer1..layer4], with the hard-coded input normalization
``(x - 0.45) / 0.225`` (resnet_encoder.py:45).

Parameter names mirror torchvision (conv1/bn1/layerL/blockB/convN...) so the
one-shot torch->jax weight converter (utils/torch_convert.py) is a pure name
map.  BatchNorm runs in torch semantics (momentum 0.1, eps 1e-5); under the
sharded global batch it is synchronous across devices by construction,
replacing ``nn.SyncBatchNorm`` (reference trainer.py:98).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.models.layers import BatchNorm

Dtype = Any

# blocks per stage and block type per torchvision
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def encoder_channels(num_layers: int) -> np.ndarray:
    """Feature channels of the 5 outputs (resnet_encoder.py:24,37-38)."""
    ch = np.array([64, 64, 128, 256, 512])
    if num_layers > 34:
        ch[1:] *= 4
    return ch


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride,) * 2,
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        if self.downsample:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, train
            )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int           # base width; output features = 4x
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride,) * 2,
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv3",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, train)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, train
            )
        return nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """conv1 .. layer4 trunk shared by the depth and pose encoders.

    ``remat`` rematerializes every residual block in the backward pass —
    the conv activations are the second-largest HBM consumer at HR and
    recomputing them buys batch size for ~30% extra backward FLOPs.
    """

    num_layers: int = 50
    remat: bool = False
    s2d_stem: str = "off"           # auto | on | off (models/s2d.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Sequence[jnp.ndarray]:
        block_kind, blocks = RESNET_SPECS[self.num_layers]
        Block = BasicBlock if block_kind == "basic" else Bottleneck
        if self.remat:
            Block = nn.remat(Block, static_argnums=(2,))
        expansion = 1 if block_kind == "basic" else 4

        use_s2d_stem = (
            self.s2d_stem == "on"
            or (self.s2d_stem == "auto"
                and jax.default_backend() == "tpu")
        ) and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0

        features = []
        if use_s2d_stem:
            # MLPerf-style space-to-depth stem: XLA stores the C=3 NHWC
            # input 42x lane-padded; the 7x7/2 conv re-expressed on the
            # 2-level packed grid (models/s2d.py:stem_s2d_kernel) keeps
            # every stem tensor lane-sized — exact, canonical weights
            from planedepth_tpu.models import s2d

            k1 = s2d.ConvKernelParams(
                64, x.shape[-1], 7, name="conv1")()
            x4 = s2d.space_to_depth2(x)
            x4 = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out4 = s2d.conv_valid(
                x4, s2d.stem_s2d_kernel(k1),
                jnp.zeros((256,), self.dtype), self.dtype,
            )
            x = s2d.depth_to_space(out4)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        features.append(x)

        x = max_pool_3x3_s2(x)
        in_ch = 64
        for stage, (width, n_blocks) in enumerate(
            zip((64, 128, 256, 512), blocks)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                downsample = b == 0 and (
                    stride != 1 or in_ch != width * expansion
                )
                x = Block(
                    width,
                    stride=stride if b == 0 else 1,
                    downsample=downsample,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                in_ch = width * expansion
            features.append(x)
        return features


class ResnetEncoder(nn.Module):
    """Depth encoder (reference networks/resnet_encoder.py:18-55)."""

    num_layers: int = 50
    remat: bool = False
    s2d_stem: str = "off"
    dtype: Dtype = jnp.float32

    @property
    def num_ch_enc(self) -> np.ndarray:
        return encoder_channels(self.num_layers)

    @nn.compact
    def __call__(self, image, train: bool = True):
        x = (image.astype(self.dtype) - 0.45) / 0.225
        return ResNetTrunk(
            self.num_layers, remat=self.remat, s2d_stem=self.s2d_stem,
            dtype=self.dtype, name="encoder",
        )(x, train)


class ResnetPoseEncoder(nn.Module):
    """Pose encoder taking stacked frames (reference pose_net.py:19-97).

    The first conv accepts ``num_input_images * 3`` channels; pretrained
    weights are tiled/averaged at conversion time (pose_net.py:57-60).
    """

    num_layers: int = 18
    num_input_images: int = 2
    dtype: Dtype = jnp.float32

    @property
    def num_ch_enc(self) -> np.ndarray:
        return encoder_channels(self.num_layers)

    @nn.compact
    def __call__(self, images, train: bool = True):
        x = (images.astype(self.dtype) - 0.45) / 0.225
        return ResNetTrunk(
            self.num_layers, dtype=self.dtype, name="encoder",
        )(x, train)
