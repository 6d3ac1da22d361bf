"""Shared flax building blocks (NHWC, bf16-aware).

Counterparts of the reference's layer helpers (layers.py:95-125 ConvBlock /
Conv3x3 with reflection padding; plade_net.py:33-72 conv_elu /
residual_block / deconv).  All modules take a ``dtype`` for activations while
parameters stay float32; BatchNorm matches torch semantics (momentum 0.1,
eps 1e-5) and becomes sync-BN for free under GSPMD because the batch axis is
globally sharded (see parallel/mesh.py).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest

Dtype = Any


def reflect_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class Conv3x3(nn.Module):
    """Reflection-pad + 3x3 conv (reference layers.py:110-125)."""

    features: int
    use_refl: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_refl:
            x = reflect_pad(x, 1)
        else:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (reference layers.py:95-107)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3x3(self.features, dtype=self.dtype, name="conv")(x)
        return nn.elu(x)


class BatchNorm(nn.Module):
    """torch-compatible BatchNorm2d.

    torch momentum m means ``running = (1-m)*running + m*batch``; flax's
    ``momentum`` is the decay of the running stat, i.e. ``1 - m_torch``.
    """

    momentum_torch: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum_torch,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


class ConvELU(nn.Module):
    """conv(+BN)+ELU used by PladeNet/FalNet backbones
    (reference plade_net.py:33-46)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    batch_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            use_bias=not self.batch_norm,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.batch_norm:
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        return nn.elu(x)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with residual + ELUs (reference plade_net.py:61-72)."""

    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.features, (self.kernel_size,) * 2,
            padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        h = nn.elu(h)
        h = nn.Conv(
            self.features, (self.kernel_size,) * 2,
            padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype,
            name="conv2",
        )(h)
        return nn.elu(h + x)


class Deconv(nn.Module):
    """Nearest-resize to a reference shape + 3x3 conv + ELU
    (reference plade_net.py:49-58)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ref_hw: Tuple[int, int]):
        x = resize_nearest(x, ref_hw)
        x = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        return nn.elu(x)


class EpConv(nn.Module):
    """Neural positional encoding: 1x1 conv 2->16 ELU -> 1x1 16->num_ep ELU
    (reference depth_decoder.py:66-71, pose_net.py:116-121)."""

    num_ep: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, grid):
        x = nn.Conv(16, (1, 1), dtype=self.dtype, name="conv0")(grid)
        x = nn.elu(x)
        x = nn.Conv(self.num_ep, (1, 1), dtype=self.dtype, name="conv1")(x)
        return nn.elu(x)


def frequency_embed(grid: jnp.ndarray, num_ep: int) -> jnp.ndarray:
    """NeRF-style frequency embedding of the 2-channel grid.

    Reference layers.py:308-354 with ``multires = (num_ep//2 - 1)//2``:
    output = [grid, sin/cos(grid * 2^k) for k in 0..multires-1].
    """
    multires = (num_ep // 2 - 1) // 2
    outs = [grid]
    for k in range(multires):
        freq = 2.0**k
        outs.append(jnp.sin(grid * freq))
        outs.append(jnp.cos(grid * freq))
    return jnp.concatenate(outs, axis=-1)


def inject_grid(x: jnp.ndarray, grid_ep: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Bilinearly resize the PE feature to x's spatial shape and concat
    (reference depth_decoder.py:128-139)."""
    if grid_ep is None:
        return x
    g = resize_bilinear_align_corners(grid_ep, x.shape[1:3])
    return jnp.concatenate([x, g.astype(x.dtype)], axis=-1)
