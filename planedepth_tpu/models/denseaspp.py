"""DenseASPP block (reference networks/denseaspp.py:6-76), flax/NHWC.

Five cascaded dilated conv blocks (d = 3, 6, 12, 18, 24) with dense feature
concatenation, each block = [BN -> ReLU -> 1x1 conv -> BN -> ReLU -> 3x3
dilated conv -> channel dropout], followed by a dropout + 1x1 fuse.  The
reference's BN momentum is 0.0003 (denseaspp.py:12,17).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.models.layers import BatchNorm

Dtype = Any


class DenseAsppBlock(nn.Module):
    num1: int
    num2: int
    dilation: int
    drop_rate: float = 0.1
    bn_start: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.bn_start:
            x = BatchNorm(momentum_torch=0.0003, dtype=self.dtype,
                          name="norm1")(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.num1, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(momentum_torch=0.0003, dtype=self.dtype,
                      name="norm2")(x, train)
        x = nn.relu(x)
        d = self.dilation
        x = nn.Conv(
            self.num2, (3, 3), kernel_dilation=(d, d),
            padding=[(d, d), (d, d)], dtype=self.dtype, name="conv2",
        )(x)
        if self.drop_rate > 0:
            # torch F.dropout2d zeroes whole channels per-sample
            x = nn.Dropout(
                self.drop_rate, broadcast_dims=(1, 2), deterministic=not train,
            )(x)
        return x


class DenseAspp(nn.Module):
    num_features: int = 256
    d_feature0: int = 512
    d_feature1: int = 128
    dropout0: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feature = x
        for i, dilation in enumerate((3, 6, 12, 18, 24)):
            block = DenseAsppBlock(
                self.d_feature0,
                self.d_feature1,
                dilation,
                drop_rate=self.dropout0,
                bn_start=i > 0,
                dtype=self.dtype,
                name=f"aspp_{dilation}",
            )
            out = block(feature, train)
            feature = jnp.concatenate([out, feature], axis=-1)
        feature = nn.Dropout(
            self.dropout0, broadcast_dims=(1, 2), deterministic=not train,
        )(feature)
        return nn.Conv(
            self.num_features, (1, 1), dtype=self.dtype, name="classification",
        )(feature)
