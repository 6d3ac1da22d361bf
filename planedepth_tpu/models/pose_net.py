"""Pose networks (reference networks/pose_net.py:19-346), flax/NHWC.

``PoseDecoder``: squeeze 1x1 + three pose convs + global mean, scaled by
0.01 into (axisangle, translation) (pose_net.py:99-155), with optional
positional-encoding grid injection.

``PladePoseNet``: the FAL-net-style two-image siamese pose variant
(pose_net.py:209-346) — exported for parity (unused by the reference
trainer).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.models.layers import (
    ConvELU,
    Deconv,
    EpConv,
    ResidualBlock,
)
from planedepth_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any


class PoseDecoder(nn.Module):
    """(reference pose_net.py:99-155)"""

    num_ch_enc: Sequence[int]
    num_input_features: int = 1
    num_frames_to_predict_for: int = 1
    stride: int = 1
    num_ep: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features, grid=None):
        # input_features: list (len num_input_features) of encoder pyramids
        last = [f[-1].astype(self.dtype) for f in input_features]
        cat = [
            nn.relu(
                nn.Conv(256, (1, 1), dtype=self.dtype, name=f"squeeze_{i}")(f)
            )
            for i, f in enumerate(last)
        ]
        x = jnp.concatenate(cat, axis=-1)

        if self.num_ep > 0:
            g = EpConv(self.num_ep, dtype=self.dtype, name="epconv")(
                grid.astype(self.dtype)
            )
            g = resize_bilinear_align_corners(g, x.shape[1:3])
            x = jnp.concatenate([x, g.astype(x.dtype)], axis=-1)

        s = (self.stride, self.stride)
        x = nn.Conv(256, (3, 3), strides=s, padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="pose_0")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), strides=s, padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="pose_1")(x)
        x = nn.relu(x)
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1),
                    dtype=self.dtype, name="pose_2")(x)

        out = jnp.mean(x.astype(jnp.float32), axis=(1, 2))     # (B, 6*F)
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]                       # axisangle, t


class PladeBackbone(nn.Module):
    """Two-image siamese encoder (reference pose_net.py:209-308)."""

    batch_norm: bool = True
    num_ep: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, grid, train: bool = True):
        bn = self.batch_norm
        dt = self.dtype
        # shared-weight submodules (declared once; both images reuse them)
        c0 = ConvELU(64, 3, batch_norm=bn, dtype=dt, name="conv0")
        c0_1 = ResidualBlock(64, dtype=dt, name="conv0_1")
        c0l = ConvELU(64, 3, batch_norm=bn, dtype=dt, name="conv0l")
        c0l_1 = ResidualBlock(64, dtype=dt, name="conv0l_1")
        c1 = ConvELU(128, stride=2, batch_norm=bn, dtype=dt, name="conv1")
        c1_1 = ResidualBlock(128, dtype=dt, name="conv1_1")
        c2 = ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv2")
        c2_1 = ResidualBlock(256, dtype=dt, name="conv2_1")
        c3 = ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv3")
        c3_1 = ResidualBlock(256, dtype=dt, name="conv3_1")
        c4 = ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv4")
        c4_1 = ResidualBlock(256, dtype=dt, name="conv4_1")
        c5 = ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv5")
        c5_1 = ResidualBlock(256, dtype=dt, name="conv5_1")
        c6 = ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv6")
        c6_1 = ResidualBlock(256, dtype=dt, name="conv6_1")

        x = x.astype(dt)
        y = y.astype(dt)
        grid = grid.astype(dt)
        eps = [
            EpConv(self.num_ep, dtype=dt, name=f"conv_ep{i}")(grid)
            for i in range(1, 7)
        ]
        d = lambda g, ref: resize_bilinear_align_corners(g, ref.shape[1:3])

        def enc_half(img):
            out0 = c0_1(c0(img, train))
            out1 = c1_1(c1(jnp.concatenate([out0, eps[0]], -1), train))
            half = resize_bilinear_align_corners(img, out1.shape[1:3])
            out0l = c0l_1(c0l(half, train))
            out2 = c2_1(c2(
                jnp.concatenate([out1, out0l, d(eps[1], out1)], -1), train))
            out3 = c3_1(c3(jnp.concatenate([out2, d(eps[2], out2)], -1), train))
            out4 = c4_1(c4(jnp.concatenate([out3, d(eps[3], out3)], -1), train))
            out5 = c5_1(c5(jnp.concatenate([out4, d(eps[4], out4)], -1), train))
            return out5

        out5_x = enc_half(x)
        out5_y = enc_half(y)
        d6 = d(eps[5], out5_x)
        return c6_1(c6(jnp.concatenate([out5_x, out5_y, d6], -1), train))


class PladePoseNet(nn.Module):
    """(reference pose_net.py:311-346)"""

    batch_norm: bool = True
    num_ep: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, grid, train: bool = True):
        h = PladeBackbone(self.batch_norm, self.num_ep, dtype=self.dtype,
                          name="backbone")(x, y, grid, train)
        h = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="pose_0")(h)
        h = nn.relu(h)
        h = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="pose_1")(h)
        h = nn.relu(h)
        h = nn.Conv(6, (1, 1), dtype=self.dtype, name="pose_2")(h)
        out = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        out = 0.01 * out.reshape(-1, 1, 1, 6)
        return out[..., :3], out[..., 3:]
