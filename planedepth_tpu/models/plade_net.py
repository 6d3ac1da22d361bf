"""PladeNet: FAL-net-style backbone with plane head
(reference networks/plade_net.py:75-343), flax/NHWC.

Encoder: two input stems (full + half resolution) and six strided conv+
residual stages with positional-encoding injection; decoder: deconv/iconv
ladder back to full resolution.  The plane head builds the same
vertical+ground plane volume as the ResNet decoder (no yz planes) and the
mixture reweighting WITHOUT the padding-mask factor (plade_net.py:330-331 —
unlike depth_decoder.py:283).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.config import PlaneConfig
from planedepth_tpu.geometry.camera import disp_to_depth
from planedepth_tpu.geometry.planes import build_plane_volume
from planedepth_tpu.models.depth_decoder import (
    plane_dists,
    render_probability_from_logits,
)
from planedepth_tpu.models.layers import (
    ConvELU,
    Deconv,
    ResidualBlock,
)
from planedepth_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any

# FalNet/PladeNet input normalization (plade_net.py:248, fal_net.py:176)
FAL_MEAN = (0.411, 0.432, 0.45)


class PladeBackBone(nn.Module):
    """(reference plade_net.py:75-196)"""

    no_out: int
    num_ep: int = 8
    batch_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid, train: bool = True):
        dt = self.dtype
        bn = self.batch_norm
        x = x.astype(dt)
        d = lambda g, ref: resize_bilinear_align_corners(g, ref.shape[1:3])

        out0 = ResidualBlock(64, dtype=dt, name="conv0_1")(
            ConvELU(64, 3, batch_norm=bn, dtype=dt, name="conv0")(x, train)
        )

        if self.num_ep > 0:
            g = ConvELU(16, 1, pad=0, batch_norm=bn, dtype=dt,
                        name="conv_ep1")(grid.astype(dt), train)
            g = ConvELU(self.num_ep, 1, pad=0, batch_norm=bn, dtype=dt,
                        name="conv_ep2")(g, train)
            out1 = ResidualBlock(128, dtype=dt, name="conv1_1")(
                ConvELU(128, stride=2, batch_norm=bn, dtype=dt, name="conv1")(
                    jnp.concatenate([out0, g], -1), train
                )
            )
            half = resize_bilinear_align_corners(x, out1.shape[1:3])
            out0l = ResidualBlock(64, dtype=dt, name="conv0l_1")(
                ConvELU(64, 3, batch_norm=bn, dtype=dt, name="conv0l")(
                    half, train
                )
            )
            out2 = ResidualBlock(256, dtype=dt, name="conv2_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv2")(
                    jnp.concatenate([out1, out0l, d(g, out1)], -1), train
                )
            )
            out3 = ResidualBlock(256, dtype=dt, name="conv3_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv3")(
                    jnp.concatenate([out2, d(g, out2)], -1), train
                )
            )
            out4 = ResidualBlock(256, dtype=dt, name="conv4_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv4")(
                    jnp.concatenate([out3, d(g, out3)], -1), train
                )
            )
            out5 = ResidualBlock(256, dtype=dt, name="conv5_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv5")(
                    jnp.concatenate([out4, d(g, out4)], -1), train
                )
            )
            out6 = ResidualBlock(256, dtype=dt, name="conv6_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv6")(
                    jnp.concatenate([out5, d(g, out5)], -1), train
                )
            )
        else:
            out1 = ResidualBlock(128, dtype=dt, name="conv1_1")(
                ConvELU(128, stride=2, batch_norm=bn, dtype=dt, name="conv1")(
                    out0, train
                )
            )
            half = resize_bilinear_align_corners(x, out1.shape[1:3])
            out0l = ResidualBlock(64, dtype=dt, name="conv0l_1")(
                ConvELU(64, 3, batch_norm=bn, dtype=dt, name="conv0l")(
                    half, train
                )
            )
            out2 = ResidualBlock(256, dtype=dt, name="conv2_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv2")(
                    jnp.concatenate([out1, out0l], -1), train
                )
            )
            out3 = ResidualBlock(256, dtype=dt, name="conv3_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv3")(
                    out2, train
                )
            )
            out4 = ResidualBlock(256, dtype=dt, name="conv4_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv4")(
                    out3, train
                )
            )
            out5 = ResidualBlock(256, dtype=dt, name="conv5_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv5")(
                    out4, train
                )
            )
            out6 = ResidualBlock(256, dtype=dt, name="conv6_1")(
                ConvELU(256, stride=2, batch_norm=bn, dtype=dt, name="conv6")(
                    out5, train
                )
            )

        # decoder ladder
        hw = lambda t: t.shape[1:3]
        dc6 = Deconv(128, dtype=dt, name="deconv6")(out6, hw(out5))
        i6 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv6")(
            jnp.concatenate([dc6, out5], -1), train)
        dc5 = Deconv(128, dtype=dt, name="deconv5")(i6, hw(out4))
        i5 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv5")(
            jnp.concatenate([dc5, out4], -1), train)
        dc4 = Deconv(128, dtype=dt, name="deconv4")(i5, hw(out3))
        i4 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv4")(
            jnp.concatenate([dc4, out3], -1), train)
        dc3 = Deconv(128, dtype=dt, name="deconv3")(i4, hw(out2))
        i3 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv3")(
            jnp.concatenate([dc3, out2], -1), train)
        dc2 = Deconv(128, dtype=dt, name="deconv2")(i3, hw(out1))
        i2 = ConvELU(128, batch_norm=bn, dtype=dt, name="iconv2")(
            jnp.concatenate([dc2, out1], -1), train)
        dc1 = Deconv(64, dtype=dt, name="deconv1")(i2, hw(out0))
        concat1 = jnp.concatenate([dc1, out0], -1)
        dlog = nn.Conv(self.no_out, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=False, dtype=dt, name="iconv1")(concat1)
        return dlog, concat1


class PladeNet(nn.Module):
    """(reference plade_net.py:199-343)"""

    planes: PlaneConfig = PlaneConfig(yz_levels=0)
    num_ep: int = 8
    batch_norm: bool = False
    use_mixture_loss: bool = False
    render_probability: bool = False
    plane_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, grid, train: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.planes
        assert cfg.yz_levels == 0, "PladeNet supports vertical+xz planes only"
        n_levels = cfg.disp_levels + cfg.xz_levels
        no_out = n_levels - 1 if self.render_probability else n_levels

        x = image - jnp.asarray(FAL_MEAN, image.dtype)
        dlog, features = PladeBackBone(
            no_out, self.num_ep, self.batch_norm, dtype=self.dtype,
            name="backbone",
        )(x, grid, train)

        B, H, W, _ = dlog.shape
        outputs: Dict[str, jnp.ndarray] = {}

        residual_levels = None
        if self.plane_residual:
            r = nn.Conv(n_levels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name="conv_residual")(features)
            # NOTE: the reference applies sigmoid-0.5 on the per-pixel map and
            # relies on broadcasting of (B, N, 1, 1)-style residuals; its
            # residual head output is full-res, so levels become per-pixel.
            # We reduce to per-image (mean) to keep the plane family global,
            # matching the ResNet decoder head (depth_decoder.py:107-109).
            residual_levels = (
                nn.sigmoid(jnp.mean(r.astype(jnp.float32), axis=(1, 2))) - 0.5
            )

        vol = build_plane_volume(
            grid.astype(jnp.float32), cfg, W, residual_levels
        )
        outputs["disp_layered"] = vol.disp_layered
        outputs["padding_mask"] = vol.padding_mask
        outputs["distance"] = vol.distance
        outputs["norm"] = vol.normal
        outputs["disp_rows"] = vol.disp_layered[:, :, 0, :]

        logits = nn.Conv(no_out, (1, 1), dtype=self.dtype, name="conv0")(
            dlog
        ).astype(jnp.float32)
        if self.render_probability:
            dists = plane_dists(vol.disp_layered, W, H)
            outputs["dists"] = dists
            probability = render_probability_from_logits(logits, dists)
            logits = jnp.concatenate(
                [logits, jnp.ones_like(logits[..., :1])], axis=-1
            )
        else:
            probability = nn.softmax(logits, axis=-1)
        outputs["logits"] = logits

        if self.use_mixture_loss:
            sigma = nn.sigmoid(
                nn.Conv(n_levels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name="conv_sigma")(features).astype(jnp.float32)
            )
            sigma = jnp.clip(sigma, 0.01, 1.0)
            outputs["sigma"] = sigma
            outputs["pi"] = probability
            w = probability / sigma
            probability = w / jnp.sum(w, axis=-1, keepdims=True)

        outputs["probability"] = probability
        outputs["disp"] = jnp.sum(
            probability * vol.disp_layered, axis=-1, keepdims=True
        )
        outputs["depth"] = disp_to_depth(outputs["disp"], W)
        return outputs
