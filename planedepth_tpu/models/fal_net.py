"""FalNet baseline: 49 vertical planes, softmax compositing
(reference networks/fal_net.py:73-207), flax/NHWC.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.config import PlaneConfig
from planedepth_tpu.geometry.camera import disp_to_depth
from planedepth_tpu.models.layers import ConvELU, Deconv, ResidualBlock
from planedepth_tpu.models.plade_net import FAL_MEAN

Dtype = Any


class FalBackBone(nn.Module):
    """(reference fal_net.py:73-156)"""

    no_out: int
    batch_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        bn = self.batch_norm
        x = x.astype(dt)

        chans = (32, 64, 128, 256, 256, 256, 512)
        outs = []
        h = x
        for i, ch in enumerate(chans):
            stride = 1 if i == 0 else 2
            h = ConvELU(ch, 3, stride=stride, batch_norm=bn, dtype=dt,
                        name=f"conv{i}")(h, train)
            h = ResidualBlock(ch, dtype=dt, name=f"conv{i}_1")(h)
            outs.append(h)
        c0, c1, c2, c3, c4, c5, c6 = outs

        hw = lambda t: t.shape[1:3]
        d6 = Deconv(256, dtype=dt, name="deconv6")(c6, hw(c5))
        i6 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv6")(
            jnp.concatenate([d6, c5], -1), train)
        d5 = Deconv(128, dtype=dt, name="deconv5")(i6, hw(c4))
        i5 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv5")(
            jnp.concatenate([d5, c4], -1), train)
        d4 = Deconv(128, dtype=dt, name="deconv4")(i5, hw(c3))
        i4 = ConvELU(256, batch_norm=bn, dtype=dt, name="iconv4")(
            jnp.concatenate([d4, c3], -1), train)
        d3 = Deconv(128, dtype=dt, name="deconv3")(i4, hw(c2))
        i3 = ConvELU(128, batch_norm=bn, dtype=dt, name="iconv3")(
            jnp.concatenate([d3, c2], -1), train)
        d2 = Deconv(64, dtype=dt, name="deconv2")(i3, hw(c1))
        i2 = ConvELU(64, batch_norm=bn, dtype=dt, name="iconv2")(
            jnp.concatenate([d2, c1], -1), train)
        d1 = Deconv(64, dtype=dt, name="deconv1")(i2, hw(c0))
        dlog = nn.Conv(self.no_out, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=False, dtype=dt, name="iconv1")(
            jnp.concatenate([d1, c0], -1))
        return dlog


class FalNet(nn.Module):
    """(reference fal_net.py:159-207)"""

    planes: PlaneConfig = PlaneConfig(xz_levels=0, yz_levels=0)
    batch_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.planes
        N = cfg.disp_levels
        x = image - jnp.asarray(FAL_MEAN, image.dtype)
        dlog = FalBackBone(N, self.batch_norm, dtype=self.dtype,
                           name="backbone")(x, train)
        B, H, W, _ = dlog.shape

        logits = nn.Conv(N, (1, 1), dtype=self.dtype, name="conv0")(
            dlog
        ).astype(jnp.float32)
        probability = nn.softmax(logits, axis=-1)
        lvl = jnp.arange(N, dtype=jnp.float32)
        disp = cfg.disp_max * (cfg.disp_min / cfg.disp_max) ** (lvl / (N - 1))
        disp_layered = jnp.broadcast_to(
            disp[None, None, None, :], (B, H, W, N)
        )
        outputs = {
            "logits": logits,
            "probability": probability,
            "disp_layered": disp_layered,
            "padding_mask": jnp.ones_like(disp_layered),
            "disp_rows": disp_layered[:, :, 0, :],
        }
        outputs["disp"] = jnp.sum(
            probability * disp_layered, axis=-1, keepdims=True
        )
        outputs["depth"] = disp_to_depth(outputs["disp"], W)
        return outputs
