"""Monodepth2-style multi-scale sigmoid-disparity decoder
(reference networks/monov2_decoder.py:17-65), flax/NHWC.

Exported for API parity with the reference (its trainer never uses it).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from planedepth_tpu.models.layers import Conv3x3, ConvBlock
from planedepth_tpu.ops.resize import upsample2x_nearest

Dtype = Any

NUM_CH_DEC = (16, 32, 64, 128, 256)


class Monov2Decoder(nn.Module):
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features) -> Dict:
        outputs = {}
        x = input_features[-1].astype(self.dtype)
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.dtype)], axis=-1
                )
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = nn.sigmoid(
                    Conv3x3(self.num_output_channels, dtype=self.dtype,
                            name=f"dispconv_{i}")(x).astype(jnp.float32)
                )
                outputs[("disp", i)] = disp
        return outputs
