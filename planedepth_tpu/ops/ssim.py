"""SSIM loss (reference layers.py:276-306), NHWC.

Reflection-pad by 1 then 3x3 average pooling; C1 = 0.01^2, C2 = 0.03^2.
Output is ``clamp((1 - SSIM) / 2, 0, 1)`` per pixel/channel.
"""
from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

_C1 = 0.01**2
_C2 = 0.03**2


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/1 mean pool on reflection-padded NHWC input; output same HxW."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM distance, ``(B, H, W, C) -> (B, H, W, C)``."""
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x**2
    sigma_y = _avg_pool3(y * y) - mu_y**2
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x**2 + mu_y**2 + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - n / d) / 2.0, 0.0, 1.0)
