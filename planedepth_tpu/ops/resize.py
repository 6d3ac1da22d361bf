"""Device-side resize ops matching the torch semantics used by the reference.

The reference uses three interpolation modes on-device:
  * nearest x2 upsample in the U-Net decoder (layers.py:237-240),
  * bilinear align_corners=True for positional-encoding grids
    (depth_decoder.py:129,138) and PladeNet half-res input (plade_net.py:147),
  * nearest arbitrary-size in PladeNet/FalNet deconv blocks (plade_net.py:56).

All functions are NHWC and jittable.
"""
from __future__ import annotations

import jax.numpy as jnp


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsample, ``(B, H, W, C) -> (B, 2H, 2W, C)``."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest resize to ``size=(Ho, Wo)`` matching torch F.interpolate
    (mode='nearest'): src = floor(dst * scale).

    Fast paths avoid XLA gathers, which lower to near-scalar code on the
    TPU lane dimension: identity resize is a no-op and integer upscales
    are broadcast+reshape (floor(d * H/Ho) == d // k for Ho = k*H).
    """
    B, H, W, C = x.shape
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x
    if Ho % H == 0 and Wo % W == 0:
        ky, kx = Ho // H, Wo // W
        out = jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, ky, W, kx, C)
        )
        return out.reshape(B, Ho, Wo, C)
    iy = jnp.floor(jnp.arange(Ho) * (H / Ho)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(Wo) * (W / Wo)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def interp_matrix(s_in: int, s_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """(s_out, s_in) align_corners=True bilinear interpolation matrix:
    src = dst * (s_in - 1) / (s_out - 1), two taps per row."""
    if s_out == 1:
        src = jnp.zeros((1,), dtype)
    else:
        src = jnp.arange(s_out, dtype=dtype) * ((s_in - 1) / (s_out - 1))
    i0 = jnp.clip(jnp.floor(src), 0, s_in - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, s_in - 1)
    w1 = src - i0
    m = jnp.zeros((s_out, s_in), dtype)
    m = m.at[jnp.arange(s_out), i0].add(1.0 - w1)
    m = m.at[jnp.arange(s_out), i1].add(w1)
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics, NHWC.

    Matches ``F.interpolate(x, size, mode='bilinear', align_corners=True)``:
    src = dst * (S_in - 1) / (S_out - 1).  Implemented as two 1-D interps via
    small dense matmuls — MXU-friendly and exactly linear, so autodiff through
    it is cheap.
    """
    B, H, W, C = x.shape
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    my = interp_matrix(H, Ho, dtype)        # (Ho, H)
    mx = interp_matrix(W, Wo, dtype)        # (Wo, W)
    xf = x.astype(dtype)
    out = jnp.einsum("oh,bhwc->bowc", my, xf, precision="highest")
    out = jnp.einsum("ow,bhwc->bhoc", mx, out, precision="highest")
    return out.astype(x.dtype)
