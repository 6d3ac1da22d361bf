"""Bilinear sampling ops (TPU-native replacement for torch.F.grid_sample).

The reference's training hot path funnels every per-plane warp through
``F.grid_sample(..., padding_mode="zeros", align_corners=True)``
(reference: trainer.py:573-577) and the teacher/self-reconstruction paths use
``padding_mode="border"`` (trainer.py:624-628).  This module reproduces those
semantics exactly with XLA gathers on NHWC tensors, so it runs on the MXU/VPU
without any host fallback and is differentiable end-to-end.

Layout note: everything here is channels-last ``(..., H, W, C)`` — the
TPU-native layout — whereas the reference is NCHW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Map align_corners=True normalized coords [-1, 1] -> pixel [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample ``image`` at normalized ``coords``.

    Args:
      image: ``(B, H, W, C)`` source.
      coords: ``(B, Ho, Wo, 2)`` with ``coords[..., 0]`` = x, ``[..., 1]`` = y
        in [-1, 1], align_corners=True convention (−1 ↦ pixel 0, +1 ↦ W−1).
      padding_mode: "zeros" (out-of-bounds corners contribute 0, matching
        torch) or "border" (indices clamped to the edge).

    Returns:
      ``(B, Ho, Wo, C)`` sampled output, dtype of ``image``.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = image.shape
    compute_dtype = jnp.promote_types(image.dtype, jnp.float32)

    x = _unnormalize(coords[..., 0].astype(compute_dtype), W)
    y = _unnormalize(coords[..., 1].astype(compute_dtype), H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0  # weight of the x1 corner
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(cx, cy, wgt):
        if padding_mode == "zeros":
            valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            wgt = jnp.where(valid, wgt, 0.0)
        ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        flat_idx = iy * W + ix                       # (B, Ho, Wo)
        flat_img = image.reshape(B, H * W, C)
        vals = jnp.take_along_axis(
            flat_img,
            flat_idx.reshape(B, -1, 1),
            axis=1,
        ).reshape(flat_idx.shape + (C,))
        return vals.astype(compute_dtype) * wgt[..., None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out.astype(image.dtype)


def grid_sample_planes(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample a shared image at per-plane warp grids.

    The reference materializes the source once per plane and runs ONE
    grid_sample over a ``(B*N, C, H, W)`` batch (trainer.py:567-577).  Here the
    image stays ``(B, H, W, C)`` and the plane axis lives only in the coords.

    Args:
      image: ``(B, H, W, C)``.
      coords: ``(B, N, Ho, Wo, 2)`` normalized xy.

    Returns:
      ``(B, N, Ho, Wo, C)``.
    """
    return jax.vmap(
        lambda c: grid_sample(image, c, padding_mode), in_axes=1, out_axes=1
    )(coords)


def shift_sample_x(
    image: jnp.ndarray,
    shift: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``image`` at ``x_src = x + shift`` (y unchanged).

    Specialization of :func:`grid_sample` for the stereo ``disp_warp`` mode
    (reference trainer.py:540-554) where the warp is a pure horizontal
    disparity shift: the bilinear interpolation degenerates to a 1-D linear
    interpolation along width, halving the gather traffic.

    Args:
      image: ``(B, H, W, C)``.
      shift: ``(B, N, H, W)`` horizontal source offset in PIXELS.  Positive
        means "sample to the right".

    Returns:
      ``(B, N, H, W, C)``.
    """
    B, H, W, C = image.shape
    # index math in f32; VALUE math in the image's own dtype — a bf16 image
    # keeps the whole gathered stack bf16 (the f32 upcast would double the
    # dominant activation at HR and, saved for backward, overflow HBM)
    compute_dtype = (
        image.dtype
        if image.dtype == jnp.bfloat16
        else jnp.promote_types(image.dtype, jnp.float32)
    )
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, None, :] + shift.astype(
        jnp.float32
    )
    x0 = jnp.floor(xs)
    w1 = xs - x0
    w0 = 1.0 - w1

    def take(cx, wgt):
        if padding_mode == "zeros":
            valid = (cx >= 0) & (cx <= W - 1)
            wgt = jnp.where(valid, wgt, 0.0)
        ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)      # (B, N, H, W)
        # gather along W for each (b, h) row
        img_b = image.astype(compute_dtype)                 # (B, H, W, C)
        vals = jnp.take_along_axis(
            img_b[:, None],                                 # (B, 1, H, W, C)
            ix[..., None],                                  # (B, N, H, W, 1)
            axis=3,
        )
        return vals * wgt.astype(compute_dtype)[..., None]

    out = take(x0, w0) + take(x0 + 1.0, w1)
    return out.astype(image.dtype)
