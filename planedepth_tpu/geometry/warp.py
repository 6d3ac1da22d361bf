"""Per-plane warp-grid construction for the three warp modes.

Reference semantics: trainer.py:523-603 (``pred_novel_images``) and
layers.py:184-234 (``HomographyWarp``).  Each function returns normalized
[-1, 1] sampling coordinates (align_corners=True) with the plane axis second:
``(B, N, H, W, 2)``, plus an optional validity mask.

TPU note: for the stereo ``disp_warp`` mode the full coordinate grid is never
needed — the warp is a pure horizontal shift, consumed directly by
``ops.sampling.shift_sample_x``.  The explicit grid builders here exist for
the depth/homography modes and as the correctness oracle.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from planedepth_tpu.geometry.camera import (
    backproject_depth,
    pixel_grid,
    project_3d,
)


def disp_warp_coords(
    disp_layered: jnp.ndarray, target_side, width: int, height: int
) -> jnp.ndarray:
    """Stereo plane-sweep coords: ``x_src = x -/+ disp`` (trainer.py:540-554).

    Args:
      disp_layered: ``(B, H, W, N)`` per-plane disparities.
      target_side: "l" (shift -disp) or "r" (shift +disp).

    Returns:
      ``(B, N, H, W, 2)`` normalized coords.
    """
    B, H, W, N = disp_layered.shape
    shift = disp_warp_shift(disp_layered, target_side)     # (B, N, H, W)
    base = pixel_grid(H, W, disp_layered.dtype)            # (H, W, 2)
    x = base[None, None, :, :, 0] + shift
    y = jnp.broadcast_to(base[None, None, :, :, 1], shift.shape)
    cx = (x / (W - 1) - 0.5) * 2.0
    cy = (y / (H - 1) - 0.5) * 2.0
    return jnp.stack([cx, cy], axis=-1)


def disp_warp_shift(disp_layered: jnp.ndarray, target_side) -> jnp.ndarray:
    """Signed horizontal source shift in pixels, ``(B, N, H, W)``.

    When synthesizing the right view from the left image, the source pixel
    for target x is at x + disp; for the left view it is x - disp
    (trainer.py:545-548).
    """
    d = jnp.moveaxis(disp_layered, -1, 1)                  # (B, N, H, W)
    if target_side == "l":
        return -d
    if target_side == "r":
        return d
    raise ValueError(f"disp_warp target must be a stereo side, got {target_side}")


def depth_warp_coords(
    disp_layered: jnp.ndarray,
    T: jnp.ndarray,
    K: jnp.ndarray,
    inv_K: jnp.ndarray,
    width: int,
) -> jnp.ndarray:
    """Backproject each plane's constant depth and project into the target
    camera (trainer.py:533-538).

    Args:
      disp_layered: ``(B, H, W, N)``.
      T, K, inv_K: ``(B, 4, 4)`` target pose / intrinsics.

    Returns:
      ``(B, N, H, W, 2)``.
    """
    B, H, W, N = disp_layered.shape
    depths = 0.1 * 0.58 * width / disp_layered             # (B, H, W, N)
    depths = jnp.moveaxis(depths, -1, 1).reshape(B * N, H, W)
    rep = lambda M: jnp.repeat(M, N, axis=0)               # (B*N, 4, 4)
    cam_points = backproject_depth(depths, rep(inv_K))
    coords = project_3d(cam_points, rep(K), rep(T), H, W)
    return coords.reshape(B, N, H, W, 2)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) batched 3x3 inverse.

    Avoids ``jnp.linalg.inv``'s LU path whose internal matmuls run at the
    backend's default (possibly bf16) precision — the homography inverse
    feeds pixel coordinates, where 1e-3 relative error is a visible warp
    artifact.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def homography_warp_coords(
    distance: jnp.ndarray,
    normal: jnp.ndarray,
    T: jnp.ndarray,
    K: jnp.ndarray,
    inv_K: jnp.ndarray,
    height: int,
    width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plane-induced homography warp (reference layers.py:184-234).

    For plane (n, d) and relative pose T = [R|t], the source->target
    homography is ``H_s2t = K (R + t n^T / d) K^-1``; target pixels are pulled
    through ``H_t2s = H_s2t^-1``.  A visibility mask removes back-facing and
    behind-camera samples.

    Args:
      distance: ``(B, N)`` plane distances.
      normal: ``(B, N, 3)`` plane normals.
      T, K, inv_K: ``(B, 4, 4)``.

    Returns:
      (coords ``(B, N, H, W, 2)``, mask ``(B, N, H, W)`` float).
    """
    B, N = distance.shape
    dtype = distance.dtype
    R = T[:, None, :3, :3]                                  # (B, 1, 3, 3)
    t = T[:, None, :3, 3:4]                                 # (B, 1, 3, 1)
    n_row = normal[:, :, None, :]                           # (B, N, 1, 3)
    Rtnd = R + jnp.matmul(t, n_row, precision='highest') / distance[:, :, None, None]
    K3 = K[:, None, :3, :3]
    iK3 = inv_K[:, None, :3, :3]
    H_s2t = jnp.matmul(K3, jnp.matmul(Rtnd, iK3), precision='highest')           # (B, N, 3, 3)
    H_t2s = inv3x3(H_s2t)

    grid = pixel_grid(height, width, dtype)
    pix = jnp.concatenate(
        [grid, jnp.ones((height, width, 1), dtype)], axis=-1
    ).reshape(-1, 3).T                                      # (3, HW)

    coords_h = jnp.einsum("bnij,jp->bnip", H_t2s, pix, precision='highest')      # (B, N, 3, HW)

    # visibility: ray direction (K^-1 x_t) must face the rotated plane normal
    rays = jnp.einsum("bij,jp->bip", inv_K[:, :3, :3], pix, precision='highest')      # (B, 3, HW)
    Rn = jnp.matmul(T[:, :3, :3], jnp.swapaxes(normal, 1, 2), precision='highest')    # (B, 3, N)
    facing = jnp.einsum("bip,bin->bnp", rays, Rn, precision='highest') > 0.0          # (B, N, HW)

    z = coords_h[:, :, 2, :]
    mask = facing & (z > 1e-7)
    z = jnp.maximum(z, 1e-7)
    xy = coords_h[:, :, :2, :] / z[:, :, None, :]
    xy = xy.reshape(B, N, 2, height, width)
    xy = jnp.moveaxis(xy, 2, -1)                            # (B, N, H, W, 2)
    scale = jnp.array([width - 1, height - 1], dtype)
    coords = (xy / scale - 0.5) * 2.0
    mask = mask.reshape(B, N, height, width).astype(dtype)
    # a SINGULAR plane homography (side planes through the camera under
    # pure-translation poses) makes inv3x3 emit NaN rows; every such
    # pixel has z = NaN -> mask 0, so pin its coordinate to a finite
    # out-of-range value: both the grid_sample oracle and the warp2d
    # kernel then sample exactly 0 with zero coordinate gradients,
    # instead of NaN x 0 poisoning (the reference's torch.inverse
    # produces garbage it never looks at for the same pixels)
    coords = jnp.where(mask[..., None] > 0, coords, 2.0)
    return coords, mask
