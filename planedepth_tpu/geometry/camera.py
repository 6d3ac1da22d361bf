"""Camera model helpers (normalized KITTI intrinsics, backproject/project).

Magic constants reproduced bit-for-bit from the reference (SURVEY.md §2.4):
normalized intrinsics fx=0.58, fy=1.92, cx=cy=0.5 (kitti_dataset.py:29-32,
layers.py:469-472) and the disparity<->depth law ``depth = 0.1*0.58*W/disp``
(baseline 0.1 model units, fx_pixels = 0.58*W).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Normalized KITTI intrinsics (rows scaled by 1/W, 1/H).
NORMALIZED_K = np.array(
    [[0.58, 0.0, 0.5, 0.0],
     [0.0, 1.92, 0.5, 0.0],
     [0.0, 0.0, 1.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]],
    dtype=np.float32,
)

BASELINE = 0.1            # stereo baseline in model units (mono_dataset.py:203-206)
FX_NORM = 0.58
STEREO_SCALE_FACTOR = 5.4  # model units -> metres (evaluate_depth_HR.py:27)


def pixel_intrinsics(width: int, height: int) -> np.ndarray:
    """Normalized K scaled to pixel units (mono_dataset.py:193-198)."""
    K = NORMALIZED_K.copy()
    K[0, :] *= width
    K[1, :] *= height
    return K


def disp_to_depth(disp: jnp.ndarray, width: int) -> jnp.ndarray:
    """``depth = 0.1 * 0.58 * W / disp`` (depth_decoder.py:154,291 etc.)."""
    return BASELINE * FX_NORM * width / disp


def depth_to_disp(depth: jnp.ndarray, width: int) -> jnp.ndarray:
    return BASELINE * FX_NORM * width / depth


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Integer pixel-center coordinates ``(H, W, 2)`` with x, y channels."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)


def identity_norm_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """The [-1, 1] identity grid ``(H, W, 2)`` used when no crop is applied
    (pair_transforms.py:63-64, evaluate_depth_HR.py:139-140)."""
    xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)


def create_camera_plane(height: int, width: int) -> jnp.ndarray:
    """Unit-depth camera rays ``(H, W, 3)`` (reference layers.py:468-492).

    cam_points = K^-1 @ [x, y, 1] with K in pixel units for (height, width).
    """
    K = pixel_intrinsics(width, height)
    K_inv = np.linalg.inv(K)[:3, :3]
    grid = pixel_grid(height, width)
    pix = jnp.concatenate(
        [grid, jnp.ones((height, width, 1), grid.dtype)], axis=-1
    )  # (H, W, 3)
    return jnp.einsum("ij,hwj->hwi", jnp.asarray(K_inv, grid.dtype), pix, precision='highest')


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth map -> homogeneous camera-frame point cloud.

    Reference layers.py:128-156 (``BackprojectDepth``).

    Args:
      depth: ``(B, H, W)`` or ``(B, H, W, 1)``.
      inv_K: ``(B, 4, 4)``.

    Returns:
      ``(B, 4, H*W)`` homogeneous points.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    grid = pixel_grid(H, W, depth.dtype)
    pix = jnp.concatenate([grid, jnp.ones((H, W, 1), depth.dtype)], axis=-1)
    pix = pix.reshape(H * W, 3).T                                   # (3, HW)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision='highest')          # (B, 3, HW)
    cam = depth.reshape(B, 1, H * W) * cam
    ones = jnp.ones((B, 1, H * W), depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(
    points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray,
    height: int, width: int, eps: float = 1e-7,
) -> jnp.ndarray:
    """Project homogeneous points into a camera at pose T.

    Reference layers.py:159-182 (``Project3D``): returns normalized [-1, 1]
    pixel coords ``(B, H, W, 2)`` in align_corners=True convention.
    """
    P = jnp.matmul(K, T, precision='highest')[:, :3, :]
    cam = jnp.matmul(P, points, precision='highest')                                     # (B, 3, HW)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    pix = pix.reshape(-1, 2, height, width)
    pix = jnp.moveaxis(pix, 1, -1)                                  # (B, H, W, 2)
    scale = jnp.array([width - 1, height - 1], pix.dtype)
    return (pix / scale - 0.5) * 2.0
