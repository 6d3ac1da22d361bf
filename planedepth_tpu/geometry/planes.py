"""Orthogonal plane-volume construction (the heart of PlaneDepth).

Rebuilds the plane parameterization of the reference decoder
(networks/depth_decoder.py:148-252) as a pure function of the augmentation
grid and the optional per-image plane residuals, in channels-last layout:
the plane axis is LAST ``(B, H, W, N)`` so softmax/compositing over planes
ride the TPU vector lanes.

Plane families (N = disp_levels + xz_levels + yz_levels):
  * vertical (fronto-parallel) planes: geometric disparity spacing
    ``disp_max * (disp_min/disp_max)^(k/(K-1))`` — constant over the image,
  * xz "ground" planes: heights linear in [xz_min, xz_max]; their disparity
    varies with the image row (y) only,
  * yz "side" planes: two half-sets (right/left), varying with column (x).

All the magic constants (0.1*0.58*W disparity law, 1.92 fy, 1e-7 clamps) are
bit-identical to the reference (SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from planedepth_tpu.config import PlaneConfig


class PlaneVolume(NamedTuple):
    """Everything the warp / loss stages need about the plane family."""

    disp_layered: jnp.ndarray   # (B, H, W, N) per-plane disparity (pixels)
    padding_mask: jnp.ndarray   # (B, H, W, N) float 0/1 validity
    distance: jnp.ndarray       # (B, N) plane distance d (model units)
    normal: jnp.ndarray         # (B, N, 3) plane normal n


def build_plane_volume(
    grid: jnp.ndarray,
    cfg: PlaneConfig,
    width: int,
    residual_levels: Optional[jnp.ndarray] = None,
) -> PlaneVolume:
    """Construct the orthogonal plane volume.

    Args:
      grid: ``(B, H, W, 2)`` normalized virtual-camera grid from the data
        augmentation (x, y in the last axis).
      cfg: plane layout config.
      width: image width W in pixels (enters the disparity law 0.1*0.58*W).
      residual_levels: optional ``(B, N)`` per-image plane offsets in
        (-0.5, 0.5) from the residual head (depth_decoder.py:150-152).

    Returns:
      A :class:`PlaneVolume`.
    """
    B, H, W_g, _ = grid.shape
    dtype = grid.dtype
    no, xz, yz = cfg.disp_levels, cfg.xz_levels, cfg.yz_levels
    dw = 0.1 * 0.58 * width

    # Without yz side planes every per-plane quantity is ROW-CONSTANT
    # (vertical: constant; xz ground: a function of y only — the aug grid
    # is rectilinear, so y is constant along W).  Build with a 1-wide W
    # axis and broadcast lazily at the end: XLA then fuses the broadcast
    # into the consumers instead of materializing two ~1 GB f32
    # (B, H, W, N) tensors per HR step (r3 trace finding).
    W_b = 1 if yz == 0 else W_g

    def resid(lo, hi):
        if residual_levels is None:
            return 0.0
        return residual_levels[:, lo:hi]

    # --- vertical planes (depth_decoder.py:148-157) -------------------------
    lvl = jnp.broadcast_to(
        jnp.arange(no, dtype=dtype)[None, :], (B, no)
    ) + resid(0, no)                                                  # (B, no)
    disp_v = cfg.disp_max * (cfg.disp_min / cfg.disp_max) ** (
        lvl / (no - 1)
    )                                                                 # (B, no)
    distance = dw / disp_v                                            # (B, no)
    normal = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype)[None, None, :], (B, no, 3)
    )
    disp_layered = jnp.broadcast_to(disp_v[:, None, None, :], (B, H, W_b, no))
    padding = jnp.ones((B, H, W_b, no), dtype)

    parts_d = [disp_layered]
    parts_m = [padding]
    parts_dist = [distance]
    parts_n = [normal]

    gx = grid[..., 0]                                                 # (B, H, W)
    gy = grid[..., 1] if yz > 0 else grid[:, :, :1, 1]
    # per-row half-extent of the virtual-camera x range (B, H, 1)
    fs_row = (gx[:, :, -1:] - gx[:, :, :1]) / 2.0

    # --- xz ground planes (depth_decoder.py:158-207) ------------------------
    if xz > 0:
        glvl = jnp.broadcast_to(
            jnp.arange(xz, dtype=dtype)[None, :], (B, xz)
        ) + resid(no, no + xz)
        h = cfg.xz_min + (cfg.xz_max - cfg.xz_min) * glvl / (xz - 1)  # (B, xz)
        y_mask = (gy >= 1e-7).astype(dtype)                           # (B, H, W)
        y = jnp.maximum(gy, 1e-7)
        # ground_layered = h * 1.92 / (y/2) * fs_row; disp = dw / ground_layered
        ground = h[:, None, None, :] * (1.92 / (y / 2.0))[..., None]
        ground = ground * fs_row[..., None]
        disp_g = dw / ground                                          # (B,H,W,xz)
        parts_d.append(disp_g)
        parts_m.append(jnp.broadcast_to(y_mask[..., None], disp_g.shape))

        # plane (normal, distance) — "paper" branch (depth_decoder.py:197-207)
        gyc = (gy[:, -1, 0] + gy[:, 0, 0]) / 2.0                      # (B,)
        py = (gyc + 1.0) * H / 2.0
        fs = (gx[:, 0, -1] - gx[:, 0, 0]) / 2.0
        py_cy_fys = (py - H / 2.0) / (H * 1.92 * fs)                  # (B,)
        n_unnorm = jnp.stack(
            [jnp.zeros_like(py_cy_fys), jnp.ones_like(py_cy_fys), py_cy_fys],
            axis=1,
        )                                                             # (B, 3)
        n_scale = 1.0 / jnp.sqrt(1.0 + py_cy_fys**2)                  # (B,)
        xz_norm = n_unnorm * n_scale[:, None]
        parts_n.append(jnp.broadcast_to(xz_norm[:, None, :], (B, xz, 3)))
        parts_dist.append(h * n_scale[:, None])

    # --- yz side planes (depth_decoder.py:209-252) --------------------------
    if yz > 0:
        half = yz // 2
        ylvl = jnp.arange(half, dtype=dtype)[None, :]
        ylvl = jnp.concatenate([ylvl, ylvl], axis=1)                  # (1, yz)
        ylvl = jnp.broadcast_to(ylvl, (B, yz)) + resid(no + xz, no + xz + yz)
        yz_disp_max = 1.0 / cfg.yz_min
        yz_disp_min = 1.0 / cfg.yz_max
        yz_disp = yz_disp_max * (yz_disp_min / yz_disp_max) ** (
            ylvl / (0.5 * yz - 1)
        )
        h_yz = 1.0 / yz_disp                                          # (B, yz)

        # right half-set: valid where x >= 1e-7
        xr_mask = (gx >= 1e-7).astype(dtype)
        xr = jnp.maximum(gx, 1e-7)
        g_r = h_yz[:, None, None, :half] * (0.58 / (xr / 2.0))[..., None]
        g_r = g_r * fs_row[..., None]
        # left half-set: valid where x <= -1e-7
        xl_mask = (gx <= -1e-7).astype(dtype)
        xl = jnp.minimum(gx, -1e-7)
        g_l = -h_yz[:, None, None, half:] * (0.58 / (xl / 2.0))[..., None]
        g_l = g_l * fs_row[..., None]

        disp_yz = dw / jnp.concatenate([g_r, g_l], axis=-1)
        parts_d.append(disp_yz)
        parts_m.append(
            jnp.concatenate(
                [
                    jnp.broadcast_to(xr_mask[..., None], g_r.shape),
                    jnp.broadcast_to(xl_mask[..., None], g_l.shape),
                ],
                axis=-1,
            )
        )

        gxc = (gx[:, 0, -1] + gx[:, 0, 0]) / 2.0
        px = (gxc + 1.0) * width / 2.0
        fs = (gx[:, 0, -1] - gx[:, 0, 0]) / 2.0
        px_cx_fxs = (px - width / 2.0) / (width * 0.58 * fs)
        n_unnorm = jnp.stack(
            [jnp.ones_like(px_cx_fxs), jnp.zeros_like(px_cx_fxs), px_cx_fxs],
            axis=1,
        )
        n_scale = 1.0 / jnp.sqrt(1.0 + px_cx_fxs**2)
        yz_norm = n_unnorm * n_scale[:, None]                         # (B, 3)
        n_r = jnp.broadcast_to(yz_norm[:, None, :], (B, half, 3))
        n_l = -n_r
        parts_n.append(jnp.concatenate([n_r, n_l], axis=1))
        parts_dist.append(h_yz * n_scale[:, None])

    disp_layered = jnp.concatenate(parts_d, axis=-1)
    padding_mask = jnp.concatenate(parts_m, axis=-1)
    if W_b != W_g:
        N = disp_layered.shape[-1]
        disp_layered = jnp.broadcast_to(disp_layered, (B, H, W_g, N))
        padding_mask = jnp.broadcast_to(padding_mask, (B, H, W_g, N))
    return PlaneVolume(
        disp_layered=disp_layered,
        padding_mask=padding_mask,
        distance=jnp.concatenate(parts_dist, axis=-1),
        normal=jnp.concatenate(parts_n, axis=1),
    )
