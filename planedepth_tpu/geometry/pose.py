"""Pose algebra: axis-angle -> SE(3) matrices (pure-jax, batched).

Reference semantics: layers.py:17-92 (``transformation_from_parameters``,
``get_translation_matrix``, ``rot_from_axisangle``).  Here everything is a
function of arrays — no modules, no buffers — so the whole pose path inlines
into the jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle ``(B, 3)`` (or ``(B, 1, 3)``) -> rotation as ``(B, 4, 4)``.

    Rodrigues formula, numerically identical to reference layers.py:53-92
    (note the +1e-7 in the axis normalization).
    """
    vec = vec.reshape(vec.shape[0], 3)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)        # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    B = vec.shape[0]
    rot = jnp.zeros((B, 4, 4), vec.dtype)
    rot = rot.at[:, 0, 0].set(x * xC + ca)
    rot = rot.at[:, 0, 1].set(xyC - zs)
    rot = rot.at[:, 0, 2].set(zxC + ys)
    rot = rot.at[:, 1, 0].set(xyC + zs)
    rot = rot.at[:, 1, 1].set(y * yC + ca)
    rot = rot.at[:, 1, 2].set(yzC - xs)
    rot = rot.at[:, 2, 0].set(zxC - ys)
    rot = rot.at[:, 2, 1].set(yzC + xs)
    rot = rot.at[:, 2, 2].set(z * zC + ca)
    rot = rot.at[:, 3, 3].set(1.0)
    return rot


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Translation ``(B, 3)`` -> ``(B, 4, 4)`` (reference layers.py:37-50)."""
    t = t.reshape(t.shape[0], 3)
    B = t.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (B, 4, 4))
    return T.at[:, :3, 3].set(t)


def transformation_from_parameters(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """(axisangle, translation) -> 4x4 SE(3) (reference layers.py:17-34).

    ``invert=True`` composes the inverse transform (used for negative frame
    offsets, reference trainer.py:381-382).
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    return jnp.matmul(R, T, precision='highest') if invert else jnp.matmul(T, R, precision='highest')


def rc_correction(grid: jnp.ndarray) -> jnp.ndarray:
    """Crop-dependent virtual-camera rotation ``Rc`` from the aug grid.

    The RandomResizeCrop emits a normalized grid over the virtual camera
    (pair_transforms.py:35-37); the pose net predicts motion in the *cropped*
    camera, which must be conjugated into the canonical camera via
    ``Rc @ R @ Rc^-1`` (reference trainer.py:386-400).

    Args:
      grid: ``(B, H, W, 2)`` normalized coordinate grid (x, y channels last).

    Returns:
      ``(B, 3, 3)`` Rc matrices.
    """
    gx = grid[..., 0]
    gy = grid[..., 1]
    gx0 = (gx[:, 0, -1] + gx[:, 0, 0]) / 2.0
    gy0 = (gy[:, -1, 0] + gy[:, 0, 0]) / 2.0
    f = (gx[:, 0, -1] - gx[:, 0, 0]) / 2.0
    rc_v = jnp.stack([-gx0 / (2 * 0.58), -gy0 / (2 * 1.92), f], axis=1)
    B = grid.shape[0]
    rc = jnp.broadcast_to(jnp.eye(3, dtype=grid.dtype), (B, 3, 3))
    return rc.at[:, :, 2].set(rc_v)


def apply_rc(Rt: jnp.ndarray, Rc: jnp.ndarray, rotate_translation: bool = False
             ) -> jnp.ndarray:
    """Conjugate a pose by the crop rotation (reference trainer.py:396-400).

    Returns a 4x4 with ``R' = Rc R Rc^-1`` and, when ``rotate_translation``
    (the colmap path), ``t' = Rc t``; otherwise t' = 0 as in the reference
    (Rt_Rc is initialized to zeros and only [:3,:3] assigned for the pose-net
    path — the translation column stays zero there, trainer.py:386-398).
    """
    from planedepth_tpu.geometry.warp import inv3x3

    B = Rt.shape[0]
    out = jnp.zeros((B, 4, 4), Rt.dtype)
    R = jnp.matmul(Rc, jnp.matmul(Rt[:, :3, :3], inv3x3(Rc),
                                  precision='highest'), precision='highest')
    out = out.at[:, :3, :3].set(R)
    if rotate_translation:
        t = jnp.matmul(Rc, Rt[:, :3, 3:4], precision='highest')
        out = out.at[:, :3, 3:4].set(t)
    return out
