"""Row-constant horizontal shift sampling with scatter-free custom VJP.

The stereo plane-sweep warp (trainer.py:540-554) shifts each plane's source
row by a disparity that is CONSTANT ALONG THE ROW for vertical and ground
planes (disp depends on (b, y, n) only — depth_decoder.py:148-183).  XLA's
autodiff of a gather emits a scatter-add for the image gradient, which
serializes on TPU; for row-constant shifts the adjoint of a shift IS another
shift, so the backward here is expressed with the same 2-tap gathers as the
forward:

    fwd:  out[x]  = (1-f)·I[x+k] + f·I[x+k+1],     k = floor(s), f = s-k
    bwd:  dI[u]   = (1-f)·G[u-k] + f·G[u-k-1]      (zeros outside the row)
          ds      = Σ_x G[x]·(I[x+k+1] - I[x+k])

Both ops carry zeros-padding semantics identical to
``ops.sampling.shift_sample_x`` (torch grid_sample padding_mode='zeros').
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _gather_w(maps: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the W axis (axis -2) of ``(..., W, N)`` with clamped
    integer indices ``idx (..., W, N)``; caller applies validity."""
    W = maps.shape[-2]
    return jnp.take_along_axis(maps, jnp.clip(idx, 0, W - 1), axis=-2)


def _fwd_sample(maps: jnp.ndarray, shift_rows: jnp.ndarray):
    """Core 2-tap sample of per-plane maps at their own row shift.

    maps: (B, H, W, N); shift_rows: (B, H, N) source offset in pixels.
    Returns (out, k, f) with out (B, H, W, N).
    """
    B, H, W, N = maps.shape
    dtype = jnp.promote_types(maps.dtype, jnp.float32)
    x = jnp.arange(W, dtype=dtype)[None, None, :, None]
    s = shift_rows.astype(dtype)[:, :, None, :]
    xs = x + s
    x0 = jnp.floor(xs)
    f = xs - x0
    k0 = x0.astype(jnp.int32)
    v0 = (x0 >= 0) & (x0 <= W - 1)
    v1 = (x0 + 1 >= 0) & (x0 + 1 <= W - 1)
    m = maps.astype(dtype)
    out = jnp.where(v0, (1.0 - f) * _gather_w(m, k0), 0.0) + jnp.where(
        v1, f * _gather_w(m, k0 + 1), 0.0
    )
    return out.astype(maps.dtype), k0, f


@jax.custom_vjp
def rowshift_sample(maps: jnp.ndarray, shift_rows: jnp.ndarray) -> jnp.ndarray:
    """Per-plane maps ``(B, H, W, N)`` sampled at ``x + shift_rows[b, h, n]``."""
    out, _, _ = _fwd_sample(maps, shift_rows)
    return out


def _rs_fwd(maps, shift_rows):
    out, _, _ = _fwd_sample(maps, shift_rows)
    return out, (maps, shift_rows)


def _rs_bwd(res, g):
    maps, shift_rows = res
    B, H, W, N = maps.shape
    dtype = jnp.promote_types(maps.dtype, jnp.float32)
    x = jnp.arange(W, dtype=dtype)[None, None, :, None]
    s = shift_rows.astype(dtype)[:, :, None, :]
    xs = x + s
    x0 = jnp.floor(xs)
    f = xs - x0
    k0 = x0.astype(jnp.int32)
    gf = g.astype(dtype)

    # d maps: adjoint shifts of the gradient.  For source index u the valid
    # originating target is x = u - k (resp. u - k - 1), which must lie in
    # [0, W-1]; since k, f are constant per (b, h, n) the masks reduce to
    # bounds checks on the back-shifted index.
    u = x                                               # (1,1,W,1) as u grid
    xb0 = u - k0[:, :, :1, :]                           # u - k  (k row-const)
    f_row = f[:, :, :1, :]
    vb0 = (xb0 >= 0) & (xb0 <= W - 1)
    vb1 = (xb0 - 1 >= 0) & (xb0 - 1 <= W - 1)
    d_maps = jnp.where(
        vb0, (1.0 - f_row) * _gather_w(gf, xb0.astype(jnp.int32)), 0.0
    ) + jnp.where(
        vb1, f_row * _gather_w(gf, xb0.astype(jnp.int32) - 1), 0.0
    )

    # d shift: g · (I[x0+1] - I[x0]) summed over the row
    m = maps.astype(dtype)
    v0 = (x0 >= 0) & (x0 <= W - 1)
    v1 = (x0 + 1 >= 0) & (x0 + 1 <= W - 1)
    i0 = jnp.where(v0, _gather_w(m, k0), 0.0)
    i1 = jnp.where(v1, _gather_w(m, k0 + 1), 0.0)
    d_shift = jnp.sum(gf * (i1 - i0), axis=2)           # (B, H, N)

    return d_maps.astype(maps.dtype), d_shift.astype(shift_rows.dtype)


rowshift_sample.defvjp(_rs_fwd, _rs_bwd)


def _fwd_sample_shared(image: jnp.ndarray, shift_rows: jnp.ndarray):
    """Shared image ``(B, H, W, C)`` sampled per plane -> (B, N, H, W, C)."""
    B, H, W, C = image.shape
    N = shift_rows.shape[-1]
    dtype = jnp.promote_types(image.dtype, jnp.float32)
    x = jnp.arange(W, dtype=dtype)[None, None, None, :]
    s = jnp.moveaxis(shift_rows, -1, 1).astype(dtype)[:, :, :, None]
    xs = x + s                                           # (B, N, H, W)
    x0 = jnp.floor(xs)
    f = xs - x0
    k0 = x0.astype(jnp.int32)
    v0 = (x0 >= 0) & (x0 <= W - 1)
    v1 = (x0 + 1 >= 0) & (x0 + 1 <= W - 1)
    img = image.astype(dtype)[:, None]                   # (B, 1, H, W, C)

    def take(idx):
        return jnp.take_along_axis(
            img, jnp.clip(idx, 0, W - 1)[..., None], axis=3
        )

    out = jnp.where(v0[..., None], (1.0 - f)[..., None] * take(k0), 0.0)
    out = out + jnp.where(v1[..., None], f[..., None] * take(k0 + 1), 0.0)
    return out.astype(image.dtype), k0, f


@jax.custom_vjp
def rowshift_sample_shared(
    image: jnp.ndarray, shift_rows: jnp.ndarray
) -> jnp.ndarray:
    """Shared source ``(B, H, W, C)`` warped by every plane's row shift
    ``(B, H, N)`` -> ``(B, N, H, W, C)``."""
    out, _, _ = _fwd_sample_shared(image, shift_rows)
    return out


def _rss_fwd(image, shift_rows):
    out, _, _ = _fwd_sample_shared(image, shift_rows)
    return out, (image, shift_rows)


def _rss_bwd(res, g):
    image, shift_rows = res
    B, H, W, C = image.shape
    N = shift_rows.shape[-1]
    dtype = jnp.promote_types(image.dtype, jnp.float32)
    x = jnp.arange(W, dtype=dtype)[None, None, None, :]
    s = jnp.moveaxis(shift_rows, -1, 1).astype(dtype)[:, :, :, None]
    xs = x + s
    x0 = jnp.floor(xs)
    f = xs - x0                                          # (B, N, H, W)
    k0 = x0.astype(jnp.int32)
    gf = g.astype(dtype)                                 # (B, N, H, W, C)

    # adjoint: back-shift each plane's gradient, then reduce over planes
    f_row = f[:, :, :, :1]                               # row-constant
    k_row = k0[:, :, :, :1]
    u = x
    xb0 = u - k_row
    vb0 = (xb0 >= 0) & (xb0 <= W - 1)
    vb1 = (xb0 - 1 >= 0) & (xb0 - 1 <= W - 1)

    def take_g(idx):
        return jnp.take_along_axis(
            gf, jnp.clip(idx, 0, W - 1)[..., None], axis=3
        )

    contrib = jnp.where(
        vb0[..., None], (1.0 - f_row)[..., None] * take_g(xb0.astype(jnp.int32)),
        0.0,
    ) + jnp.where(
        vb1[..., None], f_row[..., None] * take_g(xb0.astype(jnp.int32) - 1),
        0.0,
    )
    d_image = jnp.sum(contrib, axis=1).astype(image.dtype)  # (B, H, W, C)

    # d shift: sum over channels of g·(I[x0+1]-I[x0]) per plane, then rows
    img = image.astype(dtype)[:, None]
    v0 = (x0 >= 0) & (x0 <= W - 1)
    v1 = (x0 + 1 >= 0) & (x0 + 1 <= W - 1)

    def take_i(idx):
        return jnp.take_along_axis(
            img, jnp.clip(idx, 0, W - 1)[..., None], axis=3
        )

    i0 = jnp.where(v0[..., None], take_i(k0), 0.0)
    i1 = jnp.where(v1[..., None], take_i(k0 + 1), 0.0)
    d_s = jnp.sum(gf * (i1 - i0), axis=(3, 4))            # (B, N, H)
    d_shift = jnp.moveaxis(d_s, 1, -1).astype(shift_rows.dtype)
    return d_image, d_shift


rowshift_sample_shared.defvjp(_rss_fwd, _rss_bwd)
