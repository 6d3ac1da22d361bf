"""Forward-only fused Pallas row-shift sampler for per-plane maps.

Replaces the XLA-gather path of ``ops.rowshift.rowshift_sample`` /
``ops.sampling.shift_sample_x`` for the STOP-GRADIENT consumers — the
self-distillation teacher's cross-view warps and the mirror occlusion masks
(reference trainer.py:404-466, 636-669).  XLA lowers lane-dimension gathers
on TPU to near-scalar code (measured seconds per step at HR); this kernel
streams each plane through VMEM with one aligned dynamic slice + one
dynamic lane roll per (row, plane), the same machinery as
``ops.pallas_sweep``.

Semantics: ``out[b, h, x, n] = (1-f) * maps[b, h, x+k, n] +
f * maps[b, h, x+k+1, n]`` with ``k = floor(shift[b, h, n])``, zeros
padding outside ``[0, W)`` — identical to
``rowshift_sample(maps, shift_rows)``.

Not differentiable: callers wrap results in ``stop_gradient`` anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _shift_kernel(
    shift_ref,   # (R, N) SMEM
    maps_ref,    # (N, R, Wp) VMEM padded plane maps
    out_ref,     # (N, R, W) out
    *,
    n_planes: int,
    n_vertical: int,
    rows: int,
    width: int,
    pad: int,
):
    N, R, W = n_planes, rows, width
    NV = n_vertical
    WQ = W + 128

    def taps(r, n):
        s = shift_ref[r, n]
        k = jnp.floor(s)
        return pad + k.astype(jnp.int32), (s - k).astype(F32)

    def roll_amt(start):
        q = pl.multiple_of((start // 128) * 128, 128)
        return q, (WQ - (start - q)) % WQ

    def window2_row(n, r, start):
        q, amt = roll_amt(start)
        win = maps_ref[n, pl.ds(r, 1), pl.ds(q, WQ)].astype(F32)
        rolled = pltpu.roll(win, amt, axis=1)
        return rolled[:, :W], rolled[:, 1 : W + 1]

    def window2_vec(n, start):
        q, amt = roll_amt(start)
        win = maps_ref[n, :, pl.ds(q, WQ)].astype(F32)
        rolled = pltpu.roll(win, amt, axis=1)
        return rolled[:, :W], rolled[:, 1 : W + 1]

    def body_vec(n, _):
        p, f = taps(0, n)
        t0, t1 = window2_vec(n, p)
        out_ref[n] = ((1.0 - f) * t0 + f * t1).astype(out_ref.dtype)
        return 0

    def body_rows(n, _):
        for r in range(R):
            p, f = taps(r, n)
            t0, t1 = window2_row(n, r, p)
            out_ref[n, pl.ds(r, 1)] = (
                (1.0 - f) * t0 + f * t1
            ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, NV, body_vec, 0)
    jax.lax.fori_loop(NV, N, body_rows, 0)


@functools.partial(
    jax.jit, static_argnames=("pad", "rows", "interpret", "n_vertical")
)
def rowshift_planes_fwd(
    maps: jnp.ndarray,
    shift_rows: jnp.ndarray,
    pad: int,
    rows: int = 8,
    interpret: bool = False,
    n_vertical: int = 0,
) -> jnp.ndarray:
    """Per-plane maps ``(B, H, W, N)`` sampled at ``x + shift_rows[b,h,n]``
    (zeros padding), forward only.

    ``n_vertical``: leading planes whose shift is ROW-CONSTANT within each
    ``rows``-block (vertical planes) — sampled with one block-wide window.
    """
    B, H, W, N = maps.shape
    R = rows
    assert H % R == 0, (H, R)
    pad = ((pad + 127) // 128) * 128
    Wp = W + 2 * pad + 128
    shift_rows = jnp.clip(shift_rows, -(pad - 2.0), pad - 2.0)

    maps_t = jnp.moveaxis(maps, -1, 1)                     # (B, N, H, W)
    maps_p = jnp.pad(maps_t, [(0, 0), (0, 0), (0, 0), (pad, pad + 128)])

    kernel = functools.partial(
        _shift_kernel, n_planes=N, n_vertical=n_vertical, rows=R, width=W,
        pad=pad,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((None, R, N), lambda b, h: (b, h, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, N, R, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, N, R, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H, W), maps.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shift_rows, maps_p)
    return jnp.moveaxis(out, 1, -1)                        # (B, H, W, N)
