"""Fused relayout + halo-pad kernels for the quad sweep's ls operand.

The s2d decoder head emits ``ls_s2d (B, H/2, W/2, 4*2N)`` (channels
minor — the natural conv output layout); the quad sweep kernel consumes
``(B, 4*2N, H/2, W/2 + halo)`` (W on lanes).  As two XLA ops that is a
layout-change copy (~2x the HBM floor) plus a pad copy — the r4 trace
measured the transpose pair at 9.3 ms and the pad at 4.2 ms per step,
and the intermediate channels-first tensor (~0.5 GB at b4 flagship)
stays live into the kernel.  These kernels do each direction in ONE
HBM-speed pass:

  * :func:`relayout_pad_nchw` — NHWC -> padded NCHW (the forward side).
  * :func:`relayout_nhwc` — NCHW -> NHWC (the cotangent side; the sweep
    backward already emits the unpadded width).

The in-kernel transpose is a single 2-D ``(R*128, C) -> (C, R*128)``
matrix transpose per (batch, row-block, lane-tile) grid cell — the
(R, 128, C) input block flattens contiguously because C is minor, and
the (C, R, 128) output block splits contiguously because 128 is minor.

No reference counterpart: the reference's torch NCHW tensors never need
this (its grid_sample consumes any stride, /root/reference/trainer.py:565).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _fwd_kernel(*refs, R: int, C: int, wtiles: int,
                sigma_epilogue: bool, with_bias: bool):
    """(R, 128, C) NHWC block -> (C, R, 128) NCHW block (or zeros in the
    halo region, where the index map pins the input to the last data
    tile).

    ``with_bias`` adds a per-channel bias (the head conv's, kept OUT of
    the conv) and ``sigma_epilogue`` applies the mixture head's
    ``clip(sigmoid(x), 0.01, 1)`` to the ODD (sigma) channels of the raw
    interleaved head — free here, vs the conv-epilogue placement where
    XLA schedules ANY elementwise between the head conv and this kernel
    as a standalone full-res pass between two layout copies (r5 traces:
    ~11 ms/step at the flagship shape, first as clamp_select, then —
    with the epilogue moved here but the bias still on the conv — as
    broadcast_add)."""
    refs = list(refs)
    x_ref = refs.pop(0)
    b_ref = refs.pop(0) if with_bias else None
    o_ref = refs.pop(0)
    t = pl.program_id(2)

    @pl.when(t < wtiles)
    def _data():
        x = x_ref[...].reshape(R * 128, C)
        if with_bias or sigma_epilogue:
            # compute in f32 with one store-rounding (Mosaic rejects the
            # weak-typed f32 clip constants against a bf16 vector; the
            # XLA helper ls_epilogue mirrors this exactly)
            xf = x.astype(F32)
            if with_bias:
                xf = xf + b_ref[...].astype(F32)
            if sigma_epilogue:
                is_sigma = (jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
                            % 2) == 1
                xf = jnp.where(is_sigma,
                               jnp.clip(jax.nn.sigmoid(xf), 0.01, 1.0), xf)
            x = xf
        o_ref[...] = x.T.reshape(C, R, 128).astype(o_ref.dtype)

    @pl.when(t >= wtiles)
    def _halo():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)


def relayout_pad_nchw(x, lpad: int, rpad: int, rows: int = 8,
                      interpret: bool = False, out_dtype=None,
                      sigma_epilogue: bool = False, bias=None):
    """``(B, H, W, C)`` -> ``(B, C, H, W + lpad + rpad)`` zero-padded on W.

    ``lpad``/``rpad`` must be multiples of 128 (the production quad halo
    is 128-aligned by construction, ops/pallas_sweep_quad.py:_quad_pad).
    ``sigma_epilogue`` / ``bias`` (a ``(C,)`` per-channel add applied
    before the epilogue): see :func:`_fwd_kernel`.
    """
    B, H, W, C = x.shape
    R = rows
    assert H % R == 0, (H, R)
    assert W % 128 == 0 and lpad % 128 == 0 and rpad % 128 == 0, (
        W, lpad, rpad)
    wtiles = W // 128
    ltiles = lpad // 128
    ttiles = wtiles + ltiles + rpad // 128

    kernel = functools.partial(_fwd_kernel, R=R, C=C, wtiles=wtiles,
                               sigma_epilogue=sigma_epilogue,
                               with_bias=bias is not None)
    in_specs = [
        # halo tiles (t >= wtiles) pin the input block to the LAST
        # data tile: the pipeline skips the DMA when the block index
        # repeats between consecutive grid steps, so the halo steps
        # (which immediately follow data tile wtiles-1 and write
        # zeros) cost no input bandwidth at all.  The left halo
        # (signed mode only; production nonneg lpad = 0) is rotated
        # to the right of the grid and the output index map unrotates
        # it so tiles [0, ltiles) of the OUTPUT are the zero halo.
        pl.BlockSpec(
            (None, R, 128, C),
            lambda b, h, t: (b, h, jnp.minimum(t, wtiles - 1), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [x]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, C), lambda b, h, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, C))
    out = pl.pallas_call(
        kernel,
        grid=(B, H // R, ttiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, C, R, 128),
            # data tiles shift right by the left halo; halo grid steps
            # [wtiles, wtiles+ltiles) write the left halo [0, ltiles) and
            # the remaining steps write the right halo AT their own index
            # (t >= wtiles + ltiles there, exactly the right-halo tiles)
            lambda b, h, t: (b, 0, h, jnp.where(
                t < wtiles, t + ltiles,
                jnp.where(t - wtiles < ltiles, t - wtiles, t))),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, C, H, W + lpad + rpad), out_dtype or x.dtype),
        interpret=interpret,
    )(*args)
    return out


def _bwd_kernel(g_ref, o_ref, *, R: int, C: int):
    g = g_ref[...].reshape(C, R * 128)
    o_ref[...] = g.T.reshape(R, 128, C)


def relayout_nhwc(g, rows: int = 8, interpret: bool = False):
    """``(B, C, H, W)`` -> ``(B, H, W, C)`` (the cotangent relayout)."""
    B, C, H, W = g.shape
    R = rows
    assert H % R == 0 and W % 128 == 0, (H, W, R)
    kernel = functools.partial(_bwd_kernel, R=R, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, H // R, W // 128),
        in_specs=[
            pl.BlockSpec((None, C, R, 128), lambda b, h, t: (b, 0, h, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, R, 128, C), lambda b, h, t: (b, h, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), g.dtype),
        interpret=interpret,
    )(g)
