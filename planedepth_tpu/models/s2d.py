"""Space-to-depth decoder tail: TPU layout surgery for small-C conv stages.

Problem (PERF_NOTES.md r3): XLA stores the decoder's full-resolution
C=16 NHWC tensors with layout {3,0,2,1} — C on the 128-wide lane
dimension — an **8x physical padding**.  Every conv, ELU, reflection pad
and their adjoints in the finest two scales then move 8x their useful
bytes; the r3 trace attributes ~100 ms/step of the 335 ms HR step to
these stages.

Fix: never materialize the fine scales in (H, W, smallC) form.  Express
the exact same convolutions on phase-packed space-to-depth tensors whose
channel counts are lane-sized:

    x1   (B, H/2, W/2,  32)  -> s2d ->  (B, H/4, W/4, 128)
    upconv_0_0 (3x3, 32->16, reflect) == quarter-res conv (3,3,128,64)
    upsample2x + upconv_0_1 (3x3, 16->16, reflect)
                             == quarter-res conv (3,3,64,256)
    d2s one level ->  z4 (B, H/2, W/2, 64)   [= s2d of the full-res z]
    dispconv / sigmaconv (3x3, 16->N, reflect)
                             == half-res conv (3,3,64,4N) -> d2s -> (B,H,W,N)
    residualconv: global mean commutes with the 1x1 convs (exact).

The transformed kernels are *derived from the canonical parameters* with
pure jnp scatter/adds, so the parameter tree (and checkpoints / torch
weight conversion) is unchanged and gradients flow back to the canonical
kernels through the transforms.  Equivalence is exact up to fp
reassociation (tap sums for the upsample collapse); the boundary
behavior of each level's reflect/edge padding is reproduced by
phase-aware pads (see :func:`phase_pad`).

Reference hot path being optimized: networks/depth_decoder.py:120-147.
"""
from __future__ import annotations

from typing import Tuple

import functools

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


@functools.lru_cache(maxsize=32)
def _s2d_identity(C: int, dtype_name: str) -> jnp.ndarray:
    """2x2-stride identity kernel mapping phase (py, px) x channel c to
    output channel (2 py + px) C + c."""
    import numpy as np

    k = np.zeros((2, 2, C, 4 * C), np.float32)
    for py in range(2):
        for px in range(2):
            for c in range(C):
                k[py, px, c, (2 * py + px) * C + c] = 1.0
    return jnp.asarray(k, dtype=jnp.dtype(dtype_name))


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channels phase-major (py, px, c).

    Implemented as a stride-2 IDENTITY conv: XLA's conv path runs ~2x
    faster than the reshape+transpose lowering on TPU (r4 probe:
    0.76 vs 1.55 ms at (8,192,640,64) bf16) and its adjoint is the
    (equally fast) transposed conv instead of the 6-D reshape chain.
    Exact: the weights are 0/1, so no rounding in any dtype."""
    B, H, W, C = x.shape
    return lax.conv_general_dilated(
        x, _s2d_identity(C, x.dtype.name), window_strides=(2, 2),
        padding="VALID", dimension_numbers=DN,
    )


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (same identity-conv rationale:
    expressed as the TRANSPOSE of the stride-2 identity conv)."""
    B, Hh, Wh, C4 = x.shape
    C = C4 // 4
    return lax.conv_transpose(
        x, _s2d_identity(C, x.dtype.name), strides=(2, 2),
        padding="VALID", dimension_numbers=DN, transpose_kernel=True,
    )


def upsample_fuse_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """Fuse nearest-x2 upsample into a 3x3 conv.

    A stride-1 3x3 conv applied AFTER ``upsample2x_nearest`` reads each
    low-res pixel through repeated taps; collapsing them yields an
    equivalent conv on the LOW-res tensor emitting the 4 output phases:
    (3, 3, Cin, Cout) -> (3, 3, Cin, 4*Cout), phase-major outputs.
    """
    Cin, Cout = K.shape[2], K.shape[3]
    out = jnp.zeros((3, 3, Cin, 4, Cout), K.dtype)
    for py in range(2):
        for px in range(2):
            p = py * 2 + px
            for dy in range(-1, 2):
                ay = (py + dy) // 2          # floor division
                for dx in range(-1, 2):
                    ax = (px + dx) // 2
                    out = out.at[ay + 1, ax + 1, :, p, :].add(
                        K[dy + 1, dx + 1]
                    )
    return out.reshape(3, 3, Cin, 4 * Cout)


def s2d_conv_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """Express a stride-1 3x3 conv one s2d level down.

    (3, 3, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout): output phase q reads
    input phase (q+d) mod 2 at packed offset floor((q+d)/2).  75%
    structural zeros (each (q, d) pair maps to exactly one (a, p_in)).
    """
    Cin, Cout = K.shape[2], K.shape[3]
    out = jnp.zeros((3, 3, 2, 2, Cin, 4, Cout), K.dtype)
    for qy in range(2):
        for qx in range(2):
            q = qy * 2 + qx
            for dy in range(-1, 2):
                ay, piny = (qy + dy) // 2, (qy + dy) % 2
                for dx in range(-1, 2):
                    ax, pinx = (qx + dx) // 2, (qx + dx) % 2
                    out = out.at[ay + 1, ax + 1, piny, pinx, :, q, :].add(
                        K[dy + 1, dx + 1]
                    )
    return out.reshape(3, 3, 4 * Cin, 4 * Cout)


def tile_bias(b: jnp.ndarray) -> jnp.ndarray:
    """Bias for phase-major packed outputs: every phase uses the same b."""
    return jnp.tile(b, 4)


def phase_pad(x4: jnp.ndarray, mode: str) -> jnp.ndarray:
    """1-pixel spatial pad of a phase-packed (B, Hq, Wq, 4C) tensor that
    reproduces ``reflect``/``edge`` 1-pixel padding of the UPPER level.

    The pad rows/columns must carry the right PHASE of the right border
    pixel: level-up row -1 is phase 1 of packed row -1, and maps to
    phase 1 of packed row 0 under reflect (level-up +1) or phase 0 of
    packed row 0 under edge (level-up 0); symmetrically at the bottom.
    Only that phase slot is ever read by the conv — the other slot is
    filled with the same source (don't-care).

    Built as border STRIPS (channel-block slices of the edge rows/cols)
    concatenated around the body: the strips are ~1/Hq of the tensor,
    the adjoint of concat is a slice, and no 6-D phase view is ever
    materialized (the previous reshape/stack form paid two full-tensor
    relayout copies per call — "reshape" + "copy" lines of the r4 trace).
    Parity vs the reshape form: tests/test_s2d.py.
    """
    B, Hq, Wq, C4 = x4.shape
    C = C4 // 4
    if mode == "zero":
        # full-res zero SAME padding: full-res row -1 is phase 1 of packed
        # row -1, so one packed pixel of zeros covers it exactly (read
        # slots and don't-care slots are all genuinely zero)
        return jnp.pad(x4, [(0, 0), (1, 1), (1, 1), (0, 0)])
    r = int(mode == "reflect")

    def blk(t, i):
        return t[..., i * C:(i + 1) * C]

    def row_border(row, rr):
        """Top/bottom strip from an edge row: out phase (py, px) reads
        source phase (rr, px) — both py slots carry the same half."""
        half = jnp.concatenate([blk(row, 2 * rr), blk(row, 2 * rr + 1)], -1)
        return jnp.concatenate([half, half], -1)

    def col_border(col, rr):
        """Left/right strip from an edge column: out phase (py, px) reads
        source phase (py, rr) — both px slots per py."""
        return jnp.concatenate(
            [blk(col, rr), blk(col, rr), blk(col, 2 + rr), blk(col, 2 + rr)],
            -1,
        )

    top = row_border(x4[:, :1], r)                    # (B, 1, Wq, C4)
    bot = row_border(x4[:, -1:], 1 - r)
    left_mid = col_border(x4[:, :, :1], r)            # (B, Hq, 1, C4)
    right_mid = col_border(x4[:, :, -1:], 1 - r)
    # corners = column transform of the row strips' edge pixels (the
    # reshape form applied the column pad AFTER the row pad)
    tl, tr = col_border(top[:, :, :1], r), col_border(top[:, :, -1:], 1 - r)
    bl, br = col_border(bot[:, :, :1], r), col_border(bot[:, :, -1:], 1 - r)
    top_full = jnp.concatenate([tl, top, tr], axis=2)
    bot_full = jnp.concatenate([bl, bot, br], axis=2)
    mid = jnp.concatenate([left_mid, x4, right_mid], axis=2)
    return jnp.concatenate([top_full, mid, bot_full], axis=1)


def conv_valid(x: jnp.ndarray, kernel: jnp.ndarray, bias,
               dtype) -> jnp.ndarray:
    """VALID-padding NHWC conv in the compute dtype.  ``bias=None`` skips
    the add (the merged-head path moves it into the relayout kernel)."""
    y = lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), "VALID",
        dimension_numbers=DN,
    )
    if bias is None:
        return y
    return y + bias.astype(dtype)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """Two s2d levels: (B, H, W, C) -> (B, H/4, W/4, 16C).

    Channel nesting (py2, px2, py1, px1, c): full-res row = 4i + 2*py2 +
    py1 (level-2 phases major)."""
    return space_to_depth(space_to_depth(x))


def stem_s2d_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """Express the ResNet stem — 7x7 stride-2 pad-3 conv — on the 2-level
    space-to-depth input.

    (7, 7, Cin, Cout) -> (3, 3, 16*Cin, 4*Cout): a stride-1 conv over the
    quarter-res packed grid emitting the 2x2 phases of the half-res
    output (one depth_to_space recovers it).  Output row m, phase pm
    reads full-res rows u = 4q + (2*pm + dy) for q = m//2 — i.e. packed
    row q + (2*pm+dy)//4, phase (2*pm+dy) % 4.  Full-res zero padding 3
    maps to a plain 1-pixel zero pad of the packed grid (all four phases
    of the pad rows are genuinely zero).  The classic MLPerf-era TPU
    space-to-depth stem trick, derived exactly from the canonical 7x7
    kernel so pretrained/converted weights keep working.
    """
    Cin, Cout = K.shape[2], K.shape[3]
    out = jnp.zeros((3, 3, 2, 2, 2, 2, Cin, 4, Cout), K.dtype)
    for pm in range(2):
        for pn in range(2):
            p = pm * 2 + pn
            for dy in range(-3, 4):
                ay, oy = (2 * pm + dy) // 4, (2 * pm + dy) % 4
                for dx in range(-3, 4):
                    ax, ox = (2 * pn + dx) // 4, (2 * pn + dx) % 4
                    out = out.at[
                        ay + 1, ax + 1, oy // 2, ox // 2, oy % 2, ox % 2,
                        :, p, :,
                    ].set(K[dy + 3, dx + 3])
    return out.reshape(3, 3, 16 * Cin, 4 * Cout)


def block_diag_1x1_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """Per-phase (block-diagonal) 1x1 conv on phase-packed channels:
    (1, 1, Cin, Cout) -> (1, 1, 4*Cin, 4*Cout)."""
    Cin, Cout = K.shape[2], K.shape[3]
    out = jnp.zeros((1, 1, 4, Cin, 4, Cout), K.dtype)
    for p in range(4):
        out = out.at[0, 0, p, :, p, :].set(K[0, 0])
    return out.reshape(1, 1, 4 * Cin, 4 * Cout)


def epconv_s2d(grid4, k0, b0, k1, b1, dtype) -> jnp.ndarray:
    """The neural positional-encoding stack (1x1 conv - ELU - 1x1 conv -
    ELU, models/layers.py:EpConv) on the SPACE-TO-DEPTH grid.

    1x1 convs are per-pixel, so phases are independent — block-diagonal
    kernels give exact equivalence while the full-resolution C=8/16
    tensors (stored 16x lane-padded by XLA) never materialize.
    """
    h = jax.nn.elu(conv_valid(grid4, block_diag_1x1_kernel(k0),
                              tile_bias(b0), dtype))
    return jax.nn.elu(conv_valid(h, block_diag_1x1_kernel(k1),
                                 tile_bias(b1), dtype))


def resize_from_s2d(x4: jnp.ndarray, size) -> jnp.ndarray:
    """align_corners bilinear resize of the FULL-res signal directly from
    its s2d form: (B, H/2, W/2, 4C) -> (B, Ho, Wo, C).

    The resize is linear, so the (Ho, H) interpolation matrix is simply
    reshaped to address (packed row, phase) — exact equivalence with
    ``resize_bilinear_align_corners(depth_to_space(x4), size)``.
    """
    from planedepth_tpu.ops.resize import interp_matrix

    B, Hh, Wh, C4 = x4.shape
    C = C4 // 4
    Ho, Wo = size
    dtype = jnp.promote_types(x4.dtype, jnp.float32)
    my = interp_matrix(2 * Hh, Ho, dtype).reshape(Ho, Hh, 2)
    mx = interp_matrix(2 * Wh, Wo, dtype).reshape(Wo, Wh, 2)
    xf = x4.reshape(B, Hh, Wh, 2, 2, C).astype(dtype)
    out = jnp.einsum("oip,bijpqc->bojqc", my, xf, precision="highest")
    out = jnp.einsum("sjq,bojqc->bosc", mx, out, precision="highest")
    return out.astype(x4.dtype)


# ---------------------------------------------------------------------------
# Canonical-parameter mirrors.  The s2d tail needs the RAW 3x3 kernels of
# upconv_0_0 / upconv_0_1 / dispconv / sigmaconv to derive the packed
# kernels; these modules create parameters with EXACTLY the same paths,
# shapes and initializers as the standard ConvBlock/Conv3x3 stacks
# (models/layers.py) so checkpoints and init values are identical whether
# the s2d tail is active or not (flax param rngs are path-derived).
# ---------------------------------------------------------------------------
import flax.linen as nn                                    # noqa: E402


class ConvParams(nn.Module):
    """Param twin of ``nn.Conv(features, (3, 3))``."""

    features: int
    cin: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class Conv3x3Params(nn.Module):
    """Param twin of ``layers.Conv3x3`` (child conv named 'conv')."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        return ConvParams(self.features, self.cin, name="conv")()


class ConvBlockParams(nn.Module):
    """Param twin of ``layers.ConvBlock`` (Conv3x3 named 'conv')."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        return Conv3x3Params(self.features, self.cin, name="conv")()


class ConvKernelParams(nn.Module):
    """Param twin of ``nn.Conv(features, (k, k), use_bias=False)``."""

    features: int
    cin: int
    ksize: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.cin, self.features),
        )


class Conv1x1Params(nn.Module):
    """Param twin of ``nn.Conv(features, (1, 1))``."""

    features: int
    cin: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class EpConvParams(nn.Module):
    """Param twin of ``layers.EpConv`` (children conv0/conv1)."""

    num_ep: int

    @nn.compact
    def __call__(self):
        k0, b0 = Conv1x1Params(16, 2, name="conv0")()
        k1, b1 = Conv1x1Params(self.num_ep, 16, name="conv1")()
        return k0, b0, k1, b1
