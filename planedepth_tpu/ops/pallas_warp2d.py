"""Fused 2-D plane-warp sampler: the TPU path for homography/depth warps.

The monocular training modes (``homography_warp``, ``depth_warp`` —
reference trainer.py:533-538,556-560, layers.py:184-234 HomographyWarp)
need a full 2-D ``grid_sample`` per plane.  XLA lowers lane-dimension
gathers to near-scalar TPU code (~170x slower than the fused stereo path,
PERF_NOTES.md), which made mono training effectively unusable on TPU.

This kernel replaces the gather with the static-taps machinery of the
stereo sweep kernels (ops/pallas_sweep.py), extended to two axes:

  * displacements are smooth per plane, so within one (R-row, 128-lane)
    tile the INTEGER parts of (dx, dy) span bounded windows.  One aligned
    dynamic window per tile (lane roll + sublane roll) followed by a
    ``(sy + 2) x (sx + 2)`` grid of STATIC-offset taps — combined with
    per-pixel one-hot weights — reproduces every pixel's exact 2-D
    bilinear interpolation with full-width VPU ops.  (The two axes do
    NOT factor: both tap weights are indexed by the OUTPUT pixel, so a
    separable vertical-then-horizontal pass would blend columns sampled
    at different vertical positions — a different filter than
    grid_sample's.  The product form is exact and, at the production
    bounds, ~(sy+2)(sx+2) ~ 60-180 VPU MACs per pixel per channel —
    bandwidth-class cost, nothing like a gather.)
  * tile anchors (per-tile minima of floor(dx)/floor(dy)) are precomputed
    OUTSIDE the kernel into a tiny int32 SMEM tensor — one cheap XLA
    reduce (:func:`tile_anchors`);
  * fully-out-of-range samples are folded into the mask OUTSIDE the
    kernel (:func:`prepare_coords` — bilinear-zeros gives exactly 0
    there) with their displacement reset, so degenerate coordinates
    (homography z -> 1e-7 blowups) can never drag a tile's anchor;
    boundary-partial samples keep their true coordinates and their
    outside taps read the operands' zero margins — grid_sample's zeros
    padding bit-exactly;
  * the spread clamp (``min(delta, sx)``) is a static backstop exactly
    like the stereo ``gp_taps`` bound: exact whenever the per-tile
    integer spread fits.  Strongly-zooming near planes (|t_z|/Z_plane >
    ~sx/128) exceed it and mis-sample within the clamp; the bound is a
    config knob (cost is linear in it) and
    tests/test_pallas_warp2d.py pins the spread statistics of realistic
    KITTI mono poses.

The kernel samples one plane per grid step and writes the warped
[rgb | logit (| sigma)] stack in plane-first layout (W on lanes — no
C=5-minor layout anywhere).  Composite / softmax / mixture NLL stay in
XLA (train/step.py:fused_mono_losses does them plane-first): at mono
resolutions the warped stack is HBM-friendly and XLA fuses the rest.
The custom VJP keeps the backward scatter-free: d_ls by reverse taps
into the RESIDENT per-plane block (the grid iterates row-blocks
innermost, so the (b, n) output block accumulates in VMEM), and
d_dx/d_dy from live tap differences — the pose-network gradients flow
through them into the homography algebra in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# margins sized so the window anchor can never underflow: a valid
# boundary-partial pixel at lane l of a tile can have ix as low as
# -2 - l, so the per-tile anchor reaches tile_start + axi >= -129
LPAD = 256        # left zeros margin (lane-aligned)
VPAD = 16         # top zeros margin (sublane-aligned; >= rows + 2)


def _geom(W, H, sx, sy, rows):
    """(Wp, Hp, wq, rwina): padded operand + window geometry."""
    # lane window: 128 output lanes + sx + 1 tap reach, rounded up for
    # the aligned fetch, + 128 roll residual
    wq = ((128 + sx + 1 + 127) // 128) * 128 + 128
    Wp = LPAD + W + 8 + wq
    rwin = rows + sy + 1
    rwina = ((rwin + 7) // 8) * 8 + 8  # + 8 sublane roll residual
    Hp = VPAD + H + 8 + rwina
    return Wp, Hp, wq, rwina


def _tile_fill(d, valid, rows, tile=128):
    """Replace invalid pixels' displacement with their tile's VALID
    minimum (0 for all-invalid tiles): keeps the per-tile anchor and
    spread governed by the valid samples only, and bounds the magnitude
    (no int32 overflow from 1e38-degenerate coordinates)."""
    B, N, H, W = d.shape
    dv = jnp.where(valid, d, jnp.inf)
    t = dv.reshape(B, N, H // rows, rows, W // tile, tile).min((3, 5))
    t = jnp.where(jnp.isfinite(t), t, 0.0)
    fill = jnp.broadcast_to(
        t[:, :, :, None, :, None],
        (B, N, H // rows, rows, W // tile, tile),
    ).reshape(B, N, H, W)
    return jnp.where(valid, d, fill)


def prepare_coords(dx, dy, mask, height, width, rows=8):
    """Fold fully-out-of-range samples into the mask; bound the rest.

    grid_sample(zeros) returns 0 whenever ALL FOUR bilinear corners fall
    outside the image — which happens iff the sample is fully outside
    along x OR along y.  Those pixels are folded into the mask (their
    sampled value is exactly 0 either way) and their displacement is
    replaced by their tile's valid minimum, so a degenerate pixel
    (homography z -> 1e-7 blowups) can never drag a tile's window anchor
    or spread away from its in-range neighbours.  Boundary-partial
    samples keep their true coordinates — their outside taps read the
    operands' zero margins, reproducing the zeros padding bit-exactly."""
    x = jnp.arange(dx.shape[-1], dtype=F32)
    y = jnp.arange(dy.shape[-2], dtype=F32)[:, None]
    xs = dx + x
    ys = dy + y
    # positive comparisons so NaN coordinates land in the FOLD (a NaN
    # fails every >, so ~valid catches it; the oob form would let it
    # through as "valid" and poison the int32 anchor cast)
    valid = (xs > -1.0) & (xs < width) & (ys > -1.0) & (ys < height)
    dx = _tile_fill(dx, valid, rows)
    dy = _tile_fill(dy, valid, rows)
    mask = mask * valid.astype(mask.dtype)
    return dx, dy, mask


def tile_anchors(d, rows, tile=128):
    """Per-(row-block, lane-tile) minima of floor(d):
    ``(B, N, H//rows, W//tile)`` int32 — the kernel's window anchors."""
    B, N, H, W = d.shape
    k = jnp.floor(d).astype(jnp.int32)
    k = k.reshape(B, N, H // rows, rows, W // tile, tile)
    return k.min(axis=(3, 5))


def _onehots(u, taps):
    """eq[j] = 1[u == j] as f32, j in 0..taps."""
    return [(u == j).astype(F32) for j in range(taps + 1)]


def _wpair(eq, f, j, taps):
    """Interp weight of static offset j: eq[j](1-f) + eq[j-1] f."""
    w = 0.0
    if j <= taps:
        w = eq[j] * (1.0 - f)
    if j >= 1:
        w = w + eq[j - 1] * f
    return w


def _dpair(eq, j, taps):
    """Difference weight of static offset j: picks tap(u+1) - tap(u)."""
    d = 0.0
    if j >= 1:
        d = eq[j - 1] * 1.0
    if j <= taps:
        d = d - eq[j]
    return d


def _tile_setup(ax_ref, ay_ref, dx_ref, dy_ref, mask_ref, t, sx, sy,
                rows, rwina, wq, h):
    """Shared per-(plane, tile) quantities for both kernels.

    ``dx_ref``/``dy_ref``/``mask_ref`` are (rows, 128) lane-tile blocks —
    the tile index ``t`` is a GRID dimension, not an in-kernel loop:
    unrolling the W//128 tiles in the kernel body multiplied the emitted
    Mosaic program by T (the 640-wide mono graph reached 11 MB of MLIR
    and the remote compile helper was OOM-killed)."""
    dx = dx_ref[...]
    dy = dy_ref[...]
    m = mask_ref[...].astype(F32)
    ix = jnp.floor(dx)
    iy = jnp.floor(dy)
    fx = (dx - ix).astype(F32)
    fy = (dy - iy).astype(F32)
    # anchors ship as the FULL (H//rows, T) int32 plane per (b, n):
    # Mosaic's real-TPU lowering rejects SMEM blocks whose trailing dims
    # are neither (8, 128)-aligned nor the whole array
    axi = ax_ref[h, t]
    ayi = ay_ref[h, t]
    ux = jnp.clip(ix.astype(jnp.int32) - axi, 0, sx)
    uy = jnp.clip(iy.astype(jnp.int32) - ayi, 0, sy)
    eqx = _onehots(ux, sx)
    eqy = _onehots(uy, sy)

    rbase = VPAD + h * rows + ayi
    cbase = LPAD + t * 128 + axi
    q8 = pl.multiple_of((rbase // 8) * 8, 8)
    qc = pl.multiple_of((cbase // 128) * 128, 128)
    ramt = (rwina - (rbase - q8)) % rwina
    camt = (wq - (cbase - qc)) % wq

    def fetch(ref, nch):
        win = ref[pl.ds(0, nch), pl.ds(q8, rwina), pl.ds(qc, wq)].astype(F32)
        win = pltpu.roll(win, camt, axis=2)
        return pltpu.roll(win, ramt, axis=1)

    return m, fx, fy, eqx, eqy, fetch, (q8, qc, ramt, camt)


def _fwd_kernel(
    ax_ref,      # (H//rows, T) SMEM int32 per-tile x anchors
    ay_ref,      # (H//rows, T) SMEM int32
    dx_ref,      # (R, 128) VMEM f32 lane-tile block
    dy_ref,      # (R, 128) VMEM f32
    mask_ref,    # (R, 128) VMEM   per-pixel validity
    src_ref,     # (3, Hp, Wp) VMEM padded source image (full height)
    ls_ref,      # (CS, Hp, Wp) VMEM padded plane head(s) (full height)
    out_c_ref,   # (3, R, 128) warped rgb
    out_l_ref,   # (1, R, 128) warped logit
    *refs,       # [out_s (1, R, 128) when with_sigma]
    rows: int,
    sx: int,
    sy: int,
    with_sigma: bool,
    rwina: int,
    wq: int,
):
    R = rows
    CS = 2 if with_sigma else 1
    out_s_ref = refs[0] if with_sigma else None
    h = pl.program_id(2)
    t = pl.program_id(3)

    m, fx, fy, eqx, eqy, fetch, _ = _tile_setup(
        ax_ref, ay_ref, dx_ref, dy_ref, mask_ref, t, sx, sy,
        R, rwina, wq, h)
    cwin = fetch(src_ref, 3)
    lswin = fetch(ls_ref, CS)

    acc_c = jnp.zeros((3, R, 128), F32)
    acc_ls = jnp.zeros((CS, R, 128), F32)
    for j in range(sy + 2):
        wyj = _wpair(eqy, fy, j, sy)
        for u in range(sx + 2):
            w2 = (wyj * _wpair(eqx, fx, u, sx))[None]
            acc_c = acc_c + w2 * cwin[:, j : j + R, u : u + 128]
            acc_ls = acc_ls + w2 * lswin[:, j : j + R, u : u + 128]
    out_c_ref[...] = (acc_c * m[None]).astype(out_c_ref.dtype)
    out_l_ref[...] = (acc_ls[0] * m).astype(out_l_ref.dtype)
    if with_sigma:
        out_s_ref[...] = (acc_ls[1] * m).astype(out_s_ref.dtype)


def _bwd_kernel(
    ax_ref, ay_ref,
    dx_ref, dy_ref, mask_ref,
    src_ref,     # (3, Hp, Wp)
    ls_ref,      # (CS, Hp, Wp)
    gc_ref,      # (3, R, 128) rgb cotangent (lane-tile block)
    gl_ref,      # (1, R, 128) logit cotangent
    *refs,       # [gs (1, R, 128) when with_sigma], outs: d_ls
                 # (CS, Hp, Wp), d_dx (R, 128), d_dy (R, 128);
                 # scratch: stage (CS, rwina, wq)
    rows: int,
    sx: int,
    sy: int,
    with_sigma: bool,
    rwina: int,
    wq: int,
):
    """Adjoint.  d_ls accumulates by reverse taps into the RESIDENT
    per-plane output block (zeroed at the first (row-block, tile) step;
    the grid iterates (h, t) innermost, so the (b, n) block stays in
    VMEM until the plane advances).  d_dx/d_dy come from the live tap
    differences.  Image gradients are not emitted — the train step never
    differentiates the batch images."""
    refs = list(refs)
    gs_ref = refs.pop(0) if with_sigma else None
    dls_ref, ddx_ref, ddy_ref, stage = refs
    R = rows
    CS = 2 if with_sigma else 1
    h = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when((h == 0) & (t == 0))
    def _zero():
        dls_ref[...] = jnp.zeros(dls_ref.shape, dls_ref.dtype)

    m, fx, fy, eqx, eqy, fetch, geom = _tile_setup(
        ax_ref, ay_ref, dx_ref, dy_ref, mask_ref, t, sx, sy,
        R, rwina, wq, h)
    q8, qc, ramt, camt = geom
    cwin = fetch(src_ref, 3)
    lswin = fetch(ls_ref, CS)

    gc = gc_ref[...].astype(F32) * m[None]
    gls = gl_ref[...].astype(F32)
    if with_sigma:
        gls = jnp.concatenate([gls, gs_ref[...].astype(F32)], 0)
    gls = gls * m[None]

    # one (j, u) tap sweep serves everything: d_dx/d_dy from the
    # difference weights against the live windows, d_ls by scattering
    # the cotangent through the same weights into the staging block
    stage[...] = jnp.zeros(stage.shape, stage.dtype)
    ddx = jnp.zeros((R, 128), F32)
    ddy = jnp.zeros((R, 128), F32)
    gdotc = gc                                        # (3, R, 128)
    for j in range(sy + 2):
        wyj = _wpair(eqy, fy, j, sy)
        dyj = _dpair(eqy, j, sy)
        for u in range(sx + 2):
            wxu = _wpair(eqx, fx, u, sx)
            dxu = _dpair(eqx, u, sx)
            w2 = wyj * wxu
            wc = cwin[:, j : j + R, u : u + 128]
            wls = lswin[:, j : j + R, u : u + 128]
            sampled_dot_g = (gdotc * wc).sum(0) + (gls * wls).sum(0)
            ddx = ddx + (wyj * dxu) * sampled_dot_g
            ddy = ddy + (dyj * wxu) * sampled_dot_g
            stage[pl.ds(0, CS), pl.ds(j, R), pl.ds(u, 128)] = (
                stage[pl.ds(0, CS), pl.ds(j, R), pl.ds(u, 128)]
                + w2[None] * gls
            )
    ddx_ref[...] = ddx
    ddy_ref[...] = ddy

    # un-roll the staging block back to the aligned window position
    # and accumulate into the resident d_ls block
    back = pltpu.roll(stage[...], (rwina - ramt) % rwina, axis=1)
    back = pltpu.roll(back, (wq - camt) % wq, axis=2)
    dls_ref[pl.ds(0, CS), pl.ds(q8, rwina), pl.ds(qc, wq)] = (
        dls_ref[pl.ds(0, CS), pl.ds(q8, rwina), pl.ds(qc, wq)] + back
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pad_ops(src_t, ls, H, W, Wp, Hp):
    """Zero-pad image-shaped operands to the kernel geometry."""
    def padhw(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2)
                       + [(VPAD, Hp - VPAD - H), (LPAD, Wp - LPAD - W)])
    return padhw(src_t), padhw(ls)


def _fwd_call(src_p, ls_p, dx, dy, mask, ax, ay, *, rows, sx, sy,
              with_sigma, interpret, out_dtype):
    B, N, H, W = dx.shape
    R = rows
    assert H % R == 0 and W % 128 == 0, (H, W)
    Wp, Hp, wq, rwina = _geom(W, H, sx, sy, R)
    assert src_p.shape[-1] == Wp and src_p.shape[-2] == Hp, (
        src_p.shape, Wp, Hp)
    CS = 2 if with_sigma else 1
    T = W // 128

    kernel = functools.partial(
        _fwd_kernel, rows=R, sx=sx, sy=sy, with_sigma=with_sigma,
        rwina=rwina, wq=wq,
    )
    smem = pl.BlockSpec((None, None, H // R, T),
                        lambda b, n, h, t: (b, n, 0, 0),
                        memory_space=pltpu.SMEM)
    row = pl.BlockSpec((None, None, R, 128),
                       lambda b, n, h, t: (b, n, h, t),
                       memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((None, None, 3, R, 128),
                     lambda b, n, h, t: (b, n, 0, h, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, R, 128),
                     lambda b, n, h, t: (b, n, h, t),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, 3, H, W), out_dtype),
        jax.ShapeDtypeStruct((B, N, H, W), out_dtype),
    ]
    if with_sigma:
        out_specs.append(out_specs[1])
        out_shape.append(out_shape[1])
    outs = pl.pallas_call(
        kernel,
        grid=(B, N, H // R, T),
        in_specs=[
            smem, smem,
            row, row, row,
            pl.BlockSpec((None, 3, Hp, Wp), lambda b, n, h, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # src: resident
            pl.BlockSpec((None, CS, Hp, Wp), lambda b, n, h, t: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),        # ls: per plane
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ax, ay, dx, dy, mask, src_p, ls_p)
    return tuple(outs)


def _bwd_call(src_p, ls_p, dx, dy, mask, ax, ay, g_c, g_l, g_s, *, rows,
              sx, sy, with_sigma, interpret):
    B, N, H, W = dx.shape
    R = rows
    Wp, Hp, wq, rwina = _geom(W, H, sx, sy, R)
    CS = 2 if with_sigma else 1
    T = W // 128

    kernel = functools.partial(
        _bwd_kernel, rows=R, sx=sx, sy=sy, with_sigma=with_sigma,
        rwina=rwina, wq=wq,
    )
    smem = pl.BlockSpec((None, None, H // R, T),
                        lambda b, n, h, t: (b, n, 0, 0),
                        memory_space=pltpu.SMEM)
    row = pl.BlockSpec((None, None, R, 128),
                       lambda b, n, h, t: (b, n, h, t),
                       memory_space=pltpu.VMEM)
    g_args = [g_c, g_l] + ([g_s] if with_sigma else [])
    g_specs = [
        pl.BlockSpec((None, None, 3, R, 128),
                     lambda b, n, h, t: (b, n, 0, h, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, 1, R, 128),
                     lambda b, n, h, t: (b, n, 0, h, t),
                     memory_space=pltpu.VMEM),
    ]
    if with_sigma:
        g_specs.append(g_specs[1])
    outs = pl.pallas_call(
        kernel,
        grid=(B, N, H // R, T),
        in_specs=[
            smem, smem,
            row, row, row,
            pl.BlockSpec((None, 3, Hp, Wp), lambda b, n, h, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, CS, Hp, Wp), lambda b, n, h, t: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + g_specs,
        out_specs=[
            # d_ls: revisited across the (h, t) grid steps (accumulates
            # in VMEM)
            pl.BlockSpec((None, CS, Hp, Wp), lambda b, n, h, t: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            row, row,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, CS * N, Hp, Wp), F32),
            jax.ShapeDtypeStruct((B, N, H, W), F32),
            jax.ShapeDtypeStruct((B, N, H, W), F32),
        ],
        scratch_shapes=[pltpu.VMEM((CS, rwina, wq), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ax, ay, dx, dy, mask, src_p, ls_p, *g_args)
    d_ls_p, d_dx, d_dy = outs
    return d_ls_p, d_dx, d_dy


# ---------------------------------------------------------------------------
# public API: custom-VJP warp
# ---------------------------------------------------------------------------

def warp2d_sample(src_t, ls, dx, dy, mask,
                  rows: int = 8, sx: int = 16, sy: int = 8,
                  with_sigma: bool = True, interpret: bool = False):
    """Per-plane 2-D bilinear warp of [rgb | logit (| sigma)].

    Args:
      src_t: ``(B, 3, H, W)`` source image (channel-first).
      ls: ``(B, CS*N, H, W)`` interleaved plane heads (logits at CS*n,
        sigma at CS*n+1 when ``with_sigma``).
      dx, dy: ``(B, N, H, W)`` f32 source displacements in pixels (raw —
        :func:`prepare_coords` is applied here, so arbitrarily
        degenerate homography coordinates are safe).
      mask: ``(B, N, H, W)`` per-pixel validity (multiplied into every
        sampled channel, like the oracle's ``sampled * pmask``).

    Returns:
      (rgb ``(B, N, 3, H, W)`` in src dtype, logit ``(B, N, H, W)``
       [, sigma ``(B, N, H, W)``]) — plane-first, W on lanes.

    Differentiable w.r.t. ``ls``, ``dx``, ``dy`` (the pose gradients flow
    through dx/dy into the homography algebra in XLA).  ``src_t`` and
    ``mask`` receive zero cotangents — the train step never
    differentiates the batch images, and the visibility mask is a
    comparison output (zero gradient almost everywhere).
    """
    B, _, H, W = src_t.shape
    dx, dy, mask = prepare_coords(dx, dy, mask, H, W, rows=rows)
    return _warp2d_core(src_t, ls, dx, dy, mask, rows, sx, sy, with_sigma,
                        interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _warp2d_core(src_t, ls, dx, dy, mask,
                 rows: int = 8, sx: int = 16, sy: int = 8,
                 with_sigma: bool = True, interpret: bool = False):
    """Kernel invocation on PREPARED coords (see :func:`warp2d_sample`)."""
    B, _, H, W = src_t.shape
    Wp, Hp, wq, rwina = _geom(W, H, sx, sy, rows)
    src_p, ls_p = _pad_ops(src_t, ls, H, W, Wp, Hp)
    ax = tile_anchors(dx, rows)
    ay = tile_anchors(dy, rows)
    return _fwd_call(src_p, ls_p, dx, dy, mask, ax, ay, rows=rows,
                     sx=sx, sy=sy, with_sigma=with_sigma,
                     interpret=interpret, out_dtype=src_t.dtype)


def _w2d_fwd(src_t, ls, dx, dy, mask, rows, sx, sy, with_sigma, interpret):
    B, _, H, W = src_t.shape
    Wp, Hp, wq, rwina = _geom(W, H, sx, sy, rows)
    src_p, ls_p = _pad_ops(src_t, ls, H, W, Wp, Hp)
    ax = tile_anchors(dx, rows)
    ay = tile_anchors(dy, rows)
    out = _fwd_call(src_p, ls_p, dx, dy, mask, ax, ay, rows=rows,
                    sx=sx, sy=sy, with_sigma=with_sigma,
                    interpret=interpret, out_dtype=src_t.dtype)
    return out, (src_p, ls_p, dx, dy, mask, ax, ay,
                 jnp.zeros((), src_t.dtype), jnp.zeros((), ls.dtype))


def _w2d_bwd(rows, sx, sy, with_sigma, interpret, res, cts):
    src_p, ls_p, dx, dy, mask, ax, ay, s0, l0 = res
    B, N, H, W = dx.shape
    g_c = cts[0].astype(F32)
    g_l = cts[1].astype(F32)[:, :, None]
    g_s = cts[2].astype(F32)[:, :, None] if with_sigma else None
    d_ls_p, d_dx, d_dy = _bwd_call(
        src_p, ls_p, dx, dy, mask, ax, ay, g_c, g_l, g_s,
        rows=rows, sx=sx, sy=sy, with_sigma=with_sigma, interpret=interpret)
    # crop the d_ls padding back off
    d_ls = d_ls_p[:, :, VPAD : VPAD + H, LPAD : LPAD + W]
    return (jnp.zeros(src_p.shape[:2] + (H, W), s0.dtype),
            d_ls.astype(l0.dtype), d_dx, d_dy, jnp.zeros_like(mask))


_warp2d_core.defvjp(_w2d_fwd, _w2d_bwd)


# ---------------------------------------------------------------------------
# Differentiable XLA oracle (tests): grid_sample per plane
# ---------------------------------------------------------------------------

def oracle_warp2d(src_t, ls, dx, dy, mask, with_sigma=True):
    """Dense reference: per-plane 2-D grid_sample (zeros padding) of
    [rgb | logit (| sigma)], masked — the exact semantics the reference's
    ``F.grid_sample`` + pmask multiplication produces
    (trainer.py:573-589)."""
    from planedepth_tpu.ops.sampling import grid_sample

    B, _, H, W = src_t.shape
    N = dx.shape[1]
    CS = 2 if with_sigma else 1
    x = jnp.arange(W, dtype=F32)
    y = jnp.arange(H, dtype=F32)[:, None]
    xs = dx + x
    ys = dy + y
    cx = (xs / (W - 1) - 0.5) * 2.0
    cy = (ys / (H - 1) - 0.5) * 2.0
    coords = jnp.stack([cx, cy], axis=-1)                 # (B,N,H,W,2)

    img = jnp.moveaxis(src_t, 1, -1)                      # (B,H,W,3)
    rgb_l, l_l, s_l = [], [], []
    for n in range(N):
        feats = [img]
        feats.append(jnp.moveaxis(ls[:, CS * n : CS * n + 1], 1, -1))
        if with_sigma:
            feats.append(
                jnp.moveaxis(ls[:, CS * n + 1 : CS * n + 2], 1, -1))
        feats = jnp.concatenate(feats, axis=-1)
        s = grid_sample(feats, coords[:, n]) * mask[:, n][..., None]
        rgb_l.append(jnp.moveaxis(s[..., :3], -1, 1))
        l_l.append(s[..., 3])
        if with_sigma:
            s_l.append(s[..., 4])
    out = (jnp.stack(rgb_l, 1), jnp.stack(l_l, 1))
    if with_sigma:
        out = out + (jnp.stack(s_l, 1),)
    return out
