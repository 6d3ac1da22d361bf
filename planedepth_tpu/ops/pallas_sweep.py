"""Fused Pallas plane-sweep kernel: warp + composite + mixture NLL.

Replaces the XLA oracle's materialization chain for the stereo ``disp_warp``
training hot path (trainer.py:540-603 + the mixture loss trainer.py:728-736):
the oracle stores a ``f32[N, B, H, W, 5]`` warped stack (~7.4 GB padded at
HR batch 8) plus ~1 GB int32 gather-index arrays; this kernel streams the
plane axis through VMEM and writes only the three small results

    rgb_rec   (B, 3, H, W)   composited reconstruction
    nll       (B, H, W)      mixture-Laplacian NLL per pixel
    nll_auto  (B, H, W)      automask NLL of the identity reprojection
                             (pi/sigma treated as constants, trainer.py:733)

Key design points (see pallas_guide.md):
  * inputs come channel/plane-FIRST and zero-padded by ``pad`` along W —
    a dynamic slice at ``pad + k`` then realizes grid_sample's
    zeros-padding semantics with plain reads;
  * one program per (batch, row-block); the plane loop is a fori_loop with
    per-row 2-tap dynamic slices — no gather indices ever materialize;
  * ONE plane pass, flash-attention style: an online softmax (running max
    + accumulator rescale, :func:`_online_e`) folds sampling, compositing
    and both mixture sums into a single loop with no VMEM scratch.

The gradient is provided by :func:`fused_plane_sweep`'s custom VJP, whose
backward is a second Pallas kernel (:func:`_bwd_kernel`) with the same
slicing structure — also a SINGLE pass: the forward saves its softmax
statistics (``with_stats``) and the one cotangent-dependent coupling is
recovered from the forward outputs (A = U * (G . rgb)), so each plane's
samples are consumed live (the tap differences make d/dshift free) and
all five gradients are emitted scatter-free via reverse windows — the
adjoint never materializes the plane stack either.  ``_sweep_bwd`` below
is the kernel-free XLA twin of that adjoint, kept as the correctness
oracle for tests.
"""
from __future__ import annotations

import functools
import types
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planedepth_tpu.ops.pallas_disp import _row_col

F32 = jnp.float32


def _make_samplers(shift_ref, mask_ref, src_ref, ls_ref, R, W, pad,
                   gp_taps=0, ls_stride=2):
    """Shared in-kernel sampling helpers.

    Three variants per quantity: ``*_vec`` exploits row-constant shifts
    (vertical planes — one (R, W)-wide window per tap), ``*_rows``
    handles per-row shifts (ground planes) with one single-sublane window
    per row, and ``*_taps`` handles the same per-row shifts FULLY
    ROW-VECTORIZED: ground-plane disparity is linear in the image row
    (geometry/planes.py disp_g = dw*y/(3.84*h*fs)), so within one R-row
    block the integer shifts span at most ~6 px at production configs —
    one window anchored at ``min_r floor(shift_r)``, one roll, then
    ``gp_taps + 2`` static lane-offset taps combined with per-row one-hot
    weights reproduce every row's 2-tap interpolation with full-height
    (8-sublane) VPU ops instead of 8 single-sublane windows+rolls.
    All gathers are lane-aligned dynamic slices + dynamic lane rolls
    (Mosaic requires slice starts that are multiples of 128).

    ``gp_taps`` is the static per-block spread bound S: row deltas
    ``floor(shift_r) - min_r floor(shift_r)`` are clamped into [0, S]
    (same backstop philosophy as the wrapper's |shift| <= pad clip; the
    production bound is ~6, see tests/test_pallas_sweep.py::test_gp_spread).
    ``gp_taps=0`` selects the legacy per-row path.

    ``ls_ref`` is the INTERLEAVED plane-head buffer ``(2N, R, Wp)`` with
    logits at ``2n`` and sigma at ``2n+1`` — one dynamic window + one roll
    fetches both heads (halves the slicing work vs separate buffers).
    ``ls_stride=1`` (the ``with_mixture=False`` mode) selects a
    LOGITS-ONLY ``(N, R, Wp)`` buffer: sigma is the literal constant 1.0
    (returned as a python float so the kernel math constant-folds) and
    the sigma tap difference is 0.0 — this is what makes the no-mixture
    softmax composite exact at image borders, where a warped all-ones
    sigma tensor would shrink under the zeros padding.
    """
    WQ = W + 128
    WT = W + 256            # taps window: residual <128 + S+1 tap slack
    CS = ls_stride

    def taps(r, n):
        s = shift_ref[r, n]
        k = jnp.floor(s)
        return pad + k.astype(jnp.int32), (s - k).astype(F32)

    def roll_amt(start):
        q = pl.multiple_of((start // 128) * 128, 128)
        return q, (WQ - (start - q)) % WQ

    # both interpolation taps come from ONE dynamic roll: after rolling the
    # aligned window so column 0 = ref[start], tap0 = [:W] and
    # tap1 = [1:W+1] (start - q <= 127, so start - q + W + 1 <= WQ)
    def window2_ls_row(n, r, start):
        q, amt = roll_amt(start)
        win = ls_ref[pl.ds(CS * n, CS), pl.ds(r, 1), pl.ds(q, WQ)].astype(F32)
        rolled = pltpu.roll(win, amt, axis=2)              # (CS, 1, WQ)
        return rolled[:, :, :W], rolled[:, :, 1 : W + 1]

    def window2_ls_vec(n, start):
        q, amt = roll_amt(start)
        win = ls_ref[pl.ds(CS * n, CS), :, pl.ds(q, WQ)].astype(F32)
        rolled = pltpu.roll(win, amt, axis=2)              # (CS, R, WQ)
        return rolled[:, :, :W], rolled[:, :, 1 : W + 1]

    def window2_c_row(r, start):
        q, amt = roll_amt(start)
        win = src_ref[:, pl.ds(r, 1), pl.ds(q, WQ)].astype(F32)
        rolled = pltpu.roll(win, amt, axis=2)              # (3, 1, WQ)
        return rolled[:, :, :W], rolled[:, :, 1 : W + 1]

    def window2_c_vec(start):
        q, amt = roll_amt(start)
        win = src_ref[:, :, pl.ds(q, WQ)].astype(F32)      # (3, R, WQ)
        rolled = pltpu.roll(win, amt, axis=2)
        return rolled[:, :, :W], rolled[:, :, 1 : W + 1]

    def _ls_blend(t0, t1, f, m):
        ls = (1.0 - f) * t0 + f * t1                       # (CS, ., W)
        l = ls[0] * m
        if CS == 1:
            return l, 1.0                                  # unit sigma
        s = jnp.clip(ls[1] * m, 0.01, 1.0)
        return l, s

    def sample_ls_rows(n):
        l_rows, s_rows = [], []
        for r in range(R):
            p, f = taps(r, n)
            m = mask_ref[r, n]
            t0, t1 = window2_ls_row(n, r, p)
            l, s = _ls_blend(t0, t1, f, m)
            l_rows.append(l)
            if CS == 2:
                s_rows.append(s)
        return (jnp.concatenate(l_rows, 0),
                jnp.concatenate(s_rows, 0) if CS == 2 else 1.0)

    def sample_ls_vec(n):
        p, f = taps(0, n)
        t0, t1 = window2_ls_vec(n, p)
        return _ls_blend(t0, t1, f, mask_ref[0, n])

    def sample_c_rows(n):
        rows_c = []
        for r in range(R):
            p, f = taps(r, n)
            m = mask_ref[r, n]
            c0, c1 = window2_c_row(r, p)
            rows_c.append(((1.0 - f) * c0 + f * c1) * m)
        return jnp.concatenate(rows_c, axis=1)             # (3, R, W)

    def sample_c_vec(n):
        p, f = taps(0, n)
        m = mask_ref[0, n]
        c0, c1 = window2_c_vec(p)
        return ((1.0 - f) * c0 + f * c1) * m

    # --- diff variants (backward): also return masked tap differences -------
    # the taps are already loaded for the interpolation, so the forward
    # differences d/dshift needs (w1 - w0 for logits/sigma/src) are FREE
    # here; the backward caches them in VMEM scratch instead of re-windowing
    def sample_lsd_rows(n):
        l_rows, s_rows, ld_rows, sd_rows = [], [], [], []
        for r in range(R):
            p, f = taps(r, n)
            m = mask_ref[r, n]
            t0, t1 = window2_ls_row(n, r, p)
            l, s = _ls_blend(t0, t1, f, m)
            d = (t1 - t0) * m
            l_rows.append(l)
            s_rows.append(s)
            ld_rows.append(d[0])
            if CS == 2:
                sd_rows.append(d[1])
        return (
            jnp.concatenate(l_rows, 0),
            jnp.concatenate(s_rows, 0) if CS == 2 else 1.0,
            jnp.concatenate(ld_rows, 0),
            jnp.concatenate(sd_rows, 0) if CS == 2 else 0.0,
        )

    def sample_lsd_vec(n):
        p, f = taps(0, n)
        m = mask_ref[0, n]
        t0, t1 = window2_ls_vec(n, p)
        l, s = _ls_blend(t0, t1, f, m)
        d = (t1 - t0) * m
        return l, s, d[0], (d[1] if CS == 2 else 0.0)

    def sample_cd_rows(n):
        rows_c, rows_cd = [], []
        for r in range(R):
            p, f = taps(r, n)
            m = mask_ref[r, n]
            c0, c1 = window2_c_row(r, p)
            rows_c.append(((1.0 - f) * c0 + f * c1) * m)
            rows_cd.append((c1 - c0) * m)
        return (jnp.concatenate(rows_c, 1), jnp.concatenate(rows_cd, 1))

    def sample_cd_vec(n):
        p, f = taps(0, n)
        m = mask_ref[0, n]
        c0, c1 = window2_c_vec(p)
        return ((1.0 - f) * c0 + f * c1) * m, (c1 - c0) * m

    # --- row-vectorized ground-plane variants (gp_taps > 0) -----------------
    # One window anchored at the block's extreme integer shift; per-row
    # residuals delta_r = floor(shift_r) - base in [0, S] are realized by
    # S+2 STATIC lane-offset taps weighted with per-row one-hots — every
    # op runs at full sublane occupancy.
    def k_extreme(n):
        """(min, max) over the block's rows of floor(shift[r, n])."""
        k0 = jnp.floor(shift_ref[0, n])
        kmin = kmax = k0
        for r in range(1, R):
            kr = jnp.floor(shift_ref[r, n])
            kmin = jnp.minimum(kmin, kr)
            kmax = jnp.maximum(kmax, kr)
        return kmin, kmax

    def row_onehots(n, base, sign=1.0):
        """(f_vec (R,1), eq list) with eq[j] = 1[sign*(k_r - base) == j].

        Deltas are clamped into [0, gp_taps] — the taps-path backstop
        (exact whenever the block spread fits, which production configs
        guarantee with ~2x margin)."""
        s_vec = _row_col(shift_ref, n, R)              # (R, 1) f32
        k_vec = jnp.floor(s_vec)
        f_vec = s_vec - k_vec
        d_vec = jnp.clip(sign * (k_vec - base), 0.0, float(gp_taps))
        eq = [(d_vec == float(j)).astype(F32) for j in range(gp_taps + 1)]
        return f_vec, eq

    def tap_w(f_vec, eq, reverse=False):
        """Per-row tap weights, j in 0..S+1.

        forward:  w_j = (1-f) eq[j]   + f eq[j-1]    (2-tap interp)
        reverse:  w_j = (1-f) eq[j-1] + f eq[j]      (adjoint interp)
        """
        S_ = gp_taps
        one_m_f = 1.0 - f_vec
        w = []
        for j in range(S_ + 2):
            lo = eq[j] if j <= S_ else None
            hi = eq[j - 1] if j >= 1 else None
            if reverse:
                lo, hi = hi, lo
            wj = one_m_f * lo if lo is not None else 0.0
            if hi is not None:
                wj = wj + f_vec * hi
            w.append(wj)
        return w

    def tap_d(eq):
        """Difference weights: d_j picks tap(delta+1) - tap(delta)."""
        S_ = gp_taps
        d = []
        for j in range(S_ + 2):
            dj = eq[j - 1] if j >= 1 else 0.0
            if j <= S_:
                dj = dj - eq[j]
            d.append(dj)
        return d

    def taps_combine(rolled, w):
        acc = rolled[:, :, 0:W] * w[0]
        for j in range(1, gp_taps + 2):
            acc = acc + rolled[:, :, j : j + W] * w[j]
        return acc

    def taps_combine2(rolled, w, d):
        t = rolled[:, :, 0:W]
        acc, dacc = t * w[0], t * d[0]
        for j in range(1, gp_taps + 2):
            t = rolled[:, :, j : j + W]
            acc = acc + t * w[j]
            dacc = dacc + t * d[j]
        return acc, dacc

    def window_taps(ref_slice, start):
        """(C, R, WT) window with col 0 = ref[start], via one roll."""
        q = pl.multiple_of((start // 128) * 128, 128)
        win = ref_slice(q).astype(F32)
        return pltpu.roll(win, (WT - (start - q)) % WT, axis=2)

    def window_taps_ls(n, base_i):
        return window_taps(
            lambda q: ls_ref[pl.ds(CS * n, CS), :, pl.ds(q, WT)],
            pad + base_i,
        )

    def window_taps_c(base_i):
        return window_taps(
            lambda q: src_ref[:, :, pl.ds(q, WT)], pad + base_i
        )

    def sample_ls_taps(n):
        kmin, _ = k_extreme(n)
        f_vec, eq = row_onehots(n, kmin)
        rolled = window_taps_ls(n, kmin.astype(jnp.int32))
        ls = taps_combine(rolled, tap_w(f_vec, eq))    # (CS, R, W)
        m = _row_col(mask_ref, n, R)
        if CS == 1:
            return ls[0] * m, 1.0
        return ls[0] * m, jnp.clip(ls[1] * m, 0.01, 1.0)

    def sample_c_taps(n):
        kmin, _ = k_extreme(n)
        f_vec, eq = row_onehots(n, kmin)
        rolled = window_taps_c(kmin.astype(jnp.int32))
        return taps_combine(rolled, tap_w(f_vec, eq)) * _row_col(
            mask_ref, n, R
        )

    def sample_lsd_taps(n):
        kmin, _ = k_extreme(n)
        f_vec, eq = row_onehots(n, kmin)
        rolled = window_taps_ls(n, kmin.astype(jnp.int32))
        ls, lsd = taps_combine2(rolled, tap_w(f_vec, eq), tap_d(eq))
        m = _row_col(mask_ref, n, R)
        if CS == 1:
            return ls[0] * m, 1.0, lsd[0] * m, 0.0
        return (ls[0] * m, jnp.clip(ls[1] * m, 0.01, 1.0),
                lsd[0] * m, lsd[1] * m)

    def sample_cd_taps(n):
        kmin, _ = k_extreme(n)
        f_vec, eq = row_onehots(n, kmin)
        rolled = window_taps_c(kmin.astype(jnp.int32))
        c, cd = taps_combine2(rolled, tap_w(f_vec, eq), tap_d(eq))
        m = _row_col(mask_ref, n, R)
        return c * m, cd * m

    return types.SimpleNamespace(
        ls_rows=sample_ls_rows, ls_vec=sample_ls_vec,
        c_rows=sample_c_rows, c_vec=sample_c_vec,
        lsd_rows=sample_lsd_rows, lsd_vec=sample_lsd_vec,
        cd_rows=sample_cd_rows, cd_vec=sample_cd_vec,
        ls_taps=sample_ls_taps, c_taps=sample_c_taps,
        lsd_taps=sample_lsd_taps, cd_taps=sample_cd_taps,
        k_extreme=k_extreme, row_onehots=row_onehots, tap_w=tap_w,
        taps_combine=taps_combine, WT=WT,
    )


def _online_e(l_n, mx):
    """Online-softmax update sharing ONE exp: returns (corr, e_n, mx_new)
    with corr = exp(mx - mx_new) (rescales the running accumulators) and
    e_n = exp(l_n - mx_new).  exp(-|l_n - mx|) IS one of the two values
    elementwise (the other is exp(0) = 1), so the rescale costs no extra
    transcendental over a two-pass max-then-exp design."""
    t = jnp.exp(-jnp.abs(l_n - mx))
    gt = l_n > mx
    one = jnp.ones_like(t)
    return (jnp.where(gt, t, one), jnp.where(gt, one, t),
            jnp.maximum(mx, l_n))


def _n_stats(with_disp: bool) -> int:
    """f32 per-pixel softmax statistics the forward can emit for the
    single-pass backward (flash-attention style): L = mx + log(se),
    U = us/se, M and Ma (the mixture sums), and with the fused disp head
    the center triple (L0 over the UNMASKED center normalizer, U0, disp0)
    matching the backward's center algebra exactly."""
    return 7 if with_disp else 4


def _fwd_kernel(
    shift_ref,   # (R, N) SMEM  signed source offsets
    mask_ref,    # (R, N) SMEM  row plane-validity
    src_ref,     # (3, R, Wp) VMEM padded source rows
    tgt_ref,     # (3, R, W)  VMEM target rows
    ls_ref,      # (2N, R, Wp) VMEM padded interleaved logits/sigma
    *refs,       # rgb, nll [, nlla] [, disp] [, stats] outs (single pass)
    n_planes: int,
    n_vertical: int,
    rows: int,
    width: int,
    pad: int,
    with_disp: bool = False,
    gp_taps: int = 0,
    with_stats: bool = False,
    with_auto: bool = True,
    with_mixture: bool = True,
):
    refs = list(refs)
    stats_ref = refs.pop() if with_stats else None
    rgb_ref, nll_ref = refs[0], refs[1]
    refs = refs[2:]
    # with_auto=False (recipes without automask) skips the automask
    # mixture — one exp per plane per pixel; the stats Ma slot (layout
    # shared with the image_grads backward) is written as zero
    nlla_ref = refs.pop(0) if with_auto else None
    disp_ref = refs.pop(0) if with_disp else None
    N, R, W = n_planes, rows, width
    NV = n_vertical
    WQ = W + 128            # aligned window: residual lane shift < 128

    # with_mixture=False (no-mixture recipes: FalNet, L1-on-composite
    # ablations — reference fal_net.py:199-205, trainer.py:738): the ls
    # operand is LOGITS-ONLY (N, R, Wp), sigma is the literal 1.0, so the
    # composite weight e_n / s_n IS the softmax weight and the center
    # disp head is the plain softmax expectation (no mask re-weighting —
    # matching the no-mixture decoder, models/depth_decoder.py softmax
    # path).  nll is still emitted (a valid b=1 Laplacian NLL) purely to
    # keep the output plumbing shared; its cotangent is zero in training.
    sm = _make_samplers(
        shift_ref, mask_ref, src_ref, ls_ref, R, W, pad, gp_taps=gp_taps,
        ls_stride=2 if with_mixture else 1,
    )
    sample_ls_vec, sample_c_vec = sm.ls_vec, sm.c_vec
    sample_ls_g = sm.ls_taps if gp_taps else sm.ls_rows
    sample_c_g = sm.c_taps if gp_taps else sm.c_rows

    def center_ls(n):
        """CENTER (unshifted) head samples for the fused disp head — read
        straight from the resident (bf16) ls block both passes instead of
        f32 scratch round-trips."""
        m = _row_col(mask_ref, n, R)
        if not with_mixture:
            return ls_ref[n, :, pl.ds(pad, W)].astype(F32) * m, 1.0
        l0 = ls_ref[2 * n, :, pl.ds(pad, W)].astype(F32) * m
        s0 = jnp.clip(
            ls_ref[2 * n + 1, :, pl.ds(pad, W)].astype(F32), 0.01, 1.0
        )
        return l0, s0

    # ---- SINGLE online-softmax pass (flash-attention style; see the
    # quad kernel, ops/pallas_sweep_quad.py): a running max with an
    # accumulator rescale replaces the old max pass + the l/s VMEM
    # scratch round-trip entirely.  Every accumulated sum is LINEAR in
    # e_n = exp(l_n - max):
    #   se  = sum e            (softmax normalizer)
    #   us  = sum e/s          (=> U = us/se; rgb = rgb'/us directly)
    #   rgb'= sum (e/s) c
    #   M'  = sum e lap, Ma' = sum e lapa   (=> M = M'/se)
    # so one corr multiply per plane keeps them exact, and the rescale
    # shares its exp with e_n (_online_e).  The center (disp-head) sums
    # se0/us0/ud0 ride the same loop under their own running max.
    tgt = tgt_ref[...].astype(F32)                        # (3, R, W)
    if with_auto:
        e_auto = (
            jnp.abs(src_ref[:, :, pl.ds(pad, W)].astype(F32) - tgt).sum(0)
            / 3.0
        )

    nh = 6 if with_auto else 5           # head carry length

    def pass_all(sample_ls, sample_c):
        def body(n, carry):
            mx, se, us, rgb_acc, M = carry[:5]
            l_n, s_n = sample_ls(n)
            c_n = sample_c(n)                             # (3, R, W)
            corr, e_n, mx = _online_e(l_n, mx)
            # ONE reciprocal per plane: VPU divides are multi-op
            # reciprocal+Newton sequences — every /s_n below rides r_n
            r_n = 1.0 / s_n
            u_n = e_n * r_n
            rgb_acc = rgb_acc * corr[None] + u_n[None] * c_n
            err_n = jnp.abs(c_n - tgt).sum(0) / 3.0
            M = M * corr + e_n * 0.5 * jnp.exp(-err_n * r_n) * r_n
            head = (mx, se * corr + e_n, us * corr + u_n, rgb_acc, M)
            if with_auto:
                head = head + (
                    carry[5] * corr
                    + e_n * 0.5 * jnp.exp(-e_auto * r_n) * r_n,)
            if not with_disp:
                return head
            mx0, se0, us0, ud0 = carry[nh : nh + 4]
            l0, s0 = center_ls(n)
            corr0, e0_n, mx0 = _online_e(l0, mx0)
            # no-mixture disp head: plain softmax expectation — no mask
            # re-weighting (the operand logits are already masked), no
            # sigma (models/depth_decoder.py no-mixture disp contraction)
            u0_n = (
                e0_n * _row_col(mask_ref, n, R) * (1.0 / s0)
                if with_mixture else e0_n
            )
            head = head + (mx0, se0 * corr0 + u0_n * s0,
                           us0 * corr0 + u0_n,
                           ud0 * corr0 + u0_n * _row_col(shift_ref, n, R))
            if with_stats:
                # UNMASKED center normalizer (the backward's center
                # softmax runs over all planes, mask applied after)
                head = head + (carry[nh + 4] * corr0 + e0_n,)
            return head
        return body

    zero = jnp.zeros((R, W), F32)
    neg = jnp.full((R, W), -1e30, F32)
    carry = (neg, zero, zero, jnp.zeros((3, R, W), F32), zero)
    if with_auto:
        carry = carry + (zero,)
    if with_disp:
        carry = carry + (neg, zero, zero, zero)
        if with_stats:
            carry = carry + (zero,)
    carry = jax.lax.fori_loop(
        0, NV, pass_all(sample_ls_vec, sample_c_vec), carry)
    carry = jax.lax.fori_loop(NV, N, pass_all(sample_ls_g, sample_c_g),
                              carry)
    se, us, rgb_acc, M = carry[1:5]
    inv_se = 1.0 / se                        # se >= exp(0) = 1 at the max
    U = us * inv_se
    # rgb = sum (pi/s) c * inv(U) = (inv_se * rgb') * inv(us * inv_se)
    #     = rgb' / us, with the same U <= eps guard as the oracle
    inv_us = jnp.where(U > 1e-7, 1.0 / jnp.maximum(us, 1e-30), 0.0)
    M = M * inv_se

    rgb_ref[...] = (rgb_acc * inv_us[None]).astype(rgb_ref.dtype)
    nll_ref[...] = -jnp.log(jnp.maximum(M, 0.0) + 1e-7)
    if with_auto:
        Ma = carry[5] * inv_se
        nlla_ref[...] = -jnp.log(jnp.maximum(Ma, 0.0) + 1e-7)
    else:
        Ma = zero                            # stats slot placeholder
    if with_disp:
        se0, us0, ud0 = carry[nh + 1 : nh + 4]
        U0 = us0 / se0
        inv_us0 = jnp.where(U0 > 1e-7, 1.0 / jnp.maximum(us0, 1e-30), 0.0)
        disp_ref[...] = (ud0 * inv_us0).astype(disp_ref.dtype)
    if with_stats:
        mx = carry[0]
        stats = [mx + jnp.log(se), U, M, Ma]
        if with_disp:
            mx0, se0r = carry[nh], carry[nh + 4]
            U0b = us0 / se0r
            disp0 = jnp.where(
                U0b > 1e-7, ud0 / jnp.maximum(us0, 1e-30), 0.0)
            stats += [mx0 + jnp.log(se0r), U0b, disp0]
        stats_ref[...] = jnp.stack(stats)


def _bwd_kernel(
    shift_ref,   # (R, N) SMEM
    mask_ref,    # (R, N) SMEM
    src_ref,     # (3, R, Wp) VMEM padded source rows
    tgt_ref,     # (3, R, W)
    ls_ref,      # (2N, R, Wp) padded interleaved logits/sigma
    stats_ref,   # (_n_stats, R, W) f32 forward softmax statistics
    rgb_ref,     # (3, R, W) forward rgb output (for A = U*(G.rgb))
    grgb_ref,    # (3, R, W) cotangent of rgb_rec
    gnll_ref,    # (R, W)
    *refs,       # [gnla when with_auto] [gdisp when with_disp]
                 # [dsrc, dtgt when image_grads]
                 # dlog [, dsig], dshift outs + the g staging scratch
    n_planes: int,
    n_vertical: int,
    rows: int,
    width: int,
    pad: int,
    gpad: int,
    image_grads: bool = True,
    with_disp: bool = False,
    gp_taps: int = 0,
    packed_grads: bool = False,
    with_auto: bool = True,
    with_mixture: bool = True,
):
    """Adjoint of _fwd_kernel, same slicing structure, scatter-free.

    ONE pass, flash-attention style: the forward saves its per-pixel
    softmax statistics (L = mx + log se, U, M, Ma, plus the center
    triple for the fused disp head), and the remaining global coupling
    comes free from the forward OUTPUTS — with u = pi/sigma, U = sum u,
    A = sum_n dwgt_n u_n = U * (G . rgb_out), since
    rgb_out = sum u c / sum u.  With every global known up front each
    plane's samples are consumed the moment they are live
    (pi_n = exp(l_n - L)), so the old recompute/couplings passes and
    their six (N, ...) VMEM scratches disappear; only the reverse-window
    staging buffer remains.  The automask image adjoint's plane sum
    dEa = -sum_n pi_n lapa_n / s_n rides the emission loop as a carry
    and lands on dsrc/dtgt after it.

    ``image_grads=False`` drops the d_src/d_tgt outputs and with them the
    entire automask adjoint (nll_auto's only live cotangent path is into
    the images — pi/sigma are detached there by definition).  The train
    step never differentiates w.r.t. the batch images, so this is the
    production configuration.

    ``packed_grads=True`` emits ONE interleaved (2N, R, W) head-gradient
    output (d_logits at 2n, d_sigma at 2n+1 — the same layout the packed
    ``ls`` input uses) instead of two (N, R, W) outputs; the caller's
    adjoint repack to the s2d decoder heads is then a single transpose.
    """
    assert with_auto or not image_grads, (
        "image_grads needs the automask adjoint (with_auto)")
    refs = list(refs)
    gnla_ref = refs.pop(0) if with_auto else None
    gdisp_ref = refs.pop(0) if with_disp else None
    if image_grads:
        dsrc_ref, dtgt_ref = refs[:2]
        refs = refs[2:]
    else:
        dsrc_ref = dtgt_ref = None
    if packed_grads or not with_mixture:
        # no-mixture mode has no sigma input, hence no d_sigma output
        dlog_ref, dshift_ref, g_scr = refs
        dsig_ref = None
    else:
        dlog_ref, dsig_ref, dshift_ref, g_scr = refs
    # pad: left offset of the W center in the HBM operands (0 in nonneg
    # mode); gpad: left reach of the VMEM staging scratch (always the
    # full rounded pad — reverse windows read [gpad - k ...))
    N, R, W = n_planes, rows, width
    NV = n_vertical
    WQ = W + 128
    WG = W + 2 * gpad + (256 if gp_taps else 128)

    sm = _make_samplers(
        shift_ref, mask_ref, src_ref, ls_ref, R, W, pad, gp_taps=gp_taps,
        ls_stride=2 if with_mixture else 1,
    )
    sample_lsd_vec, sample_cd_vec = sm.lsd_vec, sm.cd_vec
    sample_lsd_g = sm.lsd_taps if gp_taps else sm.lsd_rows
    sample_cd_g = sm.cd_taps if gp_taps else sm.cd_rows

    def taps(r, n):
        s = shift_ref[r, n]
        k = jnp.floor(s)
        return pad + k.astype(jnp.int32), (s - k).astype(F32)

    def roll_amt(start):
        q = pl.multiple_of((start // 128) * 128, 128)
        return q, (WQ - (start - q)) % WQ

    def center_ls(n):
        """CENTER (unshifted) head samples for the fused disp head,
        straight from the resident ls block (bf16 in production)."""
        m = _row_col(mask_ref, n, R)
        if not with_mixture:
            return ls_ref[n, :, pl.ds(pad, W)].astype(F32) * m, None
        l0 = ls_ref[2 * n, :, pl.ds(pad, W)].astype(F32) * m
        s0_raw = ls_ref[2 * n + 1, :, pl.ds(pad, W)].astype(F32)
        return l0, s0_raw

    # reverse interpolation (1-f)*g[rev] + f*g[rev-1] from ONE dynamic roll
    # anchored at rev-1: tap(rev-1) = rolled[:W], tap(rev) = rolled[1:W+1]
    def g_back(r, rev, f):
        q, amt = roll_amt(rev - 1)
        win = g_scr[:, pl.ds(r, 1), pl.ds(q, WQ)]
        rolled = pltpu.roll(win, amt, axis=2)
        return (1.0 - f) * rolled[:, :, 1 : W + 1] + f * rolled[:, :, :W]

    def g_back_vec(rev, f):
        q, amt = roll_amt(rev - 1)
        win = g_scr[:, :, pl.ds(q, WQ)]
        rolled = pltpu.roll(win, amt, axis=2)
        return (1.0 - f) * rolled[:, :, 1 : W + 1] + f * rolled[:, :, :W]

    tgt = tgt_ref[...].astype(F32)
    G = grgb_ref[...].astype(F32)
    gN = gnll_ref[...].astype(F32)

    # ---- global couplings from the forward statistics ----------------------
    st = stats_ref[...]
    L, U, M, Ma = st[0], st[1], st[2], st[3]
    rgb0 = rgb_ref[...].astype(F32)
    A = U * (G * rgb0).sum(0)
    inv_u = jnp.where(U > 1e-7, 1.0 / jnp.maximum(U, 1e-7), 0.0)
    dM = -gN * (M > 0) / (jnp.maximum(M, 0.0) + 1e-7)
    dU = -(inv_u**2) * A * (U > 1e-7)
    S = inv_u * A + dM * M + dU * U

    # ---- center (fused disp head) adjoint precomputation -------------------
    # disp = sum(u0 d)/sum(u0) (guarded): the softmax/U coupling term
    # vanishes analytically (S0 = g/U0 * inv_se0 * (ud0 - disp*us0) = 0),
    # leaving per-plane-local gradients (see ops/pallas_disp.py math).
    if with_disp:
        L0, U0, disp0 = st[4], st[5], st[6]
        live0 = (U0 > 1e-7).astype(F32)
        gD = gdisp_ref[...].astype(F32) * live0
        g_over_u0 = gD / jnp.maximum(U0, 1e-7)

    if image_grads:
        src0 = src_ref[:, :, pl.ds(pad, W)].astype(F32)
        e_auto = jnp.abs(src0 - tgt).sum(0) / 3.0
        gA_ = gnla_ref[...].astype(F32)
        dMa = -gA_ * (Ma > 0) / (jnp.maximum(Ma, 0.0) + 1e-7)
        dsrc_ref[...] = jnp.zeros((3, R, W), F32)
        dtgt_ref[...] = jnp.zeros((3, R, W), F32)
    # halo regions stay zero: the stagings below only write [gpad, gpad+W)
    g_scr[...] = jnp.zeros((3, R, WG), F32)

    def plane_grads(sample_lsd, sample_cd, n):
        """Per-plane adjoint algebra from LIVE samples ->
        (dl, ds_gated, dc, dshift, dl0, ds0, dEa_n)."""
        l_n, s_n, ld_n, sd_n = sample_lsd(n)
        c_n, cd_n = sample_cd(n)
        pi_n = jnp.exp(l_n - L)
        e_n = jnp.abs(c_n - tgt).sum(0) / 3.0
        # ONE reciprocal per plane (VPU divides are multi-op sequences);
        # the seven /s_n of the adjoint algebra all ride r_n / r2_n
        r_n = 1.0 / s_n
        lap_n = 0.5 * jnp.exp(-e_n * r_n) * r_n
        u_n = pi_n * r_n
        wgt_n = u_n * inv_u
        dwgt_n = (G * c_n).sum(0)
        du_n = dwgt_n * inv_u + dU
        dpi_n = du_n * r_n + dM * lap_n
        dl_n = pi_n * (dpi_n - S)
        dlap_n = dM * pi_n
        de_n = -dlap_n * lap_n * r_n
        if with_mixture:
            ds_n = (dlap_n * lap_n * (e_n - s_n) - du_n * pi_n) * (r_n * r_n)
            ds_gate = ds_n * ((s_n > 0.01) & (s_n < 1.0))
        else:
            ds_gate = 0.0        # sigma is the constant 1.0: no gradient
        sgn = jnp.sign(c_n - tgt)
        dc_n = G * wgt_n[None] + sgn * (de_n / 3.0)[None]
        dEa_n = None
        if image_grads:
            dtgt_ref[...] += -sgn * (de_n / 3.0)[None]
            lapa_n = 0.5 * jnp.exp(-e_auto * r_n) * r_n
            dEa_n = -pi_n * lapa_n * r_n
        # d/dshift: one (R,) reduction over the live tap diffs (the
        # diffs carry the mask; the adjoints are multiplied by it anyway)
        dshift_r = (
            jnp.sum(dl_n * ld_n + ds_gate * sd_n, axis=1)
            + jnp.sum(dc_n * cd_n, axis=(0, 2))
        )                                                   # (R,)
        dl0_n = ds0_n = None
        if with_disp:
            m = _row_col(mask_ref, n, R)
            l0, s0_raw = center_ls(n)
            p0_n = jnp.exp(l0 - L0)
            du0 = g_over_u0 * (_row_col(shift_ref, n, R) - disp0)
            if with_mixture:
                s0_n = jnp.clip(s0_raw, 0.01, 1.0)
                r0_n = 1.0 / s0_n
                dp0 = du0 * m * r0_n
                dl0_n = p0_n * dp0      # softmax coupling S0 == 0
                # clip pass-through gate on the RAW center sigma: outside
                # (0.01, 1) the forward is flat, so d_sigma there is 0
                gate0 = (s0_raw > 0.01) & (s0_raw < 1.0)
                ds0_n = -du0 * p0_n * m * (r0_n * r0_n) * gate0
                # shift doubles as the per-plane disparity d_n: its
                # cotangent gains the disp-head term sum_x g/U0 * u0
                dshift_r = dshift_r + jnp.sum(
                    g_over_u0 * p0_n * m * r0_n, axis=1
                )
            else:
                # plain softmax expectation (no mask/sigma re-weighting
                # of the WEIGHTS, but l0 = ls * m still chains the mask
                # into the raw-logits cotangent)
                dl0_n = p0_n * du0 * m
                dshift_r = dshift_r + jnp.sum(g_over_u0 * p0_n, axis=1)
        return dl_n, ds_gate, dc_n, dshift_r, dl0_n, ds0_n, dEa_n

    def carry_out(dEa, dEa_n):
        return dEa + dEa_n if image_grads else dEa

    def center_add(back_l, back_s, dl0_n, ds0_n):
        if not with_disp:
            return back_l, back_s
        if ds0_n is None:
            return back_l + dl0_n, back_s
        return back_l + dl0_n, back_s + ds0_n

    def emit_ls(n, bl, bs):
        if packed_grads:
            dlog_ref[2 * n] = bl.astype(dlog_ref.dtype)
            dlog_ref[2 * n + 1] = bs.astype(dlog_ref.dtype)
        elif not with_mixture:
            dlog_ref[n] = bl.astype(dlog_ref.dtype)
        else:
            dlog_ref[n] = bl.astype(dlog_ref.dtype)
            dsig_ref[n] = bs.astype(dsig_ref.dtype)

    def emit_ls_row(n, r, bl, bs):
        if packed_grads:
            dlog_ref[2 * n, pl.ds(r, 1)] = bl.astype(dlog_ref.dtype)
            dlog_ref[2 * n + 1, pl.ds(r, 1)] = bs.astype(dlog_ref.dtype)
        elif not with_mixture:
            dlog_ref[n, pl.ds(r, 1)] = bl.astype(dlog_ref.dtype)
        else:
            dlog_ref[n, pl.ds(r, 1)] = bl.astype(dlog_ref.dtype)
            dsig_ref[n, pl.ds(r, 1)] = bs.astype(dsig_ref.dtype)

    def pass3_vec(n, dEa):
        dl_n, ds_g, dc_n, dshift_r, dl0_n, ds0_n, dEa_n = plane_grads(
            sample_lsd_vec, sample_cd_vec, n)
        p, f = taps(0, n)
        m = mask_ref[0, n]
        rev = gpad + pad - p

        dshift_ref[n] = jnp.broadcast_to(dshift_r[:, None], (R, 128))

        # d_src / d_logits / d_sigma via reverse windows of staged blocks
        if image_grads:
            g_scr[:, :, pl.ds(gpad, W)] = dc_n * m
            dsrc_ref[...] += g_back_vec(rev, f)
        g_scr[0, :, pl.ds(gpad, W)] = dl_n * m
        if with_mixture:
            g_scr[1, :, pl.ds(gpad, W)] = ds_g * m
        back2 = g_back_vec(rev, f)
        bl, bs = center_add(back2[0], back2[1], dl0_n, ds0_n)
        emit_ls(n, bl, bs)
        return carry_out(dEa, dEa_n)

    def pass3_rows(n, dEa):
        dl_n, ds_g, dc_n, dshift_r, dl0_n, ds0_n, dEa_n = plane_grads(
            sample_lsd_g, sample_cd_g, n)
        dshift_ref[n] = jnp.broadcast_to(dshift_r[:, None], (R, 128))

        if image_grads:
            for r in range(R):
                m = mask_ref[r, n]
                g_scr[:, pl.ds(r, 1), pl.ds(gpad, W)] = dc_n[:, r : r + 1] * m
            dsrc_rows = []
            for r in range(R):
                p, f = taps(r, n)
                dsrc_rows.append(g_back(r, gpad + pad - p, f))
            dsrc_ref[...] += jnp.concatenate(dsrc_rows, axis=1)

        for r in range(R):
            m = mask_ref[r, n]
            g_scr[0, pl.ds(r, 1), pl.ds(gpad, W)] = dl_n[r : r + 1] * m
            if with_mixture:
                g_scr[1, pl.ds(r, 1), pl.ds(gpad, W)] = ds_g[r : r + 1] * m
        for r in range(R):
            p, f = taps(r, n)
            back = g_back(r, gpad + pad - p, f)
            if with_disp:
                bl = back[0] + dl0_n[r : r + 1]
                bs = (back[1] + ds0_n[r : r + 1]) if with_mixture else None
            else:
                bl, bs = back[0], back[1]
            emit_ls_row(n, r, bl, bs)
        return carry_out(dEa, dEa_n)

    def pass3_taps(n, dEa):
        """Row-vectorized ground-plane emission: ONE staged write + ONE
        reverse window per quantity, with the per-row reverse offsets
        realized by the same static-tap machinery as the forward samplers
        (anchor = max_r floor(shift_r), deltas = kmax - k_r)."""
        dl_n, ds_g, dc_n, dshift_r, dl0_n, ds0_n, dEa_n = plane_grads(
            sample_lsd_g, sample_cd_g, n)
        dshift_ref[n] = jnp.broadcast_to(dshift_r[:, None], (R, 128))

        kmin, kmax = sm.k_extreme(n)
        f_vec, eqr = sm.row_onehots(n, kmax, sign=-1.0)
        wrev = sm.tap_w(f_vec, eqr, reverse=True)
        base_rev = (gpad - 1) - kmax.astype(jnp.int32)
        q = pl.multiple_of((base_rev // 128) * 128, 128)
        amt = (sm.WT - (base_rev - q)) % sm.WT
        m_vec = _row_col(mask_ref, n, R)               # (R, 1)

        def g_back_taps(chans):
            win = g_scr[pl.ds(0, chans), :, pl.ds(q, sm.WT)]
            return sm.taps_combine(pltpu.roll(win, amt, axis=2), wrev)

        if image_grads:
            g_scr[:, :, pl.ds(gpad, W)] = dc_n * m_vec
            dsrc_ref[...] += g_back_taps(3)
        g_scr[0, :, pl.ds(gpad, W)] = dl_n * m_vec
        if with_mixture:
            g_scr[1, :, pl.ds(gpad, W)] = ds_g * m_vec
        back = g_back_taps(2 if with_mixture else 1)
        bl, bs = center_add(back[0], back[1] if with_mixture else None,
                            dl0_n, ds0_n)
        emit_ls(n, bl, bs)
        return carry_out(dEa, dEa_n)

    dEa = jnp.zeros((R, W), F32)
    dEa = jax.lax.fori_loop(0, NV, pass3_vec, dEa)
    dEa = jax.lax.fori_loop(
        NV, N, pass3_taps if gp_taps else pass3_rows, dEa)
    if image_grads:
        # automask identity-error adjoint: only the images receive it
        t_auto = jnp.sign(src0 - tgt) * ((dEa * dMa) / 3.0)[None]
        dsrc_ref[...] += t_auto
        dtgt_ref[...] += -t_auto


def _pad_lr(x, lpad, rpad):
    """Zero-pad the trailing W axis asymmetrically (left halo only in the
    signed mode; window-roll slack rides the right side)."""
    cfg = [(0, 0)] * (x.ndim - 1) + [(lpad, rpad)]
    return jnp.pad(x, cfg)


def _interleave_ls(logits_t, sigma_t):
    """Interleave (B, N, H, W) logits/sigma into (B, 2N, H, W) with
    logits at 2n and sigma at 2n+1 — ONE window+roll in the kernel then
    fetches both heads.  The s2d production path skips this entirely:
    the decoder emits the heads pre-interleaved at the WEIGHT level
    (models/depth_decoder.py merged ls conv) and the step feeds
    :func:`fused_plane_sweep_packed` directly."""
    B, N, H, W = logits_t.shape
    return jnp.stack([logits_t, sigma_t], axis=2).reshape(B, 2 * N, H, W)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pad", "rows", "interpret", "n_vertical", "with_disp", "gp_taps",
        "with_stats", "with_auto", "nonneg",
    ),
)
def sweep_forward(src_t, target_t, logits_t, sigma_t, shift, mask,
                  pad: int, rows: int = 8, interpret: bool = False,
                  n_vertical: int = 0, with_disp: bool = False,
                  gp_taps: int = 0, with_stats: bool = False,
                  with_auto: bool = True, nonneg: bool = False):
    """Run the fused forward kernel.

    Args:
      src_t/target_t: ``(B, 3, H, W)`` channel-first source/target rows.
      logits_t/sigma_t: ``(B, N, H, W)`` plane-first heads.
      shift: ``(B, H, N)`` signed source offsets in pixels (row-constant).
      mask: ``(B, H, N)`` plane validity.
      pad: static W padding >= max |shift| + 1.
      with_disp: also emit the expected-disparity head over the CENTER
        (unshifted) samples — the ops/pallas_disp.py computation fused
        into the same data streaming (``shift`` doubles as the per-plane
        row disparities, which is exactly the stereo train-step setup).

    Returns:
      (rgb_rec (B, 3, H, W) f32, nll (B, H, W) f32
       [, nll_auto (B, H, W) f32 when ``with_auto``]
       [, disp (B, H, W) f32] [, stats (B, _n_stats, H, W) f32 — the
       softmax statistics the single-pass backward consumes, appended
       LAST when ``with_stats``])
    """
    return _fwd_call(
        src_t, target_t, _interleave_ls(logits_t, sigma_t), shift, mask,
        pad=pad, rows=rows, interpret=interpret, n_vertical=n_vertical,
        with_disp=with_disp, gp_taps=gp_taps, with_stats=with_stats,
        with_auto=with_auto, nonneg=nonneg,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "pad", "rows", "interpret", "n_vertical", "with_disp", "gp_taps",
        "with_stats", "with_auto", "nonneg",
    ),
)
def sweep_forward_packed(src_t, target_t, ls, shift, mask,
                         pad: int, rows: int = 8, interpret: bool = False,
                         n_vertical: int = 0, with_disp: bool = False,
                         gp_taps: int = 0, with_stats: bool = False,
                         with_auto: bool = True, nonneg: bool = False):
    """:func:`sweep_forward` on a PRE-INTERLEAVED head buffer ``ls``
    ``(B, 2N, H, W)`` (logits at 2n, sigma at 2n+1) — the s2d production
    path where the decoder's merged head conv emits this layout up to
    one transpose, so separate plane-first logits/sigma never exist."""
    return _fwd_call(
        src_t, target_t, ls, shift, mask, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical, with_disp=with_disp,
        gp_taps=gp_taps, with_stats=with_stats, with_auto=with_auto,
        nonneg=nonneg,
    )


def _v1_geom(pad: int, gp_taps: int, nonneg: bool = False):
    """(lane-rounded pad, roll slack, left pad) — shared by fwd/bwd calls
    and the pad-once VJPs.  ``nonneg`` (production: shifts are
    disparities >= 0) drops the left halo, which is never read then."""
    padr = ((pad + 127) // 128) * 128
    return padr, (256 if gp_taps else 128), (0 if nonneg else padr)


def _fwd_call(src_t, target_t, ls, shift, mask, *, pad, rows, interpret,
              n_vertical, with_disp, gp_taps, with_stats=False,
              pre_padded=False, with_auto=True, nonneg=False,
              with_mixture=True):
    B, _, H, W = target_t.shape
    cs = 2 if with_mixture else 1
    N = ls.shape[1] // cs
    R = rows
    assert H % R == 0, (H, R)
    # pad to a multiple of 128 so static slices stay lane-aligned, +128
    # window slack for the dynamic lane roll (see _fwd_kernel.window);
    # the ground-plane taps path needs 256 (WT windows)
    pad, slack, lpad = _v1_geom(pad, gp_taps, nonneg)
    Wp = W + lpad + pad + slack
    # backstop: keep the dynamic slice start within the padded buffer.
    # NOTE this substitutes the sample at the clamped offset, NOT the
    # zeros the XLA twin would produce — callers must guarantee
    # pad >= max |shift| so the clamp is dead.  The production bound
    # (train/step.py:sweep_pad = disp_max*1.08 + 4, lane-rounded up):
    # vertical shifts max out at disp_max*(disp_max/disp_min)^(0.5/(N-1))
    # ~= 1.06*disp_max under the +-0.5 plane residual, and ground-plane
    # disparity DECREASES toward the horizon (disp = dw/ground_layered
    # with ground_layered -> inf as y -> 0), peaking well below disp_max
    # at the image bottom.
    shift = jnp.clip(shift, 0.0 if nonneg else -(pad - 2.0), pad - 2.0)

    if pre_padded:
        src_p, ls_p = src_t, ls
        assert ls_p.shape[-1] == Wp, (ls_p.shape, Wp)
    else:
        src_p = _pad_lr(src_t, lpad, pad + slack)
        ls_p = _pad_lr(ls, lpad, pad + slack)

    kernel = functools.partial(
        _fwd_kernel, n_planes=N, n_vertical=n_vertical, rows=R, width=W,
        pad=lpad, with_disp=with_disp, gp_taps=gp_taps,
        with_stats=with_stats, with_auto=with_auto,
        with_mixture=with_mixture,
    )

    row_spec = pl.BlockSpec((None, R, W), lambda b, h: (b, h, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((B, H, W), F32)
    out_specs = [
        pl.BlockSpec((None, 3, R, W), lambda b, h: (b, 0, h, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
    ]
    out_shape = [
        # reconstruction in the INPUT dtype (bf16 in production): its
        # only consumer is the perceptual net, which runs bf16 anyway;
        # halves the largest output write and its cotangent traffic
        jax.ShapeDtypeStruct((B, 3, H, W), src_t.dtype),
        row_shape,
    ]
    if with_auto:
        out_specs.append(row_spec)
        out_shape.append(row_shape)
    if with_disp:
        out_specs.append(row_spec)
        out_shape.append(row_shape)
    if with_stats:
        ks = _n_stats(with_disp)
        out_specs.append(
            pl.BlockSpec((None, ks, R, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, ks, H, W), F32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((None, R, N), lambda b, h: (b, h, 0),
                         memory_space=pltpu.SMEM),         # shift
            pl.BlockSpec((None, R, N), lambda b, h: (b, h, 0),
                         memory_space=pltpu.SMEM),         # mask
            pl.BlockSpec((None, 3, R, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),         # src (padded)
            pl.BlockSpec((None, 3, R, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),         # target
            pl.BlockSpec((None, cs * N, R, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),         # logits[|sigma]
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # full-plane blocks + double buffering exceed the default 16M
            # scoped budget; v5e has 128M physical VMEM per core
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shift, mask, src_p, target_t, ls_p)
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pad", "rows", "interpret", "n_vertical", "image_grads", "with_disp",
        "gp_taps", "with_auto", "nonneg",
    ),
)
def sweep_backward(src_t, target_t, logits_t, sigma_t, shift, mask,
                   stats, rgb, g_rgb, g_nll, g_nla, g_disp=None,
                   pad: int = 0, rows: int = 8, interpret: bool = False,
                   n_vertical: int = 0, image_grads: bool = True,
                   with_disp: bool = False, gp_taps: int = 0,
                   with_auto: bool = True, nonneg: bool = False):
    """Pallas backward kernel invocation (adjoint of sweep_forward).

    ``stats``/``rgb`` are the forward's ``with_stats`` output and rgb
    output (VJP residuals — the single-pass backward reads the softmax
    statistics instead of recomputing them).
    ``image_grads=False`` (the train-step configuration — images are
    never differentiated) skips the d_src/d_tgt outputs and the automask
    adjoint inside the kernel.  d_log/d_sig are emitted in the INPUT
    dtype (bf16 in production), halving their HBM write+readback.
    ``with_disp`` consumes the expected-disparity cotangent too.
    """
    d_src, d_tgt, d_log, d_sig, d_shift = _bwd_call(
        src_t, target_t, _interleave_ls(logits_t, sigma_t), shift, mask,
        stats, rgb, g_rgb, g_nll, g_nla, g_disp, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical,
        image_grads=image_grads, with_disp=with_disp, gp_taps=gp_taps,
        packed_grads=False, with_auto=with_auto, nonneg=nonneg,
    )
    return (
        d_src,
        d_tgt,
        d_log.astype(logits_t.dtype),
        d_sig.astype(sigma_t.dtype),
        d_shift.astype(shift.dtype),
        jnp.zeros_like(mask),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "pad", "rows", "interpret", "n_vertical", "image_grads", "with_disp",
        "gp_taps", "with_auto", "nonneg",
    ),
)
def sweep_backward_packed(src_t, target_t, ls, shift, mask,
                          stats, rgb, g_rgb, g_nll, g_nla, g_disp=None,
                          pad: int = 0, rows: int = 8,
                          interpret: bool = False, n_vertical: int = 0,
                          image_grads: bool = True, with_disp: bool = False,
                          gp_taps: int = 0, with_auto: bool = True,
                          nonneg: bool = False):
    """:func:`sweep_backward` on the pre-interleaved head buffer ``ls``
    ``(B, 2N, H, W)``: the kernel emits ONE interleaved ``d_ls`` of the
    same shape (d_logits at 2n, d_sigma at 2n+1), so the production
    adjoint repack to the s2d decoder heads is a single transpose."""
    d_src, d_tgt, d_ls, d_shift = _bwd_call(
        src_t, target_t, ls, shift, mask, stats, rgb,
        g_rgb, g_nll, g_nla, g_disp,
        pad=pad, rows=rows, interpret=interpret, n_vertical=n_vertical,
        image_grads=image_grads, with_disp=with_disp, gp_taps=gp_taps,
        packed_grads=True, with_auto=with_auto, nonneg=nonneg,
    )
    return (
        d_src,
        d_tgt,
        d_ls.astype(ls.dtype),
        d_shift.astype(shift.dtype),
        jnp.zeros_like(mask),
    )


def _bwd_call(src_t, target_t, ls, shift, mask, stats, rgb,
              g_rgb, g_nll, g_nla, g_disp,
              *, pad, rows, interpret, n_vertical, image_grads, with_disp,
              gp_taps, packed_grads, pre_padded=False, with_auto=True,
              nonneg=False, with_mixture=True):
    assert pad > 0, "pad is required (>= max |shift| + 1)"
    B, _, H, W = target_t.shape
    cs = 2 if with_mixture else 1
    N = ls.shape[1] // cs
    R = rows
    pad, slack, lpad = _v1_geom(pad, gp_taps, nonneg)
    Wp = W + lpad + pad + slack
    WG = W + 2 * pad + slack
    shift = jnp.clip(shift, 0.0 if nonneg else -(pad - 2.0), pad - 2.0)

    if pre_padded:
        src_p, ls_p = src_t, ls
        assert ls_p.shape[-1] == Wp, (ls_p.shape, Wp)
    else:
        src_p = _pad_lr(src_t, lpad, pad + slack)
        ls_p = _pad_lr(ls, lpad, pad + slack)

    kernel = functools.partial(
        _bwd_kernel, n_planes=N, n_vertical=n_vertical, rows=R, width=W,
        pad=lpad, gpad=pad, image_grads=image_grads, with_disp=with_disp,
        gp_taps=gp_taps, packed_grads=packed_grads, with_auto=with_auto,
        with_mixture=with_mixture,
    )

    def vspec(shape_prefix, Wd):
        n = len(shape_prefix)
        return pl.BlockSpec(
            (None,) + shape_prefix + (Wd,),
            (lambda b, h: (b,) + (0,) * (n - 1) + (h, 0)),
            memory_space=pltpu.VMEM,
        )

    smem_spec = pl.BlockSpec((None, R, N), lambda b, h: (b, h, 0),
                             memory_space=pltpu.SMEM)

    img_specs = [vspec((3, R), W), vspec((3, R), W)] if image_grads else []
    img_shapes = (
        [jax.ShapeDtypeStruct((B, 3, H, W), F32)] * 2 if image_grads else []
    )
    row_in_spec = pl.BlockSpec((None, R, W), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM)
    ct_args = [stats, rgb, g_rgb, g_nll]
    ct_specs = [vspec((_n_stats(with_disp), R), W), vspec((3, R), W),
                vspec((3, R), W), row_in_spec]
    if with_auto:
        ct_args.append(g_nla)
        ct_specs.append(row_in_spec)
    if with_disp:
        ct_args.append(g_disp)
        ct_specs.append(row_in_spec)
    if packed_grads:
        head_specs = [vspec((2 * N, R), W)]                # d_ls interleaved
        head_shapes = [jax.ShapeDtypeStruct((B, 2 * N, H, W), ls.dtype)]
    elif not with_mixture:
        head_specs = [vspec((N, R), W)]                    # d_log only
        head_shapes = [jax.ShapeDtypeStruct((B, N, H, W), ls.dtype)]
    else:
        head_specs = [vspec((N, R), W), vspec((N, R), W)]  # d_log, d_sig
        head_shapes = [jax.ShapeDtypeStruct((B, N, H, W), ls.dtype)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=[
            smem_spec, smem_spec,
            vspec((3, R), Wp), vspec((3, R), W),
            vspec((cs * N, R), Wp),
        ] + ct_specs,
        out_specs=img_specs + head_specs + [
            vspec((N, R), 128),          # d_shift (broadcast lanes)
        ],
        out_shape=img_shapes + head_shapes + [
            jax.ShapeDtypeStruct((B, N, H, 128), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, R, WG), F32),      # reverse-window staging
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shift, mask, src_p, target_t, ls_p, *ct_args)

    if image_grads:
        d_src, d_tgt = outs[0].astype(src_t.dtype), outs[1].astype(
            target_t.dtype)
        outs = outs[2:]
    else:
        # target_t shape == UNPADDED src shape (src_t may be the padded
        # pre_padded residual)
        d_src = jnp.zeros(target_t.shape, src_t.dtype)
        d_tgt = jnp.zeros_like(target_t)
    *head_grads, d_shift_b = outs
    d_shift = jnp.moveaxis(d_shift_b[..., 0], 1, -1)       # (B, H, N)
    return (d_src, d_tgt, *head_grads, d_shift)


# ---------------------------------------------------------------------------
# Differentiable XLA oracle (for tests) and hand-derived adjoint
# ---------------------------------------------------------------------------

def _sample_taps(shift_row, W):
    """(k, f, v0, v1) for x + shift, per row: k (B,H) int, f (B,H)."""
    pos0 = shift_row                                      # row-constant
    k = jnp.floor(pos0)
    f = (pos0 - k).astype(F32)
    return k.astype(jnp.int32), f


def _shift_gather(maps, k, f, W):
    """maps (B, C, H, W) sampled at x + k + f with zeros padding.

    k (B, H) int32 row shifts, f (B, H) fracs (row-constant).
    """
    xs = jnp.arange(W, dtype=jnp.int32)
    idx = xs[None, None, :] + k[:, :, None]               # (B, H, W)
    v0 = (idx >= 0) & (idx <= W - 1)
    v1 = (idx + 1 >= 0) & (idx + 1 <= W - 1)

    def tap(i, valid, w):                                  # w: (B, H)
        g = jnp.take_along_axis(
            maps,
            jnp.clip(i, 0, W - 1)[:, None].repeat(maps.shape[1], 1),
            axis=-1,
        ).astype(F32)
        return jnp.where(valid[:, None], w[:, None, :, None] * g, 0.0)

    return tap(idx, v0, 1.0 - f) + tap(idx + 1, v1, f)


def oracle_dense(src_t, target_t, logits_t, sigma_t, shift, mask):
    """Differentiable dense reference of the fused op (small shapes only).

    Matches the kernel bit-for-bit up to fp reassociation; the automask
    branch stops pi/sigma gradients exactly as the reference detaches them
    (trainer.py:733).
    """
    B, _, H, W = src_t.shape
    N = logits_t.shape[1]

    l_list, s_list, c_list = [], [], []
    for n in range(N):
        k, f = _sample_taps(shift[:, :, n], W)
        m = mask[:, :, n][:, None, :, None]
        l_list.append((_shift_gather(jax.lax.dynamic_slice_in_dim(logits_t, n, 1, 1), k, f, W) * m)[:, 0])
        s_list.append(jnp.clip(
            (_shift_gather(jax.lax.dynamic_slice_in_dim(sigma_t, n, 1, 1), k, f, W) * m)[:, 0],
            0.01, 1.0,
        ))
        c_list.append(_shift_gather(src_t, k, f, W) * m)
    l = jnp.stack(l_list, 1)                              # (B,N,H,W)
    s = jnp.stack(s_list, 1)
    c = jnp.stack(c_list, 1)                              # (B,N,3,H,W)

    lse = jax.scipy.special.logsumexp(l, axis=1)
    pi = jnp.exp(l - lse[:, None])
    u = pi / s
    U = u.sum(1)
    inv_u = jnp.where(U > 1e-7, 1.0 / jnp.maximum(U, 1e-7), 0.0)
    wgt = u * inv_u[:, None]

    tgt = target_t.astype(F32)
    rgb = (wgt[:, :, None] * c).sum(1)                    # (B,3,H,W)
    e = jnp.abs(c - tgt[:, None]).sum(2) / 3.0            # (B,N,H,W)
    lap = 0.5 * jnp.exp(-e / s) / s
    M = (pi * lap).sum(1)
    e_auto = jnp.abs(src_t.astype(F32) - tgt).sum(1) / 3.0
    # reference detaches ONLY sigma/pi in the automask NLL (trainer.py:733);
    # the identity-reprojection error itself keeps its gradient
    sg = jax.lax.stop_gradient(s)
    lap_a = 0.5 * jnp.exp(-e_auto[:, None] / sg) / sg
    Ma = (jax.lax.stop_gradient(pi) * lap_a).sum(1)
    nll = -jnp.log(jnp.maximum(M, 0.0) + 1e-7)
    nlla = -jnp.log(jnp.maximum(Ma, 0.0) + 1e-7)
    return rgb, nll, nlla


def oracle_disp_center(logits_t, sigma_t, shift, mask):
    """Differentiable XLA reference of the fused CENTER disp head:
    softmax + mixture reweight + contraction at shift 0 (the
    ops/pallas_disp.py semantics; ``shift`` provides the per-plane row
    disparities)."""
    m_t = jnp.moveaxis(mask, -1, 1)[..., None].astype(F32)    # (B,N,H,1)
    d_t = jnp.moveaxis(shift, -1, 1)[..., None].astype(F32)
    lm = logits_t.astype(F32) * m_t
    p = jax.nn.softmax(lm, axis=1)
    s = jnp.clip(sigma_t.astype(F32), 0.01, 1.0)
    u = p * m_t / s
    U = u.sum(1)
    D = (u * d_t).sum(1)
    return jnp.where(U > 1e-7, D / jnp.maximum(U, 1e-7), 0.0)


def _adjoint_shift(g, k, f, W):
    """Adjoint of the row-constant 2-tap gather: scatter-free back-shift.

    g (B, C, H, W) cotangent of the SAMPLED values; returns the cotangent
    of the source maps: dM[u] = (1-f)*g[u-k] + f*g[u-k-1] with bounds.
    """
    xs = jnp.arange(W, dtype=jnp.int32)
    xb = xs[None, None, :] - k[:, :, None]                # u - k
    v0 = (xb >= 0) & (xb <= W - 1)
    v1 = (xb - 1 >= 0) & (xb - 1 <= W - 1)

    def tap(i, valid, w):
        gg = jnp.take_along_axis(
            g, jnp.clip(i, 0, W - 1)[:, None].repeat(g.shape[1], 1),
            axis=-1,
        )
        return jnp.where(valid[:, None], w[:, None, :, None] * gg, 0.0)

    return tap(xb, v0, 1.0 - f) + tap(xb - 1, v1, f)


def _sweep_bwd(src_t, target_t, logits_t, sigma_t, shift, mask, cts):
    """Hand-derived VJP of the fused plane sweep.

    Written as plane scans with explicit adjoint accumulation — no autodiff
    through the scans, so nothing per-plane is saved: peak memory is the
    gradients themselves plus O(B·H·W) temporaries.
    """
    G, gN, gA = [x.astype(F32) for x in cts]              # rgb, nll, nll_auto
    B, _, H, W = src_t.shape
    N = logits_t.shape[1]
    tgt = target_t.astype(F32)
    e_auto = jnp.abs(src_t.astype(F32) - tgt).sum(1) / 3.0

    def plane_terms(n):
        k, f = _sample_taps(shift[:, :, n], W)
        m = mask[:, :, n][:, None, :, None]
        l_raw = _shift_gather(jax.lax.dynamic_slice_in_dim(logits_t, n, 1, 1), k, f, W)[:, 0]
        s_raw = _shift_gather(jax.lax.dynamic_slice_in_dim(sigma_t, n, 1, 1), k, f, W)[:, 0]
        m2 = m[:, 0]
        l_n = l_raw * m2
        s_pre = s_raw * m2
        s_n = jnp.clip(s_pre, 0.01, 1.0)
        c_n = _shift_gather(src_t, k, f, W) * m
        return k, f, m2, l_n, s_pre, s_n, c_n

    # ---- recompute normalizers (cheap scans, no grad) ----------------------
    def lse_body(carry, n):
        m_run, s_run = carry
        _, _, _, l_n, _, _, _ = plane_terms(n)
        m_new = jnp.maximum(m_run, l_n)
        return (m_new, s_run * jnp.exp(m_run - m_new)
                + jnp.exp(l_n - m_new)), None

    (m_run, s_run), _ = jax.lax.scan(
        lse_body,
        (jnp.full((B, H, W), -1e30, F32), jnp.zeros((B, H, W), F32)),
        jnp.arange(N),
    )
    lse = m_run + jnp.log(s_run)

    def nrm_body(carry, n):
        U, M, Ma = carry
        _, _, _, l_n, _, s_n, c_n = plane_terms(n)
        pi_n = jnp.exp(l_n - lse)
        e_n = jnp.abs(c_n - tgt).sum(1) / 3.0
        U = U + pi_n / s_n
        M = M + pi_n * 0.5 * jnp.exp(-e_n / s_n) / s_n
        Ma = Ma + pi_n * 0.5 * jnp.exp(-e_auto / s_n) / s_n
        return (U, M, Ma), None

    (U, M, Ma), _ = jax.lax.scan(
        nrm_body,
        (jnp.zeros((B, H, W), F32),) * 3,
        jnp.arange(N),
    )
    inv_u = jnp.where(U > 1e-7, 1.0 / jnp.maximum(U, 1e-7), 0.0)
    dM = -gN * (M > 0) / (jnp.maximum(M, 0.0) + 1e-7)
    dMa = -gA * (Ma > 0) / (jnp.maximum(Ma, 0.0) + 1e-7)

    # ---- global couplings: A = sum dwgt*u, S = sum dpi*pi ------------------
    def glob_body(carry, n):
        A, S, dEa = carry
        _, _, _, l_n, _, s_n, c_n = plane_terms(n)
        pi_n = jnp.exp(l_n - lse)
        u_n = pi_n / s_n
        dwgt_n = (G * c_n).sum(1)
        A = A + dwgt_n * u_n
        e_n = jnp.abs(c_n - tgt).sum(1) / 3.0
        lap_n = 0.5 * jnp.exp(-e_n / s_n) / s_n
        lapa_n = 0.5 * jnp.exp(-e_auto / s_n) / s_n
        # dpi (before the softmax projection); dU folded in after the scan
        dpi_partial = dwgt_n * inv_u / s_n + dM * lap_n
        S = S + dpi_partial * pi_n
        dEa = dEa + dMa * pi_n * lapa_n * (-1.0 / s_n)
        return (A, S, dEa), None

    (A, S_partial, dEa), _ = jax.lax.scan(
        glob_body, (jnp.zeros((B, H, W), F32),) * 3, jnp.arange(N)
    )
    dU = -(inv_u**2) * A * (U > 1e-7)
    # dU enters every dpi_n via du_n = ... + dU, i.e. dpi_n += dU / s_n.
    # fold its pi-weighted sum into S:  S += sum_n (dU/s_n) * pi_n = dU * U
    S = S_partial + dU * U

    # ---- per-plane gradient emission ---------------------------------------
    def grad_body(carry, n):
        d_src, d_tgt, d_shift_cols = carry
        k, f, m2, l_n, s_pre, s_n, c_n = plane_terms(n)
        pi_n = jnp.exp(l_n - lse)
        u_n = pi_n / s_n
        wgt_n = u_n * inv_u
        e_n = jnp.abs(c_n - tgt).sum(1) / 3.0
        lap_n = 0.5 * jnp.exp(-e_n / s_n) / s_n
        lapa_n = 0.5 * jnp.exp(-e_auto / s_n) / s_n
        dwgt_n = (G * c_n).sum(1)

        du_n = dwgt_n * inv_u + dU
        dpi_n = du_n / s_n + dM * lap_n
        dl_n = pi_n * (dpi_n - S)

        dlap_n = dM * pi_n
        de_n = dlap_n * lap_n * (-1.0 / s_n)
        ds_n = (
            -du_n * pi_n / (s_n**2)
            + dlap_n * lap_n * (e_n - s_n) / (s_n**2)
            # NOTE: no automask term — pi/sigma are detached there
        )
        # clamp pass-through, then unmask
        in_range = (s_pre > 0.01) & (s_pre < 1.0)
        db_n = ds_n * in_range * m2
        da_n = dl_n * m2

        sgn = jnp.sign(c_n - tgt)                          # (B,3,H,W)
        dc_n = G * wgt_n[:, None] + sgn * (de_n / 3.0)[:, None]
        d_tgt = d_tgt - sgn * (de_n / 3.0)[:, None]
        dci_n = dc_n * m2[:, None]

        # adjoint shifts back into the source buffers
        d_log_n = _adjoint_shift(da_n[:, None], k, f, W)[:, 0]
        d_sig_n = _adjoint_shift(db_n[:, None], k, f, W)[:, 0]
        d_src = d_src + _adjoint_shift(dci_n, k, f, W)

        # d shift: g * (ref[x+k+1] - ref[x+k]) summed over x (and channels)
        def fwd_diff(maps):
            x1 = _shift_gather_int(maps, k + 1, W)
            x0 = _shift_gather_int(maps, k, W)
            return x1 - x0

        dshift_n = (
            (da_n[:, None] * fwd_diff(jax.lax.dynamic_slice_in_dim(logits_t, n, 1, 1)) * m2[:, None])
            .sum((1, 3))
            + (db_n[:, None] * fwd_diff(jax.lax.dynamic_slice_in_dim(sigma_t, n, 1, 1)) * m2[:, None])
            .sum((1, 3))
            + (dci_n * fwd_diff(src_t)).sum((1, 3))
        )                                                  # (B, H)
        return (d_src, d_tgt, d_shift_cols), (d_log_n, d_sig_n, dshift_n)

    (d_src, d_tgt, _), (d_log_stack, d_sig_stack, d_shift_stack) = (
        jax.lax.scan(
            grad_body,
            (jnp.zeros((B, 3, H, W), F32), jnp.zeros((B, 3, H, W), F32),
             jnp.zeros((B, H), F32)),
            jnp.arange(N),
        )
    )
    # the automask error term reaches src (at x) and target directly
    sgn_a = jnp.sign(src_t.astype(F32) - tgt)
    d_src = d_src + sgn_a * (dEa / 3.0)[:, None]
    d_tgt = d_tgt - sgn_a * (dEa / 3.0)[:, None]

    d_log = jnp.moveaxis(d_log_stack, 0, 1)                # (B,N,H,W)
    d_sig = jnp.moveaxis(d_sig_stack, 0, 1)
    d_shift = jnp.moveaxis(d_shift_stack, 0, 2)            # (B,H,N)
    return (
        d_src.astype(src_t.dtype),
        d_tgt.astype(target_t.dtype),
        d_log.astype(logits_t.dtype),
        d_sig.astype(sigma_t.dtype),
        d_shift.astype(shift.dtype),
        jnp.zeros_like(mask),
    )


def _shift_gather_int(maps, k, W):
    """maps (B, C, H, W) at integer offsets x + k with zeros padding."""
    xs = jnp.arange(W, dtype=jnp.int32)
    idx = xs[None, None, :] + k[:, :, None]
    valid = (idx >= 0) & (idx <= W - 1)
    g = jnp.take_along_axis(
        maps, jnp.clip(idx, 0, W - 1)[:, None].repeat(maps.shape[1], 1),
        axis=-1,
    ).astype(F32)
    return jnp.where(valid[:, None], g, 0.0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_plane_sweep(src_t, target_t, logits_t, sigma_t, shift, mask,
                      pad: int, interpret: bool = False,
                      n_vertical: int = 0, image_grads: bool = True,
                      with_disp: bool = False, rows: int = 8,
                      gp_taps: int = 0, with_auto: bool = True,
                      nonneg: bool = False):
    """Fused plane-sweep: Pallas forward + hand-derived scatter-free VJP.

    The automask NLL treats pi/sigma as constants by definition (reference
    trainer.py:733) — the adjoint honors that.  ``image_grads=False``
    returns ZERO cotangents for src/tgt (the train step never
    differentiates the batch images) and skips their computation.
    ``with_disp`` appends the fused expected-disparity head output
    (center samples; ``shift`` doubles as the plane disparities).
    """
    return sweep_forward(src_t, target_t, logits_t, sigma_t, shift, mask,
                         pad=pad, rows=rows, interpret=interpret,
                         n_vertical=n_vertical, with_disp=with_disp,
                         gp_taps=gp_taps, with_auto=with_auto,
                         nonneg=nonneg)


def _fps_fwd(src_t, target_t, logits_t, sigma_t, shift, mask, pad,
             interpret, n_vertical, image_grads, with_disp, rows, gp_taps,
             with_auto, nonneg):
    # pad ONCE: the padded operands are saved as residuals so the
    # backward never re-materializes the ls/src halo buffers
    padr, slack, lpad = _v1_geom(pad, gp_taps, nonneg)
    src_p = _pad_lr(src_t, lpad, padr + slack)
    ls_p = _pad_lr(_interleave_ls(logits_t, sigma_t), lpad, padr + slack)
    out = _fwd_call(src_p, target_t, ls_p, shift, mask,
                    pad=pad, rows=rows, interpret=interpret,
                    n_vertical=n_vertical, with_disp=with_disp,
                    gp_taps=gp_taps, with_stats=True, pre_padded=True,
                    with_auto=with_auto, nonneg=nonneg)
    out, stats = tuple(out[:-1]), out[-1]
    # zero-size dtype carriers: d_log/d_sig must match the (possibly
    # mixed) primal dtypes, not the interleave-promoted ls dtype
    l0 = jnp.zeros((), logits_t.dtype)
    s0 = jnp.zeros((), sigma_t.dtype)
    return out, (src_p, target_t, ls_p, shift, mask, stats, out[0], l0, s0)


def _fps_bwd(pad, interpret, n_vertical, image_grads, with_disp, rows,
             gp_taps, with_auto, nonneg, res, cts):
    src_p, target_t, ls_p, shift, mask, stats, rgb, l0, s0 = res
    ldt, sdt = l0.dtype, s0.dtype
    cts = [x.astype(F32) for x in cts]
    di = 3 if with_auto else 2
    g_disp = cts[di] if with_disp else None
    d_src, d_tgt, d_log, d_sig, d_shift = _bwd_call(
        src_p, target_t, ls_p, shift, mask, stats, rgb,
        cts[0], cts[1], cts[2] if with_auto else None, g_disp,
        pad=pad, rows=rows, interpret=interpret,
        n_vertical=n_vertical, image_grads=image_grads, with_disp=with_disp,
        gp_taps=gp_taps, packed_grads=False, pre_padded=True,
        with_auto=with_auto, nonneg=nonneg,
    )
    return (d_src, d_tgt, d_log.astype(ldt), d_sig.astype(sdt),
            d_shift.astype(shift.dtype), jnp.zeros_like(mask))


fused_plane_sweep.defvjp(_fps_fwd, _fps_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def fused_plane_sweep_packed(src_t, target_t, ls, shift, mask,
                             pad: int, interpret: bool = False,
                             n_vertical: int = 0, image_grads: bool = True,
                             with_disp: bool = False, rows: int = 8,
                             gp_taps: int = 0, with_auto: bool = True,
                             nonneg: bool = False):
    """:func:`fused_plane_sweep` on a PRE-INTERLEAVED head buffer ``ls``
    ``(B, 2N, H, W)`` (logits at 2n, sigma at 2n+1).

    The s2d production path: the decoder's merged head conv emits the
    interleaved channels directly (models/depth_decoder.py), so the two
    plane-first transposes + the stack/interleave copy — and their
    adjoints — collapse to ONE transpose each way.  The VJP returns the
    interleaved ``d_ls`` cotangent of the same shape.
    """
    return sweep_forward_packed(
        src_t, target_t, ls, shift, mask, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical, with_disp=with_disp,
        gp_taps=gp_taps, with_auto=with_auto, nonneg=nonneg,
    )


def _fpsp_fwd(src_t, target_t, ls, shift, mask, pad, interpret, n_vertical,
              image_grads, with_disp, rows, gp_taps, with_auto, nonneg):
    # pad ONCE (see _fps_fwd)
    padr, slack, lpad = _v1_geom(pad, gp_taps, nonneg)
    src_p = _pad_lr(src_t, lpad, padr + slack)
    ls_p = _pad_lr(ls, lpad, padr + slack)
    out = _fwd_call(src_p, target_t, ls_p, shift, mask,
                    pad=pad, rows=rows, interpret=interpret,
                    n_vertical=n_vertical, with_disp=with_disp,
                    gp_taps=gp_taps, with_stats=True, pre_padded=True,
                    with_auto=with_auto, nonneg=nonneg)
    out, stats = tuple(out[:-1]), out[-1]
    return out, (src_p, target_t, ls_p, shift, mask, stats, out[0])


def _fpsp_bwd(pad, interpret, n_vertical, image_grads, with_disp, rows,
              gp_taps, with_auto, nonneg, res, cts):
    src_p, target_t, ls_p, shift, mask, stats, rgb = res
    cts = [x.astype(F32) for x in cts]
    di = 3 if with_auto else 2
    g_disp = cts[di] if with_disp else None
    d_src, d_tgt, d_ls, d_shift = _bwd_call(
        src_p, target_t, ls_p, shift, mask, stats, rgb,
        cts[0], cts[1], cts[2] if with_auto else None, g_disp,
        pad=pad, rows=rows, interpret=interpret, n_vertical=n_vertical,
        image_grads=image_grads, with_disp=with_disp, gp_taps=gp_taps,
        packed_grads=True, pre_padded=True, with_auto=with_auto,
        nonneg=nonneg,
    )
    return (d_src, d_tgt, d_ls.astype(ls_p.dtype),
            d_shift.astype(shift.dtype), jnp.zeros_like(mask))


fused_plane_sweep_packed.defvjp(_fpsp_fwd, _fpsp_bwd)


# ---------------------------------------------------------------------------
# No-mixture (softmax-composite) variant: FalNet / use_mixture_loss=False
# ---------------------------------------------------------------------------

def oracle_softmax(src_t, target_t, logits_t, shift, mask):
    """Differentiable dense reference of the NO-MIXTURE sweep.

    Softmax compositing over the warped masked logits (reference
    fal_net.py:199-205; trainer.py:593,603 with use_mixture_loss off)
    plus the center expected-disparity head (softmax over the center
    logits, no mask/sigma re-weighting — depth_decoder.py's no-mixture
    disp contraction).  Returns (rgb (B,3,H,W), disp (B,H,W))."""
    B, _, H, W = src_t.shape
    N = logits_t.shape[1]
    l_list, c_list = [], []
    for n in range(N):
        k, f = _sample_taps(shift[:, :, n], W)
        m = mask[:, :, n][:, None, :, None]
        l_list.append(
            (_shift_gather(
                jax.lax.dynamic_slice_in_dim(logits_t, n, 1, 1), k, f, W
            ) * m)[:, 0]
        )
        c_list.append(_shift_gather(src_t, k, f, W) * m)
    l = jnp.stack(l_list, 1)                              # (B,N,H,W)
    c = jnp.stack(c_list, 1)                              # (B,N,3,H,W)
    p = jax.nn.softmax(l, axis=1)
    rgb = (p[:, :, None] * c).sum(1)
    lc = logits_t.astype(F32) * jnp.moveaxis(mask, -1, 1)[..., None]
    pc = jax.nn.softmax(lc, axis=1)
    disp = (pc * jnp.moveaxis(shift, -1, 1)[..., None].astype(F32)).sum(1)
    return rgb, disp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_plane_sweep_nomix(src_t, target_t, logits_t, shift, mask,
                            pad: int, interpret: bool = False,
                            n_vertical: int = 0, with_disp: bool = False,
                            rows: int = 8, gp_taps: int = 0,
                            nonneg: bool = False):
    """No-mixture fused plane sweep: LOGITS-ONLY operand, sigma == 1.

    The composite weight e_n / s_n degenerates to the softmax weight, so
    the rgb output is exactly the reference's softmax composite
    (fal_net.py:199-205) — including at image borders, where warping an
    all-ones sigma tensor through the zeros padding would NOT stay 1.
    The L1 photometric (and automask) is assembled by the caller from the
    composite; the nll output (b=1 Laplacian) is emitted only to share
    the kernel plumbing and carries no cotangent in training.  Images are
    never differentiated (the train-step configuration): their cotangents
    return zero.

    Returns (rgb (B,3,H,W) input-dtype, nll (B,H,W) f32 [, disp]).
    """
    return _fwd_call(
        src_t, target_t, logits_t, shift, mask, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical, with_disp=with_disp,
        gp_taps=gp_taps, with_auto=False, nonneg=nonneg, with_mixture=False,
    )


def _fpsn_fwd(src_t, target_t, logits_t, shift, mask, pad, interpret,
              n_vertical, with_disp, rows, gp_taps, nonneg):
    padr, slack, lpad = _v1_geom(pad, gp_taps, nonneg)
    src_p = _pad_lr(src_t, lpad, padr + slack)
    l_p = _pad_lr(logits_t, lpad, padr + slack)
    out = _fwd_call(src_p, target_t, l_p, shift, mask,
                    pad=pad, rows=rows, interpret=interpret,
                    n_vertical=n_vertical, with_disp=with_disp,
                    gp_taps=gp_taps, with_stats=True, pre_padded=True,
                    with_auto=False, nonneg=nonneg, with_mixture=False)
    out, stats = tuple(out[:-1]), out[-1]
    return out, (src_p, target_t, l_p, shift, mask, stats, out[0])


def _fpsn_bwd(pad, interpret, n_vertical, with_disp, rows, gp_taps,
              nonneg, res, cts):
    src_p, target_t, l_p, shift, mask, stats, rgb = res
    cts = [x.astype(F32) for x in cts]
    g_disp = cts[2] if with_disp else None
    d_src, d_tgt, d_log, d_shift = _bwd_call(
        src_p, target_t, l_p, shift, mask, stats, rgb,
        cts[0], cts[1], None, g_disp,
        pad=pad, rows=rows, interpret=interpret, n_vertical=n_vertical,
        image_grads=False, with_disp=with_disp, gp_taps=gp_taps,
        packed_grads=False, pre_padded=True, with_auto=False,
        nonneg=nonneg, with_mixture=False,
    )
    return (d_src, d_tgt, d_log.astype(l_p.dtype),
            d_shift.astype(shift.dtype), jnp.zeros_like(mask))


fused_plane_sweep_nomix.defvjp(_fpsn_fwd, _fpsn_bwd)
