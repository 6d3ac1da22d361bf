"""Phase-split ("quad") fused plane-sweep kernel: the s2d-native variant.

The production decoder tail is space-to-depth packed (models/s2d.py): its
merged head conv emits ``ls_s2d (B, H/2, W/2, 4*2N)`` with channels ordered
``(py, px, j)`` — row phase, column phase, interleaved logits/sigma.  The
v1 kernel (ops/pallas_sweep.py) wants plane-first full-res ``(B, 2N, H, W)``
rows, and XLA lowers that 6-D repack into THREE ~1 GB relayout copies each
way (+ the zero-pad): ~37 ms/step at the production HR batch — the single
largest data-formatting block left in the r3 trace.

This kernel removes the repack by computing IN the phase domain:

  * ``ls`` enters as ``(B, 4*2N, H/2, W/2+pads)`` — one channels-to-front
    relayout copy of the s2d tensor (plus the W zero-pad), nothing else;
  * images enter space-to-depth packed ``(B, 12, H/2, W/2+pads)``
    (channel order ``(py, px, rgb)``);
  * every per-pixel quantity lives as ``(4, Rq, W/2)`` with the leading
    axis ``ph = 2*py + px`` and ``Rq = rows/2`` half-res row blocks;
  * outputs (rgb / nll / nll_auto / disp) come back phase-split; the
    step d2s-repacks only the small consumers (rgb 24 MB for the
    perceptual net, disp 16 MB for smoothness/distill).

Sampling decomposes exactly: a horizontal warp by ``k = shift`` at output
column ``w = 2x + px`` reads source column ``2x + px + ki`` (+1 for the
second tap), i.e. source PHASE ``(px + ki) % 2`` at half-column
``x + (px + ki) // 2``.  With ``a = ki % 2``, ``hA = ki // 2``,
``hB = (ki+1) // 2``, BOTH output phases' 2-tap interpolations come from
two half-width windows per row phase — phase ``a`` anchored at ``hA``
(taps hA, hA+1) and phase ``1-a`` anchored at ``hB``:

    out[px=0] = (1-f) * winA[0:W2] + f * winB[0:W2]
    out[px=1] = (1-f) * winB[0:W2] + f * winA[1:W2+1]

— the same VMEM window traffic per full-res row as v1 (one roll per
source phase vs one double-width roll).  The ground-plane (row-varying
shift) path ports v1's static-taps machinery: per-row one-hot weights are
remapped onto (source-phase, half-tap) indices with two scalar parity
selects (``a`` is dynamic, the tap grid is static).

The backward mirrors v1's scatter-free reverse-window emission per source
phase; ``d_ls`` is emitted directly in the quad layout, so the adjoint
repack is again one relayout copy.

Scope: the production train-step configuration only —
``image_grads=False`` (batch images are never differentiated), packed
interleaved heads, ``gp_taps > 0`` whenever ground planes exist.  Every
other configuration stays on the v1 kernels.  Parity:
tests/test_pallas_sweep_quad.py (interpret mode vs the v1 kernel, which
is itself oracle-tested).

Reference semantics covered (same as v1): /root/reference/trainer.py
523-603 (plane-sweep view synthesis) + 728-736 (mixture NLL + automask).
"""
from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planedepth_tpu.ops.pallas_sweep import _online_e, _pad_lr

F32 = jnp.float32
I32 = jnp.int32


def _quad_pad(pad: int, gp_taps: int) -> int:
    """Half-domain W padding, 128-aligned (static center slices at
    ``pl.ds(pad2, W2)`` require lane-aligned starts), with room for the
    ground-plane static tap grid."""
    jt = (gp_taps + 3) // 2 if gp_taps else 0
    return (((pad + 1) // 2 + jt + 2 + 127) // 128) * 128


def _quad_lpad(pad2: int, nonneg: bool) -> int:
    """HBM left padding of the kernel operands.  Production shifts are
    nonnegative disparities (train/step.py fused_stereo_losses: target
    'r' reads source at x + disp), so every sampling window starts at
    offset >= 0 and a left halo would never be read — ``nonneg`` drops
    it (~20% of the padded ls buffer).  Signed mode keeps the symmetric
    pad."""
    return 0 if nonneg else pad2


def _mk_q(shift_ref, mask_ref, src_ref, ls_ref, Rq, W2, pad2, n2, gp_taps):
    """In-kernel phase-domain sampling helpers.

    ``n2 = 2N``: interleaved (logit, sigma) channels per (py, px) phase;
    ls first-axis index of (py, source-phase p, plane n, head q) is
    ``py*2*n2 + p*n2 + 2*n + q``; src first-axis of (py, p, rgb c) is
    ``py*6 + p*3 + c``.  All returned per-plane arrays are (4, Rq, W2)
    (colors (4, 3, Rq, W2)) with ph = 2*py + px.
    """
    WQ = W2 + 128
    WT = W2 + 256                    # ground-plane taps window
    S = gp_taps
    JT = (S + 3) // 2                # static half-tap bound (gp path)

    def roll_w(ref_slice, start, width):
        q = pl.multiple_of((start // 128) * 128, 128)
        win = ref_slice(q, width).astype(F32)
        return pltpu.roll(win, (width - (start - q)) % width, axis=2)

    def ls_win(py, p, n, start, width=WQ):
        return roll_w(
            lambda q, w: ls_ref[
                pl.ds(py * 2 * n2 + p * n2 + 2 * n, 2), :, pl.ds(q, w)
            ],
            start, width,
        )

    def c_win(py, p, start, width=WQ):
        return roll_w(
            lambda q, w: src_ref[pl.ds(py * 6 + p * 3, 3), :, pl.ds(q, w)],
            start, width,
        )

    def k_f(n):
        """Row-constant (vertical-plane) integer/fractional split."""
        s = shift_ref[0, 0, n]
        k = jnp.floor(s)
        ki = k.astype(I32)
        return ki, (s - k).astype(F32), ki - 2 * (ki // 2)   # a = ki % 2

    def col(ref, py, n):
        return jnp.stack(
            [ref[py, r, n] for r in range(Rq)]
        ).reshape(1, Rq, 1)

    def row4(ref, n):
        """(4, Rq, 1) per-phase row column of plane n (ph = 2*py + px:
        both px phases share their py row's value)."""
        c0, c1 = col(ref, 0, n), col(ref, 1, n)
        return jnp.concatenate([c0, c0, c1, c1], 0)

    def mask4(n):
        return row4(mask_ref, n)

    # ---- vertical planes: row-constant shift, 2 half-windows per py -------
    # Phase axis placement: ls taps are (2, Rq, W2) (interleaved l/s
    # first) and stack phases at axis=1 -> (2, 4, Rq, W2); color taps are
    # (3, Rq, W2) and stack phases at axis=0 -> (4, 3, Rq, W2).
    def _win_vec(win_fn, n):
        ki, f, a = k_f(n)
        hA = ki // 2
        hB = (ki + 1) // 2
        taps_py = []
        for py in (0, 1):
            wA = win_fn(py, a, pad2 + hA)
            wB = win_fn(py, 1 - a, pad2 + hB)
            taps_py.append((wA[:, :, :W2], wB[:, :, :W2],
                            wB[:, :, :W2], wA[:, :, 1 : W2 + 1]))
        return taps_py, f

    def _interp_stack(taps_py, f, axis):
        phases = []
        for t0a, t1a, t0b, t1b in taps_py:
            phases.append((1.0 - f) * t0a + f * t1a)       # px = 0
            phases.append((1.0 - f) * t0b + f * t1b)       # px = 1
        return jnp.stack(phases, axis=axis)

    def _diff_stack(taps_py, axis):
        phases = []
        for t0a, t1a, t0b, t1b in taps_py:
            phases.append(t1a - t0a)
            phases.append(t1b - t0b)
        return jnp.stack(phases, axis=axis)

    def _ls_win_vec(n):
        return _win_vec(lambda py, p, start: ls_win(py, p, n, start), n)

    def _c_win_vec(n):
        return _win_vec(c_win, n)

    def _ls_split(ls4, m4):
        """(2, 4, Rq, W2) interleaved -> masked l, clipped s."""
        l = ls4[0] * m4
        s = jnp.clip(ls4[1] * m4, 0.01, 1.0)
        return l, s

    def sample_ls_vec(n):
        taps_py, f = _ls_win_vec(n)
        return _ls_split(_interp_stack(taps_py, f, 1), mask4(n))

    def sample_c_vec(n):
        taps_py, f = _c_win_vec(n)
        return _interp_stack(taps_py, f, 0) * mask4(n)[:, None]

    def sample_lsd_vec(n):
        taps_py, f = _ls_win_vec(n)
        m4 = mask4(n)
        l, s = _ls_split(_interp_stack(taps_py, f, 1), m4)
        d = _diff_stack(taps_py, 1) * m4
        return l, s, d[0], d[1]

    def sample_cd_vec(n):
        taps_py, f = _c_win_vec(n)
        m4 = mask4(n)[:, None]
        return (_interp_stack(taps_py, f, 0) * m4,
                _diff_stack(taps_py, 0) * m4)

    # ---- ground planes: per-row shifts via static half-tap grids ----------
    # Anchor at hb = kmin // 2 per py; source phase p's static tap j covers
    # full-column offset 2*(hb + j) + p.  The per-row interp weight at
    # full-column offset kmin + t (t = delta_r + tap) is v1's tap_w list
    # WL[t]; output phase px needs offset px + ki_r + tap, i.e. the tap
    # (p, j) weight is WL[2j + p - px - a] with a = kmin % 2 — a 2-way
    # scalar parity select over the static grid.
    def k_extreme(py, n):
        k0 = jnp.floor(shift_ref[py, 0, n])
        kmin = kmax = k0
        for r in range(1, Rq):
            kr = jnp.floor(shift_ref[py, r, n])
            kmin = jnp.minimum(kmin, kr)
            kmax = jnp.maximum(kmax, kr)
        return kmin, kmax

    def row_onehots(py, n, base):
        s_vec = col(shift_ref, py, n)[0]               # (Rq, 1)
        k_vec = jnp.floor(s_vec)
        f_vec = s_vec - k_vec
        d_vec = jnp.clip(k_vec - base, 0.0, float(S))
        eq = [(d_vec == float(j)).astype(F32) for j in range(S + 1)]
        return f_vec, eq

    def tap_w(f_vec, eq):
        """WL[t], t in 0..S+1: (1-f) eq[t] + f eq[t-1]."""
        one_m_f = 1.0 - f_vec
        w = []
        for t in range(S + 2):
            wt = one_m_f * eq[t] if t <= S else 0.0
            if t >= 1:
                wt = wt + f_vec * eq[t - 1]
            w.append(wt)
        return w

    def tap_d(eq):
        """TD[t]: picks tap(delta+1) - tap(delta)."""
        d = []
        for t in range(S + 2):
            dt = eq[t - 1] if t >= 1 else 0.0
            if t <= S:
                dt = dt - eq[t]
            d.append(dt)
        return d

    def _get(WL, i):
        return WL[i] if 0 <= i < len(WL) else None

    def q_tap_w(WL, sel0, sel1, px):
        """w[p][j] on the static (p, j) grid from the full-column list WL
        (entries (Rq, 1) or None), parity-selected by a = kmin % 2."""
        w = [[None] * (JT + 1) for _ in range(2)]
        for p in (0, 1):
            for j in range(JT + 1):
                w0 = _get(WL, 2 * j + p - px)          # a == 0
                w1 = _get(WL, 2 * j + p - px - 1)      # a == 1
                if w0 is None and w1 is None:
                    continue
                if w0 is None:
                    w[p][j] = sel1 * w1
                elif w1 is None:
                    w[p][j] = sel0 * w0
                else:
                    w[p][j] = sel0 * w0 + sel1 * w1
        return w

    def _gp_combine(rolls, w_px):
        """rolls[p] (C, Rq, WT); w_px[px][p][j] -> [(C, Rq, W2)] per px."""
        outs = []
        for w in w_px:                                  # per px
            acc = None
            for p in (0, 1):
                for j in range(JT + 1):
                    if w[p][j] is None:
                        continue
                    term = rolls[p][:, :, j : j + W2] * w[p][j]
                    acc = term if acc is None else acc + term
            outs.append(acc)
        return outs

    def _gp_prologue(py, n):
        kmin, _ = k_extreme(py, n)
        a = kmin - 2.0 * jnp.floor(kmin / 2.0)          # parity, f32
        sel0 = (a == 0.0).astype(F32)
        hb = jnp.floor(kmin / 2.0).astype(I32)
        f_vec, eq = row_onehots(py, n, kmin)
        return hb, sel0, 1.0 - sel0, f_vec, eq

    def _gp_sample(win_fn, n, with_d, axis):
        phases, dphases = [], []
        for py in (0, 1):
            hb, sel0, sel1, f_vec, eq = _gp_prologue(py, n)
            WL = tap_w(f_vec, eq)
            rolls = [win_fn(py, p, pad2 + hb, WT) for p in (0, 1)]
            w_px = [q_tap_w(WL, sel0, sel1, px) for px in (0, 1)]
            phases.extend(_gp_combine(rolls, w_px))
            if with_d:
                TD = tap_d(eq)
                d_px = [q_tap_w(TD, sel0, sel1, px) for px in (0, 1)]
                dphases.extend(_gp_combine(rolls, d_px))
        st = jnp.stack(phases, axis=axis)
        if not with_d:
            return st, None
        return st, jnp.stack(dphases, axis=axis)

    def _ls_win_n(n):
        return lambda py, p, start, width: ls_win(py, p, n, start, width)

    def sample_ls_taps(n):
        ls4, _ = _gp_sample(_ls_win_n(n), n, False, 1)
        return _ls_split(ls4, mask4(n))

    def sample_c_taps(n):
        c4, _ = _gp_sample(c_win, n, False, 0)
        return c4 * mask4(n)[:, None]

    def sample_lsd_taps(n):
        ls4, lsd4 = _gp_sample(_ls_win_n(n), n, True, 1)
        m4 = mask4(n)
        l, s = _ls_split(ls4, m4)
        d = lsd4 * m4
        return l, s, d[0], d[1]

    def sample_cd_taps(n):
        c4, cd4 = _gp_sample(c_win, n, True, 0)
        m4 = mask4(n)[:, None]
        return c4 * m4, cd4 * m4

    def center_ls(n):
        """CENTER (unshifted) samples for the fused disp head: source
        phase == output phase, static lane-aligned slices."""
        rows = []
        for py in (0, 1):
            for p in (0, 1):
                base = py * 2 * n2 + p * n2 + 2 * n
                rows.append(
                    ls_ref[pl.ds(base, 2), :, pl.ds(pad2, W2)].astype(F32)
                )
        ls4 = jnp.stack(rows, axis=1)                   # (2, 4, Rq, W2)
        m4 = mask4(n)
        return ls4[0] * m4, ls4[1]                      # l0 masked, s0 raw

    return types.SimpleNamespace(
        ls_vec=sample_ls_vec, c_vec=sample_c_vec,
        lsd_vec=sample_lsd_vec, cd_vec=sample_cd_vec,
        ls_taps=sample_ls_taps, c_taps=sample_c_taps,
        lsd_taps=sample_lsd_taps, cd_taps=sample_cd_taps,
        center_ls=center_ls, row4=row4, mask4=mask4, k_f=k_f,
        k_extreme=k_extreme, row_onehots=row_onehots, tap_w=tap_w,
        q_tap_w=q_tap_w, roll_w=roll_w, WQ=WQ, WT=WT, JT=JT,
    )


def _n_stats(with_disp: bool) -> int:
    """f32 per-phase softmax statistics the forward can emit for the
    single-pass backward (flash-attention style): L = mx + log(se),
    U = us/se, M (mixture sum), and with the fused disp head the center
    triple (L0 over the UNMASKED center normalizer, U0, disp0) matching
    the backward's center algebra exactly."""
    return 6 if with_disp else 3


def _fwd_kernel_q(
    shift_ref,   # (2, Rq, N) SMEM  py-split signed offsets
    mask_ref,    # (2, Rq, N) SMEM
    src_ref,     # (12, Rq, W2p) VMEM padded s2d source
    tgt_ref,     # (12, Rq, W2)  VMEM s2d target
    ls_ref,      # (4*2N, Rq, W2p) VMEM padded quad interleaved heads
    *refs,       # rgb, nll [, nlla] [, disp] [, stats] outs (single pass)
    n_planes: int,
    n_vertical: int,
    rows_q: int,
    width_q: int,
    pad_q: int,
    with_disp: bool = False,
    gp_taps: int = 0,
    with_stats: bool = False,
    with_auto: bool = True,
):
    refs = list(refs)
    stats_ref = refs.pop() if with_stats else None
    rgb_ref, nll_ref = refs[0], refs[1]
    refs = refs[2:]
    # with_auto=False (production: the stereo recipes never automask)
    # skips the whole automask mixture — one exp per plane per pixel
    nlla_ref = refs.pop(0) if with_auto else None
    disp_ref = refs.pop(0) if with_disp else None
    N, NV, Rq, W2 = n_planes, n_vertical, rows_q, width_q
    n2 = 2 * N

    sm = _mk_q(shift_ref, mask_ref, src_ref, ls_ref, Rq, W2, pad_q, n2,
               gp_taps)
    if N > NV:
        assert gp_taps > 0, "quad kernel requires ground-plane taps"

    tgt = tgt_ref[...].astype(F32).reshape(4, 3, Rq, W2)
    if with_auto:
        src0 = src_ref[:, :, pl.ds(pad_q, W2)].astype(F32).reshape(
            4, 3, Rq, W2)
        e_auto = jnp.abs(src0 - tgt).sum(1) / 3.0         # (4, Rq, W2)

    # ---- SINGLE online-softmax pass (flash-attention style): running max
    # with accumulator rescale replaces v1's max pass + the l/s VMEM
    # scratch round-trip entirely.  Every accumulator is e-linear, so one
    # corr multiply per plane keeps them exact.
    nh = 6 if with_auto else 5           # head carry length

    def pass_all(sample_ls, sample_c):
        def body(n, carry):
            mx, se, us, rgb_acc, M = carry[:5]
            l_n, s_n = sample_ls(n)
            c_n = sample_c(n)                             # (4, 3, Rq, W2)
            corr, e_n, mx = _online_e(l_n, mx)
            # ONE reciprocal per plane: VPU divides are multi-op
            # reciprocal+Newton sequences — every /s_n below rides r_n
            r_n = 1.0 / s_n
            u_n = e_n * r_n
            rgb_acc = rgb_acc * corr[:, None] + u_n[:, None] * c_n
            err_n = jnp.abs(c_n - tgt).sum(1) / 3.0
            M = M * corr + e_n * 0.5 * jnp.exp(-err_n * r_n) * r_n
            head = (mx, se * corr + e_n, us * corr + u_n, rgb_acc, M)
            if with_auto:
                Ma = carry[5]
                head = head + (
                    Ma * corr + e_n * 0.5 * jnp.exp(-e_auto * r_n) * r_n,)
            if not with_disp:
                return head
            mx0, se0, us0, ud0 = carry[nh : nh + 4]
            l0, s0_raw = sm.center_ls(n)
            s0 = jnp.clip(s0_raw, 0.01, 1.0)
            corr0, e0_n, mx0 = _online_e(l0, mx0)
            u0_n = e0_n * sm.mask4(n) * (1.0 / s0)
            head = head + (mx0, se0 * corr0 + u0_n * s0,
                           us0 * corr0 + u0_n,
                           ud0 * corr0 + u0_n * sm.row4(shift_ref, n))
            if with_stats:
                # UNMASKED center normalizer (the backward's center
                # softmax is taken over all planes, mask applied after)
                head = head + (carry[nh + 4] * corr0 + e0_n,)
            return head
        return body

    shp = (4, Rq, W2)
    zero = jnp.zeros(shp, F32)
    neg = jnp.full(shp, -1e30, F32)
    carry = (neg, zero, zero, jnp.zeros((4, 3, Rq, W2), F32), zero)
    if with_auto:
        carry = carry + (zero,)
    if with_disp:
        carry = carry + (neg, zero, zero, zero)
        if with_stats:
            carry = carry + (zero,)
    carry = jax.lax.fori_loop(0, NV, pass_all(sm.ls_vec, sm.c_vec), carry)
    if N > NV:
        carry = jax.lax.fori_loop(
            NV, N, pass_all(sm.ls_taps, sm.c_taps), carry)
    se, us, rgb_acc, M = carry[1:5]
    inv_se = 1.0 / se
    U = us * inv_se
    inv_us = jnp.where(U > 1e-7, 1.0 / jnp.maximum(us, 1e-30), 0.0)
    M = M * inv_se

    rgb_ref[...] = (rgb_acc * inv_us[:, None]).reshape(
        12, Rq, W2).astype(rgb_ref.dtype)
    nll_ref[...] = -jnp.log(jnp.maximum(M, 0.0) + 1e-7)
    if with_auto:
        Ma = carry[5] * inv_se
        nlla_ref[...] = -jnp.log(jnp.maximum(Ma, 0.0) + 1e-7)
    if with_disp:
        se0, us0, ud0 = carry[nh + 1 : nh + 4]
        U0 = us0 / se0
        inv_us0 = jnp.where(U0 > 1e-7, 1.0 / jnp.maximum(us0, 1e-30), 0.0)
        disp_ref[...] = (ud0 * inv_us0).astype(disp_ref.dtype)
    if with_stats:
        mx = carry[0]
        stats = [mx + jnp.log(se), U, M]
        if with_disp:
            mx0, se0r = carry[nh], carry[nh + 4]
            U0b = us0 / se0r
            disp0 = jnp.where(
                U0b > 1e-7, ud0 / jnp.maximum(us0, 1e-30), 0.0)
            stats += [mx0 + jnp.log(se0r), U0b, disp0]
        stats_ref[...] = jnp.stack(stats).reshape(-1, Rq, W2)


def _bwd_kernel_q(
    shift_ref,   # (2, Rq, N) SMEM
    mask_ref,    # (2, Rq, N) SMEM
    src_ref,     # (12, Rq, W2p)
    tgt_ref,     # (12, Rq, W2)
    ls_ref,      # (4*2N, Rq, W2p)
    stats_ref,   # (4*_n_stats, Rq, W2) f32 forward softmax statistics
    rgb_ref,     # (12, Rq, W2) forward rgb output (for A = U*(G.rgb))
    grgb_ref,    # (12, Rq, W2)
    gnll_ref,    # (4, Rq, W2)
    *refs,       # [gdisp] dls, dshift outs + the g staging scratch
    n_planes: int,
    n_vertical: int,
    rows_q: int,
    width_q: int,
    pad_q: int,
    gpad_q: int,
    with_disp: bool = False,
    gp_taps: int = 0,
):
    """Adjoint of _fwd_kernel_q — v1 _bwd_kernel's math on phase-split
    blocks, production configuration only (image_grads=False, packed
    interleaved grads).  The reverse-window emission routes each staged
    output-phase cotangent back to its SOURCE phase: per (plane, py) two
    half-width g rolls (one per output px buffer) serve both source
    phases via a parity select (vertical planes) or the static reverse
    tap grid (ground planes).

    Structure: ONE pass, flash-attention style.  The forward saves its
    per-phase softmax statistics (L = mx + log se, U, M and the center
    triple), and the two remaining global couplings come for free from
    the forward OUTPUTS: A = sum_n u_n (G.c_n) = U * (G . rgb_out)
    (since rgb_out = sum u c / sum u), and M rides the stats.  With every
    global known up front, each plane's samples are consumed the moment
    they are live — pi_n = exp(l_n - L) — so the old recompute pass and
    its eight (N, 4, Rq, W2) VMEM scratches disappear entirely."""
    refs = list(refs)
    gdisp_ref = refs.pop(0) if with_disp else None
    dls_ref, dshift_ref, g_scr = refs
    N, NV, Rq, W2 = n_planes, n_vertical, rows_q, width_q
    n2 = 2 * N
    # pad_q: left offset of the W2 center in the HBM operands (0 in the
    # production nonneg mode); gpad_q: left reach of the VMEM staging
    # scratch (always the full pad2 — reverse windows read [gpad - h...))
    pad2 = gpad_q
    WQ = W2 + 128

    sm = _mk_q(shift_ref, mask_ref, src_ref, ls_ref, Rq, W2, pad_q, n2,
               gp_taps)
    if N > NV:
        assert gp_taps > 0, "quad kernel requires gp_taps for ground planes"

    tgt = tgt_ref[...].astype(F32).reshape(4, 3, Rq, W2)
    G = grgb_ref[...].astype(F32).reshape(4, 3, Rq, W2)
    gN = gnll_ref[...].astype(F32)

    # ---- global couplings from the forward statistics ----------------------
    st = stats_ref[...].reshape(_n_stats(with_disp), 4, Rq, W2)
    L, U, M = st[0], st[1], st[2]
    rgb0 = rgb_ref[...].astype(F32).reshape(4, 3, Rq, W2)
    A = U * (G * rgb0).sum(1)
    inv_u = jnp.where(U > 1e-7, 1.0 / jnp.maximum(U, 1e-7), 0.0)
    dM = -gN * (M > 0) / (jnp.maximum(M, 0.0) + 1e-7)
    dU = -(inv_u**2) * A * (U > 1e-7)
    S_ = inv_u * A + dM * M + dU * U

    if with_disp:
        L0, U0, disp0 = st[3], st[4], st[5]
        live0 = (U0 > 1e-7).astype(F32)
        gD = gdisp_ref[...].astype(F32) * live0
        g_over_u0 = gD / jnp.maximum(U0, 1e-7)

    # ---- emission ----------------------------------------------------------
    # g staging: per output px phase, the (dl, ds) pair — [px0_l, px0_s,
    # px1_l, px1_s]; the buffer is re-staged per (plane, py).
    WG = g_scr.shape[-1]
    g_scr[...] = jnp.zeros((4, Rq, WG), g_scr.dtype)

    def plane_grads(sample_lsd, sample_cd, n):
        """(dl, ds_gated, dshift2 (2, Rq), dl0, ds0) on (4, Rq, W2), all
        from LIVE samples: the c/cd uses reduce to the four channel
        contractions err/gc/gcd/scd computed in place."""
        l_n, s_n, ld_n, sd_n = sample_lsd(n)
        c_n, cd_n = sample_cd(n)
        diff = c_n - tgt
        e_n = jnp.abs(diff).sum(1) / 3.0
        gc_n = (G * c_n).sum(1)
        gcd_n = (G * cd_n).sum(1)
        scd_n = (jnp.sign(diff) * cd_n).sum(1)
        pi_n = jnp.exp(l_n - L)
        # ONE reciprocal per plane (VPU divides are multi-op sequences);
        # the seven /s_n of the adjoint algebra all ride r_n / r2_n
        r_n = 1.0 / s_n
        r2_n = r_n * r_n
        lap_n = 0.5 * jnp.exp(-e_n * r_n) * r_n
        u_n = pi_n * r_n
        wgt_n = u_n * inv_u
        du_n = gc_n * inv_u + dU
        dpi_n = du_n * r_n + dM * lap_n
        dl_n = pi_n * (dpi_n - S_)
        dlap_n = dM * pi_n
        de_n = -dlap_n * lap_n * r_n
        ds_n = (dlap_n * lap_n * (e_n - s_n) - du_n * pi_n) * r2_n
        ds_gate = ds_n * ((s_n > 0.01) & (s_n < 1.0))
        # d/dshift per FULL-res row: sum the (4, Rq, W2) tap-diff products
        # over px phases and half-columns -> (2, Rq).  sum_c dc.cd with
        # dc = G*wgt + sign(c-tgt)*de/3 is wgt*gcd + de/3*scd.
        per_ph = jnp.sum(
            dl_n * ld_n + ds_gate * sd_n
            + wgt_n * gcd_n + (de_n / 3.0) * scd_n,
            axis=2,
        )                                                   # (4, Rq)
        # sum the px phases per py with static slices (a (2,2,Rq) reshape
        # + middle-axis reduce trips a Mosaic relayout)
        dshift2 = jnp.stack(
            [per_ph[0] + per_ph[1], per_ph[2] + per_ph[3]])  # (2, Rq)
        dl0_n = ds0_n = None
        if with_disp:
            m4 = sm.mask4(n)
            l0, s0_raw = sm.center_ls(n)
            p0_n = jnp.exp(l0 - L0)
            s0_n = jnp.clip(s0_raw, 0.01, 1.0)
            r0_n = 1.0 / s0_n
            du0 = g_over_u0 * (sm.row4(shift_ref, n) - disp0)
            dp0 = du0 * m4 * r0_n
            dl0_n = p0_n * dp0          # softmax coupling S0 == 0
            gate0 = (s0_raw > 0.01) & (s0_raw < 1.0)
            ds0_n = -du0 * p0_n * m4 * (r0_n * r0_n) * gate0
            extra = (g_over_u0 * p0_n * m4 * r0_n).sum(2)   # (4, Rq)
            dshift2 = dshift2 + jnp.stack(
                [extra[0] + extra[1], extra[2] + extra[3]])
        return dl_n, ds_gate, dshift2, dl0_n, ds0_n

    def stage_g(py, dl_n, ds_g, m_col):
        """Stage the py row-phase's (px0, px1) cotangents (masked) — in
        the d_ls output dtype (bf16 in production: the emitted values are
        quantized to it anyway, and staging at half width halves the
        reverse-window VMEM traffic; f32 in the parity tests)."""
        for px in (0, 1):
            ph = 2 * py + px
            g_scr[2 * px, :, pl.ds(pad2, W2)] = (
                dl_n[ph] * m_col).astype(g_scr.dtype)
            g_scr[2 * px + 1, :, pl.ds(pad2, W2)] = (
                ds_g[ph] * m_col).astype(g_scr.dtype)

    def center_val(dl0_n, ds0_n, py, p):
        if dl0_n is None:
            return None
        ph = 2 * py + p
        return dl0_n[ph], ds0_n[ph]

    def emit(n, py, p, bl, bs, dl0_n, ds0_n):
        cv = center_val(dl0_n, ds0_n, py, p)
        if cv is not None:
            bl = bl + cv[0]
            bs = bs + cv[1]
        base = py * 2 * n2 + p * n2 + 2 * n
        dls_ref[pl.ds(base, 2), :, :] = jnp.stack(
            [bl, bs]).astype(dls_ref.dtype)

    def pass3_vec(n, _):
        dl_n, ds_g, dshift2, dl0_n, ds0_n = plane_grads(
            sm.lsd_vec, sm.cd_vec, n)
        # (2N, Rq, 128) out: py pairs interleaved at 2n + py
        dshift_ref[pl.ds(2 * n, 2)] = jnp.broadcast_to(
            dshift2[:, :, None], (2, Rq, 128))
        ki, f, a = sm.k_f(n)
        hA = ki // 2
        hB = (ki + 1) // 2
        odd = (a == 1)
        for py in (0, 1):
            m_col = sm.row4(mask_ref, n)[2 * py]            # (Rq, 1)
            stage_g(py, dl_n, ds_g, m_col)
            # one roll per px buffer; both source phases' reads come from
            # adjacent taps (parity select)
            r0 = sm.roll_w(
                lambda q, w: g_scr[pl.ds(0, 2), :, pl.ds(q, w)],
                pad2 - hB, WQ,
            )
            r1 = sm.roll_w(
                lambda q, w: g_scr[pl.ds(2, 2), :, pl.ds(q, w)],
                pad2 - hA - 1, WQ,
            )
            g0_hB = r0[:, :, :W2]
            g0_hA = jnp.where(odd, r0[:, :, 1 : W2 + 1], g0_hB)
            g1_hA1 = r1[:, :, :W2]
            g1_hB = jnp.where(odd, g1_hA1, r1[:, :, 1 : W2 + 1])
            c_same = (1.0 - f) * g0_hA + f * g1_hA1     # source phase a
            c_other = f * g0_hB + (1.0 - f) * g1_hB     # source phase 1-a
            a_is0 = (a == 0)
            for p in (0, 1):
                sel = a_is0 if p == 0 else jnp.logical_not(a_is0)
                val = jnp.where(sel, c_same, c_other)
                emit(n, py, p, val[0], val[1], dl0_n, ds0_n)
        return 0

    def pass3_taps(n, _):
        """Ground planes: static reverse half-tap grid per (py, px
        buffer, source phase) — mirror of the forward _gp_sample with the
        v1 reverse-interpolation weights."""
        dl_n, ds_g, dshift2, dl0_n, ds0_n = plane_grads(
            sm.lsd_taps, sm.cd_taps, n)
        dshift_ref[pl.ds(2 * n, 2)] = jnp.broadcast_to(
            dshift2[:, :, None], (2, Rq, 128))
        JT = sm.JT
        for py in (0, 1):
            kmin, _ = sm.k_extreme(py, n)
            a = kmin - 2.0 * jnp.floor(kmin / 2.0)
            sel0 = (a == 0.0).astype(F32)
            sel1 = 1.0 - sel0
            hb = jnp.floor(kmin / 2.0).astype(I32)
            f_vec, eq = sm.row_onehots(py, n, kmin)
            WL = sm.tap_w(f_vec, eq)
            w_px = [sm.q_tap_w(WL, sel0, sel1, px) for px in (0, 1)]
            m_col = sm.row4(mask_ref, n)[2 * py]
            stage_g(py, dl_n, ds_g, m_col)
            # dP[p][y] = sum_px sum_j w[px][p][j](r) g_px[y - hb - j]:
            # one WT roll per px buffer anchored at pad2 - hb - JT
            # (reverse tap jj maps to j = JT - jj)
            rolls = [
                sm.roll_w(
                    lambda q, w, px=px: g_scr[
                        pl.ds(2 * px, 2), :, pl.ds(q, w)
                    ],
                    pad2 - hb - JT, sm.WT,
                )
                for px in (0, 1)
            ]
            for p in (0, 1):
                acc = None
                for px in (0, 1):
                    for j in range(JT + 1):
                        wj = w_px[px][p][j]
                        if wj is None:
                            continue
                        jj = JT - j
                        term = rolls[px][:, :, jj : jj + W2] * wj
                        acc = term if acc is None else acc + term
                if acc is None:
                    acc = jnp.zeros((2, Rq, W2), F32)
                emit(n, py, p, acc[0], acc[1], dl0_n, ds0_n)
        return 0

    jax.lax.fori_loop(0, NV, pass3_vec, 0)
    if N > NV:
        jax.lax.fori_loop(NV, N, pass3_taps, 0)


@functools.partial(
    jax.jit,
    static_argnames=("pad", "rows", "interpret", "n_vertical", "with_disp",
                     "gp_taps", "with_stats", "nonneg", "with_auto"),
)
def sweep_forward_quad(srcq, tgtq, lsq, shift2, mask2,
                       pad: int, rows: int = 16, interpret: bool = False,
                       n_vertical: int = 0, with_disp: bool = False,
                       gp_taps: int = 0, with_stats: bool = False,
                       with_auto: bool = True, nonneg: bool = False):
    """Quad forward kernel invocation.

    Args:
      srcq/tgtq: ``(B, 12, H/2, W/2)`` s2d-packed images, channel order
        (py, px, rgb).
      lsq: ``(B, 4*2N, H/2, W/2)`` quad interleaved heads, channel order
        (py, px, [logit_n, sigma_n]).
      shift2/mask2: ``(B, 2, H/2, N)`` py-split row offsets / validity.
      pad: FULL-resolution W padding bound (same contract as v1).
      rows: full-resolution rows per block (must be even).
      with_stats: additionally emit the per-phase softmax statistics
        ``(B, 4*_n_stats, H/2, W/2)`` f32 consumed by the single-pass
        backward (appended as the LAST output).
      nonneg: shifts are guaranteed >= 0 (production disparities) — the
        operands get no left W halo (~20% less padded-buffer traffic)
        and shifts are clipped at 0.

    Returns: (rgbq (B, 12, H/2, W/2) input-dtype, nll (B, 4, H/2, W/2)
    f32 [, nll_auto when with_auto] [, disp] [, stats]) — all
    phase-split, ph = 2*py + px.  ``with_auto=False`` (the production
    stereo recipes never automask) skips the automask mixture — one exp
    per plane per pixel — inside the kernel.
    """
    return _fwd_call_q(srcq, tgtq, lsq, shift2, mask2, pad=pad, rows=rows,
                       interpret=interpret, n_vertical=n_vertical,
                       with_disp=with_disp, gp_taps=gp_taps,
                       with_stats=with_stats, nonneg=nonneg,
                       with_auto=with_auto)


def _quad_dims(srcq, lsq, rows):
    B, _, Hq, W2 = srcq.shape
    N = lsq.shape[1] // 4 // 2
    assert rows % 2 == 0, rows
    Rq = rows // 2
    assert Hq % Rq == 0, (Hq, Rq)
    return B, Hq, W2, N, Rq


def _clip_shift_q(shift2, pad2, gp_taps, nonneg=False):
    jt = (gp_taps + 3) // 2 if gp_taps else 0
    lim = 2.0 * (pad2 - jt) - 6.0
    return jnp.clip(shift2, 0.0 if nonneg else -lim, lim)


def _quad_slack(pad2: int, gp_taps: int) -> int:
    """Right-side extra padding so every 128-aligned roll window fits.

    Worst read end (see _mk_q): a window anchored at start <= 2*pad2 -
    jt - 3 is rounded DOWN to q = 128*floor(start/128) and reads q +
    width.  Vertical windows (width W2 + 128): q <= 2*pad2 - 128 (pad2
    is a 128 multiple), end <= W2 + 2*pad2 -> slack 0.  Ground-plane tap
    windows (width W2 + 256): q <= 2*pad2 - 128, end <= W2 + 2*pad2 +
    128 -> slack 128.  The same bounds hold with the nonneg left pad of
    0: every anchor h is then >= 0 and <= pad2 - jt - 3 < pad2, so
    q <= lpad + pad2 - 128 and the identical slack covers the window
    end relative to W2 + lpad + pad2."""
    return 128 if gp_taps else 0


def _fwd_call_q(srcq, tgtq, lsq, shift2, mask2, *, pad, rows, interpret,
                n_vertical, with_disp, gp_taps, with_stats=False,
                nonneg=False, pre_padded=False, with_auto=True):
    # pre_padded: srcq/lsq already carry the (lpad, pad2 + slack) W halo
    # (the custom VJP pads ONCE in its fwd and saves the padded operands
    # as residuals, so the backward never re-pads); tgtq is never padded
    # and supplies the logical W2.
    B, Hq, W2, N, Rq = _quad_dims(tgtq, lsq, rows)
    pad2 = _quad_pad(pad, gp_taps)
    slack = _quad_slack(pad2, gp_taps)
    lpad = _quad_lpad(pad2, nonneg)
    W2p = W2 + lpad + pad2 + slack
    shift2 = _clip_shift_q(shift2, pad2, gp_taps, nonneg)

    if pre_padded:
        src_p, ls_p = srcq, lsq
        assert ls_p.shape[-1] == W2p, (ls_p.shape, W2p)
    else:
        src_p = _pad_lr(srcq, lpad, pad2 + slack)
        ls_p = _pad_lr(lsq, lpad, pad2 + slack)

    kernel = functools.partial(
        _fwd_kernel_q, n_planes=N, n_vertical=n_vertical, rows_q=Rq,
        width_q=W2, pad_q=lpad, with_disp=with_disp, gp_taps=gp_taps,
        with_stats=with_stats, with_auto=with_auto,
    )
    smem_spec = pl.BlockSpec((None, 2, Rq, N), lambda b, h: (b, 0, h, 0),
                             memory_space=pltpu.SMEM)

    def vspec(c, Wd):
        return pl.BlockSpec((None, c, Rq, Wd), lambda b, h: (b, 0, h, 0),
                            memory_space=pltpu.VMEM)

    q_shape = jax.ShapeDtypeStruct((B, 4, Hq, W2), F32)
    out_specs = [vspec(12, W2), vspec(4, W2)]
    out_shape = [
        jax.ShapeDtypeStruct((B, 12, Hq, W2), srcq.dtype),
        q_shape,
    ]
    if with_auto:
        out_specs.append(vspec(4, W2))
        out_shape.append(q_shape)
    if with_disp:
        out_specs.append(vspec(4, W2))
        out_shape.append(q_shape)
    if with_stats:
        ks = 4 * _n_stats(with_disp)
        out_specs.append(vspec(ks, W2))
        out_shape.append(jax.ShapeDtypeStruct((B, ks, Hq, W2), F32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, Hq // Rq),
        in_specs=[
            smem_spec, smem_spec,
            vspec(12, W2p), vspec(12, W2), vspec(8 * N, W2p),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shift2, mask2, src_p, tgtq, ls_p)
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=("pad", "rows", "interpret", "n_vertical", "with_disp",
                     "gp_taps", "nonneg", "pre_padded"),
)
def sweep_backward_quad(srcq, tgtq, lsq, shift2, mask2, stats, rgb,
                        g_rgb, g_nll, g_disp=None,
                        pad: int = 0, rows: int = 16,
                        interpret: bool = False, n_vertical: int = 0,
                        with_disp: bool = False, gp_taps: int = 0,
                        nonneg: bool = False, pre_padded: bool = False):
    """Quad backward kernel invocation (production: image_grads=False).

    ``stats``/``rgb`` are the forward's with_stats output and rgb output
    (residuals).  nll_auto's cotangent is not an argument: its only live
    adjoint path is into the images (pi/sigma are treated as constants
    there, reference trainer.py:733), and the quad path never
    differentiates the batch images.  With ``pre_padded``, srcq/lsq are
    the forward's already-padded operands (VJP residuals) — no re-pad.

    Returns (d_lsq (B, 4*2N, H/2, W/2) lsq.dtype, d_shift2 (B, 2, H/2, N)).
    """
    assert pad > 0, "pad is required (>= max |shift| + 1)"
    B, Hq, W2, N, Rq = _quad_dims(tgtq, lsq, rows)
    pad2 = _quad_pad(pad, gp_taps)
    slack = _quad_slack(pad2, gp_taps)
    lpad = _quad_lpad(pad2, nonneg)
    W2p = W2 + lpad + pad2 + slack
    WG = W2 + 2 * pad2 + slack
    shift2 = _clip_shift_q(shift2, pad2, gp_taps, nonneg)

    if pre_padded:
        src_p, ls_p = srcq, lsq
        assert ls_p.shape[-1] == W2p, (ls_p.shape, W2p)
    else:
        src_p = _pad_lr(srcq, lpad, pad2 + slack)
        ls_p = _pad_lr(lsq, lpad, pad2 + slack)

    kernel = functools.partial(
        _bwd_kernel_q, n_planes=N, n_vertical=n_vertical, rows_q=Rq,
        width_q=W2, pad_q=lpad, gpad_q=pad2, with_disp=with_disp,
        gp_taps=gp_taps,
    )
    smem_spec = pl.BlockSpec((None, 2, Rq, N), lambda b, h: (b, 0, h, 0),
                             memory_space=pltpu.SMEM)

    def vspec(c, Wd):
        return pl.BlockSpec((None, c, Rq, Wd), lambda b, h: (b, 0, h, 0),
                            memory_space=pltpu.VMEM)

    ks = 4 * _n_stats(with_disp)
    ct_args = [stats, rgb, g_rgb, g_nll]
    ct_specs = [vspec(ks, W2), vspec(12, W2), vspec(12, W2), vspec(4, W2)]
    if with_disp:
        ct_args.append(g_disp)
        ct_specs.append(vspec(4, W2))

    outs = pl.pallas_call(
        kernel,
        grid=(B, Hq // Rq),
        in_specs=[
            smem_spec, smem_spec,
            vspec(12, W2p), vspec(12, W2), vspec(8 * N, W2p),
        ] + ct_specs,
        out_specs=[
            vspec(8 * N, W2),
            vspec(2 * N, 128),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8 * N, Hq, W2), lsq.dtype),
            jax.ShapeDtypeStruct((B, 2 * N, Hq, 128), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, Rq, WG), lsq.dtype),       # g staging (px, l/s)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shift2, mask2, src_p, tgtq, ls_p, *ct_args)

    d_ls, d_shift_b = outs
    # (B, 2N, Hq, 128)[..., 0] -> (B, N, 2, Hq) -> (B, 2, Hq, N)
    B_, _, Hq_, _ = d_shift_b.shape
    d_shift2 = jnp.transpose(
        d_shift_b[..., 0].reshape(B_, N, 2, Hq_), (0, 2, 3, 1))
    return d_ls.astype(lsq.dtype), d_shift2.astype(shift2.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def fused_plane_sweep_quad(srcq, tgtq, lsq, shift2, mask2,
                           pad: int, interpret: bool = False,
                           n_vertical: int = 0, with_disp: bool = False,
                           rows: int = 16, gp_taps: int = 0,
                           with_auto: bool = True, nonneg: bool = False):
    """Quad plane-sweep: Pallas forward + hand-derived phase-split VJP.

    The production path for the s2d decoder tail: zero full-resolution
    plane-first tensors anywhere in the train step.  Image cotangents are
    always zero (the train step never differentiates the batch images).
    """
    return sweep_forward_quad(
        srcq, tgtq, lsq, shift2, mask2, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical, with_disp=with_disp,
        gp_taps=gp_taps, nonneg=nonneg, with_auto=with_auto,
    )


def _fpsq_fwd(srcq, tgtq, lsq, shift2, mask2, pad, interpret, n_vertical,
              with_disp, rows, gp_taps, with_auto, nonneg):
    # Pad ONCE: the padded operands are saved as residuals so the
    # backward never re-materializes the ~2x ls halo buffer.
    pad2 = _quad_pad(pad, gp_taps)
    lpad = _quad_lpad(pad2, nonneg)
    rpad = pad2 + _quad_slack(pad2, gp_taps)
    src_p = _pad_lr(srcq, lpad, rpad)
    ls_p = _pad_lr(lsq, lpad, rpad)
    out = _fwd_call_q(
        src_p, tgtq, ls_p, shift2, mask2, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical, with_disp=with_disp,
        gp_taps=gp_taps, with_stats=True, nonneg=nonneg, pre_padded=True,
        with_auto=with_auto,
    )
    out, stats = out[:-1], out[-1]
    return out, (src_p, tgtq, ls_p, shift2, mask2, stats, out[0])


def _fpsq_bwd(pad, interpret, n_vertical, with_disp, rows, gp_taps,
              with_auto, nonneg, res, cts):
    src_p, tgtq, ls_p, shift2, mask2, stats, rgb = res
    # the nll_auto cotangent (cts[2] when with_auto) is dropped: pi/sigma
    # are constants in the automask branch (reference trainer.py:733) and
    # images get no gradient here.
    di = 3 if with_auto else 2
    g_disp = cts[di] if with_disp else None
    d_ls, d_shift2 = sweep_backward_quad(
        src_p, tgtq, ls_p, shift2, mask2, stats, rgb, cts[0], cts[1],
        g_disp, pad=pad, rows=rows, interpret=interpret,
        n_vertical=n_vertical, with_disp=with_disp, gp_taps=gp_taps,
        nonneg=nonneg, pre_padded=True,
    )
    W2 = tgtq.shape[-1]
    B, _, Hq, _ = tgtq.shape
    return (jnp.zeros((B, 12, Hq, W2), src_p.dtype),
            jnp.zeros_like(tgtq), d_ls, d_shift2,
            jnp.zeros_like(mask2))


fused_plane_sweep_quad.defvjp(_fpsq_fwd, _fpsq_bwd)


# ---------------------------------------------------------------------------
# s2d-direct entry: the decoder's NHWC head tensor in, ONE Pallas pass to
# the padded NCHW kernel operand (ops/pallas_relayout.py) instead of the
# XLA channels-to-front copy + pad copy the r4 trace measured at
# 9.3 + 4.2 ms/step (and whose ~1 GB intermediate stays live into the
# kernel).  The cotangent comes back NHWC by the mirror kernel.
# ---------------------------------------------------------------------------

def _relayout_rows(Hq: int) -> int:
    return 8 if Hq % 8 == 0 else (4 if Hq % 4 == 0 else 1)


def _relayout_ok(ls_s2d, lpad: int, rpad: int) -> bool:
    # rows is chosen by _relayout_rows to divide Hq (worst case 1), so
    # only the lane-alignment of the width/pads gates the kernel path
    W2 = ls_s2d.shape[2]
    return W2 % 128 == 0 and lpad % 128 == 0 and rpad % 128 == 0


def ls_epilogue(ls_s2d, bias=None):
    """Mixture-head epilogue on the RAW interleaved (l, s) head: optional
    per-channel bias add (the head conv's, kept out of the conv), then
    odd channels (sigma) -> ``clip(sigmoid(x), 0.01, 1)`` (reference
    depth_decoder.py:278-279).  The aligned quad path applies this inside
    the relayout kernel instead (``sigma_epilogue=True`` + ``bias``):
    XLA schedules ANY elementwise between the head conv and the kernel
    as a standalone full-res pass between two layout copies (~11
    ms/step, r5 traces).  f32 compute + one rounding to the input dtype,
    matching the in-kernel variant (ops/pallas_relayout.py:_fwd_kernel)."""
    nch = ls_s2d.shape[-1]
    is_sigma = ((jnp.arange(nch) % 2) == 1).reshape(1, 1, 1, nch)
    xf = ls_s2d.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32).reshape(1, 1, 1, nch)
    out = jnp.where(is_sigma, jnp.clip(jax.nn.sigmoid(xf), 0.01, 1.0), xf)
    return out.astype(ls_s2d.dtype)


def _ls_epilogue_vjp_from_post(post, d_post):
    """Cotangent of :func:`ls_epilogue` expressed in POST-epilogue values
    (the clipped sigma itself): d_raw = d * s * (1 - s) on the sigma
    channels, gated to 0 where the clip saturated (s == 0.01; the upper
    bound is unreachable for a sigmoid).  Taking ``post`` from the padded
    kernel residual keeps everything in the cotangent's layout — the r5
    trace showed recomputing from the RAW head cost a 4.6 ms layout copy
    of it per step.  The bias cotangent is the spatial sum of the
    returned expression."""
    nch = d_post.shape[-1]
    is_sigma = ((jnp.arange(nch) % 2) == 1).reshape(1, 1, 1, nch)
    s = post.astype(jnp.float32)
    gate = ((s > 0.01) & (s < 1.0)).astype(jnp.float32)
    d = d_post.astype(jnp.float32)
    out = jnp.where(is_sigma, d * s * (1.0 - s) * gate, d)
    return out.astype(d_post.dtype)


def _pack_quad_operands(srcq, ls_s2d, pad, gp_taps, nonneg, interpret,
                        sigma_epilogue=False, bias=None):
    """(srcq NCHW, ls_s2d NHWC) -> the pre-padded kernel operands."""
    pad2 = _quad_pad(pad, gp_taps)
    lpad = _quad_lpad(pad2, nonneg)
    rpad = pad2 + _quad_slack(pad2, gp_taps)
    src_p = _pad_lr(srcq, lpad, rpad)
    if _relayout_ok(ls_s2d, lpad, rpad):
        from planedepth_tpu.ops.pallas_relayout import relayout_pad_nchw

        ls_p = relayout_pad_nchw(
            ls_s2d, lpad, rpad, rows=_relayout_rows(ls_s2d.shape[1]),
            interpret=interpret, sigma_epilogue=sigma_epilogue, bias=bias,
        )
    else:
        # tiny/unaligned shapes (CPU tests, dryrun): the XLA repack
        if sigma_epilogue:
            ls_s2d = ls_epilogue(ls_s2d, bias)
        elif bias is not None:
            ls_s2d = (ls_s2d.astype(jnp.float32)
                      + bias.astype(jnp.float32).reshape(1, 1, 1, -1)
                      ).astype(ls_s2d.dtype)
        ls_p = _pad_lr(quad_ls_from_s2d(ls_s2d), lpad, rpad)
    return src_p, ls_p, lpad, rpad


def _fpsqs_call(srcq, tgtq, ls_s2d, shift2, mask2, bias, pad, interpret,
                n_vertical, with_disp, rows, gp_taps, with_auto, nonneg,
                sigma_epilogue, with_stats):
    """Shared pack + forward call for the s2d entry's primal and VJP-fwd
    (they differ only in ``with_stats``)."""
    src_p, ls_p, _, _ = _pack_quad_operands(
        srcq, ls_s2d, pad, gp_taps, nonneg, interpret, sigma_epilogue,
        bias)
    out = _fwd_call_q(
        src_p, tgtq, ls_p, shift2, mask2, pad=pad, rows=rows,
        interpret=interpret, n_vertical=n_vertical, with_disp=with_disp,
        gp_taps=gp_taps, with_stats=with_stats, nonneg=nonneg,
        pre_padded=True, with_auto=with_auto,
    )
    return out, src_p, ls_p


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_plane_sweep_quad_s2d(srcq, tgtq, ls_s2d, shift2, mask2,
                               bias=None,
                               pad: int = 0, interpret: bool = False,
                               n_vertical: int = 0, with_disp: bool = False,
                               rows: int = 16, gp_taps: int = 0,
                               with_auto: bool = True, nonneg: bool = False,
                               sigma_epilogue: bool = False):
    """Quad plane-sweep taking the decoder's ``ls_s2d (B, H/2, W/2, 4*2N)``
    NHWC head directly; otherwise identical to :func:`fused_plane_sweep_quad`.

    ``sigma_epilogue`` / ``bias``: the head is the decoder's RAW merged
    conv output (conv WITHOUT its bias when ``bias`` is given) and the
    bias add + mixture sigma transform (:func:`ls_epilogue`) are applied
    inside the relayout pass — see ops/pallas_relayout.py.
    """
    out, _, _ = _fpsqs_call(
        srcq, tgtq, ls_s2d, shift2, mask2, bias, pad, interpret,
        n_vertical, with_disp, rows, gp_taps, with_auto, nonneg,
        sigma_epilogue, with_stats=False)
    return out


def _fpsqs_fwd(srcq, tgtq, ls_s2d, shift2, mask2, bias, pad, interpret,
               n_vertical, with_disp, rows, gp_taps, with_auto, nonneg,
               sigma_epilogue):
    out, src_p, ls_p = _fpsqs_call(
        srcq, tgtq, ls_s2d, shift2, mask2, bias, pad, interpret,
        n_vertical, with_disp, rows, gp_taps, with_auto, nonneg,
        sigma_epilogue, with_stats=True)
    out, stats = out[:-1], out[-1]
    return out, (src_p, tgtq, ls_p, shift2, mask2, bias, stats, out[0])


def _fpsqs_bwd(pad, interpret, n_vertical, with_disp, rows, gp_taps,
               with_auto, nonneg, sigma_epilogue, res, cts):
    src_p, tgtq, ls_p, shift2, mask2, bias, stats, rgb = res
    di = 3 if with_auto else 2
    g_disp = cts[di] if with_disp else None
    d_ls, d_shift2 = sweep_backward_quad(
        src_p, tgtq, ls_p, shift2, mask2, stats, rgb, cts[0], cts[1],
        g_disp, pad=pad, rows=rows, interpret=interpret,
        n_vertical=n_vertical, with_disp=with_disp, gp_taps=gp_taps,
        nonneg=nonneg, pre_padded=True,
    )
    # cotangent back to NHWC via XLA's layout-change copy: measured 3.2 ms
    # vs the mirror Pallas kernel's 6.2 ms at the b4 flagship shape
    # (scripts/validate_relayout_tpu.py) — XLA wins the C-minor WRITE side
    B, _, Hq, W2 = tgtq.shape
    d_ls_s2d = jnp.moveaxis(d_ls, 1, -1)
    if sigma_epilogue:
        # chain through the in-kernel epilogue using the POST values
        # sliced from the padded residual (same free-bitcast layout as
        # the cotangent; see _ls_epilogue_vjp_from_post)
        lpad = _quad_lpad(_quad_pad(pad, gp_taps), nonneg)
        post = jnp.moveaxis(ls_p[:, :, :, lpad:lpad + W2], 1, -1)
        d_ls_s2d = _ls_epilogue_vjp_from_post(post, d_ls_s2d)
    d_bias = None
    if bias is not None:
        # bias enters as x + b before the epilogue: its cotangent is the
        # spatial sum of the post-adjoint head cotangent
        d_bias = d_ls_s2d.astype(jnp.float32).sum(
            axis=(0, 1, 2)).astype(bias.dtype)
    return (jnp.zeros((B, 12, Hq, W2), src_p.dtype),
            jnp.zeros_like(tgtq), d_ls_s2d, d_shift2,
            jnp.zeros_like(mask2), d_bias)


fused_plane_sweep_quad_s2d.defvjp(_fpsqs_fwd, _fpsqs_bwd)


# ---------------------------------------------------------------------------
# Host-side packing helpers (step glue + tests)
# ---------------------------------------------------------------------------

def s2d_image(x, dtype=None):
    """(B, H, W, C) -> (B, 4C, H/2, W/2) quad channel-first, (py, px, c)."""
    B, H, W, C = x.shape
    if dtype is not None:
        x = x.astype(dtype)
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 2, 4, 5, 1, 3).reshape(B, 4 * C, H // 2, W // 2)


def d2s_quad(q):
    """(B, 4C, H/2, W/2) quad channel-first -> (B, H, W, C)."""
    B, C4, Hq, W2 = q.shape
    C = C4 // 4
    x = q.reshape(B, 2, 2, C, Hq, W2)
    return x.transpose(0, 4, 1, 5, 2, 3).reshape(B, 2 * Hq, 2 * W2, C)


def quad_ls_from_s2d(ls_s2d, dtype=None):
    """Decoder ``ls_s2d (B, H/2, W/2, 4*2N)`` (channels (py, px, j)) ->
    the kernel's ``(B, 4*2N, H/2, W/2)``: ONE channels-to-front relayout."""
    if dtype is not None:
        ls_s2d = ls_s2d.astype(dtype)
    return jnp.moveaxis(ls_s2d, -1, 1)


def split_rows(x):
    """(B, H, N) per-row metadata -> (B, 2, H/2, N) py-split."""
    B, H, N = x.shape
    return x.reshape(B, H // 2, 2, N).transpose(0, 2, 1, 3)
