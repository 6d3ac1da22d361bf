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
  * softmax over planes via an online (streaming) logsumexp;
  * three plane passes: (1) sample logits/sigma into VMEM scratch +
    online lse, (2) mixture normalizer U = sum(pi/sigma), (3) resample
    rgb, composite, and accumulate both mixture sums.

The gradient is provided by :func:`fused_plane_sweep`'s custom VJP, whose
backward recomputes through the same kernel-free XLA graph in plane CHUNKS
(scan) so the adjoint never materializes the full stack either.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _fwd_kernel(
    shift_ref,   # (R, N) SMEM  signed source offsets
    mask_ref,    # (R, N) SMEM  row plane-validity
    src_ref,     # (3, R, Wp) VMEM padded source rows
    tgt_ref,     # (3, R, W)  VMEM target rows
    log_ref,     # (N, R, Wp) VMEM padded logits
    sig_ref,     # (N, R, Wp) VMEM padded sigmas
    rgb_ref,     # (3, R, W)  out
    nll_ref,     # (R, W)     out
    nlla_ref,    # (R, W)     out
    l_scr,       # (N, R, W) VMEM scratch: sampled+masked logits
    s_scr,       # (N, R, W) VMEM scratch: sampled+clamped sigmas
    *,
    n_planes: int,
    rows: int,
    width: int,
    pad: int,
):
    N, R, W = n_planes, rows, width

    def taps(r, n):
        s = shift_ref[r, n]
        k = jnp.floor(s)
        return pad + k.astype(jnp.int32), (s - k).astype(F32)

    def sample2(ref, n, r):
        """(1-f)*ref[n, r, p+k : p+k+W] + f*ref[..+1..] as (W,) f32."""
        p, f = taps(r, n)
        a = ref[n, r, pl.ds(p, W)].astype(F32)
        b = ref[n, r, pl.ds(p + 1, W)].astype(F32)
        return (1.0 - f) * a + f * b

    def sample_rgb(r, n):
        p, f = taps(r, n)
        a = src_ref[:, r, pl.ds(p, W)].astype(F32)
        b = src_ref[:, r, pl.ds(p + 1, W)].astype(F32)
        return (1.0 - f) * a + f * b                      # (3, W)

    # ---- pass 1: logits & sigma samples + online logsumexp ----------------
    def pass1(n, carry):
        m_run, s_run = carry
        for r in range(R):
            m = mask_ref[r, n]
            l_scr[n, r] = sample2(log_ref, n, r) * m
            s_scr[n, r] = jnp.clip(sample2(sig_ref, n, r) * m, 0.01, 1.0)
        l_n = l_scr[n]                                    # (R, W)
        m_new = jnp.maximum(m_run, l_n)
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.exp(l_n - m_new)
        return m_new, s_run

    m_run = jnp.full((R, W), -1e30, F32)
    s_run = jnp.zeros((R, W), F32)
    m_run, s_run = jax.lax.fori_loop(0, N, pass1, (m_run, s_run))
    lse = m_run + jnp.log(s_run)                          # (R, W)

    # ---- pass 2: mixture-weight normalizer U = sum_n pi_n / sigma_n --------
    def pass2(n, U):
        return U + jnp.exp(l_scr[n] - lse) / s_scr[n]

    U = jax.lax.fori_loop(0, N, pass2, jnp.zeros((R, W), F32))
    inv_u = jnp.where(U > 1e-7, 1.0 / jnp.maximum(U, 1e-7), 0.0)

    # ---- pass 3: rgb resample, composite, mixture sums ---------------------
    tgt = tgt_ref[...].astype(F32)                        # (3, R, W)
    e_auto = (
        jnp.abs(src_ref[:, :, pl.ds(pad, W)].astype(F32) - tgt).sum(0) / 3.0
    )

    def pass3(n, carry):
        rgb_acc, M, Ma = carry
        pi_n = jnp.exp(l_scr[n] - lse)
        s_n = s_scr[n]
        rows_c = []
        for r in range(R):
            m = mask_ref[r, n]
            rows_c.append(sample_rgb(r, n) * m)           # (3, W)
        c_n = jnp.stack(rows_c, axis=1)                   # (3, R, W)
        wgt = (pi_n / s_n) * inv_u
        rgb_acc = rgb_acc + wgt[None] * c_n
        e_n = jnp.abs(c_n - tgt).sum(0) / 3.0
        M = M + pi_n * 0.5 * jnp.exp(-e_n / s_n) / s_n
        Ma = Ma + pi_n * 0.5 * jnp.exp(-e_auto / s_n) / s_n
        return rgb_acc, M, Ma

    rgb_acc, M, Ma = jax.lax.fori_loop(
        0, N, pass3,
        (jnp.zeros((3, R, W), F32), jnp.zeros((R, W), F32),
         jnp.zeros((R, W), F32)),
    )

    rgb_ref[...] = rgb_acc.astype(rgb_ref.dtype)
    nll_ref[...] = -jnp.log(jnp.maximum(M, 0.0) + 1e-7)
    nlla_ref[...] = -jnp.log(jnp.maximum(Ma, 0.0) + 1e-7)


def _pad_w(x, pad):
    """Zero-pad the trailing W axis on both sides."""
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg)


@functools.partial(
    jax.jit, static_argnames=("pad", "rows", "interpret")
)
def sweep_forward(src_t, target_t, logits_t, sigma_t, shift, mask,
                  pad: int, rows: int = 8, interpret: bool = False):
    """Run the fused forward kernel.

    Args:
      src_t/target_t: ``(B, 3, H, W)`` channel-first source/target rows.
      logits_t/sigma_t: ``(B, N, H, W)`` plane-first heads.
      shift: ``(B, H, N)`` signed source offsets in pixels (row-constant).
      mask: ``(B, H, N)`` plane validity.
      pad: static W padding >= max |shift| + 1.

    Returns:
      (rgb_rec (B, 3, H, W) f32, nll (B, H, W) f32, nll_auto (B, H, W) f32)
    """
    B, _, H, W = src_t.shape
    N = logits_t.shape[1]
    R = rows
    assert H % R == 0, (H, R)
    Wp = W + 2 * pad
    # backstop: keep the dynamic slice start within the padded buffer
    # (shifts this large sample fully out of frame anyway)
    shift = jnp.clip(shift, -(pad - 1.0), pad - 1.0)

    src_p = _pad_w(src_t, pad)
    log_p = _pad_w(logits_t, pad)
    sig_p = _pad_w(sigma_t, pad)

    kernel = functools.partial(
        _fwd_kernel, n_planes=N, rows=R, width=W, pad=pad
    )

    rgb, nll, nlla = pl.pallas_call(
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
            pl.BlockSpec((None, N, R, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),         # logits (padded)
            pl.BlockSpec((None, N, R, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),         # sigma (padded)
        ],
        out_specs=[
            pl.BlockSpec((None, 3, R, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, R, W), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, R, W), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 3, H, W), F32),
            jax.ShapeDtypeStruct((B, H, W), F32),
            jax.ShapeDtypeStruct((B, H, W), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, R, W), F32),
            pltpu.VMEM((N, R, W), F32),
        ],
        interpret=interpret,
    )(shift, mask, src_p, target_t, log_p, sig_p)
    return rgb, nll, nlla


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_plane_sweep(src_t, target_t, logits_t, sigma_t, shift, mask,
                      pad: int, interpret: bool = False):
    """Fused plane-sweep: Pallas forward + hand-derived scatter-free VJP.

    The automask NLL treats pi/sigma as constants by definition (reference
    trainer.py:733) — the adjoint honors that.
    """
    return sweep_forward(src_t, target_t, logits_t, sigma_t, shift, mask,
                         pad=pad, interpret=interpret)


def _fps_fwd(src_t, target_t, logits_t, sigma_t, shift, mask, pad,
             interpret):
    out = sweep_forward(src_t, target_t, logits_t, sigma_t, shift, mask,
                        pad=pad, interpret=interpret)
    return out, (src_t, target_t, logits_t, sigma_t, shift, mask)


def _fps_bwd(pad, interpret, res, cts):
    return _sweep_bwd(*res, cts)


fused_plane_sweep.defvjp(_fps_fwd, _fps_bwd)
