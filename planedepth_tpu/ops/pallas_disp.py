"""Fused expected-disparity head: softmax + mixture reweight + contraction.

The decoder's disparity head (models/depth_decoder.py:199-217, reference
depth_decoder.py:252-291) chains softmax(logits) -> w = p*mask/sigma ->
w /= sum(w) -> disp = sum(w * d) over the N=63 plane axis in f32 — a dozen
(B, H, W, N) HBM passes that XLA schedules poorly (~10 ms fwd / ~20 ms bwd
at eff-batch 2 HR on v5e).  This kernel computes ``disp`` in ONE streaming
pass per block with a hand-derived VJP, so in the fused training path the
entire XLA head chain is dead code.

Math (per pixel; d row-constant, m binary):
    p = softmax(l);  u = p * m / s;  U = sum u;  disp = sum(u * d) / U
Adjoint with g = d(disp):
    du_n = g * (d_n - disp) / U
    ds_n = -du_n * u_n / s_n
    dp_n = du_n * m_n / s_n
    dl_n = p_n * (dp_n - sum_j dp_j p_j)
    dd_n = sum_x g * u_n / U        (per row)
The U <= eps guard zeroes disp and every adjoint, matching
``mixture_reweight``'s guarded reciprocal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
EPS = 1e-7


def _row_col(ref, n, R):
    """(R, 1) column from R SMEM scalars of plane n (ref block (R, N))."""
    return jnp.stack([ref[r, n] for r in range(R)]).reshape(R, 1)


def _disp_fwd_kernel(mask_ref, drows_ref, log_ref, sig_ref, disp_ref,
                     *, n_planes: int, rows: int, width: int):
    N, R, W = n_planes, rows, width

    def max_pass(n, mx):
        return jnp.maximum(mx, log_ref[n].astype(F32))

    mx = jax.lax.fori_loop(0, N, max_pass, jnp.full((R, W), -1e30, F32))

    def exp_pass(n, carry):
        se, us, ud = carry
        e = jnp.exp(log_ref[n].astype(F32) - mx)
        u = e * _row_col(mask_ref, n, R) / sig_ref[n].astype(F32)
        return se + e, us + u, ud + u * _row_col(drows_ref, n, R)

    se, us, ud = jax.lax.fori_loop(
        0, N, exp_pass,
        (jnp.zeros((R, W), F32),) * 3,
    )
    U = us / se
    D = ud / se
    inv_u = jnp.where(U > EPS, 1.0 / jnp.maximum(U, EPS), 0.0)
    disp_ref[...] = (D * inv_u).astype(disp_ref.dtype)


def _disp_bwd_kernel(mask_ref, drows_ref, log_ref, sig_ref, g_ref,
                     dlog_ref, dsig_ref, ddr_ref, p_scr,
                     *, n_planes: int, rows: int, width: int):
    N, R, W = n_planes, rows, width

    def max_pass(n, mx):
        return jnp.maximum(mx, log_ref[n].astype(F32))

    mx = jax.lax.fori_loop(0, N, max_pass, jnp.full((R, W), -1e30, F32))

    def exp_pass(n, carry):
        se, us, ud = carry
        e = jnp.exp(log_ref[n].astype(F32) - mx)
        p_scr[n] = e
        u = e * _row_col(mask_ref, n, R) / sig_ref[n].astype(F32)
        return se + e, us + u, ud + u * _row_col(drows_ref, n, R)

    se, us, ud = jax.lax.fori_loop(
        0, N, exp_pass, (jnp.zeros((R, W), F32),) * 3
    )
    inv_se = 1.0 / se
    U = us * inv_se
    disp = jnp.where(U > EPS, (ud * inv_se) / jnp.maximum(U, EPS), 0.0)
    live = (U > EPS).astype(F32)
    g = g_ref[...].astype(F32) * live
    g_over_U = g / jnp.maximum(U, EPS)

    # S = sum_j dp_j p_j  (p normalized: e * inv_se)
    def s_pass(n, S):
        e = p_scr[n]
        s_n = sig_ref[n].astype(F32)
        du = g_over_U * (_row_col(drows_ref, n, R) - disp)
        dp = du * _row_col(mask_ref, n, R) / s_n
        return S + dp * (e * inv_se)

    S = jax.lax.fori_loop(0, N, s_pass, jnp.zeros((R, W), F32))

    def emit(n, _):
        e = p_scr[n]
        p_n = e * inv_se
        m = _row_col(mask_ref, n, R)
        s_n = sig_ref[n].astype(F32)
        u_n = p_n * m / s_n
        du = g_over_U * (_row_col(drows_ref, n, R) - disp)
        dp = du * m / s_n
        dlog_ref[n] = (p_n * (dp - S)).astype(dlog_ref.dtype)
        dsig_ref[n] = (-du * u_n / s_n).astype(dsig_ref.dtype)
        ddr = jnp.sum(g_over_U * u_n, axis=1)              # (R,)
        ddr_ref[n] = jnp.broadcast_to(ddr[:, None], (R, 128))
        return 0

    jax.lax.fori_loop(0, N, emit, 0)


def _prep(logits, sigma, disp_rows, mask_rows, rows):
    B, H, W, N = logits.shape
    R = rows
    assert H % R == 0, (H, R)
    log_t = jnp.moveaxis(logits, -1, 1)                   # (B, N, H, W)
    sig_t = jnp.moveaxis(sigma, -1, 1)
    # row metadata stays (B, H, N): SMEM blocks must keep the last axis full
    return log_t, sig_t, disp_rows, mask_rows, B, H, W, N


def _common_specs(N, R, W):
    vol = pl.BlockSpec((None, N, R, W), lambda b, h: (b, 0, h, 0),
                       memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((None, R, N), lambda b, h: (b, h, 0),
                             memory_space=pltpu.SMEM)
    return vol, rows_spec


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def disp_head_fwd(logits, sigma, disp_rows, mask_rows,
                  rows: int = 8, interpret: bool = False):
    log_t, sig_t, drows, mrows, B, H, W, N = _prep(
        logits, sigma, disp_rows, mask_rows, rows
    )
    R = rows
    vol, rows_spec = _common_specs(N, R, W)
    kernel = functools.partial(_disp_fwd_kernel, n_planes=N, rows=R, width=W)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=[rows_spec, rows_spec, vol, vol],
        out_specs=pl.BlockSpec((None, R, W), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mrows, drows, log_t, sig_t)
    return out[..., None]                                  # (B, H, W, 1)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def disp_head_bwd(logits, sigma, disp_rows, mask_rows, g,
                  rows: int = 8, interpret: bool = False):
    log_t, sig_t, drows, mrows, B, H, W, N = _prep(
        logits, sigma, disp_rows, mask_rows, rows
    )
    R = rows
    vol, rows_spec = _common_specs(N, R, W)
    kernel = functools.partial(_disp_bwd_kernel, n_planes=N, rows=R, width=W)
    dlog, dsig, ddr_b = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=[rows_spec, rows_spec, vol, vol,
                  pl.BlockSpec((None, R, W), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            vol, vol,
            pl.BlockSpec((None, N, R, 128), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # gradients in the INPUT dtype (bf16 in the fused train path)
            # — halves their HBM write + transpose-back traffic
            jax.ShapeDtypeStruct((B, N, H, W), logits.dtype),
            jax.ShapeDtypeStruct((B, N, H, W), sigma.dtype),
            jax.ShapeDtypeStruct((B, N, H, 128), F32),
        ],
        scratch_shapes=[pltpu.VMEM((N, R, W), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mrows, drows, log_t, sig_t, g[..., 0])
    d_logits = jnp.moveaxis(dlog, 1, -1).astype(logits.dtype)
    d_sigma = jnp.moveaxis(dsig, 1, -1).astype(sigma.dtype)
    d_drows = jnp.moveaxis(ddr_b[..., 0], 1, -1).astype(disp_rows.dtype)
    return d_logits, d_sigma, d_drows


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def disp_head(logits, sigma, disp_rows, mask_rows, interpret: bool = False):
    """Expected disparity ``(B, H, W, 1)`` from the plane heads.

    Inputs: logits (B, H, W, N) ALREADY masked (decoder multiplies the
    padding mask into the logits), sigma (B, H, W, N) clipped, disp_rows
    (B, H, N) row-constant plane disparities, mask_rows (B, H, N) binary.
    Differentiable in logits / sigma / disp_rows; the mask is constant.
    """
    return disp_head_fwd(logits, sigma, disp_rows, mask_rows,
                         interpret=interpret)


def _dh_fwd(logits, sigma, disp_rows, mask_rows, interpret):
    out = disp_head_fwd(logits, sigma, disp_rows, mask_rows,
                        interpret=interpret)
    return out, (logits, sigma, disp_rows, mask_rows)


def _dh_bwd(interpret, res, g):
    logits, sigma, disp_rows, mask_rows = res
    d_logits, d_sigma, d_drows = disp_head_bwd(
        logits, sigma, disp_rows, mask_rows, g.astype(F32),
        interpret=interpret,
    )
    return d_logits, d_sigma, d_drows, jnp.zeros_like(mask_rows)


disp_head.defvjp(_dh_fwd, _dh_bwd)
