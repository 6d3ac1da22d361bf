#!/usr/bin/env python
"""Validate the fused Pallas plane-sweep ON REAL TPU vs the dense oracle.

Runs forward + custom-VJP gradients at a KITTI-like small shape and prints
max abs/rel deviations, then times forward and grad at the full stage-1
shape.  Usage: python scripts/validate_sweep_tpu.py [check|time]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from planedepth_tpu.ops.pallas_sweep import (
    fused_plane_sweep, oracle_dense, sweep_forward,
)


def make(B, H, W, N, seed=0, dtype=jnp.float32, n_vertical=0,
         max_shift=40.0):
    """Synthetic sweep inputs with the PRODUCTION shift structure: the
    first ``n_vertical`` planes get ROW-CONSTANT shifts (vertical
    planes), the rest are LINEAR IN THE ROW (ground planes — disparity
    dw*y/(3.84*h*fs), slope <= ~0.8 px/row at stage-1 HR), which bounds
    the per-8-row-block integer spread the gp_taps kernel path relies
    on (tests/test_pallas_sweep.py::test_gp_spread)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, max_shift * 0.2, (B, 1, N)).astype(np.float32)
    slope = rng.uniform(0.0, 0.75, (B, 1, N)).astype(np.float32)
    r = np.arange(H, dtype=np.float32)[None, :, None]
    shift = base + slope * r
    mask = (rng.uniform(0, 1, (B, H, N)) > 0.2).astype(np.float32)
    if n_vertical:
        # vertical planes: shift AND mask are row-constant (production
        # vertical planes have all-ones padding masks)
        shift[:, :, :n_vertical] = rng.uniform(
            0.0, max_shift, (B, 1, n_vertical)
        )
        mask[:, :, :n_vertical] = 1.0
    return (
        jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)).astype(dtype),
        jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)).astype(dtype),
        jnp.asarray(rng.standard_normal((B, N, H, W)).astype(np.float32)).astype(dtype),
        jnp.asarray(rng.uniform(0.05, 0.95, (B, N, H, W)).astype(np.float32)).astype(dtype),
        jnp.asarray(shift),
        jnp.asarray(mask),
    )


def check(n_vertical=49):
    B, H, W, N = 2, 64, 640, 63
    args = make(B, H, W, N, n_vertical=n_vertical)
    pad = 64
    out_o = oracle_dense(*args)
    g = [jnp.ones_like(o) for o in out_o]

    def scal(fn):
        def w(*a5):
            o = fn(*a5, args[5])
            return sum(jnp.sum(x * y) for x, y in zip(o, g))
        return w

    go = jax.grad(scal(oracle_dense), argnums=(0, 1, 2, 3, 4))(*args[:5])
    for gp_taps in (0, 8):
        out_k = sweep_forward(*args, pad=pad, n_vertical=n_vertical,
                              gp_taps=gp_taps)
        for name, a, b in zip(("rgb", "nll", "nll_auto"), out_k, out_o):
            a, b = np.asarray(a), np.asarray(b)
            print(f"[gp{gp_taps}] fwd {name}: maxabs={np.abs(a-b).max():.3e}")

        gf = jax.grad(
            scal(lambda *a: fused_plane_sweep(*a, pad, False, n_vertical,
                                              True, False, 8, gp_taps)),
            argnums=(0, 1, 2, 3, 4),
        )(*args[:5])
        for name, a, b in zip(("src", "tgt", "log", "sig", "shift"), gf, go):
            a, b = np.asarray(a), np.asarray(b)
            print(f"[gp{gp_taps}] grad {name}: maxabs={np.abs(a-b).max():.3e} "
                  f"ref|max|={np.abs(b).max():.3e}")


def check_quad(n_vertical=49, gp_taps=14, rows=16, interpret=False,
               nonneg=True, with_auto=True):
    """Validate the phase-split (quad) kernel on hardware vs the dense
    oracle: forward outputs + d_log/d_sig/d_shift through the packing
    bijection (ops/pallas_sweep_quad.py; CPU parity lives in
    tests/test_pallas_sweep_quad.py — this is the real-TPU leg)."""
    from planedepth_tpu.ops import pallas_sweep_quad as q

    # W must satisfy the quad path's alignment precondition (W % 256 == 0:
    # half-res windows of W/2 + 128 lanes stay 128-aligned for Mosaic's
    # dynamic_rotate) — the production guard in train/step.py enforces the
    # same bound and falls back to the v1 kernel otherwise.
    B, H, W, N = 2, 64, 768, 63
    args = make(B, H, W, N, n_vertical=n_vertical)
    src, tgt, log, sig, shift, mask = args
    pad = 64
    out_o = oracle_dense(*args)
    if not with_auto:
        # the kernel emits only (rgb, nll): the oracle's nll_auto must not
        # contribute to the gradient cotangents either, or the grad columns
        # print spurious divergences during a flag bisection
        out_o = out_o[:2]
    g = [jnp.ones_like(o) for o in out_o]

    def scal_o(*a5):
        o = oracle_dense(*a5, mask)
        return sum(jnp.sum(x * y) for x, y in zip(o, g))

    go = jax.grad(scal_o, argnums=(2, 3, 4))(*args[:5])

    ls = jnp.stack([log, sig], 2).reshape(B, 2 * N, H, W)
    srcq = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgtq = q.s2d_image(jnp.moveaxis(tgt, 1, -1))

    def pack_ls(ls_):
        x = ls_.reshape(B, 2 * N, H // 2, 2, W // 2, 2)
        return x.transpose(0, 3, 5, 1, 2, 4).reshape(
            B, 8 * N, H // 2, W // 2)

    def quad_full(ls_, sh_):
        # nonneg=True is the production mode (shifts here are uniform >= 0)
        o = q.fused_plane_sweep_quad(
            srcq, tgtq, pack_ls(ls_), q.split_rows(sh_),
            q.split_rows(mask), pad, interpret, n_vertical, False,
            rows, gp_taps, with_auto, nonneg)
        outs = (jnp.moveaxis(q.d2s_quad(o[0]), -1, 1),
                q.d2s_quad(o[1])[..., 0])
        if with_auto:
            outs += (q.d2s_quad(o[2])[..., 0],)
        return outs

    tag = f"quad gp{gp_taps} nn{int(nonneg)} au{int(with_auto)}"
    out_k = jax.jit(quad_full)(ls, shift)
    for name, a, b in zip(("rgb", "nll", "nll_auto"), out_k, out_o):
        a, b = np.asarray(a), np.asarray(b)
        print(f"[{tag}] fwd {name}: maxabs={np.abs(a-b).max():.3e}")

    def scal_q(ls_, sh_):
        return sum(jnp.sum(x * y) for x, y in zip(quad_full(ls_, sh_), g))

    gl, gsh = jax.jit(jax.grad(scal_q, argnums=(0, 1)))(ls, shift)
    pairs = (
        ("log", np.asarray(gl[:, 0::2]), np.asarray(go[0])),
        ("sig", np.asarray(gl[:, 1::2]), np.asarray(go[1])),
        ("shift", np.asarray(gsh), np.asarray(go[2])),
    )
    for name, a, b in pairs:
        print(f"[{tag}] grad {name}: maxabs={np.abs(a-b).max():.3e} "
              f"ref|max|={np.abs(b).max():.3e}")


def timeit_shapes(B=8, n_vertical=49, gp_taps=8, rows=8):
    """Stage-1 HR shape with the PRODUCTION plane structure: 49 vertical
    planes (row-constant shifts -> vectorized kernel paths) + 14 ground
    planes (per-row shifts, linear in the row)."""
    H, W, N = 384, 1280, 63
    args = make(B, H, W, N, dtype=jnp.bfloat16, n_vertical=n_vertical,
                max_shift=300.0)
    pad = 328

    # Timing methodology: chain a scalarized output back into the next
    # call (forces serial device execution) and end every timed region
    # with a HOST READBACK — block_until_ready can return early on
    # relayed/remote backends; only device_get is a true barrier.  Timing
    # two different iteration counts and taking the slope cancels the
    # fixed dispatch/readback overhead.
    @jax.jit
    def fwd_probe(dummy, *a):
        a = (a[0] + dummy.astype(a[0].dtype) * 0,) + a[1:]
        o = sweep_forward(*a, pad=pad, n_vertical=n_vertical,
                          gp_taps=gp_taps, rows=rows)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in o)

    def slope(fn, n_small, n_big):
        def run(n):
            t0 = time.perf_counter()
            s = jnp.float32(0)
            for _ in range(n):
                s = fn(s * 0)
            float(jax.device_get(s))
            return time.perf_counter() - t0
        d_small = run(n_small)
        d_big = run(n_big)
        return (d_big - d_small) / (n_big - n_small)

    float(jax.device_get(fwd_probe(jnp.float32(0), *args)))   # compile
    dt = slope(lambda s: fwd_probe(s, *args), 2, 10)
    print(f"fwd kernel: {dt*1e3:.2f} ms (B{B} {H}x{W} N{N} nv{n_vertical} "
          f"gp{gp_taps} r{rows})")

    def loss(dummy, *a5):
        a5 = (a5[0] + dummy.astype(a5[0].dtype) * 0,) + a5[1:]
        o = fused_plane_sweep(*a5, args[5], pad, False, n_vertical,
                              True, False, rows, gp_taps)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in o)

    gr = jax.jit(jax.value_and_grad(loss, argnums=(1, 3, 4, 5)))

    def gr_scalar(s):
        v, _ = gr(s, *args[:5])
        return v

    float(jax.device_get(gr_scalar(jnp.float32(0))))          # compile
    dt = slope(gr_scalar, 2, 7)
    print(f"fwd+bwd: {dt*1e3:.2f} ms")


def timeit_quad(B=8, n_vertical=49, gp_taps=14, rows=8):
    """Time the PRODUCTION (quad, nonneg, with_disp) kernels at the
    stage-1 HR shape — fwd alone and fwd+grad through the custom VJP."""
    from planedepth_tpu.ops import pallas_sweep_quad as q

    H, W, N = 384, 1280, 63
    src, tgt, log, sig, shift, mask = make(
        B, H, W, N, dtype=jnp.bfloat16, n_vertical=n_vertical,
        max_shift=300.0)
    pad = 328
    srcq = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgtq = q.s2d_image(jnp.moveaxis(tgt, 1, -1))
    ls = jnp.stack([log, sig], 2).reshape(B, 2 * N, H, W)
    lsq = jnp.asarray(np.ascontiguousarray(
        np.asarray(ls, np.float32).reshape(B, 2 * N, H // 2, 2, W // 2, 2)
        .transpose(0, 3, 5, 1, 2, 4).reshape(B, 8 * N, H // 2, W // 2)
    )).astype(jnp.bfloat16)
    sh2, m2 = q.split_rows(shift), q.split_rows(mask)

    def slope(fn, n_small, n_big):
        def run(n):
            t0 = time.perf_counter()
            s = jnp.float32(0)
            for _ in range(n):
                s = fn(s * 0)
            float(jax.device_get(s))
            return time.perf_counter() - t0
        d_small = run(n_small)
        d_big = run(n_big)
        return (d_big - d_small) / (n_big - n_small)

    @jax.jit
    def fwd_probe(dummy):
        l_ = lsq + dummy.astype(lsq.dtype) * 0
        o = q.sweep_forward_quad(srcq, tgtq, l_, sh2, m2, pad=pad,
                                 rows=2 * rows, n_vertical=n_vertical,
                                 with_disp=True, gp_taps=gp_taps,
                                 with_auto=False, nonneg=True)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in o)

    float(jax.device_get(fwd_probe(jnp.float32(0))))           # compile
    dt = slope(fwd_probe, 2, 10)
    print(f"quad fwd: {dt*1e3:.2f} ms (B{B} {H}x{W} N{N} nv{n_vertical} "
          f"gp{gp_taps} r{rows} nonneg with_disp)")

    def loss(dummy, lsq_, sh_):
        lsq_ = lsq_ + dummy.astype(lsq_.dtype) * 0
        o = q.fused_plane_sweep_quad(
            srcq, tgtq, lsq_, sh_, m2, pad, False, n_vertical, True,
            2 * rows, gp_taps, False, True)   # with_auto=False, nonneg
        return sum(jnp.sum(x.astype(jnp.float32)) for x in o)

    gr = jax.jit(jax.value_and_grad(loss, argnums=(1, 2)))

    def gr_scalar(s):
        v, g = gr(s, lsq, sh2)
        return (v + sum(jnp.sum(x.astype(jnp.float32)) for x in
                        jax.tree_util.tree_leaves(g)))

    float(jax.device_get(gr_scalar(jnp.float32(0))))           # compile
    dt = slope(gr_scalar, 2, 7)
    print(f"quad fwd+bwd: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    elif mode == "check_quad":
        # check_quad [nonneg] [with_auto] [gp_taps] — bisect flags for
        # hardware-vs-interpret divergences
        check_quad(
            nonneg=bool(int(sys.argv[2])) if len(sys.argv) > 2 else True,
            with_auto=bool(int(sys.argv[3])) if len(sys.argv) > 3 else True,
            gp_taps=int(sys.argv[4]) if len(sys.argv) > 4 else 14,
        )
    elif mode == "time_quad":
        timeit_quad()
    else:
        gp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        rows = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        timeit_shapes(gp_taps=gp, rows=rows)
