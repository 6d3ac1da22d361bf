"""Parity of the phase-split (quad) sweep kernel vs the v1 kernel.

The v1 kernel (ops/pallas_sweep.py) is itself oracle-tested against the
differentiable XLA reference (tests/test_pallas_sweep.py); the quad
kernel must reproduce it exactly (same math, different data layout), so
these tests compare values AND all gradients through the packing
bijection in interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planedepth_tpu.ops.pallas_sweep import fused_plane_sweep_packed
from planedepth_tpu.ops import pallas_sweep_quad as q

PAD = 16
ROWS = 8          # full-res rows per block (both kernels)
GP_TAPS = 4


def _pack_ls(ls):
    """Full-res interleaved (B, 2N, H, W) -> quad (B, 4*2N, H/2, W/2)."""
    B, C, H, W = ls.shape
    x = ls.reshape(B, C, H // 2, 2, W // 2, 2)
    return x.transpose(0, 3, 5, 1, 2, 4).reshape(B, 4 * C, H // 2, W // 2)


def _mk_data(B=2, H=16, W=64, N=6, NV=4, seed=0, nonneg=False):
    rng = np.random.RandomState(seed)
    src = (rng.randn(B, 3, H, W) * 0.3 + 0.5).astype(np.float32)
    tgt = (rng.randn(B, 3, H, W) * 0.3 + 0.5).astype(np.float32)
    logits = rng.randn(B, N, H, W).astype(np.float32)
    sigma = (0.05 + 0.9 / (1 + np.exp(-rng.randn(B, N, H, W)))).astype(
        np.float32)
    ls = np.stack([logits, sigma], axis=2).reshape(B, 2 * N, H, W)
    # vertical planes: row-constant shifts; ground planes: row-linear
    # with block spread within GP_TAPS
    shift = np.zeros((B, H, N), np.float32)
    lo = 0 if nonneg else -10
    shift[:, :, :NV] = rng.uniform(lo, 10, (B, 1, NV))
    rows = np.arange(H, dtype=np.float32)[None, :, None]
    base = rng.uniform(0 if nonneg else -6, 6, (B, 1, N - NV))
    slope = rng.uniform(0.05, 0.4, (B, 1, N - NV))
    shift[:, :, NV:] = base + slope * rows
    # masks: vertical planes row-constant (the v1 kernel's vec path reads
    # the block's first row); ground planes per-row
    mask = np.ones((B, H, N), np.float32)
    mask[:, :, 1] = 0.0
    if N > NV:
        mask[:, H // 2 :, NV] = 0.0
    return (jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(ls),
            jnp.asarray(shift), jnp.asarray(mask))


def _v1(src, tgt, ls, shift, mask, nv, with_disp):
    return fused_plane_sweep_packed(
        src, tgt, ls, shift, mask, PAD, True, nv, False, with_disp,
        ROWS, GP_TAPS,
    )


def _quad(src, tgt, ls, shift, mask, nv, with_disp, nonneg=False):
    src_q = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgt_q = q.s2d_image(jnp.moveaxis(tgt, 1, -1))
    out = q.fused_plane_sweep_quad(
        src_q, tgt_q, _pack_ls(ls), q.split_rows(shift),
        q.split_rows(mask), PAD, True, nv, with_disp, ROWS, GP_TAPS,
        True, nonneg,
    )
    rgb = jnp.moveaxis(q.d2s_quad(out[0]), -1, 1)
    nll = q.d2s_quad(out[1])[..., 0]
    nla = q.d2s_quad(out[2])[..., 0]
    res = [rgb, nll, nla]
    if with_disp:
        res.append(q.d2s_quad(out[3])[..., 0])
    return tuple(res)


def _d2s_scalar(x4):
    """(B, 4, Hq, W2) -> (B, H, W)."""
    return q.d2s_quad(x4)[..., 0]


@pytest.mark.parametrize("with_disp", [False, True])
@pytest.mark.parametrize("nv_all", [False, True])
def test_forward_parity(with_disp, nv_all):
    N, NV = (6, 6) if nv_all else (6, 4)
    data = _mk_data(N=N, NV=NV)
    ref = _v1(*data, NV, with_disp)
    got = _quad(*data, NV, with_disp)
    assert len(ref) == len(got)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=f"output {i}",
        )


@pytest.mark.parametrize("with_disp", [False, True])
def test_grad_parity(with_disp):
    N, NV = 6, 4
    src, tgt, ls, shift, mask = _mk_data(N=N, NV=NV)
    rng = np.random.RandomState(7)
    n_out = 4 if with_disp else 3
    ws = [jnp.asarray(rng.randn(*np.asarray(o).shape).astype(np.float32))
          for o in _v1(src, tgt, ls, shift, mask, NV, with_disp)]

    def loss_v1(ls_, shift_):
        outs = _v1(src, tgt, ls_, shift_, mask, NV, with_disp)
        return sum(jnp.sum(w * o) for w, o in zip(ws, outs))

    def loss_q(ls_, shift_):
        outs = _quad(src, tgt, ls_, shift_, mask, NV, with_disp)
        return sum(jnp.sum(w * o) for w, o in zip(ws, outs))

    v_ref, (dls_ref, dsh_ref) = jax.value_and_grad(
        loss_v1, argnums=(0, 1))(ls, shift)
    v_got, (dls_got, dsh_got) = jax.value_and_grad(
        loss_q, argnums=(0, 1))(ls, shift)

    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for name, rg, gg in (("d_ls", dls_ref, dls_got),
                         ("d_shift", dsh_ref, dsh_got)):
        scale = max(float(jnp.max(jnp.abs(rg))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gg) / scale, np.asarray(rg) / scale,
            rtol=5e-5, atol=5e-5, err_msg=name,
        )


@pytest.mark.parametrize("with_disp", [False, True])
def test_nonneg_parity(with_disp):
    """The production mode (nonneg=True: zero left halo, pad-once
    residuals) must match v1 on nonnegative disparities — values AND
    gradients."""
    N, NV = 6, 4
    src, tgt, ls, shift, mask = _mk_data(N=N, NV=NV, seed=11, nonneg=True)
    assert float(jnp.min(shift)) >= 0.0
    rng = np.random.RandomState(5)
    ws = [jnp.asarray(rng.randn(*np.asarray(o).shape).astype(np.float32))
          for o in _v1(src, tgt, ls, shift, mask, NV, with_disp)]

    def loss_v1(ls_, shift_):
        outs = _v1(src, tgt, ls_, shift_, mask, NV, with_disp)
        return sum(jnp.sum(w * o) for w, o in zip(ws, outs))

    def loss_q(ls_, shift_):
        outs = _quad(src, tgt, ls_, shift_, mask, NV, with_disp,
                     nonneg=True)
        return sum(jnp.sum(w * o) for w, o in zip(ws, outs))

    v_ref, (dls_ref, dsh_ref) = jax.value_and_grad(
        loss_v1, argnums=(0, 1))(ls, shift)
    v_got, (dls_got, dsh_got) = jax.value_and_grad(
        loss_q, argnums=(0, 1))(ls, shift)

    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for name, rg, gg in (("d_ls", dls_ref, dls_got),
                         ("d_shift", dsh_ref, dsh_got)):
        scale = max(float(jnp.max(jnp.abs(rg))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gg) / scale, np.asarray(rg) / scale,
            rtol=5e-5, atol=5e-5, err_msg=name,
        )


def test_nonneg_window_extent_boundary():
    """nonneg mode at the positive clip limit: windows reach the exact
    right edge of the asymmetrically padded buffer."""
    from planedepth_tpu.ops.pallas_sweep_quad import _clip_shift_q, _quad_pad

    B, H, W, N, NV = 2, 16, 64, 6, 4
    src, tgt, ls, _, mask = _mk_data(B=B, H=H, W=W, N=N, NV=NV)

    pad2 = _quad_pad(PAD, GP_TAPS)
    lim = float(_clip_shift_q(jnp.full((1,), 1e9), pad2, GP_TAPS)[0])
    shift = np.zeros((B, H, N), np.float32)
    shift[:, :, :NV] = lim - 1.5
    rows = np.arange(H, dtype=np.float32)[None, :, None]
    shift[:, :, NV:] = lim - 1.5 - 0.3 * (H - 1 - rows)
    shift_j = jnp.asarray(shift)

    pad_v1 = int(lim) + 4     # v1 clip (pad-2) must not bind
    ref = fused_plane_sweep_packed(
        src, tgt, ls, shift_j, jnp.asarray(mask), pad_v1, True, NV,
        False, False, ROWS, GP_TAPS,
    )
    src_q = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgt_q = q.s2d_image(jnp.moveaxis(tgt, 1, -1))
    out = q.fused_plane_sweep_quad(
        src_q, tgt_q, _pack_ls(ls), q.split_rows(shift_j),
        q.split_rows(mask), PAD, True, NV, False, ROWS, GP_TAPS, True,
        True,
    )
    got = (jnp.moveaxis(q.d2s_quad(out[0]), -1, 1),
           _d2s_scalar(out[1]), _d2s_scalar(out[2]))
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=f"output {i}",
        )


@pytest.mark.parametrize("with_disp", [False, True])
def test_no_auto_parity(with_disp):
    """with_auto=False (production: recipes without automask) drops the
    nll_auto output and its per-plane exp, leaving every other output
    and gradient identical."""
    N, NV = 6, 4
    src, tgt, ls, shift, mask = _mk_data(N=N, NV=NV, seed=13)
    src_q = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgt_q = q.s2d_image(jnp.moveaxis(tgt, 1, -1))

    def run(with_auto, ls_, shift_):
        return q.fused_plane_sweep_quad(
            src_q, tgt_q, _pack_ls(ls_), q.split_rows(shift_),
            q.split_rows(mask), PAD, True, NV, with_disp, ROWS, GP_TAPS,
            with_auto, False,
        )

    ref = run(True, ls, shift)
    got = run(False, ls, shift)
    ref_wo = (ref[0], ref[1]) + tuple(ref[3:])     # drop nll_auto
    assert len(got) == len(ref_wo)
    for i, (r, g) in enumerate(zip(ref_wo, got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-6,
            err_msg=f"output {i}",
        )

    rng = np.random.RandomState(3)
    ws = [jnp.asarray(rng.randn(*np.asarray(o).shape).astype(np.float32))
          for o in got]

    def loss(with_auto, ls_, shift_):
        outs = run(with_auto, ls_, shift_)
        if with_auto:
            outs = (outs[0], outs[1]) + tuple(outs[3:])
        return sum(jnp.sum(w * o) for w, o in zip(ws, outs))

    g_ref = jax.grad(lambda l, s: loss(True, l, s), argnums=(0, 1))(
        ls, shift)
    g_got = jax.grad(lambda l, s: loss(False, l, s), argnums=(0, 1))(
        ls, shift)
    for name, rg, gg in zip(("d_ls", "d_shift"), g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(rg), rtol=1e-6, atol=1e-6,
            err_msg=name,
        )


def test_pack_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    assert np.allclose(q.d2s_quad(q.s2d_image(x)), x)
    ls = jnp.asarray(rng.randn(2, 6, 8, 12).astype(np.float32))
    # pack matches the decoder's (py, px, j) channel order
    pk = _pack_ls(ls)
    for py in range(2):
        for px in range(2):
            for j in range(6):
                np.testing.assert_array_equal(
                    np.asarray(pk[:, (py * 2 + px) * 6 + j]),
                    np.asarray(ls[:, j, py::2, px::2]),
                )


def test_window_extent_boundary_parity():
    """Shifts near the QUAD clip limit: the roll windows reach the exact
    edge of the padded buffer (end == W2p with the minimal _quad_slack),
    so any off-by-one in the slack derivation shows up as clamped reads
    breaking parity.  The v1 reference gets a larger pad so its own
    (tighter, pad-2) clip never binds."""
    from planedepth_tpu.ops.pallas_sweep_quad import _clip_shift_q, _quad_pad

    B, H, W, N, NV = 2, 16, 64, 6, 4
    src, tgt, ls, _, mask = _mk_data(B=B, H=H, W=W, N=N, NV=NV)

    pad2 = _quad_pad(PAD, GP_TAPS)
    lim = float(_clip_shift_q(jnp.full((1,), 1e9), pad2, GP_TAPS)[0])
    rng = np.random.RandomState(7)
    shift = np.zeros((B, H, N), np.float32)
    # vertical: both signs at the limit (fractional to hit both taps)
    shift[:, :, :NV] = rng.choice([-1.0, 1.0], (B, 1, NV)) * (lim - 1.5)
    # ground planes: rows sweeping up to the limit from both sides
    rows = np.arange(H, dtype=np.float32)[None, :, None]
    sgn = rng.choice([-1.0, 1.0], (B, 1, N - NV))
    shift[:, :, NV:] = sgn * (lim - 1.5 - 0.3 * (H - 1 - rows))
    shift_j = jnp.asarray(shift)

    pad_v1 = int(lim) + 4     # v1 clip (pad-2) must not bind
    ref = fused_plane_sweep_packed(
        src, tgt, ls, shift_j, jnp.asarray(mask), pad_v1, True, NV,
        False, False, ROWS, GP_TAPS,
    )
    src_q = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgt_q = q.s2d_image(jnp.moveaxis(tgt, 1, -1))
    out = q.fused_plane_sweep_quad(
        src_q, tgt_q, _pack_ls(ls), q.split_rows(shift_j),
        q.split_rows(mask), PAD, True, NV, False, ROWS, GP_TAPS,
    )
    got = (jnp.moveaxis(q.d2s_quad(out[0]), -1, 1),
           _d2s_scalar(out[1]), _d2s_scalar(out[2]))
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=f"output {i}",
        )


def test_production_rows16_gp_spread_parity():
    """REGRESSION (r3): the production quad call spans 2*sweep_rows = 16
    full-res rows per block, so its ground-plane integer-shift spread can
    reach the 16-row bound (14 px, test_gp_spread's worst16) — far above
    the v1 8-row bound (8).  Passing the v1 taps value silently CLIPS the
    tap grid (row_onehots' d_vec clip) and mis-samples every ground plane
    with production-magnitude slopes (~0.8 px/row).  This pins the
    production configuration: rows=16, gp_taps=sweep_gp_taps_quad=14."""
    from planedepth_tpu.config import TrainConfig

    cfg = TrainConfig()
    B, H, W, N, NV = 2, 32, 64, 6, 2
    rng = np.random.RandomState(3)
    src = (rng.rand(B, 3, H, W)).astype(np.float32)
    tgt = (rng.rand(B, 3, H, W)).astype(np.float32)
    logits = rng.randn(B, N, H, W).astype(np.float32)
    sigma = (0.05 + 0.9 / (1 + np.exp(-rng.randn(B, N, H, W)))).astype(
        np.float32)
    ls = jnp.asarray(np.stack([logits, sigma], 2).reshape(B, 2 * N, H, W))
    shift = np.zeros((B, H, N), np.float32)
    shift[:, :, :NV] = rng.uniform(0, 10, (B, 1, NV))
    rows = np.arange(H, dtype=np.float32)[None, :, None]
    # production-magnitude ground-plane slopes: spread over a 16-row
    # block in (8, 14] — inside the quad bound, outside the v1 one
    slope = rng.uniform(0.6, 0.85, (B, 1, N - NV))
    shift[:, :, NV:] = rng.uniform(0, 4, (B, 1, N - NV)) + slope * rows
    mask = np.ones((B, H, N), np.float32)
    mask[:, H // 2:, NV] = 0.0
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)
    shift_j, mask_j = jnp.asarray(shift), jnp.asarray(mask)

    pad = int(shift.max()) + 8
    # reference: v1 kernel at its own production geometry (8-row blocks)
    ref = fused_plane_sweep_packed(
        src, tgt, ls, shift_j, mask_j, pad, True, NV, False, False,
        cfg.sweep_rows, cfg.sweep_gp_taps,
    )
    src_q = q.s2d_image(jnp.moveaxis(src, 1, -1))
    tgt_q = q.s2d_image(jnp.moveaxis(tgt, 1, -1))
    out = q.fused_plane_sweep_quad(
        src_q, tgt_q, _pack_ls(ls), q.split_rows(shift_j),
        q.split_rows(mask_j), pad, True, NV, False,
        2 * cfg.sweep_rows, cfg.sweep_gp_taps_quad, True, True,
    )
    got = (jnp.moveaxis(q.d2s_quad(out[0]), -1, 1),
           _d2s_scalar(out[1]), _d2s_scalar(out[2]))
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=f"output {i}",
        )
