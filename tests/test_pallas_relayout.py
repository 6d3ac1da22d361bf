"""Parity of the fused relayout+pad kernels (ops/pallas_relayout.py) and
of the s2d-direct quad sweep entry that rides them.

The relayout kernels replace XLA's channels-to-front copy + W-pad copy
pair on the quad sweep's ls operand (r4 trace: 9.3 + 4.2 ms/step at the
HR flagship shape).  Oracle: plain jnp moveaxis + pad.  The s2d entry
(`fused_plane_sweep_quad_s2d`) must match the existing
`fused_plane_sweep_quad` + `quad_ls_from_s2d` composition — values AND
gradients — since that path is itself v1/oracle parity-tested
(tests/test_pallas_sweep_quad.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planedepth_tpu.ops import pallas_sweep_quad as q
from planedepth_tpu.ops.pallas_relayout import relayout_nhwc, relayout_pad_nchw

PAD = 16
ROWS = 8
GP_TAPS = 4


def _oracle_pack(x, lpad, rpad):
    t = jnp.moveaxis(x, -1, 1)
    return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (lpad, rpad)))


@pytest.mark.parametrize("lpad,rpad", [(0, 128), (0, 256), (128, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_relayout_pad_nchw(lpad, rpad, dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 256, 13).astype(np.float32), dtype)
    got = relayout_pad_nchw(x, lpad, rpad, rows=8, interpret=True)
    assert got.dtype == dtype
    ref = _oracle_pack(x, lpad, rpad)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_relayout_pad_nchw_cast():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 128, 5).astype(np.float32))
    got = relayout_pad_nchw(x, 0, 128, rows=8, interpret=True,
                            out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    ref = _oracle_pack(x.astype(jnp.bfloat16), 0, 128)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_relayout_nhwc(dtype):
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(2, 13, 16, 256).astype(np.float32), dtype)
    got = relayout_nhwc(g, rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(jnp.moveaxis(g, 1, -1),
                                             np.float32))


def _mk_data(B=2, H=16, W=256, N=6, NV=4, seed=3):
    rng = np.random.RandomState(seed)
    src = (rng.randn(B, H, W, 3) * 0.3 + 0.5).astype(np.float32)
    tgt = (rng.randn(B, H, W, 3) * 0.3 + 0.5).astype(np.float32)
    # ls_s2d as the decoder emits it: (B, H/2, W/2, 4*2N), (py, px, j)
    ls_s2d = rng.randn(B, H // 2, W // 2, 8 * N).astype(np.float32)
    # keep sigma channels positive (interleaved odd j within each phase)
    ls_s2d = ls_s2d.reshape(B, H // 2, W // 2, 4, N, 2)
    ls_s2d[..., 1] = 0.05 + 0.9 / (1 + np.exp(-ls_s2d[..., 1]))
    ls_s2d = ls_s2d.reshape(B, H // 2, W // 2, 8 * N)
    shift = np.zeros((B, H, N), np.float32)
    shift[:, :, :NV] = rng.uniform(0, 10, (B, 1, NV))
    rows = np.arange(H, dtype=np.float32)[None, :, None]
    shift[:, :, NV:] = (rng.uniform(0, 6, (B, 1, N - NV))
                        + rng.uniform(0.05, 0.4, (B, 1, N - NV)) * rows)
    mask = np.ones((B, H, N), np.float32)
    mask[:, :, 1] = 0.0
    return (jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(ls_s2d),
            jnp.asarray(shift), jnp.asarray(mask))


@pytest.mark.parametrize("nonneg", [True, False])
@pytest.mark.parametrize("with_disp", [False, True])
def test_s2d_entry_matches_quad(with_disp, nonneg):
    """fused_plane_sweep_quad_s2d (Pallas relayout in its fwd AND bwd at
    this aligned shape: W2=128, nonneg pads 0/256, signed pads 128/256 —
    the lpad=128 halo rotation rides the relayout kernel too) == the quad
    kernel fed by the XLA repack, values + d_ls_s2d + d_shift."""
    N, NV = 6, 4
    src, tgt, ls_s2d, shift, mask = _mk_data(N=N, NV=NV)
    srcq = q.s2d_image(src)
    tgtq = q.s2d_image(tgt)
    sh2, mk2 = q.split_rows(shift), q.split_rows(mask)
    pad2 = q._quad_pad(PAD, GP_TAPS)
    lpad = q._quad_lpad(pad2, nonneg)
    assert lpad == (0 if nonneg else 128)
    assert q._relayout_ok(ls_s2d, lpad, pad2 + q._quad_slack(pad2, GP_TAPS))

    def run_ref(ls_, sh_):
        return q.fused_plane_sweep_quad(
            srcq, tgtq, q.quad_ls_from_s2d(ls_), sh_, mk2,
            PAD, True, NV, with_disp, ROWS, GP_TAPS, True, nonneg,
        )

    def run_s2d(ls_, sh_):
        return q.fused_plane_sweep_quad_s2d(
            srcq, tgtq, ls_, sh_, mk2, None,
            PAD, True, NV, with_disp, ROWS, GP_TAPS, True, nonneg,
        )

    ref = run_ref(ls_s2d, sh2)
    got = run_s2d(ls_s2d, sh2)
    assert len(ref) == len(got)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-6, atol=2e-6, err_msg=f"output {i}",
        )

    rng = np.random.RandomState(7)
    ws = [jnp.asarray(rng.randn(*np.asarray(o).shape).astype(np.float32))
          for o in ref]

    def loss(run, ls_, sh_):
        return sum(jnp.sum(w * o) for w, o in zip(ws, run(ls_, sh_)))

    v_ref, (dls_ref, dsh_ref) = jax.value_and_grad(
        lambda a, b: loss(run_ref, a, b), argnums=(0, 1))(ls_s2d, sh2)
    v_got, (dls_got, dsh_got) = jax.value_and_grad(
        lambda a, b: loss(run_s2d, a, b), argnums=(0, 1))(ls_s2d, sh2)

    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    for name, rg, gg in (("d_ls_s2d", dls_ref, dls_got),
                         ("d_shift", dsh_ref, dsh_got)):
        scale = max(float(jnp.max(jnp.abs(rg))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gg) / scale, np.asarray(rg) / scale,
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


@pytest.mark.parametrize("with_bias", [False, True])
def test_s2d_entry_sigma_epilogue(with_bias):
    """sigma_epilogue=True on a RAW head (bias add + epilogue inside the
    relayout kernel at this aligned shape) == ls_epilogue applied in XLA
    + the plain entry — values and gradients w.r.t. the raw head, the
    bias and shift."""
    N, NV = 6, 4
    src, tgt, _, shift, mask = _mk_data(N=N, NV=NV)
    rng = np.random.RandomState(11)
    raw = jnp.asarray(rng.randn(2, 8, 128, 8 * N).astype(np.float32))
    bias = (jnp.asarray(rng.randn(8 * N).astype(np.float32)) * 0.5
            if with_bias else None)
    srcq = q.s2d_image(src)
    tgtq = q.s2d_image(tgt)
    sh2, mk2 = q.split_rows(shift), q.split_rows(mask)

    def run(ls_, b_, sh_, epi):
        ls_in = ls_ if epi else q.ls_epilogue(ls_, b_)
        return q.fused_plane_sweep_quad_s2d(
            srcq, tgtq, ls_in, sh_, mk2, b_ if epi else None,
            PAD, True, NV, True, ROWS, GP_TAPS, True, True, epi,
        )

    ref = run(raw, bias, sh2, False)
    got = run(raw, bias, sh2, True)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-6, atol=2e-6, err_msg=f"output {i}",
        )

    ws = [jnp.asarray(rng.randn(*np.asarray(o).shape).astype(np.float32))
          for o in ref]

    argnums = (1, 3) if not with_bias else (1, 2, 3)

    def loss(epi, ls_, b_, sh_):
        return sum(jnp.sum(w * o)
                   for w, o in zip(ws, run(ls_, b_, sh_, epi)))

    grads_ref = jax.value_and_grad(loss, argnums=argnums)(
        False, raw, bias, sh2)
    grads_got = jax.value_and_grad(loss, argnums=argnums)(
        True, raw, bias, sh2)
    np.testing.assert_allclose(float(grads_got[0]), float(grads_ref[0]),
                               rtol=1e-6)
    names = ("d_raw", "d_shift") if not with_bias else (
        "d_raw", "d_bias", "d_shift")
    for name, rg, gg in zip(names, grads_ref[1], grads_got[1]):
        scale = max(float(jnp.max(jnp.abs(rg))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gg) / scale, np.asarray(rg) / scale,
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_s2d_entry_unaligned_fallback():
    """Unaligned W2 (not a 128 multiple) must take the XLA repack branch
    and still match — the CPU-test / dryrun shapes ride this."""
    N, NV = 5, 3
    src, tgt, ls_s2d, shift, mask = _mk_data(W=64, N=N, NV=NV, seed=9)
    srcq = q.s2d_image(src)
    tgtq = q.s2d_image(tgt)
    sh2, mk2 = q.split_rows(shift), q.split_rows(mask)
    assert not q._relayout_ok(ls_s2d, 0, 256)

    args = (PAD, True, NV, True, ROWS, GP_TAPS, True, True)
    ref = q.fused_plane_sweep_quad(
        srcq, tgtq, q.quad_ls_from_s2d(ls_s2d), sh2, mk2, *args)
    got = q.fused_plane_sweep_quad_s2d(
        srcq, tgtq, ls_s2d, sh2, mk2, None, *args)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-6, atol=2e-6, err_msg=f"output {i}",
        )
