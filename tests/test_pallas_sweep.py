"""Fused Pallas plane-sweep: forward vs dense oracle, custom VJP vs autodiff,
and oracle vs the existing view-synthesis + mixture-NLL composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.ops.pallas_sweep import (
    fused_plane_sweep,
    oracle_dense,
    oracle_disp_center,
    sweep_forward,
)

pytestmark = pytest.mark.heavy

B, H, W, N = 2, 8, 64, 6
PAD = 12
RNG = np.random.default_rng(17)


def _inputs():
    src = RNG.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    tgt = RNG.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    logits = RNG.standard_normal((B, N, H, W)).astype(np.float32)
    sigma = RNG.uniform(0.05, 0.95, (B, N, H, W)).astype(np.float32)
    shift = RNG.uniform(-8.0, 8.0, (B, H, N)).astype(np.float32)
    mask = (RNG.uniform(0, 1, (B, H, N)) > 0.2).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (src, tgt, logits, sigma, shift,
                                          mask))


def test_kernel_forward_matches_oracle():
    args = _inputs()
    rgb_k, nll_k, nlla_k = sweep_forward(*args, pad=PAD, rows=4,
                                         interpret=True)
    rgb_o, nll_o, nlla_o = oracle_dense(*args)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nll_k), np.asarray(nll_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nlla_k), np.asarray(nlla_o),
                               rtol=1e-4, atol=1e-4)


def test_vectorized_vertical_path_matches():
    """n_vertical > 0 (row-vectorized planes) must equal the generic path
    when the first planes' shifts are row-constant."""
    src, tgt, logits, sigma, shift, mask = _inputs()
    nv = 3
    shift = shift.at[:, :, :nv].set(
        jnp.broadcast_to(shift[:, :1, :nv], shift[:, :, :nv].shape)
    )
    mask = mask.at[:, :, :nv].set(1.0)
    a = sweep_forward(src, tgt, logits, sigma, shift, mask, pad=PAD,
                      rows=4, interpret=True, n_vertical=nv)
    b = sweep_forward(src, tgt, logits, sigma, shift, mask, pad=PAD,
                      rows=4, interpret=True, n_vertical=0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)

    g = tuple(jnp.ones_like(o) for o in a)

    def scalarize(nv_):
        def wrapped(*a5):
            o = fused_plane_sweep(*a5, mask, PAD, True, nv_)
            return sum(jnp.sum(x * y) for x, y in zip(o, g))
        return wrapped

    ga = jax.grad(scalarize(nv), argnums=(0, 2, 3, 4))(src, tgt, logits,
                                                       sigma, shift)
    gb = jax.grad(scalarize(0), argnums=(0, 2, 3, 4))(src, tgt, logits,
                                                      sigma, shift)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    args = _inputs()
    g_rgb = jnp.asarray(RNG.standard_normal((B, 3, H, W)).astype(np.float32))
    g_nll = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))
    g_nla = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))

    def scalarize(fn):
        def wrapped(src, tgt, logits, sigma, shift):
            rgb, nll, nlla = fn(src, tgt, logits, sigma, shift, args[5])
            return (
                jnp.sum(rgb * g_rgb) + jnp.sum(nll * g_nll)
                + jnp.sum(nlla * g_nla)
            )
        return wrapped

    fused = scalarize(
        lambda *a: fused_plane_sweep(*a, PAD, True)
    )
    oracle = scalarize(oracle_dense)

    grads_f = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(*args[:5])
    grads_o = jax.grad(oracle, argnums=(0, 1, 2, 3, 4))(*args[:5])
    names = ("src", "target", "logits", "sigma", "shift")
    for gf, go, name in zip(grads_f, grads_o, names):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), rtol=2e-3, atol=2e-4,
            err_msg=name,
        )


def test_image_grads_off_matches_for_live_cotangents():
    """The production VJP config (image_grads=False — the train step never
    differentiates the batch images) must produce identical logits/sigma/
    shift gradients and exact-zero src/tgt cotangents."""
    args = _inputs()
    g_rgb = jnp.asarray(RNG.standard_normal((B, 3, H, W)).astype(np.float32))
    g_nll = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))
    g_nla = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))

    def scalarize(image_grads):
        def wrapped(src, tgt, logits, sigma, shift):
            rgb, nll, nlla = fused_plane_sweep(
                src, tgt, logits, sigma, shift, args[5], PAD, True, 0,
                image_grads,
            )
            return (
                jnp.sum(rgb * g_rgb) + jnp.sum(nll * g_nll)
                + jnp.sum(nlla * g_nla)
            )
        return wrapped

    full = jax.grad(scalarize(True), argnums=(0, 1, 2, 3, 4))(*args[:5])
    slim = jax.grad(scalarize(False), argnums=(0, 1, 2, 3, 4))(*args[:5])
    for name, i in (("logits", 2), ("sigma", 3), ("shift", 4)):
        np.testing.assert_allclose(
            np.asarray(slim[i]), np.asarray(full[i]), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )
    assert float(jnp.abs(slim[0]).max()) == 0.0
    assert float(jnp.abs(slim[1]).max()) == 0.0


def test_bf16_inputs_emit_bf16_grads():
    """Production dtype flow: bf16 logits/sigma in -> bf16 d_log/d_sig out
    (HBM halving), with values close to the f32 path."""
    src, tgt, logits, sigma, shift, mask = _inputs()
    lb, sb = logits.astype(jnp.bfloat16), sigma.astype(jnp.bfloat16)

    def loss(l, s):
        rgb, nll, _ = fused_plane_sweep(
            src.astype(jnp.bfloat16), tgt.astype(jnp.bfloat16), l, s,
            shift, mask, PAD, True, 0, False,
        )
        return jnp.sum(rgb.astype(jnp.float32)) + jnp.sum(nll)

    gl, gs = jax.grad(loss, argnums=(0, 1))(lb, sb)
    assert gl.dtype == jnp.bfloat16 and gs.dtype == jnp.bfloat16

    def loss32(l, s):
        rgb, nll, _ = fused_plane_sweep(
            src, tgt, l, s, shift, mask, PAD, True, 0, False,
        )
        return jnp.sum(rgb) + jnp.sum(nll)

    gl32, gs32 = jax.grad(loss32, argnums=(0, 1))(logits, sigma)
    scale = float(jnp.abs(gl32).max())
    assert float(jnp.abs(gl.astype(jnp.float32) - gl32).max()) < 0.03 * scale


def test_with_disp_forward_matches_center_oracle():
    """The fused expected-disparity head (center samples) must equal the
    XLA mixture_reweight/contraction chain."""
    args = _inputs()
    out = sweep_forward(*args, pad=PAD, rows=4, interpret=True,
                        with_disp=True)
    assert len(out) == 4
    ref = oracle_disp_center(args[2], args[3], args[4], args[5])
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the first three outputs are unchanged by the fused head
    base = sweep_forward(*args, pad=PAD, rows=4, interpret=True)
    for a, b in zip(out[:3], base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_with_disp_vjp_matches_autodiff():
    """Gradients through (rgb, nll, nlla, disp) jointly match autodiff of
    the dense oracle + center-disp oracle — in particular the analytic
    S0 == 0 simplification of the disp softmax coupling."""
    args = _inputs()
    g_rgb = jnp.asarray(RNG.standard_normal((B, 3, H, W)).astype(np.float32))
    g_nll = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))
    g_nla = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))
    g_dsp = jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32))

    def fused(logits, sigma, shift):
        rgb, nll, nlla, disp = fused_plane_sweep(
            args[0], args[1], logits, sigma, shift, args[5],
            PAD, True, 0, False, True,
        )
        return (jnp.sum(rgb * g_rgb) + jnp.sum(nll * g_nll)
                + jnp.sum(nlla * g_nla) + jnp.sum(disp * g_dsp))

    def oracle(logits, sigma, shift):
        rgb, nll, nlla = oracle_dense(
            args[0], args[1], logits, sigma, shift, args[5]
        )
        disp = oracle_disp_center(logits, sigma, shift, args[5])
        return (jnp.sum(rgb * g_rgb) + jnp.sum(nll * g_nll)
                + jnp.sum(nlla * g_nla) + jnp.sum(disp * g_dsp))

    gf = jax.grad(fused, argnums=(0, 1, 2))(*args[2:5])
    go = jax.grad(oracle, argnums=(0, 1, 2))(*args[2:5])
    for f, o, name in zip(gf, go, ("logits", "sigma", "shift")):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(o), rtol=2e-3, atol=2e-4,
            err_msg=name,
        )


def test_with_disp_and_image_grads_combination():
    """with_disp=True together with the DEFAULT image_grads=True (the
    combination outside the train step) must differentiate — regression
    for a carry-unpack bug in the backward kernel."""
    args = _inputs()

    def loss(src, tgt, logits, sigma, shift):
        rgb, nll, nlla, disp = fused_plane_sweep(
            src, tgt, logits, sigma, shift, args[5], PAD, True, 0,
            True, True,
        )
        return (jnp.sum(rgb) + jnp.sum(nll) + jnp.sum(nlla)
                + jnp.sum(disp))

    g = jax.grad(loss, argnums=(0, 2, 4))(*args[:5])
    ref_rgb, ref_nll, ref_nla = oracle_dense(*args)
    ref_disp = oracle_disp_center(args[2], args[3], args[4], args[5])

    def oracle(src, tgt, logits, sigma, shift):
        rgb, nll, nlla = oracle_dense(src, tgt, logits, sigma, shift,
                                      args[5])
        disp = oracle_disp_center(logits, sigma, shift, args[5])
        return (jnp.sum(rgb) + jnp.sum(nll) + jnp.sum(nlla)
                + jnp.sum(disp))

    go = jax.grad(oracle, argnums=(0, 2, 4))(*args[:5])
    for a, b, name in zip(g, go, ("src", "logits", "shift")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_packed_forward_and_vjp_match_unpacked():
    """fused_plane_sweep_packed on a pre-interleaved (B, 2N, H, W) ls
    buffer (the merged s2d head layout) == the unpacked op, and its d_ls
    cotangent interleaves d_log/d_sig exactly."""
    from planedepth_tpu.ops.pallas_sweep import fused_plane_sweep_packed

    src, tgt, logits, sigma, shift, mask = _inputs()
    ls = jnp.stack([logits, sigma], axis=2).reshape(B, 2 * N, H, W)

    for with_disp in (False, True):
        out_p = fused_plane_sweep_packed(
            src, tgt, ls, shift, mask, PAD, True, 0, False, with_disp,
        )
        out_u = fused_plane_sweep(
            src, tgt, logits, sigma, shift, mask, PAD, True, 0, False,
            with_disp,
        )
        for xp, xu in zip(out_p, out_u):
            np.testing.assert_array_equal(np.asarray(xp), np.asarray(xu))

        gs = [jnp.asarray(RNG.standard_normal(o.shape).astype(np.float32))
              for o in out_p]

        def packed_loss(ls_, shift_):
            o = fused_plane_sweep_packed(
                src, tgt, ls_, shift_, mask, PAD, True, 0, False, with_disp,
            )
            return sum(jnp.sum(x * g) for x, g in zip(o, gs))

        def unpacked_loss(logits_, sigma_, shift_):
            o = fused_plane_sweep(
                src, tgt, logits_, sigma_, shift_, mask, PAD, True, 0,
                False, with_disp,
            )
            return sum(jnp.sum(x * g) for x, g in zip(o, gs))

        d_ls, d_shift_p = jax.grad(packed_loss, argnums=(0, 1))(ls, shift)
        d_log, d_sig, d_shift_u = jax.grad(
            unpacked_loss, argnums=(0, 1, 2))(logits, sigma, shift)
        d_ls_ref = jnp.stack([d_log, d_sig], axis=2).reshape(B, 2 * N, H, W)
        np.testing.assert_array_equal(np.asarray(d_ls),
                                      np.asarray(d_ls_ref))
        np.testing.assert_array_equal(np.asarray(d_shift_p),
                                      np.asarray(d_shift_u))


def test_manual_xla_adjoint_matches_autodiff():
    """The scan-based XLA adjoint (_sweep_bwd, the kernel's reference
    derivation) == autodiff of the dense oracle."""
    from planedepth_tpu.ops.pallas_sweep import _sweep_bwd

    args = _inputs()
    cts = (
        jnp.asarray(RNG.standard_normal((B, 3, H, W)).astype(np.float32)),
        jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32)),
        jnp.asarray(RNG.standard_normal((B, H, W)).astype(np.float32)),
    )
    grads_m = _sweep_bwd(*args, cts)

    def scal(src, tgt, logits, sigma, shift):
        o = oracle_dense(src, tgt, logits, sigma, shift, args[5])
        return sum(jnp.sum(x * y) for x, y in zip(o, cts))

    grads_o = jax.grad(scal, argnums=(0, 1, 2, 3, 4))(*args[:5])
    for gm, go in zip(grads_m[:5], grads_o):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(go), rtol=2e-3, atol=2e-4
        )


H2 = 16        # two 8-row blocks for the taps-path tests


def _inputs_gp(max_slope=0.9):
    """Inputs with shift fields LINEAR in the row (the ground-plane
    structure): per-8-row-block integer spread <= ceil(7*max_slope) + 1
    <= 8, within the taps-path bound."""
    src = RNG.uniform(0, 1, (B, 3, H2, W)).astype(np.float32)
    tgt = RNG.uniform(0, 1, (B, 3, H2, W)).astype(np.float32)
    logits = RNG.standard_normal((B, N, H2, W)).astype(np.float32)
    sigma = RNG.uniform(0.05, 0.95, (B, N, H2, W)).astype(np.float32)
    base = RNG.uniform(-6.0, 6.0, (B, 1, N)).astype(np.float32)
    slope = RNG.uniform(-max_slope, max_slope, (B, 1, N)).astype(np.float32)
    r = np.arange(H2, dtype=np.float32)[None, :, None]
    shift = base + slope * r
    mask = (RNG.uniform(0, 1, (B, H2, N)) > 0.2).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (src, tgt, logits, sigma, shift,
                                          mask))


def test_gp_spread():
    """Production plane geometry: the worst-case per-8-row-block integer
    shift spread of the ground planes stays within the taps-path bound
    (config.sweep_gp_taps = 8).  Sweeps the full crop_factor augmentation
    range and the +-0.5 residual overshoot at stage-1 HR resolution."""
    from planedepth_tpu.config import PlaneConfig, TrainConfig
    from planedepth_tpu.geometry.planes import build_plane_volume

    cfg = TrainConfig()
    pcfg: PlaneConfig = cfg.model.planes
    Ht, Wt = cfg.data.height, cfg.data.width          # 384 x 1280
    R = cfg.sweep_rows
    worst = worst16 = 0.0
    for f in np.linspace(max((Ht + 1) / Ht, cfg.data.crop_factor[0]),
                         cfg.data.crop_factor[1], 7):
        Hs, Ws = int(Ht * f), int(Wt * f)
        gx = np.linspace(-1.0, 1.0, Ws, dtype=np.float32)
        gy = np.linspace(-1.0, 1.0, Hs, dtype=np.float32)
        for h0, w0 in ((0, 0), (Hs - Ht, Ws - Wt), (Hs - Ht, 0)):
            grid = np.stack(
                np.meshgrid(gx[w0 : w0 + Wt], gy[h0 : h0 + Ht]), axis=-1
            )[None]
            for rsign in (-0.5, 0.5):
                resid = np.full(
                    (1, pcfg.all_levels), rsign, dtype=np.float32
                )
                vol = build_plane_volume(
                    jnp.asarray(grid), pcfg, Wt,
                    residual_levels=jnp.asarray(resid),
                )
                disp_g = np.asarray(
                    vol.disp_layered[0, :, 0, pcfg.disp_levels :]
                )                                      # (H, xz)
                k = np.floor(disp_g).reshape(Ht // R, R, -1)
                spread = (k.max(1) - k.min(1)).max()
                worst = max(worst, float(spread))
                k16 = np.floor(disp_g).reshape(Ht // 16, 16, -1)
                worst16 = max(worst16, float((k16.max(1) - k16.min(1)).max()))
    assert worst <= 8.0, worst
    # the measured production bound the default was sized against
    assert worst <= 6.0, worst
    # sweep_rows=16 bound (the gp_taps value a 16-row config needs)
    assert worst16 <= 14.0, worst16


def test_gp_taps_forward_matches_rows_path():
    """gp_taps > 0 (row-vectorized ground planes) must equal the per-row
    path (itself oracle-verified) when per-block spreads fit the bound —
    incl. the fused with_disp head."""
    src, tgt, logits, sigma, shift, mask = _inputs_gp()
    for with_disp in (False, True):
        a = sweep_forward(src, tgt, logits, sigma, shift, mask, pad=PAD,
                          rows=8, interpret=True, n_vertical=0,
                          with_disp=with_disp, gp_taps=8)
        b = sweep_forward(src, tgt, logits, sigma, shift, mask, pad=PAD,
                          rows=8, interpret=True, n_vertical=0,
                          with_disp=with_disp, gp_taps=0)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("image_grads", [True, False])
def test_gp_taps_vjp_matches_rows_path(image_grads):
    """Backward taps path (pass3_taps + lsd/cd_taps recomputation) ==
    per-row path gradients, in both VJP configurations."""
    src, tgt, logits, sigma, shift, mask = _inputs_gp()
    g_rgb = jnp.asarray(RNG.standard_normal((B, 3, H2, W)).astype(np.float32))
    g_nll = jnp.asarray(RNG.standard_normal((B, H2, W)).astype(np.float32))
    g_nla = jnp.asarray(RNG.standard_normal((B, H2, W)).astype(np.float32))
    g_dsp = jnp.asarray(RNG.standard_normal((B, H2, W)).astype(np.float32))

    def scalarize(gp):
        def wrapped(src_, logits_, sigma_, shift_):
            out = fused_plane_sweep(
                src_, tgt, logits_, sigma_, shift_, mask,
                PAD, True, 0, image_grads, True, 8, gp,
            )
            return (jnp.sum(out[0] * g_rgb) + jnp.sum(out[1] * g_nll)
                    + jnp.sum(out[2] * g_nla) + jnp.sum(out[3] * g_dsp))
        return wrapped

    gt_ = jax.grad(scalarize(8), argnums=(0, 1, 2, 3))(src, logits, sigma,
                                                       shift)
    gr = jax.grad(scalarize(0), argnums=(0, 1, 2, 3))(src, logits, sigma,
                                                      shift)
    for a, b, name in zip(gt_, gr, ("src", "logits", "sigma", "shift")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_gp_taps_mixed_vertical():
    """n_vertical > 0 with the taps path: vertical planes ride the vec
    samplers, ground planes the taps samplers, same results."""
    src, tgt, logits, sigma, shift, mask = _inputs_gp()
    nv = 2
    shift = shift.at[:, :, :nv].set(
        jnp.broadcast_to(shift[:, :1, :nv], shift[:, :, :nv].shape)
    )
    a = sweep_forward(src, tgt, logits, sigma, shift, mask, pad=PAD,
                      rows=8, interpret=True, n_vertical=nv, gp_taps=8)
    b = sweep_forward(src, tgt, logits, sigma, shift, mask, pad=PAD,
                      rows=8, interpret=True, n_vertical=nv, gp_taps=0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_oracle_matches_view_synthesis_composition():
    """The fused op's math == pred_novel_images + multimodal_nll."""
    from planedepth_tpu.ops.losses import multimodal_nll
    from planedepth_tpu.train.view_synthesis import pred_novel_images

    src, tgt, logits, sigma, shift, mask = _inputs()
    # row-constant full tensors for the oracle path (plane axis last)
    logits_l = jnp.moveaxis(logits, 1, -1)
    sigma_l = jnp.clip(jnp.moveaxis(sigma, 1, -1), 0.01, 1.0)
    disp_rows = shift                                      # 'r' side: +disp
    disp_layered = jnp.broadcast_to(
        disp_rows[:, :, None, :], (B, H, W, N)
    )
    mask_full = jnp.broadcast_to(mask[:, :, None, :], (B, H, W, N))
    outputs = {
        "disp_layered": disp_layered,
        "padding_mask": mask_full,
        "logits": logits_l,
        "sigma": sigma_l,
    }
    src_l = jnp.moveaxis(src, 1, -1)
    tgt_l = jnp.moveaxis(tgt, 1, -1)
    rec = pred_novel_images(
        outputs, src_l, ("r",), {"r": None}, None, None,
        warp_type="disp_warp", use_mixture_loss=True,
    )
    err = jnp.moveaxis(
        jnp.mean(jnp.abs(rec[("rgb_rec_layered", "r")] - tgt_l[:, None]),
                 -1), 1, -1,
    )
    nll_ref = multimodal_nll(
        err, rec[("sigma_rec", "r")], rec[("pi_rec", "r")], dist="lap"
    )[..., 0]
    err_auto = jnp.mean(jnp.abs(src_l - tgt_l), -1, keepdims=True)
    nlla_ref = multimodal_nll(
        err_auto, rec[("sigma_rec", "r")], rec[("pi_rec", "r")], dist="lap"
    )[..., 0]

    rgb_o, nll_o, nlla_o = oracle_dense(
        src, tgt, logits, sigma_l_t := jnp.moveaxis(sigma_l, -1, 1), shift,
        mask,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(rgb_o, 1, -1)),
        np.asarray(rec[("rgb_rec", "r")]), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(nll_o), np.asarray(nll_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nlla_o), np.asarray(nlla_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("with_disp", [False, True])
def test_with_auto_off_parity(with_disp):
    """with_auto=False (recipes without automask, production stereo)
    drops the nll_auto output and its per-plane exp; every other output
    and gradient is identical (image_grads must be off — the automask
    adjoint needs it)."""
    args = _inputs()

    def run(with_auto, logits, sigma, shift):
        return fused_plane_sweep(
            args[0], args[1], logits, sigma, shift, args[5],
            PAD, True, 0, False, with_disp, 4, 0, with_auto,
        )

    ref = run(True, *args[2:5])
    got = run(False, *args[2:5])
    ref_wo = (ref[0], ref[1]) + tuple(ref[3:])
    assert len(got) == len(ref_wo)
    for i, (r, g) in enumerate(zip(ref_wo, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"output {i}")

    rng = np.random.default_rng(5)
    ws = [jnp.asarray(rng.standard_normal(np.asarray(o).shape)
                      .astype(np.float32)) for o in got]

    def loss(with_auto, logits, sigma, shift):
        outs = run(with_auto, logits, sigma, shift)
        if with_auto:
            outs = (outs[0], outs[1]) + tuple(outs[3:])
        return sum(jnp.sum(w * o) for w, o in zip(ws, outs))

    g_ref = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(
        *args[2:5])
    g_got = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(
        *args[2:5])
    for name, rg, gg in zip(("d_log", "d_sig", "d_shift"), g_ref, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_nonneg_parity_v1():
    """nonneg=True (production disparities >= 0: zero left halo,
    asymmetric pad-once residuals) matches the default signed mode on
    nonnegative shifts — outputs and gradients."""
    src, tgt, logits, sigma, shift, mask = _inputs()
    shift = jnp.abs(shift)

    def run(nonneg, logits, sigma, shift):
        return fused_plane_sweep(
            src, tgt, logits, sigma, shift, mask,
            PAD, True, 0, False, True, 4, 0, True, nonneg,
        )

    ref = run(False, logits, sigma, shift)
    got = run(True, logits, sigma, shift)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"output {i}")

    rng = np.random.default_rng(9)
    ws = [jnp.asarray(rng.standard_normal(np.asarray(o).shape)
                      .astype(np.float32)) for o in got]

    def loss(nonneg, logits, sigma, shift):
        return sum(jnp.sum(w * o) for w, o in
                   zip(ws, run(nonneg, logits, sigma, shift)))

    g_ref = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(
        logits, sigma, shift)
    g_got = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(
        logits, sigma, shift)
    for name, rg, gg in zip(("d_log", "d_sig", "d_shift"), g_ref, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_nonneg_gp_taps_parity_v1():
    """nonneg with the ground-plane taps path (the PladeNet production
    configuration: per-row shifts, gp_taps > 0)."""
    src, tgt, logits, sigma, _, mask = _inputs()
    rng = np.random.default_rng(31)
    rows_ = np.arange(H, dtype=np.float32)[None, :, None]
    shift = jnp.asarray(
        rng.uniform(0.0, 4.0, (B, 1, N)).astype(np.float32)
        + rng.uniform(0.05, 0.4, (B, 1, N)).astype(np.float32) * rows_)

    def run(nonneg, logits, sigma, shift):
        return fused_plane_sweep(
            src, tgt, logits, sigma, shift, mask,
            PAD, True, 0, False, True, 4, 4, True, nonneg,
        )

    ref = run(False, logits, sigma, shift)
    got = run(True, logits, sigma, shift)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"output {i}")

    rng2 = np.random.default_rng(12)
    ws = [jnp.asarray(rng2.standard_normal(np.asarray(o).shape)
                      .astype(np.float32)) for o in got]

    def loss(nonneg, logits, sigma, shift):
        return sum(jnp.sum(w * o) for w, o in
                   zip(ws, run(nonneg, logits, sigma, shift)))

    g_ref = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(
        logits, sigma, shift)
    g_got = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(
        logits, sigma, shift)
    for name, rg, gg in zip(("d_log", "d_sig", "d_shift"), g_ref, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


# ---------------------------------------------------------------------------
# No-mixture (softmax-composite) kernel variant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gp_taps", [0, 8])
def test_nomix_forward_and_vjp_match_softmax_oracle(gp_taps):
    """fused_plane_sweep_nomix (LOGITS-ONLY operand, sigma == 1) == the
    dense softmax-composite oracle, forward AND gradients, on both the
    per-row and the row-vectorized ground-plane paths — including real
    padding masks and image borders (where the old all-ones-sigma idea
    breaks: a warped ones tensor shrinks under the zeros padding)."""
    from planedepth_tpu.ops.pallas_sweep import (
        fused_plane_sweep_nomix, oracle_softmax,
    )

    rng = np.random.default_rng(5)
    Bq, Hq, Wq, Nq, NV = 2, 16, 256, 7, 4
    src = jnp.asarray(rng.uniform(0, 1, (Bq, 3, Hq, Wq)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (Bq, 3, Hq, Wq)).astype(np.float32))
    log = jnp.asarray(rng.standard_normal((Bq, Nq, Hq, Wq)).astype(np.float32))
    base = rng.uniform(0, 8, (Bq, 1, Nq)).astype(np.float32)
    slope = rng.uniform(0, 0.5, (Bq, 1, Nq)).astype(np.float32)
    rr = np.arange(Hq, dtype=np.float32)[None, :, None]
    shift_np = base + slope * rr
    shift_np[:, :, :NV] = np.broadcast_to(
        rng.uniform(0, 8, (Bq, 1, NV)), (Bq, Hq, NV))
    shift = jnp.asarray(shift_np)
    mask_np = (rng.uniform(0, 1, (Bq, Hq, Nq)) > 0.3).astype(np.float32)
    mask_np[:, :, :NV] = 1.0
    mask = jnp.asarray(mask_np)
    pad = 16

    rgb_o, disp_o = oracle_softmax(src, tgt, log, shift, mask)
    out = fused_plane_sweep_nomix(
        src, tgt, log, shift, mask, pad, True, NV, True, 8, gp_taps, True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(rgb_o),
                               atol=2e-6, err_msg="rgb")
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(disp_o),
                               atol=5e-6, err_msg="disp")

    def loss_k(log_, sh_):
        o = fused_plane_sweep_nomix(
            src, tgt, log_, sh_, mask, pad, True, NV, True, 8, gp_taps, True)
        return (jnp.sum(jnp.abs(o[0].astype(jnp.float32) - tgt))
                + 0.3 * jnp.sum(o[2] * o[2]))

    def loss_o(log_, sh_):
        rgb, disp = oracle_softmax(src, tgt, log_, sh_, mask)
        return jnp.sum(jnp.abs(rgb - tgt)) + 0.3 * jnp.sum(disp * disp)

    gk = jax.grad(loss_k, argnums=(0, 1))(log, shift)
    go = jax.grad(loss_o, argnums=(0, 1))(log, shift)
    for name, a, b in zip(("d_log", "d_shift"), gk, go):
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * max(scale, 1.0), err_msg=name)
