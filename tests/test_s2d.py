"""Space-to-depth decoder tail (models/s2d.py): exact equivalence.

The s2d tail re-expresses the finest decoder scale (upconv_0_0,
upsample+upconv_0_1, dispconv/sigmaconv/residualconv) on phase-packed
tensors with derived kernels.  These tests pin:
  * the kernel transforms against brute-force conv compositions,
  * the phase-aware boundary pads against full-res reflect padding,
  * the END-TO-END decoder: s2d_tail="on" must equal s2d_tail="off"
    with the SAME parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.config import ModelConfig, PlaneConfig
from planedepth_tpu.models import s2d
from planedepth_tpu.models.factory import build_depth_model
from planedepth_tpu.ops.resize import upsample2x_nearest

RNG = np.random.default_rng(3)


def _conv3x3_reflect(x, k, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return s2d.conv_valid(xp, k, b, jnp.float32)


def test_s2d_roundtrip():
    x = jnp.asarray(RNG.random((2, 8, 12, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(s2d.depth_to_space(s2d.space_to_depth(x))), np.asarray(x)
    )


def test_upsample_fuse_kernel_matches_composition():
    y = jnp.asarray(RNG.random((2, 6, 8, 4)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((3, 3, 4, 5)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((5,)), jnp.float32)

    ref = _conv3x3_reflect(upsample2x_nearest(y), k, b)     # (2, 12, 16, 5)

    kf = s2d.upsample_fuse_kernel(k)                        # (3, 3, 4, 20)
    ye = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out4 = s2d.conv_valid(ye, kf, s2d.tile_bias(b), jnp.float32)
    out = s2d.depth_to_space(out4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv_kernel_matches_composition():
    z = jnp.asarray(RNG.random((2, 8, 12, 3)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((3, 3, 3, 7)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((7,)), jnp.float32)

    ref = _conv3x3_reflect(z, k, b)

    z4 = s2d.space_to_depth(z)
    out4 = s2d.conv_valid(
        s2d.phase_pad(z4, "reflect"), s2d.s2d_conv_kernel(k),
        s2d.tile_bias(b), jnp.float32,
    )
    out = s2d.depth_to_space(out4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _phase_pad_reshape(x4, mode):
    """Original 6-D reshape/stack form of phase_pad — the oracle for the
    strip-based implementation (values must be bit-equal)."""
    B, Hq, Wq, C4 = x4.shape
    C = C4 // 4
    x = x4.reshape(B, Hq, Wq, 2, 2, C)
    r = int(mode == "reflect")
    top_src = x[:, :1, :, r, :, :]
    bot_src = x[:, -1:, :, 1 - r, :, :]
    x = jnp.concatenate(
        [jnp.stack([top_src, top_src], axis=3), x,
         jnp.stack([bot_src, bot_src], axis=3)], axis=1)
    left_src = x[:, :, :1, :, r, :]
    right_src = x[:, :, -1:, :, 1 - r, :]
    x = jnp.concatenate(
        [jnp.stack([left_src, left_src], axis=4), x,
         jnp.stack([right_src, right_src], axis=4)], axis=2)
    return x.reshape(B, Hq + 2, Wq + 2, C4)


@pytest.mark.parametrize("mode", ["reflect", "edge"])
def test_phase_pad_strip_form_matches_reshape_form(mode):
    x4 = jnp.asarray(RNG.random((2, 5, 7, 12)), jnp.float32)
    got = s2d.phase_pad(x4, mode)
    ref = _phase_pad_reshape(x4, mode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # adjoint parity: grad of a random-weighted sum
    w = jnp.asarray(RNG.standard_normal(ref.shape), jnp.float32)
    g_got = jax.grad(lambda t: jnp.sum(w * s2d.phase_pad(t, mode)))(x4)
    g_ref = jax.grad(lambda t: jnp.sum(w * _phase_pad_reshape(t, mode)))(x4)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_phase_pad_edge_matches_upper_level_edge():
    z = jnp.asarray(RNG.random((1, 6, 8, 2)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((3, 3, 2, 3)), jnp.float32)
    b = jnp.zeros((3,), jnp.float32)
    ref = s2d.conv_valid(
        jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"), k, b,
        jnp.float32,
    )
    out4 = s2d.conv_valid(
        s2d.phase_pad(s2d.space_to_depth(z), "edge"),
        s2d.s2d_conv_kernel(k), s2d.tile_bias(b), jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(s2d.depth_to_space(out4)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


def test_stem_s2d_matches_standard_conv():
    """7x7/2 stem conv on the 2-level packed grid == the plain conv."""
    import jax.lax as lax

    x = jnp.asarray(RNG.random((2, 16, 24, 3)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((7, 7, 3, 5)), jnp.float32)
    ref = lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x4 = jnp.pad(s2d.space_to_depth2(x),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    out4 = s2d.conv_valid(x4, s2d.stem_s2d_kernel(k),
                          jnp.zeros((20,)), jnp.float32)
    got = s2d.depth_to_space(out4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_encoder_s2d_stem_matches_standard():
    """ResnetEncoder with the s2d stem == standard, same params."""
    from planedepth_tpu.models.resnet import ResnetEncoder

    img = jnp.asarray(RNG.random((1, 32, 48, 3)), jnp.float32)
    e_off = ResnetEncoder(18, s2d_stem="off")
    e_on = ResnetEncoder(18, s2d_stem="on")
    variables = e_off.init(jax.random.PRNGKey(0), img, False)
    v_on = e_on.init(jax.random.PRNGKey(0), img, False)
    assert jax.tree_util.tree_structure(variables["params"]) == \
        jax.tree_util.tree_structure(v_on["params"])
    f_off = e_off.apply(variables, img, False)
    f_on = e_on.apply(variables, img, False)
    for a, b in zip(f_off, f_on):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_resize_from_s2d_matches_unpacked():
    x = jnp.asarray(RNG.random((2, 12, 16, 5)), jnp.float32)
    from planedepth_tpu.ops.resize import resize_bilinear_align_corners

    for size in ((6, 8), (12, 16), (5, 7)):
        ref = resize_bilinear_align_corners(x, size)
        got = s2d.resize_from_s2d(s2d.space_to_depth(x), size)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=str(size))


def test_epconv_s2d_matches_standard():
    from planedepth_tpu.models.layers import EpConv

    grid = jnp.asarray(RNG.random((2, 8, 12, 2)) * 2 - 1, jnp.float32)
    mod = EpConv(8)
    variables = mod.init(jax.random.PRNGKey(0), grid)
    ref = mod.apply(variables, grid)
    p = variables["params"]
    got4 = s2d.epconv_s2d(
        s2d.space_to_depth(grid),
        p["conv0"]["kernel"], p["conv0"]["bias"],
        p["conv1"]["kernel"], p["conv1"]["bias"], jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(s2d.depth_to_space(got4)), np.asarray(ref),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("plane_residual", [True, False])
def test_decoder_s2d_tail_matches_standard(plane_residual):
    H, W = 64, 96
    cfg = dict(
        net_type="ResNet", num_layers=18, num_ep=8,
        use_denseaspp=False, use_mixture_loss=True,
        plane_residual=plane_residual,
        planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                           xz_levels=4, yz_levels=0),
    )
    img = jnp.asarray(RNG.random((2, H, W, 3)), jnp.float32)
    gx, gy = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H))
    grid = jnp.asarray(
        np.broadcast_to(
            np.stack([gx, gy], -1)[None], (2, H, W, 2)
        ).astype(np.float32)
    )

    m_off = build_depth_model(ModelConfig(s2d_tail="off", **cfg))
    m_on = build_depth_model(ModelConfig(s2d_tail="on", **cfg))
    variables = m_off.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, grid, train=False,
    )
    # identical param trees: the s2d tail only re-expresses the compute
    v_on = m_on.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, grid, train=False,
    )
    assert jax.tree_util.tree_structure(variables["params"]) == \
        jax.tree_util.tree_structure(v_on["params"])
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(v_on["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    out_off = m_off.apply(variables, img, grid, train=False)
    out_on = m_on.apply(variables, img, grid, train=False)
    for key in ("logits", "sigma", "disp", "probability"):
        a, b = np.asarray(out_off[key]), np.asarray(out_on[key])
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-5 * scale, err_msg=key
        )


def test_decoder_s2d_grads_flow_to_canonical_params():
    """Gradients reach the canonical upconv_0_*/head kernels through the
    kernel transforms."""
    H, W = 32, 32
    cfg = ModelConfig(
        net_type="ResNet", num_layers=18, num_ep=0,
        use_denseaspp=False, use_mixture_loss=True, plane_residual=True,
        planes=PlaneConfig(disp_levels=5, disp_min=2, disp_max=20,
                           xz_levels=0, yz_levels=0),
        s2d_tail="on",
    )
    img = jnp.asarray(RNG.random((1, H, W, 3)), jnp.float32)
    grid = jnp.zeros((1, H, W, 2), jnp.float32)
    model = build_depth_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, grid, train=False,
    )

    def loss(params):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            img, grid, train=False,
        )
        return jnp.sum(out["disp"] ** 2) + jnp.sum(out["logits"] ** 2)

    g = jax.grad(loss)(variables["params"])
    for name in ("upconv_0_0", "upconv_0_1", "dispconv", "sigmaconv"):
        leaves = jax.tree_util.tree_leaves(g["depth"][name])
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves), name


def test_vgg_packed_stem_matches_full():
    """Vgg19Features(packed s2d input) == Vgg19Features(full-res input)
    with identical parameters — all three feature slices AND the
    gradient w.r.t. the (packed vs full) pred input agree through the
    exact packed conv1_1 (models/perceptual.py)."""
    from planedepth_tpu.models.perceptual import Vgg19Features

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 32, 3).astype(np.float32))
    net = Vgg19Features(dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(params, x)
    got = net.apply(params, s2d.space_to_depth(x), packed=True)
    assert len(ref) == len(got)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5,
            err_msg=f"slice {i}",
        )

    def loss_full(img):
        return sum(jnp.sum(f ** 2) for f in net.apply(params, img))

    def loss_packed(img):
        return sum(jnp.sum(f ** 2) for f in net.apply(
            params, s2d.space_to_depth(img), packed=True))

    gr = jax.grad(loss_full)(x)
    gp = jax.grad(loss_packed)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=2e-4, atol=2e-4)
