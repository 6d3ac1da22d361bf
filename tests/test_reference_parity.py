"""End-to-end forward parity against the LIVE reference torch network.

The strongest accuracy proxy available without KITTI data: build the
reference ``ResnetEncoder`` + ``DepthDecoder`` (/root/reference/networks)
with random weights, convert that exact state into this framework's flax
tree (utils/torch_convert.py), and assert the full forward — encoder
features through plane volume, softmax/mixture probability and expected
disparity — matches on the same input.

The reference hardcodes ``.cuda()`` inside the decoder forward
(networks/depth_decoder.py:148,155,159); ``torch.Tensor.cuda`` is
monkeypatched to a no-op so everything runs on CPU.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from planedepth_tpu.config import ModelConfig, PlaneConfig
from planedepth_tpu.models.factory import build_depth_model
from planedepth_tpu.utils.torch_convert import (
    convert_depth_decoder,
    convert_resnet_trunk,
)

pytestmark = pytest.mark.heavy

REF = "/root/reference"
H, W = 64, 192


@pytest.fixture(scope="module")
def ref_nets():
    from tests._torchvision_stub import install

    install()                     # torchvision is absent in this image
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import networks  # /root/reference/networks

        torch.manual_seed(0)
        enc = networks.ResnetEncoder(18, pretrained=False)
        dec = networks.DepthDecoder(
            num_ch_enc=enc.num_ch_enc,
            no_levels=49, disp_min=2, disp_max=300,
            num_ep=8, pe_type="neural",
            use_skips=True, use_denseaspp=True,
            xz_levels=14, yz_levels=0,
            use_mixture_loss=True, render_probability=False,
            plane_residual=True,
        )
        enc.eval()
        dec.eval()
        yield enc, dec
    finally:
        torch.Tensor.cuda = orig_cuda


def test_full_forward_matches_reference(ref_nets):
    enc, dec = ref_nets
    rng = np.random.default_rng(0)
    img = rng.random((1, H, W, 3), dtype=np.float32)
    gx, gy = np.meshgrid(
        np.linspace(-1, 1, W, dtype=np.float32),
        np.linspace(-1, 1, H, dtype=np.float32),
    )
    grid = np.stack([gx, gy], axis=-1)[None]              # (1, H, W, 2)

    # --- reference forward ---------------------------------------------------
    with torch.no_grad():
        t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        t_grid = torch.from_numpy(np.transpose(grid, (0, 3, 1, 2)))
        feats = enc(t_img)
        ref = dec(feats, t_grid)
    ref_disp = ref["disp"].numpy()[:, 0]                  # (1, H, W)
    ref_prob = ref["probability"].numpy()                 # (1, N, H, W)
    ref_sigma = ref["sigma"].numpy()
    ref_logits = ref["logits"].numpy()

    # --- convert weights -> flax --------------------------------------------
    enc_sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    dec_sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    trunk_p, trunk_s = convert_resnet_trunk(enc_sd, prefix="encoder.")
    dec_p, dec_s = convert_depth_decoder(
        dec_sd, num_ep=8, use_denseaspp=True, use_mixture_loss=True,
        plane_residual=True,
    )

    cfg = ModelConfig(
        net_type="ResNet", num_layers=18, num_ep=8, pe_type="neural",
        use_denseaspp=True, use_mixture_loss=True, plane_residual=True,
        planes=PlaneConfig(disp_levels=49, disp_min=2, disp_max=300,
                           xz_levels=14, yz_levels=0),
    )
    model = build_depth_model(cfg, bf16=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(img), jnp.asarray(grid), train=False,
    )
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    def tree_shapes(t):
        return jax.tree_util.tree_map(lambda x: np.shape(x), t)

    assert tree_shapes(params["encoder"]["encoder"]) == tree_shapes(trunk_p)
    params["encoder"] = {"encoder": trunk_p}
    stats["encoder"] = {"encoder": trunk_s}
    assert tree_shapes(params["depth"]) == tree_shapes(dec_p)
    params["depth"] = dec_p
    stats["depth"] = dec_s

    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(img), jnp.asarray(grid), train=False,
    )
    disp = np.asarray(out["disp"])[..., 0]                # (1, H, W)
    prob = np.moveaxis(np.asarray(out["probability"]), -1, 1)
    sigma = np.moveaxis(np.asarray(out["sigma"]), -1, 1)
    logits = np.moveaxis(np.asarray(out["logits"]), -1, 1)

    np.testing.assert_allclose(logits, ref_logits, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(sigma, ref_sigma, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(prob, ref_prob, rtol=2e-3, atol=1e-3)
    # disp spans [2, 300] px: compare at 1e-3 RELATIVE to its scale
    scale = np.abs(ref_disp).max()
    assert np.abs(disp - ref_disp).max() <= 1e-3 * scale, (
        np.abs(disp - ref_disp).max(), scale,
    )


def test_pose_networks_match_reference(ref_nets):
    """ResnetPoseEncoder + PoseDecoder forward parity vs the live torch
    reference (the monocular-training pose path, trainer.py:92-94)."""
    import networks

    from planedepth_tpu.models.pose_net import PoseDecoder
    from planedepth_tpu.models.resnet import (
        ResnetPoseEncoder, encoder_channels,
    )
    from planedepth_tpu.utils.torch_convert import convert_pose_decoder

    torch.manual_seed(1)
    enc_t = networks.ResnetPoseEncoder(18, False, num_input_images=2)
    dec_t = networks.PoseDecoder(
        enc_t.num_ch_enc, num_input_features=1,
        num_frames_to_predict_for=1, num_ep=8,
    )
    enc_t.eval()
    dec_t.eval()

    rng = np.random.default_rng(2)
    stacked = rng.random((2, H, W, 6), dtype=np.float32)
    gx, gy = np.meshgrid(
        np.linspace(-1, 1, W, dtype=np.float32),
        np.linspace(-1, 1, H, dtype=np.float32),
    )
    grid = np.broadcast_to(
        np.stack([gx, gy], -1)[None], (2, H, W, 2)
    ).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(np.transpose(stacked, (0, 3, 1, 2)))
        t_grid = torch.from_numpy(np.transpose(grid, (0, 3, 1, 2)))
        feats_t = enc_t(t_in)
        aa_t, tr_t = dec_t([feats_t], t_grid)

    enc_sd = {k: v.numpy() for k, v in enc_t.state_dict().items()}
    trunk_p, trunk_s = convert_resnet_trunk(enc_sd, prefix="encoder.")
    dec_p = convert_pose_decoder(
        {k: v.numpy() for k, v in dec_t.state_dict().items()}, num_ep=8
    )

    enc_j = ResnetPoseEncoder(18, num_input_images=2)
    feats_j = enc_j.apply(
        {"params": {"encoder": trunk_p},
         "batch_stats": {"encoder": trunk_s}},
        jnp.asarray(stacked), False,
    )
    dec_j = PoseDecoder(
        num_ch_enc=tuple(encoder_channels(18)), num_input_features=1,
        num_frames_to_predict_for=1, num_ep=8,
    )
    aa_j, tr_j = dec_j.apply(
        {"params": dec_p}, [feats_j], jnp.asarray(grid)
    )

    np.testing.assert_allclose(
        np.asarray(aa_j), aa_t.numpy(), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tr_j), tr_t.numpy(), rtol=1e-3, atol=1e-6
    )


def test_plane_volume_matches_reference(ref_nets):
    """The geometry alone (disp_layered / padding_mask / distance / norm)
    pinned against the reference decoder's plane construction."""
    enc, dec = ref_nets
    rng = np.random.default_rng(1)
    img = rng.random((1, H, W, 3), dtype=np.float32)
    # a non-identity grid exercising the crop-dependent ground planes
    gx, gy = np.meshgrid(
        np.linspace(-0.8, 0.9, W, dtype=np.float32),
        np.linspace(-0.7, 1.0, H, dtype=np.float32),
    )
    grid = np.stack([gx, gy], axis=-1)[None]

    with torch.no_grad():
        t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        t_grid = torch.from_numpy(np.transpose(grid, (0, 3, 1, 2)))
        ref = dec(enc(t_img), t_grid)

    enc_sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    dec_sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    trunk_p, trunk_s = convert_resnet_trunk(enc_sd, prefix="encoder.")
    dec_p, dec_s = convert_depth_decoder(dec_sd)

    cfg = ModelConfig(
        net_type="ResNet", num_layers=18, num_ep=8,
        use_denseaspp=True, use_mixture_loss=True, plane_residual=True,
        planes=PlaneConfig(disp_levels=49, disp_min=2, disp_max=300,
                           xz_levels=14, yz_levels=0),
    )
    model = build_depth_model(cfg, bf16=False)
    out = model.apply(
        {"params": {"encoder": {"encoder": trunk_p}, "depth": dec_p},
         "batch_stats": {"encoder": {"encoder": trunk_s}, "depth": dec_s}},
        jnp.asarray(img), jnp.asarray(grid), train=False,
    )

    dl = np.moveaxis(np.asarray(out["disp_layered"]), -1, 1)
    pm = np.moveaxis(np.asarray(out["padding_mask"]), -1, 1)
    np.testing.assert_allclose(
        dl, ref["disp_layered"].numpy(), rtol=2e-4, atol=1e-3
    )
    np.testing.assert_allclose(pm, ref["padding_mask"].numpy(), atol=0)
    np.testing.assert_allclose(
        np.asarray(out["distance"]), ref["distance"].numpy(),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["norm"]), ref["norm"].numpy(), rtol=2e-4, atol=1e-6,
    )
