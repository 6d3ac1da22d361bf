"""One-step GRADIENT and Adam-update parity against the live torch
reference.

Forward parity (tests/test_reference_parity.py) cannot see
BN-batch-stat, ELU-grad, grid_sample-grad or loss-reduction drifts in
the backward — but the north-star metric is a *training* outcome.  This
test runs ONE training step on identical converted weights + an
identical batch through (a) the reference's own networks + a
line-faithful torch mirror of its loss assembly
(trainer.py:523-603 pred_novel_images disp_warp branch +
:701-773 compute_losses + layers.py:451-466 multimodal_loss,
:243-256 get_smooth_loss_disp) with torch autograd + torch.optim.Adam
(trainer.py:102), and (b) this framework's oracle train path with optax
Adam — then compares every parameter gradient and the post-step
disparity.

The torch gradients are mapped into the flax tree layout by the SAME
converters used for the weights (linear transforms commute with
differentiation), so the comparison is leaf-by-leaf.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig,
    TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle, create_train_state, make_optimizer, make_train_step,
)
from planedepth_tpu.utils.torch_convert import (
    convert_depth_decoder,
    convert_resnet_trunk,
)

pytestmark = pytest.mark.heavy

REF = "/root/reference"
B, H, W = 2, 64, 192
ALPHA_SMOOTH, GAMMA_SMOOTH = 0.04, 2.0
LR, BETAS = 1e-4, (0.5, 0.999)


@pytest.fixture(scope="module")
def ref_nets():
    from tests._torchvision_stub import install

    install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import networks

        torch.manual_seed(3)
        enc = networks.ResnetEncoder(18, pretrained=False)
        # no DenseASPP: its channel dropout would need matched rngs
        dec = networks.DepthDecoder(
            num_ch_enc=enc.num_ch_enc,
            no_levels=49, disp_min=2, disp_max=300,
            num_ep=8, pe_type="neural",
            use_skips=True, use_denseaspp=False,
            xz_levels=14, yz_levels=0,
            use_mixture_loss=True, render_probability=False,
            plane_residual=True,
        )
        yield enc, dec
    finally:
        torch.Tensor.cuda = orig_cuda


def _batch():
    b = make_stereo_batch(B, H, W, seed=9)
    # make color_aug differ from color so the encoder input (color_aug)
    # vs warp source/target (color, match_aug=False) split is exercised
    for s in ("l", "r"):
        b[f"color_aug_{s}"] = np.clip(
            b[f"color_{s}"] ** 1.1 * 1.05, 0.0, 1.0
        ).astype(np.float32)
    return b


def _torch_step(enc, dec, batch):
    """One reference training step: forward, disp_warp view synthesis,
    mixture+automask photometric, smoothness, backward, Adam update.
    Returns ({name: grad}, {name: grad}, post-step disp)."""
    sys.path.insert(0, REF)
    from layers import get_smooth_loss_disp, multimodal_loss

    enc.train()
    dec.train()
    params = list(enc.parameters()) + list(dec.parameters())
    opt = torch.optim.Adam(params, lr=LR, betas=BETAS)

    img_aug = torch.from_numpy(
        np.transpose(batch["color_aug_l"], (0, 3, 1, 2))).clone()
    src = torch.from_numpy(
        np.transpose(batch["color_l"], (0, 3, 1, 2))).clone()
    tgt = torch.from_numpy(
        np.transpose(batch["color_r"], (0, 3, 1, 2))).clone()
    grid = torch.from_numpy(
        np.transpose(batch["grid"], (0, 3, 1, 2))).clone()

    out = dec(enc(img_aug), grid)
    N = out["probability"].shape[1]

    # --- pred_novel_images, disp_warp, target 'r' (trainer.py:540-554) --
    disps = out["disp_layered"]
    px, py = torch.meshgrid(torch.arange(W), torch.arange(H),
                            indexing="xy")
    pix = torch.stack([px, py], 0).float()[None, None].expand(
        B, N, -1, -1, -1).clone()
    pix[:, :, 0] = pix[:, :, 0] + disps
    pix[:, :, 0] = (pix[:, :, 0] / (W - 1) - 0.5) * 2
    pix[:, :, 1] = (pix[:, :, 1] / (H - 1) - 0.5) * 2
    pix = pix.reshape(B * N, 2, H, W).permute(0, 2, 3, 1)
    feats = torch.cat([
        src[:, None].expand(-1, N, -1, -1, -1).reshape(B * N, 3, H, W),
        out["logits"].reshape(B * N, 1, H, W),
        out["sigma"].reshape(B * N, 1, H, W),
    ], dim=1)
    rec = tF.grid_sample(feats, pix, padding_mode="zeros",
                         align_corners=True).reshape(B, N, -1, H, W)
    rec = rec * out["padding_mask"][:, :, None]
    rgb_layered = rec[:, :, :3]
    logit_rec = rec[:, :, 3]
    pi_rec = torch.softmax(logit_rec, dim=1)
    sigma_rec = torch.clamp(rec[:, :, 4], 0.01, 1.0)
    weights = pi_rec / sigma_rec
    weights = weights / weights.sum(1, True)

    # --- compute_losses (trainer.py:728-736, automask :731-741) --------
    error = torch.abs(rgb_layered - tgt[:, None]).mean(2)
    ph = multimodal_loss(error, sigma_rec, pi_rec, dist="lap")
    error_auto = torch.abs(src[:, None] - tgt[:, None]).mean(2)
    ph_auto = multimodal_loss(error_auto, sigma_rec.detach(),
                              pi_rec.detach(), dist="lap")
    ph = torch.cat([ph, ph_auto], dim=1).min(1, True)[0]
    total = ph.mean()
    x0 = int(0.2 * W)
    smooth = get_smooth_loss_disp(
        out["disp"][..., x0:], src[..., x0:], gamma=GAMMA_SMOOTH)
    total = total + ALPHA_SMOOTH * smooth

    opt.zero_grad()
    total.backward()
    enc_g = {k: (p.grad.numpy().copy() if p.grad is not None
                 else np.zeros(p.shape, np.float32))
             for k, p in enc.named_parameters()}
    dec_g = {k: (p.grad.numpy().copy() if p.grad is not None
                 else np.zeros(p.shape, np.float32))
             for k, p in dec.named_parameters()}
    opt.step()
    enc.eval()
    dec.eval()
    with torch.no_grad():
        disp_post = dec(enc(img_aug), grid)["disp"].numpy()
    return float(total), enc_g, dec_g, disp_post


def _snapshot(enc, dec):
    """Numpy copies of the CURRENT state dicts (the torch step mutates
    the modules in place — conversion must capture the pre-step state)."""
    return ({k: v.numpy().copy() for k, v in enc.state_dict().items()},
            {k: v.numpy().copy() for k, v in dec.state_dict().items()})


def _convert_all(enc_sd, dec_sd, enc_over=None, dec_over=None):
    """State dicts -> flax trees; ``*_over`` replaces matching entries
    (used to push GRADIENTS through the same layout converters)."""
    if enc_over:
        enc_sd = {**enc_sd, **enc_over}
    if dec_over:
        dec_sd = {**dec_sd, **dec_over}
    trunk_p, trunk_s = convert_resnet_trunk(enc_sd, prefix="encoder.")
    dec_p, dec_s = convert_depth_decoder(
        dec_sd, num_ep=8, use_denseaspp=False, use_mixture_loss=True,
        plane_residual=True,
    )
    return trunk_p, trunk_s, dec_p, dec_s


def _jax_cfg():
    return TrainConfig(
        batch_size=B,
        flip_right=False,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, num_ep=8, pe_type="neural",
            use_denseaspp=False, use_mixture_loss=True,
            plane_residual=True,
            planes=PlaneConfig(disp_levels=49, disp_min=2, disp_max=300,
                               xz_levels=14, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0, automask=True,
                        alpha_smooth=ALPHA_SMOOTH,
                        gamma_smooth=GAMMA_SMOOTH),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=LR, beta_1=BETAS[0],
                          beta_2=BETAS[1]),
        bf16=False,
        fused_sweep=False,          # oracle path isolates torch-vs-jax
    )


def test_gradient_and_step_parity(ref_nets):
    enc, dec = ref_nets
    batch_np = _batch()
    enc_sd, dec_sd = _snapshot(enc, dec)       # PRE-step weights
    ref_total, enc_g, dec_g, ref_disp_post = _torch_step(
        enc, dec, batch_np)

    # identical converted (pre-step) weights into the flax model
    trunk_p, trunk_s, dec_p, dec_s = _convert_all(enc_sd, dec_sd)
    cfg = _jax_cfg()
    bundle = ModelBundle(cfg)
    params, stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    params = dict(params)
    stats = dict(stats)
    params["model"] = {"encoder": {"encoder": trunk_p}, "depth": dec_p}
    stats["model"] = {"encoder": {"encoder": trunk_s}, "depth": dec_s}

    from planedepth_tpu.train.step import process_batch

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def loss_fn(p):
        losses, _, _ = process_batch(
            bundle, p, stats, None, None, batch,
            jax.random.PRNGKey(0), train=True,
        )
        return losses["loss/total_loss"]

    total, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-4)

    # push the torch GRADIENTS through the same layout converters and
    # compare leaf-by-leaf
    g_trunk, _, g_dec, _ = _convert_all(
        enc_sd, dec_sd, enc_over=enc_g, dec_over=dec_g)
    ours = {"encoder": {"encoder": g_trunk}, "depth": g_dec}
    ref_leaves, treedef_r = jax.tree_util.tree_flatten_with_path(ours)
    our_tree = grads["model"]
    gscale = max(
        float(np.max(np.abs(np.asarray(g))))
        for g in jax.tree_util.tree_leaves(our_tree)
    )
    for path, ref_leaf in ref_leaves:
        leaf = our_tree
        for k in path:
            leaf = leaf[k.key]
        leaf = np.asarray(leaf)
        ref_leaf = np.asarray(ref_leaf)
        scale = max(float(np.abs(ref_leaf).max()), 1e-3 * gscale)
        err = float(np.abs(leaf - ref_leaf).max()) / scale
        assert err <= 1e-2, (jax.tree_util.keystr(path), err, scale)

    # one optax Adam step on the SAME gradients -> post-step disparity
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(params, stats, tx)
    step = jax.jit(make_train_step(bundle, tx))
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    out_post = bundle.depth_forward(
        state.params, state.batch_stats, batch["color_aug_l"],
        batch["grid"], train=False,
    )[0]
    disp_post = np.asarray(out_post["disp"])[..., 0]
    ref_post = ref_disp_post[:, 0]
    scale = np.abs(ref_post).max()
    assert np.abs(disp_post - ref_post).max() <= 2e-3 * scale, (
        np.abs(disp_post - ref_post).max(), scale,
    )
