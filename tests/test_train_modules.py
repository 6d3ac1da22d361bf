"""Unit tests for flip_right, the distillation teacher pass, view synthesis
invariants, checkpoint roundtrip, and the torch weight converter."""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig, TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle, add_flip_right_inputs, create_train_state,
    generate_post_process_disp, make_optimizer, pred_novel_images,
)
from planedepth_tpu.train.distill import flip_grid, flip_w

pytestmark = pytest.mark.heavy

H, W = 32, 64


def test_add_flip_right_semantics():
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=0).items()}
    out = add_flip_right_inputs(batch)
    assert out["color_l"].shape[0] == 4
    # second half left = flipped right
    np.testing.assert_array_equal(
        np.asarray(out["color_l"][2:]), np.asarray(flip_w(batch["color_r"]))
    )
    np.testing.assert_array_equal(
        np.asarray(out["color_r"][2:]), np.asarray(flip_w(batch["color_l"]))
    )
    # grid x negated and mirrored; y untouched
    g = np.asarray(out["grid"])
    np.testing.assert_allclose(g[2:, ..., 0], -g[:2, :, ::-1, 0], atol=1e-6)
    np.testing.assert_allclose(g[2:, ..., 1], g[:2, :, ::-1, 1], atol=1e-6)
    # extrinsics repeated unchanged
    np.testing.assert_array_equal(np.asarray(out["Rt_r"][2:]),
                                  np.asarray(batch["Rt_r"]))


def test_flip_grid_involution():
    g = jnp.asarray(make_stereo_batch(1, H, W)["grid"])
    gg = flip_grid(flip_grid(g))
    np.testing.assert_allclose(np.asarray(gg), np.asarray(g), atol=1e-6)


def _outputs_for(model_cfg, batch, train=False):
    cfg = TrainConfig(
        batch_size=2, model=model_cfg, loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W), optim=OptimConfig(), bf16=False,
    )
    bundle = ModelBundle(cfg)
    params, stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    out, _ = bundle.depth_forward(
        params, stats, batch["color_aug_l"], batch["grid"], train=False
    )
    return cfg, bundle, params, stats, out


def test_view_synthesis_zero_disp_is_identity():
    """With all-zero shift the warp must reproduce the source exactly."""
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=1).items()}
    mc = ModelConfig(
        net_type="ResNet", num_layers=18, use_denseaspp=False,
        use_mixture_loss=True, plane_residual=False, num_ep=0,
        planes=PlaneConfig(disp_levels=5, disp_min=2, disp_max=40,
                           xz_levels=0),
    )
    cfg, bundle, params, stats, out = _outputs_for(mc, batch)
    out = dict(out)
    out["disp_layered"] = jnp.zeros_like(out["disp_layered"])
    out["disp_rows"] = jnp.zeros_like(out["disp_rows"])
    rec = pred_novel_images(
        out, batch["color_l"], ("r",), {"r": batch["Rt_r"]},
        batch["K"], batch["inv_K"], warp_type="disp_warp",
        use_mixture_loss=True,
    )
    np.testing.assert_allclose(
        np.asarray(rec[("rgb_rec", "r")]), np.asarray(batch["color_l"]),
        atol=1e-4,
    )
    # warped probabilities renormalize to 1
    p = np.asarray(rec[("probability_rec", "r")])
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)


def test_generate_post_process_disp_shapes_and_flip_consistency():
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=2).items()}
    mc = ModelConfig(
        net_type="ResNet", num_layers=18, use_denseaspp=False,
        use_mixture_loss=True, plane_residual=False, num_ep=0,
        planes=PlaneConfig(disp_levels=5, disp_min=2, disp_max=40,
                           xz_levels=0),
    )
    cfg, bundle, params, stats, _ = _outputs_for(mc, batch)

    def teacher_apply(image, grid):
        out, _ = bundle.depth_forward(params, stats, image, grid, train=False)
        return out

    disp_pp, mask = generate_post_process_disp(
        teacher_apply, batch["color_aug_l"], batch["grid"], num_ep=0
    )
    assert disp_pp.shape == (2, H, W, 1)
    assert mask.shape == (2, H, W, 1)
    assert np.isfinite(np.asarray(disp_pp)).all()
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1.0 + 1e-6).all()
    d = np.asarray(disp_pp)
    assert (d > 0).all()


def test_checkpoint_roundtrip_and_partial_restore(tmp_path):
    from planedepth_tpu.utils.checkpoint import (
        load_checkpoint, restore_submodules, save_checkpoint,
    )

    cfg = TrainConfig(
        batch_size=2,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=False, plane_residual=False, num_ep=0,
            planes=PlaneConfig(disp_levels=5, xz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W), optim=OptimConfig(), bf16=False,
    )
    bundle = ModelBundle(cfg)
    params, stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(params, stats, tx)
    path = save_checkpoint(str(tmp_path), "last_models", state,
                           height=H, width=W)
    payload = load_checkpoint(path)

    # fresh state with different params
    params2, stats2, _ = bundle.init(jax.random.PRNGKey(1), H, W)
    state2 = create_train_state(params2, stats2, tx)
    restored = restore_submodules(state2, payload, ("encoder", "depth"))
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _torch_resnet18():
    """torchvision-topology resnet18 trunk built from torch.nn directly
    (torchvision itself is not installed in this image) with torchvision's
    parameter naming, as the conversion oracle."""
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU()
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return self.relu(h + idt)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2),
                                        BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2),
                                        BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2),
                                        BasicBlock(512, 512))

        def forward(self, x):
            h = self.relu(self.bn1(self.conv1(x)))
            f0 = h
            h = self.layer1(self.maxpool(h))
            h = self.layer2(h)
            h = self.layer3(h)
            return f0, self.layer4(h)

    return Trunk()


def test_torch_resnet_conversion_matches_torch_forward():
    """Random torch resnet18 trunk -> converted params: our encoder output
    must match the torch output (eval mode, running stats)."""
    import torch

    from planedepth_tpu.models.resnet import ResnetEncoder
    from planedepth_tpu.utils.torch_convert import convert_resnet_encoder

    torch.manual_seed(0)
    net = _torch_resnet18().eval()
    # randomize BN stats so the test exercises them
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    variables = convert_resnet_encoder(sd)

    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(
        np.float32
    )
    enc = ResnetEncoder(18)
    feats = enc.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )

    with torch.no_grad():
        xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        ref1, ref4 = net((xt - 0.45) / 0.225)

    np.testing.assert_allclose(
        np.asarray(feats[0]), np.moveaxis(ref1.numpy(), 1, -1),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(feats[4]), np.moveaxis(ref4.numpy(), 1, -1),
        rtol=1e-2, atol=1e-3,
    )


def test_vgg19_conversion_matches_torch_forward():
    """Hand-built VGG19 features (config E) as the conversion oracle."""
    import torch
    import torch.nn as nn

    from planedepth_tpu.models.perceptual import Vgg19Features
    from planedepth_tpu.utils.torch_convert import convert_vgg19_features

    torch.manual_seed(1)
    chans = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    cin = 3
    for c in chans:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, c, 3, padding=1), nn.ReLU()]
            cin = c
    vgg = nn.Sequential(*layers).eval()
    sd = {k: v.numpy() for k, v in vgg.state_dict().items()}
    variables = convert_vgg19_features(sd)

    x = np.random.default_rng(1).uniform(0, 1, (1, 32, 32, 3)).astype(
        np.float32
    )
    feats = Vgg19Features().apply(variables, jnp.asarray(x))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        xt = (torch.from_numpy(np.moveaxis(x, -1, 1).copy()) - mean) / std
        h = xt
        refs = []
        for i, layer in enumerate(vgg):
            h = layer(h)
            if i in (4, 9, 18):   # pool1, pool2, pool3 (slice boundaries)
                refs.append(h)
    for ours, ref in zip(feats, refs):
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-3, atol=1e-4,
        )


def test_fast_forward_schedule_decays_lr():
    """--start_epoch resume with a fresh Adam must resume at the DECAYED
    LR (the reference replays MultiStepLR, trainer.py:243-244)."""
    import jax.numpy as jnp

    from planedepth_tpu.config import OptimConfig, TrainConfig
    from planedepth_tpu.train.state import (
        fast_forward_schedule, make_optimizer,
    )

    cfg = TrainConfig(optim=OptimConfig(
        learning_rate=1e-3, milestones=(1,), lr_gamma=0.5))
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((3,))}
    g = {"w": jnp.ones((3,))}
    u0, _ = tx.update(g, tx.init(params), params)
    u2, _ = tx.update(g, fast_forward_schedule(tx.init(params), 25), params)
    assert abs(float(u2["w"][0])) < 0.75 * abs(float(u0["w"][0]))


def test_flip_right_carries_colmap_poses():
    """use_colmap + flip_right: the reference DROPS Rt_{f} in
    add_flip_right_inputs and crashes; repaired here (poses repeated)."""
    import jax.numpy as jnp
    import numpy as np

    from planedepth_tpu.train.flip import add_flip_right_inputs

    from planedepth_tpu.data.synthetic import make_stereo_batch

    b = {k: jnp.asarray(v) for k, v in
         make_stereo_batch(2, 16, 32, novel_frame_ids=(-1,)).items()}
    out = add_flip_right_inputs(b, novel_frame_ids=(-1,))
    assert out["Rt_-1"].shape[0] == 4
    np.testing.assert_array_equal(
        np.asarray(out["Rt_-1"][:2]), np.asarray(out["Rt_-1"][2:])
    )
