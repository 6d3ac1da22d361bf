"""CLI stage presets, pretrained-weight wiring, optimizer-state resume.

Covers the round-2 wiring: ``--stage`` seeding the config from the reference
README recipes with explicit flags overriding (reference README.md:36-90),
converted ImageNet npz trees merged into the live train state (reference
resnet_encoder.py:35, layers.py:381), and Adam-state restore on resume
(reference trainer.py:905-913).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.cli.options import (
    args_to_config,
    build_parser,
    parse_with_explicit,
)
from planedepth_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    PlaneConfig,
    TrainConfig,
    self_distillation_config,
)
from planedepth_tpu.utils.torch_convert import (
    convert_resnet_encoder,
    convert_vgg19_features,
    save_converted,
)

H, W = 64, 96


def parse(argv):
    parser = build_parser()
    parser.add_argument("--stage", type=str, default=None)
    args, explicit = parse_with_explicit(parser, argv)
    return args_to_config(args, explicit=explicit, stage=args.stage)


# ---------------------------------------------------------------------------
# CLI / stage presets
# ---------------------------------------------------------------------------

def test_stage_hr_finetune_applies_preset():
    cfg = parse(["--stage", "hr_finetune"])
    assert cfg.optim.learning_rate == 2.5e-5
    assert cfg.optim.num_epochs == 1
    assert (cfg.data.height, cfg.data.width) == (384, 1280)
    assert cfg.data.no_crop
    assert cfg.flip_right
    # preset keeps the full stage-1 feature set (ModelConfig defaults)
    assert cfg.model.use_denseaspp and cfg.model.use_mixture_loss


def test_stage_explicit_flags_override_preset():
    cfg = parse([
        "--stage", "hr_finetune", "--batch_size", "4",
        "--learning_rate", "1e-5", "--height", "192", "--width", "640",
    ])
    assert cfg.batch_size == 4
    assert cfg.optim.learning_rate == 1e-5
    assert (cfg.data.height, cfg.data.width) == (192, 640)
    # non-overridden preset values survive
    assert cfg.optim.num_epochs == 1
    assert cfg.data.no_crop


def test_sd_preset_matches_reference_stage3():
    """Reference stage-3 command (README.md:56-74): batch 4, lr 2e-5,
    10 epochs, milestone [5], sd=1.0, NO --flip_right."""
    cfg = self_distillation_config()
    assert not cfg.flip_right
    assert cfg.batch_size == 4
    assert cfg.per_step_batch == 4          # no flip halving
    assert cfg.optim.learning_rate == 2e-5
    assert cfg.optim.num_epochs == 10
    assert cfg.optim.milestones == (5,)
    assert cfg.loss.self_distillation == 1.0


def test_perf_flags_parse():
    cfg = parse(["--fused_sweep", "--remat", "--remat_warp",
                 "--warp_sample_bf16"])
    assert cfg.fused_sweep and cfg.model.remat
    assert cfg.remat_warp and cfg.warp_sample_bf16
    assert not cfg.rowshift_warp


def test_no_stage_uses_argparse_defaults():
    cfg = parse(["--num_layers", "18"])
    assert cfg.model.num_layers == 18
    assert not cfg.model.use_denseaspp      # store_true default
    assert cfg.optim.num_epochs == 50
    assert cfg.restore_optimizer            # --no_restore_optimizer unset


def test_evaluate_adopts_checkpoint_meta():
    """Evaluating an HR checkpoint with default flags must run at the
    checkpoint's resolution + net config (reference embeds height/width in
    encoder.pth, trainer.py:879-882)."""
    import json

    from planedepth_tpu.cli.evaluate import apply_checkpoint_meta
    from planedepth_tpu.config import hr_finetune_config

    saved = hr_finetune_config(model=ModelConfig(num_layers=101))
    meta = {"height": 384, "width": 1280,
            "config": json.loads(saved.to_json())}

    cfg = parse(["--eval_stereo"])  # defaults: 192x640, resnet50
    out = apply_checkpoint_meta(cfg, meta, explicit=set())
    assert (out.data.height, out.data.width) == (384, 1280)
    assert out.model.num_layers == 101

    # explicit flags win
    cfg2 = parse(["--eval_stereo", "--height", "192", "--num_layers", "18"])
    out2 = apply_checkpoint_meta(
        cfg2, meta, explicit={"height", "num_layers"}
    )
    assert out2.data.height == 192
    assert out2.data.width == 1280          # not explicit -> from meta
    assert out2.model.num_layers == 18      # any model flag -> CLI model

    # config round-trip helper
    rebuilt = TrainConfig.from_dict(json.loads(saved.to_json()))
    assert rebuilt.model.num_layers == 101
    assert rebuilt.optim.milestones == saved.optim.milestones
    assert rebuilt.data.no_crop == saved.data.no_crop


# ---------------------------------------------------------------------------
# pretrained weight wiring
# ---------------------------------------------------------------------------

def _conv_to_torch(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _torch_sd_from_trunk(params, stats, rng):
    """Build a torchvision-style resnet state_dict with random values whose
    shapes are derived from the live flax trunk tree."""
    sd = {}

    def bn_entries(tp, p_bn, s_bn):
        sd[tp + ".weight"] = rng.normal(size=p_bn["bn"]["scale"].shape)
        sd[tp + ".bias"] = rng.normal(size=p_bn["bn"]["bias"].shape)
        sd[tp + ".running_mean"] = rng.normal(size=s_bn["bn"]["mean"].shape)
        sd[tp + ".running_var"] = rng.uniform(
            0.5, 1.5, size=s_bn["bn"]["var"].shape
        )

    sd["conv1.weight"] = rng.normal(
        size=_conv_to_torch(params["conv1"]["kernel"]).shape
    )
    bn_entries("bn1", params["bn1"], stats["bn1"])
    for name, p in params.items():
        if not name.startswith("layer"):
            continue
        layer, b = name[5:].split("_")
        tp = f"layer{layer}.{b}"
        for sub, v in p.items():
            if sub.startswith("conv"):
                sd[f"{tp}.{sub}.weight"] = rng.normal(
                    size=_conv_to_torch(v["kernel"]).shape
                )
            elif sub.startswith("bn"):
                bn_entries(f"{tp}.{sub}", v, stats[name][sub])
            elif sub == "downsample_conv":
                sd[f"{tp}.downsample.0.weight"] = rng.normal(
                    size=_conv_to_torch(v["kernel"]).shape
                )
            elif sub == "downsample_bn":
                bn_entries(f"{tp}.downsample.1", v,
                           stats[name]["downsample_bn"])
    return sd


def _tiny_cfg(**kw):
    base = dict(
        batch_size=2,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            plane_residual=False, num_ep=0,
            planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                               xz_levels=0, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-3, num_epochs=1, milestones=()),
        bf16=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_pretrained_encoder_lands_in_live_state(tmp_path):
    from planedepth_tpu.train import ModelBundle
    from planedepth_tpu.utils.pretrained import apply_pretrained

    cfg = _tiny_cfg(weights_dir=str(tmp_path))
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)

    trunk_p = params["model"]["encoder"]["encoder"]
    trunk_s = batch_stats["model"]["encoder"]["encoder"]
    rng = np.random.default_rng(0)
    sd = _torch_sd_from_trunk(trunk_p, trunk_s, rng)
    variables = convert_resnet_encoder(sd)
    save_converted(str(tmp_path / "resnet18.npz"), variables)

    new_p, new_s, new_pc, loaded = apply_pretrained(
        cfg, params, batch_stats, pc_params
    )
    assert loaded == ["encoder<-resnet18"]
    got = new_p["model"]["encoder"]["encoder"]["conv1"]["kernel"]
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    got_var = new_s["model"]["encoder"]["encoder"]["layer2_0"]["bn1"]["bn"]["var"]
    np.testing.assert_allclose(
        np.asarray(got_var), sd["layer2.0.bn1.running_var"], rtol=1e-6
    )
    # decoder params untouched
    assert jax.tree_util.tree_structure(new_p) == \
        jax.tree_util.tree_structure(params)


def test_pretrained_vgg_lands_in_pc_params(tmp_path):
    from planedepth_tpu.train import ModelBundle
    from planedepth_tpu.utils.pretrained import apply_pretrained

    cfg = _tiny_cfg(
        loss=LossConfig(alpha_pc=0.1), weights_dir=str(tmp_path),
        model=ModelConfig(
            net_type="PladeNet", num_ep=8, plane_residual=False,
            planes=PlaneConfig(disp_levels=9, xz_levels=0, yz_levels=0),
        ),
    )
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    assert pc_params is not None

    rng = np.random.default_rng(1)
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 16]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128),
             (128, 256), (256, 256), (256, 256), (256, 256)]
    sd = {}
    for cid, (ci, co) in zip(conv_ids, chans):
        sd[f"features.{cid}.weight"] = rng.normal(size=(co, ci, 3, 3))
        sd[f"features.{cid}.bias"] = rng.normal(size=(co,))
    save_converted(str(tmp_path / "vgg19.npz"),
                   convert_vgg19_features(sd))

    _, _, new_pc, loaded = apply_pretrained(cfg, params, batch_stats, pc_params)
    assert loaded == ["pc<-vgg19.npz"]
    got = new_pc["params"]["conv_3"]["kernel"]
    want = np.transpose(sd["features.7.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_missing_vgg_is_hard_error(tmp_path):
    from planedepth_tpu.train import ModelBundle
    from planedepth_tpu.utils.pretrained import (
        PretrainedWeightsError, apply_pretrained, check_perceptual_weights,
    )

    cfg = _tiny_cfg(
        loss=LossConfig(alpha_pc=0.1), weights_dir=str(tmp_path),
        model=ModelConfig(
            net_type="PladeNet", num_ep=8, plane_residual=False,
            planes=PlaneConfig(disp_levels=9, xz_levels=0, yz_levels=0),
        ),
    )
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    with pytest.raises(PretrainedWeightsError, match="alpha_pc"):
        apply_pretrained(cfg, params, batch_stats, pc_params)

    # no weights_dir at all: the Trainer-level check fires
    cfg2 = cfg.replace(weights_dir=None)
    with pytest.raises(PretrainedWeightsError, match="random perceptual"):
        check_perceptual_weights(cfg2, [])
    # but the explicit escape hatch works
    check_perceptual_weights(cfg2.replace(allow_random_pc=True), [])


def test_structure_mismatch_is_hard_error(tmp_path):
    from planedepth_tpu.train import ModelBundle
    from planedepth_tpu.utils.pretrained import (
        PretrainedWeightsError, apply_pretrained,
    )

    cfg = _tiny_cfg(weights_dir=str(tmp_path))
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    # resnet34-shaped npz against a resnet18 model: structure mismatch
    save_converted(
        str(tmp_path / "resnet18.npz"),
        {"params": {"encoder": {"conv1": {"kernel": np.zeros((7, 7, 3, 64))}}},
         "batch_stats": {"encoder": {}}},
    )
    with pytest.raises(PretrainedWeightsError, match="does not match"):
        apply_pretrained(cfg, params, batch_stats, pc_params)


# ---------------------------------------------------------------------------
# optimizer-state restore on resume (reference trainer.py:905-913)
# ---------------------------------------------------------------------------

def test_resume_restores_adam_state_bit_equal(tmp_path):
    from planedepth_tpu.data.synthetic import make_stereo_batch
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer, make_train_step,
    )
    from planedepth_tpu.utils.checkpoint import (
        load_checkpoint, restore_submodules, save_checkpoint,
    )

    cfg = _tiny_cfg()
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, batch_stats, tx, pc_params=pc_params)
    step = jax.jit(make_train_step(bundle, tx))
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=7).items()}
    rng = jax.random.PRNGKey(0)

    # run 3 steps, checkpoint, run 2 more: the uninterrupted trace
    for _ in range(3):
        state, _ = step(state, batch, rng)
    save_checkpoint(str(tmp_path), "last_models", jax.device_get(state))
    for _ in range(2):
        state, _ = step(state, batch, rng)
    want = jax.device_get(state.params)

    # fresh init -> restore (params + batch_stats + Adam) -> same 2 steps
    params2, batch_stats2, pc2 = bundle.init(jax.random.PRNGKey(9), H, W)
    state2 = create_train_state(params2, batch_stats2, tx, pc_params=pc2)
    payload = load_checkpoint(str(tmp_path / "last_models"))
    state2 = restore_submodules(
        state2, payload, ["encoder", "depth"], restore_optimizer=True
    )
    state2 = state2.replace(step=jnp.asarray(payload["step"]))
    for _ in range(2):
        state2, _ = step(state2, batch, rng)
    got = jax.device_get(state2.params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        want, got,
    )


def test_incompatible_opt_state_falls_back(tmp_path, capsys):
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer,
    )
    from planedepth_tpu.utils.checkpoint import (
        load_checkpoint, restore_submodules, save_checkpoint,
    )

    cfg = _tiny_cfg()
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, batch_stats, tx, pc_params=pc_params)
    save_checkpoint(str(tmp_path), "last_models", jax.device_get(state))

    # different architecture: params restore is filtered (no-op here),
    # optimizer restore must skip instead of crashing
    cfg34 = _tiny_cfg(model=ModelConfig(
        net_type="ResNet", num_layers=34, use_denseaspp=False,
        plane_residual=False, num_ep=0,
        planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                           xz_levels=0, yz_levels=0),
    ))
    bundle34 = ModelBundle(cfg34)
    p34, s34, pc34 = bundle34.init(jax.random.PRNGKey(0), H, W)
    state34 = create_train_state(p34, s34, tx, pc_params=pc34)
    payload = load_checkpoint(str(tmp_path / "last_models"))
    restored = restore_submodules(
        state34, payload, [], restore_optimizer=True
    )
    # same tree as before the attempted restore
    assert jax.tree_util.tree_structure(restored.opt_state) == \
        jax.tree_util.tree_structure(state34.opt_state)
    assert "incompatible" in capsys.readouterr().out
