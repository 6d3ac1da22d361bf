"""End-to-end training: the whole pipeline on a synthetic stereo scene.

The overfit test is the framework's ground truth: stage1 semantics (plane
volume, disp_warp view synthesis, mixture loss, flip_right, Adam) must drive
the photometric loss down and recover the planted disparity — a property the
reference enforces only implicitly through full KITTI runs (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    PlaneConfig,
    TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.heavy

H, W = 64, 96


def tiny_config(**kw) -> TrainConfig:
    base = dict(
        batch_size=2,
        model=ModelConfig(
            net_type="ResNet",
            num_layers=18,
            use_denseaspp=False,
            use_mixture_loss=True,
            plane_residual=False,
            num_ep=0,
            planes=PlaneConfig(disp_levels=17, disp_min=2, disp_max=40,
                               xz_levels=0, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0, alpha_smooth=0.01),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=2e-4, num_epochs=1, milestones=()),
        bf16=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def build(cfg, seed=0):
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(
        jax.random.PRNGKey(seed), cfg.data.height, cfg.data.width
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, batch_stats, tx, pc_params=pc_params)
    return bundle, tx, state


def test_train_step_runs_and_reduces_loss():
    cfg = tiny_config()
    bundle, tx, state = build(cfg)
    step = jax.jit(make_train_step(bundle, tx))
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=3).items()}
    rng = jax.random.PRNGKey(42)

    state, m0 = step(state, batch, rng)
    first = float(m0["loss/total_loss"])
    assert np.isfinite(first)
    for _ in range(14):
        state, m = step(state, batch, rng)
    last = float(m["loss/total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_overfit_recovers_constant_disparity():
    """Planted constant disparity 8px: after overfitting one batch the
    expected disparity should approach 8 in the image interior."""
    cfg = tiny_config()
    bundle, tx, state = build(cfg)
    step = jax.jit(make_train_step(bundle, tx))
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=5, constant_disp=8.0).items()}
    rng = jax.random.PRNGKey(0)
    for _ in range(60):
        state, m = step(state, batch, rng)

    outputs, _ = bundle.depth_forward(
        state.params, state.batch_stats, batch["color_aug_l"],
        batch["grid"], train=False,
    )
    disp = np.asarray(outputs["disp"])[:, 8:-8, 16:-16, 0]
    med = np.median(disp)
    assert abs(med - 8.0) < 2.0, med


def test_flip_right_doubles_batch():
    cfg = tiny_config(flip_right=True)
    bundle, tx, state = build(cfg)
    step = jax.jit(make_train_step(bundle, tx))
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(1, H, W, seed=1).items()}
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss/total_loss"]))


def test_eval_step_metrics():
    cfg = tiny_config()
    bundle, tx, state = build(cfg)
    eval_step = jax.jit(make_eval_step(bundle))
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=2).items()}
    metrics = eval_step(state, batch)
    for k in ("de/abs_rel", "da/a1", "de/rms"):
        assert np.isfinite(float(metrics[k])), k


def test_self_distillation_branch_runs():
    cfg = tiny_config(loss=LossConfig(alpha_pc=0.0, self_distillation=1.0))
    bundle, tx, state = build(cfg)
    teacher = {"params": state.params, "batch_stats": state.batch_stats}
    state = state.replace(teacher=teacher)
    step = jax.jit(make_train_step(bundle, tx))
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(2, H, W, seed=2).items()}
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert "loss/disp_loss" in m
    assert np.isfinite(float(m["loss/disp_loss"]))


def test_self_distillation_with_flip_right_runs():
    """SD + flip_right: the teacher consumes the already-doubled batch
    (reference trainer.py:294 vs 404) — regression for a double-doubling
    shape crash.  Covers both the oracle and the fused loss paths."""
    for fused in (False, True):
        cfg = tiny_config(
            loss=LossConfig(alpha_pc=0.0, self_distillation=1.0),
            flip_right=True, batch_size=4, fused_sweep=fused,
        )
        bundle, tx, state = build(cfg)
        teacher = {"params": state.params, "batch_stats": state.batch_stats}
        state = state.replace(teacher=teacher)
        step = jax.jit(make_train_step(bundle, tx))
        batch = {k: jnp.asarray(v) for k, v in
                 make_stereo_batch(2, H, W, seed=2).items()}
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss/disp_loss"])), fused


@pytest.mark.heavy
def test_overfit_recovers_structured_scene():
    """Piecewise-planar scene (linear-in-row ground plane + 2 fronto
    boxes, analytic disparity): overfitting one batch through the FUSED
    production path must recover the disparity map to sub-pixel mean
    error — exercising the ground planes, plane residuals, mixture
    interpolation and smoothness jointly (the constant-disp test above
    cannot see ground-plane or residual regressions)."""
    from planedepth_tpu.data.synthetic import (
        make_structured_batch, structured_left_gt,
    )

    cfg = tiny_config(
        fused_sweep=True,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=True, plane_residual=True, num_ep=0,
            planes=PlaneConfig(disp_levels=17, disp_min=2, disp_max=40,
                               xz_levels=6, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0, alpha_smooth=0.01),
        optim=OptimConfig(learning_rate=3e-4, num_epochs=1, milestones=()),
    )
    bundle, tx, state = build(cfg)
    step = jax.jit(make_train_step(bundle, tx))
    batch = {k: jnp.asarray(v) for k, v in
             make_structured_batch(2, H, W, seed=12).items()}
    rng = jax.random.PRNGKey(0)
    for _ in range(150):
        state, m = step(state, batch, rng)

    outputs, _ = bundle.depth_forward(
        state.params, state.batch_stats, batch["color_aug_l"],
        batch["grid"], train=False,
    )
    disp = np.asarray(outputs["disp"])[..., 0]            # (B, H, W)
    gt, mask = structured_left_gt(H, W)
    # borders off; the eval mask already removes right-view-occluded
    # pixels and the +-2 px discontinuity bands (see structured_left_gt)
    mask = mask.copy()
    mask[:6] = mask[-6:] = False
    mask[:, :8] = mask[:, -8:] = False
    assert mask.mean() > 0.5                   # the bar covers the scene
    err = np.abs(disp - gt[None])[:, mask]
    mae = float(err.mean())
    assert mae < 1.0, mae
