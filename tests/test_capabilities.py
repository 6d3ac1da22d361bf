"""Capability-surface smoke tests: every reference training mode runs.

One jitted train step per configuration from SURVEY.md §2.3's flag matrix:
PladeNet / FalNet families, monocular pose-net training (homography and
depth warps), colmap poses, frequency positional encoding, SSIM, automask,
mom, render_probability, self-reconstruction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig, TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle, create_train_state, make_optimizer, make_train_step,
)

pytestmark = pytest.mark.heavy

H, W = 64, 96
SMALL_PLANES = PlaneConfig(disp_levels=7, disp_min=2, disp_max=30,
                           xz_levels=3, yz_levels=0)


def run_one_step(cfg, novel_frames=()):
    bundle = ModelBundle(cfg)
    params, stats, pc = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(params, stats, tx, pc_params=pc)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_stereo_batch(
            cfg.per_step_batch, H, W, seed=0, novel_frame_ids=novel_frames
        ).items()
    }
    step = jax.jit(make_train_step(bundle, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss/total_loss"])
    assert np.isfinite(loss), loss
    return metrics


def base_cfg(**kw):
    d = dict(
        batch_size=2,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=True, plane_residual=True, num_ep=8,
            planes=SMALL_PLANES,
        ),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(),
        bf16=False,
    )
    d.update(kw)
    return TrainConfig(**d)


def test_plade_net_train_step():
    cfg = base_cfg(model=ModelConfig(
        net_type="PladeNet", num_ep=8, use_mixture_loss=True,
        plane_residual=True, planes=SMALL_PLANES,
    ))
    run_one_step(cfg)


def test_fal_net_train_step():
    cfg = base_cfg(model=ModelConfig(
        net_type="FalNet", use_mixture_loss=False, plane_residual=False,
        planes=PlaneConfig(disp_levels=7, disp_min=2, disp_max=30,
                           xz_levels=0),
    ))
    run_one_step(cfg)


def test_mono_pose_net_homography_warp():
    """Monocular training: pose net + homography warp + automask
    (reference README stage: --novel_frame_ids -1 1 --no_stereo)."""
    cfg = base_cfg(
        novel_frame_ids=(-1, 1),
        no_stereo=True,
        warp_type="homography_warp",
        loss=LossConfig(alpha_pc=0.0, automask=True),
    )
    m = run_one_step(cfg, novel_frames=(-1, 1))
    assert "loss/ph_loss" in m


def test_mono_pose_net_depth_warp_with_stereo():
    """Stereo + temporal neighbors, depth warp for the novel frames."""
    cfg = base_cfg(
        novel_frame_ids=(1,),
        warp_type="depth_warp",
    )
    run_one_step(cfg, novel_frames=(1,))


def test_colmap_pose_path():
    """use_colmap: poses come from the data, Rc rotates the translation
    (reference trainer.py:397-398)."""
    cfg = base_cfg(
        novel_frame_ids=(1,),
        warp_type="homography_warp",
        data=DataConfig(height=H, width=W, use_colmap=True),
    )
    run_one_step(cfg, novel_frames=(1,))


def test_frequency_positional_encoding():
    cfg = base_cfg(model=ModelConfig(
        net_type="ResNet", num_layers=18, use_denseaspp=False,
        use_mixture_loss=True, plane_residual=False, num_ep=10,
        pe_type="frequency", planes=SMALL_PLANES,
    ))
    run_one_step(cfg)


def test_ssim_and_l1_photometric():
    cfg = base_cfg(
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=False, plane_residual=False, num_ep=0,
            planes=SMALL_PLANES,
        ),
        loss=LossConfig(alpha_pc=0.0, use_ssim=True, alpha_self=0.1),
    )
    m = run_one_step(cfg)
    assert "loss/self_loss" in m


def test_mom_mirror_occlusion():
    cfg = base_cfg(
        flip_right=True,
        loss=LossConfig(alpha_pc=0.0, use_mom=True),
    )
    run_one_step(cfg)


def test_render_probability_train_step():
    cfg = base_cfg(model=ModelConfig(
        net_type="ResNet", num_layers=18, use_denseaspp=False,
        use_mixture_loss=True, plane_residual=False, num_ep=0,
        render_probability=True, planes=SMALL_PLANES,
    ))
    run_one_step(cfg)


def test_remat_matches_no_remat():
    cfg_a = base_cfg()
    cfg_b = base_cfg(remat_warp=True)
    m_a = run_one_step(cfg_a)
    m_b = run_one_step(cfg_b)
    np.testing.assert_allclose(
        float(m_a["loss/total_loss"]), float(m_b["loss/total_loss"]),
        rtol=1e-5,
    )


def test_match_aug_uses_augmented_targets():
    cfg = base_cfg(loss=LossConfig(alpha_pc=0.0, match_aug=True))
    run_one_step(cfg)
