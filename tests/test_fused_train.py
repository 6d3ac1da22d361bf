"""The fused-sweep train step == the oracle train step (loss + update)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig, TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle, create_train_state, make_optimizer, make_train_step,
)

pytestmark = pytest.mark.heavy

H, W = 64, 96


def _cfg(fused, s2d="auto", quad=True, alpha_pc=0.0, pc_s2d=True,
         automask=True, net_type="ResNet", mixture=True, xz_levels=3,
         use_mom=False, alpha_self=0.0):
    return TrainConfig(
        batch_size=2,
        flip_right=True,
        model=ModelConfig(
            net_type=net_type, num_layers=18, use_denseaspp=False,
            use_mixture_loss=mixture, plane_residual=True, num_ep=0,
            planes=PlaneConfig(disp_levels=7, disp_min=2, disp_max=24,
                               xz_levels=xz_levels, yz_levels=0),
            s2d_tail=s2d,
        ),
        loss=LossConfig(alpha_pc=alpha_pc, automask=automask,
                        use_mom=use_mom, alpha_self=alpha_self),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=False,
        fused_sweep=fused,
        sweep_quad=quad,
        pc_s2d=pc_s2d,
        allow_random_pc=True,
    )


def _one_step(fused, s2d="auto", quad=True, alpha_pc=0.0, pc_s2d=True,
              automask=True, net_type="ResNet", mixture=True, xz_levels=3,
              use_mom=False, alpha_self=0.0):
    cfg = _cfg(fused, s2d, quad, alpha_pc, pc_s2d, automask, net_type,
               mixture, xz_levels, use_mom, alpha_self)
    bundle = ModelBundle(cfg)
    params, stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(params, stats, tx, pc_params=pc_params)
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(1, H, W, seed=4).items()}
    step = jax.jit(make_train_step(bundle, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    return state, metrics


def _assert_steps_match(a, b, rtol=2e-4, param_tol=5e-5):
    s_f, m_f = a
    s_o, m_o = b
    for k in ("loss/ph_loss", "loss/smooth_loss", "loss/total_loss"):
        np.testing.assert_allclose(
            float(m_f[k]), float(m_o[k]), rtol=rtol, err_msg=k,
        )
    lf = jax.tree_util.tree_leaves(s_f.params)
    lo = jax.tree_util.tree_leaves(s_o.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(lf, lo)
    )
    assert worst < param_tol, worst


def test_fused_step_matches_oracle_step():
    # identical losses AND parameter updates through both paths
    _assert_steps_match(_one_step(True), _one_step(False))


def test_fused_s2d_step_matches_oracle_step():
    """The full production stack — s2d decoder tail + raw phase-packed
    heads + QUAD phase-split sweep with the in-kernel disparity head —
    must equal the plain oracle step."""
    _assert_steps_match(
        _one_step(True, s2d="on"), _one_step(False), param_tol=1e-4
    )


def test_quad_step_matches_v1_packed_step():
    """sweep_quad=True vs the v1 packed kernel on the same s2d stack:
    identical losses and parameter updates (same math, phase-split
    layout)."""
    _assert_steps_match(
        _one_step(True, s2d="on", quad=True),
        _one_step(True, s2d="on", quad=False),
        param_tol=1e-4,
    )


def test_fused_use_mom_matches_oracle_step():
    """use_mom on the fused path (stop-grad shift-sampler mask_novel,
    train/distill.py:fused_mom_mask_novel) == the oracle mom step."""
    _assert_steps_match(_one_step(True, use_mom=True),
                        _one_step(False, use_mom=True))


def test_fused_s2d_use_mom_matches_oracle_step():
    """use_mom with the merged s2d head: mask_novel rebuilt from the
    phase-packed ls_s2d tensor."""
    _assert_steps_match(_one_step(True, s2d="on", use_mom=True),
                        _one_step(False, use_mom=True))


def test_fused_no_mixture_use_mom_matches_oracle_step():
    """use_mom without the mixture head (softmax probability only)."""
    _assert_steps_match(_one_step(True, mixture=False, use_mom=True,
                                  automask=False),
                        _one_step(False, mixture=False, use_mom=True,
                                  automask=False))


def test_fused_alpha_self_matches_oracle_step():
    """alpha_self on the fused sweep path: the self-reconstruction
    (single-map XLA gather of the right image at the expected disparity,
    reference trainer.py:605-633) is assembled alongside the kernel
    outputs — fused == oracle, including loss/self_loss.  s2d='on'
    exercises the kernel-computed disparity head feeding the self-rec."""
    f = _one_step(True, s2d="on", alpha_self=0.1)
    o = _one_step(False, alpha_self=0.1)
    np.testing.assert_allclose(
        float(f[1]["loss/self_loss"]), float(o[1]["loss/self_loss"]),
        rtol=2e-4,
    )
    _assert_steps_match(f, o, param_tol=1e-4)


def test_fused_no_automask_matches_oracle_step():
    """automask=False (the reference's stereo recipes): the quad kernel
    runs with_auto=False — no nll_auto output at all — and must still
    equal the oracle step."""
    _assert_steps_match(
        _one_step(True, s2d="on", automask=False),
        _one_step(False, automask=False),
        param_tol=1e-4,
    )


def test_fused_packed_pc_matches_oracle_step():
    """Full-recipe parity: the quad step with the PACKED perceptual
    branch (pc_s2d: s2d VGG stem fed the kernel's phase-split rgb and
    the packed target/source) == the oracle step's full-res perceptual
    loss, including pc_loss and parameter updates."""
    fused = _one_step(True, s2d="on", alpha_pc=0.1)
    oracle = _one_step(False, alpha_pc=0.1, pc_s2d=False)
    for k in ("loss/pc_loss",):
        np.testing.assert_allclose(
            float(fused[1][k]), float(oracle[1][k]), rtol=2e-4, err_msg=k,
        )
    _assert_steps_match(fused, oracle, param_tol=1e-4)


def _plade_step(fused):
    cfg = TrainConfig(
        batch_size=2,
        flip_right=True,
        model=ModelConfig(
            net_type="PladeNet", num_ep=8, use_mixture_loss=True,
            plane_residual=True,
            planes=PlaneConfig(disp_levels=7, disp_min=2, disp_max=24,
                               xz_levels=3, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0, automask=True),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=False,
        fused_sweep=fused,
    )
    bundle = ModelBundle(cfg)
    params, stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(params, stats, tx)
    batch = {k: jnp.asarray(v) for k, v in
             make_stereo_batch(1, H, W, seed=4).items()}
    step = jax.jit(make_train_step(bundle, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    return state, metrics


def test_fused_pladenet_step_matches_oracle_step():
    """The fused Pallas loss path is model-family agnostic: PladeNet
    emits the same plane-head outputs, so its stereo training also rides
    the kernel on TPU — pinned here against its oracle step."""
    _assert_steps_match(_plade_step(True), _plade_step(False))


def test_falnet_fused_step_matches_oracle_step():
    """FalNet (no mixture head, softmax compositing + L1 photometric,
    reference networks/fal_net.py:199-205, trainer.py:738) rides the
    LOGITS-ONLY no-mixture kernel variant: sigma is the literal 1.0
    inside the kernel so the composite weight IS the softmax weight, and
    the L1 + automask are assembled outside the kernel."""
    _assert_steps_match(
        _one_step(True, net_type="FalNet", mixture=False, xz_levels=0),
        _one_step(False, net_type="FalNet", mixture=False, xz_levels=0),
    )


def test_no_mixture_resnet_fused_step_matches_oracle_step():
    """use_mixture_loss=False ablation on the ResNet stack (L1 on the
    composite) WITH ground planes (real padding masks): fused == oracle,
    including the kernel-computed disp head (the no-mixture decoder
    emits no disp in fused mode)."""
    _assert_steps_match(
        _one_step(True, mixture=False),
        _one_step(False, mixture=False),
    )


def test_no_mixture_no_automask_fused_matches_oracle():
    """No-mixture + automask=False: the kernel runs with_auto=False and
    the plain L1 has no identity-reprojection min."""
    _assert_steps_match(
        _one_step(True, mixture=False, xz_levels=0, automask=False),
        _one_step(False, mixture=False, xz_levels=0, automask=False),
    )
