"""The fused warp2d train step (train/mono.py) == the oracle train step
for the monocular homography_warp / depth_warp modes: identical losses
AND parameter gradients (reference trainer.py:533-560 warp modes +
:701-773 loss assembly)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig,
    TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle, create_train_state, make_optimizer, make_train_step,
)
from planedepth_tpu.train.mono import fused_warp2d_ok

H, W = 32, 128          # warp2d kernel needs W % 128 == 0


def _cfg(fused, warp_type="homography_warp", mixture=True, alpha_pc=0.0,
         no_stereo=False, novel=(-1, 1), sd=0.0, alpha_self=0.0):
    return TrainConfig(
        batch_size=2,
        flip_right=False,
        warp_type=warp_type,
        no_stereo=no_stereo,
        novel_frame_ids=novel,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=mixture, plane_residual=True, num_ep=0,
            planes=PlaneConfig(disp_levels=7, disp_min=2, disp_max=16,
                               xz_levels=3, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=alpha_pc, automask=True,
                        self_distillation=sd, alpha_self=alpha_self),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=False,
        fused_sweep=fused,
        # pose nets at init emit ~0.01-scale motions and the test planes
        # are shallow: tiny spreads, so the cheap single-call bounds keep
        # interpret mode fast (the production grouped plan is covered by
        # tests/test_pallas_warp2d.py::test_mono_pose_plan_coverage)
        warp2d_groups=0,
        warp2d_sx=8,
        warp2d_sy=4,
        allow_random_pc=True,
    )


def _one_step(cfg, seed=4):
    """Loss dict + full parameter gradient for one training batch.

    Gradients, not post-Adam parameters: Adam normalizes each coordinate
    by |g|, so on near-zero-gradient coordinates (~1e-7 here) it
    amplifies FP-level noise between two numerically-equal paths into
    full ±lr steps — measured: max grad rel diff 1.6e-6 between the
    warp2d and oracle paths, yet post-step params differed by 2*lr on a
    weak-gradient leaf.  The gradient comparison is the semantic pin."""
    from planedepth_tpu.train.step import process_batch

    bundle = ModelBundle(cfg)
    params, stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_stereo_batch(
            cfg.batch_size, H, W, seed=seed,
            novel_frame_ids=cfg.novel_frame_ids,
        ).items()
    }
    # make the stereo pose generic: a pure x-translation puts every
    # sample's y-coordinate EXACTLY on an integer, where the bilinear
    # y-gradient is a subgradient (piecewise constant with jumps at
    # integers) and the kernel and oracle may legitimately pick
    # different pieces — both paths get the same perturbed pose
    from planedepth_tpu.geometry.pose import transformation_from_parameters

    jitter = transformation_from_parameters(
        jnp.asarray([[[0.002, -0.001, 0.003]]], jnp.float32),
        jnp.asarray([[[0.001, 0.004, 0.002]]], jnp.float32),
    )
    batch["Rt_r"] = jnp.einsum("bij,njk->bik", batch["Rt_r"], jitter)

    def loss_fn(p):
        losses, _, _ = process_batch(
            bundle, p, stats, None, pc_params, batch,
            jax.random.PRNGKey(0), train=True,
        )
        return losses["loss/total_loss"], losses

    (_, metrics), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    return grads, metrics


def _assert_steps_match(a, b, rtol=2e-4, grad_tol=1e-3):
    """Losses equal + every parameter gradient equal, each leaf scaled
    by max(its own magnitude, 1e-3 x the global gradient magnitude).
    Semantic divergences measure >= 1e-2 here; f32 reduction-order noise
    (jit vs eager schedules) measures up to ~5e-4 relative on
    weak-gradient leaves whose absolute noise floor is set by the GLOBAL
    activation scale — grad_tol sits between the two regimes."""
    g_f, m_f = a
    g_o, m_o = b
    for k in ("loss/ph_loss", "loss/smooth_loss", "loss/total_loss"):
        np.testing.assert_allclose(
            float(m_f[k]), float(m_o[k]), rtol=rtol, err_msg=k,
        )
    lf = jax.tree_util.tree_flatten_with_path(g_f)[0]
    lo = jax.tree_util.tree_flatten_with_path(g_o)[0]
    gmax = max(float(np.abs(np.asarray(y)).max()) for _, y in lo)
    for (path, x), (_, y) in zip(lf, lo):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(float(np.abs(y).max()), 1e-3 * gmax, 1e-6)
        err = float(np.abs(x - y).max()) / scale
        assert err <= grad_tol, (jax.tree_util.keystr(path), err, scale)


def test_fused_warp2d_predicate():
    assert fused_warp2d_ok(_cfg(True))
    assert fused_warp2d_ok(_cfg(True, warp_type="depth_warp"))
    assert not fused_warp2d_ok(_cfg(False))
    assert not fused_warp2d_ok(_cfg(True, warp_type="disp_warp"))
    import dataclasses
    c = _cfg(True)
    # alpha_self rides the fused path (single-map XLA gather self-rec);
    # use_mom still falls to the oracle
    assert fused_warp2d_ok(
        dataclasses.replace(c, loss=dataclasses.replace(c.loss,
                                                        alpha_self=0.1)))
    assert not fused_warp2d_ok(
        dataclasses.replace(c, loss=dataclasses.replace(c.loss,
                                                        use_mom=True)))


@pytest.mark.heavy
def test_homography_step_matches_oracle():
    """Stereo + temporal homography_warp (the reference's mono+stereo
    recipe shape): fused warp2d step == XLA-gather oracle step."""
    _assert_steps_match(
        _one_step(_cfg(True)), _one_step(_cfg(False)))


@pytest.mark.heavy
def test_depth_warp_step_matches_oracle():
    _assert_steps_match(
        _one_step(_cfg(True, warp_type="depth_warp")),
        _one_step(_cfg(False, warp_type="depth_warp")))


@pytest.mark.heavy
def test_homography_alpha_self_matches_oracle():
    """alpha_self on the fused warp2d path: the self-reconstruction
    (single-map XLA gather at the expected disparity, reference
    trainer.py:605-633) rides alongside the kernel — fused == oracle,
    including loss/self_loss."""
    f = _one_step(_cfg(True, alpha_self=0.1))
    o = _one_step(_cfg(False, alpha_self=0.1))
    np.testing.assert_allclose(
        float(f[1]["loss/self_loss"]), float(o[1]["loss/self_loss"]),
        rtol=2e-4,
    )
    _assert_steps_match(f, o)


@pytest.mark.heavy
def test_homography_nomix_step_matches_oracle():
    """L1-on-composite photometric (use_mixture_loss=False) through the
    logits-only warp2d kernel."""
    _assert_steps_match(
        _one_step(_cfg(True, mixture=False)),
        _one_step(_cfg(False, mixture=False)))


@pytest.mark.heavy
def test_homography_yz_step_matches_oracle():
    """yz (side) planes participate in the homography warp like any
    other plane — the warp2d path has no plane-structure assumptions
    (unlike the stereo sweep, which needs row-constant disparities)."""
    import dataclasses

    def with_yz(cfg):
        m = cfg.model
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                m,
                # yz_min=1.0: side planes at realistic lateral distances
                # (the default 0.1 puts them 10 cm from the camera, whose
                # per-tile x-spread of ~31+ px would need production-plan
                # tap bounds — warp2d_plan sizes those automatically; the
                # test pins an explicit bound instead)
                planes=dataclasses.replace(m.planes, yz_levels=4,
                                           yz_min=1.0)),
            warp2d_sx=12,
        )

    cfg_f = with_yz(_cfg(True))
    assert fused_warp2d_ok(cfg_f)
    _assert_steps_match(
        _one_step(cfg_f), _one_step(with_yz(_cfg(False))))


@pytest.mark.heavy
def test_render_probability_step_matches_oracle():
    """--render_probability (NeRF alpha compositing of the warped
    densities) through the warp2d path: the compositing runs in XLA on
    the kernel's warped logits, reusing the source view's dists like the
    reference (trainer.py:584-591)."""
    import dataclasses

    def with_rp(cfg):
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, render_probability=True),
        )

    cfg_f = with_rp(_cfg(True))
    assert fused_warp2d_ok(cfg_f)
    _assert_steps_match(
        _one_step(cfg_f), _one_step(with_rp(_cfg(False))))


@pytest.mark.heavy
def test_pure_mono_step_matches_oracle():
    """no_stereo: target sides are the temporal neighbors only
    (reference --no_stereo --novel_frame_ids -1 1)."""
    _assert_steps_match(
        _one_step(_cfg(True, no_stereo=True)),
        _one_step(_cfg(False, no_stereo=True)))


@pytest.mark.heavy
def test_mixed_disp_warp_step_matches_oracle():
    """Stereo + temporal disp_warp (reference trainer.py:85-88 with
    novel_frame_ids): side 'r' rides the fused sweep, the temporal sides
    ride the warp2d kernel (train/step.py:fused_mixed_ok) — together they
    must equal the all-oracle step."""
    from planedepth_tpu.train.step import fused_mixed_ok, fused_sweep_ok

    cfg = _cfg(True, warp_type="disp_warp")
    assert fused_mixed_ok(cfg) and not fused_sweep_ok(cfg)
    assert not fused_warp2d_ok(cfg)
    _assert_steps_match(
        _one_step(cfg), _one_step(_cfg(False, warp_type="disp_warp")))


@pytest.mark.heavy
def test_disp_warp_render_probability_rescue_matches_oracle():
    """render_probability under STEREO disp_warp cannot ride the plane
    sweep (it needs the per-plane warped logits); the warp2d kernel
    rescues it as the dx = disp, dy = 0 special case
    (train/mono.py:fused_warp2d_ok) — fused == oracle."""
    import dataclasses

    def with_rp(cfg):
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, render_probability=True),
        )

    cfg_f = with_rp(_cfg(True, warp_type="disp_warp", novel=()))
    assert fused_warp2d_ok(cfg_f)
    _assert_steps_match(
        _one_step(cfg_f),
        _one_step(with_rp(_cfg(False, warp_type="disp_warp", novel=()))))


@pytest.mark.heavy
def test_disp_warp_yz_rescue_matches_oracle():
    """yz side planes have column-varying disparity, which the stereo
    sweep kernels cannot sample; the warp2d rescue takes the WHOLE mixed
    recipe (stereo 'r' as dx = disp, temporal sides as depth warps)
    instead of the XLA-gather oracle."""
    import dataclasses

    def with_yz(cfg):
        m = cfg.model
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                m,
                planes=dataclasses.replace(m.planes, yz_levels=4,
                                           yz_min=1.0)),
            warp2d_sx=12,
        )

    cfg_f = with_yz(_cfg(True, warp_type="disp_warp"))
    assert fused_warp2d_ok(cfg_f)
    _assert_steps_match(
        _one_step(cfg_f),
        _one_step(with_yz(_cfg(False, warp_type="disp_warp"))))


@pytest.mark.heavy
def test_homography_step_sharded_matches_single_device():
    """The fused warp2d step on the 8-device GSPMD mesh == single device
    (batch-only kernel sharding: the warp2d windows span full H)."""
    from planedepth_tpu.parallel.mesh import (
        jit_train_step, make_mesh, replicate_state, shard_batch,
    )

    assert len(jax.devices()) >= 8
    cfg = _cfg(True).replace(batch_size=8)
    bundle = ModelBundle(cfg)
    params, stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, 10)
    batch_np = make_stereo_batch(8, H, W, seed=6,
                                 novel_frame_ids=cfg.novel_frame_ids)
    rng = jax.random.PRNGKey(7)

    state1 = create_train_state(params, stats, tx)
    step1 = jax.jit(make_train_step(bundle, tx))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch1, rng)

    mesh = make_mesh(jax.devices()[:8])
    state8 = create_train_state(params, stats, tx)
    state8 = replicate_state(state8, mesh)
    step8 = jit_train_step(make_train_step(bundle, tx), mesh)
    batch8 = shard_batch(batch_np, mesh)
    rng8 = jax.device_put(
        rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    state8, m8 = step8(state8, batch8, rng8)

    np.testing.assert_allclose(
        float(m1["loss/total_loss"]), float(m8["loss/total_loss"]),
        rtol=2e-4,
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(l1, l8)
    )
    assert worst < 5e-4, worst


@pytest.mark.heavy
def test_homography_pc_step_matches_oracle():
    """Perceptual loss on the warp2d composite == oracle."""
    fused = _one_step(_cfg(True, alpha_pc=0.1))
    oracle = _one_step(_cfg(False, alpha_pc=0.1))
    np.testing.assert_allclose(
        float(fused[1]["loss/pc_loss"]), float(oracle[1]["loss/pc_loss"]),
        rtol=2e-4,
    )
    _assert_steps_match(fused, oracle, grad_tol=2e-4)
