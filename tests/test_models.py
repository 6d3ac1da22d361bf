"""Shape/dtype/finiteness tests for every network family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.config import ModelConfig, PlaneConfig
from planedepth_tpu.geometry import identity_norm_grid
from planedepth_tpu.models import (
    DepthDecoderContinuous,
    FalNet,
    Monov2Decoder,
    PladeNet,
    PladePoseNet,
    PoseDecoder,
    ResnetEncoder,
    ResnetPoseEncoder,
    Vgg19Features,
    build_depth_model,
    encoder_channels,
)

pytestmark = pytest.mark.heavy

H, W = 64, 96
RNG = jax.random.PRNGKey(0)


def _img(b=1, c=3):
    return jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (b, H, W, c)).astype(np.float32)
    )


def _grid(b=1):
    return jnp.broadcast_to(identity_norm_grid(H, W)[None], (b, H, W, 2))


def test_resnet18_encoder_shapes():
    enc = ResnetEncoder(18)
    variables = enc.init({"params": RNG}, _img(), train=False)
    feats = enc.apply(variables, _img(), train=False)
    chans = encoder_channels(18)
    assert len(feats) == 5
    for i, f in enumerate(feats):
        scale = 2 ** (i + 1)
        assert f.shape == (1, H // scale, W // scale, chans[i])


def test_resnet50_encoder_shapes():
    enc = ResnetEncoder(50)
    variables = enc.init({"params": RNG}, _img(), train=False)
    feats = enc.apply(variables, _img(), train=False)
    chans = encoder_channels(50)
    assert chans[-1] == 2048
    assert feats[-1].shape == (1, H // 32, W // 32, 2048)


@pytest.mark.parametrize("render_probability", [False, True])
def test_depth_model_resnet_outputs(render_probability):
    cfg = ModelConfig(
        net_type="ResNet",
        num_layers=18,
        render_probability=render_probability,
        planes=PlaneConfig(disp_levels=9, xz_levels=4, yz_levels=0),
    )
    model = build_depth_model(cfg)
    variables = model.init(
        {"params": RNG, "dropout": RNG}, _img(), _grid(), train=False
    )
    out = model.apply(variables, _img(), _grid(), train=False)
    N = cfg.planes.all_levels
    assert out["probability"].shape == (1, H, W, N)
    assert out["disp_layered"].shape == (1, H, W, N)
    assert out["disp"].shape == (1, H, W, 1)
    assert out["sigma"].shape == (1, H, W, N)
    assert out["distance"].shape == (1, N)
    assert out["norm"].shape == (1, N, 3)
    p = np.asarray(out["probability"])
    assert np.isfinite(p).all()
    sums = p.sum(-1)
    if render_probability:
        # alpha-composited then mixture-reweighted weights sum to 1 except
        # at degenerate pixels where every unmasked plane has zero alpha
        # (the guarded 0/0 case in mixture_reweight) — there they sum to 0.
        ok = (np.abs(sums - 1.0) < 1e-3) | (np.abs(sums) < 1e-3)
        assert ok.all()
        assert (np.abs(sums - 1.0) < 1e-3).mean() > 0.9
    else:
        np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(out["disp"])).all()


def test_depth_model_train_mode_mutates_bn():
    cfg = ModelConfig(net_type="ResNet", num_layers=18,
                      planes=PlaneConfig(disp_levels=5, xz_levels=0))
    model = build_depth_model(cfg)
    variables = model.init(
        {"params": RNG, "dropout": RNG}, _img(2), _grid(2), train=False
    )
    out, mutated = model.apply(
        variables, _img(2), _grid(2), train=True,
        mutable=["batch_stats"], rngs={"dropout": RNG},
    )
    # running stats moved away from init
    flat = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in flat)


def test_plade_net_outputs():
    model = PladeNet(
        planes=PlaneConfig(disp_levels=7, xz_levels=3, yz_levels=0),
        num_ep=8, use_mixture_loss=True, plane_residual=True,
    )
    variables = model.init({"params": RNG}, _img(), _grid(), train=False)
    out = model.apply(variables, _img(), _grid(), train=False)
    assert out["probability"].shape == (1, H, W, 10)
    assert np.isfinite(np.asarray(out["disp"])).all()


def test_fal_net_outputs():
    model = FalNet(planes=PlaneConfig(disp_levels=9, xz_levels=0))
    variables = model.init({"params": RNG}, _img(), train=False)
    out = model.apply(variables, _img(), train=False)
    assert out["probability"].shape == (1, H, W, 9)
    d = np.asarray(out["disp_layered"])[0, 0, 0]
    np.testing.assert_allclose(d[0], 300.0, rtol=1e-5)
    np.testing.assert_allclose(d[-1], 2.0, rtol=1e-5)


def test_pose_pipeline_shapes():
    enc = ResnetPoseEncoder(18, num_input_images=2)
    variables = enc.init({"params": RNG}, _img(c=6), train=False)
    feats = enc.apply(variables, _img(c=6), train=False)
    dec = PoseDecoder(
        num_ch_enc=tuple(encoder_channels(18)), num_input_features=1,
        num_frames_to_predict_for=1, num_ep=8,
    )
    dvars = dec.init({"params": RNG}, [feats], _grid())
    aa, t = dec.apply(dvars, [feats], _grid())
    assert aa.shape == (1, 1, 1, 3)
    assert t.shape == (1, 1, 1, 3)
    # 0.01 scaling keeps outputs small at init
    assert np.abs(np.asarray(aa)).max() < 0.1


def test_plade_pose_net_shapes():
    model = PladePoseNet(num_ep=8)
    variables = model.init(
        {"params": RNG}, _img(), _img(), _grid(), train=False
    )
    aa, t = model.apply(variables, _img(), _img(), _grid(), train=False)
    assert aa.shape == (1, 1, 1, 3)


def test_monov2_decoder_shapes():
    enc = ResnetEncoder(18)
    variables = enc.init({"params": RNG}, _img(), train=False)
    feats = enc.apply(variables, _img(), train=False)
    dec = Monov2Decoder(num_ch_enc=tuple(encoder_channels(18)))
    dvars = dec.init({"params": RNG}, feats)
    out = dec.apply(dvars, feats)
    assert out[("disp", 0)].shape == (1, H, W, 1)
    assert out[("disp", 3)].shape == (1, H // 8, W // 8, 1)
    assert (np.asarray(out[("disp", 0)]) >= 0).all()


def test_vgg19_feature_shapes():
    net = Vgg19Features()
    variables = net.init({"params": RNG}, _img())
    feats = net.apply(variables, _img())
    # reference slices end at the pools (layers.py:392-399)
    assert len(feats) == 3
    assert feats[0].shape == (1, H // 2, W // 2, 64)
    assert feats[1].shape == (1, H // 4, W // 4, 128)
    assert feats[2].shape == (1, H // 8, W // 8, 256)


def test_depth_decoder_continuous_outputs():
    enc = ResnetEncoder(18)
    variables = enc.init({"params": RNG}, _img(), train=False)
    feats = enc.apply(variables, _img(), train=False)
    dec = DepthDecoderContinuous(
        num_ch_enc=tuple(encoder_channels(18)),
        planes=PlaneConfig(disp_levels=6, xz_levels=0), num_ep=8,
        use_mixture_loss=True,
    )
    dvars = dec.init({"params": RNG, "dropout": RNG}, feats, _grid(),
                     train=False)
    out = dec.apply(dvars, feats, _grid(), train=False)
    assert out["disp_levels"].shape == (1, H, W, 6)
    assert out["disp"].shape == (1, H, W, 1)
    d = np.asarray(out["disp_layered"])
    assert (d >= 2.0 - 1e-3).all() and (d <= 300.0 + 1e-3).all()
