"""Multi-device semantics: sharded training == single-device training.

The reference trusts DDP+SyncBN to match large-batch single-GPU training
(SURVEY.md §2.2); here that equivalence is a TESTED property of the sharding
layout: the same global batch produces (numerically) the same loss and
parameter update whether it runs on 1 device or sharded over 8.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig, TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.parallel.mesh import (
    jit_train_step, make_mesh, replicate_state, shard_batch,
)
from planedepth_tpu.train import (
    ModelBundle, create_train_state, make_optimizer, make_train_step,
)

pytestmark = pytest.mark.heavy

H, W = 64, 96


def _cfg():
    return TrainConfig(
        batch_size=8,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=True, plane_residual=False, num_ep=0,
            planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                               xz_levels=0, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=False,
    )


def test_spatial_mesh_2x2_matches_single_device():
    """2-D (data x spatial) mesh: image rows sharded across chips — the
    SURVEY §5 scaling axis for HBM-bound HR volumes."""
    cfg = _cfg().replace(batch_size=4)
    bundle = ModelBundle(cfg)
    params, batch_stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch_np = make_stereo_batch(4, H, W, seed=13)
    rng = jax.random.PRNGKey(3)

    state1 = create_train_state(params, batch_stats, tx)
    step1 = jax.jit(make_train_step(bundle, tx))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, m1 = step1(state1, batch1, rng)

    mesh = make_mesh(jax.devices()[:4], spatial=2)
    state4 = create_train_state(params, batch_stats, tx)
    state4 = replicate_state(state4, mesh)
    step4 = jit_train_step(make_train_step(bundle, tx), mesh)
    batch4 = shard_batch(batch_np, mesh)
    rng4 = jax.device_put(
        rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    _, m4 = step4(state4, batch4, rng4)

    np.testing.assert_allclose(
        float(m1["loss/total_loss"]), float(m4["loss/total_loss"]),
        rtol=5e-4,
    )


def test_eight_device_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = _cfg()
    bundle = ModelBundle(cfg)
    params, batch_stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch_np = make_stereo_batch(8, H, W, seed=11)
    rng = jax.random.PRNGKey(7)

    # single device
    state1 = create_train_state(params, batch_stats, tx)
    step1 = jax.jit(make_train_step(bundle, tx))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch1, rng)

    # 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    state8 = create_train_state(params, batch_stats, tx)
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
    # parameters after one Adam step agree
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(l1, l8)
    )
    assert worst < 5e-4, worst
    # BN running stats (sync-BN semantics) agree
    s1 = jax.tree_util.tree_leaves(state1.batch_stats)
    s8 = jax.tree_util.tree_leaves(jax.device_get(state8.batch_stats))
    worst_bn = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(s1, s8)
    )
    assert worst_bn < 5e-4, worst_bn
