"""The PRODUCTION combination: fused Pallas kernels under the GSPMD mesh.

``pallas_call`` has no SPMD partitioning rule — under a plain jit over a
sharded batch GSPMD all-gathers the operands and replicates the kernel on
every device.  ``parallel/shard.py`` therefore shard_maps every kernel
call site over the ambient mesh.  These tests run the REAL fused train
step (interpret-mode kernels: ops/pallas_sweep.py + ops/pallas_disp.py)
on the 8-device CPU mesh and assert it matches the single-device fused
step bit-closely — loss, parameter update, and BN stats.
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
from planedepth_tpu.train.step import fused_sweep_ok

pytestmark = pytest.mark.heavy

H, W = 64, 96


def _cfg(s2d="auto", automask=True):
    return TrainConfig(
        batch_size=2 * 8,               # flip_right => per-step 8, eff 16
        flip_right=True,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=True,
            use_mixture_loss=True, plane_residual=True, num_ep=8,
            planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                               xz_levels=4, yz_levels=0),
            fused_head="interpret",     # Pallas disp head off-TPU too
            s2d_tail=s2d,               # "on" => QUAD phase-split sweep
        ),
        loss=LossConfig(alpha_pc=0.0, automask=automask),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=False,
        fused_sweep=True,               # Pallas plane sweep (interpret)
    )


@pytest.mark.parametrize("s2d,automask", [
    ("auto", True),
    ("on", True),
    ("on", False),      # production signature: quad with_auto=False
])
def test_fused_step_sharded_matches_single_device(s2d, automask):
    """s2d="auto" (off on CPU) takes the v1 packed kernel; "on" takes the
    QUAD phase-split kernel — both must match the single-device step on
    the 8-device mesh.  automask=False additionally exercises the
    production with_auto=False kernel signature under the mesh."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = _cfg(s2d, automask)
    assert fused_sweep_ok(cfg), "config must take the fused production path"
    bundle = ModelBundle(cfg)
    params, batch_stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch_np = make_stereo_batch(cfg.per_step_batch, H, W, seed=11)
    rng = jax.random.PRNGKey(7)

    # single device, fused
    state1 = create_train_state(params, batch_stats, tx)
    step1 = jax.jit(make_train_step(bundle, tx))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch1, rng)

    # 8-device mesh, fused + shard_mapped kernels
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
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(l1, l8)
    )
    assert worst < 5e-4, worst
    s1 = jax.tree_util.tree_leaves(state1.batch_stats)
    s8 = jax.tree_util.tree_leaves(jax.device_get(state8.batch_stats))
    worst_bn = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(s1, s8)
    )
    assert worst_bn < 5e-4, worst_bn


def test_fused_step_2d_spatial_mesh_matches_single_device():
    """Fused kernels on the 2-D (data x spatial) mesh: image rows shard
    across chips too (shard_kernel's row_block-aware spatial specs)."""
    cfg = _cfg().replace(batch_size=2 * 4)      # per-step 4, eff 8
    bundle = ModelBundle(cfg)
    params, batch_stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch_np = make_stereo_batch(cfg.per_step_batch, H, W, seed=3)
    rng = jax.random.PRNGKey(5)

    state1 = create_train_state(params, batch_stats, tx)
    step1 = jax.jit(make_train_step(bundle, tx))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, m1 = step1(state1, batch1, rng)

    mesh = make_mesh(jax.devices()[:8], spatial=2)   # 4 data x 2 spatial
    state8 = create_train_state(params, batch_stats, tx)
    state8 = replicate_state(state8, mesh)
    step8 = jit_train_step(make_train_step(bundle, tx), mesh)
    batch8 = shard_batch(batch_np, mesh)
    rng8 = jax.device_put(
        rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    _, m8 = step8(state8, batch8, rng8)

    np.testing.assert_allclose(
        float(m1["loss/total_loss"]), float(m8["loss/total_loss"]),
        rtol=5e-4,
    )


def test_fused_kernels_partition_not_replicate():
    """Structural check: the compiled sharded step must NOT all-gather the
    full-batch plane tensors in front of the Pallas custom calls.

    A full-batch all-gather of the (B, N, H, W) logits would show up as an
    all-gather to batch extent 16; with shard_map the only all-reduces are
    the gradient/BN psums and any all-gather stays at per-device batch 2.
    """
    cfg = _cfg()
    bundle = ModelBundle(cfg)
    params, batch_stats, _ = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch_np = make_stereo_batch(cfg.per_step_batch, H, W, seed=11)
    mesh = make_mesh(jax.devices()[:8])
    state8 = create_train_state(params, batch_stats, tx)
    state8 = replicate_state(state8, mesh)
    step8 = jit_train_step(make_train_step(bundle, tx), mesh)
    batch8 = shard_batch(batch_np, mesh)
    rng8 = jax.device_put(
        jax.random.PRNGKey(7),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    hlo = step8.lower(state8, batch8, rng8).compile().as_text()
    eff_b = cfg.per_step_batch * 2      # flip doubling
    n = cfg.model.planes.all_levels
    bad = [
        line.strip()[:160]
        for line in hlo.splitlines()
        if "all-gather" in line and f"[{eff_b},{n}," in line.replace(" ", "")
    ]
    assert not bad, f"full-batch plane-volume all-gather found:\n" + "\n".join(bad)
