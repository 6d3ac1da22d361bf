"""Worker process for the 2-process multi-host smoke test.

Run by tests/test_multihost.py as ``python -m tests._multihost_worker
<pid> <nproc> <port>`` with 4 virtual CPU devices per process.  Executes
ONE production fused train step on the global 8-device mesh: the batch is
assembled from per-host slices via ``jax.make_array_from_process_local_data``
(parallel/mesh.py:shard_batch) and the loss/grad reductions cross the
process boundary.  Prints ``RANK<pid> loss=<val>`` for the parent to
compare against the single-process value.
"""
from __future__ import annotations

import sys


def build_cfg():
    from planedepth_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, PlaneConfig,
        TrainConfig,
    )

    return TrainConfig(
        batch_size=2 * 8,           # flip_right => per-step 8 global
        flip_right=True,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            use_mixture_loss=True, plane_residual=True, num_ep=8,
            planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                               xz_levels=4, yz_levels=0),
            fused_head="interpret",
        ),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=32, width=64),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=False,
        fused_sweep=True,
    )


def global_batch():
    from planedepth_tpu.data.synthetic import make_stereo_batch

    cfg = build_cfg()
    return cfg, make_stereo_batch(
        cfg.per_step_batch, cfg.data.height, cfg.data.width, seed=11
    )


def run_step(cfg, batch_local, mesh):
    """One jitted fused train step over ``mesh``; returns the loss."""
    import jax
    from planedepth_tpu.parallel.mesh import (
        jit_train_step, replicate_state, replicated, shard_batch,
    )
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer, make_train_step,
    )

    bundle = ModelBundle(cfg)
    params, batch_stats, _ = bundle.init(
        jax.random.PRNGKey(0), cfg.data.height, cfg.data.width
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, batch_stats, tx)
    state = replicate_state(state, mesh)
    step = jit_train_step(make_train_step(bundle, tx), mesh)
    dev_batch = shard_batch(batch_local, mesh)
    rng = jax.device_put(jax.random.PRNGKey(7), replicated(mesh))
    _, metrics = step(state, dev_batch, rng)
    return float(metrics["loss/total_loss"])


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

    from planedepth_tpu.parallel.mesh import make_mesh

    cfg, batch_np = global_batch()
    per_host = cfg.per_step_batch // nproc
    local = {
        k: v[pid * per_host:(pid + 1) * per_host]
        for k, v in batch_np.items()
    }
    mesh = make_mesh()              # all global devices
    loss = run_step(cfg, local, mesh)
    print(f"RANK{pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
