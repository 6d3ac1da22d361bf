"""Throughput benchmark: stage-1 PlaneDepth training step on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: KITTI-shaped images/sec/chip at 1280x384 for the FULL training step
(ResNet-50 + DenseASPP plane decoder, 49+14 planes, mixture loss, plane
residuals, flip_right, disp_warp view synthesis, Adam update) on synthetic
data — the BASELINE.md throughput north-star.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
The denominator is an estimate of the reference's per-GPU HR-finetune rate:
its 4-GPU recipe trains 45,200 images/epoch with global batch 8 on 2080Ti-
class hardware; conservatively ~8 imgs/s total => 2.0 imgs/s per chip.
"""
from __future__ import annotations

import json
import sys
import time

REF_IMGS_PER_SEC_PER_CHIP = 2.0   # documented estimate, see module docstring
H, W = 384, 1280


def run_bench(per_step_batch: int, remat: bool = False):
    import jax
    import jax.numpy as jnp

    from planedepth_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from planedepth_tpu.data.synthetic import make_stereo_batch
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer, make_train_step,
    )

    cfg = TrainConfig(
        batch_size=2 * per_step_batch,
        flip_right=True,
        model=ModelConfig(net_type="ResNet", num_layers=50, remat=remat),
        loss=LossConfig(alpha_pc=0.0),   # perceptual net needs ImageNet
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=True,
        remat_warp=remat,
    )
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(params, batch_stats, tx, pc_params=pc_params)

    batch = {
        k: jnp.asarray(v)
        for k, v in make_stereo_batch(per_step_batch, H, W, seed=0).items()
    }
    rng = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(bundle, tx), donate_argnums=(0,))

    # compile + warmup
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss/total_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss/total_loss"])
    dt = time.perf_counter() - t0
    imgs_per_sec = per_step_batch * n_steps / dt
    return imgs_per_sec, float(metrics["loss/total_loss"])


def main():
    # manual mode: bench.py <per_step_batch> [remat]
    if len(sys.argv) > 1:
        pb = int(sys.argv[1])
        remat = len(sys.argv) > 2 and sys.argv[2] == "remat"
        imgs_per_sec, loss = run_bench(pb, remat)
        print(json.dumps({
            "metric": "train_imgs_per_sec_per_chip_1280x384",
            "value": round(imgs_per_sec, 3),
            "unit": "imgs/s/chip",
            "vs_baseline": round(imgs_per_sec / REF_IMGS_PER_SEC_PER_CHIP, 3),
            "per_step_batch": pb,
            "remat": remat,
        }))
        return

    # ladder calibrated on v5e (15.75G HBM): the HR stage-1 step fits at
    # per-step batch 1 (effective 2 after flip_right); larger batches OOM
    # (the bf16 plane stacks + conv residuals; see ops/pallas_sweep.py for
    # the memory-bound escape hatch)
    last_err = None
    for per_step_batch in (1,):
        try:
            imgs_per_sec, loss = run_bench(per_step_batch)
            print(json.dumps({
                "metric": "train_imgs_per_sec_per_chip_1280x384",
                "value": round(imgs_per_sec, 3),
                "unit": "imgs/s/chip",
                "vs_baseline": round(
                    imgs_per_sec / REF_IMGS_PER_SEC_PER_CHIP, 3
                ),
            }))
            return
        except Exception as e:  # OOM at larger batch: retry smaller
            last_err = e
            continue
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_1280x384",
        "value": 0.0,
        "unit": "imgs/s/chip",
        "vs_baseline": 0.0,
        "error": str(last_err)[:200],
    }))
    sys.exit(1)


if __name__ == "__main__":
    main()
