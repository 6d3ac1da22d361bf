#!/usr/bin/env python
"""Capture a jax.profiler trace of the production train step.

``jax.profiler.trace`` works through the axon TPU relay (r3 discovery):
the dump carries a real ``/device:TPU:0`` lane with per-fusion device
times.  Feed the output dir to ``scripts/analyze_trace.py``.

Usage: python scripts/trace_step.py OUTDIR [pb] [pc] [mono] [HxW]
  pb     per-step batch (default 4)
  pc     enable the perceptual recipe (alpha_pc=0.1)
  mono   homography_warp + pose nets at 640x192 (the warp2d path)
  HxW    e.g. 640x192 (default 1280x384, or 640x192 under mono)
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    outdir = sys.argv[1]
    opts = set(sys.argv[2:])
    pb = next((int(o) for o in opts if o.isdigit()), 4)
    mono = "mono" in opts
    shape = next((o for o in opts if "x" in o), None)
    if shape:
        W, H = (int(v) for v in shape.split("x"))
    else:
        H, W = (192, 640) if mono else (384, 1280)

    from planedepth_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from planedepth_tpu.data.synthetic import make_stereo_batch
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer, make_train_step,
    )

    novel = (-1, 1) if mono else ()
    cfg = TrainConfig(
        batch_size=(1 if mono else 2) * pb,
        flip_right=not mono,
        warp_type="homography_warp" if mono else "disp_warp",
        novel_frame_ids=novel,
        model=ModelConfig(net_type="ResNet", num_layers=50),
        loss=LossConfig(alpha_pc=0.1 if "pc" in opts else 0.0,
                        automask=mono),
        pc_remat="pc_noremat" not in opts,
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=True, fused_sweep=True, allow_random_pc=True,
    )
    bundle = ModelBundle(cfg)
    params, stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(params, stats, tx, pc_params=pc_params)
    batch = {k: jnp.asarray(v)
             for k, v in make_stereo_batch(pb, H, W, seed=0,
                                           novel_frame_ids=novel).items()}
    rng = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(bundle, tx), donate_argnums=(0,))

    state, m = step(state, batch, rng)              # compile + warm
    print("warm loss", float(jax.device_get(m["loss/total_loss"])),
          flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = step(state, batch, rng)
        float(jax.device_get(m["loss/total_loss"]))
    print(f"traced 3 steps in {time.perf_counter() - t0:.2f}s -> {outdir}",
          flush=True)


if __name__ == "__main__":
    main()
