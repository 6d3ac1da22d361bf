"""Throughput benchmark: stage-1 PlaneDepth training step on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric: KITTI-shaped images/sec/chip at 1280x384 for the FULL training step
(ResNet-50 + DenseASPP plane decoder, 49+14 planes, mixture loss, plane
residuals, flip_right, disp_warp view synthesis, Adam update) on synthetic
data — the BASELINE.md throughput north-star.

Ladder: rungs are tried best-first and the first that fits wins; later
rungs are OOM fallbacks.  The JSON reports the chosen rung and the
model-FLOPs utilization (MFU) against the v5e bf16 peak.

TIMING METHODOLOGY (changed in round 2): ``jax.block_until_ready`` can
return before device execution completes on relayed/remote TPU backends,
so earlier numbers (r1's 184.8, the repo's former "260-360" claim)
measured dispatch overhead, not device time.  This bench ends every timed
region with a host readback (``device_get`` — a true barrier; verified
against the v5e bf16 roofline with a 4096^3 matmul: slope 0.75 ms = 93%
of peak) and reports the SLOPE between two iteration counts, cancelling
the fixed dispatch/sync overhead.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6),
so there is no reference-GPU denominator that isn't invented.  The
denominator used here is MEASURED on this same chip: the reference's
algorithm ported naively to TPU (XLA-gather per-plane grid_sample, the
bench LADDER's b1_remat rung) runs at 0.072 imgs/s/chip (true-sync slope,
measured r2 2026-08-16 and the rung is still runnable: `python bench.py 1
remat remat_warp`).  vs_baseline therefore answers "what does the
TPU-native design buy over a straight port on identical hardware".
"""
from __future__ import annotations

import json
import sys
import time

# measured naive-port (XLA-gather) rate on this chip — see module docstring
NAIVE_PORT_IMGS_PER_SEC = 0.072
BASELINE_DESC = ("measured naive XLA-gather port on the same v5e chip: "
                 "0.072 imgs/s (bench.py b1_remat rung, r2)")
H, W = 384, 1280
# bf16 peak of one v5e chip (197 TFLOP/s); MFU is vs. this
PEAK_FLOPS = 197e12


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def run_bench(per_step_batch: int, remat: bool = False,
              remat_warp: bool = False, fused: bool = False,
              n_timed: int = 10, alpha_pc: float = 0.0,
              pc_remat: bool = True, height: int = H, width: int = W,
              mono: bool = False):
    import jax

    _enable_compile_cache()

    from planedepth_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from planedepth_tpu.data.synthetic import make_stereo_batch
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer, make_train_step,
    )
    import jax.numpy as jnp

    # mono: the reference's monocular recipe shape (homography_warp +
    # pose nets + automask, options.py:94-112) at the stage-1 resolution;
    # rides the fused warp2d kernel (train/mono.py)
    novel = (-1, 1) if mono else ()
    cfg = TrainConfig(
        batch_size=(1 if mono else 2) * per_step_batch,
        flip_right=not mono,
        warp_type="homography_warp" if mono else "disp_warp",
        novel_frame_ids=novel,
        model=ModelConfig(net_type="ResNet", num_layers=50, remat=remat),
        # alpha_pc=0.1 is the reference's DEFAULT stage-1 recipe
        # (options.py:70-73; trainer.py:672-685 runs 2-3 VGG19 forwards
        # per side every step).  allow_random_pc uses a random-weight
        # VGG19 — identical FLOP/memory cost to the ImageNet one.
        loss=LossConfig(alpha_pc=alpha_pc, automask=mono),
        pc_remat=pc_remat,
        data=DataConfig(height=height, width=width),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=True,
        remat_warp=remat_warp,
        fused_sweep=fused,
        allow_random_pc=True,
    )
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(
        jax.random.PRNGKey(0), height, width)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(params, batch_stats, tx, pc_params=pc_params)

    batch = {
        k: jnp.asarray(v)
        for k, v in make_stereo_batch(per_step_batch, height, width,
                                      seed=0,
                                      novel_frame_ids=novel).items()
    }
    rng = jax.random.PRNGKey(0)

    # compile ONCE (TPU compiles are 15-40 min through the relay) and reuse
    # the executable for both the cost analysis and the timed steps
    step = jax.jit(
        make_train_step(bundle, tx), donate_argnums=(0,)
    ).lower(state, batch, rng).compile()
    flops = 0.0
    try:
        cost = step.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass

    # compile + warmup.  NOTE: a plain block_until_ready can return before
    # device execution completes on relayed/remote backends — only a host
    # readback (device_get) is a true barrier.  Steps are state-chained, so
    # wall time of n steps = fixed sync overhead + n * step_time; timing
    # two different n and taking the slope cancels the fixed overhead.
    state, metrics = step(state, batch, rng)
    loss = float(jax.device_get(metrics["loss/total_loss"]))

    def timed(n, state):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, rng)
        float(jax.device_get(metrics["loss/total_loss"]))   # true barrier
        return time.perf_counter() - t0, state

    n_small, n_big = 2, 2 + n_timed
    dt_small, state = timed(n_small, state)
    dt_big, state = timed(n_big, state)
    dt = (dt_big - dt_small) / (n_big - n_small)
    imgs_per_sec = per_step_batch / dt
    mfu = flops / dt / PEAK_FLOPS if flops else 0.0
    return imgs_per_sec, loss, mfu


# (per_step_batch, remat, remat_warp, fused, pc_remat, label) — best-first
# on v5e, later rungs are OOM fallbacks for smaller-HBM parts.
# pc_remat=False (keep the VGG pred-branch residuals instead of
# recomputing) measured 14.21 vs 13.31 imgs/s at b4 on r4's freed-HBM
# head — the fastest full-recipe rung when it fits.
#
# TRUE-sync measurements on v5e (15.75G HBM):
#   r2 (2026-08-16): b4_fused 12.0 imgs/s | b2 8.8 | b1 8.0;
#   b1_plain 0.072 | b1_remat 0.060   <- XLA lane gathers are near-scalar
#   on TPU; the XLA-gather "oracle" path is ~100x slower than the fused
#   Pallas sweep and OOMs at per-step batch 2, where fused fits batch 4.
#   r3: bf16 heads + s2d tail + consolidated kernel.  Batch sweet spot is
#   b4: measured b6 scales SUPER-linearly (445.5 ms vs b4's 251.5 —
#   13.5 imgs/s < 15.9) and the b8 graph crashes the remote compile
#   helper (HTTP 500, reproducibly).
#   r5: b6 now FITS (the relayout kernel freed the ls repack
#   intermediate) but remains super-linear — 16.4 pc-off / 11.1 full
#   vs b4's 20.7 / 15.7: HBM pressure, not fixed-overhead amortization,
#   governs the batch axis.  b4 stays the ladder head.
LADDER = (
    (4, False, False, True, False, "b4_fused_noremat"),
    (4, False, False, True, True, "b4_fused"),
    (2, False, False, True, True, "b2_fused"),
    (1, False, False, True, True, "b1_fused"),
    (1, True, True, False, True, "b1_remat"),
)

# The PRIMARY metric is the reference's full default stage-1 recipe
# (alpha_pc=0.1: VGG19 perceptual forwards every step).  The pc-off rate
# is reported as a secondary field for continuity with BENCH_r02.
ALPHA_PC_FULL = 0.1


def main():
    # manual mode: bench.py <per_step_batch> [remat] [remat_warp] [fused]
    # [pc] — single rung, JSON to stdout
    if len(sys.argv) > 1:
        pb = int(sys.argv[1])
        opts = set(sys.argv[2:])
        mono = "mono" in opts
        imgs_per_sec, loss, mfu = run_bench(
            pb, remat="remat" in opts, remat_warp="remat_warp" in opts,
            fused="fused" in opts,
            alpha_pc=ALPHA_PC_FULL if "pc" in opts else 0.0,
            pc_remat="pc_noremat" not in opts,
            height=192 if mono else H, width=640 if mono else W,
            mono=mono,
        )
        print(json.dumps({
            "metric": ("train_imgs_per_sec_per_chip_640x192_mono" if mono
                       else "train_imgs_per_sec_per_chip_1280x384"),
            "value": round(imgs_per_sec, 3),
            "unit": "imgs/s/chip",
            "vs_baseline": round(imgs_per_sec / NAIVE_PORT_IMGS_PER_SEC, 2),
            "baseline": BASELINE_DESC,
            "per_step_batch": pb,
            "opts": sorted(opts),
            "mfu": round(mfu, 4),
        }))
        return

    last_err = None
    for pb, remat, remat_warp, fused, pc_remat, label in LADDER:
        try:
            imgs_per_sec, loss, mfu = run_bench(
                pb, remat=remat, remat_warp=remat_warp, fused=fused,
                alpha_pc=ALPHA_PC_FULL, pc_remat=pc_remat,
            )
            result = {
                "metric": "train_imgs_per_sec_per_chip_1280x384",
                "value": round(imgs_per_sec, 3),
                "unit": "imgs/s/chip",
                "vs_baseline": round(
                    imgs_per_sec / NAIVE_PORT_IMGS_PER_SEC, 2
                ),
                "baseline": BASELINE_DESC,
                "rung": label,
                "mfu": round(mfu, 4),
                "recipe": "full stage-1 (alpha_pc=0.1, random-weight VGG19 "
                          "= identical FLOPs to ImageNet)",
                "methodology": "slope of true-sync (device_get) timings; "
                               "pre-r2 numbers measured dispatch only",
            }
            try:
                pc_off, _, _ = run_bench(
                    pb, remat=remat, remat_warp=remat_warp, fused=fused,
                    alpha_pc=0.0,
                )
                result["imgs_per_sec_pc_off"] = round(pc_off, 3)
            except Exception:
                pass
            try:
                # the reference's wall-clock is dominated by 50 stage-1
                # epochs at 640x192 (README.md:36-38) — report that rung
                # too so the wall-clock comparison covers the actual recipe
                lr_rate, _, lr_mfu = run_bench(
                    2 * pb, remat=remat, remat_warp=remat_warp, fused=fused,
                    alpha_pc=ALPHA_PC_FULL, pc_remat=pc_remat,
                    height=192, width=640,
                )
                result["imgs_per_sec_640x192"] = round(lr_rate, 3)
                result["mfu_640x192"] = round(lr_mfu, 4)
            except Exception:
                pass
            print(json.dumps(result))
            return
        except Exception as e:  # OOM at this rung: fall back
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
