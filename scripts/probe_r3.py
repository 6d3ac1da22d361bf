"""Round-3 component probes with LIVE backward passes.

Round-2's probes called ``value_and_grad`` but returned only the value, so
XLA dead-coded the entire backward (PERF_NOTES.md "RESOLVED").  Every probe
here returns a scalar that sums a reduction of EVERY gradient leaf, so the
adjoint graph is structurally live.

Timing: true-sync slope (host device_get barrier, two iteration counts) —
see bench.py docstring.  Run on the real TPU in one process, results print
incrementally (compiles through the axon relay are minutes each).

Usage: python scripts/probe_r3.py [probe ...]   (default: all, small first)
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 384, 1280
B = 8                       # effective batch (after flip doubling)
N_V, N_XZ = 49, 14
N = N_V + N_XZ
PAD = int(300 * 1.08) + 4


def slope_time(fn, args, n_timed=8):
    """Chain-independent slope timing: fn(*args) -> scalar jax array."""
    out = fn(*args)
    float(jax.device_get(out))          # compile + warm

    def timed(n):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = fn(*args)
        float(jax.device_get(acc))
        return time.perf_counter() - t0

    d1 = timed(2)
    d2 = timed(2 + n_timed)
    return (d2 - d1) / n_timed


def report(name, ms):
    print(f"PROBE {name}: {ms*1e3:.2f} ms", flush=True)


def grad_scalar(loss_fn, argnums):
    """Return fn whose output depends on the loss AND all grads."""
    g = jax.grad(loss_fn, argnums=argnums)

    def fn(*args):
        grads = g(*args)
        return sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(grads)
        )
    return fn


def make_sweep_inputs(dtype):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((B, 3, H, W)), dtype)
    tgt = jnp.asarray(rng.random((B, 3, H, W)), dtype)
    logits = jnp.asarray(rng.standard_normal((B, N, H, W)), dtype)
    sigma = jnp.asarray(rng.random((B, N, H, W)) * 0.5 + 0.2, dtype)
    shift = jnp.asarray(
        rng.random((B, H, N)) * 250.0, jnp.float32
    )
    mask = jnp.ones((B, H, N), jnp.float32)
    return src, tgt, logits, sigma, shift, mask


def probe_sweep(dtype=jnp.bfloat16, tag="sweep_bf16"):
    from planedepth_tpu.ops.pallas_sweep import fused_plane_sweep

    args = make_sweep_inputs(dtype)

    def loss(src, tgt, logits, sigma, shift):
        rgb, nll, nlla = fused_plane_sweep(
            src, tgt, logits, sigma, shift, args[5], PAD, False, N_V
        )
        return (jnp.sum(rgb.astype(jnp.float32))
                + jnp.sum(nll) + jnp.sum(nlla))

    fn = jax.jit(grad_scalar(loss, (0, 1, 2, 3, 4)))
    report(tag + "_fb", slope_time(fn, args[:5]))

    fwd = jax.jit(lambda *a: sum(
        jnp.sum(x.astype(jnp.float32))
        for x in fused_plane_sweep(*a, args[5], PAD, False, N_V)
    ))
    report(tag + "_f", slope_time(fwd, args[:5]))


def probe_disp_head(dtype=jnp.float32, tag="disp_head_f32"):
    from planedepth_tpu.ops.pallas_disp import disp_head

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, H, W, N)), dtype)
    sigma = jnp.asarray(rng.random((B, H, W, N)) * 0.5 + 0.2, dtype)
    drows = jnp.asarray(rng.random((B, H, N)) * 100, jnp.float32)
    mrows = jnp.ones((B, H, N), jnp.float32)

    def loss(lg, sg, dr):
        return jnp.sum(disp_head(lg, sg, dr, mrows, False))

    fn = jax.jit(grad_scalar(loss, (0, 1, 2)))
    report(tag + "_fb", slope_time(fn, (logits, sigma, drows)))


def _model_and_batch(num_layers=50):
    from planedepth_tpu.config import ModelConfig
    from planedepth_tpu.data.synthetic import make_stereo_batch
    from planedepth_tpu.models.factory import build_depth_model

    cfg = ModelConfig(net_type="ResNet", num_layers=num_layers)
    model = build_depth_model(cfg, bf16=True)
    b = make_stereo_batch(B, H, W, seed=0)
    image = jnp.asarray(b["color_aug_l"])
    grid = jnp.asarray(b["grid"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        image, grid, train=False,
    )
    return model, variables, image, grid


def probe_encoder():
    from planedepth_tpu.models.resnet import ResnetEncoder

    enc = ResnetEncoder(50, dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), img, False)

    def loss(params, img):
        feats = enc.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, False,
        )
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats)

    fn = jax.jit(grad_scalar(loss, (0, 1)))
    report("encoder_fb", slope_time(fn, (variables["params"], img)))


def probe_model():
    model, variables, image, grid = _model_and_batch()

    def loss(params, img):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, grid, train=False,
        )
        return (jnp.sum(out["disp"].astype(jnp.float32) ** 2)
                + jnp.sum(out["logits"].astype(jnp.float32) ** 2)
                + jnp.sum(out["sigma"].astype(jnp.float32) ** 2))

    fn = jax.jit(grad_scalar(loss, (0, 1)))
    report("model_fb", slope_time(fn, (variables["params"], image)))


def probe_step():
    from planedepth_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from planedepth_tpu.data.synthetic import make_stereo_batch
    from planedepth_tpu.train import (
        ModelBundle, create_train_state, make_optimizer, make_train_step,
    )

    cfg = TrainConfig(
        batch_size=2 * (B // 2), flip_right=True,
        model=ModelConfig(net_type="ResNet", num_layers=50),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(learning_rate=1e-4),
        bf16=True, fused_sweep=True, allow_random_pc=True,
    )
    bundle = ModelBundle(cfg)
    params, batch_stats, pc_params = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(params, batch_stats, tx, pc_params=pc_params)
    batch = {k: jnp.asarray(v)
             for k, v in make_stereo_batch(B // 2, H, W, seed=0).items()}
    rng = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(bundle, tx))

    state2, m = step(state, batch, rng)
    float(jax.device_get(m["loss/total_loss"]))

    def timed(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s, mm = step(s, batch, rng)
        float(jax.device_get(mm["loss/total_loss"]))
        return time.perf_counter() - t0

    d1 = timed(2)
    d2 = timed(8)
    report("full_step(b4eff8)", (d2 - d1) / 6)


PROBES = {
    "sweep_bf16": lambda: probe_sweep(jnp.bfloat16, "sweep_bf16"),
    "sweep_f32": lambda: probe_sweep(jnp.float32, "sweep_f32"),
    "disp_head_f32": lambda: probe_disp_head(jnp.float32, "disp_head_f32"),
    "disp_head_bf16": lambda: probe_disp_head(jnp.bfloat16, "disp_head_bf16"),
    "encoder": probe_encoder,
    "model": probe_model,
    "step": probe_step,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    for n in names:
        t0 = time.time()
        try:
            PROBES[n]()
        except Exception as e:
            print(f"PROBE {n} FAILED: {type(e).__name__}: {e}", flush=True)
        print(f"  (probe {n} total incl compile: {time.time()-t0:.0f} s)",
              flush=True)
