#!/usr/bin/env python
"""Profile the stage-1 train step on the current backend.

Reports wall time per phase by running three jitted variants:
  (a) depth forward only, (b) forward + view synthesis + loss, (c) full
train step (with backward + Adam).  The deltas bound where time goes
(conv trunk vs warp/loss vs backward), guiding kernel work.

Usage: python scripts/profile_step.py [H W per_step_batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from planedepth_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch
from planedepth_tpu.train import (
    ModelBundle, create_train_state, make_optimizer, make_train_step,
)
from planedepth_tpu.train.step import process_batch


def _sync(out):
    """True barrier: host readback of one leaf (block_until_ready returns
    early on relayed backends — see bench.py methodology note)."""
    jax.device_get(jax.tree_util.tree_leaves(out)[0])


def timeit(fn, *args, n=6):
    """Slope timing: (t(1+n) - t(1)) / n cancels the fixed sync cost."""
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0
    run(1)                       # compile + warm
    a, b = run(1), run(1 + n)
    return (b - a) / n


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    pb = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    variant = sys.argv[4] if len(sys.argv) > 4 else "all"

    cfg = TrainConfig(
        batch_size=2 * pb, flip_right=True,
        model=ModelConfig(net_type="ResNet", num_layers=50),
        loss=LossConfig(alpha_pc=0.0),
        data=DataConfig(height=H, width=W),
        optim=OptimConfig(), bf16=True,
    )
    bundle = ModelBundle(cfg)
    params, stats, pc = bundle.init(jax.random.PRNGKey(0), H, W)
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(params, stats, tx, pc_params=pc)
    batch = {k: jnp.asarray(v)
             for k, v in make_stereo_batch(pb, H, W, seed=0).items()}
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def fwd_only(state, batch):
        from planedepth_tpu.train.flip import add_flip_right_inputs

        b = add_flip_right_inputs(batch)
        out, _ = bundle.depth_forward(
            state.params, state.batch_stats, b["color_aug_l"], b["grid"],
            train=True, dropout_rng=jax.random.PRNGKey(0),
        )
        return out["disp"]

    @jax.jit
    def fwd_loss(state, batch):
        losses, _, _ = process_batch(
            bundle, state.params, state.batch_stats, None, state.pc_params,
            batch, jax.random.PRNGKey(0), train=True,
        )
        return losses["loss/total_loss"]

    full = jax.jit(make_train_step(bundle, tx))

    @jax.jit
    def grad_fwd(state, batch):
        """Backward through the conv trunk only (dummy loss on disp)."""
        from planedepth_tpu.train.flip import add_flip_right_inputs

        b = add_flip_right_inputs(batch)

        def loss_fn(params):
            out, _ = bundle.depth_forward(
                params, state.batch_stats, b["color_aug_l"], b["grid"],
                train=True, dropout_rng=jax.random.PRNGKey(0),
            )
            return jnp.mean(out["disp"])

        g = jax.grad(loss_fn)(state.params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
        )

    @jax.jit
    def grad_full(state, batch):
        """Backward through the whole loss (no optimizer update)."""

        def loss_fn(params):
            losses, _, _ = process_batch(
                bundle, params, state.batch_stats, None, state.pc_params,
                batch, jax.random.PRNGKey(0), train=True,
            )
            return losses["loss/total_loss"]

        g = jax.grad(loss_fn)(state.params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
        )

    print(f"shape {H}x{W} per-step batch {pb} (effective {2*pb})")
    if variant == "grad_fwd":
        t = timeit(grad_fwd, state, batch)
        print(f"grad(conv trunk)    : {t*1e3:8.2f} ms")
    if variant == "grad_full":
        t = timeit(grad_full, state, batch)
        print(f"grad(full loss)     : {t*1e3:8.2f} ms")
    if variant == "step_donated":
        step = jax.jit(make_train_step(bundle, tx), donate_argnums=(0,))
        rng_ = rng
        state_, m = step(state, batch, rng_)
        _sync(m["loss/total_loss"])

        def run_steps(k, st):
            t0 = time.perf_counter()
            for _ in range(k):
                st, mm = step(st, batch, rng_)
            _sync(mm["loss/total_loss"])
            return time.perf_counter() - t0, st

        a, state_ = run_steps(2, state_)
        b, state_ = run_steps(10, state_)
        t = (b - a) / 8
        print(f"train step (donated): {t*1e3:8.2f} ms ({pb/t:.2f} imgs/s)")
    if variant == "opt_only":
        # optimizer update alone on a grad-shaped pytree
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

        @jax.jit
        def opt_step(opt_state, params, grads):
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates
            )
            return new_opt, new_params

        o, p = opt_step(state.opt_state, state.params, grads)
        _sync(p)

        def run_opt(k, o, p):
            t0 = time.perf_counter()
            for _ in range(k):
                o, p = opt_step(o, p, grads)
            _sync(p)
            return time.perf_counter() - t0, o, p

        a, o, p = run_opt(2, o, p)
        b, o, p = run_opt(12, o, p)
        print(f"adam update only    : {(b-a)/10*1e3:8.2f} ms")
    if variant in ("all", "fwd"):
        t = timeit(fwd_only, state, batch)
        print(f"forward only        : {t*1e3:8.2f} ms")
    if variant in ("all", "fwd_loss"):
        t = timeit(fwd_loss, state, batch)
        print(f"forward+warp+loss   : {t*1e3:8.2f} ms")
    if variant in ("all", "full"):
        t = timeit(lambda s, b, r: full(s, b, r)[1]["loss/total_loss"],
                   state, batch, rng)
        print(f"full train step     : {t*1e3:8.2f} ms "
              f"({pb/t:8.2f} imgs/s)")


if __name__ == "__main__":
    main()
