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


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


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
        jax.block_until_ready(m["loss/total_loss"])
        import time as _t

        n = 10
        t0 = _t.perf_counter()
        for _ in range(n):
            state_, m = step(state_, batch, rng_)
        jax.block_until_ready(m["loss/total_loss"])
        t = (_t.perf_counter() - t0) / n
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
        jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
        import time as _t

        n = 20
        t0 = _t.perf_counter()
        for _ in range(n):
            o, p = opt_step(o, p, grads)
        jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
        print(f"adam update only    : {(_t.perf_counter()-t0)/n*1e3:8.2f} ms")
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
