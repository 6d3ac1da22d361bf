"""Train state pytree + optimizer construction.

Replaces the reference's mutable ``Trainer.models`` dict + torch Adam +
MultiStepLR (trainer.py:96-104) with an immutable flax struct holding every
parameter collection:

  * ``params`` — trainable: {"model": depth net, ["pose_encoder", "pose"]}
  * ``batch_stats`` — BN running stats for the same modules
  * ``teacher`` — frozen deep-copy of (params, batch_stats) for
    self-distillation (trainer.py:109-112)
  * ``pc_params`` — frozen perceptual-net weights (never in the optimizer)

The LR schedule is the reference MultiStepLR: lr * 0.5^(#milestones passed),
stepped per epoch (trainer.py:103-104, options.py:176-206).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from planedepth_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    teacher: Optional[Any] = None          # {"params":..., "batch_stats":...}
    pc_params: Optional[Any] = None


def multistep_lr(
    base_lr: float, milestones, gamma: float, steps_per_epoch: int
):
    """MultiStepLR as an optax schedule over optimizer steps."""
    if not milestones:
        return base_lr
    boundaries_and_scales = {
        int(m) * steps_per_epoch: gamma for m in milestones
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries_and_scales)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(b1, b2) with the reference's epoch-milestone LR decay."""
    schedule = multistep_lr(
        cfg.optim.learning_rate,
        cfg.optim.milestones,
        cfg.optim.lr_gamma,
        steps_per_epoch,
    )
    return optax.adam(schedule, b1=cfg.optim.beta_1, b2=cfg.optim.beta_2)


def fast_forward_schedule(opt_state, step: int):
    """Advance every LR-schedule count to ``step`` WITHOUT touching
    Adam's bias-correction state.

    The reference replays MultiStepLR ``start_epoch`` times on resume
    (trainer.py:243-244).  optax keys the schedule on the opt_state's
    internal count, not on ``TrainState.step`` — so a ``--start_epoch``
    resume with a fresh Adam (``--no_restore_optimizer`` or a checkpoint
    without adam state) would otherwise restart at the base LR, ignoring
    milestones already passed.
    """

    def walk(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, s.count.dtype)
            )
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(walk(x) for x in s)
        return s

    return walk(opt_state)


def create_train_state(
    params: Dict,
    batch_stats: Dict,
    tx: optax.GradientTransformation,
    teacher: Optional[Dict] = None,
    pc_params: Optional[Dict] = None,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        teacher=teacher,
        pc_params=pc_params,
    )
