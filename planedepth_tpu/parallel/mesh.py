"""Device mesh + sharding layout (replaces NCCL DDP, reference trainer.py:50-99).

The reference's entire communication profile is gradient all-reduce + SyncBN
stats + metric all-reduce (SURVEY.md §2.2) — on TPU this is one 1-D mesh with
the batch sharded over the ``data`` axis and parameters replicated.  The XLA
SPMD partitioner inserts every collective (psum over ICI): DDP, SyncBN and
the validation all-reduce all fall out of the sharding annotations.

``shard_batch`` places a host batch onto the mesh.  Under a single process
it is a plain async ``device_put``; under ``jax.process_count() > 1`` each
process passes its per-host slice (produced by ``data.loader.EpochSampler``'s
host sharding) and the slices are assembled into one GLOBAL array via
``jax.make_array_from_process_local_data`` — the jitted step then computes
on the global batch, so gradient/BN/metric reductions are global
automatically and every process sees identical outputs.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(devices: Optional[Sequence] = None,
              spatial: int = 1) -> Mesh:
    """Data-parallel mesh, optionally 2-D with a spatial axis.

    ``spatial > 1`` additionally shards image ROWS across chips (SURVEY.md
    §5: the plane-sweep's receptive field along H is local, so halo
    exchanges are small and GSPMD inserts them automatically for the convs).
    Use when a single chip's HBM cannot hold the HR plane volume.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spatial == 1:
        return Mesh(devices, (DATA_AXIS,))
    assert len(devices) % spatial == 0
    return Mesh(
        devices.reshape(len(devices) // spatial, spatial),
        (DATA_AXIS, SPATIAL_AXIS),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over 'data'; image rows over 'spatial' when present."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a (per-process) host batch onto the mesh, sharded along axis 0
    (and image rows along 'spatial' for rank>=3 arrays on a 2-D mesh).

    Multi-process: the input is this process's slice of the global batch
    (axis 0 length = per_host_batch); the result is a global array of
    batch axis length per_host_batch * process_count.
    """
    data_only = NamedSharding(mesh, P(DATA_AXIS))
    full = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def put(x):
        # image-like (B, H, W, C) tensors additionally shard rows on a 2-D
        # spatial mesh; matrices like K/Rt (B, 4, 4) stay data-sharded only
        sh = full if getattr(x, "ndim", 0) >= 4 else data_only
        if multiprocess:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate_state(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def _with_ambient_mesh(jitted, mesh: Mesh):
    """Run ``jitted`` with ``mesh`` ambient so the Pallas kernel call
    sites can shard_map themselves over it (parallel/shard.py) — tracing
    happens inside the context on the first call."""
    from planedepth_tpu.parallel.shard import ambient_mesh

    def call(*args, **kwargs):
        with ambient_mesh(mesh):
            return jitted(*args, **kwargs)

    def lower(*args, **kwargs):
        with ambient_mesh(mesh):
            return jitted.lower(*args, **kwargs)

    call.lower = lower
    return call


def jit_train_step(train_step, mesh: Mesh):
    """jit the train step with state replicated, batch sharding inherited
    from the arguments (see :func:`shard_batch`).

    Gradients of replicated params w.r.t. a sharded batch produce an
    automatic psum over ``data`` (and ``spatial``) — the DDP all-reduce.
    """
    rep = replicated(mesh)
    jitted = jax.jit(
        train_step,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    return _with_ambient_mesh(jitted, mesh)


def jit_eval_step(eval_step, mesh: Mesh):
    rep = replicated(mesh)
    return _with_ambient_mesh(jax.jit(eval_step, out_shardings=rep), mesh)
