"""shard_map plumbing for the Pallas kernels under GSPMD meshes.

``pallas_call`` has no SPMD partitioning rule, so under a plain
``jax.jit`` over a sharded batch GSPMD *all-gathers the operands and runs
the kernel replicated on every device* (verified on an 8-device CPU mesh:
the compiled HLO contains a full-batch all-gather feeding the custom
call).  That silently destroys data-parallel scaling for exactly the ops
this framework's TPU path lives on (ops/pallas_{sweep,disp,shift}.py).

Every kernel here is batch-parallel (grid leads with B) and row-parallel
(independent ``rows``-blocks along H), so the fix is purely structural:
wrap each kernel invocation in ``jax.shard_map`` over the ambient mesh,
sharding the batch axis over ``data`` (and the H axis over ``spatial``
when the 2-D mesh is in use).  The wrapper is a no-op when no mesh is
ambient (single-device tests, ``entry()``) or when the shapes do not
divide the mesh — GSPMD's replicated fallback is then still correct,
just not parallel.

The ambient mesh is installed by :func:`ambient_mesh`, which
``parallel.mesh.jit_train_step``/``jit_eval_step`` enter around every
call of the compiled step (tracing happens inside on the first call).
"""
from __future__ import annotations

import contextlib
from typing import Callable, Optional, Sequence

import jax
from jax.sharding import PartitionSpec as P

from planedepth_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


@contextlib.contextmanager
def ambient_mesh(mesh):
    """Make ``mesh`` the ambient jax mesh for the duration of the block.

    ``jax.sharding.set_mesh`` is process-global; this restores the
    previous value so meshes never leak across tests/trainers.
    """
    prev = jax.sharding.get_mesh()
    jax.sharding.set_mesh(mesh)
    try:
        yield
    finally:
        jax.sharding.set_mesh(prev)


def _spec(ndim: int, row_axis: Optional[int], spatial: bool) -> P:
    parts = [None] * ndim
    parts[0] = DATA_AXIS
    if spatial and row_axis is not None:
        parts[row_axis] = SPATIAL_AXIS
    return P(*parts)


def shard_kernel(
    fn: Callable,
    in_rows: Sequence[Optional[int]],
    out_rows: Sequence[Optional[int]],
    row_block: int = 8,
):
    """Wrap a batch-parallel Pallas kernel call for the ambient mesh.

    Args:
      fn: positional-args function whose array arguments all lead with the
        batch axis; closed over any static parameters.
      in_rows: per-argument index of the image-row (H) axis, None when
        the argument has no full-resolution row axis, or the string
        ``"rep"`` for a fully-replicated argument with NO batch axis
        (e.g. a per-channel bias vector).
      out_rows: same, for the flattened outputs of ``fn``.
      row_block: the kernel's rows-per-block R; the H axis is only sharded
        when every shard keeps a multiple of R rows.

    Returns:
      A function with ``fn``'s signature that runs it under ``shard_map``
      over the ambient mesh (batch over 'data', rows over 'spatial'), or
      calls it directly when no compatible mesh is ambient.
    """

    def wrapped(*args):
        mesh = jax.sharding.get_abstract_mesh()
        if (
            mesh is None
            or not mesh.axis_names
            or DATA_AXIS not in mesh.axis_names
        ):
            return fn(*args)
        data = mesh.shape[DATA_AXIS]
        if args[0].shape[0] % data != 0:
            return fn(*args)            # replicated fallback, still correct
        spatial = SPATIAL_AXIS in mesh.axis_names
        if spatial:
            n_sp = mesh.shape[SPATIAL_AXIS]
            for a, r in zip(args, in_rows):
                if r is not None and r != "rep" and (
                    a.shape[r] % n_sp != 0
                    or (a.shape[r] // n_sp) % row_block != 0
                ):
                    spatial = False
                    break
        in_specs = tuple(
            P(*([None] * a.ndim)) if r == "rep"
            else _spec(a.ndim, r, spatial)
            for a, r in zip(args, in_rows)
        )
        outs = jax.eval_shape(fn, *args)
        flat, treedef = jax.tree_util.tree_flatten(outs)
        out_specs = treedef.unflatten(
            [_spec(o.ndim, r, spatial) for o, r in zip(flat, out_rows)]
        )
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(*args)

    return wrapped
