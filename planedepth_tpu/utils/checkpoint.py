"""Checkpoint save/restore (reference trainer.py:869-913, via orbax).

Layout per save: ``<log_dir>/<tag>/`` containing the full train-state pytree
(params, batch_stats, opt_state, step) plus ``config.json`` provenance (the
reference's opt.json, trainer.py:858-867).  ``last_models`` / ``best_models``
tags mirror the reference's folders (trainer.py:250,509-512).

Partial restore honors the reference's ``--models_to_load`` filtered
state-dict merge (trainer.py:897-904): the submodule names ``encoder`` /
``depth`` / ``plade`` / ``fal`` / ``pose_encoder`` / ``pose`` select
sub-trees of the unified param tree, which is what wires the stage1 -> HR ->
self-distillation recipe.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp


# map reference model names -> (collection path inside our unified tree)
_SUBMODULE_PATHS = {
    "encoder": ("model", "encoder"),
    "depth": ("model", "depth"),
    "plade": ("model", "plade"),
    "fal": ("model", "fal"),
    "pose_encoder": ("pose_encoder",),
    "pose": ("pose",),
}


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    log_dir: str,
    tag: str,
    state,
    config_json: Optional[str] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
) -> str:
    """Save the train state under <log_dir>/<tag>."""
    path = os.path.abspath(os.path.join(log_dir, tag))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": _tree_to_numpy(state.params),
        "batch_stats": _tree_to_numpy(state.batch_stats),
        "opt_state": _tree_to_numpy(state.opt_state),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload)
    # the reference embeds the train resolution in encoder.pth
    # (trainer.py:879-882) so the evaluator can run at the right size; we
    # additionally embed the full config for net reconstruction
    meta = {"height": height, "width": width}
    if config_json is not None:
        meta["config"] = json.loads(config_json)
    with open(os.path.join(path + ".meta.json"), "w") as f:
        json.dump(meta, f)
    if config_json is not None:
        with open(os.path.join(log_dir, "opt.json"), "w") as f:
            f.write(config_json)
    return path


def load_checkpoint_meta(path: str) -> Optional[Dict[str, Any]]:
    """Read ``<path>.meta.json`` (train resolution + config); falls back to
    the run's ``opt.json`` one directory up for the config.  Returns None
    when neither exists (e.g. foreign checkpoints)."""
    path = os.path.abspath(path).rstrip("/")
    meta: Dict[str, Any] = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if "config" not in meta:
        opt_path = os.path.join(os.path.dirname(path), "opt.json")
        if os.path.exists(opt_path):
            with open(opt_path) as f:
                meta["config"] = json.load(f)
    return meta or None


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def _get_subtree(tree, keypath):
    node = tree
    for k in keypath:
        if k not in node:
            return None
        node = node[k]
    return node


def _set_subtree(tree, keypath, value):
    node = tree
    for k in keypath[:-1]:
        node = node[k]
    node[keypath[-1]] = value


def restore_submodules(
    state,
    ckpt_payload: Dict[str, Any],
    models_to_load: Sequence[str],
    restore_optimizer: bool = False,
):
    """Filtered partial restore (reference trainer.py:888-913).

    Copies only the requested submodules' params + batch_stats into the
    state; optionally restores the full Adam state (only valid when the
    parameter tree is unchanged).
    """
    import copy

    params = jax.tree_util.tree_map(lambda x: x, state.params)  # shallow copy
    params = jax.device_get(params)
    params = copy.deepcopy(params)
    stats = copy.deepcopy(jax.device_get(state.batch_stats))

    for name in models_to_load:
        keypath = _SUBMODULE_PATHS.get(name)
        if keypath is None:
            raise ValueError(f"unknown submodule {name}")
        src_p = _get_subtree(ckpt_payload["params"], keypath)
        if src_p is not None:
            _set_subtree(params, keypath, src_p)
        src_s = _get_subtree(ckpt_payload.get("batch_stats", {}), keypath)
        if src_s is not None and _get_subtree(stats, keypath) is not None:
            _set_subtree(stats, keypath, src_s)

    new_state = state.replace(params=params, batch_stats=stats)
    if restore_optimizer and "opt_state" in ckpt_payload:
        # the reference always restores adam.pth when present
        # (trainer.py:905-913); only valid when the parameter tree is
        # unchanged, so skip with a warning on mismatch (e.g. resuming
        # into a different net_type).  Orbax restores namedtuple states
        # (optax ScaleByAdamState etc.) as plain containers, so the match
        # is leaf-wise against the template's treedef, not structural.
        template_leaves, treedef = jax.tree_util.tree_flatten(
            state.opt_state
        )
        saved_leaves = jax.tree_util.tree_leaves(ckpt_payload["opt_state"])
        shapes_ok = len(saved_leaves) == len(template_leaves) and all(
            np.shape(s) == np.shape(t)
            for s, t in zip(saved_leaves, template_leaves)
        )
        if shapes_ok:
            new_state = new_state.replace(
                opt_state=jax.tree_util.tree_unflatten(
                    treedef,
                    [
                        np.asarray(s).astype(np.asarray(t).dtype)
                        for s, t in zip(saved_leaves, template_leaves)
                    ],
                )
            )
        else:
            print("[checkpoint] optimizer state incompatible "
                  f"({len(saved_leaves)} vs {len(template_leaves)} leaves "
                  "or shape mismatch), Adam re-initialized")
    return new_state
