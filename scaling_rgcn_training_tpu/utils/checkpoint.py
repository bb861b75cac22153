"""Checkpoint / resume for training state.

The reference has NO training-state checkpointing (SURVEY.md §5) — its only
persistence is the in-memory summary->full transfer clones
(modelTrainer.py:28-35,82). Here the transfer machinery *is* a checkpoint
surgery, so a real checkpoint subsystem comes for free:

- ``save_checkpoint``/``load_checkpoint``: params + optimizer state +
  epoch counter as a flat .npz (dependency-free, works for any NamedTuple
  pytree used by this framework);
- ``save_transfer_state``/``load_transfer_state``: the summary-pretraining
  artifacts (trunk params + per-summary embeddings), i.e. the reference's
  transfer mechanism as an explicit on-disk step.

Distributed semantics:

- Saving gathers each leaf to host explicitly: fully-addressable arrays via
  ``np.asarray``; multi-process (non-fully-addressable) arrays via
  ``multihost_utils.process_allgather`` so every process writes a complete
  checkpoint (or set ``RGCN_CKPT_BACKEND=orbax`` for sharded writes).
- Restoring lays each leaf out with the TEMPLATE's sharding
  (``jax.device_put(value, template_leaf.sharding)``) — a checkpoint
  written at one device count restores cleanly onto a mesh of another.
- ``RGCN_CKPT_BACKEND=orbax`` switches both entry points to Orbax
  (per-shard OCDBT writes, async-capable, the multi-host-scalable path);
  .npz stays the default and the interchange format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(getattr(k, "name", getattr(k, "idx", getattr(k, "key", k))))
                     for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return keys, leaves, treedef


def _leaf_to_host(leaf: Any) -> np.ndarray:
    """Device leaf -> complete host array, sharded-aware.

    A node-sharded leaf under single-process meshes (incl. the virtual CPU
    mesh) is fully addressable — plain ``np.asarray`` assembles it. Under
    real multi-process execution the leaf is NOT fully addressable and
    ``np.asarray`` raises; gather the global value across processes first.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf))
    return np.asarray(leaf)


def _leaf_to_device(value: np.ndarray, template_leaf: Any):
    """Host array -> device array laid out like the template leaf.

    Restoring re-shards to the TEMPLATE's sharding, so a checkpoint written
    at device count A restores onto a mesh of device count B (the npz file
    always holds the complete global array). Only COMMITTED templates pin a
    layout — an uncommitted template leaf (fresh init) yields an
    uncommitted restore, leaving jit's sharding inference free to place it
    (committing such a leaf to its incidental single device would clash
    with mesh-sharded jit arguments)."""
    if (isinstance(template_leaf, jax.Array)
            and getattr(template_leaf, "_committed", False)):
        try:
            return jax.device_put(jax.numpy.asarray(value),
                                  template_leaf.sharding)
        except (ValueError, TypeError):
            pass  # no usable sharding on the template; plain upload below
    return jax.numpy.asarray(value)


def _backend() -> str:
    return os.environ.get("RGCN_CKPT_BACKEND", "npz").strip().lower()


def checkpoint_exists(path: str) -> bool:
    """Whether a checkpoint written by :func:`save_checkpoint` exists at
    ``path``, under the CURRENT backend (npz file or orbax directory)."""
    src = path if path.endswith(".npz") else path + ".npz"
    if _backend() == "orbax":
        return os.path.isdir(src[:-4] + ".orbax")
    return os.path.exists(src)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    epoch: int = 0, extra: Optional[Dict] = None) -> str:
    """Write ``{path}.npz`` (+ sidecar meta json). Returns the file path.

    ``RGCN_CKPT_BACKEND=orbax`` writes an Orbax OCDBT directory at
    ``{path}.orbax`` instead (sharded, multi-host-scalable writes)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    out = path if path.endswith(".npz") else path + ".npz"
    if _backend() == "orbax":
        _orbax_save(out[:-4] + ".orbax", params, opt_state)
    else:
        arrays: Dict[str, np.ndarray] = {}
        p_keys, p_leaves, _ = _flatten_with_paths(params)
        for k, leaf in zip(p_keys, p_leaves):
            arrays[f"params/{k}"] = _leaf_to_host(leaf)
        if opt_state is not None:
            o_keys, o_leaves, _ = _flatten_with_paths(opt_state)
            for i, (k, leaf) in enumerate(zip(o_keys, o_leaves)):
                arrays[f"opt/{i:04d}/{k}"] = _leaf_to_host(leaf)
        tmp = f"{out}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, out)
    with open(out + ".meta.json", "w") as fh:
        json.dump({"epoch": epoch, **(extra or {})}, fh)
    return out


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any = None) -> Tuple[Any, Any, int]:
    """Restore (params, opt_state, epoch) into the template pytree
    structures, laying each leaf out with the template's sharding."""
    src = path if path.endswith(".npz") else path + ".npz"
    if _backend() == "orbax":
        params, opt_state = _orbax_load(src[:-4] + ".orbax", params_template,
                                        opt_state_template)
    else:
        data = np.load(src)
        p_keys, p_leaves, p_def = _flatten_with_paths(params_template)
        new_p = [_leaf_to_device(data[f"params/{k}"], leaf)
                 for k, leaf in zip(p_keys, p_leaves)]
        params = jax.tree_util.tree_unflatten(p_def, new_p)
        opt_state = opt_state_template
        if opt_state_template is not None:
            o_keys, o_leaves, o_def = _flatten_with_paths(opt_state_template)
            new_o = [_leaf_to_device(data[f"opt/{i:04d}/{k}"], leaf)
                     for i, (k, leaf) in enumerate(zip(o_keys, o_leaves))]
            opt_state = jax.tree_util.tree_unflatten(o_def, new_o)
    epoch = 0
    meta_file = src + ".meta.json"
    if os.path.exists(meta_file):
        with open(meta_file) as fh:
            epoch = json.load(fh).get("epoch", 0)
    return params, opt_state, epoch


# -- Orbax backend (RGCN_CKPT_BACKEND=orbax) ---------------------------------

def _orbax_save(ckpt_dir: str, params: Any, opt_state: Any) -> None:
    """Sharded (per-process) OCDBT write via Orbax — each process persists
    only its addressable shards; no host gather of the global arrays."""
    import orbax.checkpoint as ocp

    state = {"params": params}
    if opt_state is not None:
        state["opt"] = opt_state
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(ckpt_dir)
    tmp = path + f".tmp.{os.getpid()}"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def _orbax_load(ckpt_dir: str, params_template: Any, opt_state_template: Any):
    import orbax.checkpoint as ocp

    def abstract(leaf):
        # pin the template's sharding only for COMMITTED leaves (same rule
        # as the npz path's _leaf_to_device): an uncommitted fresh-init
        # template must not commit the restore to its incidental single
        # device, or jit rejects it next to mesh-sharded arguments
        if isinstance(leaf, jax.Array) and getattr(leaf, "_committed", False):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                        sharding=leaf.sharding)
        arr = np.asarray(leaf)
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype)

    tpl = {"params": jax.tree_util.tree_map(abstract, params_template)}
    if opt_state_template is not None:
        tpl["opt"] = jax.tree_util.tree_map(abstract, opt_state_template)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_dir), tpl)
    return restored["params"], restored.get("opt", opt_state_template)


def save_transfer_state(path: str, trunk_params: Any,
                        summary_embeddings: List[np.ndarray]) -> str:
    """Persist the summary-pretraining artifacts: ONE trunk + K embeddings
    (the reference's in-memory clones, modelTrainer.py:28-35,82, on disk)."""
    arrays: Dict[str, np.ndarray] = {}
    keys, leaves, _ = _flatten_with_paths(trunk_params)
    for k, leaf in zip(keys, leaves):
        arrays[f"trunk/{k}"] = np.asarray(leaf)
    for i, emb in enumerate(summary_embeddings):
        arrays[f"summary_embedding/{i}"] = np.asarray(emb)
    out = path if path.endswith(".npz") else path + ".npz"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, **arrays)
    return out


def load_transfer_state(path: str, trunk_template: Any) -> Tuple[Any, List[np.ndarray]]:
    src = path if path.endswith(".npz") else path + ".npz"
    data = np.load(src)
    keys, _, treedef = _flatten_with_paths(trunk_template)
    trunk = jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(data[f"trunk/{k}"]) for k in keys])
    embs = []
    i = 0
    while f"summary_embedding/{i}" in data:
        embs.append(data[f"summary_embedding/{i}"])
        i += 1
    return trunk, embs
