"""Optimizer matching the reference's torch.optim.Adam exactly.

``Adam(params, lr, weight_decay=5e-5)`` (model/modelTrainer.py:44) uses
*coupled* L2: ``grad += wd * param`` before the moment updates — that is
``optax.add_decayed_weights`` BEFORE ``scale_by_adam`` (NOT adamw's
decoupled decay). Defaults match torch: b1=0.9, b2=0.999, eps=1e-8.

Freezing (e_freeze / w_grad=False, modelTrainer.py:94-105) is a boolean
mask pytree: masked-off leaves get a zero final update, which also kills
their weight decay — same net effect as torch excluding no-grad params.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def make_optimizer(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)


def apply_mask(updates: Any, mask: Optional[Any]) -> Any:
    """Zero updates wherever the mask pytree is False. mask=None -> no-op."""
    if mask is None:
        return updates
    return jax.tree_util.tree_map(
        lambda u, m: u if m else jnp.zeros_like(u), updates, mask)


def trainable_mask(params: Any, frozen_predicate) -> Any:
    """Build a bool mask pytree: True = trainable.

    ``frozen_predicate(path, leaf) -> bool`` marks frozen leaves; paths are
    tuples of field names (NamedTuple pytrees).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    mask_leaves = [not frozen_predicate(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)
