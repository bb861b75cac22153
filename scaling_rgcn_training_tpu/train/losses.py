"""Loss + activation selection (reference model/evaluation.py:33-51).

The reference applies the activation inside the model and feeds activated
outputs to the loss (``BCELoss`` on sigmoid outputs / ``CrossEntropyLoss``
on raw outputs). Here models emit logits and losses consume logits — the
same math in its numerically stable form:

- summaries, and AIFB full-graph: BCE with sigmoid (soft / multi-label
  targets), mean over all elements (torch BCELoss default reduction);
- other datasets' full-graph: CE on ``targets.argmax(-1)``.

``activation`` strings ('sigmoid' | 'softmax') select the eval prediction
rule in metrics.py (evaluation.py:14-23).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import optax


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return optax.sigmoid_binary_cross_entropy(logits, targets.astype(jnp.float32)).mean()


def ce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    labels = jnp.argmax(targets, axis=-1)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def get_loss(dataset: str, sum_model: bool = False) -> Tuple[Callable, str]:
    """(loss_fn over logits, activation name) — evaluation.py:44-48."""
    if sum_model or dataset == "AIFB":
        return bce_loss, "sigmoid"
    return ce_loss, "softmax"
