"""Eval metrics in pure JAX (reference model/evaluation.py:8-31).

The reference computes subset accuracy + weighted/macro F1 via sklearn on
host tensors every epoch. Here the per-epoch metrics are jnp so the whole
eval fits inside jit (no host sync in the epoch loop); the final test-set
``classification_report`` still goes through sklearn host-side for parity
output (evaluation.py:28-30).

Prediction rule (evaluation.py:14-23):
- sigmoid path: ``round(sigmoid(logits))`` as ints (round-half-to-even,
  same as torch.round);
- softmax path: one-hot of the argmax.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def predictions(logits: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "sigmoid":
        import jax

        return jnp.round(jax.nn.sigmoid(logits)).astype(jnp.int32)
    # softmax path: one-hot the argmax
    a = jnp.argmax(logits, axis=1)
    return (a[:, None] == jnp.arange(logits.shape[1])[None, :]).astype(jnp.int32)


def subset_accuracy(pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """sklearn ``accuracy_score`` on multilabel data = exact row match."""
    return jnp.all(pred == y.astype(pred.dtype), axis=1).mean()


def f1_score_jax(pred: jnp.ndarray, y: jnp.ndarray, average: str = "weighted") -> jnp.ndarray:
    """Binary per-class F1 with zero_division=0, sklearn-compatible."""
    y = y.astype(jnp.int32)
    tp = jnp.sum((pred == 1) & (y == 1), axis=0).astype(jnp.float32)
    fp = jnp.sum((pred == 1) & (y == 0), axis=0).astype(jnp.float32)
    fn = jnp.sum((pred == 0) & (y == 1), axis=0).astype(jnp.float32)
    precision = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1), 0.0)
    recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1), 0.0)
    f1 = jnp.where(precision + recall > 0,
                   2 * precision * recall / jnp.maximum(precision + recall, 1e-30), 0.0)
    if average == "macro":
        return f1.mean()
    support = jnp.sum(y == 1, axis=0).astype(jnp.float32)
    total = jnp.maximum(support.sum(), 1.0)
    return jnp.sum(f1 * support) / total


def evaluate(logits: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
             activation: str) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(subset accuracy, weighted F1, macro F1) on eval node subset ``x``."""
    pred = predictions(logits, activation)[x]
    return (
        subset_accuracy(pred, y),
        f1_score_jax(pred, y, "weighted"),
        f1_score_jax(pred, y, "macro"),
    )
