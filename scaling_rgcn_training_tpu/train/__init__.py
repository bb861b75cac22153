"""Training: losses, metrics, optimizer, transfer machinery, trainer."""

from scaling_rgcn_training_tpu.train.losses import bce_loss, ce_loss, get_loss
from scaling_rgcn_training_tpu.train.metrics import predictions, subset_accuracy, f1_score_jax, evaluate
from scaling_rgcn_training_tpu.train.optim import make_optimizer, apply_mask
from scaling_rgcn_training_tpu.train.transfer import (
    build_transfer_tensors, sum_embeddings, concat_embeddings, stack_embeddings,
    EMBEDDING_TRICKS,
)
from scaling_rgcn_training_tpu.train.trainer import Trainer

__all__ = [
    "bce_loss", "ce_loss", "get_loss",
    "predictions", "subset_accuracy", "f1_score_jax", "evaluate",
    "make_optimizer", "apply_mask",
    "build_transfer_tensors", "sum_embeddings", "concat_embeddings",
    "stack_embeddings", "EMBEDDING_TRICKS",
    "Trainer",
]
