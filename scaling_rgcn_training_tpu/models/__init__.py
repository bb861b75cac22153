"""The three R-GCN transfer-head models as pure functions + param pytrees.

Reference: model/layers.py — ``Emb_Layers`` (summation/baseline),
``Emb_MLP_Layers``, ``Emb_ATT_Layers``. Each is a 2-layer R-GCN trunk with a
different embedding front-end. Here a "model" is (init_fn, apply_fn) over a
NamedTuple of arrays; there is no module system — pjit/shard_map see plain
pytrees.
"""

from scaling_rgcn_training_tpu.models.attention import MHAParams, init_mha, mha_self_attention
from scaling_rgcn_training_tpu.models.heads import (
    EmbModelParams,
    MLPModelParams,
    ATTModelParams,
    init_emb_model,
    init_mlp_model,
    init_att_model,
    apply_emb_model,
    apply_mlp_model,
    apply_att_model,
    model_logits,
    HEADS,
)

__all__ = [
    "MHAParams", "init_mha", "mha_self_attention",
    "EmbModelParams", "MLPModelParams", "ATTModelParams",
    "init_emb_model", "init_mlp_model", "init_att_model",
    "apply_emb_model", "apply_mlp_model", "apply_att_model",
    "model_logits", "HEADS",
]
