"""The three model variants: summation/baseline, MLP, attention heads.

Faithful functional re-implementations of model/layers.py:11-130. Each model
is a NamedTuple of params + an ``apply`` that maps to logits ``[N, C]``
(the reference's output *before* the selectable activation; losses/metrics
consume logits and apply sigmoid/softmax themselves, numerically stable).

Shared trunk: embedding front-end -> rgcn1 (d -> hidden) -> ReLU ->
rgcn2 (hidden -> C). Weight transfer surgery only ever touches
weight/root/bias of the two conv layers (model/modelTrainer.py:26-39),
which is why those live in plain :class:`RGCNLayerParams`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaling_rgcn_training_tpu.models.attention import MHAParams, init_mha, mha_self_attention
from scaling_rgcn_training_tpu.ops.rgcn_conv import (
    RGCNLayerParams, RelEdges, init_rgcn_layer, rgcn_conv)


class EmbModelParams(NamedTuple):
    """``Emb_Layers`` (model/layers.py:11-46): plain embedding + trunk."""
    embedding: jnp.ndarray          # [N, d]
    rgcn1: RGCNLayerParams
    rgcn2: RGCNLayerParams


class MLPModelParams(NamedTuple):
    """``Emb_MLP_Layers`` (model/layers.py:90-130): 2-layer MLP front-end.

    lin weights kept in torch ``[out_features, in_features]`` layout for
    weight-loading parity.
    """
    embedding: jnp.ndarray          # [N, K*d] (concat) or [N, d] untransferred
    lin1_w: jnp.ndarray
    lin1_b: jnp.ndarray
    lin2_w: jnp.ndarray
    lin2_b: jnp.ndarray
    rgcn1: RGCNLayerParams
    rgcn2: RGCNLayerParams


class ATTModelParams(NamedTuple):
    """``Emb_ATT_Layers`` (model/layers.py:49-87): MHA over stacked embeddings."""
    embedding: jnp.ndarray          # [K, N, d]
    att: MHAParams
    rgcn1: RGCNLayerParams
    rgcn2: RGCNLayerParams


def _init_trunk(key, num_slots, emb_dim, hidden, num_classes,
                num_bases=None, num_blocks=None, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return (
        init_rgcn_layer(k1, num_slots, emb_dim, hidden,
                        num_bases=num_bases, num_blocks=num_blocks, dtype=dtype),
        init_rgcn_layer(k2, num_slots, hidden, num_classes,
                        num_bases=num_bases, num_blocks=num_blocks, dtype=dtype),
    )


def init_emb_model(key, num_slots, hidden, num_classes, num_nodes, emb_dim,
                   num_sums=1, num_bases=None, num_blocks=None, dtype=jnp.float32) -> EmbModelParams:
    k_e, k_t = jax.random.split(key)
    rgcn1, rgcn2 = _init_trunk(k_t, num_slots, emb_dim, hidden, num_classes,
                               num_bases, num_blocks, dtype)
    return EmbModelParams(
        # torch nn.Embedding default: N(0, 1)
        embedding=jax.random.normal(k_e, (num_nodes, emb_dim), dtype),
        rgcn1=rgcn1, rgcn2=rgcn2)


def init_mlp_model(key, num_slots, hidden, num_classes, num_nodes, emb_dim,
                   num_sums=1, num_bases=None, num_blocks=None, dtype=jnp.float32) -> MLPModelParams:
    in_f = num_sums * emb_dim
    out_f = round(in_f * (2.0 / 3.0) + num_classes)  # model/layers.py:93
    k_e, k_l1, k_l2, k_b1, k_b2, k_t = jax.random.split(key, 6)
    rgcn1, rgcn2 = _init_trunk(k_t, num_slots, emb_dim, hidden, num_classes,
                               num_bases, num_blocks, dtype)
    # lin weights: kaiming_uniform fan_in (layers.py:101-102) -> sqrt(6/in_f);
    # biases keep torch Linear default uniform(-1/sqrt(in_f), 1/sqrt(in_f)).
    bw1, bw2 = np.sqrt(6.0 / in_f), np.sqrt(6.0 / out_f)
    bb1, bb2 = 1.0 / np.sqrt(in_f), 1.0 / np.sqrt(out_f)
    return MLPModelParams(
        embedding=jax.random.normal(k_e, (num_nodes, emb_dim), dtype),
        lin1_w=jax.random.uniform(k_l1, (out_f, in_f), minval=-bw1, maxval=bw1, dtype=dtype),
        lin1_b=jax.random.uniform(k_b1, (out_f,), minval=-bb1, maxval=bb1, dtype=dtype),
        lin2_w=jax.random.uniform(k_l2, (emb_dim, out_f), minval=-bw2, maxval=bw2, dtype=dtype),
        lin2_b=jax.random.uniform(k_b2, (emb_dim,), minval=-bb2, maxval=bb2, dtype=dtype),
        rgcn1=rgcn1, rgcn2=rgcn2)


def init_att_model(key, num_slots, hidden, num_classes, num_nodes, emb_dim,
                   num_sums=1, num_bases=None, num_blocks=None, dtype=jnp.float32) -> ATTModelParams:
    k_a, k_t = jax.random.split(key)
    rgcn1, rgcn2 = _init_trunk(k_t, num_slots, emb_dim, hidden, num_classes,
                               num_bases, num_blocks, dtype)
    return ATTModelParams(
        # reference leaves embedding None until load_embedding (layers.py:55);
        # we initialize a stacked normal so the model is usable standalone.
        embedding=jax.random.normal(k_a, (num_sums, num_nodes, emb_dim), dtype),
        att=init_mha(jax.random.fold_in(k_a, 1), emb_dim, dtype),
        rgcn1=rgcn1, rgcn2=rgcn2)


def _trunk(x, edges, rgcn1, rgcn2, backend=None, compute_dtype=None,
           aggr="mean"):
    x = rgcn_conv(x, edges, rgcn1, backend=backend, compute_dtype=compute_dtype,
                  aggr=aggr)
    x = jax.nn.relu(x)
    return rgcn_conv(x, edges, rgcn2, backend=backend, compute_dtype=compute_dtype,
                     aggr=aggr)


def apply_emb_model(params: EmbModelParams, edges: RelEdges, *,
                    train: bool = False, rng: Optional[jax.Array] = None,
                    backend: Optional[str] = None, compute_dtype=None,
                    aggr: str = "mean") -> jnp.ndarray:
    return _trunk(params.embedding, edges, params.rgcn1, params.rgcn2,
                  backend, compute_dtype, aggr)


def apply_mlp_model(params: MLPModelParams, edges: RelEdges, *,
                    train: bool = False, rng: Optional[jax.Array] = None,
                    backend: Optional[str] = None, compute_dtype=None,
                    aggr: str = "mean") -> jnp.ndarray:
    x = jnp.tanh(params.embedding @ params.lin1_w.T + params.lin1_b)
    x = x @ params.lin2_w.T + params.lin2_b
    return _trunk(x, edges, params.rgcn1, params.rgcn2, backend, compute_dtype,
                  aggr)


def apply_att_model(params: ATTModelParams, edges: RelEdges, *,
                    train: bool = False, rng: Optional[jax.Array] = None,
                    backend: Optional[str] = None, compute_dtype=None,
                    aggr: str = "mean") -> jnp.ndarray:
    num_heads = params.embedding.shape[0]
    attn_out = mha_self_attention(
        params.att, params.embedding, num_heads=num_heads,
        dropout_rate=0.2 if train else 0.0, dropout_rng=rng)
    x = attn_out[0]  # first "sequence" element = fused node features
    return _trunk(x, edges, params.rgcn1, params.rgcn2, backend, compute_dtype,
                  aggr)


def model_logits(params, edges, *, train=False, rng=None, backend=None,
                 compute_dtype=None, aggr="mean") -> jnp.ndarray:
    """Dispatch on param type — single entry point used by the trainer."""
    kw = dict(train=train, rng=rng, backend=backend, compute_dtype=compute_dtype,
              aggr=aggr)
    if isinstance(params, EmbModelParams):
        return apply_emb_model(params, edges, **kw)
    if isinstance(params, MLPModelParams):
        return apply_mlp_model(params, edges, **kw)
    if isinstance(params, ATTModelParams):
        return apply_att_model(params, edges, **kw)
    raise TypeError(f"unknown model params: {type(params)}")


HEADS = {
    "summation": (init_emb_model, apply_emb_model),
    "baseline": (init_emb_model, apply_emb_model),
    "mlp": (init_mlp_model, apply_mlp_model),
    "attention": (init_att_model, apply_att_model),
}
