"""Multi-head self-attention over stacked summary embeddings.

The reference fuses K per-summary embeddings with
``nn.MultiheadAttention(embed_dim=d, num_heads=K, dropout=0.2)`` applied to
the stacked ``[K, N, d]`` tensor — the sequence axis is the K summaries,
the batch axis is the N nodes — and keeps ``attn_output[0]`` as node
features (model/layers.py:53,59-66).

This is a faithful functional reimplementation of torch's MHA math
(in-proj -> scaled dot-product per head -> attention-weight dropout ->
out-proj), parameterized with torch's exact tensor layouts so parity tests
can load torch weights verbatim. K and d are tiny (K<=6, d~64): this is VPU
noise next to the conv, so no kernel heroics — XLA fuses it fine.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MHAParams(NamedTuple):
    in_proj_w: jnp.ndarray   # [3d, d]  (torch in_proj_weight layout)
    in_proj_b: jnp.ndarray   # [3d]
    out_proj_w: jnp.ndarray  # [d, d]   (torch out_proj.weight layout)
    out_proj_b: jnp.ndarray  # [d]


def init_mha(key: jax.Array, embed_dim: int, dtype=jnp.float32) -> MHAParams:
    """torch ``MultiheadAttention._reset_parameters`` distributions:
    xavier_uniform in_proj, zero biases, Linear-default out_proj weight."""
    k1, k2 = jax.random.split(key)
    bound_in = np.sqrt(6.0 / (3 * embed_dim + embed_dim))  # xavier on [3d, d]
    bound_out = 1.0 / np.sqrt(embed_dim)                   # kaiming_uniform(a=sqrt(5))
    return MHAParams(
        in_proj_w=jax.random.uniform(k1, (3 * embed_dim, embed_dim),
                                     minval=-bound_in, maxval=bound_in, dtype=dtype),
        in_proj_b=jnp.zeros((3 * embed_dim,), dtype),
        out_proj_w=jax.random.uniform(k2, (embed_dim, embed_dim),
                                      minval=-bound_out, maxval=bound_out, dtype=dtype),
        out_proj_b=jnp.zeros((embed_dim,), dtype),
    )


def mha_self_attention(
    params: MHAParams,
    x: jnp.ndarray,                 # [L, B, d]  (L = num summaries, B = nodes)
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Self-attention, returns attn_output [L, B, d] (torch batch_first=False)."""
    L, B, d = x.shape
    dh = d // num_heads
    assert dh * num_heads == d, "embed_dim must be divisible by num_heads"

    qkv = x @ params.in_proj_w.T + params.in_proj_b          # [L, B, 3d]
    q, k, v = jnp.split(qkv, 3, axis=-1)                     # each [L, B, d]

    # -> [B, H, L, dh]
    def to_heads(t):
        return t.reshape(L, B, num_heads, dh).transpose(1, 2, 0, 3)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhlm,bhmd->bhld", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(2, 0, 1, 3).reshape(L, B, d)          # [L, B, d]
    return out @ params.out_proj_w.T + params.out_proj_b
