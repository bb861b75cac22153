"""Independent-framework oracle: per-layer activations allclose vs torch.

The reference's conv is PyG ``RGCNConv`` (model/layers.py:15-16, defaults
``aggr='mean'``, ``root_weight=True``, ``bias=True``). torch_geometric is
not installed here, so the oracle is a straight-from-the-math torch
implementation of those semantics (SURVEY.md L0):

    out_i = x_i @ root + bias + sum_r ( mean_{j in N_r(i)} x_j ) @ W[r]

computed with torch scatter ops — an implementation path entirely disjoint
from the JAX op (different framework, different scatter machinery), so a
match is strong evidence both encode the reference math. Also checks the
full 2-layer trunk (embedding -> conv -> relu -> conv -> sigmoid,
model/layers.py:20-25) activation-by-activation.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from scaling_rgcn_training_tpu.ops import (
    RGCNLayerParams, build_rel_edges, rgcn_conv)


def torch_rgcn_conv(x, src, dst, typ, w, root, bias):
    """PyG RGCNConv(mean) semantics in pure torch (float64)."""
    n = x.shape[0]
    out = x @ root + bias
    for rel in range(w.shape[0]):
        m = typ == rel
        if not m.any():
            continue
        s = torch.as_tensor(src[m], dtype=torch.long)
        d = torch.as_tensor(dst[m], dtype=torch.long)
        agg = torch.zeros((n, x.shape[1]), dtype=x.dtype)
        agg.index_add_(0, d, x[s])
        cnt = torch.zeros(n, dtype=x.dtype)
        cnt.index_add_(0, d, torch.ones(len(d), dtype=x.dtype))
        agg = agg / cnt.clamp(min=1.0)[:, None]
        out = out + agg @ w[rel]
    return out


@pytest.fixture
def graph():
    rng = np.random.default_rng(7)
    n, e, r = 31, 120, 5
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    return n, 2 * r + 1, src, dst, typ, rng


def test_conv_matches_torch_oracle(graph):
    n, slots, src, dst, typ, rng = graph
    d_in, d_out = 12, 6
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    w = rng.standard_normal((slots, d_in, d_out)).astype(np.float32)
    root = rng.standard_normal((d_in, d_out)).astype(np.float32)
    bias = rng.standard_normal(d_out).astype(np.float32)

    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=64)
    params = RGCNLayerParams(jnp.asarray(w), jnp.asarray(root), jnp.asarray(bias))
    ours = np.asarray(rgcn_conv(jnp.asarray(x), edges, params))

    ref = torch_rgcn_conv(
        torch.as_tensor(x, dtype=torch.float64), src, dst, typ,
        torch.as_tensor(w, dtype=torch.float64),
        torch.as_tensor(root, dtype=torch.float64),
        torch.as_tensor(bias, dtype=torch.float64)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_two_layer_trunk_matches_torch_oracle(graph):
    """Per-layer activations of the Emb_Layers trunk (layers.py:20-25)."""
    n, slots, src, dst, typ, rng = graph
    d, hl, c = 8, 5, 3
    emb = rng.standard_normal((n, d)).astype(np.float32)
    w1 = rng.standard_normal((slots, d, hl)).astype(np.float32)
    r1 = rng.standard_normal((d, hl)).astype(np.float32)
    b1 = rng.standard_normal(hl).astype(np.float32)
    w2 = rng.standard_normal((slots, hl, c)).astype(np.float32)
    r2 = rng.standard_normal((hl, c)).astype(np.float32)
    b2 = rng.standard_normal(c).astype(np.float32)

    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=64)
    p1 = RGCNLayerParams(jnp.asarray(w1), jnp.asarray(r1), jnp.asarray(b1))
    p2 = RGCNLayerParams(jnp.asarray(w2), jnp.asarray(r2), jnp.asarray(b2))

    h1 = rgcn_conv(jnp.asarray(emb), edges, p1)
    a1 = jnp.maximum(h1, 0.0)
    h2 = rgcn_conv(a1, edges, p2)
    logits = 1.0 / (1.0 + jnp.exp(-h2))

    tt = lambda a: torch.as_tensor(a, dtype=torch.float64)
    th1 = torch_rgcn_conv(tt(emb), src, dst, typ, tt(w1), tt(r1), tt(b1))
    ta1 = torch.relu(th1)
    th2 = torch_rgcn_conv(ta1, src, dst, typ, tt(w2), tt(r2), tt(b2))
    tlogits = torch.sigmoid(th2)

    for ours, ref in [(h1, th1), (a1, ta1), (h2, th2), (logits, tlogits)]:
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)
