"""SDDMM, relational SDDMM, segment softmax, and mixed-precision conv."""

import numpy as np
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops import (
    build_rel_edges, init_rgcn_layer, rgcn_conv,
    sddmm, sddmm_rel, segment_softmax)


def _graph(seed=0, n=40, e=250, r=3):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, n, e).astype(np.int32),
            rng.integers(0, n, e).astype(np.int32),
            rng.integers(0, 2 * r, e).astype(np.int32), n, 2 * r + 1)


def test_sddmm_matches_dense():
    src, dst, typ, n, slots = _graph()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    y = rng.standard_normal((n, 8)).astype(np.float32)
    got = np.asarray(sddmm(jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(src), jnp.asarray(dst)))
    want = (x @ y.T)[src, dst]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sddmm_rel_matches_dense():
    src, dst, typ, n, slots = _graph(seed=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    y = rng.standard_normal((n, 6)).astype(np.float32)
    w = rng.standard_normal((slots, 8, 6)).astype(np.float32)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)
    got = np.asarray(sddmm_rel(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w),
                               edges, backend="gather"))
    # oracle over real (norm > 0) rows in the edges' sorted order
    es, ed_, er = (np.asarray(edges.src), np.asarray(edges.dst),
                   np.asarray(edges.rel))
    real = np.asarray(edges.norm) > 0
    want = np.einsum("ek,ekh,eh->e", x[es[real]], w[er[real]], y[ed_[real]])
    np.testing.assert_allclose(got[real], want, rtol=1e-4, atol=1e-4)


def test_segment_softmax_normalizes():
    src, dst, typ, n, slots = _graph(seed=4)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)
    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.standard_normal(len(edges.src)), jnp.float32)
    wts = segment_softmax(scores, edges.dst, n, mask=edges.norm)
    wts = np.asarray(wts)
    real = np.asarray(edges.norm) > 0
    assert (wts[~real] == 0).all()
    sums = np.zeros(n)
    np.add.at(sums, np.asarray(edges.dst)[real], wts[real])
    nz = sums > 0
    np.testing.assert_allclose(sums[nz], 1.0, rtol=1e-5)


def test_segment_softmax_handles_empty_and_large():
    # segments with no edges return no weight; large scores don't overflow
    scores = jnp.asarray([1e4, 1e4, -1e4], jnp.float32)
    ids = jnp.asarray([0, 0, 2], jnp.int32)
    w = np.asarray(segment_softmax(scores, ids, 4))
    np.testing.assert_allclose(w[:2], 0.5, rtol=1e-5)
    np.testing.assert_allclose(w[2], 1.0, rtol=1e-5)
    assert np.isfinite(w).all()


def test_rgcn_conv_bf16_close_to_f32():
    src, dst, typ, n, slots = _graph(seed=6, n=60, e=400, r=4)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    params = init_rgcn_layer(jax.random.key(0), slots, 16, 8)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)
    f32 = np.asarray(rgcn_conv(x, edges, params, backend="gather"))
    bf16 = rgcn_conv(x, edges, params, backend="gather",
                     compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32  # accumulation/output stay f32
    rel = np.abs(np.asarray(bf16) - f32) / (np.abs(f32) + 1e-3)
    assert rel.mean() < 0.02, rel.mean()


def test_rgcn_conv_bf16_grads_close():
    src, dst, typ, n, slots = _graph(seed=8, n=50, e=300, r=3)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    params = init_rgcn_layer(jax.random.key(1), slots, 16, 8)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)

    def loss(p, xx, cd):
        return jnp.sum(rgcn_conv(xx, edges, p, backend="gather",
                                 compute_dtype=cd) ** 2)

    g32 = jax.grad(loss, argnums=(0, 1))(params, x, None)
    g16 = jax.grad(loss, argnums=(0, 1))(params, x, jnp.bfloat16)
    for a, b in zip(jax.tree_util.tree_leaves(g32),
                    jax.tree_util.tree_leaves(g16)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.05


# -- the SDDMM pipeline's framework consumer: rgcn_conv(aggr="attention") -----

def _attention_dense_oracle(x, w, root, bias, src, dst, typ, n):
    """Dense numpy reference of the relational-attention layer."""
    d_out = w.shape[2]
    msg = np.einsum("ek,ekh->eh", x[src], w[typ])           # [E, d_out]
    keys = x @ root                                          # [N, d_out]
    scores = np.einsum("eh,eh->e", msg, keys[dst]) / np.sqrt(d_out)
    out = x @ root + bias
    for i in range(n):
        sel = dst == i
        if not sel.any():
            continue
        s = scores[sel]
        a = np.exp(s - s.max())
        a = a / a.sum()
        out[i] += (a[:, None] * msg[sel]).sum(0)
    return out


def test_attention_aggregate_matches_dense():
    src, dst, typ, n, slots = _graph(seed=6)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    params = init_rgcn_layer(jax.random.key(0), slots, 8, 6)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)
    got = np.asarray(rgcn_conv(jnp.asarray(x), edges, params,
                               backend="gather", aggr="attention"))
    from scaling_rgcn_training_tpu.ops.rgcn_conv import materialize_weight

    w = np.asarray(materialize_weight(params))
    want = _attention_dense_oracle(x, w, np.asarray(params.root),
                                   np.asarray(params.bias), src, dst, typ, n)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_attention_aggregate_grads():
    """Autodiff through SDDMM -> segment softmax -> scatter matches the
    dense formulation's gradients."""
    src, dst, typ, n, slots = _graph(seed=8, n=20, e=80)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
    params = init_rgcn_layer(jax.random.key(1), slots, 6, 5)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)

    def loss_sparse(p):
        return (rgcn_conv(x, edges, p, backend="gather",
                          aggr="attention") ** 2).sum()

    def loss_dense(p):
        from scaling_rgcn_training_tpu.ops.rgcn_conv import materialize_weight

        w = materialize_weight(p)
        d_out = w.shape[2]
        msg = jnp.einsum("ek,ekh->eh", x[src], w[typ])
        keys = x @ p.root
        scores = jnp.einsum("eh,eh->e", msg, keys[dst]) / jnp.sqrt(1.0 * d_out)
        onehot = jax.nn.one_hot(dst, n)                     # [E, N]
        neg = jnp.where(onehot > 0, 0.0, -jnp.inf)
        a = jax.nn.softmax(scores[:, None] + neg, axis=0)   # col-softmax per dst
        a = jnp.where(onehot > 0, a, 0.0)
        agg = jnp.einsum("en,eh->nh", a, msg)
        out = x @ p.root + p.bias + agg
        return (out ** 2).sum()

    g1 = jax.grad(loss_sparse)(params)
    g2 = jax.grad(loss_dense)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1)[:3],
                    jax.tree_util.tree_leaves(g2)[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_attention_aggregate_bf16_finite():
    src, dst, typ, n, slots = _graph(seed=10)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    params = init_rgcn_layer(jax.random.key(2), slots, 8, 6)
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=8)
    f32 = rgcn_conv(x, edges, params, backend="gather", aggr="attention")
    b16 = rgcn_conv(x, edges, params, backend="gather", aggr="attention",
                    compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(b16)).all()
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=0.1, atol=0.1)


def test_trainer_attention_aggregation_end_to_end(ref_graphs_dir):
    """-aggr attention through the full Trainer pipeline (TEST fixture):
    trains, evaluates, and differs from the mean-aggregation logits."""
    from scaling_rgcn_training_tpu.graphs.dataset import Dataset
    from scaling_rgcn_training_tpu.train.trainer import Trainer

    data = Dataset(f"{ref_graphs_dir}/TEST/TEST_complete.nt",
                   f"{ref_graphs_dir}/TEST/attr/sum",
                   f"{ref_graphs_dir}/TEST/attr/map").init_dataset(verbose=False)
    cfg = {"dataset": "TEST", "num_sums": 1, "e_trans": False,
           "w_trans": False}
    kw = dict(hidden_l=4, epochs=3, emb_dim=6, lr=0.01, weight_d=5e-5,
              seed=0, backend="gather")
    res_att = Trainer(data, **kw, aggr="attention").train_original(
        "summation", cfg, "baseline", verbose=False)
    assert np.isfinite(res_att["loss"]).all()
    assert 0.0 <= res_att["test_acc"] <= 1.0
    # TEST's CE loss is exactly 0 (single-class quirk), so trajectories
    # cannot differ; assert the aggregation itself differs on the same
    # params instead
    from scaling_rgcn_training_tpu.models import heads as model_heads

    t = Trainer(data, **kw)
    dg = t._device_graph(data.orgGraph)
    params = res_att["params"]
    l_att = model_heads.apply_emb_model(params, dg.edges, backend="gather",
                                        aggr="attention")
    l_mean = model_heads.apply_emb_model(params, dg.edges, backend="gather")
    assert not np.allclose(np.asarray(l_att), np.asarray(l_mean))


def test_trainer_attention_distributed_rejected():
    import pytest as _pytest

    from scaling_rgcn_training_tpu.train.trainer import Trainer

    with _pytest.raises(ValueError, match="single-device"):
        Trainer(None, hidden_l=4, epochs=1, emb_dim=6, lr=0.01,
                weight_d=5e-5, devices=8, aggr="attention")
