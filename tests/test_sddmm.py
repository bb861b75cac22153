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
