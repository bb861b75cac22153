"""Fused rel-matmul+scatter kernels vs plain XLA reference math.

Run in Pallas TPU interpret mode off-TPU (same harness as the segment
kernels). These validate the kernels the TPU `auto` mode dispatches to
(ops/rgcn_conv.py `mode="fused"`), which reproduce PyG ``RGCNConv``'s
per-relation aggregation semantics (reference model/layers.py:21-23).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops.fused_kernels import (
    rel_backward_scatter, rel_matmul_scatter)
from scaling_rgcn_training_tpu.ops.segment_kernels import plan_segmented_reduce


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _random_graph(rng, n, e, slots, pad=256):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    rel = rng.integers(0, slots, e).astype(np.int32)
    norm = rng.random(e).astype(np.float32)
    e_pad = -(-e // pad) * pad
    npad = e_pad - e
    src = np.pad(src, (0, npad))
    dst = np.pad(dst, (0, npad))
    rel = np.pad(rel, (0, npad), constant_values=slots - 1)
    norm = np.pad(norm, (0, npad))  # pads: norm = 0
    return src, dst, rel, norm


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-4, 2e-4),
    (jnp.bfloat16, 3e-2, 3e-2),  # mixed precision: bf16 streams, f32 acc
])
@pytest.mark.parametrize("n,e,slots,d_in,d_out", [
    (300, 2000, 7, 16, 8),
    (100, 500, 3, 8, 16),   # hub-heavy small table
])
def test_rel_matmul_scatter(n, e, slots, d_in, d_out, dtype, rtol, atol):
    rng = np.random.default_rng(n + e)
    src, dst, rel, norm = _random_graph(rng, n, e, slots)
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    w = (rng.standard_normal((slots, d_in, d_out)) * 0.2).astype(np.float32)

    order = np.argsort(dst, kind="stable")
    keys = dst[order]
    plan = plan_segmented_reduce(keys, n, bucket_rows=64, chunk=128)
    vals = x[src[order]] * norm[order][:, None]
    out = rel_matmul_scatter(jnp.asarray(vals, dtype), jnp.asarray(rel[order]),
                             jnp.asarray(keys), plan, jnp.asarray(w, dtype))
    assert out.dtype == jnp.float32  # cross-chunk accumulator stays f32

    msg = np.einsum("ed,edo->eo", x[src] * norm[:, None], w[rel])
    ref = np.zeros((n, d_out), np.float32)
    np.add.at(ref, dst, msg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=rtol,
                               atol=atol * np.abs(ref).max())


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-4, 2e-4),
    (jnp.bfloat16, 3e-2, 3e-2),
])
@pytest.mark.parametrize("n,e,slots,d_in,d_out", [
    (300, 2000, 7, 16, 8),
    (64, 700, 5, 32, 8),
])
def test_rel_backward_scatter(n, e, slots, d_in, d_out, dtype, rtol, atol):
    rng = np.random.default_rng(2 * n + e)
    src, dst, rel, norm = _random_graph(rng, n, e, slots)
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    w = (rng.standard_normal((slots, d_in, d_out)) * 0.2).astype(np.float32)
    g_out = rng.standard_normal((n, d_out)).astype(np.float32)

    order = np.lexsort((rel, src))
    keys = src[order]
    plan = plan_segmented_reduce(keys, n, bucket_rows=64, chunk=128)
    t = g_out[dst[order]] * norm[order][:, None]
    dx, dw = rel_backward_scatter(jnp.asarray(t, dtype), jnp.asarray(rel[order]),
                                  jnp.asarray(keys), plan,
                                  jnp.asarray(x, dtype), jnp.asarray(w, dtype))
    assert dx.dtype == jnp.float32 and dw.dtype == jnp.float32

    t_ref = g_out[dst] * norm[:, None]                      # [E, d_out]
    dmsg = np.einsum("eo,edo->ed", t_ref, w[rel])           # [E, d_in]
    dx_ref = np.zeros((n, d_in), np.float32)
    np.add.at(dx_ref, src, dmsg)
    dw_ref = np.zeros_like(w)
    np.add.at(dw_ref, rel, x[src][:, :, None] * t_ref[:, None, :])
    np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=rtol,
                               atol=atol * np.abs(dx_ref).max())
    np.testing.assert_allclose(np.asarray(dw), dw_ref, rtol=rtol,
                               atol=atol * np.abs(dw_ref).max())


def test_fused_matches_aggregate_grads():
    """End-to-end: value_and_grad through relational_aggregate (CPU path)
    equals the fused kernels' outputs on the same RelEdges layout."""
    from scaling_rgcn_training_tpu.ops import build_rel_edges
    from scaling_rgcn_training_tpu.ops.rgcn_conv import relational_aggregate

    rng = np.random.default_rng(7)
    n, e, slots, d_in, d_out = 120, 900, 5, 16, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    rel = rng.integers(0, slots - 1, e).astype(np.int32)
    edges = build_rel_edges(src, dst, rel, n, slots, pad_to_multiple=128)
    x = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((slots, d_in, d_out)) * 0.2, jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, d_out)), jnp.float32)

    # reference grads via the (CPU) XLA path
    _, vjp = jax.vjp(lambda xx, ww: relational_aggregate(xx, ww, edges, "edge", "gather"), x, w)
    dx_ref, dw_ref = vjp(g)

    out_fused = rel_matmul_scatter(
        jnp.take(x, edges.fwd2_src, axis=0) * edges.fwd2_norm[:, None],
        edges.fwd2_rel, edges.dst_sorted, edges.dst_plan, w)
    out_ref = relational_aggregate(x, w, edges, "edge", "gather")
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)

    t = jnp.take(g, edges.bwd_dst, axis=0) * edges.bwd_norm[:, None]
    dx, dw = rel_backward_scatter(t, edges.bwd_rel, edges.bwd_src,
                                  edges.bwd_plan, x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)
