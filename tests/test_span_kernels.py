"""Relation-banded fused kernels vs plain numpy reference math.

Run in Pallas TPU interpret mode off-TPU (same harness as the other
kernels). These validate the kernels the TPU `auto` mode dispatches to
(ops/rgcn_conv.py `mode="fused"`), which reproduce PyG ``RGCNConv``'s
per-relation aggregation semantics (reference model/layers.py:21-23).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops.span_kernels import (
    pack_edge_cols, plan_rel_span, rel_span_backward_scatter,
    rel_span_matmul_scatter, unpack_edge_cols)


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _random_graph(rng, n, e, slots):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    rel = rng.integers(0, slots, e).astype(np.int32)
    norm = rng.random(e).astype(np.float32)
    return src, dst, rel, norm


@pytest.mark.parametrize("chunk", [128, 256, 512, 1024])
def test_pack_edge_cols_roundtrip(chunk):
    """Tile-packing bijection for every legal chunk size (the Pallas block
    is always (8, 128); chunk=256 is the AM-shape adaptive choice that a
    [chunk/128, 128] packing failed to lower for)."""
    rng = np.random.default_rng(chunk)
    a = rng.integers(0, 1 << 30, 4 * chunk).astype(np.int32)
    p = pack_edge_cols(a, chunk)
    assert p.shape == (4 * 8, 128)
    assert np.array_equal(unpack_edge_cols(p, chunk), a)
    f = rng.random(4 * chunk).astype(np.float32)
    assert np.array_equal(unpack_edge_cols(pack_edge_cols(f, chunk), chunk), f)


def test_plan_rel_span_structure():
    """Chunk-aligned buckets; every chunk's relations inside its band."""
    rng = np.random.default_rng(0)
    n, e, slots, k = 300, 5000, 23, 4
    src, dst, rel, norm = _random_graph(rng, n, e, slots)
    span = plan_rel_span(src, dst, rel, norm, n, slots,
                         bucket_rows=64, chunk=128, kspan=k)
    offs = np.asarray(span.offsets)
    assert (np.diff(offs) % span.chunk == 0).all()
    assert span.padded_edges == offs[-1]
    # code/norm are stored column-packed [Ep/128, 128]; flatten them back
    code = unpack_edge_cols(span.code, span.chunk)
    normp = unpack_edge_cols(span.norm, span.chunk)
    assert np.array_equal(pack_edge_cols(code, span.chunk),
                          np.asarray(span.code))
    rbase = np.asarray(span.rbase).reshape(-1, span.max_chunks)
    mask = (1 << span.shift) - 1
    n_real = 0
    for b in range(len(offs) - 1):
        nchunks = (offs[b + 1] - offs[b]) // span.chunk
        for ci in range(nchunks):
            lo = offs[b] + ci * span.chunk
            c = code[lo:lo + span.chunk]
            real = normp[lo:lo + span.chunk] > 0
            n_real += int(real.sum())
            rels = (c & mask)[real]
            keys = (c[real] >> span.shift)
            rb = rbase[b, ci]
            assert (rels >= rb).all() and (rels < rb + k).all()
            assert (keys // span.bucket_rows == b).all()
    assert n_real == e


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-4, 2e-4),
    (jnp.bfloat16, 3e-2, 3e-2),  # mixed precision: bf16 streams, f32 acc
])
@pytest.mark.parametrize("n,e,slots,d_in,d_out,k", [
    (300, 2000, 7, 16, 8, 3),
    (100, 500, 3, 8, 16, 16),   # kspan > slots -> clamped to slots
    (300, 2000, 7, 24, 11, 3),  # d_out not a multiple of 8 -> padded
                                # (AM's C=11 broke the unpadded slices)
])
def test_rel_span_matmul_scatter(n, e, slots, d_in, d_out, k, dtype, rtol, atol):
    rng = np.random.default_rng(n + e)
    src, dst, rel, norm = _random_graph(rng, n, e, slots)
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    w = (rng.standard_normal((slots, d_in, d_out)) * 0.2).astype(np.float32)

    span = plan_rel_span(src, dst, rel, norm, n, slots,
                         bucket_rows=64, chunk=128, kspan=k)
    # RAW gathered rows: the kernel applies span.norm itself
    vals = x[np.asarray(span.gather_idx)].astype(np.float32)
    out = rel_span_matmul_scatter(jnp.asarray(vals, dtype), span,
                                  jnp.asarray(w, dtype))
    assert out.dtype == jnp.float32

    msg = np.einsum("ed,edo->eo", x[src] * norm[:, None], w[rel])
    ref = np.zeros((n, d_out), np.float32)
    np.add.at(ref, dst, msg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=rtol,
                               atol=atol * np.abs(ref).max())


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-4, 2e-4),
    (jnp.bfloat16, 3e-2, 3e-2),
])
@pytest.mark.parametrize("n,e,slots,d_in,d_out,k", [
    (300, 2000, 7, 16, 8, 3),
    (64, 700, 5, 32, 8, 2),
    (300, 2000, 7, 24, 11, 3),  # d_out not a multiple of 8 -> padded
])
def test_rel_span_backward_scatter(n, e, slots, d_in, d_out, k, dtype, rtol, atol):
    rng = np.random.default_rng(2 * n + e)
    src, dst, rel, norm = _random_graph(rng, n, e, slots)
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    w = (rng.standard_normal((slots, d_in, d_out)) * 0.2).astype(np.float32)
    g_out = rng.standard_normal((n, d_out)).astype(np.float32)

    # backward direction: bucket by src, gather the cotangent via dst
    span = plan_rel_span(dst, src, rel, norm, n, slots,
                         bucket_rows=64, chunk=128, kspan=k)
    # RAW gathered cotangent rows: the kernel applies span.norm itself
    t = g_out[np.asarray(span.gather_idx)].astype(np.float32)
    dx, dw = rel_span_backward_scatter(jnp.asarray(t, dtype), span,
                                       jnp.asarray(x, dtype),
                                       jnp.asarray(w, dtype))
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
