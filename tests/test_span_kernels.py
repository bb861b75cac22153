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


def test_padded_exact_matches_packer():
    """The adaptive chooser's dry-run simulator must equal the real
    packer's padded size for every candidate chunk (it IS the chooser)."""
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        _padded_exact, plan_rel_span)

    rng = np.random.default_rng(3)
    n, e, slots, s = 3000, 40_000, 19, 256
    key = rng.integers(0, n, e).astype(np.int64)
    rel = rng.integers(0, slots - 1, e).astype(np.int32)
    gi = rng.integers(0, n, e).astype(np.int32)
    norm = np.ones(e, np.float32)
    comp = (((key // s) * slots + rel).astype(np.int64) << 31) | key
    order = np.argsort(comp, kind="stable")
    bucket = (key[order] // s).astype(np.int64)
    for chunk in (256, 512, 1024):
        sp = plan_rel_span(gi, key, rel, norm, n, slots, bucket_rows=s,
                           chunk=chunk)
        sim = _padded_exact(bucket, rel[order], chunk, sp.kspan)
        assert sim == sp.padded_edges, (chunk, sim, sp.padded_edges)


def test_chunk_env_overrides(monkeypatch):
    """RGCN_SPAN_{FWD,BWD}_CHUNK force the per-direction plan chunks."""
    from scaling_rgcn_training_tpu.ops import build_rel_edges

    rng = np.random.default_rng(4)
    n, e, r = 2000, 20_000, 6
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    monkeypatch.setenv("RGCN_SPAN_FWD_CHUNK", "512")
    monkeypatch.setenv("RGCN_SPAN_BWD_CHUNK", "256")
    edges = build_rel_edges(src, dst, typ, n, 2 * r + 1, 64)
    assert edges.fspan.chunk == 512
    assert edges.bspan.chunk == 256


def test_fused_plan_viability_gate():
    from scaling_rgcn_training_tpu.parallel.fused_halo import fused_plan_viable

    rng = np.random.default_rng(5)
    # tiny graph: always viable (absolute floor)
    assert fused_plan_viable(
        rng.integers(0, 64, 100), rng.integers(0, 64, 100),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        n_per=64, halo=16, num_shards=4)
    # large locality-free graph: ~1 edge per (block, bucket) cell pads
    # each _CHUNK-row group catastrophically -> not viable
    n_per, e = 400_000, 800_000
    assert not fused_plan_viable(
        rng.integers(0, n_per, e), rng.integers(0, n_per, e),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        n_per=n_per, halo=16, num_shards=1)
    # block-local graph (src and dst in the same 512-block): viable
    blk = rng.integers(0, n_per // 512, e) * 512
    assert fused_plan_viable(
        blk + rng.integers(0, 512, e), blk + rng.integers(0, 512, e),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        n_per=n_per, halo=16, num_shards=1)


def test_fast_gather_len_nudge_invariants_and_values():
    """Plans above 64k padded rows with chunk < 1024 land on the gather
    engine's fast length (padded ≡ 512 mod 1024, PERF.md r5) via dead
    trailing chunks — and the kernel output is unchanged by them."""
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        _nudge_fast_gather_len, rel_span_matmul_scatter)

    rng = np.random.default_rng(77)
    n, e, slots = 1500, 70_000, 7
    src, dst, rel, norm = _random_graph(rng, n, e, slots)
    span = plan_rel_span(src, dst, rel, norm, n, slots,
                         bucket_rows=128, chunk=512, kspan=3)
    assert span.padded_edges >= (1 << 16)
    assert span.padded_edges % 1024 == 512          # nudged (or lucky)
    assert len(np.asarray(span.gather_idx)) == span.padded_edges
    assert np.asarray(span.code).shape[0] == span.padded_edges // 512 * 8
    # re-nudging is a no-op
    again = _nudge_fast_gather_len(span)
    assert again.padded_edges == span.padded_edges

    d_in, d_out = 8, 8
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    w = (rng.standard_normal((slots, d_in, d_out)) * 0.2).astype(np.float32)
    vals = x[np.asarray(span.gather_idx)].astype(np.float32)
    out = rel_span_matmul_scatter(jnp.asarray(vals), span, jnp.asarray(w))
    msg = np.einsum("ed,edo->eo", x[src] * norm[:, None], w[rel])
    ref = np.zeros((n, d_out), np.float32)
    np.add.at(ref, dst, msg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                               atol=2e-4 * np.abs(ref).max())
