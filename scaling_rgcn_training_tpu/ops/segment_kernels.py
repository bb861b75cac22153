"""Pallas sorted-segment-sum: scatter as MXU one-hot matmuls, write-once.

Why: XLA's scatter-add on TPU degrades brutally when the target table
exceeds VMEM (measured on v5e: [1M,16] edges into a 3 MB table = 1.4 ms,
into a 131 MB table = 112 ms — an 80x cliff), because large-table scatter
falls off the in-VMEM update path. The R-GCN backward needs exactly such a
scatter (cotangents into the [R*N, h] transformed-feature table).

This kernel exploits two TPU facts:
1. grids execute sequentially on a core -> write-once streaming output;
2. the MXU is fast enough that ``onehot(keys)^T @ vals`` — a segmented
   reduction expressed as a matmul — costs less than a memory-bound
   scatter ever could.

Layout contract (host-side, static per graph): ``keys`` sorted ascending.
The output is tiled into buckets of ``S`` consecutive segment rows; for
bucket j the contributing edge range [offs[j], offs[j+1]) is precomputed
by ``plan_segmented_reduce`` (np.searchsorted on the static keys). The
kernel walks each bucket's edges in fixed-size chunks (predicated — empty
chunks cost ~nothing), builds the local one-hot [chunk, S], and
accumulates ``onehot^T @ vals_chunk`` into the VMEM-resident [S, h] tile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SegmentPlan(NamedTuple):
    """Static per-graph plan for a sorted segmented reduction."""

    offsets: jnp.ndarray       # int32 [num_buckets + 1] edge offsets
    num_segments: int          # total output rows M
    bucket_rows: int           # S: output rows per bucket
    chunk: int                 # edge rows per inner step
    max_chunks: int            # max chunks any bucket needs
    padded_edges: int          # length keys/vals are padded to


import os as _os

# Tile defaults. Grid steps ~= E/chunk + 2*M/bucket_rows and each step has
# ~µs-scale fixed cost (measured: the old 512/512 tiling spent ~40 ms on
# grid overhead at E=4M, M=200k), so fat tiles win as long as the one-hot
# [chunk, bucket_rows] intermediate stays well inside VMEM.
# env knobs read at plan time (not import) so late-set values take effect


def _def_bucket_rows() -> int:
    return int(_os.environ.get("RGCN_SEG_BUCKET_ROWS", 512))


def _def_chunk() -> int:
    return int(_os.environ.get("RGCN_SEG_CHUNK", 2048))


def plan_segmented_reduce(keys: np.ndarray, num_segments: int,
                          bucket_rows: int = 0, chunk: int = 0) -> SegmentPlan:
    """Host-side: bucket edge ranges for sorted ``keys`` (static data)."""
    bucket_rows = bucket_rows or _def_bucket_rows()
    chunk = chunk or _def_chunk()
    keys = np.asarray(keys)
    num_buckets = -(-num_segments // bucket_rows)
    bounds = np.arange(num_buckets + 1, dtype=np.int64) * bucket_rows
    offs = np.searchsorted(keys, bounds, side="left").astype(np.int32)
    per_bucket = np.diff(offs)
    # +1: the first fetched block is chunk-aligned below e_lo, so a bucket's
    # rows can span one extra block
    max_chunks = int(-(-per_bucket.max() // chunk)) + 1 if len(per_bucket) else 1
    e_pad = -(-len(keys) // chunk) * chunk
    # host (numpy) leaves: callers convert whole plan pytrees to device
    # arrays at their public boundary (utils/plancache.to_device) so the
    # on-disk plan cache never round-trips through the accelerator
    return SegmentPlan(
        offsets=offs, num_segments=int(num_segments),
        bucket_rows=int(bucket_rows), chunk=int(chunk),
        max_chunks=max(1, max_chunks), padded_edges=int(max(e_pad, chunk)))


def _seg_kernel(offs_ref, keys_ref, vals_ref, out_ref, *,
                s: int, chunk: int, h: int):
    j = pl.program_id(0)
    ci = pl.program_id(1)
    seg0 = j * s
    e_lo = offs_ref[j]
    e_hi = offs_ref[j + 1]
    base = (e_lo // chunk + ci) * chunk      # start row of the fetched block

    @pl.when(ci == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_and(base < e_hi, e_lo < e_hi))
    def _():
        kk = keys_ref[:, 0]                                   # [chunk]
        vv = vals_ref[:]                                      # [chunk, h]
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        valid = jnp.logical_and(rows >= e_lo, rows < e_hi)    # [chunk, 1]
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, s), 1)
        local = kk[:, None] - seg0                            # [chunk, 1]
        onehot = jnp.where(jnp.logical_and(local == col, valid),
                           jnp.float32(1), jnp.float32(0))
        out_ref[:] += jax.lax.dot_general(
            onehot, vv.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def sorted_segment_sum_pallas(vals: jnp.ndarray, keys: jnp.ndarray,
                              plan: SegmentPlan) -> jnp.ndarray:
    """segment_sum(vals, keys, M) for sorted keys. vals [E, h] -> [M, h].

    Low-precision inputs (bf16/f16) accumulate in float32 — the output is
    then float32 (the MXU dot already accumulates f32; this keeps the
    VMEM-resident tile f32 too).
    """
    e, h = vals.shape
    out_dtype = (jnp.float32 if vals.dtype in (jnp.bfloat16, jnp.float16)
                 else vals.dtype)
    s, chunk = plan.bucket_rows, plan.chunk
    m_pad = -(-plan.num_segments // s) * s
    num_buckets = m_pad // s
    if e < plan.padded_edges:
        vals = jnp.pad(vals, ((0, plan.padded_edges - e), (0, 0)))
        keys = jnp.pad(keys, (0, plan.padded_edges - e),
                       constant_values=np.int32(plan.num_segments))
    keys2d = keys.reshape(-1, 1)
    max_block = plan.padded_edges // chunk - 1

    def edge_block(j, ci, offs):
        return (jnp.minimum(offs[j] // chunk + ci, max_block), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_buckets, plan.max_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, h), edge_block),
        ],
        out_specs=pl.BlockSpec((s, h), lambda j, ci, offs: (j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_seg_kernel, s=s, chunk=chunk, h=h),
        out_shape=jax.ShapeDtypeStruct((m_pad, h), out_dtype),
        grid_spec=grid_spec,
    )(plan.offsets, keys2d, vals)
    return out[:plan.num_segments]
