"""Relation-banded fused Pallas kernels: per-edge transform + write-once scatter.

These collapse the R-GCN conv's per-edge pipeline (gather -> per-relation
matmul -> norm scale -> segment reduce) into ONE kernel per direction
(reference math: R masked passes inside PyG ``RGCNConv``,
model/layers.py:21-23; SURVEY.md L0). They supersede the first-generation
fused kernels (q-expansion over ALL relations): profiling on v5e showed
those were bound by VPU traffic on the [sub, slots*d_out] mask
intermediates (~29-33 ms at E=4M, slots=91 — identical in f32 and bf16,
the signature of a non-MXU bound).

Key idea — the relation band. Edges are bucketed by the OUTPUT row
(dst-bucket for forward, src-bucket for backward), and *within each
bucket* sorted by relation, then packed into fixed-size chunks such that
every chunk touches at most ``kspan`` consecutive relations (host-side
padding enforces this; see :func:`plan_rel_span`). A scalar-prefetched
per-chunk base relation ``rb`` then lets the kernel:

- slice only ``kspan * d_out`` rows of the flat weight stack
  (``w_ref[pl.ds(rb*d_out, kq)]``) for the big matmul, and
- build the relation mask at width ``kq = kspan*d_out`` instead of
  ``slots*d_out`` — a ~slots/kspan reduction of BOTH the VPU mask work
  and the MXU selection FLOPs.

Shared structure (both kernels):
- TPU grids run sequentially, so each [S, d] output tile is written once.
- Buckets are chunk-ALIGNED (host pads each bucket to a multiple of
  ``chunk``): no partial-chunk predication, padding rows self-mask
  (norm = 0 kills values; out-of-range keys kill the scatter one-hot).
- Scatter-add is the one-hot trick: ``onehot(key)^T @ msg`` accumulated
  into the VMEM-resident output tile (see segment_kernels.py for why this
  beats XLA scatter on TPU).

Numerics: inputs may be bf16 (mixed precision); every dot accumulates
f32 (Mosaic's 32-bit matmul-accumulator rule) and the cross-chunk output
tiles are f32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Env knobs are read at CALL/PLAN time, not import time: the knob values
# key the on-disk plan cache (utils/plancache.py), so a knob set after
# import must still take effect (and a mis-set one must fail loudly).


def _def_chunk() -> int:
    """RGCN_SPAN_CHUNK: 0 (default) = adaptive choice from {1024, 512,
    256} by exact padded size; nonzero forces that chunk."""
    return int(_os.environ.get("RGCN_SPAN_CHUNK", 0))


def _def_bucket_rows() -> int:
    return int(_os.environ.get("RGCN_SPAN_BUCKET_ROWS", 512))


def _def_kspan() -> int:
    return int(_os.environ.get("RGCN_SPAN_K", 16))


def _sub_rows(chunk: int) -> int:
    """Sub-chunk rows per kernel inner iteration, validated against chunk.

    1024 (= whole chunk) measured best at the bench shape post
    tile-packing: one iteration per chunk, fewer [sub, s] one-hot
    materializations in flight (r4 sweep: fwd kernels 15.1 -> 13.7/13.9
    ms; step 78.8 -> 76.7 ms). The fwd bucket stays 512: s=256 inflates
    fspan padding ~11% and the longer gathers cost more than the
    narrower one-hots save (step 107 ms measured).
    """
    sub = int(_os.environ.get("RGCN_SPAN_SUB", 1024))
    assert sub >= 128 and sub % 128 == 0 and 1024 % sub == 0, (
        f"RGCN_SPAN_SUB must be a power-of-two multiple of 128 dividing "
        f"1024 (got {sub}): chunks are <=1024 rows, covered exactly")
    sub = min(chunk, sub)
    # the kernels process each chunk in chunk//sub sub-iterations and rely
    # on that loop covering the whole chunk — a non-dividing combination
    # would silently drop the tail edge rows
    assert chunk % sub == 0, (
        f"RGCN_SPAN_SUB={sub} does not divide the plan chunk {chunk}; "
        f"tail edge rows would be dropped")
    return sub


def _max_w_bytes() -> int:
    # above this many weight bytes the VMEM-resident stack stops paying off
    return int(_os.environ.get("RGCN_FUSED_MAX_W_BYTES", 6 << 20))


def fused_ok(num_slots: int, d_in: int, d_out: int, itemsize: int = 4) -> bool:
    """Whether the fused kernels' VMEM-resident weight stack fits.

    Uses the PADDED output width (the kernels round d_out up to a multiple
    of 8 for sublane alignment), so the estimate matches the real VMEM
    footprint near the ``RGCN_FUSED_MAX_W_BYTES`` threshold.
    """
    d_pad = -(-d_out // 8) * 8
    return num_slots * d_in * d_pad * itemsize <= _max_w_bytes()


class RelSpanEdges(NamedTuple):
    """Host-built static plan for one direction of the banded fused conv.

    ``gather_idx``: rows of the node array each edge reads (src for the
    forward, dst for the backward). ``code``: ``(key << shift) | rel``
    where key is the OUTPUT row (dst for forward, src for backward) and
    rel the global relation id. ``norm``: per-edge mean coefficient (0 on
    padding rows). ``offsets``: per-bucket edge offsets, chunk-aligned.
    ``rbase``: per-(bucket, chunk) base relation, clamped so the
    ``kspan``-wide weight slice stays in range.

    Layout: ``code`` and ``norm`` are stored TILE-PACKED, one ``[8, 128]``
    tile per chunk (:func:`pack_edge_cols`). A per-edge ``[Ep, 1]``
    column array would be tiled ``T(8,128)`` by XLA — a 128x padding
    expansion in BOTH HBM bytes at rest and kernel stream traffic
    (measured: 6.48 GB for a 52 MB array at AM scale, the r3 OOM). The
    kernels rebuild the ``[chunk, 1]`` column in VMEM via sublane
    tile-repeat + a static lane-select mask + a lane reduction (Mosaic
    rejects the direct shape cast, and Pallas rejects blocks whose
    second-minor dim is not a multiple of 8 — hence the fixed 8-row
    tile).
    """

    gather_idx: jnp.ndarray    # int32 [Ep]
    code: jnp.ndarray          # int32 [Ep/chunk*8, 128] tile-packed
    norm: jnp.ndarray          # float32 [Ep/chunk*8, 128] tile-packed
    offsets: jnp.ndarray       # int32 [num_buckets + 1]
    rbase: jnp.ndarray         # int32 [num_buckets * max_chunks]
    num_segments: int
    num_slots: int
    bucket_rows: int
    chunk: int
    max_chunks: int
    kspan: int
    shift: int
    padded_edges: int


jax.tree_util.register_pytree_node(
    RelSpanEdges,
    lambda e: ((e.gather_idx, e.code, e.norm, e.offsets, e.rbase),
               (e.num_segments, e.num_slots, e.bucket_rows, e.chunk,
                e.max_chunks, e.kspan, e.shift, e.padded_edges)),
    lambda aux, ch: RelSpanEdges(*ch, *aux),
)


def pack_edge_cols(a: np.ndarray, chunk: int) -> np.ndarray:
    """Pack a flat per-edge array [Ep] into one [8, 128] tile per chunk ->
    [Ep/chunk*8, 128]: ``packed[c*8 + i, j] = a[c*chunk + j*8 + i]``
    (``j < chunk/8`` lanes used; the rest zero). A fixed 8-row tile keeps
    the Pallas block shape (8, 128) legal for EVERY chunk size (blocks
    need a second-minor dim divisible by 8 — chunk=256's (2, 128) is
    rejected at lowering). See :class:`RelSpanEdges` for why packing at
    all."""
    a = np.asarray(a)
    assert chunk % 8 == 0 and chunk <= 1024, chunk
    n_chunks = len(a) // chunk
    out = np.zeros((n_chunks, 8, 128), a.dtype)
    out[:, :, :chunk // 8] = a.reshape(n_chunks, chunk // 8, 8
                                       ).transpose(0, 2, 1)
    return np.ascontiguousarray(out.reshape(n_chunks * 8, 128))


def unpack_edge_cols(a2: np.ndarray, chunk: int) -> np.ndarray:
    """Inverse of :func:`pack_edge_cols` -> flat [Ep]."""
    a2 = np.asarray(a2)
    n_chunks = a2.shape[0] // 8
    t = a2.reshape(n_chunks, 8, 128)[:, :, :chunk // 8]
    return np.ascontiguousarray(t.transpose(0, 2, 1).reshape(-1))


def _rebuild_cols(code_ref, norm_ref, chunk: int):
    """In-kernel: one tile-packed [8, 128] block -> ([chunk, 1] i32,
    [chunk, 1] f32) edge columns (sublane tile-repeat + static lane
    select + lane reduction; Mosaic rejects the direct shape cast)."""
    tc = code_ref[...]                       # [8, 128]
    tn = norm_ref[...]
    xc = pltpu.repeat(tc, chunk // 8, axis=0)  # [chunk, 128]: xc[e] = tc[e%8]
    xn = pltpu.repeat(tn, chunk // 8, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
    erow = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 0)
    sel = lane == erow // 8                  # col[e] = t[e % 8, e // 8]
    code = jnp.sum(jnp.where(sel, xc, 0), axis=1, keepdims=True)
    norm = jnp.sum(jnp.where(sel, xn, jnp.float32(0)), axis=1, keepdims=True)
    return code, norm


def _nudge_fast_gather_len(span: "RelSpanEdges") -> "RelSpanEdges":
    """Append dead chunks so ``padded_edges`` ≡ 512 (mod 1024) when the
    chunk size allows it: the XLA gather engine is ~15% faster at such
    index counts (see :func:`plan_take`). Dead chunks belong to no bucket
    (offsets/rbase untouched) — the kernels' ``base < e_hi`` guard never
    reads them; only the gather grows by ``k * chunk`` row-0 reads."""
    chunk, padded = span.chunk, span.padded_edges
    if padded < (1 << 16) or chunk >= 1024:
        return span
    extra = (512 - padded % 1024) % 1024
    if extra == 0 or extra % chunk:
        return span
    k = extra // chunk
    pad_code = np.int32(span.num_segments << span.shift)
    g = np.concatenate([np.asarray(span.gather_idx),
                        np.zeros(extra, np.int32)])
    c = np.concatenate([np.asarray(span.code),
                        np.full((k * 8, 128), pad_code, np.int32)])
    nr = np.concatenate([np.asarray(span.norm),
                         np.zeros((k * 8, 128), np.float32)])
    return span._replace(gather_idx=g, code=c, norm=nr,
                         padded_edges=padded + extra)


def _padded_exact(bucket: np.ndarray, rel: np.ndarray, chunk: int,
                  kspan: int) -> int:
    """Exact padded edge count for one candidate chunk: a dry run of the
    packer walk over (bucket, relation-group) boundaries (mirrors
    native/spanplan.cpp span_padded_exact; inputs pre-sorted)."""
    if len(rel) == 0:
        return 0
    grp = np.flatnonzero(np.r_[True, (np.diff(rel) != 0)
                               | (np.diff(bucket) != 0)])
    grp_end = np.r_[grp[1:], len(rel)]
    w = 0
    fill = 0
    cur_b = -1
    last_rb = 0
    for g0, g1 in zip(grp.tolist(), grp_end.tolist()):
        b = int(bucket[g0])
        r = int(rel[g0])
        n = g1 - g0
        if b != cur_b:
            if fill:
                w += chunk - fill
            fill = 0
            cur_b = b
        elif fill and r - last_rb >= kspan:
            w += chunk - fill
            fill = 0
        if fill == 0:
            last_rb = r
        room = chunk - fill
        w += n
        if n < room:
            fill += n
        else:
            fill = (n - room) % chunk
            last_rb = r     # chunks started inside the group have base r
    if fill:
        w += chunk - fill
    return int(w)


def plan_rel_span(
    gather_idx: np.ndarray,
    key: np.ndarray,
    rel: np.ndarray,
    norm: np.ndarray,
    num_segments: int,
    num_slots: int,
    bucket_rows: int = 0,
    chunk: int = 0,
    kspan: int = 0,
) -> RelSpanEdges:
    """Host-side, once per graph: bucket by key, band by relation.

    Packs each bucket's (relation-sorted) edges into ``chunk``-row chunks
    whose relation span is < ``kspan``, padding chunk tails where a new
    relation would overflow the band. Buckets are padded to whole chunks.
    """
    s = bucket_rows or _def_bucket_rows()
    kspan = min(kspan or _def_kspan(), num_slots)
    chunk = chunk or _def_chunk()   # env override; 0 = adaptive below
    assert chunk % 128 == 0 and chunk <= 1024, (
        f"span chunk must be a multiple of 128 and <= 1024 (tile-packed "
        f"code/norm, one [8, 128] tile per chunk), got {chunk}")
    gather_idx = np.asarray(gather_idx, np.int32)
    key = np.asarray(key, np.int64)
    rel = np.asarray(rel, np.int32)
    norm = np.asarray(norm, np.float32)

    shift = max(1, int(np.ceil(np.log2(max(num_slots, 2)))))
    assert (num_segments << shift) < 2**31

    num_buckets = -(-num_segments // s)
    # sort by (bucket, rel, key): one composite-int64 stable radix sort is
    # ~2x np.lexsort's three passes at 12M edges (host-side, once/graph)
    if num_buckets * num_slots < (1 << 31) and num_segments < (1 << 31):
        comp = (((key // s) * num_slots + rel).astype(np.int64) << 31) | key
        order = np.argsort(comp, kind="stable")
    else:
        order = np.lexsort((key, rel, key // s))
    gather_idx, key, rel, norm = (gather_idx[order], key[order],
                                  rel[order], norm[order])

    # native packer fast path (C++, native/spanplan.cpp): same algorithm,
    # bitwise-identical outputs (tests/test_native.py), ~100x faster on
    # AM-scale graphs. Python below stays as fallback + parity oracle.
    if not _os.environ.get("RGCN_NO_NATIVE_PLAN"):
        from scaling_rgcn_training_tpu.ops import _native_plan

        packed = _native_plan.pack(
            np.ascontiguousarray(gather_idx), np.ascontiguousarray(key),
            np.ascontiguousarray(rel), np.ascontiguousarray(norm),
            num_segments, num_slots, s, chunk, kspan, shift)
        if packed is not None:
            # host (numpy) leaves throughout the plan builders: the public
            # builders convert once at the end (utils/plancache.to_device)
            return _nudge_fast_gather_len(RelSpanEdges(
                gather_idx=packed["gather"],
                code=pack_edge_cols(packed["code"], int(packed["chunk"])),
                norm=pack_edge_cols(packed["norm"], int(packed["chunk"])),
                offsets=packed["offsets"],
                rbase=packed["rbase"],
                num_segments=int(num_segments), num_slots=int(num_slots),
                bucket_rows=int(s), chunk=int(packed["chunk"]),
                max_chunks=int(packed["max_chunks"]), kspan=int(kspan),
                shift=int(shift), padded_edges=int(packed["padded"])))

    bucket = (key // s).astype(np.int64)
    b_start = np.searchsorted(bucket, np.arange(num_buckets), side="left")
    b_end = np.searchsorted(bucket, np.arange(num_buckets), side="right")

    if not chunk and len(rel) == 0:
        chunk = 1024
    if not chunk:
        # Adaptive chunk by EXACT padded size per candidate: chunks pad at
        # band/bucket closures, so sparse (bucket, band) runs — many
        # relation slots, few edges each — can blow padding up (measured:
        # AM shape, 267 slots, pads 12M -> 54M at chunk=1024). A dry run
        # of the packer walk per candidate gives exact sizes (the earlier
        # band-length estimate could not see the window base sliding at
        # chunk refills and overstated small-chunk padding — it mispicked
        # 1024 over 512 at the bench shape, a 2.5 ms/step difference).
        # Prefer larger chunks within 10% (fewer grid steps).
        padded = {c: _padded_exact(bucket, rel, c, kspan)
                  for c in (1024, 512, 256)}
        best = min(padded.values())
        chunk = max(c for c, p in padded.items() if p <= 1.1 * best)

    out_g, out_c, out_n = [], [], []
    offsets = [0]
    rbase_rows = []                    # list of per-bucket chunk rbase lists
    pad_code = np.int32(num_segments << shift)
    for b in range(num_buckets):
        lo, hi = int(b_start[b]), int(b_end[b])
        rbs = []
        fill = 0
        # group boundaries by relation within the bucket
        rels_b = rel[lo:hi]
        cuts = np.flatnonzero(np.diff(rels_b)) + 1
        starts = np.concatenate([[0], cuts]) + lo
        ends = np.concatenate([cuts, [hi - lo]]) + lo
        for g0, g1 in zip(starts, ends):
            if g0 >= g1:        # empty bucket (zero-edge segment/shard)
                continue
            r = int(rel[g0])
            if fill and r - rbs[-1] >= kspan:
                # close the chunk: pad to boundary, next chunk starts at r
                pad = chunk - fill
                out_g.append(np.zeros(pad, np.int32))
                out_c.append(np.full(pad, pad_code | np.int32(rbs[-1]),
                                     np.int32))
                out_n.append(np.zeros(pad, np.float32))
                fill = 0
            pos = g0
            while pos < g1:
                if fill == 0:
                    rbs.append(r)
                take = min(chunk - fill, g1 - pos)
                out_g.append(gather_idx[pos:pos + take])
                out_c.append((key[pos:pos + take].astype(np.int32) << shift)
                             | rel[pos:pos + take])
                out_n.append(norm[pos:pos + take])
                fill += take
                pos += take
                if fill == chunk:
                    fill = 0
        if fill:
            pad = chunk - fill
            out_g.append(np.zeros(pad, np.int32))
            out_c.append(np.full(pad, pad_code | np.int32(rbs[-1]),
                                 np.int32))
            out_n.append(np.zeros(pad, np.float32))
        offsets.append(offsets[-1] + len(rbs) * chunk)
        rbase_rows.append(rbs)

    if offsets[-1] == 0:                # graph with no edges at all
        out_g.append(np.zeros(chunk, np.int32))
        out_c.append(np.full(chunk, pad_code, np.int32))
        out_n.append(np.zeros(chunk, np.float32))
        offsets = [0] + [chunk] * num_buckets
        rbase_rows[0] = [0]

    max_chunks = max(1, max(len(r) for r in rbase_rows))
    rbase = np.zeros((num_buckets, max_chunks), np.int32)
    for b, rbs in enumerate(rbase_rows):
        # clamp so the kspan-wide weight slice stays inside [0, slots)
        rbase[b, :len(rbs)] = np.minimum(rbs, max(0, num_slots - kspan))

    e_pad = offsets[-1]

    return _nudge_fast_gather_len(RelSpanEdges(
        gather_idx=np.concatenate(out_g),
        code=pack_edge_cols(np.concatenate(out_c), chunk),
        norm=pack_edge_cols(np.concatenate(out_n), chunk),
        offsets=np.asarray(offsets, np.int32),
        rbase=rbase.reshape(-1),
        num_segments=int(num_segments), num_slots=int(num_slots),
        bucket_rows=int(s), chunk=int(chunk), max_chunks=int(max_chunks),
        kspan=int(kspan), shift=int(shift), padded_edges=int(e_pad)))


# -- forward: msg_e = vals_e @ W[rel_e]; out[key_e] += msg_e ------------------

def _fwd_kernel(offs_ref, rbase_ref, code_ref, norm_ref, vals_ref, w_ref,
                g_ref, out_ref, *, s: int, chunk: int, d_out: int,
                shift: int, kq: int, max_chunks: int, sub: int):
    j = pl.program_id(0)
    ci = pl.program_id(1)
    e_lo = offs_ref[j]
    e_hi = offs_ref[j + 1]
    base = e_lo + ci * chunk            # buckets are chunk-aligned

    @pl.when(ci == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(base < e_hi)
    def _():
        rb = rbase_ref[j * max_chunks + ci]
        # d_out is padded to a multiple of 8 by the wrapper, so this
        # dynamic sublane offset is provably tile-aligned (Mosaic rejects
        # unprovable offsets at some shapes: "cannot statically prove that
        # index in dimension 0 is a multiple of 8" — hit at AM's C=11)
        w_sl = w_ref[pl.ds(pl.multiple_of(rb * d_out, 8), kq), :]
        dtype = vals_ref.dtype
        code_col, norm_col = _rebuild_cols(code_ref, norm_ref, chunk)
        for q in range(chunk // sub):
            sl = pl.ds(q * sub, sub)
            vals = vals_ref[sl, :]                          # [sub, d_in]
            code = code_col[q * sub:(q + 1) * sub]          # [sub, 1]
            rel = jnp.bitwise_and(code, (1 << shift) - 1) - rb
            # banded transform: only the kspan relations this chunk touches
            p_all = jax.lax.dot_general(
                vals, w_sl, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
            qcol = jax.lax.broadcasted_iota(jnp.int32, (sub, kq), 1)
            # banded relation mask as ONE select (no separate 0/1 one-hot
            # materialization + multiply: the kernels are VPU-bound)
            p_sel = jnp.where(rel == qcol // d_out, p_all,
                              jnp.zeros((), dtype))         # [sub, kq]
            nrm = norm_col[q * sub:(q + 1) * sub].astype(dtype)  # [sub, 1]
            # mean-norm applied to the NARROW [sub, d_out] message, not the
            # [sub, s] one-hot: same math (norm_e * onehot[e,k] * msg[e,d]),
            # but the multiply runs over s/d_out = 32x fewer lanes and the
            # scatter one-hot stays a pure compare-cast (no [sub,1] -> s
            # lane broadcast). Padding rows still self-mask via norm = 0.
            msg = jax.lax.dot(p_sel, g_ref[:],
                              preferred_element_type=jnp.float32
                              ).astype(dtype) * nrm         # [sub, d_out]
            local = jax.lax.shift_right_logical(code, shift) - j * s
            scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
            # compare-cast, NOT where(mask, ...): Mosaic cannot
            # lane-replicate the i1 mask against a [sub, 1] operand
            # ("Invalid relayout ... vector<512x512xi1>")
            valhot = (local == scol).astype(dtype)          # [sub, s]
            out_ref[:] += jax.lax.dot_general(
                valhot, msg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def rel_span_matmul_scatter(vals: jnp.ndarray, span: RelSpanEdges,
                            w: jnp.ndarray) -> jnp.ndarray:
    """``out[k] = sum_{e: key_e = k} norm_e * (vals_e @ w[rel_e])``.

    ``vals [Ep, d_in]`` RAW gathered rows in span order — the kernel
    applies ``span.norm`` itself, multiplying it onto the narrow
    ``[sub, d_out]`` message (the scatter one-hot stays a pure
    compare-cast), so the caller's gather remains a standalone pure
    gather. ``w [slots, d_in, d_out]`` -> ``[M, d_out]`` float32.
    """
    _, d_in = vals.shape
    slots, _, d_true = w.shape
    # pad d_out to a multiple of 8: keeps the dynamic weight-slice offset
    # rb*d_out provably sublane-aligned (Mosaic rejects e.g. AM's C=11)
    d_out = -(-d_true // 8) * 8
    if d_out != d_true:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, d_out - d_true)))
    s, chunk = span.bucket_rows, span.chunk
    kq = span.kspan * d_out
    m_pad = -(-span.num_segments // s) * s
    num_buckets = m_pad // s
    # flat weight layout Wf[r*d_out + o, i] = w[r, i, o]; the fold matrix
    # G[q, o] = 1[q % d_out == o] is a tiny static operand
    w_flat = jnp.transpose(w, (0, 2, 1)).reshape(slots * d_out, d_in
                                                 ).astype(vals.dtype)
    qs = np.arange(kq)
    g_mat = jnp.asarray((qs[:, None] % d_out == np.arange(d_out)[None, :]
                         ).astype(np.float32)).astype(vals.dtype)

    max_block = span.padded_edges // chunk - 1

    def edge_block(j, ci, offs, rb):
        return (jnp.minimum(offs[j] // chunk + ci, max_block), 0)

    const_block = lambda shape: pl.BlockSpec(
        shape, lambda j, ci, offs, rb: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_buckets, span.max_chunks),
        in_specs=[
            pl.BlockSpec((8, 128), edge_block),
            pl.BlockSpec((8, 128), edge_block),
            pl.BlockSpec((chunk, d_in), edge_block),
            const_block((slots * d_out, d_in)),
            const_block((kq, d_out)),
        ],
        out_specs=pl.BlockSpec((s, d_out), lambda j, ci, offs, rb: (j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, chunk=chunk, d_out=d_out,
                          shift=span.shift, kq=kq,
                          max_chunks=span.max_chunks, sub=_sub_rows(chunk)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out), jnp.float32),
        grid_spec=grid_spec,
    )(span.offsets, span.rbase, span.code, span.norm, vals, w_flat, g_mat)
    return out[:span.num_segments, :d_true]


# -- backward: dx[src] += t_e @ W[rel_e]^T ; dW[rel_e] += x[src_e]^T t_e ------

def _bwd_kernel(offs_ref, rbase_ref, code_ref, norm_ref, t_ref, x_ref,
                w_ref, tm_ref, dx_ref, dw_ref, *, s: int, chunk: int,
                d_out: int, shift: int, kq: int, max_chunks: int,
                slots: int, sub: int):
    j = pl.program_id(0)
    ci = pl.program_id(1)
    e_lo = offs_ref[j]
    e_hi = offs_ref[j + 1]
    base = e_lo + ci * chunk

    @pl.when(ci == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(jnp.logical_and(j == 0, ci == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(base < e_hi)
    def _():
        rb = rbase_ref[j * max_chunks + ci]
        off = pl.multiple_of(rb * d_out, 8)   # d_out padded to 8k: aligned
        w_sl = w_ref[pl.ds(off, kq), :]                     # [kq, d_in]
        dtype = t_ref.dtype
        kspan = kq // d_out
        code_col, norm_col = _rebuild_cols(code_ref, norm_ref, chunk)
        for q in range(chunk // sub):
            sl = pl.ds(q * sub, sub)
            # apply the mean-norm to the RAW gathered cotangent rows here
            # (one [sub, d_out] multiply) so the XLA-side gather stays a
            # standalone pure gather; padding rows carry norm = 0
            t = t_ref[sl, :] * norm_col[q * sub:(q + 1) * sub].astype(dtype)
            code = code_col[q * sub:(q + 1) * sub]          # [sub, 1]
            rel = jnp.bitwise_and(code, (1 << shift) - 1) - rb
            # src one-hot: out-of-bucket / padding rows self-mask (t = 0)
            local = jax.lax.shift_right_logical(code, shift) - j * s
            scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
            srchot = (local == scol).astype(dtype)          # [sub, s]
            xs = jax.lax.dot(srchot, x_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(dtype)                # [sub, d_in]
            # banded mask M[e, q] = 1[rel_local == q // d_out] * t[e, q % d_out]
            # as a tiny MXU tiling matmul (tm[o, q] = 1[q % d_out == o], so
            # t @ tm = t[e, q % d_out]) + ONE select: cheaper than
            # pltpu.repeat's log-step lane replication on the VPU
            qcol = jax.lax.broadcasted_iota(jnp.int32, (sub, kq), 1)
            texp = jax.lax.dot(t, tm_ref[:],
                               preferred_element_type=jnp.float32
                               ).astype(dtype)              # t[e, q % d_out]
            m_exp = jnp.where(rel == qcol // d_out, texp,
                              jnp.zeros((), dtype))         # [sub, kq]
            dmsg = jax.lax.dot(m_exp, w_sl,
                               preferred_element_type=jnp.float32)
            dw_ref[pl.ds(off, kq), :] += jax.lax.dot_general(
                m_exp, xs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dw_ref.dtype)
            dx_ref[:] += jax.lax.dot_general(
                srchot, dmsg.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def rel_span_backward_scatter(t: jnp.ndarray, span: RelSpanEdges,
                              x: jnp.ndarray, w: jnp.ndarray
                              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both aggregation gradients in one pass over src-bucketed edges.

    ``t [Ep, d_out]`` = RAW ``g_out[dst_e]`` rows in span order (the
    kernel applies ``span.norm`` itself), ``x [N, d_in]`` node features,
    ``w [slots, d_in, d_out]``. Returns ``dx [N, d_in]`` f32 and
    ``dw [slots, d_in, d_out]`` f32.
    """
    _, d_true = t.shape
    slots, d_in, _ = w.shape
    # pad d_out to a multiple of 8 (see rel_span_matmul_scatter)
    d_out = -(-d_true // 8) * 8
    if d_out != d_true:
        t = jnp.pad(t, ((0, 0), (0, d_out - d_true)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, d_out - d_true)))
    s, chunk = span.bucket_rows, span.chunk
    kq = span.kspan * d_out
    rq = slots * d_out
    m_pad = -(-span.num_segments // s) * s
    num_buckets = m_pad // s
    x_pad = x.astype(t.dtype)
    if x_pad.shape[0] < m_pad:
        x_pad = jnp.pad(x_pad, ((0, m_pad - x_pad.shape[0]), (0, 0)))
    w_flat = jnp.transpose(w, (0, 2, 1)).reshape(rq, d_in).astype(t.dtype)
    qs = np.arange(kq)
    t_mat = jnp.asarray((np.arange(d_out)[:, None] == qs[None, :] % d_out
                         ).astype(np.float32)).astype(t.dtype)  # [d_out, kq]

    max_block = span.padded_edges // chunk - 1

    def edge_block(j, ci, offs, rb):
        return (jnp.minimum(offs[j] // chunk + ci, max_block), 0)

    const_block = lambda shape: pl.BlockSpec(
        shape, lambda j, ci, offs, rb: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_buckets, span.max_chunks),
        in_specs=[
            pl.BlockSpec((8, 128), edge_block),
            pl.BlockSpec((8, 128), edge_block),
            pl.BlockSpec((chunk, d_out), edge_block),
            pl.BlockSpec((s, d_in), lambda j, ci, offs, rb: (j, 0)),
            const_block((rq, d_in)),
            const_block((d_out, kq)),
        ],
        out_specs=[
            pl.BlockSpec((s, d_in), lambda j, ci, offs, rb: (j, 0)),
            const_block((rq, d_in)),
        ],
    )
    dx, dw_flat = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, chunk=chunk, d_out=d_out,
                          shift=span.shift, kq=kq,
                          max_chunks=span.max_chunks, slots=slots,
                          sub=_sub_rows(chunk)),
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, d_in), jnp.float32),
            jax.ShapeDtypeStruct((rq, d_in), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(span.offsets, span.rbase, span.code, span.norm, t, x_pad, w_flat, t_mat)
    dw = jnp.transpose(dw_flat.reshape(slots, d_out, d_in), (0, 2, 1))
    return dx[:span.num_segments], dw[:, :, :d_true]


# -- reusable fused aggregate (single-shard or per-shard inside shard_map) ----

@jax.custom_vjp
def span_aggregate(x, w, fspan: RelSpanEdges, bspan: RelSpanEdges):
    """``out[dst] = sum_e norm_e * (x[src_e] @ w[rel_e])`` via span kernels.

    The fused-mode message-passing core with both directions relation-
    banded (same math as ``ops.rgcn_conv.relational_aggregate``; reference
    semantics model/layers.py:21-23). Packaged as its own custom-VJP so the
    distributed halo path (parallel/halo.py) can run the identical kernels
    per shard inside ``shard_map`` — ``fspan``/``bspan`` ride along as
    pytree args (their cotangents are None).

    ``x [N, d_in]`` -> ``[fspan.num_segments, d_out]`` in f32-accumulated
    ``x`` precision semantics: output f32 when x is low-precision.
    """
    return _span_agg_fwd(x, w, fspan, bspan)[0]


def plan_take(x, idx):
    """Row gather by a plan-built index: indices are host-verified
    in-bounds, so skip XLA's clamp (which otherwise materializes an
    [E, d]-sized select fusion after the gather — ~3.3 ms per gather at
    the bench shape, visible in the r4 profiler trace).

    Length quirk (measured on v5e, r5): the XLA gather engine runs ~15%
    FASTER when the index count is ≡ 512 (mod 1024) than at multiples of
    1024 (535 vs 440-460 M rows/s at 4.2M rows — value-independent; a
    pure length effect, presumably the engine's index-stream tiling).
    Only a NATURAL fast length keeps the fast mode: padding the index
    stream and slicing the result back off, or splitting into two
    fast-length gathers and concatenating, both materialize an extra
    [E, d] copy and lose more than they gain (bench: 70.4 -> 73.9 ms;
    micro: 9.2 -> 28.4 / 11.3 ms). The exploit therefore lives in the
    PLAN: :func:`plan_rel_span` appends a dead chunk when that lands
    ``padded_edges`` on ≡ 512 (mod 1024) — see ``_nudge_fast_gather_len``.
    """
    return x.at[idx].get(mode="promise_in_bounds")


def _span_agg_fwd(x, w, fspan, bspan):
    acc = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype
    # standalone pure gather (no fused scale): XLA's fast row-gather path;
    # the kernel applies fspan.norm itself
    vals = plan_take(x, fspan.gather_idx)
    out = rel_span_matmul_scatter(vals, fspan, w).astype(acc)
    return out, (x, w, bspan)


def _span_agg_bwd(res, g_out):
    x, w, bspan = res
    # cast BEFORE the gather: the convert then runs on the [N, d_out]
    # table instead of the [E, d_out] stream (~100x fewer elements)
    t = plan_take(g_out.astype(w.dtype), bspan.gather_idx)
    dx, dw = rel_span_backward_scatter(t, bspan, x, w)
    return dx.astype(x.dtype), dw.astype(w.dtype), None, None


span_aggregate.defvjp(_span_agg_fwd, _span_agg_bwd)


def stack_spans(spans: list[RelSpanEdges]) -> RelSpanEdges:
    """Stack per-shard plans into one with a leading shard axis.

    All plans must share (num_segments, num_slots, bucket_rows, chunk,
    kspan) — true for halo shards, which all own ``n_per`` rows. Shards
    with fewer chunks get dead trailing edge rows (norm 0) and zero
    ``rbase`` padding; the kernels' ``base < e_hi`` guard skips them.
    Inside ``shard_map`` use :func:`shard_span` to strip the axis back off.
    """
    s0 = spans[0]
    for sp in spans[1:]:
        assert (sp.num_segments, sp.num_slots, sp.bucket_rows, sp.chunk,
                sp.kspan, sp.shift) == (s0.num_segments, s0.num_slots,
                                        s0.bucket_rows, s0.chunk, s0.kspan,
                                        s0.shift), "shard plans disagree"
    e_max = max(sp.padded_edges for sp in spans)
    mc_max = max(sp.max_chunks for sp in spans)
    nb = len(np.asarray(s0.offsets)) - 1
    pad_code = np.int32(s0.num_segments << s0.shift)

    def pad_edges(sp, arr, fill):
        a = np.asarray(arr)
        if len(a) < e_max:
            a = np.concatenate([a, np.full(e_max - len(a), fill, a.dtype)])
        return a

    def pad_cols(sp, arr, fill):
        # code/norm are tile-packed [Ep/chunk*8, 128]; dead trailing rows
        # are never computed on (base < e_hi guard), values just need
        # validity
        a = np.asarray(arr)
        rows = e_max // s0.chunk * 8
        if a.shape[0] < rows:
            a = np.concatenate(
                [a, np.full((rows - a.shape[0], 128), fill, a.dtype)])
        return a

    g = np.stack([pad_edges(sp, sp.gather_idx, 0) for sp in spans])
    c = np.stack([pad_cols(sp, sp.code, pad_code) for sp in spans])
    nrm = np.stack([pad_cols(sp, sp.norm, 0.0) for sp in spans])
    offs = np.stack([np.asarray(sp.offsets) for sp in spans])
    rb = np.stack([
        np.pad(np.asarray(sp.rbase).reshape(nb, sp.max_chunks),
               ((0, 0), (0, mc_max - sp.max_chunks))).reshape(-1)
        for sp in spans])
    return RelSpanEdges(
        gather_idx=g, code=c, norm=nrm, offsets=offs, rbase=rb,
        num_segments=s0.num_segments, num_slots=s0.num_slots,
        bucket_rows=s0.bucket_rows, chunk=s0.chunk, max_chunks=mc_max,
        kspan=s0.kspan, shift=s0.shift, padded_edges=e_max)


def shard_span(span: RelSpanEdges) -> RelSpanEdges:
    """Strip the length-1 shard axis off a stacked plan (inside shard_map)."""
    return span._replace(gather_idx=span.gather_idx[0], code=span.code[0],
                         norm=span.norm[0], offsets=span.offsets[0],
                         rbase=span.rbase[0])
