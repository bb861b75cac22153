"""Fused Pallas kernels: per-edge relational transform + sorted scatter.

These collapse the R-GCN conv's per-edge pipeline (gather -> per-relation
matmul -> norm scale -> segment reduce) into ONE kernel per direction, so
every [E, d]-sized intermediate that the multi-pass formulation round-trips
through HBM (the ragged-matmul output, the permutation gathers, the dW
outer-product stream) disappears. The reference performs the same math as
R separate masked scatter passes inside PyG ``RGCNConv``
(model/layers.py:21-23; SURVEY.md L0).

Shared structure (both kernels):
- Edges are pre-sorted by the OUTPUT key (dst for forward, src for
  backward), bucketed by :func:`segment_kernels.plan_segmented_reduce`.
  TPU grids run sequentially, so each [S, d] output tile is written once.
- The full relation-weight stack lives in VMEM (it is tiny: [R, in, out]),
  so per-edge weight selection becomes d_out unrolled masked one-hot
  matmuls on the MXU: ``M_o = onehot(rel) * t[:, o]`` then ``M_o @ W[..o]``
  — no data-dependent control flow, no gather.
- Scatter-add is the segment-kernels one-hot trick: ``onehot(key)^T @ msg``
  accumulated into the VMEM-resident output tile.

Cost model: the one-hot weight selection does ``R x`` more MXU work per
edge than a ragged matmul, but the MXU has orders-of-magnitude headroom
over HBM at these shapes, and it buys the removal of 3-4 full passes over
[E, d] arrays plus a [E, d] permutation gather (measured: each such pass
costs 12-50 ms at E=4M on v5e — more than the entire fused kernel).

Numerics: inputs may be bf16 (mixed precision); every accumulation
(per-chunk MXU dots, cross-chunk output tiles) is float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scaling_rgcn_training_tpu.ops.segment_kernels import SegmentPlan

import os as _os

_DEF_CHUNK = int(_os.environ.get("RGCN_FUSED_CHUNK", 1024))
_DEF_BUCKET_ROWS = int(_os.environ.get("RGCN_FUSED_BUCKET_ROWS", 512))
# above this many weight bytes the VMEM-resident stack no longer pays off
_MAX_W_BYTES = int(_os.environ.get("RGCN_FUSED_MAX_W_BYTES", 6 << 20))


def fused_ok(num_slots: int, d_in: int, d_out: int, itemsize: int = 4) -> bool:
    """Whether the fused kernels' VMEM-resident weight stack fits."""
    return num_slots * d_in * d_out * itemsize <= _MAX_W_BYTES


def _pad_rows(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    if a.shape[0] == rows:
        return a
    return jnp.pad(a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


# -- forward: msg_e = vals_e @ W[rel_e]; out[key_e] += msg_e ------------------

def _fwd_kernel(offs_ref, rel_ref, keys_ref, vals_ref, w_ref, out_ref, *,
                s: int, chunk: int, slots: int, d_out: int):
    j = pl.program_id(0)
    ci = pl.program_id(1)
    e_lo = offs_ref[j]
    e_hi = offs_ref[j + 1]
    base = (e_lo // chunk + ci) * chunk

    @pl.when(ci == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_and(base < e_hi, e_lo < e_hi))
    def _():
        # sub-chunked: DMA blocks stay fat, VMEM intermediates (the one-hot
        # matrices) stay small
        sub = min(chunk, 512)
        dtype = vals_ref.dtype
        for q in range(chunk // sub):
            sl = pl.ds(q * sub, sub)
            vals = vals_ref[sl, :]                            # [sub, d_in]
            rel = rel_ref[sl, 0]
            rcol = jax.lax.broadcasted_iota(jnp.int32, (sub, slots), 1)
            relhot = (rel[:, None] == rcol).astype(jnp.float32)  # [sub, slots]
            # per output dim: project vals against EVERY relation's column
            # o, then the relation one-hot row-sum picks each edge's own
            cols = []
            for o in range(d_out):
                p_o = jax.lax.dot(vals, w_ref[o],
                                  preferred_element_type=jnp.float32)
                cols.append(jnp.sum(p_o * relhot, axis=1, keepdims=True))
            msg = jnp.concatenate(cols, axis=1).astype(dtype)  # [sub, d_out]
            # scatter: rows outside [e_lo, e_hi) have keys outside this
            # bucket (keys sorted + exact offsets) -> one-hot zeroes them
            local = keys_ref[sl, 0][:, None] - j * s
            scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
            keyhot = (local == scol).astype(dtype)            # [sub, s]
            out_ref[:] += jax.lax.dot_general(
                keyhot, msg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def rel_matmul_scatter(vals: jnp.ndarray, rel: jnp.ndarray,
                       keys: jnp.ndarray, plan: SegmentPlan,
                       w: jnp.ndarray) -> jnp.ndarray:
    """``out[k] = sum_{e: key_e = k} vals_e @ w[rel_e]`` for sorted keys.

    vals ``[E, d_in]`` (pre-scaled by the mean-norm; padding rows zero),
    rel/keys ``[E]`` int32 in the same (key-sorted) order, ``w [slots,
    d_in, d_out]`` -> ``[M, d_out]`` float32.
    """
    e, d_in = vals.shape
    slots, _, d_out = w.shape
    s, chunk = plan.bucket_rows, plan.chunk
    m_pad = -(-plan.num_segments // s) * s
    num_buckets = m_pad // s
    ep = plan.padded_edges
    vals = _pad_rows(vals, ep)
    if rel.shape[0] != ep:
        rel = jnp.pad(rel, (0, ep - rel.shape[0]))
        keys = jnp.pad(keys, (0, ep - keys.shape[0]),
                       constant_values=np.int32(plan.num_segments))
    # o-major weight layout: w_oi[o] = [d_in, slots] slab for output dim o
    w_oi = jnp.transpose(w, (2, 1, 0)).astype(vals.dtype)

    def edge_block(j, ci, offs):
        return (jnp.minimum(offs[j] // chunk + ci, ep // chunk - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_buckets, plan.max_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, d_in), edge_block),
            pl.BlockSpec((d_out, d_in, slots), lambda j, ci, offs: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((s, d_out), lambda j, ci, offs: (j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, chunk=chunk, slots=slots,
                          d_out=d_out),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out), jnp.float32),
        grid_spec=grid_spec,
    )(plan.offsets, rel.reshape(-1, 1), keys.reshape(-1, 1), vals, w_oi)
    return out[:plan.num_segments]


# -- backward: dx[src] += t_e @ W[rel_e]^T ; dW[rel_e] += x[src_e]^T t_e ------

def _bwd_kernel(offs_ref, rel_ref, keys_ref, t_ref, x_ref, w_ref,
                dx_ref, dw_ref, *, s: int, chunk: int, slots: int,
                d_out: int):
    j = pl.program_id(0)
    ci = pl.program_id(1)
    e_lo = offs_ref[j]
    e_hi = offs_ref[j + 1]
    base = (e_lo // chunk + ci) * chunk

    @pl.when(ci == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(jnp.logical_and(j == 0, ci == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(jnp.logical_and(base < e_hi, e_lo < e_hi))
    def _():
        sub = min(chunk, 512)
        dtype = t_ref.dtype
        for q in range(chunk // sub):
            sl = pl.ds(q * sub, sub)
            t = t_ref[sl, :]                                  # [sub, d_out]
            rel = rel_ref[sl, 0]
            rcol = jax.lax.broadcasted_iota(jnp.int32, (sub, slots), 1)
            relhot = (rel[:, None] == rcol).astype(dtype)     # [sub, slots]
            # src one-hot: out-of-bucket rows (sorted keys, exact offsets)
            # and padding rows (t = 0 via norm) self-mask
            local = keys_ref[sl, 0][:, None] - j * s
            scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
            srchot = (local == scol).astype(dtype)            # [sub, s]
            xs = jax.lax.dot(srchot, x_ref[:],
                             preferred_element_type=jnp.float32)
            xs = xs.astype(dtype)                             # [sub, d_in]
            dmsg = None
            for o in range(d_out):
                m_o = relhot * t[:, o][:, None]               # [sub, slots]
                d_o = jax.lax.dot(m_o, w_ref[o],
                                  preferred_element_type=jnp.float32)
                dmsg = d_o if dmsg is None else dmsg + d_o    # [sub, d_in]
                dw_ref[o] += jax.lax.dot_general(
                    m_o, xs, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dw_ref.dtype)
            dx_ref[:] += jax.lax.dot_general(
                srchot, dmsg.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def rel_backward_scatter(t: jnp.ndarray, rel: jnp.ndarray, keys: jnp.ndarray,
                         plan: SegmentPlan, x: jnp.ndarray,
                         w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both aggregation gradients in one pass over (src-sorted) edges.

    ``t [E, d_out]`` = ``norm_e * g_out[dst_e]`` in src-sorted order (padding
    rows zero), ``rel/keys [E]`` int32 in that order (keys = src), ``x [N,
    d_in]`` node features, ``w [slots, d_in, d_out]``. Returns ``dx [N,
    d_in]`` f32 and ``dw [slots, d_in, d_out]`` f32.
    """
    e, d_out = t.shape
    slots, d_in, _ = w.shape
    s, chunk = plan.bucket_rows, plan.chunk
    m_pad = -(-plan.num_segments // s) * s
    num_buckets = m_pad // s
    ep = plan.padded_edges
    t = _pad_rows(t, ep)
    if rel.shape[0] != ep:
        rel = jnp.pad(rel, (0, ep - rel.shape[0]))
        keys = jnp.pad(keys, (0, ep - keys.shape[0]),
                       constant_values=np.int32(plan.num_segments))
    x_pad = _pad_rows(x.astype(t.dtype), m_pad)
    # o-major: w_oi[o] = [slots, d_in] slab (t @ W^T selects rows by rel)
    w_oi = jnp.transpose(w, (2, 0, 1)).astype(t.dtype)

    def edge_block(j, ci, offs):
        return (jnp.minimum(offs[j] // chunk + ci, ep // chunk - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_buckets, plan.max_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, d_out), edge_block),
            pl.BlockSpec((s, d_in), lambda j, ci, offs: (j, 0)),
            pl.BlockSpec((d_out, slots, d_in), lambda j, ci, offs: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, d_in), lambda j, ci, offs: (j, 0)),
            pl.BlockSpec((d_out, slots, d_in), lambda j, ci, offs: (0, 0, 0)),
        ],
    )
    dx, dw_oi = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, chunk=chunk, slots=slots,
                          d_out=d_out),
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, d_in), jnp.float32),
            jax.ShapeDtypeStruct((d_out, slots, d_in), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(plan.offsets, rel.reshape(-1, 1), keys.reshape(-1, 1), t, x_pad, w_oi)
    return dx[:plan.num_segments], jnp.transpose(dw_oi, (1, 2, 0))
