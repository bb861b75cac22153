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

def _fwd_kernel(offs_ref, code_ref, vals_ref, w_ref, e_ref, g_ref,
                out_ref, *, s: int, chunk: int, slots: int, d_out: int,
                shift: int):
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
        # matrices) stay small. All heavy selection work rides the MXU in
        # a few LARGE matmuls (tiny per-relation dots starve the MXU):
        #   P = vals @ Wf           [sub, R*d_out]  every relation's output
        #   X = relhot @ E          [sub, R*d_out]  d_out-expanded rel mask
        #   msg = (P * X) @ G       [sub, d_out]    pick own relation + fold
        #   out += keyhot^T @ msg   [s, d_out]      write-once scatter
        sub = min(chunk, 512)
        dtype = vals_ref.dtype
        # Mosaic requires 32-bit matmul accumulators ('tpu.matmul' acc rule),
        # so every dot accumulates f32; the [sub, R*d_out] intermediates are
        # cast back to the compute dtype between dots to keep the kernel's
        # VMEM-bandwidth bound low in bf16. The cross-chunk out_ref stays f32.
        for q in range(chunk // sub):
            @pl.when(jnp.logical_and(base + q * sub < e_hi,
                                     base + (q + 1) * sub > e_lo))
            def _(q=q):
                sl = pl.ds(q * sub, sub)
                vals = vals_ref[sl, :]                        # [sub, d_in]
                code = code_ref[sl, 0][:, None]               # [sub, 1]
                rel = jnp.bitwise_and(code, (1 << shift) - 1)
                rcol = jax.lax.broadcasted_iota(jnp.int32, (sub, slots), 1)
                relhot = (rel == rcol).astype(dtype)          # [sub, slots]
                p_all = jax.lax.dot(vals, w_ref[:],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype)
                relexp = jax.lax.dot(relhot, e_ref[:],
                                     preferred_element_type=jnp.float32
                                     ).astype(dtype)
                msg = jax.lax.dot((p_all * relexp).astype(dtype), g_ref[:],
                                  preferred_element_type=jnp.float32
                                  ).astype(dtype)             # [sub, d_out]
                # scatter: rows outside [e_lo, e_hi) have keys outside this
                # bucket (keys sorted + exact offsets) -> one-hot zeroes them
                local = jax.lax.shift_right_logical(code, shift) - j * s
                scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
                keyhot = (local == scol).astype(dtype)        # [sub, s]
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
    # key and rel packed into ONE int32 stream (the [chunk, 1] int blocks
    # are lane-padded to 128 in VMEM, so every extra stream costs ~1 MB of
    # double-buffered VMEM and a DMA channel)
    shift = max(1, int(np.ceil(np.log2(max(slots, 2)))))
    assert (plan.num_segments << shift) < 2**31
    code = (keys.astype(jnp.int32) << shift) | rel.astype(jnp.int32)
    # flat weight layout Wf[i, r*d_out+o] = w[r, i, o]; the q-expansion
    # one-hot E[r, q] = 1[q // d_out == r] and fold matrix G[q, o] =
    # 1[q % d_out == o] are tiny static 0/1 operands kept in VMEM so the
    # per-edge relation selection runs on the MXU, not the VPU
    rq = slots * d_out
    w_flat = jnp.transpose(w, (1, 0, 2)).reshape(d_in, rq).astype(vals.dtype)
    qs = np.arange(rq, dtype=np.int64)
    e_mat = jnp.asarray((qs[None, :] // d_out == np.arange(slots)[:, None]
                         ).astype(np.float32)).astype(vals.dtype)
    g_mat = jnp.asarray((qs[:, None] % d_out == np.arange(d_out)[None, :]
                         ).astype(np.float32)).astype(vals.dtype)

    def edge_block(j, ci, offs):
        return (jnp.minimum(offs[j] // chunk + ci, ep // chunk - 1), 0)

    const_block = lambda shape: pl.BlockSpec(shape, lambda j, ci, offs: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_buckets, plan.max_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, d_in), edge_block),
            const_block((d_in, rq)),
            const_block((slots, rq)),
            const_block((rq, d_out)),
        ],
        out_specs=pl.BlockSpec((s, d_out), lambda j, ci, offs: (j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, chunk=chunk, slots=slots,
                          d_out=d_out, shift=shift),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out), jnp.float32),
        grid_spec=grid_spec,
    )(plan.offsets, code.reshape(-1, 1), vals, w_flat, e_mat, g_mat)
    return out[:plan.num_segments]


# -- backward: dx[src] += t_e @ W[rel_e]^T ; dW[rel_e] += x[src_e]^T t_e ------

def _bwd_kernel(offs_ref, code_ref, t_ref, x_ref, w_ref, e_ref,
                tt_ref, dx_ref, dw_ref, *, s: int, chunk: int, slots: int,
                d_out: int, shift: int):
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
        # the expanded mask M[e, r*d_out+o] = 1[rel_e == r] * t_e[o] feeds
        # BOTH gradients through large MXU contractions:
        #   dmsg = M @ Wf^T-flat    [sub, d_in]      (per-edge t @ W[rel]^T)
        #   dW  += M^T @ xs         [R*d_out, d_in]  (per-relation outer)
        #   dx  += srchot^T @ dmsg  [s, d_in]        (write-once scatter)
        # M itself is built by two MXU expansions (relhot @ E, t @ T), so
        # the VPU only pays one [sub, R*d_out] elementwise multiply.
        sub = min(chunk, 512)
        dtype = t_ref.dtype
        # see _fwd_kernel: every dot accumulates f32 (Mosaic's 32-bit matmul
        # acc rule); the [sub, R*d_out] intermediates are cast back to the
        # compute dtype between dots, and dW/dx accumulate f32 via out_ref
        for q in range(chunk // sub):
            @pl.when(jnp.logical_and(base + q * sub < e_hi,
                                     base + (q + 1) * sub > e_lo))
            def _(q=q):
                sl = pl.ds(q * sub, sub)
                t = t_ref[sl, :]                              # [sub, d_out]
                code = code_ref[sl, 0][:, None]               # [sub, 1]
                rel = jnp.bitwise_and(code, (1 << shift) - 1)
                rcol = jax.lax.broadcasted_iota(jnp.int32, (sub, slots), 1)
                relhot = (rel == rcol).astype(dtype)          # [sub, slots]
                # src one-hot: out-of-bucket rows (sorted keys, exact
                # offsets) and padding rows (t = 0 via norm) self-mask
                local = jax.lax.shift_right_logical(code, shift) - j * s
                scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
                srchot = (local == scol).astype(dtype)        # [sub, s]
                xs = jax.lax.dot(srchot, x_ref[:],
                                 preferred_element_type=jnp.float32)
                xs = xs.astype(dtype)                         # [sub, d_in]
                relexp = jax.lax.dot(relhot, e_ref[:],
                                     preferred_element_type=jnp.float32
                                     ).astype(dtype)
                texp = jax.lax.dot(t, tt_ref[:],
                                   preferred_element_type=jnp.float32
                                   ).astype(dtype)
                m_exp = (relexp * texp).astype(dtype)         # [sub, R*d_out]
                dmsg = jax.lax.dot(m_exp, w_ref[:],
                                   preferred_element_type=jnp.float32)
                dw_ref[:] += jax.lax.dot_general(
                    m_exp, xs, dimension_numbers=(((0,), (0,)), ((), ())),
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
    shift = max(1, int(np.ceil(np.log2(max(slots, 2)))))
    assert (plan.num_segments << shift) < 2**31
    code = (keys.astype(jnp.int32) << shift) | rel.astype(jnp.int32)
    # flat layout: row q = (rel q // d_out, out-dim q % d_out); Wf[q, i] =
    # w[r, i, o]. E and T are the static 0/1 expansion operands (see kernel)
    rq = slots * d_out
    w_flat = jnp.transpose(w, (0, 2, 1)).reshape(rq, d_in).astype(t.dtype)
    qs = np.arange(rq, dtype=np.int64)
    e_mat = jnp.asarray((qs[None, :] // d_out == np.arange(slots)[:, None]
                         ).astype(np.float32)).astype(t.dtype)
    t_mat = jnp.asarray((qs[None, :] % d_out == np.arange(d_out)[:, None]
                         ).astype(np.float32)).astype(t.dtype)

    def edge_block(j, ci, offs):
        return (jnp.minimum(offs[j] // chunk + ci, ep // chunk - 1), 0)

    const_block = lambda shape: pl.BlockSpec(shape, lambda j, ci, offs: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_buckets, plan.max_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, d_out), edge_block),
            pl.BlockSpec((s, d_in), lambda j, ci, offs: (j, 0)),
            const_block((rq, d_in)),
            const_block((slots, rq)),
            const_block((d_out, rq)),
        ],
        out_specs=[
            pl.BlockSpec((s, d_in), lambda j, ci, offs: (j, 0)),
            const_block((rq, d_in)),
        ],
    )
    dx, dw_flat = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, chunk=chunk, slots=slots,
                          d_out=d_out, shift=shift),
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, d_in), jnp.float32),
            jax.ShapeDtypeStruct((rq, d_in), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(plan.offsets, code.reshape(-1, 1), t, x_pad, w_flat, e_mat, t_mat)
    dw = jnp.transpose(dw_flat.reshape(slots, d_out, d_in), (0, 2, 1))
    return dx[:plan.num_segments], dw
