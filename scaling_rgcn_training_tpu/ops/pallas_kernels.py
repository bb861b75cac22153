"""Pallas TPU kernels for the grouped (per-relation) matmul.

``grouped_matmul_pallas(lhs, rhs, group_sizes)``: rows of ``lhs`` are
relation-contiguous (edges sorted by relation); ``rhs[g]`` is relation g's
weight. The kernel tiles rows (TM), keeps the whole ``rhs`` stack resident
in VMEM (relation weights are small: G x K x N ~ 1 MB), prefetches group
offsets into SMEM, and per row-tile runs ONLY the matmuls of groups that
intersect the tile (predicated with ``pl.when`` — sorted rows mean a tile
intersects ~1-2 groups on average). Accumulation in fp32 on the MXU.

A custom VJP supplies both gradients as Pallas kernels:
- d_lhs: same kernel shape with ``rhs`` transposed per group;
- d_rhs: per-tile ``lhs_tile^T @ g_tile`` masked per intersecting group,
  accumulated across the (sequential on TPU) grid into the [G, K, N] output.

TPU grids execute sequentially on a core, which makes the d_rhs
accumulation race-free by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _offsets_from_sizes(group_sizes: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros((1,), group_sizes.dtype)
    return jnp.concatenate([z, jnp.cumsum(group_sizes)]).astype(jnp.int32)


# -- forward ----------------------------------------------------------------

def _tile_group_ranges(static_offsets, m_pad: int, tm: int):
    """Host-side: for each row tile, the [first, last) groups intersecting
    it (group offsets are static per graph, so this costs nothing at run
    time). Sorted rows mean a tile intersects ~1-2 groups on average —
    without this, every tile pays a full scan over all G groups."""
    offs = np.asarray(static_offsets, np.int64)
    starts = np.arange(m_pad // tm, dtype=np.int64) * tm
    g_lo = np.maximum(np.searchsorted(offs, starts, side="right") - 1, 0)
    g_hi = np.searchsorted(offs, starts + tm, side="left")
    g_hi = np.minimum(np.maximum(g_hi, g_lo + 1), len(offs) - 1)
    return (jnp.asarray(g_lo.astype(np.int32)),
            jnp.asarray(g_hi.astype(np.int32)))


def _fwd_kernel(glo_ref, ghi_ref, offs_ref, lhs_ref, rhs_ref, out_ref, *,
                tm: int):
    i = pl.program_id(0)
    row0 = i * tm
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(g, _):
        g_lo = offs_ref[g]
        g_hi = offs_ref[g + 1]

        @pl.when(jnp.logical_and(g_hi > row0, g_lo < row0 + tm))
        def _():
            mask = jnp.logical_and(rows >= g_lo, rows < g_hi)
            masked = jnp.where(mask, lhs_ref[:], 0.0)
            out_ref[:] += jnp.dot(masked, rhs_ref[g],
                                  preferred_element_type=jnp.float32
                                  ).astype(out_ref.dtype)

        return 0

    # only the groups this tile intersects (dynamic bounds -> while loop)
    jax.lax.fori_loop(glo_ref[i], ghi_ref[i], body, 0)


def _fwd(lhs: jnp.ndarray, rhs: jnp.ndarray, group_sizes: jnp.ndarray,
         tm: int = 2048, static_offsets=None) -> jnp.ndarray:
    m, k = lhs.shape
    g, _, n = rhs.shape
    m_pad = _round_up(m, tm)
    lhs_p = jnp.pad(lhs, ((0, m_pad - m), (0, 0))) if m_pad != m else lhs
    offs = _offsets_from_sizes(group_sizes)
    if static_offsets is not None:
        glo, ghi = _tile_group_ranges(static_offsets, m_pad, tm)
    else:  # fall back to scanning every group per tile
        glo = jnp.zeros((m_pad // tm,), jnp.int32)
        ghi = jnp.full((m_pad // tm,), g, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_pad // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, glo, ghi, offs: (i, 0)),
            pl.BlockSpec((g, k, n), lambda i, glo, ghi, offs: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i, glo, ghi, offs: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tm=tm),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), lhs.dtype),
        grid_spec=grid_spec,
    )(glo, ghi, offs, lhs_p, rhs)
    return out[:m] if m_pad != m else out


# -- d_rhs ------------------------------------------------------------------

def _drhs_kernel(glo_ref, ghi_ref, offs_ref, lhs_ref, g_ref, out_ref, *,
                 tm: int):
    i = pl.program_id(0)
    row0 = i * tm
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(g, _):
        g_lo = offs_ref[g]
        g_hi = offs_ref[g + 1]

        @pl.when(jnp.logical_and(g_hi > row0, g_lo < row0 + tm))
        def _():
            mask = jnp.logical_and(rows >= g_lo, rows < g_hi)
            masked = jnp.where(mask, lhs_ref[:], 0.0)
            out_ref[g] += jax.lax.dot_general(
                masked, g_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        return 0

    jax.lax.fori_loop(glo_ref[i], ghi_ref[i], body, 0)


def _drhs(lhs: jnp.ndarray, gout: jnp.ndarray, group_sizes: jnp.ndarray,
          rhs_shape, tm: int = 2048, static_offsets=None) -> jnp.ndarray:
    m, k = lhs.shape
    g, _, n = rhs_shape
    m_pad = _round_up(m, tm)
    if m_pad != m:
        lhs = jnp.pad(lhs, ((0, m_pad - m), (0, 0)))
        gout = jnp.pad(gout, ((0, m_pad - m), (0, 0)))
    offs = _offsets_from_sizes(group_sizes)
    if static_offsets is not None:
        glo, ghi = _tile_group_ranges(static_offsets, m_pad, tm)
    else:
        glo = jnp.zeros((m_pad // tm,), jnp.int32)
        ghi = jnp.full((m_pad // tm,), g, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_pad // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, glo, ghi, offs: (i, 0)),
            pl.BlockSpec((tm, n), lambda i, glo, ghi, offs: (i, 0)),
        ],
        out_specs=pl.BlockSpec((g, k, n), lambda i, glo, ghi, offs: (0, 0, 0)),
    )
    # low-precision inputs accumulate into an f32 output (the per-tile MXU
    # dot already prefers f32; this keeps the cross-tile += exact too)
    out_dtype = (jnp.float32 if lhs.dtype in (jnp.bfloat16, jnp.float16)
                 else lhs.dtype)
    return pl.pallas_call(
        functools.partial(_drhs_kernel, tm=tm),
        out_shape=jax.ShapeDtypeStruct((g, k, n), out_dtype),
        grid_spec=grid_spec,
    )(glo, ghi, offs, lhs, gout.astype(lhs.dtype))


# -- public op with custom VJP ----------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def grouped_matmul_pallas(lhs: jnp.ndarray, rhs: jnp.ndarray,
                          group_sizes: jnp.ndarray,
                          static_offsets=None) -> jnp.ndarray:
    return _fwd(lhs, rhs, group_sizes, static_offsets=static_offsets)


def _gmm_fwd(lhs, rhs, group_sizes, static_offsets):
    return (_fwd(lhs, rhs, group_sizes, static_offsets=static_offsets),
            (lhs, rhs, group_sizes))


def _gmm_bwd(static_offsets, res, g):
    lhs, rhs, group_sizes = res
    d_lhs = _fwd(g.astype(lhs.dtype), jnp.swapaxes(rhs, 1, 2), group_sizes,
                 static_offsets=static_offsets)
    d_rhs = _drhs(lhs, g, group_sizes, rhs.shape,
                  static_offsets=static_offsets).astype(rhs.dtype)
    return d_lhs, d_rhs, None


grouped_matmul_pallas.defvjp(_gmm_fwd, _gmm_bwd)
