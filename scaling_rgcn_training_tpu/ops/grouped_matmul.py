"""Grouped (ragged) matrix multiply: the per-edge relational transform.

``grouped_matmul(lhs, rhs, group_sizes)`` computes, for rows of ``lhs``
partitioned into ``G`` consecutive groups of sizes ``group_sizes[g]``,

    out[rows of group g] = lhs[rows of group g] @ rhs[g]

with ``lhs: [M, K]``, ``rhs: [G, K, N]``, ``out: [M, N]``. This is the MoE
grouped-matmul shape; on TPU it maps onto the MXU via ``lax.ragged_dot``
(or a Pallas kernel), which is why the framework stores graph edges sorted
by relation: the reference's R-per-relation masked passes inside PyG
``RGCNConv`` (see SURVEY.md L0) collapse into one dense-throughput op whose
FLOP count is proportional to the number of edges, not nodes x relations.

Backends:
- ``"ragged"``  — ``jax.lax.ragged_dot`` (TPU fast path; differentiable).
- ``"gather"``  — per-row weight gather + batched matmul (pure-XLA
  reference; O(M*K*N) FLOPs but materializes ``[M, K, N]``; fine for
  tests/small graphs, and the correctness oracle for the others).
- ``"pallas"``  — hand-written TPU kernel (ops/pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DEFAULT_BACKEND = "ragged"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    assert name in ("ragged", "gather", "pallas")
    _DEFAULT_BACKEND = name


def group_ids_from_sizes(group_sizes: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Row -> group id, from consecutive group sizes (jit-safe, static M)."""
    # boundaries[g] = start row of group g+1; row i belongs to the number of
    # boundaries <= i.
    ends = jnp.cumsum(group_sizes)
    rows = jnp.arange(num_rows, dtype=group_sizes.dtype)
    return jnp.sum(rows[:, None] >= ends[None, :], axis=1).astype(jnp.int32)


def _gather_backend(lhs: jnp.ndarray, rhs: jnp.ndarray, group_sizes: jnp.ndarray) -> jnp.ndarray:
    gid = group_ids_from_sizes(group_sizes, lhs.shape[0])
    w = rhs[gid]  # [M, K, N]
    return jnp.einsum(
        "mk,mkn->mn", lhs, w, preferred_element_type=jnp.float32
    ).astype(lhs.dtype)


def _ragged_backend(lhs: jnp.ndarray, rhs: jnp.ndarray, group_sizes: jnp.ndarray) -> jnp.ndarray:
    return lax.ragged_dot(
        lhs, rhs, group_sizes, preferred_element_type=jnp.float32
    ).astype(lhs.dtype)


def _pallas_backend(lhs, rhs, group_sizes, static_offsets=None) -> jnp.ndarray:
    from scaling_rgcn_training_tpu.ops import pallas_kernels

    return pallas_kernels.grouped_matmul_pallas(lhs, rhs, group_sizes,
                                                static_offsets)


def grouped_matmul(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    group_sizes: jnp.ndarray,
    backend: str | None = None,
    static_offsets: tuple | None = None,
) -> jnp.ndarray:
    """out[i] = lhs[i] @ rhs[group_of(i)] with consecutive groups.

    Rows beyond ``sum(group_sizes)`` (if any) are zeroed by construction at
    the call sites (padding edges carry a zero norm coefficient), so their
    value here is irrelevant.

    ``static_offsets`` (host-known per-graph group offsets, e.g.
    ``RelEdges.group_offsets``) lets the Pallas backend precompute each row
    tile's intersecting-group range instead of scanning all G groups.
    """
    backend = backend or _DEFAULT_BACKEND
    if backend == "ragged":
        return _ragged_backend(lhs, rhs, group_sizes)
    if backend == "gather":
        return _gather_backend(lhs, rhs, group_sizes)
    if backend == "pallas":
        return _pallas_backend(lhs, rhs, group_sizes, static_offsets)
    raise ValueError(f"unknown grouped_matmul backend: {backend}")
