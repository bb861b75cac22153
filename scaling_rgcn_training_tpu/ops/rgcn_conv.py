"""The per-relation sparse graph convolution (R-GCN message passing).

Reproduces the math of PyG ``RGCNConv`` exactly as the reference uses it
(model/layers.py:15-16,21-23 with ``num_bases=None``, ``num_blocks=None``,
default ``aggr='mean'``, ``root_weight=True``, ``bias=True``):

    out_i = x_i @ root + bias + sum_r ( mean_{j in N_r(i)} x_j ) @ weight[r]

where ``N_r(i)`` are sources of edges of relation ``r`` arriving at ``i``.

TPU-native design (none of this mirrors PyG's implementation). Everything
is static-shaped and driven by a measured performance model of the chip:

- HBM traffic is the bottleneck; the MXU is effectively free at these
  operand sizes (v5e measured: 200 GB/s streaming vs 58 TFLOP/s f32).
- XLA gathers stream from HBM fine at any table size; XLA scatters fall
  off an ~80x cliff once the target table exceeds VMEM (measured:
  [1M,16] rows into 3 MB table = 1.4 ms, into 131 MB table = 112 ms).

Hence:
- Edges are preprocessed ONCE per graph into :class:`RelEdges`: sorted by
  (relation, dst), padded to a static size, with the per-edge
  ``1/deg_r(dst)`` mean coefficient precomputed (pads carry ``norm=0``).
- The forward picks its dataflow by traffic (``_edge_traffic_mode``):
  * ``prematmul`` — transform-first. ``Z[r] = X @ W[r]`` on the MXU, then
    per-edge gather from Z + scatter on the NARROW d_out side only.
  * ``edge`` — gather x[src] -> one grouped matmul over the
    relation-contiguous rows (``lax.ragged_dot`` or the Pallas kernel)
    -> scale -> segment-sum. Used when Z would not fit (huge N*R).
- The backward is hand-written (``relational_aggregate``'s custom VJP) so
  that NO scatter ever targets a table larger than VMEM on TPU:
  * small/medium N*R: ONE write-once Pallas segmented reduction
    (ops/segment_kernels.py) of the cotangent messages keyed by the
    precomputed (src, rel)-sorted order into [N, slots, h], followed by
    dense MXU contractions for dx and dw;
  * large N (cotangent table would not fit): per-edge transform back to
    d_in via the grouped matmul, then a src-sorted write-once reduction
    into [N, d_in]; dw via the Pallas grouped outer-product kernel.
  The forward's [N, h] scatter likewise switches to a dst-sorted
  write-once reduction once it would exceed VMEM.
  Off-TPU (CPU/GPU tests), plain XLA scatters are used — no cliff there.
- Basis / block-diagonal decompositions (features the reference's op API
  exposes but leaves disabled) are first-class: weights are stored
  decomposed and materialized to ``[R, in, out]`` on the fly (tiny).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scaling_rgcn_training_tpu.ops.grouped_matmul import grouped_matmul
from scaling_rgcn_training_tpu.ops.segment_kernels import (
    SegmentPlan, plan_segmented_reduce, sorted_segment_sum_pallas)

import os as _os

# scatters into tables beyond this are the slow path (VMEM cliff + init
# traffic); drives forward-mode and backward-strategy selection.
# Env-overridable for measurement/tuning (RGCN_* in bytes / entries).
_SMALL_TABLE_BYTES = int(_os.environ.get("RGCN_SMALL_TABLE_BYTES", 256 << 20))
# cap on N*slots for materializing the [N*slots, h] cotangent in backward
_MAX_COTANGENT_ENTRIES = int(_os.environ.get("RGCN_MAX_COTANGENT_ENTRIES", 8 << 20))
# scatter targets beyond this no longer fit VMEM -> use the Pallas reduction
_VMEM_TABLE_BYTES = int(_os.environ.get("RGCN_VMEM_TABLE_BYTES", 8 << 20))
# minimum d_in for the fused forward. With the relation-banded span
# kernels this is 0 (always fused): measured at E=4M, slots=91 on v5e the
# span kernel runs d64->16 in 3.6ms and d16->8 in 3.4ms, vs ~11ms for the
# edge mode's [E, d_in] gather alone. (The pre-band kernels needed >=32.)
_FUSED_MIN_DIN = int(_os.environ.get("RGCN_FUSED_MIN_DIN", 0))


class RelEdges(NamedTuple):
    """Static-shaped, relation-sorted edge arrays for one graph.

    ``src``/``dst``/``rel``: int32 [E_pad]; ``norm``: float32 [E_pad] (the
    ``1/deg_r(dst)`` mean coefficient, 0 for padding rows); ``group_sizes``:
    int32 [num_slots] edge counts per relation slot (padding rows are
    appended to the final slot, which the reference keeps empty — see
    ``Graph.num_relation_slots``).

    Backward-pass layout (src-major ordering for the write-once Pallas
    reductions): ``bwd_perm`` [E_pad] permutation to (src, rel)-sorted
    order; ``bwd_src`` [E_pad] src values in that order; ``bwd_keys``
    [E_pad] ``src*slots + rel`` keys in that order (None when N*slots is
    too large to materialize the [N*slots, h] cotangent); ``bwd_plan``
    the bucket plan over N*slots segments (or over N segments when
    bwd_keys is None — the large-graph path).

    Static aux: ``num_nodes``, ``group_offsets`` (per-slot edge offsets,
    drives static per-relation slicing).
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    norm: jnp.ndarray
    group_sizes: jnp.ndarray
    rel: jnp.ndarray
    bwd_perm: Optional[jnp.ndarray]
    bwd_src: Optional[jnp.ndarray]
    bwd_keys: Optional[jnp.ndarray]
    bwd_plan: Optional[SegmentPlan]
    dst_perm: Optional[jnp.ndarray]
    dst_sorted: Optional[jnp.ndarray]
    dst_plan: Optional[SegmentPlan]
    num_nodes: int
    group_offsets: tuple = ()
    # relation-banded fused-kernel plans (ops/span_kernels.py): fspan is
    # dst-bucketed (forward), bspan src-bucketed (backward)
    fspan: Optional[object] = None
    bspan: Optional[object] = None


jax.tree_util.register_pytree_node(
    RelEdges,
    lambda e: ((e.src, e.dst, e.norm, e.group_sizes, e.rel,
                e.bwd_perm, e.bwd_src, e.bwd_keys, e.bwd_plan,
                e.dst_perm, e.dst_sorted, e.dst_plan,
                e.fspan, e.bspan),
               (e.num_nodes, e.group_offsets)),
    lambda aux, ch: RelEdges(*ch[:12], num_nodes=aux[0], group_offsets=aux[1],
                             fspan=ch[12], bspan=ch[13]),
)

# SegmentPlan: offsets array is data; the shape/bucket ints are static.
jax.tree_util.register_pytree_node(
    SegmentPlan,
    lambda p: ((p.offsets,),
               (p.num_segments, p.bucket_rows, p.chunk, p.max_chunks, p.padded_edges)),
    lambda aux, ch: SegmentPlan(ch[0], *aux),
)


def build_rel_edges(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_type: np.ndarray,
    num_nodes: int,
    num_slots: int,
    pad_to_multiple: int = 512,
    cache_dir: Optional[str] = None,
) -> RelEdges:
    """Preprocess a raw edge list into the static TPU layout.

    Host-side, runs once per graph. Sorts edges by (relation, dst) —
    relation-contiguity feeds the grouped matmul; dst-sortedness within
    each relation keeps the forward scatter access pattern monotonic.

    ``cache_dir``: persist/load the finished plan on disk keyed by a
    content hash of the inputs (utils/plancache.py) — at AM scale a cold
    build costs minutes, a cache hit seconds.
    """
    from scaling_rgcn_training_tpu.utils.plancache import get_or_build, to_device

    if cache_dir:
        return get_or_build(
            cache_dir, "reledges", (edge_src, edge_dst, edge_type),
            (num_nodes, num_slots, pad_to_multiple),
            lambda: _build_rel_edges_host(edge_src, edge_dst, edge_type,
                                          num_nodes, num_slots,
                                          pad_to_multiple))
    return to_device(_build_rel_edges_host(
        edge_src, edge_dst, edge_type, num_nodes, num_slots, pad_to_multiple))


def _build_rel_edges_host(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_type: np.ndarray,
    num_nodes: int,
    num_slots: int,
    pad_to_multiple: int = 512,
) -> RelEdges:
    """The host-side build: every array leaf is numpy (cacheable without an
    accelerator round trip); ``build_rel_edges`` converts at the boundary."""
    edge_src = np.asarray(edge_src, np.int32)
    edge_dst = np.asarray(edge_dst, np.int32)
    edge_type = np.asarray(edge_type, np.int32)
    e = edge_src.shape[0]

    order = np.lexsort((edge_dst, edge_type))
    src, dst, typ = edge_src[order], edge_dst[order], edge_type[order]

    # per-(dst, relation) in-degree -> mean coefficient per edge
    keys = typ.astype(np.int64) * num_nodes + dst.astype(np.int64)
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    norm = (1.0 / counts[inv]).astype(np.float32)

    group_sizes = np.bincount(typ, minlength=num_slots).astype(np.int32)

    e_pad = max(pad_to_multiple, -(-e // pad_to_multiple) * pad_to_multiple)
    n_pad = e_pad - e
    if n_pad:
        src = np.concatenate([src, np.zeros(n_pad, np.int32)])
        dst = np.concatenate([dst, np.zeros(n_pad, np.int32)])
        norm = np.concatenate([norm, np.zeros(n_pad, np.float32)])
        typ = np.concatenate([typ, np.full(n_pad, num_slots - 1, np.int32)])
        group_sizes[num_slots - 1] += n_pad  # pad rows live in the empty slot

    # backward layout: (src, rel)-sorted order for the per-edge-transform
    # fallback; the reduction segments are the N source nodes.
    perm = np.lexsort((typ, src)).astype(np.int32)
    bwd_perm = perm
    bwd_src = src[perm]
    bwd_plan = plan_segmented_reduce(bwd_src, num_nodes)

    # dst-major layout for the dst-sorted write-once reduction the
    # non-fused forward uses past the VMEM cliff
    dperm = np.argsort(dst, kind="stable").astype(np.int32)
    dst_perm = dperm
    dst_sorted = dst[dperm]
    dst_plan = plan_segmented_reduce(dst[dperm], num_nodes)

    # relation-banded fused-kernel plans: only over REAL edges (the span
    # planner re-pads per chunk itself). The backward uses smaller key
    # buckets: its per-edge [sub, s] one-hot dots write d_in<=64 lanes, so
    # MXU time scales with s (measured on v5e: L2 bwd 24ms at s=512).
    from scaling_rgcn_training_tpu.ops.span_kernels import plan_rel_span

    real = norm > 0
    # fwd buckets default to 384 rows (r5 chip sweep: s=512/448/384/320 ->
    # 69.4/69.2/69.0/70.1 ms — the scatter one-hot narrows while the band
    # window stays above the chunk). On many-relation graphs the window
    # shrinks below the chunk and padding explodes (AM-like 267 slots:
    # 1.51x at 384 vs 1.13x at 512) — fall back to 512 when padding runs
    # past 1.10x the real edge count.
    fwd_s_env = int(_os.environ.get("RGCN_SPAN_FWD_S", 0))
    fwd_chunk = int(_os.environ.get("RGCN_SPAN_FWD_CHUNK", 0))
    n_real = int(real.sum())
    fspan = plan_rel_span(src[real], dst[real], typ[real], norm[real],
                          num_nodes, num_slots,
                          bucket_rows=fwd_s_env or 384, chunk=fwd_chunk)
    if not fwd_s_env and fspan.padded_edges > 1.10 * max(n_real, 1):
        fspan = plan_rel_span(src[real], dst[real], typ[real], norm[real],
                              num_nodes, num_slots, bucket_rows=512,
                              chunk=fwd_chunk)
    # bwd buckets default to 224 rows: the [sub, s] scatter one-hot cost
    # scales with s while padding scales inversely (band windows shrink
    # with the bucket). The r5 chip sweep at the bench shape:
    # s=512/256/224/192/160/128 -> step 72+/70.0/69.4/69.4/70.6/79.0 ms,
    # and s=224 also has the LEAST padding (1.032x vs 256's 1.050x).
    # BUT small buckets multiply (bucket, relation-band) cells, and on
    # many-relation graphs the chunk padding explodes (measured: AM shape,
    # 267 slots, s=256 blew HBM by 6 GB) - so fall back to 512 when the
    # padded size runs away from fspan's.
    bwd_s_env = int(_os.environ.get("RGCN_SPAN_BWD_S", 0))
    bwd_k = int(_os.environ.get("RGCN_SPAN_BWD_K", 0))
    bwd_chunk = int(_os.environ.get("RGCN_SPAN_BWD_CHUNK", 0))
    bspan = plan_rel_span(dst[real], src[real], typ[real], norm[real],
                          num_nodes, num_slots,
                          bucket_rows=bwd_s_env or 224, kspan=bwd_k,
                          chunk=bwd_chunk)
    if not bwd_s_env and bspan.padded_edges > 1.25 * fspan.padded_edges:
        bspan = plan_rel_span(dst[real], src[real], typ[real], norm[real],
                              num_nodes, num_slots, bucket_rows=512,
                              kspan=bwd_k, chunk=bwd_chunk)

    offsets = tuple(int(v) for v in np.concatenate([[0], np.cumsum(group_sizes)]))
    return RelEdges(
        src=src,
        dst=dst,
        norm=norm,
        group_sizes=group_sizes,
        rel=typ,
        bwd_perm=bwd_perm,
        bwd_src=bwd_src,
        bwd_keys=None,
        bwd_plan=bwd_plan,
        dst_perm=dst_perm,
        dst_sorted=dst_sorted,
        dst_plan=dst_plan,
        num_nodes=int(num_nodes),
        group_offsets=offsets,
        fspan=fspan,
        bspan=bspan,
    )


class RGCNLayerParams(NamedTuple):
    """One R-GCN layer's parameters, optionally decomposed.

    - full:       ``weight [R, in, out]``, ``comp=None``
    - basis:      ``weight [B, in, out]`` (bases), ``comp [R, B]``
    - block-diag: ``weight [R, nb, in/nb, out/nb]``, ``comp=None``
    ``root [in, out]``, ``bias [out]`` always dense (PyG parity: the
    reference reads/writes exactly weight/root/bias per layer when
    transferring, model/modelTrainer.py:28-35).
    """

    weight: jnp.ndarray
    root: jnp.ndarray
    bias: jnp.ndarray
    comp: Optional[jnp.ndarray] = None


def materialize_weight(params: RGCNLayerParams) -> jnp.ndarray:
    """-> dense ``[R, in, out]`` relation weights from any decomposition."""
    w = params.weight
    if params.comp is not None:  # basis decomposition
        return jnp.einsum("rb,bio->rio", params.comp, w, preferred_element_type=jnp.float32).astype(w.dtype)
    if w.ndim == 4:  # block-diagonal [R, nb, i/nb, o/nb] -> [R, in, out]
        r, nb, bi, bo = w.shape
        eye = jnp.eye(nb, dtype=w.dtype)
        # place block b on the diagonal: out[r, b*bi:(b+1)*bi, b*bo:(b+1)*bo] = w[r, b]
        dense = jnp.einsum("rbio,bc->rbico", w, eye)
        return dense.reshape(r, nb * bi, nb * bo)
    return w


def init_rgcn_layer(
    key: jax.Array,
    num_slots: int,
    in_dim: int,
    out_dim: int,
    num_bases: Optional[int] = None,
    num_blocks: Optional[int] = None,
    dtype=jnp.float32,
) -> RGCNLayerParams:
    """Initialization matching the reference's distributions.

    - relation weights: torch ``kaiming_uniform_(mode='fan_in')`` applied to
      the ``[R, in, out]`` tensor (model/layers.py:17-18): bound
      ``sqrt(6 / (in * out))`` (torch's fan_in for a 3D tensor is
      ``size(1) * prod(size()[2:])``).
    - root: PyG glorot, bound ``sqrt(6 / (in + out))``.
    - bias: zeros (PyG default).
    """
    k_w, k_r, k_c = jax.random.split(key, 3)
    if num_blocks is not None:
        assert in_dim % num_blocks == 0 and out_dim % num_blocks == 0, (
            "block-diagonal decomposition needs in/out divisible by num_blocks"
        )
        w_shape = (num_slots, num_blocks, in_dim // num_blocks, out_dim // num_blocks)
        fan = w_shape[1] * w_shape[2] * w_shape[3]
        comp = None
    elif num_bases is not None:
        w_shape = (num_bases, in_dim, out_dim)
        fan = in_dim * out_dim
        comp = jax.random.uniform(
            k_c, (num_slots, num_bases),
            minval=-np.sqrt(6.0 / (num_slots + num_bases)),
            maxval=np.sqrt(6.0 / (num_slots + num_bases)), dtype=dtype,
        )
    else:
        w_shape = (num_slots, in_dim, out_dim)
        fan = in_dim * out_dim
        comp = None
    bound_w = np.sqrt(6.0 / fan)
    bound_r = np.sqrt(6.0 / (in_dim + out_dim))
    return RGCNLayerParams(
        weight=jax.random.uniform(k_w, w_shape, minval=-bound_w, maxval=bound_w, dtype=dtype),
        root=jax.random.uniform(k_r, (in_dim, out_dim), minval=-bound_r, maxval=bound_r, dtype=dtype),
        bias=jnp.zeros((out_dim,), dtype),
        comp=comp,
    )


def _edge_traffic_mode(num_nodes: int, num_slots: int, num_edges: int,
                       d_in: int, d_out: int) -> str:
    """Pick the forward dataflow by HBM traffic (the measured bottleneck).

    ``prematmul`` moves 4*d_out bytes/edge (fwd gather + bwd gather of the
    cotangent) at the cost of the [R, N, d_out] Z table; ``edge`` moves
    ~2*(d_in + d_out) bytes/edge with no table. Z must also stay well clear
    of the scatter cliff for the backward's per-relation reduction.
    """
    z_bytes = num_nodes * num_slots * d_out * 4
    if d_out < d_in and z_bytes < 2 * num_edges * d_in * 4 and \
            z_bytes < _SMALL_TABLE_BYTES:
        return "prematmul"
    return "edge"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def relational_aggregate(x, w, edges: RelEdges, mode: str = "edge",
                         backend: Optional[str] = None):
    """sum_e norm_e * (x[src_e] @ W[rel_e]) scattered onto dst: [N, d_out].

    The message-passing core with a hand-written backward (see module
    docstring for the dataflow rationale). ``mode``/``backend`` are static.
    """
    return _aggregate_fwd_impl(x, w, edges, mode, backend)


def _acc_dtype(dtype):
    """Aggregation accumulates (and returns) f32 for low-precision inputs."""
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def _aggregate_fwd_impl(x, w, edges: RelEdges, mode, backend):
    n = edges.num_nodes
    d_out = w.shape[2]
    acc = _acc_dtype(x.dtype)
    if mode == "fused":
        # ONE relation-banded kernel: per-edge relational matmul +
        # write-once scatter over dst-bucketed edges; only the [E, d_in]
        # source gather stays in XLA
        from scaling_rgcn_training_tpu.ops.span_kernels import (
            plan_take, rel_span_matmul_scatter)

        span = edges.fspan
        # standalone pure gather; the kernel applies span.norm itself
        # (plan_take: indices are plan-built, skip XLA's OOB clamp select)
        vals = plan_take(x, span.gather_idx)
        return rel_span_matmul_scatter(vals, span, w).astype(acc)
    if mode == "prematmul":
        slots = w.shape[0]
        # ONE flat matmul: [N, d] @ [d, slots*h] -> [N*slots, h] in src-major
        # layout, so the gather key is src*slots + rel (and the backward's
        # (src, rel)-sorted cotangent reduction writes the same layout)
        w_flat = jnp.swapaxes(w, 0, 1).reshape(w.shape[1], slots * d_out)
        z = jnp.dot(x, w_flat, preferred_element_type=jnp.float32
                    ).astype(x.dtype).reshape(n * slots, d_out)
        msg = jnp.take(z, edges.src * slots + edges.rel, axis=0)
    else:
        msg = jnp.take(x, edges.src, axis=0)
        msg = grouped_matmul(msg, w, edges.group_sizes, backend=backend,
                             static_offsets=edges.group_offsets)
    # the norm scale promotes low-precision msg to f32: the d_out-narrow
    # scatter side always accumulates (and returns) f32
    msg = msg * edges.norm[:, None].astype(acc)
    if (edges.dst_plan is not None and jax.default_backend() == "tpu"
            and n * d_out * 4 > _VMEM_TABLE_BYTES):
        msg = jnp.take(msg, edges.dst_perm, axis=0)
        return sorted_segment_sum_pallas(msg, edges.dst_sorted, edges.dst_plan
                                         ).astype(acc)
    return jax.ops.segment_sum(msg, edges.dst, num_segments=n).astype(acc)


def _aggregate_fwd(x, w, edges, mode, backend):
    return _aggregate_fwd_impl(x, w, edges, mode, backend), (x, w, edges)


def _aggregate_bwd(mode, backend, res, g_out):
    x, w, edges = res
    n = edges.num_nodes
    slots, d_in, d_out = w.shape
    on_tpu = jax.default_backend() == "tpu"
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        fused_ok, rel_span_backward_scatter)

    use_fused = on_tpu and edges.bspan is not None and fused_ok(
        slots, d_in, d_out)
    if not use_fused:
        g_msg = jnp.take(g_out, edges.dst, axis=0) * edges.norm[:, None]  # [E, h]

    if not on_tpu:
        # CPU/GPU: XLA scatter has no VMEM cliff; plain formulation
        dmsg = grouped_matmul(g_msg.astype(w.dtype), jnp.swapaxes(w, 1, 2),
                              edges.group_sizes, backend=backend,
                              static_offsets=edges.group_offsets)   # [E, d_in]
        dx = jax.ops.segment_sum(dmsg, edges.src, num_segments=n).astype(x.dtype)
        xs = jnp.take(x, edges.src, axis=0)
        # dw[r] = sum_{e in r} x[src_e]^T g_msg_e — one segment-sum of edge
        # outer products per relation via einsum over the group one-hot
        gid = jnp.repeat(jnp.arange(slots), jnp.asarray(edges.group_sizes),
                         total_repeat_length=g_msg.shape[0])
        dz_pairs = xs[:, :, None] * g_msg[:, None, :]               # [E, d_in, d_out]
        dw = jax.ops.segment_sum(
            dz_pairs.reshape(-1, d_in * d_out), gid, num_segments=slots
        ).reshape(slots, d_in, d_out).astype(w.dtype)
        return dx, dw, None

    if use_fused:
        # ONE relation-banded kernel over src-bucketed edges produces BOTH
        # dx and dW (write-once src buckets; W and the dW accumulator live
        # in VMEM). The only XLA pass is re-gathering the cotangent from
        # the small [N, d_out] table in span order — cheaper than permuting
        # the [E, d_out] message stream.
        from scaling_rgcn_training_tpu.ops.span_kernels import plan_take

        span = edges.bspan
        # cast before the gather: convert [N, d_out] once, not [E, d_out]
        t = plan_take(g_out.astype(w.dtype), span.gather_idx)
        dx, dw = rel_span_backward_scatter(t, span, x, w)
        dx = dx.astype(x.dtype)
        dw = dw.astype(w.dtype)
    else:
        # large-N path: per-edge transform back to d_in, then a write-once
        # src-sorted reduction into [N, d_in]. In mixed precision the
        # d_in-wide intermediates stay low-precision (half the HBM traffic
        # of the two big streams: the permutation gather and x[src]).
        dmsg = grouped_matmul(g_msg.astype(w.dtype), jnp.swapaxes(w, 1, 2),
                              edges.group_sizes, backend=backend,
                              static_offsets=edges.group_offsets)   # [E, d_in]
        dmsg_sorted = jnp.take(dmsg, edges.bwd_perm, axis=0)
        dx = sorted_segment_sum_pallas(dmsg_sorted, edges.bwd_src,
                                       edges.bwd_plan).astype(x.dtype)
        xs = jnp.take(x, edges.src, axis=0)                         # [E, d_in]
        from scaling_rgcn_training_tpu.ops import pallas_kernels

        dw = pallas_kernels._drhs(xs, g_msg, edges.group_sizes,
                                  (slots, d_in, d_out),
                                  static_offsets=edges.group_offsets
                                  ).astype(w.dtype)

    return dx, dw, None


relational_aggregate.defvjp(_aggregate_fwd, _aggregate_bwd)


def rgcn_conv(
    x: jnp.ndarray,
    edges: RelEdges,
    params: RGCNLayerParams,
    backend: str | None = None,
    mode: str = "auto",
    compute_dtype=None,
    aggr: str = "mean",
) -> jnp.ndarray:
    """Apply one R-GCN layer: ``[N, in] -> [N, out]``.

    Jit-safe: everything static-shaped. Padding rows are killed by
    ``norm == 0``, so the extra rows in the final (empty) relation slot
    never contribute.

    ``aggr``: ``"mean"`` (PyG ``RGCNConv`` parity, the default) or
    ``"attention"`` — data-dependent attention over each node's incoming
    edges via the SDDMM -> segment-softmax -> weighted-scatter pipeline
    (ops/sddmm.py ``attention_aggregate``; a capability the reference's
    PyG op does not offer, SURVEY.md §7.5's other op-library half).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): mixed precision — the wide
    per-edge streams (source-feature gathers, grouped matmuls, permutation
    gathers) run in the low dtype, halving the dominant HBM traffic, while
    every reduction (segment sums, MXU accumulation, dw) and the output
    stay float32. Params are stored f32 throughout.

    Dispatch: when ``edges`` is a ``parallel.ShardedRelEdges`` (edge lists
    partitioned over a device mesh), the SPMD path runs instead — models
    never need to know whether they're distributed.
    """
    if type(edges).__name__ in ("ShardedRelEdges", "HaloShardedEdges") \
            and aggr != "mean":
        raise ValueError(
            "aggr='attention' is a single-device mode in this release: the "
            "distributed aggregation paths implement the mean-normalized "
            "conv (their edge coefficients are baked into the static halo/"
            "span plans; attention weights are data-dependent)")
    if type(edges).__name__ == "ShardedRelEdges":
        from scaling_rgcn_training_tpu.parallel import current_mesh, sharded_rgcn_conv

        mesh = current_mesh()
        assert mesh is not None, (
            "rgcn_conv got sharded edges outside a parallel.use_mesh(...) scope")
        return sharded_rgcn_conv(x, edges, params, mesh, backend=backend,
                                 compute_dtype=compute_dtype)
    if type(edges).__name__ == "HaloShardedEdges":
        from scaling_rgcn_training_tpu.parallel import current_mesh, halo_rgcn_conv

        mesh = current_mesh()
        assert mesh is not None, (
            "rgcn_conv got halo-sharded edges outside a parallel.use_mesh(...) scope")
        return halo_rgcn_conv(x, edges, params, mesh, backend=backend,
                              compute_dtype=compute_dtype)

    w = materialize_weight(params)
    if aggr == "attention":
        from scaling_rgcn_training_tpu.ops.sddmm import attention_aggregate

        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            agg = attention_aggregate(x.astype(cd), w.astype(cd),
                                      params.root.astype(cd), edges,
                                      backend=backend)
        else:
            agg = attention_aggregate(x, w, params.root, edges,
                                      backend=backend)
        return agg + x @ params.root + params.bias
    assert aggr == "mean", f"unknown aggr {aggr!r}"
    if mode == "auto":
        from scaling_rgcn_training_tpu.ops.span_kernels import fused_ok

        if (jax.default_backend() == "tpu" and edges.fspan is not None
                and fused_ok(w.shape[0], w.shape[1], w.shape[2])
                and w.shape[1] >= _FUSED_MIN_DIN):
            mode = "fused"
        else:
            mode = _edge_traffic_mode(edges.num_nodes, w.shape[0],
                                      edges.src.shape[0], w.shape[1], w.shape[2])
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        agg = relational_aggregate(x.astype(cd), w.astype(cd), edges, mode,
                                   backend)
    else:
        agg = relational_aggregate(x, w, edges, mode, backend)
    # root/bias term stays f32: it is node-sized (cheap) and carries the
    # residual path's precision
    return agg + x @ params.root + params.bias
