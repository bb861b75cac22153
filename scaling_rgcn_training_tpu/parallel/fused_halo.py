"""ONE-kernel halo step: remote-DMA exchange fused with a gather-free
relational aggregation, consuming tiles per peer.

The shipped halo path (parallel/halo.py) relies on the XLA scheduler to
overlap `lax.all_to_all` with the owner-local aggregation — real (see
OVERLAP_r04.json) but scheduler-dependent, and the halo segment still
joins on ALL peers. This module makes the overlap *structural*
(SURVEY.md §7.6 stretch goal; r3 VERDICT item 5):

- one Pallas kernel issues every inter-chip remote DMA up front
  (ring_halo.py's exchange prologue),
- then aggregates the OWNER-LOCAL edge chunks while boundary rows fly,
- and consumes each peer's received tile as soon as that peer's
  receive semaphore fires (chunks are planned in ring-arrival order;
  the kernel waits per peer, not on all).

Gather-free dataflow: no `x[src]` row gather exists at all. Node rows
(x_own ++ received tiles) live in ONE VMEM buffer; each edge chunk is
planned against a single `tile_rows`-row READ BLOCK and a single
`tile_rows`-row OUTPUT BUCKET, so the kernel reads rows with an aligned
dynamic slice + src one-hot (MXU), and scatter-adds through a dst
one-hot into the VMEM-resident [n_per, d_out] accumulator — the same
one-hot mechanics as ops/span_kernels.py, re-bucketed for locality in
both directions.

The reference has no distributed backend at all (SURVEY.md §2: no
torch.distributed anywhere); this is TPU-native ICI programming, not a
translation.

Hardware status: the kernel compiles and matches the oracle on a real
v5e chip at S=1 (Mosaic lowering of the grid + DMA + semaphore
structure verified on hardware; multi-chip execution awaits a real
slice — this environment has one chip).

Testing note: interpret-mode emulation of this kernel needs one live
thread per device; on the 2-core CI host the 8-device emulation wedges
in interpreter buffer allocation before any kernel statement runs
(kernel logic exonerated: identical sync structures pass at 8 devices
in isolation, and this kernel passes at <=4 devices with race detection
on). tests/test_fused_halo.py therefore runs the 4-device mesh.
RGCN_FUSED_DEBUG=trace|nodma|nowait|nocopy gates kernel pieces for
debugging.
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scaling_rgcn_training_tpu.ops.span_kernels import (
    pack_edge_cols, unpack_edge_cols, _rebuild_cols)

_CHUNK = 128          # edges per grid step (one [8, 128] code tile)


def fused_plan_viable(l_src, l_dst, h_loc, h_dst, n_per: int, halo: int,
                      num_shards: int, tile_rows: int = 512) -> bool:
    """Cheap vectorized gate for :func:`plan_fused_halo` (halo.py calls it
    on shard 0 before building fplans for a graph).

    The plan groups edges by (arrival rank, read block, dst bucket) and
    pads every group to whole ``_CHUNK`` rows; with little block locality
    (a large uniform-random partition has ~a few edges per group) the
    padded stream inflates by orders of magnitude — unusable on device
    and pathologically slow to even build. Estimate the padded size from
    group counts (a lower bound: relation-band splits only add more) and
    refuse beyond ``RGCN_HALO_FPLAN_MAX_BLOWUP`` (default 3x).
    ``RGCN_HALO_FPLAN=0|1`` force-disables/enables regardless.
    """
    force = _os.environ.get("RGCN_HALO_FPLAN")
    if force is not None:
        return force != "0"
    t = tile_rows
    n_x_pad = -(-n_per // t) * t
    h_pad = -(-max(halo, 1) // t) * t
    l_rows = np.asarray(l_src, np.int64)
    h_loc = np.asarray(h_loc, np.int64)
    peer = h_loc // halo if halo else h_loc * 0
    h_rows = n_x_pad + peer * h_pad + (h_loc % halo if halo else 0)
    rows = np.concatenate([l_rows, h_rows])
    dst = np.concatenate([np.asarray(l_dst, np.int64),
                          np.asarray(h_dst, np.int64)])
    e = len(rows)
    if e == 0:
        return True
    nbkt = (n_x_pad + num_shards * h_pad) // t
    key = (rows // t) * nbkt + dst // t    # rank is a function of rows//t
    _, counts = np.unique(key, return_counts=True)
    padded = int((-(-counts // _CHUNK) * _CHUNK).sum())
    blowup = float(_os.environ.get("RGCN_HALO_FPLAN_MAX_BLOWUP", 3.0))
    # small graphs always pass (padding to _CHUNK rows dominates any tiny
    # edge list but costs nothing absolute); the ratio gates big graphs
    return padded <= max(blowup * e, 1 << 20)
_SHIFT_SRC = 18       # code = src_local << 18 | dst_local << 9 | rel
_SHIFT_DST = 9
_MASK9 = (1 << 9) - 1


class FusedHaloPlan(NamedTuple):
    """Host-built per-shard plan (leading axis S when stacked).

    Per chunk: ``read_blk`` (tile_rows-row block of the combined
    [x_own ++ halo tiles] buffer; -1 = dead pad chunk), ``dst_bkt``
    (tile_rows-row block of the output), ``rbase`` (relation-band base).
    Per edge (tile-packed [C*8, 128]): ``code`` (src_local << 18 |
    dst_local << 9 | rel), ``norm``. ``rank_start`` [S]: first chunk
    index needing ring-distance-k rows (C if none) — the kernel's
    per-peer semaphore wait points.
    """

    code: jnp.ndarray        # int32 [C*8, 128] tile-packed
    norm: jnp.ndarray        # float32 [C*8, 128] tile-packed
    read_blk: jnp.ndarray    # int32 [C]
    dst_bkt: jnp.ndarray     # int32 [C]
    rbase: jnp.ndarray       # int32 [C]
    rank_start: jnp.ndarray  # int32 [S]
    num_chunks: int
    tile_rows: int
    n_x_pad: int             # x region rows (tile-aligned)
    h_pad: int               # per-peer tile slot rows (tile-aligned)
    n_per: int
    num_shards: int
    num_slots: int
    kspan: int


jax.tree_util.register_pytree_node(
    FusedHaloPlan,
    lambda p: ((p.code, p.norm, p.read_blk, p.dst_bkt, p.rbase,
                p.rank_start),
               (p.num_chunks, p.tile_rows, p.n_x_pad, p.h_pad, p.n_per,
                p.num_shards, p.num_slots, p.kspan)),
    lambda aux, ch: FusedHaloPlan(*ch, *aux),
)


def plan_fused_halo(shard: int, l_src, l_dst, l_rel, l_norm,
                    h_loc, h_dst, h_rel, h_norm,
                    n_per: int, halo: int, num_shards: int,
                    num_slots: int, tile_rows: int = 512,
                    kspan: int = 16) -> FusedHaloPlan:
    """Plan one shard's local + halo edges for the fused kernel.

    Local edges read combined-buffer rows ``src``; halo edges read rows
    ``n_x_pad + peer*h_pad + (loc % halo)`` (``loc`` is the existing
    ``peer*halo + pos`` halo-buffer index). Chunks are grouped by
    (ring-arrival rank, read block, dst bucket, relation band) and
    padded to ``_CHUNK`` rows; sorted so rank-0 (local) chunks run
    before any remote tile is needed.
    """
    kspan = min(kspan, num_slots)
    t = tile_rows
    # the per-edge code packs (src_local, dst_local, rel) into
    # 13 + 9 + 9 bits — a too-large tile or relation vocabulary would
    # silently bleed across fields (the num_slots<=512 gate at the
    # halo.py call site is not the only entry point)
    assert num_slots <= (1 << _SHIFT_DST), (
        f"fused halo plan packs rel into {_SHIFT_DST} bits; "
        f"num_slots={num_slots} overflows")
    assert t <= (1 << _SHIFT_DST), (
        f"fused halo plan packs dst_local into {_SHIFT_DST} bits; "
        f"tile_rows={t} overflows")
    assert t <= (1 << (31 - _SHIFT_SRC)), (
        f"fused halo plan packs src_local above bit {_SHIFT_SRC}; "
        f"tile_rows={t} overflows int32")
    n_x_pad = -(-n_per // t) * t
    h_pad = -(-max(halo, 1) // t) * t

    def rows_of(loc):
        peer = loc // halo if halo else loc * 0
        return n_x_pad + peer * h_pad + (loc % halo if halo else 0)

    l_rows = np.asarray(l_src, np.int64)
    h_rows = rows_of(np.asarray(h_loc, np.int64))
    l_rank = np.zeros(len(l_rows), np.int64)
    h_peer = (np.asarray(h_loc, np.int64) // halo) if halo else \
        np.zeros(len(h_rows), np.int64)
    h_rank = (h_peer - shard) % num_shards

    rows = np.concatenate([l_rows, h_rows])
    dst = np.concatenate([np.asarray(l_dst, np.int64),
                          np.asarray(h_dst, np.int64)])
    rel = np.concatenate([np.asarray(l_rel, np.int64),
                          np.asarray(h_rel, np.int64)])
    norm = np.concatenate([np.asarray(l_norm, np.float32),
                           np.asarray(h_norm, np.float32)])
    rank = np.concatenate([l_rank, h_rank])

    real = norm > 0
    rows, dst, rel, norm, rank = (a[real] for a in
                                  (rows, dst, rel, norm, rank))

    # sort by (rank, read block, dst bucket, rel): chunk grouping key
    blk = rows // t
    bkt = dst // t
    order = np.lexsort((rel, bkt, blk, rank))
    rows, dst, rel, norm, rank, blk, bkt = (
        a[order] for a in (rows, dst, rel, norm, rank, blk, bkt))

    # greedy chunking: new chunk on (rank, blk, bkt) change or band
    # overflow or chunk full
    codes, norms = [], []
    c_blk, c_bkt, c_rb, c_rank = [], [], [], []
    cur = 0
    rb = 0
    max_rb = max(0, num_slots - kspan)

    def close(fill):
        pad = _CHUNK - fill
        if pad:
            codes.append(np.zeros(pad, np.int32))
            norms.append(np.zeros(pad, np.float32))

    prev = None
    for i in range(len(rows)):
        key = (rank[i], blk[i], bkt[i])
        if cur and (key != prev or rel[i] - rb >= kspan or cur == _CHUNK):
            close(cur)
            cur = 0
        if cur == 0:
            prev = key
            rb = min(int(rel[i]), max_rb)
            c_blk.append(int(blk[i]))
            c_bkt.append(int(bkt[i]))
            c_rb.append(rb)
            c_rank.append(int(rank[i]))
        codes.append(np.asarray(
            [(int(rows[i]) % t) << _SHIFT_SRC
             | (int(dst[i]) % t) << _SHIFT_DST
             | int(rel[i])], np.int32))
        norms.append(np.asarray([norm[i]], np.float32))
        cur += 1
    if cur:
        close(cur)
    if not c_blk:                      # no edges at all
        c_blk, c_bkt, c_rb, c_rank = [0], [0], [0], [0]
        codes = [np.zeros(_CHUNK, np.int32)]
        norms = [np.zeros(_CHUNK, np.float32)]

    n_chunks = len(c_blk)
    code = pack_edge_cols(np.concatenate(codes), _CHUNK)
    nrm = pack_edge_cols(np.concatenate(norms), _CHUNK)
    c_rank = np.asarray(c_rank, np.int64)
    rank_start = np.full(num_shards, n_chunks, np.int32)
    for k in range(num_shards):
        hits = np.flatnonzero(c_rank == k)
        if len(hits):
            rank_start[k] = int(hits[0])
    return FusedHaloPlan(
        code=code, norm=nrm,
        read_blk=np.asarray(c_blk, np.int32),
        dst_bkt=np.asarray(c_bkt, np.int32),
        rbase=np.asarray(c_rb, np.int32),
        rank_start=rank_start,
        num_chunks=int(n_chunks), tile_rows=int(t), n_x_pad=int(n_x_pad),
        h_pad=int(h_pad), n_per=int(n_per), num_shards=int(num_shards),
        num_slots=int(num_slots), kspan=int(kspan))


def stack_fused_plans(plans) -> FusedHaloPlan:
    """Stack per-shard plans along a leading shard axis (dead-chunk pad:
    read_blk = -1; the kernel skips them)."""
    c_max = max(p.num_chunks for p in plans)

    def pad_chunks(a, fill):
        a = np.asarray(a)
        if len(a) < c_max:
            a = np.concatenate([a, np.full(c_max - len(a), fill, a.dtype)])
        return a

    def pad_rows(a):
        a = np.asarray(a)
        rows = c_max * 8
        if a.shape[0] < rows:
            a = np.concatenate(
                [a, np.zeros((rows - a.shape[0], 128), a.dtype)])
        return a

    p0 = plans[0]
    return FusedHaloPlan(
        code=np.stack([pad_rows(p.code) for p in plans]),
        norm=np.stack([pad_rows(p.norm) for p in plans]),
        read_blk=np.stack([pad_chunks(p.read_blk, -1) for p in plans]),
        dst_bkt=np.stack([pad_chunks(p.dst_bkt, 0) for p in plans]),
        rbase=np.stack([pad_chunks(p.rbase, 0) for p in plans]),
        rank_start=np.stack([np.asarray(p.rank_start) for p in plans]),
        num_chunks=int(c_max), tile_rows=p0.tile_rows, n_x_pad=p0.n_x_pad,
        h_pad=p0.h_pad, n_per=p0.n_per, num_shards=p0.num_shards,
        num_slots=p0.num_slots, kspan=p0.kspan)


def shard_fused_plan(p: FusedHaloPlan) -> FusedHaloPlan:
    """Strip the length-1 shard axis (inside shard_map)."""
    return p._replace(code=p.code[0], norm=p.norm[0],
                      read_blk=p.read_blk[0], dst_bkt=p.dst_bkt[0],
                      rbase=p.rbase[0], rank_start=p.rank_start[0])


def _fused_kernel(read_blk_ref, dst_bkt_ref, rbase_ref, rank_start_ref,
                  code_ref, norm_ref, send_ref, xown_ref, w_ref, g_ref,
                  agg_ref, buf_ref, send_sem, recv_sem, *,
                  s_n: int, axis: str, t: int, n_x_pad: int, h_pad: int,
                  halo: int, d_out: int, kq: int, n_chunks: int):
    c = pl.program_id(0)
    my = lax.axis_index(axis)

    import os as _os
    _dbg = _os.environ.get("RGCN_FUSED_DEBUG", "")
    if "trace" in _dbg:
        pl.debug_print("enter dev={} c={}", my, c)

    @pl.when(c == 0)
    def _prologue():
        agg_ref[...] = jnp.zeros_like(agg_ref)
        buf_ref[...] = jnp.zeros_like(buf_ref)
        if "nocopy" not in _dbg:
            buf_ref[pl.ds(0, xown_ref.shape[0]), :] = xown_ref[...]
        if s_n > 1 and "nodma" not in _dbg:
            barrier = pltpu.get_barrier_semaphore()
            for k in range(1, s_n):
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=lax.rem(my + k, s_n),
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, s_n - 1)
            for k in range(1, s_n):
                dst_p = lax.rem(my + k, s_n)
                # the RECEIVER indexes recv slots by ITS ring distance to
                # the sender: dist_recv(me) = (me - dst_p) % S = S - k
                pltpu.make_async_remote_copy(
                    src_ref=send_ref.at[pl.ds(dst_p * halo, halo)],
                    dst_ref=buf_ref.at[pl.ds(n_x_pad + my * h_pad, halo)],
                    send_sem=send_sem.at[k - 1],
                    recv_sem=recv_sem.at[s_n - k - 1],
                    device_id=dst_p,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).start()

    # per-peer join: the FIRST chunk that reads ring-distance-k rows
    # waits on that peer's receive semaphore (earlier chunks — all the
    # owner-local work and nearer peers — have already run while rows
    # were in flight)
    def _wait_peer(k):
        # "wait a DMA you didn't start": a self-copy descriptor over the
        # region peer (my+k)%S writes, bound to that rank's recv slot —
        # .wait() blocks until the remote copy's bytes have landed
        p_src = lax.rem(my + k, s_n)
        region = buf_ref.at[pl.ds(n_x_pad + p_src * h_pad, halo)]
        pltpu.make_async_copy(region, region, recv_sem.at[k - 1]).wait()

    if "nowait" not in _dbg:
        for k in range(1, s_n):
            @pl.when(c == rank_start_ref[k])
            def _(k=k):
                _wait_peer(k)

    blk = read_blk_ref[c]

    @pl.when(blk >= 0)
    def _compute():
        rb = rbase_ref[c]
        # code/norm ride as WHOLE VMEM refs sliced per chunk (a blocked
        # BlockSpec would have the grid pipeline issue its own copies,
        # which interleaves badly with the in-kernel semaphore waits)
        code, nrm = _rebuild_cols(
            code_ref.at[pl.ds(pl.multiple_of(c * 8, 8), 8)],
            norm_ref.at[pl.ds(pl.multiple_of(c * 8, 8), 8)], _CHUNK)
        src_l = lax.shift_right_logical(code, _SHIFT_SRC)
        dst_l = jnp.bitwise_and(
            lax.shift_right_logical(code, _SHIFT_DST), _MASK9)
        rel = jnp.bitwise_and(code, _MASK9) - rb

        rows = buf_ref[pl.ds(pl.multiple_of(blk * t, 8), t), :]  # [t, d]
        dtype = rows.dtype
        scol = lax.broadcasted_iota(jnp.int32, (_CHUNK, t), 1)
        srchot = (src_l == scol).astype(dtype)                  # [C, t]
        vals = lax.dot(srchot, rows,
                       preferred_element_type=jnp.float32).astype(dtype)
        w_sl = w_ref[pl.ds(pl.multiple_of(rb * d_out, 8), kq), :]
        p_all = lax.dot_general(
            vals, w_sl, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)   # [C, kq]
        qcol = lax.broadcasted_iota(jnp.int32, (_CHUNK, kq), 1)
        p_sel = jnp.where(rel == qcol // d_out, p_all,
                          jnp.zeros((), dtype))
        msg = lax.dot(p_sel, g_ref[:],
                      preferred_element_type=jnp.float32
                      ).astype(dtype) * nrm.astype(dtype)       # [C, d_out]
        dsthot = (dst_l == scol).astype(dtype)                  # [C, t]
        bkt = dst_bkt_ref[c]
        sl = pl.ds(pl.multiple_of(bkt * t, 8), t)
        agg_ref[sl, :] += lax.dot_general(
            dsthot, msg, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(agg_ref.dtype)

    @pl.when(c == n_chunks - 1)
    def _epilogue():
        if s_n > 1 and "nodma" not in _dbg and "nowait" not in _dbg:
            for k in range(1, s_n):
                # drain a receive that no chunk consumed (peer had rows
                # for us but no edges read them)
                @pl.when(rank_start_ref[k] >= n_chunks)
                def _(k=k):
                    _wait_peer(k)
                dst_p = lax.rem(my + k, s_n)
                sent = send_ref.at[pl.ds(dst_p * halo, halo)]
                pltpu.make_async_copy(sent, sent,
                                      send_sem.at[k - 1]).wait()


def fused_halo_aggregate_fwd(x_own, send, w, plan: FusedHaloPlan,
                             axis: str, interpret=False):
    """Run the fused exchange+aggregate kernel (inside shard_map).

    ``x_own [n_per(_pad), d]``, ``send [S*H, d]`` (rows to ship, reader-
    major), ``w [slots, d, d_out]`` -> (``agg [n_per, d_out]`` f32,
    ``buf [n_x_pad + S*h_pad, d]`` the combined row buffer, kept for the
    backward).
    """
    s_n = plan.num_shards
    t = plan.tile_rows
    halo = send.shape[0] // s_n if s_n else send.shape[0]
    slots, d_in, d_true = w.shape
    d_out = -(-d_true // 8) * 8
    if d_out != d_true:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, d_out - d_true)))
    kq = plan.kspan * d_out
    w_flat = jnp.transpose(w, (0, 2, 1)).reshape(slots * d_out, d_in
                                                 ).astype(x_own.dtype)
    qs = np.arange(kq)
    g_mat = jnp.asarray((qs[:, None] % d_out == np.arange(d_out)[None, :]
                         ).astype(np.float32)).astype(x_own.dtype)
    buf_rows = plan.n_x_pad + s_n * plan.h_pad
    n_agg = plan.n_x_pad
    if x_own.shape[0] < plan.n_x_pad:      # tile-align the x region
        x_own = jnp.pad(x_own, ((0, plan.n_x_pad - x_own.shape[0]), (0, 0)))

    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(plan.num_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((max(s_n - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(s_n - 1, 1),)),
        ],
    )
    agg, buf = pl.pallas_call(
        functools.partial(
            _fused_kernel, s_n=s_n, axis=axis, t=t, n_x_pad=plan.n_x_pad,
            h_pad=plan.h_pad, halo=halo, d_out=d_out, kq=kq,
            n_chunks=plan.num_chunks),
        out_shape=[
            jax.ShapeDtypeStruct((n_agg, d_out), jnp.float32),
            jax.ShapeDtypeStruct((buf_rows, d_in), x_own.dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the barrier semaphore exists only in the multi-shard kernel;
            # Mosaic rejects collective_id without one (hit at S=1 on TPU)
            collective_id=0 if s_n > 1 else None),
        interpret=interpret or False,
    )(plan.read_blk, plan.dst_bkt, plan.rbase, plan.rank_start,
      plan.code, plan.norm, send, x_own, w_flat, g_mat)
    return agg[:, :d_true], buf


# -- differentiable wrapper (inside shard_map) --------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_halo_apply(x_own, send, w, plan, lbspan, hbspan, axis, interpret):
    """Differentiable fused exchange+aggregate: [n_per(_pad), d] -> the
    node-local aggregation [n_x_pad, d_out] (caller slices to n_per).

    Forward = the one-kernel fused path. Backward reuses the banded span
    backward kernels over the stacked ``lbspan``/``hbspan`` plans
    (parallel/halo.py builds them for the unfused path) plus one reverse
    all_to_all of the halo cotangents — the cotangent of ``send`` flows
    back through the caller's gather automatically.
    """
    agg, _ = fused_halo_aggregate_fwd(x_own, send, w, plan, axis,
                                      interpret=interpret)
    return agg


def _fused_apply_fwd(x_own, send, w, plan, lbspan, hbspan, axis, interpret):
    agg, buf = fused_halo_aggregate_fwd(x_own, send, w, plan, axis,
                                        interpret=interpret)
    return agg, (x_own, buf, w, plan, lbspan, hbspan)


def _fused_apply_bwd(axis, interpret, res, g):
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        plan_take, rel_span_backward_scatter)

    x_own, buf, w, plan, lb, hb = res
    s_n = plan.num_shards
    # true per-peer halo rows: hbspan's segments are S * halo
    halo = hb.num_segments // s_n
    g = g[:lb.num_segments]                       # strip x-region padding

    # owner-local segment: dx_own + dW (same math as span_aggregate's VJP)
    t = plan_take(g.astype(w.dtype), lb.gather_idx)
    dx_own, dw = rel_span_backward_scatter(t, lb, x_own[:lb.num_segments],
                                           w)
    # halo segment: cotangent w.r.t. the received rows, then reverse the
    # exchange (block-transpose involution) to get d send
    hbuf = lax.dynamic_slice_in_dim(buf, plan.n_x_pad,
                                    s_n * plan.h_pad, axis=0)
    hbuf = hbuf.reshape(s_n, plan.h_pad, -1)[:, :halo].reshape(
        s_n * halo, -1)
    t2 = plan_take(g.astype(w.dtype), hb.gather_idx)
    dhbuf, dw2 = rel_span_backward_scatter(t2, hb, hbuf, w)
    dw = dw + dw2
    dsend = lax.all_to_all(
        dhbuf.astype(x_own.dtype).reshape(s_n, halo, -1), axis,
        split_axis=0, concat_axis=0, tiled=False).reshape(s_n * halo, -1)

    if dx_own.shape[0] < x_own.shape[0]:          # x was tile-padded
        dx_own = jnp.pad(
            dx_own, ((0, x_own.shape[0] - dx_own.shape[0]), (0, 0)))
    return (dx_own.astype(x_own.dtype), dsend, dw.astype(w.dtype),
            None, None, None)


fused_halo_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)
