"""Attribution microbench for the backward span kernel's cost.

The bwd kernel (ops/span_kernels.py:_bwd_kernel) runs ~4-5x the fwd kernel
despite similar MXU/VPU op counts (PERF.md). This times surgical variants
to attribute the gap:

  base    — the shipped kernel
  hint    — pl.multiple_of(rb*d_out, d_out) alignment hint on the dynamic
            weight-slice / dw-RMW offsets
  statrmw — dw accumulated at a STATIC offset (0) instead of the dynamic
            rb*d_out slice (wrong math, isolates dynamic-RMW cost)
  nodw    — dx only: no xs matmul, no dw RMW (wrong math)
  nodx    — dw only: no dmsg/dx matmuls (wrong math)
  mxurep  — texp built by a tiny MXU matmul t @ tmat instead of
            pltpu.repeat lane-replication

Run: python scripts/bwd_variants.py   (env: V_OUT=16|8, V_INNER, V_ONLY)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_rgcn_training_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scaling_rgcn_training_tpu.ops import build_rel_edges
from scaling_rgcn_training_tpu.ops.span_kernels import _sub_rows, unpack_edge_cols

n = int(os.environ.get("V_NODES", 200_000))
e = int(os.environ.get("V_EDGES", 4_000_000))
r = int(os.environ.get("V_RELS", 45))
d_out = int(os.environ.get("V_OUT", 16))
d_in = int(os.environ.get("V_IN", 64))
inner = int(os.environ.get("V_INNER", 10))
only = [v for v in os.environ.get("V_ONLY", "").split(",") if v]

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)
span = edges.bspan

dt = jnp.bfloat16
t = jnp.asarray(rng.standard_normal((span.padded_edges, d_out)), dt)
x = jnp.asarray(rng.standard_normal((n, d_in)), dt)
w = jnp.asarray(rng.standard_normal((slots, d_in, d_out)) * 0.1, dt)

print(f"N={n} E={e} pad={span.padded_edges} slots={slots} "
      f"d_in={d_in} d_out={d_out} chunk={span.chunk} s={span.bucket_rows} "
      f"kspan={span.kspan}", flush=True)


def make_bwd(variant: str):
    s, chunk = span.bucket_rows, span.chunk
    kq = span.kspan * d_out
    rq = slots * d_out
    shift = span.shift
    max_chunks = span.max_chunks
    m_pad = -(-span.num_segments // s) * s
    num_buckets = m_pad // s

    def kernel(offs_ref, rbase_ref, code_ref, norm_ref, t_ref, x_ref,
               w_ref, tm_ref, em_ref, dx_ref, dw_ref):
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
            off = rb * d_out
            if variant == "hint":
                off = pl.multiple_of(off, d_out)
            w_sl = w_ref[pl.ds(off, kq), :]
            dtype = t_ref.dtype
            kspan = kq // d_out
            sub = _sub_rows(chunk)
            for q in range(chunk // sub):
                sl = pl.ds(q * sub, sub)
                if variant == "wide":
                    tt = (t_ref[sl, :][:, :d_out]
                          * norm_ref[sl, 0][:, None].astype(dtype))
                else:
                    tt = t_ref[sl, :] * norm_ref[sl, 0][:, None].astype(dtype)
                code = code_ref[sl, 0][:, None]
                rel = jnp.bitwise_and(code, (1 << shift) - 1) - rb
                local = jax.lax.shift_right_logical(code, shift) - j * s
                scol = jax.lax.broadcasted_iota(jnp.int32, (sub, s), 1)
                if variant == "noonehot":
                    srchot = (scol * 0 + 1).astype(dtype)
                else:
                    srchot = (local == scol).astype(dtype)
                if variant == "minimal":
                    # single path: srchot + 2 matmuls, no band mask at all
                    dx_ref[:] += jax.lax.dot_general(
                        srchot,
                        jax.lax.dot(tt, tm_ref[:, :d_in],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dx_ref.dtype)
                    continue
                if variant == "minimal16":
                    # like minimal but the scatter dot is 16 lanes wide
                    dx_ref[:, :16] += jax.lax.dot_general(
                        srchot,
                        jax.lax.dot(tt, tm_ref[:, :16],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dx_ref.dtype)
                    continue
                if variant == "minsplit":
                    # minimal with the 64-wide scatter dot SPLIT into 16-wide
                    # quarters (dodges a possible layout cliff at n=64)
                    y = jax.lax.dot(tt, tm_ref[:, :d_in],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype)
                    for b in range(d_in // 16):
                        dx_ref[:, b * 16:(b + 1) * 16] += jax.lax.dot_general(
                            srchot, y[:, b * 16:(b + 1) * 16],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ).astype(dx_ref.dtype)
                    continue
                if variant == "overwrite":
                    # minimal without the accumulate read (wrong math)
                    dx_ref[:] = jax.lax.dot_general(
                        srchot,
                        jax.lax.dot(tt, tm_ref[:, :d_in],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dx_ref.dtype)
                    continue
                if variant == "mintrans":
                    # minimal with an EXPLICIT transpose + plain matmul
                    # instead of the dim0xdim0 dot_general
                    y = jax.lax.dot(tt, tm_ref[:, :d_in],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype)
                    dx_ref[:] += jax.lax.dot(
                        srchot.T, y, preferred_element_type=jnp.float32
                    ).astype(dx_ref.dtype)
                    continue
                if variant == "mxuall":
                    # band mask via two tiny MXU matmuls + ONE multiply:
                    # (relhot @ E)[e,q] = 1[rel_e == q//d_out],
                    # (tt @ T)[e,q]     = tt[e, q % d_out]
                    kcol = jax.lax.broadcasted_iota(
                        jnp.int32, (sub, kspan), 1)
                    relhot = (rel == kcol).astype(dtype)
                    m_exp = (jax.lax.dot(relhot, em_ref[:],
                                         preferred_element_type=jnp.float32
                                         ).astype(dtype)
                             * jax.lax.dot(tt, tm_ref[:],
                                           preferred_element_type=jnp.float32
                                           ).astype(dtype))
                else:
                    qcol = jax.lax.broadcasted_iota(jnp.int32, (sub, kq), 1)
                    if variant == "mxurep":
                        texp = jax.lax.dot(tt, tm_ref[:],
                                           preferred_element_type=jnp.float32
                                           ).astype(dtype)
                    else:
                        texp = pltpu.repeat(tt, kspan, axis=1)
                    if variant == "nomexp":
                        m_exp = texp
                    elif variant == "norel":
                        m_exp = jnp.where(0 == qcol // d_out, texp,
                                          jnp.zeros((), dtype))
                    else:
                        m_exp = jnp.where(rel == qcol // d_out, texp,
                                          jnp.zeros((), dtype))
                if variant != "nodx":
                    dmsg = jax.lax.dot(m_exp, w_sl,
                                       preferred_element_type=jnp.float32)
                    dx_ref[:] += jax.lax.dot_general(
                        srchot, dmsg.astype(dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(dx_ref.dtype)
                if variant != "nodw":
                    xs = jax.lax.dot(srchot, x_ref[:],
                                     preferred_element_type=jnp.float32
                                     ).astype(dtype)
                    dwc = jax.lax.dot_general(
                        m_exp, xs, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if variant == "statrmw":
                        dw_ref[pl.ds(0, kq), :] += dwc.astype(dw_ref.dtype)
                    else:
                        dw_ref[pl.ds(off, kq), :] += dwc.astype(dw_ref.dtype)

    x_pad = x
    if x_pad.shape[0] < m_pad:
        x_pad = jnp.pad(x_pad, ((0, m_pad - x_pad.shape[0]), (0, 0)))
    w_flat = jnp.transpose(w, (0, 2, 1)).reshape(rq, d_in).astype(dt)
    qs = np.arange(kq)
    tmat = jnp.asarray((np.arange(d_out)[:, None] == qs[None, :] % d_out
                        ).astype(np.float32)).astype(dt)   # [d_out, kq]
    emat = jnp.asarray((np.arange(kq // d_out)[:, None] == qs[None, :] // d_out
                        ).astype(np.float32)).astype(dt)   # [kspan, kq]

    t_width = d_in if variant == "wide" else d_out
    t_in = t
    if variant == "wide":
        t_in = jnp.pad(t, ((0, 0), (0, d_in - d_out)))

    max_block = span.padded_edges // chunk - 1

    def edge_block(j, ci, offs, rb):
        return (jnp.minimum(offs[j] // chunk + ci, max_block), 0)

    const_block = lambda shape: pl.BlockSpec(
        shape, lambda j, ci, offs, rb: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_buckets, max_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, 1), edge_block),
            pl.BlockSpec((chunk, t_width), edge_block),
            pl.BlockSpec((s, d_in), lambda j, ci, offs, rb: (j, 0)),
            const_block((rq, d_in)),
            const_block((d_out, kq)),
            const_block((kq // d_out, kq)),
        ],
        out_specs=[
            pl.BlockSpec((s, d_in), lambda j, ci, offs, rb: (j, 0)),
            const_block((rq, d_in)),
        ],
    )

    # operands are returned so the caller passes them as JIT ARGUMENTS —
    # closing over the 4M-row plan arrays embeds them as HLO literals and
    # the tunnel compile takes 10+ minutes (same trap bisect_step.py fixed)
    code_flat = jnp.asarray(unpack_edge_cols(span.code, span.chunk))
    norm_flat = jnp.asarray(unpack_edge_cols(span.norm, span.chunk))
    operands = (span.offsets, span.rbase, code_flat.reshape(-1, 1),
                norm_flat.reshape(-1, 1), x_pad, w_flat, tmat, emat)

    def run(tt, offsets, rbase, code, norm, xp, wf, tm, em):
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((m_pad, d_in), jnp.float32),
                jax.ShapeDtypeStruct((rq, d_in), jnp.float32),
            ],
            grid_spec=grid_spec,
        )(offsets, rbase, code, norm, tt, xp, wf, tm, em)

    return run, operands, t_in


def timeit(name, fn, operands, tstream):
    def chain(c, tt, *ops):
        def body(cc, _):
            dx, dw = fn(tt * (1 + 1e-12 * cc).astype(tt.dtype), *ops)
            return dx.ravel()[0] + dw.ravel()[0], None
        return lax.scan(body, c, None, length=inner)[0]

    g = jax.jit(chain)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), tstream, *operands); float(o)  # forced fetch: block_until_ready under-blocks on axon
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, tstream, *operands); float(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{name:10s} {best*1e3:8.2f} ms  (compile {tc:.1f}s)", flush=True)


def fwdrev():
    """dx computed by the FORWARD span kernel on the backward plan:
    dx[src] = sum_e norm_e * t[dst_e] @ W[rel_e]^T  — same math as the
    kernel's dx path, swapped dims (d_in=16 -> d_out=64), kq = kspan*64."""
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        rel_span_matmul_scatter)

    w_rev = jnp.transpose(w, (0, 2, 1))   # [slots, d_out, d_in]

    def run(tt, wr):
        return rel_span_matmul_scatter(tt, span, wr), None

    return run, (w_rev,)


if not only or "fwdrev" in only:
    fn, operands = fwdrev()

    def fwdrev_chain(name):
        def chain(c, tt, wr):
            def body(cc, _):
                dx, _ = fn(tt * (1 + 1e-12 * cc).astype(tt.dtype), wr)
                return dx.ravel()[0], None
            return lax.scan(body, c, None, length=inner)[0]

        g = jax.jit(chain)
        t0 = time.perf_counter()
        o = g(jnp.float32(0), t, *operands); float(o)
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = g(o, t, *operands); float(o)
            best = min(best, (time.perf_counter() - t0) / inner)
        print(f"{name:10s} {best*1e3:8.2f} ms  (compile {tc:.1f}s)",
              flush=True)

    fwdrev_chain("fwdrev")

for v in (only or ["base", "hint", "statrmw", "nodw", "nodx", "mxurep",
                   "minimal", "noonehot", "nomexp", "norel", "mxuall",
                   "wide"]):
    if v == "fwdrev":
        continue
    fn, operands, tstream = make_bwd(v)
    timeit(v, fn, operands, tstream)


def shipped():
    """The shipped rel_span_backward_scatter, timed in THIS harness
    (nudged scan carry) for apples-to-apples with the variants."""
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        rel_span_backward_scatter)

    def chain(c, tt, xx, ww):
        def body(cc, _):
            dx, dw = rel_span_backward_scatter(
                tt * (1 + 1e-12 * cc).astype(tt.dtype), span, xx, ww)
            return dx.ravel()[0] + dw.ravel()[0], None
        return lax.scan(body, c, None, length=inner)[0]

    g = jax.jit(chain)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), t, x, w); float(o)
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, t, x, w); float(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{'shipped':10s} {best*1e3:8.2f} ms  (compile {tc:.1f}s)",
          flush=True)


if not only or "shipped" in only:
    shipped()


def fwdnorm():
    """The shipped FORWARD kernel on fspan (normal dims), in this harness."""
    from scaling_rgcn_training_tpu.ops.span_kernels import (
        rel_span_matmul_scatter)

    fsp = edges.fspan
    vals = jnp.asarray(rng.standard_normal((fsp.padded_edges, d_in)), dt)
    wf = jnp.asarray(rng.standard_normal((slots, d_in, d_out)) * 0.1, dt)

    def chain(c, vv, ww):
        def body(cc, _):
            out = rel_span_matmul_scatter(
                vv * (1 + 1e-12 * cc).astype(vv.dtype), fsp, ww)
            return out.ravel()[0], None
        return lax.scan(body, c, None, length=inner)[0]

    g = jax.jit(chain)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), vals, wf); float(o)
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, vals, wf); float(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{'fwdnorm':10s} {best*1e3:8.2f} ms  (compile {tc:.1f}s)",
          flush=True)


if not only or "fwdnorm" in only:
    fwdnorm()


def floor_row():
    """Harness floor: nudge multiply + scan + fetch, NO kernel."""
    def chain(c, tt):
        def body(cc, _):
            v = tt * (1 + 1e-12 * cc).astype(tt.dtype)
            return v.ravel()[0].astype(jnp.float32), None
        return lax.scan(body, c, None, length=inner)[0]

    g = jax.jit(chain)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), t); float(o)
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, t); float(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{'floor':10s} {best*1e3:8.2f} ms  (compile {tc:.1f}s)",
          flush=True)


if not only or "floor" in only:
    floor_row()
