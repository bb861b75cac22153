"""Trustworthy micro timing of conv pipeline pieces on the device.

Methodology (validated against wall-clock): the op's FULL output is the
scan carry, and each iteration's input is perturbed multiplicatively by
``mean(carry)`` — XLA cannot DCE (mean consumes every element), cannot
hoist (input changes every iteration), and cannot factor (the perturbation
is multiplicative inside a gather/matmul). The carry is materialized every
iteration, like in the real pipeline. Scalar-carry + sum tricks are NOT
reliable on this backend — measured 0.01 ms for ops that take 25 ms.

Run: python scripts/micro_profile.py
"""
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

from scaling_rgcn_training_tpu.ops import build_rel_edges
from scaling_rgcn_training_tpu.ops.grouped_matmul import grouped_matmul
from scaling_rgcn_training_tpu.ops.segment_kernels import sorted_segment_sum_pallas

n = int(os.environ.get("P_NODES", 200_000))
e = int(os.environ.get("P_EDGES", 4_000_000))
r = int(os.environ.get("P_RELS", 45))
d = int(os.environ.get("P_DIM", 64))
h = int(os.environ.get("P_OUT", 16))
inner = int(os.environ.get("P_INNER", 10))
only = os.environ.get("P_ONLY", "")

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)
ep = len(edges.src)

x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
w = jnp.asarray(rng.standard_normal((slots, d, h)) * 0.1, jnp.float32)
w2 = jnp.asarray(rng.standard_normal((slots, h, 8)) * 0.1, jnp.float32)
msg_d = jnp.asarray(rng.standard_normal((ep, d)), jnp.float32)
msg_h = jnp.asarray(rng.standard_normal((ep, h)), jnp.float32)

print(f"N={n} E={e} (padded {ep}) slots={slots} d={d} h={h} inner={inner} "
      f"backend={jax.default_backend()}", flush=True)


def timeit(name, fn, first, *rest):
    """Time fn(first, *rest). Output-carried chain; see module docstring."""
    if only and only not in name:
        return None

    def run(carry, a, *others):
        def body(c, _):
            a2 = a * (1.0 + 1e-24 * jnp.mean(c).astype(a.dtype))
            return fn(a2, *others), None

        return lax.scan(body, carry, None, length=inner)[0]

    g = jax.jit(run)
    t0 = time.perf_counter()
    o = g(fn(first, *rest), first, *rest); jax.block_until_ready(o)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = g(o, first, *rest); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / inner
    print(f"{name:46s} {dt*1e3:9.2f} ms  (compile {tc:5.1f}s)", flush=True)
    return dt


xh_small = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)

timeit("elementwise [E,64]*c (bandwidth ref)", lambda m: m * 1.0001, msg_d)
timeit("tile [E,16]->[E,64] (chain baseline)", lambda m: jnp.tile(m, (1, d // h))[:, :h], msg_h)
timeit("gather x[src] [N,64]->[E,64]", lambda xx: jnp.take(xx, edges.src, axis=0), x)
timeit("gather small-table [N,16]->[E,16]", lambda xx: jnp.take(xx, edges.dst, axis=0), xh_small)
timeit("gather msg[perm] [E,16]->[E,16]", lambda m: jnp.take(m, edges.bwd_perm, axis=0), msg_h)
timeit("gather msg[perm] [E,64]->[E,64]", lambda m: jnp.take(m, edges.bwd_perm, axis=0), msg_d)
timeit("ragged_dot [E,64]->[E,16] (as carry [E,16])",
       lambda m: grouped_matmul(
           jnp.tile(m, (1, d // h)), w, edges.group_sizes, backend="ragged"), msg_h)
timeit("ragged_dot [E,16]->[E,8]",
       lambda m: jnp.tile(grouped_matmul(m, w2, edges.group_sizes,
                                         backend="ragged"), (1, 2)), msg_h)
timeit("pallas gmm [E,64]->[E,16] (tile-ranged)",
       lambda m: grouped_matmul(jnp.tile(m, (1, d // h)), w, edges.group_sizes,
                                backend="pallas",
                                static_offsets=edges.group_offsets), msg_h)
timeit("xla segsum dst [E,16]->[E,16](take-back)",
       lambda m: jnp.take(jax.ops.segment_sum(m, edges.dst, num_segments=n),
                          edges.dst, axis=0), msg_h)
timeit("pallas segsum sorted [E,16](take-back)",
       lambda m: jnp.take(sorted_segment_sum_pallas(m, edges.dst_sorted,
                                                    edges.dst_plan),
                          edges.dst_sorted, axis=0), msg_h)
from scaling_rgcn_training_tpu.ops import pallas_kernels
timeit("pallas _drhs (carry [E,16])",
       lambda m: m * jnp.mean(pallas_kernels._drhs(
           jnp.tile(m, (1, d // h)), m, edges.group_sizes, (slots, d, h),
           static_offsets=edges.group_offsets)),
       msg_h)

from scaling_rgcn_training_tpu.ops.span_kernels import (
    rel_span_backward_scatter, rel_span_matmul_scatter, unpack_edge_cols)

dt = jnp.bfloat16 if os.environ.get("P_BF16") else jnp.float32
fsp, bsp = edges.fspan, edges.bspan
vals_f = jnp.zeros((fsp.padded_edges, d), dt)
timeit("fused fwd kernel [E,64]->rel@W->[N,16]",
       lambda v: v * (1 + 1e-24 * jnp.mean(rel_span_matmul_scatter(
           v, fsp, w.astype(dt))).astype(dt)),
       vals_f)
t_h = jnp.zeros((bsp.padded_edges, h), dt)
xx = x.astype(dt)
timeit("fused bwd kernel (dx+dw)",
       lambda t: t * (1 + 1e-24 * jnp.mean(rel_span_backward_scatter(
           t, bsp, xx, w.astype(dt))[0]).astype(dt)),
       t_h)
timeit("gather x[fspan.gather_idx]*norm [E,64]",
       lambda xq: jnp.take(xq, fsp.gather_idx, axis=0)
       * jnp.asarray(unpack_edge_cols(fsp.norm, fsp.chunk))[:, None].astype(dt),
       xx)
