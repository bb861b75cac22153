"""Per-piece timing of the FUSED (relation-banded) conv path at the bench shape.

Measures the two span Pallas kernels in isolation (given pre-gathered
operands), the XLA gathers that feed them, and the composite
relational_aggregate fwd / fwd+bwd in fused mode — f32 and bf16 — for both
layer shapes (d64->16 and d16->8). Methodology: output-carried lax.scan
chain (no DCE/hoisting); run nothing else against the chip concurrently —
shared-tunnel contention skews results by 10x.

Run: python scripts/profile_fused.py   (env: P_NODES/P_EDGES/P_RELS/
P_DIM/P_OUT/P_INNER/P_ONLY)
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
from scaling_rgcn_training_tpu.ops.span_kernels import (
    rel_span_matmul_scatter, rel_span_backward_scatter)
from scaling_rgcn_training_tpu.ops.rgcn_conv import relational_aggregate

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
fsp, bsp = edges.fspan, edges.bspan

x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
w = jnp.asarray(rng.standard_normal((slots, d, h)) * 0.1, jnp.float32)
vals_d = jnp.asarray(rng.standard_normal((fsp.padded_edges, d)), jnp.float32)
t_h = jnp.asarray(rng.standard_normal((bsp.padded_edges, h)), jnp.float32)
x_h = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
w2 = jnp.asarray(rng.standard_normal((slots, h, 8)) * 0.1, jnp.float32)
vals_h = jnp.asarray(rng.standard_normal((fsp.padded_edges, h)), jnp.float32)
t_8 = jnp.asarray(rng.standard_normal((bsp.padded_edges, 8)), jnp.float32)

print(f"N={n} E={e} (fwd span pad {fsp.padded_edges}, K={fsp.kspan}) "
      f"slots={slots} d={d} h={h} inner={inner} "
      f"backend={jax.default_backend()}", flush=True)


def timeit(name, fn, *args, nudge=False):
    """``nudge=True`` threads the scan carry through the first operand
    (one extra elementwise pass over it): REQUIRED for composite XLA
    computations, which are loop-invariant otherwise and get hoisted out
    of the scan (the r2-era composite "aggregate" rows were corrupted by
    this). Kernel-only and gather-only rows don't need it — XLA does not
    hoist Pallas custom calls, and their un-nudged timings match the
    nudged microbenchmarks."""
    if only and only not in name:
        return None

    def run(c, *a):
        def b(cc, _):
            a0 = a[0] * (1 + 1e-12 * cc).astype(a[0].dtype) if nudge else a[0]
            out = fn(a0, *a[1:])
            first = out[0] if isinstance(out, tuple) else out
            return cc + first.ravel()[0].astype(jnp.float32), None
        return lax.scan(b, c, None, length=inner)[0]

    g = jax.jit(run)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), *args); float(o)  # forced fetch: block_until_ready under-blocks on axon
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, *args); float(o)  # forced fetch: block_until_ready under-blocks on axon
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{name:46s} {best*1e3:9.2f} ms  (compile {tc:5.1f}s)", flush=True)
    return best


bf = jnp.bfloat16

# -- layer 1 shape: d_in=64, d_out=16 ----------------------------------------
timeit("L1 span fwd kernel f32",
       lambda v: rel_span_matmul_scatter(v, fsp, w), vals_d)
timeit("L1 span fwd kernel bf16",
       lambda v: rel_span_matmul_scatter(v, fsp, w.astype(bf)),
       vals_d.astype(bf))
timeit("L1 span bwd kernel f32",
       lambda t, xx: rel_span_backward_scatter(t, bsp, xx, w), t_h, x)
timeit("L1 span bwd kernel bf16",
       lambda t, xx: rel_span_backward_scatter(t, bsp, xx, w.astype(bf)),
       t_h.astype(bf), x.astype(bf))
timeit("L1 gather x[fspan] f32",
       lambda xx: jnp.take(xx, fsp.gather_idx, axis=0), x)
timeit("L1 gather x[fspan] bf16",
       lambda xx: jnp.take(xx, fsp.gather_idx, axis=0), x.astype(bf))
timeit("L1 gather gout[bspan] [N,16] f32",
       lambda g: jnp.take(g, bsp.gather_idx, axis=0), x_h)


def agg_fwd(xx, ww):
    return relational_aggregate(xx, ww, edges, "fused", None)


def agg_fb(xx, ww):
    def loss(a, b):
        return relational_aggregate(a, b, edges, "fused", None).sum()
    return jax.grad(loss, argnums=(0, 1))(xx, ww)[0]


timeit("L1 aggregate fwd (fused) f32", agg_fwd, x, w, nudge=True)
timeit("L1 aggregate fwd+bwd (fused) f32", agg_fb, x, w, nudge=True)
timeit("L1 aggregate fwd+bwd (fused) bf16",
       agg_fb, x.astype(bf), w.astype(bf), nudge=True)

# -- layer 2 shape: d_in=16, d_out=8 ------------------------------------------
timeit("L2 span fwd kernel f32",
       lambda v: rel_span_matmul_scatter(v, fsp, w2), vals_h)
timeit("L2 span fwd kernel bf16",
       lambda v: rel_span_matmul_scatter(v, fsp, w2.astype(bf)),
       vals_h.astype(bf))
timeit("L2 span bwd kernel f32",
       lambda t, xx: rel_span_backward_scatter(t, bsp, xx, w2), t_8, x_h)
timeit("L2 span bwd kernel bf16",
       lambda t, xx: rel_span_backward_scatter(t, bsp, xx, w2.astype(bf)),
       t_8.astype(bf), x_h.astype(bf))
