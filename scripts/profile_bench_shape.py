"""Component breakdown at the bench shape (N=200k, E=4M, R=45, d=64).

All arrays are passed as jit ARGUMENTS (closure capture embeds them as HLO
constants -> remote-compile request too large + minutes of compile).
Run: python scripts/profile_bench_shape.py
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
from scaling_rgcn_training_tpu.ops.rgcn_conv import (
    relational_aggregate, _edge_traffic_mode)
from scaling_rgcn_training_tpu.ops.segment_kernels import sorted_segment_sum_pallas

n = int(os.environ.get("P_NODES", 200_000))
e = int(os.environ.get("P_EDGES", 4_000_000))
r = int(os.environ.get("P_RELS", 45))
d = int(os.environ.get("P_DIM", 64))
h = int(os.environ.get("P_OUT", 16))
inner = int(os.environ.get("P_INNER", 20))
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
msg_d = jnp.asarray(rng.standard_normal((ep, d)), jnp.float32)
msg_h = jnp.asarray(rng.standard_normal((ep, h)), jnp.float32)

print(f"N={n} E={e} (padded {ep}) slots={slots} d={d} h={h} inner={inner} "
      f"backend={jax.default_backend()}", flush=True)
print(f"layer1 mode: {_edge_traffic_mode(n, slots, ep, d, h)}  "
      f"bwd_keys None: {edges.bwd_keys is None}  "
      f"dst_plan: {edges.dst_plan is not None}", flush=True)


def timeit(name, fn, *args):
    if only and only not in name:
        return None

    def body(c, _):
        out = fn(*args)
        return c + out.ravel()[0].astype(jnp.float32), None

    def run(c, *a):
        def b(cc, _):
            out = fn(*a)
            return cc + out.ravel()[0].astype(jnp.float32), None
        return lax.scan(b, c, None, length=inner)[0]

    g = jax.jit(run)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), *args); jax.block_until_ready(o)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = g(o, *args); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / inner
    print(f"{name:44s} {dt*1e3:9.2f} ms  (compile {tc:5.1f}s)", flush=True)
    return dt


xb = x.astype(jnp.bfloat16)
wb = w.astype(jnp.bfloat16)
mdb = msg_d.astype(jnp.bfloat16)

timeit("trivial (c+1 only)", lambda c2: c2[None] + 1.0, jnp.float32(0))
timeit("gather x[src] [E,64] f32", lambda xx, ss: jnp.take(xx, ss, axis=0), x, edges.src)
timeit("gather x[src] [E,64] bf16", lambda xx, ss: jnp.take(xx, ss, axis=0), xb, edges.src)
timeit("ragged_dot [E,64]x[.,64,16] f32",
       lambda a, b, gs: grouped_matmul(a, b, gs, backend="ragged"), msg_d, w, edges.group_sizes)
timeit("ragged_dot [E,64]x[.,64,16] bf16",
       lambda a, b, gs: grouped_matmul(a, b, gs, backend="ragged"), mdb, wb, edges.group_sizes)
timeit("xla segsum [E,16]->[N,16]",
       lambda m, dd: jax.ops.segment_sum(m, dd, num_segments=n), msg_h, edges.dst)
timeit("pallas segsum [E,16]->[N,16]",
       lambda m, ks, offs: sorted_segment_sum_pallas(m, ks, edges.dst_plan._replace(offsets=offs)),
       msg_h, edges.dst_sorted, edges.dst_plan.offsets)
timeit("pallas segsum [E,64]->[N,64]",
       lambda m, ks, offs: sorted_segment_sum_pallas(m, ks, edges.bwd_plan._replace(offsets=offs)),
       msg_d, edges.bwd_src, edges.bwd_plan.offsets)

# composite op fwd / fwd+bwd (edges passed whole as a pytree arg)
def agg_fwd(xx, ww, ed):
    return relational_aggregate(xx, ww, ed, "edge", None)

def agg_fb(xx, ww, ed):
    def loss(a, b):
        return relational_aggregate(a, b, ed, "edge", None).sum()
    gx, gw = jax.grad(loss, argnums=(0, 1))(xx, ww)
    return gx

timeit("aggregate fwd (edge) f32", agg_fwd, x, w, edges)
timeit("aggregate fwd+bwd (edge) f32", agg_fb, x, w, edges)
timeit("aggregate fwd (edge) bf16-x/w", agg_fwd, xb, wb, edges)
timeit("aggregate fwd+bwd (edge) bf16-x/w", agg_fb, xb, wb, edges)

from scaling_rgcn_training_tpu.ops import pallas_kernels
timeit("pallas _drhs dw [E,64]x[E,16]",
       lambda a, b, gs: pallas_kernels._drhs(a, b, gs, (slots, d, h)),
       msg_d, msg_h, edges.group_sizes)
