"""Component breakdown at the bench shape (N=200k, E=4M, R=45, d=64).

Times each piece of the 2-layer R-GCN train step on the real device to
find where the 377 ms/step goes. Run: python scripts/profile_bench_shape.py
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
inner = int(os.environ.get("P_INNER", 5))

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

print(f"N={n} E={e} (padded {ep}) slots={slots} d={d} h={h} "
      f"backend={jax.default_backend()}", flush=True)
print(f"layer1 mode: {_edge_traffic_mode(n, slots, ep, d, h)}  "
      f"layer2 mode: {_edge_traffic_mode(n, slots, ep, h, 8)}", flush=True)
print(f"bwd_keys is None: {edges.bwd_keys is None}  "
      f"dst_plan active: {edges.dst_plan is not None}", flush=True)


def timeit(name, fn, *args):
    def body(c, _):
        out = fn(*args)
        return c + out.ravel()[0], None

    g = jax.jit(lambda c: lax.scan(body, c, None, length=inner)[0])
    t0 = time.perf_counter()
    o = g(jnp.float32(0)); jax.block_until_ready(o)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = g(o); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / inner
    print(f"{name:40s} {dt*1e3:9.2f} ms  (compile {tc:5.1f}s)", flush=True)
    return dt


# dispatch overhead
timeit("trivial (x+1)", lambda: x + 1.0)
# raw pieces at layer-1 shape
timeit("gather x[src] [E,64]", lambda: jnp.take(x, edges.src, axis=0))
timeit("gather msg_h[perm] [E,16]", lambda: jnp.take(msg_h, edges.bwd_perm, axis=0))
timeit("ragged_dot [E,64]x[91,64,16]", lambda: grouped_matmul(msg_d, w, edges.group_sizes, backend="ragged"))
timeit("ragged_dot [E,16]x[91,16,8]", lambda: grouped_matmul(msg_h, w2, edges.group_sizes, backend="ragged"))
timeit("xla segsum [E,16]->[N,16]", lambda: jax.ops.segment_sum(msg_h, edges.dst, num_segments=n))
if edges.dst_plan is not None:
    timeit("pallas segsum [E,16]->[N,16]", lambda: sorted_segment_sum_pallas(msg_h, edges.dst_sorted, edges.dst_plan))
    timeit("pallas segsum [E,64]->[N,64]", lambda: sorted_segment_sum_pallas(msg_d, edges.bwd_src, edges.bwd_plan))

# the composite op, fwd and fwd+bwd, both modes
for mode in ("edge", "prematmul"):
    timeit(f"aggregate fwd mode={mode}", lambda m=mode: relational_aggregate(x, w, edges, m, None))

    def fb(m=mode):
        def loss(xx, ww):
            return relational_aggregate(xx, ww, edges, m, None).sum()
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        return gx
    timeit(f"aggregate fwd+bwd mode={mode}", fb)

# dw kernel alone
from scaling_rgcn_training_tpu.ops import pallas_kernels
xs = jnp.take(x, edges.src, axis=0)
timeit("pallas _drhs dw [E,64]x[E,16]", lambda: pallas_kernels._drhs(xs, msg_h, edges.group_sizes, (slots, d, h)))
