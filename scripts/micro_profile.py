"""DCE/hoist-proof micro timing of conv pipeline pieces on the device.

Each iteration perturbs one element of the op's first array input with the
carried scalar (forces re-execution; costs one [1,1] dynamic-update) and
carries sum(out) (forces the op's value to be consumed). Sums fuse into op
epilogues, so pure-gather numbers measure the read side; pallas outputs
are always materialized.

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


def timeit(name, fn, first, *rest):
    """fn(first, *rest) -> array. Perturb first[0,0] by the carry scalar."""
    if only and only not in name:
        return None

    def run(t0, a, *others):
        def body(t, _):
            a2 = lax.dynamic_update_slice(a, t[None, None].astype(a.dtype), (0, 0))
            out = fn(a2, *others)
            return jnp.sum(out).astype(jnp.float32) * 1e-20, None

        return lax.scan(body, t0, None, length=inner)[0]

    g = jax.jit(run)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), first, *rest); jax.block_until_ready(o)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = g(o, first, *rest); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / inner
    print(f"{name:46s} {dt*1e3:9.2f} ms  (compile {tc:5.1f}s)", flush=True)
    return dt


timeit("baseline: perturb+sum only [E,16]", lambda m: m, msg_h)
timeit("gather x[src] [N,64]->[E,64]", lambda xx, ss: jnp.take(xx, ss, axis=0), x, edges.src)
timeit("gather msg[perm] [E,16]->[E,16]", lambda m, p: jnp.take(m, p, axis=0), msg_h, edges.bwd_perm)
timeit("gather msg[perm] [E,64]->[E,64]", lambda m, p: jnp.take(m, p, axis=0), msg_d, edges.bwd_perm)
timeit("ragged_dot [E,64]->[E,16]",
       lambda a, b: grouped_matmul(a, b, edges.group_sizes, backend="ragged"), msg_d, w)
timeit("ragged_dot [E,16]->[E,8]",
       lambda a, b: grouped_matmul(a, b, edges.group_sizes, backend="ragged"),
       msg_h, jnp.asarray(rng.standard_normal((slots, h, 8)) * 0.1, jnp.float32))
timeit("pallas gmm [E,64]->[E,16]",
       lambda a, b: grouped_matmul(a, b, edges.group_sizes, backend="pallas"), msg_d, w)
timeit("xla segsum dst [E,16]->[N,16]",
       lambda m, dd: jax.ops.segment_sum(m, dd, num_segments=n), msg_h, edges.dst)
timeit("pallas segsum [E,16]->[N,16]",
       lambda m: sorted_segment_sum_pallas(m, edges.dst_sorted, edges.dst_plan), msg_h)
timeit("pallas segsum [E,64]->[N,64]",
       lambda m: sorted_segment_sum_pallas(m, edges.bwd_src, edges.bwd_plan), msg_d)
timeit("perm+pallas segsum [E,16]->[N,16]",
       lambda m: sorted_segment_sum_pallas(
           jnp.take(m, edges.dst_perm, axis=0), edges.dst_sorted, edges.dst_plan), msg_h)

from scaling_rgcn_training_tpu.ops import pallas_kernels
timeit("pallas _drhs [E,64]x[E,16]->[slots,64,16]",
       lambda a, b: pallas_kernels._drhs(a, b, edges.group_sizes, (slots, d, h)),
       msg_d, msg_h)
