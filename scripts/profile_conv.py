"""Component breakdown of the conv pipeline on the real device."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scaling_rgcn_training_tpu.ops import build_rel_edges
from scaling_rgcn_training_tpu.ops.grouped_matmul import grouped_matmul

n = int(os.environ.get("P_NODES", 50_000))
e = int(os.environ.get("P_EDGES", 1_000_000))
r = int(os.environ.get("P_RELS", 20))
d = int(os.environ.get("P_DIM", 64))
h = int(os.environ.get("P_OUT", 16))
inner = int(os.environ.get("P_INNER", 20))

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


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: lax.scan(lambda c, _: (fn(*a) * 0.0 + c if False else c, fn(*a).sum()), jnp.float32(0), None, length=inner))
    # simpler: chain via scan with dependency to avoid DCE
    def body(c, _):
        out = fn(*args)
        return c + out.ravel()[0], None
    g = jax.jit(lambda c: lax.scan(body, c, None, length=inner)[0])
    o = g(jnp.float32(0)); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = g(o); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / inner
    print(f"{name:34s} {dt*1e3:8.2f} ms   {ep/dt/1e6:8.1f} M edges/s")
    return dt


print(f"N={n} E={e} (padded {ep}) R={r} slots={slots} d={d} h={h}", flush=True)
timeit("gather x[src] [E,d]", lambda: jnp.take(x, edges.src, axis=0))
timeit("ragged_dot [E,d]->[E,h]", lambda: grouped_matmul(msg_d, w, edges.group_sizes, backend="ragged"))
timeit("scale [E,h]", lambda: msg_h * edges.norm[:, None])
timeit("segment_sum [E,h]->[N,h]", lambda: jax.ops.segment_sum(msg_h, edges.dst, num_segments=n))
timeit("segment_sum sorted=True", lambda: jax.ops.segment_sum(msg_h, edges.dst, num_segments=n, indices_are_sorted=True))
timeit("segment_sum [E,d]->[N,d]", lambda: jax.ops.segment_sum(msg_d, edges.dst, num_segments=n))

def full_fwd():
    m = jnp.take(x, edges.src, axis=0)
    m = grouped_matmul(m, w, edges.group_sizes, backend="ragged")
    m = m * edges.norm[:, None]
    return jax.ops.segment_sum(m, edges.dst, num_segments=n)

timeit("full conv fwd", full_fwd)

def fwd_bwd():
    def loss(xx, ww):
        m = jnp.take(xx, edges.src, axis=0)
        m = grouped_matmul(m, ww, edges.group_sizes, backend="ragged")
        m = m * edges.norm[:, None]
        return jax.ops.segment_sum(m, edges.dst, num_segments=n).sum()
    g1, g2 = jax.grad(loss, argnums=(0, 1))(x, w)
    return g1

timeit("conv fwd+bwd", fwd_bwd)

# pallas forward
from scaling_rgcn_training_tpu.ops import pallas_kernels
timeit("pallas gmm fwd", lambda: pallas_kernels._fwd(msg_d, w, edges.group_sizes))
