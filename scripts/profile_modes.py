"""Head-to-head of conv dataflows at the bench shape: fused / prematmul / edge.

Set RGCN_FUSED_MAX_W_BYTES=0 to force the non-fused backward (large-N
write-once path) — the backward strategy is chosen at trace time from
fused_ok(), independent of the forward mode.

Run: python scripts/profile_modes.py
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
from scaling_rgcn_training_tpu.ops.rgcn_conv import relational_aggregate

n = int(os.environ.get("P_NODES", 200_000))
e = int(os.environ.get("P_EDGES", 4_000_000))
r = int(os.environ.get("P_RELS", 45))
d = int(os.environ.get("P_DIM", 64))
h = int(os.environ.get("P_OUT", 16))
inner = int(os.environ.get("P_INNER", 10))
only = os.environ.get("P_ONLY", "")
modes = os.environ.get("P_MODES", "prematmul,edge").split(",")

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)

x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
w = jnp.asarray(rng.standard_normal((slots, d, h)) * 0.1, jnp.float32)
x_h = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
w2 = jnp.asarray(rng.standard_normal((slots, h, 8)) * 0.1, jnp.float32)

print(f"N={n} E={e} slots={slots} d={d} h={h} inner={inner} "
      f"fused_max_w={os.environ.get('RGCN_FUSED_MAX_W_BYTES', 'default')}",
      flush=True)


def timeit(name, fn, *args):
    if only and only not in name:
        return None

    def run(c, *a):
        def b(cc, _):
            out = fn(*a)
            first = out[0] if isinstance(out, tuple) else out
            return cc + first.ravel()[0].astype(jnp.float32), None
        return lax.scan(b, c, None, length=inner)[0]

    g = jax.jit(run)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), *args); jax.block_until_ready(o)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = g(o, *args); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / inner
    print(f"{name:46s} {dt*1e3:9.2f} ms  (compile {tc:5.1f}s)", flush=True)
    return dt


bf = jnp.bfloat16
for mode in modes:
    def fwd(xx, ww, mode=mode):
        return relational_aggregate(xx, ww, edges, mode, None)

    def fb(xx, ww, mode=mode):
        def loss(a, b):
            return relational_aggregate(a, b, edges, mode, None).sum()
        return jax.grad(loss, argnums=(0, 1))(xx, ww)[0]

    timeit(f"L1 fwd ({mode}) f32", fwd, x, w)
    timeit(f"L1 fwd ({mode}) bf16", fwd, x.astype(bf), w.astype(bf))
    timeit(f"L1 fwd+bwd ({mode}) f32", fb, x, w)
    timeit(f"L2 fwd ({mode}) f32", fwd, x_h, w2)
    timeit(f"L2 fwd+bwd ({mode}) f32", fb, x_h, w2)
