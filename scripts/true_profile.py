"""Fetch-synced per-piece profiling (single process, single upload).

CRITICAL harness note: on the axon-tunneled TPU backend,
``jax.block_until_ready`` on a small output may return before the device
finishes (the dispatch queue absorbs the calls), so loop-timed numbers
can be wildly UNDER-measured — the r2-era per-piece numbers (3.6 ms fwd
kernel, 11 ms gather) were collected that way. This harness forces a
device->host fetch of the result (``float(...)``) inside the timing
loop, which cannot complete before the computation does.

Run: python scripts/true_profile.py  (env: P_NODES/P_EDGES/P_RELS/P_DIM/
P_OUT/P_INNER)
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
    rel_span_backward_scatter, rel_span_matmul_scatter)

n = int(os.environ.get("P_NODES", 200_000))
e = int(os.environ.get("P_EDGES", 4_000_000))
r = int(os.environ.get("P_RELS", 45))
d = int(os.environ.get("P_DIM", 64))
h = int(os.environ.get("P_OUT", 16))
inner = int(os.environ.get("P_INNER", 10))
c_dim = 8

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)
fsp, bsp = edges.fspan, edges.bspan

bf = jnp.bfloat16
ops = {
    "fsp": fsp, "bsp": bsp,
    "x": jnp.asarray(rng.standard_normal((n, d)), bf),
    "x16": jnp.asarray(rng.standard_normal((n, h)), bf),
    "g16": jnp.asarray(rng.standard_normal((n, h)), jnp.float32),
    "g8": jnp.asarray(rng.standard_normal((n, c_dim)), jnp.float32),
    "w": jnp.asarray(rng.standard_normal((slots, d, h)) * 0.1, bf),
    "w2": jnp.asarray(rng.standard_normal((slots, h, c_dim)) * 0.1, bf),
    "vals_d": jnp.asarray(rng.standard_normal((fsp.padded_edges, d)), bf),
    "vals_h": jnp.asarray(rng.standard_normal((fsp.padded_edges, h)), bf),
    "t_h": jnp.asarray(rng.standard_normal((bsp.padded_edges, h)), bf),
    "t_8": jnp.asarray(rng.standard_normal((bsp.padded_edges, c_dim)), bf),
}

print(f"N={n} E={e} (pad {fsp.padded_edges}) slots={slots} d={d}->{h} "
      f"inner={inner} backend={jax.default_backend()}", flush=True)

results = {}


def timeit(name, fn):
    @jax.jit
    def run(c, o):
        def b(cc, _):
            return cc + fn(cc, o).astype(jnp.float32), None
        return lax.scan(b, c, None, length=inner)[0]

    t0 = time.perf_counter()
    o = run(jnp.float32(0), ops)
    v = float(o)                      # forced fetch = true completion
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(o, ops)
        v = float(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    results[name] = best * 1e3
    print(f"{name:42s} {best*1e3:9.2f} ms  (compile+first {tc:5.1f}s)",
          flush=True)


def nud(c, a):
    return a * (1 + 1e-12 * c).astype(a.dtype)


timeit("L1 fwd kernel", lambda c, o: rel_span_matmul_scatter(
    nud(c, o["vals_d"]), o["fsp"], o["w"]).ravel()[0])
timeit("L2 fwd kernel", lambda c, o: rel_span_matmul_scatter(
    nud(c, o["vals_h"]), o["fsp"], o["w2"]).ravel()[0])


def bwd1(c, o):
    dx, dw = rel_span_backward_scatter(nud(c, o["t_h"]), o["bsp"],
                                       o["x"], o["w"])
    return dx.ravel()[0] + dw.ravel()[0]


def bwd2(c, o):
    dx, dw = rel_span_backward_scatter(nud(c, o["t_8"]), o["bsp"],
                                       o["x16"], o["w2"])
    return dx.ravel()[0] + dw.ravel()[0]


timeit("L1 bwd kernel", bwd1)
timeit("L2 bwd kernel", bwd2)

timeit("gather [Ep,64]bf16 from [N,64]", lambda c, o: jnp.take(
    nud(c, o["x"]), o["fsp"].gather_idx, axis=0).ravel()[0])
timeit("gather [Ep,16]f32 from [N,16]", lambda c, o: jnp.take(
    nud(c, o["g16"]), o["bsp"].gather_idx, axis=0).ravel()[0])
timeit("gather [Ep,8]f32 from [N,8]", lambda c, o: jnp.take(
    nud(c, o["g8"]), o["bsp"].gather_idx, axis=0).ravel()[0])
timeit("gather+kernel L1 fwd (in situ)", lambda c, o: rel_span_matmul_scatter(
    jnp.take(nud(c, o["x"]), o["fsp"].gather_idx, axis=0), o["fsp"],
    o["w"]).ravel()[0])

tot = (results.get("L1 fwd kernel", 0) + results.get("L2 fwd kernel", 0)
       + results.get("L1 bwd kernel", 0) + results.get("L2 bwd kernel", 0))
print(f"\nkernel sum: {tot:.1f} ms", flush=True)
