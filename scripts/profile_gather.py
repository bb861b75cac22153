"""Microbenchmark: XLA row-gather rate vs index ordering on the TPU.

The fused step's largest remaining slice is 4 x [Ep]-row gathers
(PERF.md: ~360M rows/s, row-overhead-bound). The span plans are free to
reorder edges WITHIN a (bucket, relation) run without changing kernel
semantics — if monotonic source indices gather faster (coalescing in the
gather engine), sorting runs by gather_idx is a zero-cost win.

Run: python scripts/profile_gather.py  (env: G_NODES/G_EDGES/G_DIM/G_INNER)
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

n = int(os.environ.get("G_NODES", 200_000))
e = int(os.environ.get("G_EDGES", 4_194_304))
d = int(os.environ.get("G_DIM", 64))
inner = int(os.environ.get("G_INNER", 10))

rng = np.random.default_rng(0)
idx_rand = rng.integers(0, n, e).astype(np.int32)
idx_sorted = np.sort(idx_rand)
# span-like: sorted within 1024-row runs only
idx_runs = idx_rand.reshape(-1, 1024).copy()
idx_runs.sort(axis=1)
idx_runs = idx_runs.reshape(-1)
# run-sorted at realistic run length (~E/(buckets*rels-per-bucket) ~ 128)
idx_runs128 = idx_rand.reshape(-1, 128).copy()
idx_runs128.sort(axis=1)
idx_runs128 = idx_runs128.reshape(-1)

print(f"backend={jax.default_backend()} N={n} E={e} d={d}", flush=True)


def timeit(name, idx, x):
    idx = jnp.asarray(idx)

    def run(c, xx):
        def b(cc, _):
            out = jnp.take(xx * (1 + 1e-12 * cc), idx, axis=0)
            return out.ravel()[0].astype(jnp.float32), None
        return lax.scan(b, c, None, length=inner)[0]

    g = jax.jit(run)
    t0 = time.perf_counter()
    o = g(jnp.float32(0), x); float(o)  # forced fetch: block_until_ready under-blocks on axon
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, x); float(o)  # forced fetch: block_until_ready under-blocks on axon
        best = min(best, (time.perf_counter() - t0) / inner)
    rate = e / best / 1e6
    print(f"{name:38s} {best*1e3:8.2f} ms  {rate:7.0f} M rows/s  "
          f"(compile {tc:4.1f}s)", flush=True)


for dt, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
    x = jnp.asarray(rng.standard_normal((n, d)), dt)
    timeit(f"[{e//1000}k,{d}] {tag} random idx", idx_rand, x)
    timeit(f"[{e//1000}k,{d}] {tag} fully sorted idx", idx_sorted, x)
    timeit(f"[{e//1000}k,{d}] {tag} 1024-run-sorted idx", idx_runs, x)
    timeit(f"[{e//1000}k,{d}] {tag} 128-run-sorted idx", idx_runs128, x)
