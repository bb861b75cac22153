"""Gather concurrency + bounds-mode microbenchmarks.

profile_gather.py showed the row-gather engine is pinned at ~370M rows/s
independent of index order, dtype, and row width. Remaining levers:
  1. queue concurrency — split ONE gather into independent halves/quarters
     (disjoint outputs): if the engine can run >1 gather stream at a time,
     every gather in the step doubles up for free;
  2. bounds mode — jnp.take's default clamps indices; is there a
     measurable cost vs GatherScatterMode.PROMISE_IN_BOUNDS?
  3. fused scale — does `take(x, idx) * norm` cost more than the take
     (i.e., does XLA fuse the scale into the gather's consumer)?

Run: python scripts/profile_gather2.py
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
idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
norm = jnp.asarray(rng.random(e).astype(np.float32))
x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
x16 = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)

print(f"backend={jax.default_backend()} N={n} E={e} d={d}", flush=True)


def timeit(name, fn, *args):
    def run(c, *a):
        def b(cc, _):
            out = fn(cc, *a)
            return out.ravel()[0].astype(jnp.float32), None
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
    print(f"{name:44s} {best*1e3:8.2f} ms  {e/best/1e6:7.0f} M rows/s  "
          f"(compile {tc:4.1f}s)", flush=True)


def jitter(c, xx):
    return xx * (1 + 1e-12 * c)


timeit("take single", lambda c, xx: jnp.take(jitter(c, xx), idx, axis=0), x)
timeit("take split x2 (independent halves)",
       lambda c, xx: jnp.concatenate([
           jnp.take(jitter(c, xx), idx[:e // 2], axis=0),
           jnp.take(jitter(c, xx), idx[e // 2:], axis=0)]), x)
timeit("take split x4",
       lambda c, xx: jnp.concatenate([
           jnp.take(jitter(c, xx), idx[i * (e // 4):(i + 1) * (e // 4)],
                    axis=0) for i in range(4)]), x)
timeit("take promise_in_bounds",
       lambda c, xx: jnp.take(jitter(c, xx), idx, axis=0,
                              mode="promise_in_bounds"), x)
timeit("take + norm scale",
       lambda c, xx: jnp.take(jitter(c, xx), idx, axis=0)
       * norm[:, None].astype(xx.dtype), x)
timeit("two INDEPENDENT takes (x bf16 + x16 f32)",
       lambda c, xx: jnp.take(jitter(c, xx), idx, axis=0)[:, :16].astype(
           jnp.float32) + jnp.take(x16, idx, axis=0), x)
