"""Measure the halo compute/comm overlap claim (parallel/halo.py:13-21).

Two arms, same program, same mesh:
  overlapped — the shipped dataflow: owner-local aggregation has no data
               dependence on the all_to_all, so the scheduler may run them
               concurrently;
  blocked    — RGCN_HALO_BLOCK_OVERLAP=1 inserts an optimization_barrier
               that forces the join BEFORE the local aggregation.

Reports ms/step for both and the overlap gain. Also dumps whether the
compiled module uses async collective pairs (collective-start/done or
all-to-all-start), which is the scheduler-level evidence that the
exchange runs concurrently with local compute.

Default backend: the 8-virtual-device CPU mesh (the only multi-device
backend available in this environment — the machine has ONE real TPU
chip, so ICI overlap cannot be measured for real here; this script's
numbers are scheduling evidence, not ICI bandwidth evidence).

Run: python scripts/measure_overlap.py  (env: OV_NODES/OV_EDGES/OV_RELS/
OV_DIM/OV_OUT/OV_DEVICES/OV_INNER)
"""
import os
import sys
import time

# FORCE the CPU backend (not setdefault: the shell exports
# JAX_PLATFORMS=axon, and a 1-chip tunnel can't host a multi-device
# mesh). OV_BACKEND overrides for a real multi-chip slice.
os.environ["JAX_PLATFORMS"] = os.environ.get("OV_BACKEND", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count="
        + os.environ.get("OV_DEVICES", "8")).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax import lax

from scaling_rgcn_training_tpu.parallel import (
    device_put_halo_edges, halo_aggregate, halo_partition_edges)
from scaling_rgcn_training_tpu.parallel.mesh import make_mesh, put_global
from scaling_rgcn_training_tpu.parallel.halo import node_sharding, pad_node_array

n = int(os.environ.get("OV_NODES", 100_000))
e = int(os.environ.get("OV_EDGES", 1_000_000))
r = int(os.environ.get("OV_RELS", 12))
d = int(os.environ.get("OV_DIM", 64))
h = int(os.environ.get("OV_OUT", 16))
inner = int(os.environ.get("OV_INNER", 5))
s_n = len(jax.devices())

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1

mesh = make_mesh(s_n)
edges = device_put_halo_edges(
    halo_partition_edges(src, dst, typ, n, slots, s_n), mesh)
x = pad_node_array(jnp.asarray(rng.standard_normal((n, d)), jnp.float32), edges)
x = put_global(np.asarray(x), node_sharding(mesh))
w = jnp.asarray(rng.standard_normal((slots, d, h)) * 0.1, jnp.float32)

print(f"backend={jax.default_backend()} devices={s_n} N={n} E={e} "
      f"slots={slots} d={d}->{h} halo_rows={edges.halo}", flush=True)


# the ragged_dot grad/compile path is pathologically slow on the XLA CPU
# backend; the gather backend runs the identical collective structure
conv_backend = "gather" if jax.default_backend() == "cpu" else None


def arm(name: str):
    def agg_chain(c, xx, ww):
        def body(cc, _):
            out = halo_aggregate(xx * (1 + 1e-12 * cc), ww, edges, mesh,
                                 backend=conv_backend)
            return out.ravel()[0].astype(jnp.float32), None
        return lax.scan(body, c, None, length=inner)[0]

    g = jax.jit(agg_chain)
    lowered = g.lower(jnp.float32(0), x, w)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    async_markers = [m for m in
                     ("all-to-all-start", "collective-permute-start",
                      "async-start") if m in hlo]
    t0 = time.perf_counter()
    o = g(jnp.float32(0), x, w)
    jax.block_until_ready(o)
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(o, x, w)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{name:12s} {best*1e3:9.2f} ms/agg  (compile {tc:.1f}s)  "
          f"async collectives in HLO: {async_markers or 'none'}", flush=True)
    return best


os.environ.pop("RGCN_HALO_BLOCK_OVERLAP", None)
t_over = arm("overlapped")
os.environ["RGCN_HALO_BLOCK_OVERLAP"] = "1"
t_block = arm("blocked")
os.environ.pop("RGCN_HALO_BLOCK_OVERLAP", None)
print(f"overlap gain: {(t_block - t_over) * 1e3:.2f} ms "
      f"({(t_block / t_over - 1) * 100:.1f}% slower when blocked)")
