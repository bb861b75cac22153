"""TPU-scheduler overlap evidence via topology-AOT compilation.

The 8-virtual-device CPU mesh cannot witness compute/comm overlap: the
XLA CPU backend emits no async collective pairs at all (measured —
scripts/measure_overlap.py prints `async collectives in HLO: none`).
This script compiles the SAME halo aggregation for a real **v5e:2x4
8-chip topology** (AOT — no chips needed, jax.experimental.topologies)
and inspects the *scheduled* TPU HLO:

- does the exchange lower to an async pair (`all-to-all-start` /
  `all-to-all-done`)?
- how many real ops does the scheduler place BETWEEN start and done —
  i.e. the owner-local aggregation the dataflow freed from the
  collective (parallel/halo.py:13-21) — in the shipped arm vs the
  RGCN_HALO_BLOCK_OVERLAP=1 barrier arm?

Writes OVERLAP_r05.json at the repo root.

Run: python scripts/aot_overlap.py   (env: OV_* as measure_overlap.py)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scaling_rgcn_training_tpu.parallel import halo_partition_edges
from scaling_rgcn_training_tpu.parallel.halo import halo_aggregate
from scaling_rgcn_training_tpu.parallel.mesh import EDGE_AXIS

n = int(os.environ.get("OV_NODES", 100_000))
e = int(os.environ.get("OV_EDGES", 1_000_000))
r = int(os.environ.get("OV_RELS", 12))
d = int(os.environ.get("OV_DIM", 64))
h = int(os.environ.get("OV_OUT", 16))
topo_name = os.environ.get("OV_TOPO", "v5e:2x4")

topo = topologies.get_topology_desc(platform="tpu", topology_name=topo_name)
devs = np.asarray(topo.devices)
s_n = devs.size
mesh = Mesh(devs, (EDGE_AXIS,))
print(f"AOT topology {topo_name}: {s_n} devices", flush=True)

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = halo_partition_edges(src, dst, typ, n, slots, s_n)
n_pad = edges.n_per * s_n

node_sh = NamedSharding(mesh, P(EDGE_AXIS))
rep = NamedSharding(mesh, P())
x_t = jax.ShapeDtypeStruct((n_pad, d), jnp.float32, sharding=node_sh)
w_t = jax.ShapeDtypeStruct((slots, d, h), jnp.float32, sharding=rep)

# the plan arrays ride as jit arguments, shard-axis-sharded like at runtime
edge_sh = jax.tree_util.tree_map(
    lambda a: jax.ShapeDtypeStruct(
        a.shape, a.dtype,
        sharding=NamedSharding(mesh, P(EDGE_AXIS, *([None] * (a.ndim - 1))))),
    edges)


# async all-to-all must be requested explicitly on this XLA version —
# the default lowering emits a SYNCHRONOUS all-to-all (measured on this
# exact program: 1x `all-to-all`, no start/done pair). The framework
# enables the flag in parallel/mesh.py; here it rides as a compile option.
_ASYNC_OPTS = {"xla_tpu_enable_async_all_to_all": "true"}


def compile_arm(blocked: bool):
    os.environ.pop("RGCN_HALO_BLOCK_OVERLAP", None)
    if blocked:
        os.environ["RGCN_HALO_BLOCK_OVERLAP"] = "1"

    # fresh function object per arm: the env knob is read at TRACE time,
    # and jit's lowering cache would otherwise serve the first arm's trace
    def agg(x, w, ed):
        return halo_aggregate(x, w, ed, mesh)

    lowered = jax.jit(agg).lower(x_t, w_t, edge_sh)
    compiled = lowered.compile(compiler_options=_ASYNC_OPTS)
    txt = compiled.as_text()
    os.environ.pop("RGCN_HALO_BLOCK_OVERLAP", None)
    return txt


def analyze(txt: str):
    lines = txt.splitlines()
    starts = [i for i, l in enumerate(lines) if "all-to-all-start" in l]
    dones = [i for i, l in enumerate(lines)
             if "all-to-all-done" in l and "=" in l]
    # ops the scheduler placed between the async start and its done in
    # the entry computation's instruction order (post-scheduling order)
    between = 0
    fusions_between = 0
    if starts and dones:
        lo, hi = starts[0], dones[0]
        for l in lines[lo + 1:hi]:
            ls = l.strip()
            if "=" in ls and not ls.startswith("ROOT"):
                between += 1
                if "fusion" in ls or "custom-call" in ls:
                    fusions_between += 1
    return {
        "async_all_to_all": bool(starts and dones),
        "n_start": len(starts), "n_done": len(dones),
        "ops_between_start_done": between,
        "fusions_or_kernels_between": fusions_between,
    }


res = {}
for name, blocked in [("overlapped", False), ("blocked", True)]:
    try:
        txt = compile_arm(blocked)
        res[name] = analyze(txt)
        print(name, res[name], flush=True)
    except Exception as ex:
        res[name] = {"error": repr(ex)[:400]}
        print(name, "FAILED:", repr(ex)[:200], flush=True)

doc = {
    "evidence": "topology-AOT compiled TPU HLO schedule (no chips needed)",
    "topology": topo_name,
    "config": {"nodes": n, "edges": e, "slots": slots, "d": d, "h": h,
               "halo_rows": int(edges.halo)},
    "interpretation": (
        "async_all_to_all: the exchange lowers to an async "
        "start/done pair on the TPU backend. ops_between_start_done: "
        "instructions the TPU scheduler placed between collective-start "
        "and collective-done — the owner-local aggregation overlapping "
        "the wire. The blocked arm (optimization_barrier before the "
        "local work) should show ~0 ops between the pair."),
    "arms": res,
}
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "OVERLAP_r05.json")
with open(out, "w") as f:
    json.dump(doc, f, indent=2)
print("wrote", out, flush=True)
