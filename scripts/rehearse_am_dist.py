"""AM-scale DISTRIBUTED rehearsal: the halo train step at AM dimensions on
the 8-device virtual mesh + the ICI wire-traffic model (VERDICT r4 #4).

One real chip is all this environment has, so the honest multi-chip
evidence at the reference's flagship scale (AM: ~1.6M entities, 12M
directed edges, 133 relations -> 267 slots; BASELINE.md) is:

1. CORRECTNESS + HOST CEILING: the full node-partitioned halo train step
   (fwd, loss, bwd, Adam — the same program a TPU pod would run, with
   `lax.all_to_all` halo exchanges) jitted and EXECUTED over 8 virtual CPU
   devices at the full AM shape, with peak host memory recorded.
2. ICI TRAFFIC MODEL: computed bytes/step on the wire per device for the
   halo exchange — `2 directions x (S-1) x H x (d_l1 + d_l2) x esize` (one
   all_to_all per conv layer forward + its reverse in the backward) — for
   a locality-free uniform graph AND a community-structured (SBM) graph,
   each with and without the locality reorder (parallel/reorder.py), plus
   the TRUE (unpadded) boundary-row counts the padded H covers.
3. PLAN-CACHE TIMING: cold halo-partition build vs on-disk cache hit
   (utils/plancache.py).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/rehearse_am_dist.py
Env: AM_NODES/AM_EDGES/AM_RELS/AM_DIM/AM_HIDDEN, AM_DIST_OUT,
     AM_STEP=0 to skip the executed step (traffic model only).
"""
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_rgcn_training_tpu.utils import jaxcache

jaxcache.enable()

import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from scaling_rgcn_training_tpu.ops import init_rgcn_layer
from scaling_rgcn_training_tpu.parallel import (
    make_mesh, halo_partition_edges, device_put_halo_edges, halo_rgcn_conv,
    locality_reorder, padded_num_nodes, node_sharding)
from scaling_rgcn_training_tpu.train.losses import bce_loss

n = int(os.environ.get("AM_NODES", 1_600_000))
e = int(os.environ.get("AM_EDGES", 12_000_000))
r = int(os.environ.get("AM_RELS", 133))
d = int(os.environ.get("AM_DIM", 64))
hl = int(os.environ.get("AM_HIDDEN", 16))
c = 11
slots = 2 * r + 1
S = 8
esize = 2  # bf16 halo rows (mixed precision reaches the distributed paths)

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log(f"AM dist rehearsal: N={n} E={e} R={r} S={S} backend={jax.default_backend()}")

rng = np.random.default_rng(0)
typ = rng.integers(0, 2 * r, e).astype(np.int32)


def gen(kind):
    if kind == "uniform":
        return (rng.integers(0, n, e).astype(np.int32),
                rng.integers(0, n, e).astype(np.int32))
    # SBM-style: 512 communities, 90% intra-community edges (the premise
    # of the locality reorder; real RDF KGs are community-structured)
    n_comm, p_in = 512, 0.9
    comm = rng.integers(0, n_comm, n)
    order_c = np.argsort(comm, kind="stable")
    csize = np.bincount(comm, minlength=n_comm)
    coff = np.concatenate([[0], np.cumsum(csize)])
    intra = rng.random(e) < p_in
    ei = int(intra.sum())
    ci_ = rng.integers(0, n_comm, ei)
    pick = lambda: order_c[coff[ci_]
                           + (rng.random(ei) * csize[ci_]).astype(np.int64)]
    src = np.empty(e, np.int64)
    dst = np.empty(e, np.int64)
    src[intra], dst[intra] = pick(), pick()
    m = e - ei
    src[~intra] = rng.integers(0, n, m)
    dst[~intra] = rng.integers(0, n, m)
    return src.astype(np.int32), dst.astype(np.int32)


def true_boundary_rows(src, dst, n_per):
    """Unpadded count of (reader shard, remote src row) pairs — the rows
    that MUST cross the wire per layer, before halo padding."""
    so = src.astype(np.int64) // n_per
    do = dst.astype(np.int64) // n_per
    cross = so != do
    pairs = np.unique(do[cross] * (n + 1) + src[cross].astype(np.int64))
    return int(len(pairs))


arms = []
step_arm_edges = None
for kind in ("uniform", "sbm"):
    src0, dst0 = gen(kind)
    for reorder in (False, True):
        src, dst = src0, dst0
        t0 = time.perf_counter()
        if reorder:
            perm = locality_reorder(src0, dst0, n, num_shards=S)
            src, dst = perm[src0], perm[dst0]
        t_reorder = time.perf_counter() - t0
        n_per = -(-n // S)
        t0 = time.perf_counter()
        hedges = halo_partition_edges(src, dst, typ, n, slots, S,
                                      pad_to_multiple=512)
        t_plan = time.perf_counter() - t0
        H = int(hedges.halo)
        true_rows = true_boundary_rows(src, dst, n_per)
        # one all_to_all per conv layer fwd + its reverse in the bwd;
        # each device ships (S-1) peers x H rows x layer width
        wire_per_dev = 2 * (S - 1) * H * (d + hl) * esize
        arm = {
            "graph": kind, "reorder": reorder,
            "halo_rows_padded_per_peer": H,
            "halo_rows_padded_per_device": (S - 1) * H,
            "true_boundary_rows_total": true_rows,
            "true_boundary_rows_per_device_avg": round(true_rows / S, 1),
            "wire_bytes_per_step_per_device": wire_per_dev,
            "wire_MB_per_step_per_device": round(wire_per_dev / 1e6, 2),
            "plan_build_s": round(t_plan, 1),
            "reorder_s": round(t_reorder, 1),
        }
        log(f"  {kind} reorder={reorder}: H={H}/peer "
            f"({arm['wire_MB_per_step_per_device']} MB/step/dev wire), "
            f"plan {t_plan:.0f}s")
        arms.append(arm)
        if kind == "uniform" and not reorder:
            step_arm_edges = hedges
        else:
            del hedges

# derived: reorder effect per graph kind
eff = {}
for kind in ("uniform", "sbm"):
    base = next(a for a in arms if a["graph"] == kind and not a["reorder"])
    reo = next(a for a in arms if a["graph"] == kind and a["reorder"])
    eff[kind] = round(reo["wire_bytes_per_step_per_device"]
                      / base["wire_bytes_per_step_per_device"], 3)

# plan-cache timing on the uniform arm
cache_dir = os.environ.get("AM_DIST_PLAN_CACHE", "/tmp/am_dist_plans")
src0, dst0 = gen("uniform")  # rng advanced; rebuild deterministically? key
# the cache round-trip uses the SAME arrays both times, so key stability
# within this process is what matters
t0 = time.perf_counter()
halo_partition_edges(src0, dst0, typ, n, slots, S, pad_to_multiple=512,
                     cache_dir=cache_dir)
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
halo_partition_edges(src0, dst0, typ, n, slots, S, pad_to_multiple=512,
                     cache_dir=cache_dir)
t_hit = time.perf_counter() - t0
log(f"plan cache: cold {t_cold:.1f}s -> hit {t_hit:.1f}s")

executed = None
# Full-AM execution over 8 virtual CPU devices OOMs the 125 GB host (r5,
# oom-killer at 130 GB RSS): the CPU gather backend materializes [E, d]
# autodiff residuals per shard — buffers the TPU fused-span path never
# allocates — so the emulation, not the program, is the ceiling. The
# executed arm therefore runs at AM_STEP_SCALE of the shape (default 1/2)
# and the artifact records both the scale and the full-shape OOM fact.
step_scale = float(os.environ.get("AM_STEP_SCALE", 0.5))
if os.environ.get("AM_STEP", "1") != "0" and len(jax.devices()) >= S:
    del step_arm_edges
    import gc

    gc.collect()
    n_s, e_s = int(n * step_scale), int(e * step_scale)
    src_s, dst_s = gen("uniform")
    src_s, dst_s = src_s[:e_s] % n_s, dst_s[:e_s] % n_s
    step_edges = halo_partition_edges(src_s, dst_s, typ[:e_s], n_s, slots, S,
                                      pad_to_multiple=512)
    mesh = make_mesh(S)
    hedges = device_put_halo_edges(step_edges, mesh)
    n_pad = padded_num_nodes(hedges)
    from jax.sharding import NamedSharding, PartitionSpec as P

    emb = jax.device_put(jax.random.normal(jax.random.key(0), (n_pad, d)),
                         node_sharding(mesh))
    rep = NamedSharding(mesh, P())
    l1 = jax.device_put(init_rgcn_layer(jax.random.key(1), slots, d, hl), rep)
    l2 = jax.device_put(init_rgcn_layer(jax.random.key(2), slots, hl, c), rep)
    opt = optax.adam(0.01)
    params = (emb, l1, l2)
    state = opt.init(params)
    y = jax.device_put(jax.nn.one_hot(np.arange(8192) % c, c), rep)
    idx = jax.device_put(jnp.arange(8192), rep)
    conv_backend = "gather" if jax.default_backend() == "cpu" else None

    @jax.jit
    def step(ps, st, he):
        def loss_of(p):
            e_, a_, b_ = p
            z = jax.nn.relu(halo_rgcn_conv(e_, he, a_, mesh,
                                           backend=conv_backend,
                                           compute_dtype=jnp.bfloat16))
            logits = halo_rgcn_conv(z, he, b_, mesh, backend=conv_backend,
                                    compute_dtype=jnp.bfloat16)
            return bce_loss(logits[idx], y)

        loss, grads = jax.value_and_grad(loss_of)(ps)
        updates, st2 = opt.update(grads, st)
        return optax.apply_updates(ps, updates), st2, loss

    t0 = time.perf_counter()
    params, state, loss = step(params, state, hedges)
    jax.block_until_ready(params)
    t_compile_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    params, state, loss = step(params, state, hedges)
    jax.block_until_ready(params)
    t_step = time.perf_counter() - t0
    executed = {
        "devices": S,
        "hardware": jax.default_backend(),
        "nodes": n_s, "edges": e_s, "scale_of_am": step_scale,
        "compile_plus_first_step_s": round(t_compile_first, 1),
        "second_step_s": round(t_step, 1),
        "loss_finite": bool(np.isfinite(float(loss))),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "full_shape_emulation": "OOM-killed at 130 GB RSS on the 125 GB "
            "host (r5): the CPU gather backend holds [E, d] autodiff "
            "residuals per shard that the TPU fused-span path never "
            "materializes — the emulation is the ceiling, not the program",
        "note": "virtual CPU mesh: validates the distributed program + "
                "host-memory ceiling, NOT hardware step time",
    }
    log(f"executed step: compile+first {t_compile_first:.0f}s, "
        f"second {t_step:.0f}s, loss finite={executed['loss_finite']}, "
        f"peak RSS {executed['peak_host_rss_gb']} GB")

rec = {
    "config": "AM-scale synthetic, node-partitioned halo SPMD, S=8",
    "nodes": n, "edges": e, "relations": r, "emb_dim": d, "hidden": hl,
    "halo_dtype": "bfloat16",
    "traffic_model": arms,
    "reorder_wire_ratio": eff,
    "wire_model": "2 dirs x (S-1) x H x (d_l1 + d_l2) x 2B "
                  "(one all_to_all per conv layer fwd + reverse in bwd)",
    "ici_context_v5e": "per-chip ICI ~ 400 GB/s full-duplex: even the "
                       "worst uniform-graph arm's MB/step is sub-ms on "
                       "the wire; the exchange is latency/overlap-bound, "
                       "not bandwidth-bound (OVERLAP_r04.json schedule)",
    "plan_cache": {"cold_s": round(t_cold, 1), "hit_s": round(t_hit, 1)},
    "executed_step": executed,
    "reference_anchor": "AM baseline 90.48% @ 101 epochs "
                        "(baselines/AM_baseline/report_baseline_i=5.json)",
}
print(json.dumps(rec))
out = os.environ.get("AM_DIST_OUT", os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "AMSCALE_DIST_r05.json"))
with open(out, "w") as fh:
    json.dump(rec, fh, indent=2)
log(f"wrote {out}")
