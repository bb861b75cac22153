"""AM-scale rehearsal: the full fused train step at AM dimensions, 1 chip.

AM is the reference's largest dataset (~1.6M entities, ~6M triples -> 12M
directed edges after the 2r/2r+1 doubling, 133 relations; BASELINE.md,
reference baselines/AM_baseline/report_baseline_i=5.json: 90.48% @ 101
epochs). The real .nt is a missing LFS blob, so this rehearses the SHAPE:
synthetic uniform graph at AM scale through the bench-identical 2-layer
R-GCN train step (fwd+bwd+Adam, bf16 streams / f32 accumulation).

Records step time, edges/s/chip, device memory stats -> AMSCALE_r04.json
(override with AM_OUT).

Run: python scripts/rehearse_am.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_rgcn_training_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import optax

from scaling_rgcn_training_tpu.models import apply_emb_model, init_emb_model
from scaling_rgcn_training_tpu.ops import build_rel_edges
from scaling_rgcn_training_tpu.train.losses import bce_loss
from scaling_rgcn_training_tpu.train.optim import make_optimizer

n = int(os.environ.get("AM_NODES", 1_600_000))
e = int(os.environ.get("AM_EDGES", 12_000_000))
r = int(os.environ.get("AM_RELS", 133))
d = int(os.environ.get("AM_DIM", 64))
hl = int(os.environ.get("AM_HIDDEN", 16))
c = 11
inner = int(os.environ.get("AM_INNER", 5))
calls = int(os.environ.get("AM_CALLS", 3))

print(f"AM-scale rehearsal: N={n} E={e} R={r} d={d} hl={hl} "
      f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

t0 = time.perf_counter()
rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
# AM_PLAN_CACHE: exercise the on-disk plan cache (utils/plancache.py) —
# the second run loads the ~minutes-long plan build in seconds
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512,
                        cache_dir=os.environ.get("AM_PLAN_CACHE") or None)
t_plan = time.perf_counter() - t0
print(f"plan build: {t_plan:.1f}s (padded edges "
      f"{edges.fspan.padded_edges})", file=sys.stderr, flush=True)

params = init_emb_model(jax.random.key(0), slots, hl, c, n, d)
optimizer = make_optimizer(0.01, 5e-5)
opt_state = optimizer.init(params)
n_lab = 8192
x_train = jnp.asarray(rng.choice(n, n_lab, replace=False).astype(np.int32))
y_train = jax.nn.one_hot(jnp.arange(n_lab) % c, c)


def step_body(ed, carry, _):
    p, s = carry

    def loss_of(pp):
        logits = apply_emb_model(pp, ed, backend=None,
                                 compute_dtype=jnp.bfloat16)
        return bce_loss(logits[x_train], y_train)

    loss, grads = jax.value_and_grad(loss_of)(p)
    updates, s2 = optimizer.update(grads, s, p)
    return (optax.apply_updates(p, updates), s2), loss


# donate params+opt state: at AM scale the Adam triple is ~1.3 GB f32 and
# an un-donated in/out pair was part of a 20.05G > 15.75G HBM overflow
@functools.partial(jax.jit, donate_argnums=(0, 1))
def run(p, s, ed):
    (p, s), losses = jax.lax.scan(
        lambda cc, _: step_body(ed, cc, _), (p, s), None, length=inner)
    return p, s, losses[-1]


t0 = time.perf_counter()
p, s, loss = run(params, opt_state, edges)
jax.block_until_ready(p)
print(f"compile+first call: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)
t0 = time.perf_counter()
for _ in range(calls):
    p, s, loss = run(p, s, edges)
jax.block_until_ready(p)
dt = (time.perf_counter() - t0) / (calls * inner)

mem = {}
try:
    stats = jax.local_devices()[0].memory_stats() or {}
    mem = {k: int(v) for k, v in stats.items()
           if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
except Exception:
    pass

rec = {
    "config": "AM-scale synthetic (BASELINE configs[4] shape analog)",
    "nodes": n, "edges": e, "relations": r, "emb_dim": d, "hidden": hl,
    "ms_per_step": round(dt * 1e3, 2),
    "edge_traversals_per_s": round(e * 2 / dt, 1),
    "compute_dtype": "bfloat16",
    "loss_finite": bool(np.isfinite(float(loss))),
    "plan_build_s": round(t_plan, 1),
    "device_memory": mem,
    "reference_anchor": "AM baseline 90.48% @ 101 epochs "
                        "(baselines/AM_baseline/report_baseline_i=5.json)",
}
print(json.dumps(rec))
out = os.environ.get("AM_OUT", os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "AMSCALE_r04.json"))
with open(out, "w") as fh:
    json.dump(rec, fh, indent=2)
