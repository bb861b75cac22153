"""Ablation timing of the 2-layer R-GCN train step at the bench shape.

Each variant is a REAL chained computation (scan carries params), so
nothing can be DCE'd or hoisted. Run one variant per process:
    ABLATE=<name> python scripts/ablate_step.py
Variants:
    full        fwd+bwd+adam (the bench step)
    fwd         forward + loss only
    noagg       full, but conv = x @ root + bias only (no aggregation)
    l1only      full, single conv layer (d->hl) + loss on it
    l2only      full, single conv layer at layer-2 shape (hl->c)
    stopgrad_agg  full, but gradients do not flow through the aggregate
                  (isolates the aggregate backward's cost)
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
import optax

from scaling_rgcn_training_tpu.ops import grouped_matmul as _gm_mod
from scaling_rgcn_training_tpu.ops.grouped_matmul import set_default_backend

set_default_backend(os.environ.get("BENCH_BACKEND", "ragged"))

from scaling_rgcn_training_tpu.models import init_emb_model
from scaling_rgcn_training_tpu.ops import build_rel_edges
from scaling_rgcn_training_tpu.ops.rgcn_conv import (
    relational_aggregate, rgcn_conv, _edge_traffic_mode)
from scaling_rgcn_training_tpu.train.losses import bce_loss
from scaling_rgcn_training_tpu.train.optim import make_optimizer

n = int(os.environ.get("BENCH_NODES", 200_000))
e = int(os.environ.get("BENCH_EDGES", 4_000_000))
r = int(os.environ.get("BENCH_RELS", 45))
d = int(os.environ.get("BENCH_DIM", 64))
hl = int(os.environ.get("BENCH_HIDDEN", 16))
c = 8
inner = int(os.environ.get("BENCH_INNER", 10))
calls = int(os.environ.get("BENCH_CALLS", 3))
variant = os.environ.get("ABLATE", "full")
cd = os.environ.get("BENCH_COMPUTE_DTYPE") or None

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)

params = init_emb_model(jax.random.key(0), slots, hl, c, n, d)
optimizer = make_optimizer(0.01, 5e-5)
opt_state = optimizer.init(params)
n_lab = 4096
x_train = jnp.asarray(rng.choice(n, n_lab, replace=False).astype(np.int32))
y_train = jax.nn.one_hot(jnp.arange(n_lab) % c, c)


def conv(x, p, ed, agg=True, stop=False):
    if not agg:
        return x @ p.root + p.bias
    out = rgcn_conv(x, ed, p, compute_dtype=cd)
    if stop:
        # value flows, gradient through the aggregate is cut: backward
        # ablation (root/bias still train)
        lin = x @ p.root + p.bias
        return lin + jax.lax.stop_gradient(out - lin)
    return out


def logits_of(p, ed):
    if variant == "l1only":
        z = conv(p.embedding, p.rgcn1, ed)
        return z[:, :c]
    if variant == "l2only":
        x2 = p.embedding[:, :hl]
        return conv(x2, p.rgcn2, ed)
    agg = variant != "noagg"
    stop = variant == "stopgrad_agg"
    z = jax.nn.relu(conv(p.embedding, p.rgcn1, ed, agg, stop))
    return conv(z, p.rgcn2, ed, agg, stop)


def step(ed, carry, _):
    p, s = carry

    def loss_of(pp):
        return bce_loss(logits_of(pp, ed)[x_train], y_train)

    if variant == "fwd":
        loss = loss_of(p)
        # chain: nudge embedding by the loss so nothing is hoisted/DCE'd
        p = p._replace(embedding=p.embedding * (1 - 1e-12 * loss))
        return (p, s), loss
    loss, grads = jax.value_and_grad(loss_of)(p)
    updates, s2 = optimizer.update(grads, s, p)
    return (optax.apply_updates(p, updates), s2), loss


@jax.jit
def run(p, s, ed):
    (p, s), losses = jax.lax.scan(
        lambda cc, _: step(ed, cc, _), (p, s), None, length=inner)
    return p, s, losses[-1]


def _fetch(p, loss):
    # one param element: transitively waits for the whole step chain
    float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
    float(loss)


print(f"variant={variant} cd={cd} N={n} E={e} slots={slots} d={d} hl={hl} "
      f"l1mode={_edge_traffic_mode(n, slots, len(edges.src), d, hl)}", flush=True)
t0 = time.perf_counter()
p, s, loss = run(params, opt_state, edges)
_fetch(p, loss)  # forced fetch: block_until_ready under-blocks on axon
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(calls):
    p, s, loss = run(p, s, edges)
    _fetch(p, loss)  # forced fetch each call: true device completion
dt = (time.perf_counter() - t0) / (calls * inner)
print(f"{variant:14s} {dt*1e3:8.2f} ms/step  loss={float(loss):.5f}", flush=True)
