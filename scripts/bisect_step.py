"""Bisect the fused aggregate's glue cost at the bench shape.

profile_fused.py measures kernels and gathers in isolation; the full
train step (ablate_step.py) is ~57ms more than their sum. This script
rebuilds the L1 aggregate fwd+bwd from its pieces, adding one piece per
variant, with the scan carry threaded through the INPUTS (a 1+eps*c
multiplicative nudge) so nothing is loop-invariant-hoisted.

Variants (BISECT=name, one process per variant):
  kernels    fwd kernel + bwd kernel on pre-staged vals/t (floor)
  nonorm     + both gathers, but no norm scaling (take -> kernel)
  full       + norm scaling and dtype casts (= the real span_aggregate)
  grad       the real thing via jax.grad of sum(span_aggregate(x, w))
  gradroot   grad + root matmul + relu (one true conv layer)

Run: BISECT=<v> python scripts/bisect_step.py
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
    rel_span_backward_scatter, rel_span_matmul_scatter, span_aggregate,
    unpack_edge_cols)

n = int(os.environ.get("P_NODES", 200_000))
e = int(os.environ.get("P_EDGES", 4_000_000))
r = int(os.environ.get("P_RELS", 45))
d = int(os.environ.get("P_DIM", 64))
h = int(os.environ.get("P_OUT", 16))
inner = int(os.environ.get("P_INNER", 10))
variant = os.environ.get("BISECT", "full")

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)
fsp, bsp = edges.fspan, edges.bspan

bf = jnp.bfloat16
x = jnp.asarray(rng.standard_normal((n, d)), bf)
w = jnp.asarray(rng.standard_normal((slots, d, h)) * 0.1, bf)
g_out = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
vals0 = jnp.asarray(rng.standard_normal((fsp.padded_edges, d)), bf)
t0_ = jnp.asarray(rng.standard_normal((bsp.padded_edges, h)), bf)
root = jnp.asarray(rng.standard_normal((d, h)) * 0.1, jnp.float32)

print(f"BISECT={variant} N={n} E={e} slots={slots} d={d}->{h} "
      f"backend={jax.default_backend()}", flush=True)


def nudge(c, a):
    return a * (1 + 1e-12 * c).astype(a.dtype)


# the big arrays (edge plans, streams, node tables) must be jit ARGUMENTS
# — closing over them embeds them as HLO constants, which blows up the
# axon remote-compile payload (HTTP 413) and compile time


def fn_kernels(c, ops):
    out = rel_span_matmul_scatter(nudge(c, ops["vals0"]), ops["fsp"], ops["w"])
    dx, dw = rel_span_backward_scatter(nudge(c, ops["t0"]), ops["bsp"],
                                       ops["x"], ops["w"])
    return out.ravel()[0] + dx.ravel()[0] + dw.ravel()[0]


def fn_nonorm(c, ops):
    xx = nudge(c, ops["x"])
    vals = jnp.take(xx, ops["fsp"].gather_idx, axis=0)
    out = rel_span_matmul_scatter(vals, ops["fsp"], ops["w"])
    t = jnp.take(nudge(c, ops["g_out"]), ops["bsp"].gather_idx,
                 axis=0).astype(bf)
    dx, dw = rel_span_backward_scatter(t, ops["bsp"], xx, ops["w"])
    return out.ravel()[0] + dx.ravel()[0] + dw.ravel()[0]


def fn_full(c, ops):
    fsp_, bsp_ = ops["fsp"], ops["bsp"]
    xx = nudge(c, ops["x"])
    vals = jnp.take(xx, fsp_.gather_idx, axis=0) \
        * ops["fnorm_flat"][:, None].astype(bf)
    out = rel_span_matmul_scatter(vals, fsp_, ops["w"])
    t = (jnp.take(nudge(c, ops["g_out"]), bsp_.gather_idx, axis=0)
         * ops["bnorm_flat"][:, None]).astype(bf)
    dx, dw = rel_span_backward_scatter(t, bsp_, xx, ops["w"])
    return out.ravel()[0] + dx.ravel()[0] + dw.ravel()[0]


def fn_grad(c, ops):
    xx = nudge(c, ops["x"])

    def loss(a, b):
        return span_aggregate(a, b, ops["fsp"], ops["bsp"]).sum()

    l, (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1))(xx, ops["w"])
    return l + dx.ravel()[0].astype(jnp.float32) + dw.ravel()[0].astype(jnp.float32)


def fn_gradroot(c, ops):
    xx = nudge(c, ops["x"])

    def loss(a, b, rt):
        z = span_aggregate(a, b, ops["fsp"], ops["bsp"]) \
            + a.astype(jnp.float32) @ rt
        return jax.nn.relu(z).sum()

    l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        xx, ops["w"], ops["root"])
    return l + sum(g.ravel()[0].astype(jnp.float32) for g in grads)


fn = {"kernels": fn_kernels, "nonorm": fn_nonorm, "full": fn_full,
      "grad": fn_grad, "gradroot": fn_gradroot}[variant]

ops = {"x": x, "w": w, "g_out": g_out, "vals0": vals0, "t0": t0_,
       "root": root, "fsp": fsp, "bsp": bsp,
       "fnorm_flat": jnp.asarray(unpack_edge_cols(fsp.norm, fsp.chunk)),
       "bnorm_flat": jnp.asarray(unpack_edge_cols(bsp.norm, bsp.chunk))}


@jax.jit
def run(c, ops):
    def b(cc, _):
        return cc + fn(cc, ops).astype(jnp.float32), None
    return lax.scan(b, c, None, length=inner)[0]


t0 = time.perf_counter()
o = run(jnp.float32(0), ops); float(o)  # forced fetch: block_until_ready under-blocks on axon
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    o = run(o, ops); float(o)  # forced fetch: block_until_ready under-blocks on axon
    best = min(best, (time.perf_counter() - t0) / inner)
print(f"{variant:10s} {best*1e3:8.2f} ms   (check value: {float(o):.6g})",
      flush=True)
