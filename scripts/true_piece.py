"""One fetch-synced piece measurement per process (PIECE=<name>).

Per-process because (a) the axon runtime reproducibly wedges when many
large arrays are staged up front in one process, and (b) fetch-synced
timing (forced float() of the result) is the only reliable sync — see
scripts/true_profile.py header. Only the arrays a piece needs are
created.

Pieces: k1f k1b k2f k2b g64 g16 g8 insitu1 insitu2
Run: PIECE=k1f python scripts/true_piece.py
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
piece = os.environ.get("PIECE", "k1f")
c_dim = 8

rng = np.random.default_rng(0)
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
typ = rng.integers(0, 2 * r, e).astype(np.int32)
slots = 2 * r + 1
edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)
fsp, bsp = edges.fspan, edges.bspan
bf = jnp.bfloat16
ep = fsp.padded_edges

mk = lambda shape, dt: jnp.asarray(rng.standard_normal(shape), dt)

if piece == "k1f":
    ops = {"a": mk((ep, d), bf), "w": mk((slots, d, h), bf), "fsp": fsp}
    fn = lambda c, o: rel_span_matmul_scatter(
        o["a"] * (1 + 1e-12 * c).astype(bf), o["fsp"], o["w"]).ravel()[0]
elif piece == "k2f":
    ops = {"a": mk((ep, h), bf), "w": mk((slots, h, c_dim), bf), "fsp": fsp}
    fn = lambda c, o: rel_span_matmul_scatter(
        o["a"] * (1 + 1e-12 * c).astype(bf), o["fsp"], o["w"]).ravel()[0]
elif piece == "k1b":
    # the cotangent stream is in BWD span order: bspan's padded size (the
    # fwd/bwd plans pad differently when their bucket sizes differ)
    ops = {"t": mk((bsp.padded_edges, h), bf), "x": mk((n, d), bf),
           "w": mk((slots, d, h), bf), "bsp": bsp}

    def fn(c, o):
        dx, dw = rel_span_backward_scatter(
            o["t"] * (1 + 1e-12 * c).astype(bf), o["bsp"], o["x"], o["w"])
        return dx.ravel()[0] + dw.ravel()[0]
elif piece == "k2b":
    ops = {"t": mk((bsp.padded_edges, c_dim), bf), "x": mk((n, h), bf),
           "w": mk((slots, h, c_dim), bf), "bsp": bsp}

    def fn(c, o):
        dx, dw = rel_span_backward_scatter(
            o["t"] * (1 + 1e-12 * c).astype(bf), o["bsp"], o["x"], o["w"])
        return dx.ravel()[0] + dw.ravel()[0]
elif piece in ("g64", "g16", "g8"):
    width = {"g64": d, "g16": h, "g8": c_dim}[piece]
    dt = bf if piece == "g64" else jnp.float32
    ops = {"x": mk((n, width), dt), "idx": fsp.gather_idx}
    fn = lambda c, o: jnp.take(o["x"] * (1 + 1e-12 * c).astype(o["x"].dtype),
                               o["idx"], axis=0).ravel()[0]
elif piece == "insitu1":
    ops = {"x": mk((n, d), bf), "w": mk((slots, d, h), bf), "fsp": fsp}
    fn = lambda c, o: rel_span_matmul_scatter(
        jnp.take(o["x"] * (1 + 1e-12 * c).astype(bf), o["fsp"].gather_idx,
                 axis=0), o["fsp"], o["w"]).ravel()[0]
elif piece == "insitu2":
    ops = {"g": mk((n, h), jnp.float32), "x": mk((n, d), bf),
           "w": mk((slots, d, h), bf), "bsp": bsp}

    def fn(c, o):
        t = jnp.take(o["g"] * (1 + 1e-12 * c), o["bsp"].gather_idx,
                     axis=0).astype(bf)
        dx, dw = rel_span_backward_scatter(t, o["bsp"], o["x"], o["w"])
        return dx.ravel()[0] + dw.ravel()[0]
else:
    raise SystemExit(f"unknown piece {piece}")

print(f"PIECE={piece} N={n} E={e} (pad {ep}) slots={slots} "
      f"backend={jax.default_backend()}", flush=True)


@jax.jit
def run(c, o):
    def b(cc, _):
        return cc + fn(cc, o).astype(jnp.float32), None
    return lax.scan(b, c, None, length=inner)[0]


t0 = time.perf_counter()
o = run(jnp.float32(0), ops)
v = float(o)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    o = run(o, ops)
    v = float(o)
    best = min(best, (time.perf_counter() - t0) / inner)
print(f"{piece:10s} {best*1e3:8.2f} ms  (val {v:.4g})", flush=True)
