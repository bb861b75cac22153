"""On-device validation of the TPU-only code paths (Pallas kernels etc.).

The CI tests run on CPU and exercise the XLA fallback / interpret-mode
branches; this script runs the same numerics checks on the real chip:

1. custom VJP (both the [N*slots, h] cotangent path and the large-N path)
   vs direct autodiff of the forward formula, modes edge/prematmul;
2. the FUSED Pallas kernels (mode="fused", fwd + bwd) in float32 AND
   bfloat16 — the bench's default hot path. Interpret mode cannot catch
   Mosaic rules like the 32-bit matmul-accumulator requirement, so these
   must run on hardware before any commit touching ops/*.py;
3. one full jitted train step (value_and_grad + Adam) of the 2-layer
   R-GCN in bf16 mixed precision — the exact thing bench.py times.

This script (plus bench.py) is the TPU gate: run it on the chip before
shipping kernel changes.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops import build_rel_edges
import importlib
rc = importlib.import_module('scaling_rgcn_training_tpu.ops.rgcn_conv')

FAILED = []


def report(ok: bool, msg: str):
    print(("OK  " if ok else "FAIL") + " " + msg)
    if not ok:
        FAILED.append(msg)


def _graph(rng, n, e, r):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    slots = 2 * r + 1
    return build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512), slots


def check(n, e, r, d_in, d_out, force_large=False, seed=0):
    rng = np.random.default_rng(seed)
    edges, slots = _graph(rng, n, e, r)
    if force_large:
        # strip the small-path plan to force the large-N branch
        from scaling_rgcn_training_tpu.ops.segment_kernels import plan_segmented_reduce

        edges = edges._replace(
            bwd_keys=None,
            bwd_plan=plan_segmented_reduce(np.asarray(edges.bwd_src), n))
    x = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((slots, d_in, d_out)) * 0.1, jnp.float32)
    g_out = jnp.asarray(rng.standard_normal((n, d_out)), jnp.float32)

    for mode in ["edge", "prematmul"]:
        def loss_c(xv, wv):
            return jnp.vdot(rc.relational_aggregate(xv, wv, edges, mode, None), g_out)

        def loss_a(xv, wv):
            return jnp.vdot(rc._aggregate_fwd_impl(xv, wv, edges, mode, None), g_out)

        gx_c, gw_c = jax.jit(jax.grad(loss_c, argnums=(0, 1)))(x, w)
        gx_a, gw_a = jax.jit(jax.grad(loss_a, argnums=(0, 1)))(x, w)
        for name, a, b in [("dx", gx_c, gx_a), ("dw", gw_c, gw_a)]:
            err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
            report(err < 2e-2,
                   f"n={n} e={e} slots={slots} {d_in}->{d_out} "
                   f"mode={mode} large={force_large} {name} rel-err={err:.2e}")


def check_fused(n, e, r, d_in, d_out, dtype, seed=1):
    """mode="fused" fwd + custom-VJP bwd vs the XLA edge path, on-chip."""
    rng = np.random.default_rng(seed)
    edges, slots = _graph(rng, n, e, r)
    x = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((slots, d_in, d_out)) * 0.1, jnp.float32)
    g_out = jnp.asarray(rng.standard_normal((n, d_out)), jnp.float32)
    # TPU matmul DEFAULT precision multiplies bf16 mantissas even for f32
    # operands, on both paths being compared — so f32 tolerance is bf16-eps
    # scale, not f32-eps scale
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-2
    dname = jnp.dtype(dtype).name

    out_f = jax.jit(lambda a, b: rc._aggregate_fwd_impl(
        a.astype(dtype), b.astype(dtype), edges, "fused", None))(x, w)
    out_r = jax.jit(lambda a, b: rc._aggregate_fwd_impl(
        a.astype(jnp.float32), b.astype(jnp.float32), edges, "edge", None))(x, w)
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_r))
                / (jnp.max(jnp.abs(out_r)) + 1e-9))
    report(err < tol, f"fused fwd {dname} {d_in}->{d_out} rel-err={err:.2e}")

    # custom-VJP grads (fused backward kernel on TPU) vs DIRECT autodiff of
    # the XLA edge formulation — an independent oracle, not the shared VJP
    gx_f, gw_f = jax.jit(jax.grad(
        lambda a, b: jnp.vdot(rc.relational_aggregate(
            a.astype(dtype), b.astype(dtype), edges, "fused", None
        ).astype(jnp.float32), g_out), argnums=(0, 1)))(x, w)
    gx_r, gw_r = jax.jit(jax.grad(
        lambda a, b: jnp.vdot(rc._aggregate_fwd_impl(
            a, b, edges, "edge", None), g_out), argnums=(0, 1)))(x, w)
    for name, a, b in [("dx", gx_f, gx_r), ("dw", gw_f, gw_r)]:
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b))
                    / (jnp.max(jnp.abs(b)) + 1e-9))
        report(err < tol, f"fused bwd {dname} {d_in}->{d_out} {name} rel-err={err:.2e}")


def check_train_step(seed=2):
    """One full jitted bf16 train step — what bench.py times end-to-end."""
    import optax
    from scaling_rgcn_training_tpu.models import init_emb_model, apply_emb_model
    from scaling_rgcn_training_tpu.train.losses import bce_loss
    from scaling_rgcn_training_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(seed)
    n, e, r, d, hl, c = 2000, 20000, 8, 64, 16, 4
    edges, slots = _graph(rng, n, e, r)
    params = init_emb_model(jax.random.key(0), slots, hl, c, n, d)
    optimizer = make_optimizer(0.01, 5e-5)
    opt_state = optimizer.init(params)
    x_train = jnp.asarray(rng.choice(n, 512, replace=False).astype(np.int32))
    y_train = jax.nn.one_hot(jnp.arange(512) % c, c)

    for cd in [None, jnp.bfloat16]:
        @jax.jit
        def step(p, s, ed):
            def loss_of(pp):
                logits = apply_emb_model(pp, ed, compute_dtype=cd)
                return bce_loss(logits[x_train], y_train)

            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, ns = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), ns, loss

        p1, s1, l1 = step(params, opt_state, edges)
        p2, _, l2 = step(p1, s1, edges)
        jax.block_until_ready(p2)
        ok = bool(jnp.isfinite(l1)) and bool(jnp.isfinite(l2)) and float(l2) <= float(l1) * 1.5
        report(ok, f"train step compute_dtype={cd} loss {float(l1):.4f} -> {float(l2):.4f}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check(500, 4000, 4, 16, 8)
    check(500, 4000, 4, 8, 16)              # d_out > d_in -> edge mode auto
    check(500, 4000, 4, 16, 8, force_large=True)
    for dtype in [jnp.float32, jnp.bfloat16]:
        check_fused(500, 4000, 4, 64, 16, dtype)   # L1 shape (wide in)
        check_fused(500, 4000, 4, 16, 8, dtype)    # L2 shape (narrow in)
    check_train_step()
    if FAILED:
        print(f"{len(FAILED)} CHECKS FAILED")
        raise SystemExit(1)
    print("ALL TPU PATH CHECKS PASSED")
