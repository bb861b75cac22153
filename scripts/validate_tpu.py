"""On-device validation of the TPU-only code paths (pallas backward etc.).

The CI tests run on CPU and exercise the XLA fallback branch; this script
runs the same numerics checks on the real chip: custom VJP (both the
[N*slots, h] cotangent path and the large-N path) vs direct autodiff of the
forward formula.
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


def check(n, e, r, d_in, d_out, force_large=False, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    slots = 2 * r + 1
    edges = build_rel_edges(src, dst, typ, n, slots, pad_to_multiple=512)
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
            status = "OK " if err < 2e-2 else "FAIL"
            print(f"{status} n={n} e={e} slots={slots} {d_in}->{d_out} "
                  f"mode={mode} large={force_large} {name} rel-err={err:.2e}")
            if err >= 2e-2:
                raise SystemExit(1)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check(500, 4000, 4, 16, 8)
    check(500, 4000, 4, 8, 16)              # d_out > d_in -> edge mode auto
    check(500, 4000, 4, 16, 8, force_large=True)
    print("ALL TPU PATH CHECKS PASSED")
