"""Pallas grouped-matmul kernel vs the gather reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops.grouped_matmul import grouped_matmul
from scaling_rgcn_training_tpu.ops import pallas_kernels


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def _case(seed=0, m=700, k=16, n=8, g=5, tm=256):
    rng = np.random.default_rng(seed)
    sizes = rng.multinomial(m, np.ones(g) / g).astype(np.int32)
    lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((g, k, n)), jnp.float32)
    return lhs, rhs, jnp.asarray(sizes), tm


def test_pallas_fwd_matches_reference():
    lhs, rhs, sizes, tm = _case()
    out = pallas_kernels._fwd(lhs, rhs, sizes, tm=tm)
    ref = grouped_matmul(lhs, rhs, sizes, backend="gather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_fwd_empty_groups():
    rng = np.random.default_rng(1)
    sizes = jnp.asarray(np.array([0, 300, 0, 0, 212], np.int32))
    lhs = jnp.asarray(rng.standard_normal((512, 8)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((5, 8, 4)), jnp.float32)
    out = pallas_kernels._fwd(lhs, rhs, sizes, tm=128)
    ref = grouped_matmul(lhs, rhs, sizes, backend="gather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_grad_matches_reference():
    lhs, rhs, sizes, tm = _case(seed=2, m=300, k=8, n=4, g=4, tm=128)

    def loss_pallas(l, r):
        return jnp.sum(pallas_kernels.grouped_matmul_pallas(l, r, sizes) ** 2)

    def loss_ref(l, r):
        return jnp.sum(grouped_matmul(l, r, sizes, backend="gather") ** 2)

    gl_p, gr_p = jax.grad(loss_pallas, argnums=(0, 1))(lhs, rhs)
    gl_r, gr_r = jax.grad(loss_ref, argnums=(0, 1))(lhs, rhs)
    np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_r), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_r), rtol=1e-3, atol=1e-3)
