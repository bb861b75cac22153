"""One-kernel fused halo exchange+aggregation (parallel/fused_halo.py).

Runs on a virtual 4-device CPU mesh under the Pallas TPU interpreter
with remote-DMA race detection enabled (fused_halo_aggregate_fwd turns
on ``InterpretParams(detect_races=True)`` off-TPU). Oracle: the
single-device conv on the same graph — the fused path is a pure
dataflow change (SURVEY.md L0 semantics).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops import (
    build_rel_edges, init_rgcn_layer, rgcn_conv)
from scaling_rgcn_training_tpu.parallel import (
    device_put_halo_edges, halo_partition_edges, halo_rgcn_conv, make_mesh,
    node_sharding, pad_node_array, padded_num_nodes)


# 4 shards, not 8: the Pallas TPU interpreter wedges pre-kernel-entry at
# 8 concurrently-blocking interpret kernels on this 2-core host (verified:
# every sync structure passes at 8 devices in isolation repros, and the
# identical fused kernel passes at S<=4; with ALL semaphores/DMAs disabled
# the 8-device run still hangs before the first kernel statement executes,
# i.e. in interpreter buffer allocation, not in kernel logic).
@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    return make_mesh(4)


@pytest.fixture(autouse=True)
def fused_env(monkeypatch):
    monkeypatch.setenv("RGCN_HALO_PALLAS_A2A", "fused")
    monkeypatch.setenv("RGCN_HALO_FUSED", "1")
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _setup(mesh, seed=0, d=8, h=6, n=53, e=337, r=4):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    slots = 2 * r + 1
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = init_rgcn_layer(jax.random.key(seed), slots, d, h)
    dense = build_rel_edges(src, dst, typ, n, slots, 64)
    hedges = device_put_halo_edges(
        halo_partition_edges(src, dst, typ, n, slots, 4, pad_to_multiple=8,
                             halo_multiple=4), mesh)
    assert hedges.fplan is not None
    xp = jax.device_put(pad_node_array(x, hedges), node_sharding(mesh))
    return x, xp, params, dense, hedges, n


def test_fused_halo_matches_dense(mesh8):
    x, xp, params, dense, hedges, n = _setup(mesh8)
    want = rgcn_conv(x, dense, params, backend="gather")
    got = halo_rgcn_conv(xp, hedges, params, mesh8)
    assert got.shape[0] == padded_num_nodes(hedges)
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_halo_grads_match(mesh8):
    x, xp, params, dense, hedges, n = _setup(mesh8, seed=2)
    gd = jax.grad(lambda p, xv: jnp.sum(
        rgcn_conv(xv, dense, p, backend="gather") ** 2), argnums=(0, 1)
    )(params, x)
    gh = jax.grad(lambda p, xv: jnp.sum(
        halo_rgcn_conv(xv, hedges, p, mesh8)[:n] ** 2),
        argnums=(0, 1))(params, xp)
    for a, b in zip(jax.tree_util.tree_leaves(gd[0]),
                    jax.tree_util.tree_leaves(gh[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh[1])[:n], np.asarray(gd[1]),
                               rtol=1e-3, atol=1e-4)


def test_fused_halo_train_step(mesh8):
    """2-layer jitted train step through the fused kernel: loss decreases."""
    import optax

    rng = np.random.default_rng(5)
    n, e, r = 64, 400, 3
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    slots = 2 * r + 1
    hedges = device_put_halo_edges(
        halo_partition_edges(src, dst, typ, n, slots, 4, pad_to_multiple=8,
                             halo_multiple=4), mesh8)
    n_pad = padded_num_nodes(hedges)
    d, hl, c = 8, 6, 3
    k = jax.random.key(7)
    emb = jax.device_put(jax.random.normal(k, (n_pad, d)),
                         node_sharding(mesh8))
    p1 = init_rgcn_layer(jax.random.fold_in(k, 1), slots, d, hl)
    p2 = init_rgcn_layer(jax.random.fold_in(k, 2), slots, hl, c)
    params = (emb, p1, p2)
    y = jax.nn.one_hot(np.arange(32) % c, c)
    idx = jnp.arange(32)
    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_of(ps):
            e_, a_, b_ = ps
            z = jax.nn.relu(halo_rgcn_conv(e_, hedges, a_, mesh8))
            logits = halo_rgcn_conv(z, hedges, b_, mesh8)[idx]
            return jnp.mean(
                optax.softmax_cross_entropy(logits.astype(jnp.float32), y))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, state2 = opt.update(grads, state)
        return optax.apply_updates(params, updates), state2, loss

    losses = []
    for _ in range(4):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
