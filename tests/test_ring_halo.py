"""Pallas remote-DMA halo exchange (parallel/ring_halo.py): parity with
``lax.all_to_all`` on the 8-virtual-device mesh, run under the Pallas TPU
interpreter with remote-DMA emulation AND vector-clock race detection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from scaling_rgcn_training_tpu.parallel.mesh import EDGE_AXIS, make_mesh
from scaling_rgcn_training_tpu.parallel.ring_halo import halo_exchange_pallas

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _run(send_global, s_n):
    mesh = make_mesh(s_n)

    def body(send):
        return halo_exchange_pallas(send[0], EDGE_AXIS, interpret=True)[None]

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(EDGE_AXIS), out_specs=P(EDGE_AXIS),
        check_vma=False))(send_global)


def _ref(send_global, s_n):
    mesh = make_mesh(s_n)

    def body(send):
        return jax.lax.all_to_all(send[0], EDGE_AXIS, split_axis=0,
                                  concat_axis=0, tiled=False)[None]

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(EDGE_AXIS), out_specs=P(EDGE_AXIS),
        check_vma=False))(send_global)


@pytest.mark.parametrize("s_n,h,d", [(8, 16, 128), (4, 8, 128)])
def test_halo_exchange_matches_all_to_all(s_n, h, d):
    rng = np.random.default_rng(0)
    send = jnp.asarray(rng.standard_normal((s_n, s_n, h, d)), jnp.float32)
    got = _run(send, s_n)
    want = _ref(send, s_n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_halo_conv_with_pallas_exchange_matches_dense(monkeypatch):
    """The full node-partitioned conv with the remote-DMA exchange swapped
    in for lax.all_to_all (RGCN_HALO_PALLAS_A2A): value AND grads match
    the single-device oracle — the kernel is a drop-in collective."""
    from scaling_rgcn_training_tpu.ops import (
        build_rel_edges, init_rgcn_layer, rgcn_conv)
    from scaling_rgcn_training_tpu.parallel import (
        device_put_halo_edges, halo_partition_edges, halo_rgcn_conv,
        node_sharding, pad_node_array)

    monkeypatch.setenv("RGCN_HALO_PALLAS_A2A", "1")
    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    n, e, r, d, h = 53, 337, 4, 8, 6
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    typ = rng.integers(0, 2 * r, e).astype(np.int32)
    slots = 2 * r + 1
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = init_rgcn_layer(jax.random.key(5), slots, d, h)
    dense = build_rel_edges(src, dst, typ, n, slots, 64)
    hedges = device_put_halo_edges(
        halo_partition_edges(src, dst, typ, n, slots, 8, pad_to_multiple=8,
                             halo_multiple=4), mesh)
    xp = jax.device_put(pad_node_array(x, hedges), node_sharding(mesh))

    want = rgcn_conv(x, dense, params, backend="gather")
    got = halo_rgcn_conv(xp, hedges, params, mesh, backend="gather")
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    gd = jax.grad(lambda p, xv: jnp.sum(
        rgcn_conv(xv, dense, p, backend="gather") ** 2), argnums=(0, 1)
    )(params, x)
    gh = jax.grad(lambda p, xv: jnp.sum(
        halo_rgcn_conv(xv, hedges, p, mesh, backend="gather")[:n] ** 2),
        argnums=(0, 1))(params, xp)
    for a, b in zip(jax.tree_util.tree_leaves(gd[0]),
                    jax.tree_util.tree_leaves(gh[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh[1])[:n], np.asarray(gd[1]),
                               rtol=1e-3, atol=1e-4)


def test_halo_exchange_grad_via_transpose():
    """The exchange is its own transpose up to the block permutation; we
    only need the VALUE path for the prototype, but the parity harness
    must keep padding/self blocks intact."""
    s_n, h, d = 4, 8, 128
    rng = np.random.default_rng(1)
    send = jnp.asarray(rng.standard_normal((s_n, s_n, h, d)), jnp.float32)
    got = _run(send, s_n)
    # round-trip: exchanging twice restores the original layout
    back = _run(got, s_n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(send))
