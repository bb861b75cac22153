"""Edge-partitioned SPMD on a virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops import build_rel_edges, rgcn_conv, init_rgcn_layer
from scaling_rgcn_training_tpu.parallel import (
    make_mesh, use_mesh, shard_rel_edges, sharded_rgcn_conv, device_put_sharded_edges)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def _random_graph(seed=0, n=50, e=333, r=5):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, n, e).astype(np.int32),
            rng.integers(0, n, e).astype(np.int32),
            rng.integers(0, 2 * r, e).astype(np.int32), n, 2 * r + 1)


def test_sharded_conv_matches_dense(mesh8):
    src, dst, typ, n, slots = _random_graph()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    params = init_rgcn_layer(jax.random.key(0), slots, 8, 6)
    dense = rgcn_conv(x, build_rel_edges(src, dst, typ, n, slots, 64), params,
                      backend="gather")
    sedges = device_put_sharded_edges(
        shard_rel_edges(src, dst, typ, n, slots, 8, pad_to_multiple=8), mesh8)
    out = sharded_rgcn_conv(x, sedges, params, mesh8, backend="gather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=1e-4, atol=1e-5)


def test_sharded_conv_grads_match(mesh8):
    src, dst, typ, n, slots = _random_graph(seed=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    params = init_rgcn_layer(jax.random.key(1), slots, 8, 6)
    edges = build_rel_edges(src, dst, typ, n, slots, 64)
    sedges = device_put_sharded_edges(
        shard_rel_edges(src, dst, typ, n, slots, 8, pad_to_multiple=8), mesh8)

    gd = jax.grad(lambda p, xv: jnp.sum(rgcn_conv(xv, edges, p, backend="gather") ** 2),
                  argnums=(0, 1))(params, x)
    gs = jax.grad(lambda p, xv: jnp.sum(
        sharded_rgcn_conv(xv, sedges, p, mesh8, backend="gather") ** 2),
        argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gd), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_model_transparent_dispatch(mesh8):
    """Models run unchanged over sharded edges inside use_mesh."""
    from scaling_rgcn_training_tpu.models import init_emb_model, apply_emb_model

    src, dst, typ, n, slots = _random_graph(seed=4)
    params = init_emb_model(jax.random.key(2), slots, 6, 3, n, 8)
    dense = apply_emb_model(params, build_rel_edges(src, dst, typ, n, slots, 64),
                            backend="gather")
    sedges = device_put_sharded_edges(
        shard_rel_edges(src, dst, typ, n, slots, 8, pad_to_multiple=8), mesh8)
    with use_mesh(mesh8):
        out = apply_emb_model(params, sedges, backend="gather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=1e-4, atol=1e-5)


def test_sharded_outside_mesh_raises():
    src, dst, typ, n, slots = _random_graph(seed=5)
    sedges = shard_rel_edges(src, dst, typ, n, slots, 2, pad_to_multiple=8)
    params = init_rgcn_layer(jax.random.key(3), slots, 8, 6)
    x = jnp.zeros((n, 8))
    with pytest.raises(AssertionError, match="use_mesh"):
        rgcn_conv(x, sedges, params)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 8)
    assert np.isfinite(np.asarray(out)).all()
