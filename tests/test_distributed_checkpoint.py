"""Distributed checkpoint/resume (VERDICT r4 #3).

- chunked-fit resume at devices=8 reproduces the unbroken distributed run;
- a checkpoint written under one device count restores into a template
  laid out for another (the npz holds the complete global array and
  ``load_checkpoint`` re-shards to the template's sharding);
- the Orbax backend (``RGCN_CKPT_BACKEND=orbax``) roundtrips both plain
  and mesh-sharded state.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.graphs.dataset import Dataset
from scaling_rgcn_training_tpu.graphs.synthetic import ensure_synthetic_dataset
from scaling_rgcn_training_tpu.train.trainer import Trainer
from scaling_rgcn_training_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint)


def _need8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def _dist_trainer(tmp_path, epochs, ckpt_every, interrupt_after=None,
                  seed=0):
    root = os.path.join(str(tmp_path), "graphs")
    ensure_synthetic_dataset(root, name="SYNTH", num_entities=150,
                             num_relations=4, num_classes=3, avg_degree=4.0,
                             seed=5)
    ds = os.path.join(root, "SYNTH")
    data = Dataset(os.path.join(ds, "SYNTH_complete.nt"),
                   os.path.join(ds, "attr", "sum"),
                   os.path.join(ds, "attr", "map")).init_dataset()
    trainer = Trainer(data, hidden_l=6, epochs=epochs, weight_d=5e-5,
                      emb_dim=8, lr=0.01, seed=seed, backend="gather",
                      devices=8, partition="halo",
                      ckpt_dir=str(tmp_path / "ck"), ckpt_every=ckpt_every)
    if interrupt_after is not None:
        trainer.epochs = interrupt_after
    cfg = {"dataset": "SYNTH", "e_trans": False, "w_trans": False,
           "num_sums": 1}
    return trainer, cfg


def test_distributed_fit_resume_matches_unbroken_run(tmp_path):
    """Crash after 4 of 10 epochs on the 8-device halo mesh, resume, and
    match the unbroken distributed run's trajectory exactly."""
    _need8()
    t_full, cfg = _dist_trainer(tmp_path / "a", epochs=10, ckpt_every=0)
    res_full = t_full.train_original("summation", cfg, "baseline",
                                     verbose=False)

    t_part, cfg = _dist_trainer(tmp_path / "b", epochs=10, ckpt_every=2,
                                interrupt_after=4)
    t_part.train_original("summation", cfg, "baseline", verbose=False)
    # different seed on the resuming trainer: only a real restore can
    # reproduce the seed-0 trajectory (guards against a vacuous pass)
    t_res, cfg = _dist_trainer(tmp_path / "b", epochs=10, ckpt_every=2,
                               seed=99)
    res_res = t_res.train_original("summation", cfg, "baseline",
                                   verbose=False)

    np.testing.assert_allclose(res_res["loss"], res_full["loss"],
                               rtol=1e-5, atol=1e-6)
    assert res_res["test_acc"] == res_full["test_acc"]


def _sharded_state(mesh_devices):
    """A params-like pytree with a node-sharded leaf + replicated leaf."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:mesh_devices]), ("nodes",))
    emb = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    emb = jax.device_put(emb, NamedSharding(mesh, P("nodes", None)))
    w = jax.device_put(jnp.ones((3, 4), jnp.float32),
                       NamedSharding(mesh, P()))
    return {"emb": emb, "w": w}


def test_restore_across_device_counts(tmp_path):
    """Save with 8-way node sharding, restore into a 1-device template
    (and back): values identical, layout follows the template."""
    _need8()
    state8 = _sharded_state(8)
    f = save_checkpoint(str(tmp_path / "ck8"), state8, epoch=1)

    state1 = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(np.asarray(a)),
                                 jax.devices()[0]), state8)
    restored, _, _ = load_checkpoint(f, state1)
    np.testing.assert_array_equal(np.asarray(restored["emb"]),
                                  np.asarray(state8["emb"]))
    assert restored["emb"].sharding.is_equivalent_to(
        state1["emb"].sharding, 2)

    # and the other way: 1-device checkpoint into the 8-way template
    f1 = save_checkpoint(str(tmp_path / "ck1"), state1)
    restored8, _, _ = load_checkpoint(f1, state8)
    np.testing.assert_array_equal(np.asarray(restored8["emb"]),
                                  np.asarray(state8["emb"]))
    assert restored8["emb"].sharding.is_equivalent_to(
        state8["emb"].sharding, 2)


def test_orbax_backend_roundtrip(tmp_path, monkeypatch):
    """RGCN_CKPT_BACKEND=orbax: bitwise roundtrip of sharded state."""
    _need8()
    pytest.importorskip("orbax.checkpoint")
    monkeypatch.setenv("RGCN_CKPT_BACKEND", "orbax")
    state = _sharded_state(8)
    opt = {"mu": jnp.full((5,), 2.5), "count": jnp.int32(7)}
    f = save_checkpoint(str(tmp_path / "ock"), state, opt, epoch=9)
    assert os.path.isdir(f[:-4] + ".orbax")
    p2, o2, epoch = load_checkpoint(f, state, opt)
    assert epoch == 9
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored leaves keep the template's sharding
    assert p2["emb"].sharding.is_equivalent_to(state["emb"].sharding, 2)


def test_distributed_fit_resume_orbax_backend(tmp_path, monkeypatch):
    """The chunked-fit resume path at devices=8 with RGCN_CKPT_BACKEND=
    orbax: sharded OCDBT writes + template-sharded restore reproduce the
    unbroken trajectory, same as the npz backend."""
    _need8()
    pytest.importorskip("orbax.checkpoint")
    monkeypatch.setenv("RGCN_CKPT_BACKEND", "orbax")
    t_full, cfg = _dist_trainer(tmp_path / "a", epochs=6, ckpt_every=0)
    res_full = t_full.train_original("summation", cfg, "baseline",
                                     verbose=False)
    t_part, cfg = _dist_trainer(tmp_path / "b", epochs=6, ckpt_every=2,
                                interrupt_after=2)
    t_part.train_original("summation", cfg, "baseline", verbose=False)
    import glob

    assert glob.glob(str(tmp_path / "b" / "ck" / "*.orbax")), \
        "orbax backend wrote no checkpoint directory"
    # a DIFFERENT seed on the resuming trainer: only a real restore (params
    # + opt state + rng carry from the orbax checkpoint) can reproduce the
    # seed-0 trajectory — a vacuous from-scratch rerun would diverge
    t_res, cfg = _dist_trainer(tmp_path / "b", epochs=6, ckpt_every=2,
                               seed=99)
    res_res = t_res.train_original("summation", cfg, "baseline",
                                   verbose=False)
    np.testing.assert_allclose(res_res["loss"], res_full["loss"],
                               rtol=1e-5, atol=1e-6)
