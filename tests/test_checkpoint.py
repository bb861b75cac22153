"""Checkpoint/resume: bitwise state roundtrip + resume-equals-straight-run."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from scaling_rgcn_training_tpu.models import init_emb_model, apply_emb_model
from scaling_rgcn_training_tpu.ops import build_rel_edges
from scaling_rgcn_training_tpu.train.losses import bce_loss
from scaling_rgcn_training_tpu.train.optim import make_optimizer
from scaling_rgcn_training_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, save_transfer_state, load_transfer_state)


def _setup(seed=0, n=30, e=100, r=3, d=8, hl=6, c=3):
    rng = np.random.default_rng(seed)
    edges = build_rel_edges(
        rng.integers(0, n, e).astype(np.int32),
        rng.integers(0, n, e).astype(np.int32),
        rng.integers(0, 2 * r, e).astype(np.int32), n, 2 * r + 1, 32)
    params = init_emb_model(jax.random.key(seed), 2 * r + 1, hl, c, n, d)
    opt = make_optimizer(0.01, 5e-5)
    x = jnp.arange(10, dtype=jnp.int32)
    y = jax.nn.one_hot(jnp.arange(10) % c, c)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda p: bce_loss(apply_emb_model(p, edges, backend="gather")[x], y))(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    return params, opt, step


def test_roundtrip_bitwise(tmp_path):
    params, opt, step = _setup()
    state = opt.init(params)
    for _ in range(3):
        params, state, _ = step(params, state)
    f = save_checkpoint(str(tmp_path / "ck"), params, state, epoch=3)
    p2, s2, epoch = load_checkpoint(f, params, state)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_equals_straight_run(tmp_path):
    params, opt, step = _setup(seed=1)
    # straight: 5 steps
    p_a, s_a = params, opt.init(params)
    for _ in range(5):
        p_a, s_a, _ = step(p_a, s_a)
    # split: 3 steps -> checkpoint -> restore -> 2 steps
    p_b, s_b = params, opt.init(params)
    for _ in range(3):
        p_b, s_b, _ = step(p_b, s_b)
    f = save_checkpoint(str(tmp_path / "mid"), p_b, s_b, epoch=3)
    p_c, s_c, _ = load_checkpoint(f, p_b, s_b)
    for _ in range(2):
        p_c, s_c, _ = step(p_c, s_c)
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transfer_state_roundtrip(tmp_path):
    params, _, _ = _setup(seed=2)
    embs = [np.random.default_rng(i).standard_normal((7, 8)).astype(np.float32)
            for i in range(3)]
    f = save_transfer_state(str(tmp_path / "tr"), params, embs)
    trunk, embs2 = load_transfer_state(f, params)
    assert len(embs2) == 3
    for a, b in zip(embs, embs2):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(params.rgcn1.weight), np.asarray(trunk.rgcn1.weight))


def test_trainer_summary_checkpoint_roundtrip(tmp_path, ref_graphs_dir):
    """train_summaries(save_path=...) -> load_summaries resumes the
    transfer stage: same trunk weights and per-summary embeddings."""
    import numpy as np
    from scaling_rgcn_training_tpu.graphs.dataset import Dataset
    from scaling_rgcn_training_tpu.train.trainer import Trainer

    data = Dataset(f"{ref_graphs_dir}/TEST/TEST_complete.nt",
                   f"{ref_graphs_dir}/TEST/attr/sum",
                   f"{ref_graphs_dir}/TEST/attr/map").init_dataset()
    configs = {"dataset": "TEST", "num_sums": 3, "e_trans": True,
               "e_freeze": True, "w_trans": True, "w_grad": True}
    path = str(tmp_path / "transfer.npz")
    t1 = Trainer(data, hidden_l=4, epochs=2, emb_dim=6, lr=0.01,
                 weight_d=5e-5, seed=0, backend="gather")
    t1.train_summaries(configs, verbose=False, save_path=path)
    want_embs = [sg.embedding.copy() for sg in data.sumGraphs]

    for sg in data.sumGraphs:
        sg.embedding = None
    t2 = Trainer(data, hidden_l=4, epochs=2, emb_dim=6, lr=0.01,
                 weight_d=5e-5, seed=1, backend="gather")
    t2.load_summaries(path)
    for sg, want in zip(data.sumGraphs, want_embs):
        np.testing.assert_allclose(sg.embedding, want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t2.sum_params.rgcn1.weight),
                               np.asarray(t1.sum_params.rgcn1.weight), rtol=1e-6)
    # the resumed trainer can run the fine-tune stage
    res = t2.train_original("summation", configs, "summation", verbose=False)
    assert 0.0 <= res["test_acc"] <= 1.0


def _fit_trainer(tmp_path, epochs, ckpt_every, interrupt_after=None, seed=4,
                 trainer_seed=0):
    """Trainer.fit through the chunked-checkpoint path on a tiny graph."""
    import os

    from scaling_rgcn_training_tpu.graphs.synthetic import ensure_synthetic_dataset
    from scaling_rgcn_training_tpu.graphs.dataset import Dataset
    from scaling_rgcn_training_tpu.train.trainer import Trainer

    root = os.path.join(str(tmp_path), "graphs")
    ensure_synthetic_dataset(root, name="SYNTH", num_entities=150,
                             num_relations=4, num_classes=3, avg_degree=4.0,
                             seed=seed)
    ds = os.path.join(root, "SYNTH")
    data = Dataset(os.path.join(ds, "SYNTH_complete.nt"),
                   os.path.join(ds, "attr", "sum"),
                   os.path.join(ds, "attr", "map")).init_dataset()
    trainer = Trainer(data, hidden_l=6, epochs=epochs, weight_d=5e-5,
                      emb_dim=8, lr=0.01, seed=trainer_seed, backend="gather",
                      ckpt_dir=str(tmp_path / "ck"), ckpt_every=ckpt_every)
    if interrupt_after is not None:
        # simulate the crash: stop the chunk loop after N epochs by
        # training a truncated-epochs twin that shares the checkpoint path
        trainer.epochs = interrupt_after
    cfg = {"dataset": "SYNTH", "e_trans": False, "w_trans": False,
           "num_sums": 1}
    return trainer, cfg


def test_fit_resume_matches_unbroken_run(tmp_path):
    """Kill mid-training (after 4 of 10 epochs), resume, and match the
    unbroken run's final metrics exactly (rng carry is checkpointed)."""
    # unbroken 10-epoch run (no checkpointing at all)
    t_full, cfg = _fit_trainer(tmp_path / "a", epochs=10, ckpt_every=0)
    res_full = t_full.train_original("summation", cfg, "baseline", verbose=False)

    # interrupted run: chunked every 2 epochs, "crashes" at epoch 4
    t_part, cfg = _fit_trainer(tmp_path / "b", epochs=10, ckpt_every=2,
                               interrupt_after=4)
    t_part.train_original("summation", cfg, "baseline", verbose=False)
    # resume: same ckpt_dir, full epoch budget — DIFFERENT trainer seed,
    # so only a real restore (params/opt/rng from disk) can match the
    # unbroken seed-0 run (guards against a vacuous from-scratch pass)
    t_res, cfg = _fit_trainer(tmp_path / "b", epochs=10, ckpt_every=2,
                              trainer_seed=99)
    res_res = t_res.train_original("summation", cfg, "baseline", verbose=False)

    np.testing.assert_allclose(res_res["loss"], res_full["loss"],
                               rtol=1e-5, atol=1e-6)
    assert res_res["test_acc"] == res_full["test_acc"]
