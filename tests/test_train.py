"""Training layer: loss/metric/optimizer parity + end-to-end TEST smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.train import (
    bce_loss, ce_loss, get_loss, predictions, subset_accuracy, f1_score_jax,
    make_optimizer, apply_mask,
)

torch = pytest.importorskip("torch")
sklearn_metrics = pytest.importorskip("sklearn.metrics")


def test_bce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((7, 4)).astype(np.float32)
    targets = rng.uniform(0, 1, (7, 4)).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch.nn.BCELoss()(torch.sigmoid(torch.tensor(logits)), torch.tensor(targets))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_ce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((7, 4)).astype(np.float32)
    targets = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 7)]
    ours = float(ce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(targets).argmax(-1))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_loss_selection_table():
    assert get_loss("AIFB", sum_model=False) == (bce_loss, "sigmoid")
    assert get_loss("MUTAG", sum_model=True) == (bce_loss, "sigmoid")
    assert get_loss("MUTAG", sum_model=False) == (ce_loss, "softmax")
    assert get_loss("AM", sum_model=False) == (ce_loss, "softmax")


def test_metrics_match_sklearn():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((20, 4)).astype(np.float32)
    y = (rng.uniform(0, 1, (20, 4)) > 0.6).astype(np.int64)
    for act in ["sigmoid", "softmax"]:
        pred = np.asarray(predictions(jnp.asarray(logits), act))
        acc = float(subset_accuracy(jnp.asarray(pred), jnp.asarray(y)))
        f1w = float(f1_score_jax(jnp.asarray(pred), jnp.asarray(y), "weighted"))
        f1m = float(f1_score_jax(jnp.asarray(pred), jnp.asarray(y), "macro"))
        np.testing.assert_allclose(acc, sklearn_metrics.accuracy_score(y, pred), rtol=1e-6)
        np.testing.assert_allclose(
            f1w, sklearn_metrics.f1_score(y, pred, average="weighted", zero_division=0),
            rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            f1m, sklearn_metrics.f1_score(y, pred, average="macro", zero_division=0),
            rtol=1e-5, atol=1e-7)


def test_adam_matches_torch():
    """Our optax chain == torch.optim.Adam(lr, weight_decay) on a toy problem."""
    w0 = np.array([[0.5, -0.3], [0.1, 0.8]], np.float32)
    g_seq = [np.array([[0.1, -0.2], [0.3, 0.4]], np.float32) * (i + 1) for i in range(5)]
    lr, wd = 0.01, 5e-5

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for g in g_seq:
        opt_t.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt_t.step()

    opt_j = make_optimizer(lr, wd)
    wj = jnp.asarray(w0)
    state = opt_j.init(wj)
    for g in g_seq:
        upd, state = opt_j.update(jnp.asarray(g), state, wj)
        wj = wj + upd
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_apply_mask_freezes():
    upd = {"a": jnp.ones(3), "b": jnp.ones(2)}
    mask = {"a": True, "b": False}
    out = apply_mask(upd, mask)
    assert np.all(np.asarray(out["a"]) == 1)
    assert np.all(np.asarray(out["b"]) == 0)


# -- end-to-end smoke on the TEST fixture -----------------------------------

def test_end_to_end_test_dataset(ref_graphs_dir):
    from scaling_rgcn_training_tpu.graphs.dataset import Dataset
    from scaling_rgcn_training_tpu.train.trainer import Trainer, count_trainable_parameters

    data = Dataset(
        f"{ref_graphs_dir}/TEST/TEST_complete.nt",
        f"{ref_graphs_dir}/TEST/attr/sum",
        f"{ref_graphs_dir}/TEST/attr/map",
    ).init_dataset(verbose=False)
    assert len(data.sumGraphs) == 3
    assert data.num_classes == 1

    configs = {"dataset": "TEST", "num_sums": 3, "e_trans": True,
               "e_freeze": True, "w_trans": True, "w_grad": True}
    trainer = Trainer(data, hidden_l=4, epochs=3, emb_dim=6, lr=0.01,
                      weight_d=5e-5, seed=0, backend="gather")
    trainer.train_summaries(configs, verbose=False)
    assert all(sg.embedding is not None for sg in data.sumGraphs)
    assert trainer.sum_params is not None

    for exp in ["baseline", "summation", "mlp", "attention"]:
        head = "summation" if exp == "baseline" else exp
        res = trainer.train_original(head, configs, exp, verbose=False)
        assert len(res["loss"]) == 3
        assert len(res["accuracy"]) == 3
        assert np.isfinite(res["loss"]).all()
        assert 0.0 <= res["test_acc"] <= 1.0
        n_params = count_trainable_parameters(res["params"], res["mask"], data.sumGraphs)
        assert n_params > 0
