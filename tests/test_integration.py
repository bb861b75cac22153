"""End-to-end quality integration: the full experiment matrix on synthetic
data must learn (beat chance clearly) and the transfer pipeline must run
through every head — the framework-level analogue of the reference's
AIFB-accuracy check (its original datasets are missing LFS blobs)."""

import numpy as np
import pytest

from scaling_rgcn_training_tpu.graphs.synthetic import ensure_synthetic_dataset
from scaling_rgcn_training_tpu.graphs.dataset import Dataset
from scaling_rgcn_training_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthds")
    ds_dir = ensure_synthetic_dataset(
        str(root), num_entities=1200, num_relations=8, num_classes=3,
        avg_degree=6, seed=42)
    return Dataset(
        f"{ds_dir}/SYNTH_complete.nt", f"{ds_dir}/attr/sum", f"{ds_dir}/attr/map",
    ).init_dataset(verbose=False)


@pytest.mark.slow
def test_baseline_learns(synth_data):
    t = Trainer(synth_data, hidden_l=16, epochs=40, emb_dim=24, lr=0.01,
                weight_d=5e-5, seed=0, backend="gather")
    res = t.train_original(
        "summation", {"dataset": "SYNTH", "num_sums": 1, "e_trans": False,
                      "w_trans": False}, "baseline", verbose=False)
    # 3 classes -> chance ~0.33; structure + relation signal must be learned
    assert res["test_acc"] > 0.55, res["test_acc"]
    assert max(res["accuracy"]) > 0.5


@pytest.mark.slow
def test_transfer_matrix(synth_data):
    configs = {"dataset": "SYNTH", "num_sums": 3, "e_trans": True,
               "e_freeze": True, "w_trans": True, "w_grad": True}
    t = Trainer(synth_data, hidden_l=16, epochs=40, emb_dim=24, lr=0.01,
                weight_d=5e-5, seed=1, backend="gather")
    t.train_summaries(configs, verbose=False)
    # summary losses must decrease
    accs = {}
    for exp in ["summation", "mlp", "attention"]:
        res = t.train_original(exp, configs, exp, verbose=False)
        accs[exp] = res["test_acc"]
        assert np.isfinite(res["loss"]).all()
        assert res["loss"][-1] < res["loss"][0]  # training progresses
    # every transfer head must clearly beat chance
    for exp, acc in accs.items():
        assert acc > 0.45, (exp, acc)


@pytest.mark.slow
def test_frozen_transfer_variants(synth_data):
    """e_freeze / w_grad=False paths: frozen leaves really stay frozen."""
    import jax

    configs = {"dataset": "SYNTH", "num_sums": 3, "e_trans": True,
               "e_freeze": True, "w_trans": True, "w_grad": False}
    t = Trainer(synth_data, hidden_l=16, epochs=5, emb_dim=24, lr=0.01,
                weight_d=5e-5, seed=2, backend="gather")
    t.train_summaries(configs, verbose=False)
    res = t.train_original("summation", configs, "summation", verbose=False)
    params = res["params"]
    # conv weights must equal the transferred (frozen) summary weights
    np.testing.assert_array_equal(
        np.asarray(params.rgcn1.weight), np.asarray(t.sum_params.rgcn1.weight))
    np.testing.assert_array_equal(
        np.asarray(params.rgcn2.root), np.asarray(t.sum_params.rgcn2.root))
