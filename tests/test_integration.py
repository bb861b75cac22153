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
    # pinned band around the recorded seed-0 value (0.571 on the 21-node
    # test split; one node flip = 4.8 points, so the band is ±2 nodes)
    assert 0.45 <= res["test_acc"] <= 0.70, res["test_acc"]
    assert max(res["accuracy"]) > 0.5


@pytest.mark.slow
@pytest.mark.parametrize("compute_dtype,floors", [
    (None, {"summation": 0.55, "mlp": 0.70, "attention": 0.80}),
    ("bfloat16", {"summation": 0.55, "mlp": 0.665, "attention": 0.80}),
], ids=["f32", "bf16"])
def test_transfer_matrix_beats_baseline(synth_data, compute_dtype, floors):
    """The reference's core scientific claim (README.md:5-14): summary
    pre-training + transfer outperforms the from-scratch baseline — and it
    must hold in the TPU-default mixed-precision regime too (bf16 edge
    streams / f32 accumulation, the bench.py default), not just f32.
    Recorded seed values (21-node test split, 1 flip = 4.8 points):
      f32  baseline 0.571, summation 0.667, mlp 0.810, attention 0.905
      bf16 baseline 0.571, summation 0.619, mlp 0.762, attention 0.905
    — floors sit ~2 test-node flips below each."""
    cfg_b = {"dataset": "SYNTH", "num_sums": 1, "e_trans": False,
             "w_trans": False}
    t0 = Trainer(synth_data, hidden_l=16, epochs=40, emb_dim=24, lr=0.01,
                 weight_d=5e-5, seed=0, backend="gather",
                 compute_dtype=compute_dtype)
    base_acc = t0.train_original("summation", cfg_b, "baseline",
                                 verbose=False)["test_acc"]

    configs = {"dataset": "SYNTH", "num_sums": 3, "e_trans": True,
               "e_freeze": True, "w_trans": True, "w_grad": True}
    t = Trainer(synth_data, hidden_l=16, epochs=40, emb_dim=24, lr=0.01,
                weight_d=5e-5, seed=1, backend="gather",
                compute_dtype=compute_dtype)
    t.train_summaries(configs, verbose=False)
    accs = {}
    for exp in ["summation", "mlp", "attention"]:
        res = t.train_original(exp, configs, exp, verbose=False)
        accs[exp] = res["test_acc"]
        assert np.isfinite(res["loss"]).all()
        assert res["loss"][-1] < res["loss"][0]  # training progresses
        assert accs[exp] >= floors[exp], (exp, accs[exp])
    # every transfer head matches or beats the baseline experiment
    for exp, acc in accs.items():
        assert acc >= base_acc - 1e-6, (exp, acc, base_acc)


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
