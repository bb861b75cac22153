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
@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"],
                         ids=["f32", "bf16"])
def test_transfer_matrix_beats_baseline(synth_data, compute_dtype):
    """The reference's core scientific claim (README.md:5-14): summary
    pre-training + transfer outperforms the from-scratch baseline, with
    the head ordering attention >= mlp >= summation > baseline — and it
    must hold in the TPU-default mixed-precision regime too (bf16 edge
    streams / f32 accumulation, the bench.py default), not just f32.

    Asserted on MEANS over 3 seeds (the 21-node test split makes any
    single seed fragile: 1 node flip = 4.8 points; a mean moves 1.6).
    Recorded means at 30 epochs:
      f32  baseline 0.540, summation 0.730, mlp 0.794, attention 0.857
      bf16 baseline 0.556, summation 0.746, mlp 0.826, attention 0.841
    Ordering tolerances allow ~3 mean-level flips; the transfer-vs-
    baseline gap (>=0.19 measured) is asserted at >=0.05."""
    cfg_b = {"dataset": "SYNTH", "num_sums": 1, "e_trans": False,
             "w_trans": False}
    configs = {"dataset": "SYNTH", "num_sums": 3, "e_trans": True,
               "e_freeze": True, "w_trans": True, "w_grad": True}
    accs = {e: [] for e in ["baseline", "summation", "mlp", "attention"]}
    for seed in range(3):
        t0 = Trainer(synth_data, hidden_l=16, epochs=30, emb_dim=24,
                     lr=0.01, weight_d=5e-5, seed=seed * 10,
                     backend="gather", compute_dtype=compute_dtype)
        accs["baseline"].append(t0.train_original(
            "summation", cfg_b, "baseline", verbose=False)["test_acc"])
        t = Trainer(synth_data, hidden_l=16, epochs=30, emb_dim=24,
                    lr=0.01, weight_d=5e-5, seed=seed * 10 + 1,
                    backend="gather", compute_dtype=compute_dtype)
        t.train_summaries(configs, verbose=False)
        for exp in ["summation", "mlp", "attention"]:
            res = t.train_original(exp, configs, exp, verbose=False)
            accs[exp].append(res["test_acc"])
            assert np.isfinite(res["loss"]).all()
            assert res["loss"][-1] < res["loss"][0]  # training progresses
    mean = {e: float(np.mean(v)) for e, v in accs.items()}
    # head ordering (reference README.md:5-14 claim), mean-level tolerance
    assert mean["attention"] >= mean["mlp"] - 0.05, mean
    assert mean["mlp"] >= mean["summation"] - 0.05, mean
    # every transfer head clearly beats the from-scratch baseline
    for exp in ["summation", "mlp", "attention"]:
        assert mean[exp] >= mean["baseline"] + 0.05, (exp, mean)
    assert mean["attention"] >= mean["baseline"] + 0.15, mean
    # absolute floors (≈3 mean-level flips under the recorded means)
    floors = {"summation": 0.60, "mlp": 0.70, "attention": 0.75}
    for exp, fl in floors.items():
        assert mean[exp] >= fl, (exp, mean)


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
