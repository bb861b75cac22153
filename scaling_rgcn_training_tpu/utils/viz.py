"""Embedding visualization (reference helpers/vizEmb.py:9-35).

Saves the summed transfer embedding, t-SNE-transforms it (init='pca') and
writes a scatter PDF. Persistence format is .npy (no torch in this
framework); everything matplotlib/sklearn is import-gated.
"""

from __future__ import annotations

import os

import numpy as np


def save_and_viz_embedding(configs, data, trainer) -> None:
    """Triggered by -e_viz with the summation trick (reference
    modelTrainer.py:98-100 -> vizEmb.main_viz_emb)."""
    import jax

    from scaling_rgcn_training_tpu.train.transfer import sum_embeddings

    out_dir = os.path.join(configs.get("results_root", "./results"), "embeddings")
    os.makedirs(out_dir, exist_ok=True)
    emb = np.asarray(sum_embeddings(
        data.orgGraph, data.sumGraphs, configs["emb"], jax.random.key(0)))
    base = f'{configs["dataset"]}_{configs["sum"]}_embedding'
    np.save(os.path.join(out_dir, base + ".npy"), emb)
    viz_embedding(emb, configs["dataset"], configs["sum"], out_dir)


def viz_embedding(embedding: np.ndarray, dataset: str, sum_name: str, out_dir: str) -> str:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.manifold import TSNE
    except ImportError:
        return ""
    trans = TSNE(init="pca").fit_transform(embedding)
    x, y = trans[:, 0], trans[:, 1]
    z = x - y
    sum_type = {"attr": "Attribute", "bisim": "(k)-f. bisim."}.get(sum_name, sum_name)
    plt.figure()
    plt.scatter(x, y, c=z, cmap="viridis_r", s=0.8)
    plt.title(f"t-SNE transformed entity embedding ({dataset} {sum_type} summaries)")
    out = os.path.join(out_dir, f"{dataset}_{sum_name}_embedding.pdf")
    plt.savefig(out, format="pdf")
    plt.close()
    return out
