"""Locality-aware node reordering for the halo partition.

The halo partition (parallel/halo.py) assigns contiguous node ranges to
devices, so its ICI traffic is the number of distinct remote sources each
shard reads — the edge cut of the *node numbering*. RDF graphs come
numbered by sorted IRI (graphs/graph.py vocab order), which is
uncorrelated with topology; a clustering reorder maps communities to
contiguous ranges and shrinks the cut.

This is the TPU-native stand-in for the partitioner inside distributed
GNN systems (METIS in DistDGL etc.) — implemented from scratch as
vectorized numpy label propagation (no external deps, runs once per graph
on the host; the reference has nothing like it — it is single-device,
model/modelTrainer.py:16).

Algorithm: synchronous label propagation over the undirected edge set.
Every node starts with its own label; each round it adopts the most
frequent label among its neighbors (ties -> smaller label). Communities
converge in a handful of rounds; the new numbering sorts nodes by final
label. Each round is one O(E log E) sort — no Python per-node loops.
"""

from __future__ import annotations

import numpy as np


def _majority_label(u: np.ndarray, nbr_label: np.ndarray,
                    labels: np.ndarray) -> np.ndarray:
    """For each node, the most frequent label among its neighbors.

    ``u``: edge endpoints (int64, one row per directed edge), ``nbr_label``
    the label at the other endpoint. Nodes without edges keep their label.
    """
    n = labels.shape[0]
    key = u * np.int64(n) + nbr_label
    uniq, counts = np.unique(key, return_counts=True)
    ku = uniq // n
    kl = uniq % n
    # per node, pick the (count, -label)-max entry: sort by (node, count,
    # -label) and take the last row of each node group
    order = np.lexsort((-kl, counts, ku))
    ku, kl = ku[order], kl[order]
    last = np.flatnonzero(np.diff(ku, append=np.int64(-1)) != 0)
    out = labels.copy()
    out[ku[last]] = kl[last]
    return out


def locality_reorder(edge_src: np.ndarray, edge_dst: np.ndarray,
                     num_nodes: int, rounds: int = 30) -> np.ndarray:
    """-> ``perm`` with ``perm[old_id] = new_id`` (a relabeling).

    Label-propagation clustering: nodes in the same community land in one
    contiguous block of new ids, so contiguous-range partitions cut few
    edges on community-structured graphs (most real RDF KGs). On a
    locality-free random graph the cut is provably ~(S-1)/S for any
    numbering — the reorder is a no-op there, not a regression.
    """
    src = np.asarray(edge_src, np.int64)
    dst = np.asarray(edge_dst, np.int64)
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    labels = np.arange(num_nodes, dtype=np.int64)
    for _ in range(rounds):
        new = _majority_label(u, labels[v], labels)
        if np.array_equal(new, labels):
            break
        labels = new
    # new id = rank under (label, old id): communities contiguous,
    # deterministic within a community
    order = np.lexsort((np.arange(num_nodes), labels))
    perm = np.empty(num_nodes, np.int64)
    perm[order] = np.arange(num_nodes)
    return perm.astype(np.int32)


def edge_cut_fraction(edge_src: np.ndarray, edge_dst: np.ndarray,
                      num_nodes: int, num_shards: int,
                      perm: np.ndarray | None = None) -> float:
    """Fraction of edges whose src and dst land on different shards
    under the contiguous-range partition (after optional relabeling)."""
    src = np.asarray(edge_src, np.int64)
    dst = np.asarray(edge_dst, np.int64)
    if perm is not None:
        perm = np.asarray(perm, np.int64)
        src, dst = perm[src], perm[dst]
    n_per = -(-num_nodes // num_shards)
    return float(np.mean(src // n_per != dst // n_per))
