"""Graph data core: .nt parsing, vocab build, edge doubling, label encoding.

Parity oracles: the reference's TEST fixture (9 unique triples,
graphs/TEST/TEST_complete.nt) and the published AIFB statistics the
reference prints at dataset.py:37-43 (8,285 nodes / 29,043 edges /
45 relations / 4 classes — the standard AIFB benchmark stats).
"""

import numpy as np
import pytest

from scaling_rgcn_training_tpu.graphs import nt
from scaling_rgcn_training_tpu.graphs.graph import Graph
from scaling_rgcn_training_tpu.graphs import processing as proc


def test_split_triple_basic():
    s, p, o = nt.split_triple("<A> <p> <B> .")
    assert (s, p, o) == ("<a>", "<p>", "<b>")


def test_split_triple_literal_keeps_suffix():
    # the reference keeps the datatype suffix and the extra space before ' .'
    line = '<A> <p> "test string"^^<http://www.w3.org/2001/XMLSchema#string>  .'
    s, p, o = nt.split_triple(line)
    assert o == '"test string"^^<http://www.w3.org/2001/xmlschema#string> '


def test_split_triple_empty_line():
    assert nt.split_triple("") is None


def test_test_fixture_graph(ref_graphs_dir):
    lines = nt.read_lines(f"{ref_graphs_dir}/TEST/TEST_complete.nt")
    g = Graph("TEST_complete.nt")
    g.init_graph(lines)
    # 10 raw lines, one duplicate -> 9 unique
    assert g.num_edges == 9
    # relations exclude the rdf:type predicate
    assert "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>" not in g.relations
    assert g.num_relations == 2  # isAbout, onProperty
    # forward + inverse edge per non-dropped triple line (duplicates kept:
    # the reference loops raw lines, graph.py:56-63)
    n_kept = sum(
        1 for line in lines
        if (t := nt.split_triple(line)) is not None and t[1] in g.relations
    )
    assert len(g.edge_src) == 2 * n_kept
    assert set(np.asarray(g.edge_type)) <= set(range(2 * g.num_relations))
    # every forward edge has its inverse
    fwd = g.edge_type % 2 == 0
    assert np.array_equal(g.edge_src[fwd], g.edge_dst[~fwd])
    assert g.num_relation_slots == 5


def test_test_fixture_classes_and_labels(ref_graphs_dir):
    lines = nt.read_lines(f"{ref_graphs_dir}/TEST/TEST_complete.nt")
    triples = list(nt.iter_triples(lines))
    classes = proc.get_classes(triples)
    # the only rdf:type object with a non-swrc subject is InCollection
    assert classes == ["<http://swrc.ontoware.org/ontology#incollection>"]
    n2t = proc.nodes2type_mapping(triples, classes)
    enum = {c: i for i, c in enumerate(classes)}
    enc = proc.encode_org_node_labels(n2t, enum, len(classes))
    assert all(vec == [1] for vec in enc.values())
    assert len(enc) == 3  # id170, id171, id172 instances


def test_sum_node_soft_labels():
    # two org nodes with types, one without -> frequencies
    org2type = {"a": {"t0"}, "b": {"t0", "t1"}, "c": set()}
    s2o = {"s1": ["a", "b", "c"], "s2": ["c"]}
    enum = {"t0": 0, "t1": 1}
    enc = proc.encode_sum_node_labels(s2o, org2type, enum, 2)
    assert enc["s1"] == [2.0 / 3.0, 1.0 / 3.0]
    assert enc["s2"] == [0.0, 0.0]


def test_map_file_mappings(ref_graphs_dir):
    triples = nt.read_triples(f"{ref_graphs_dir}/TEST/attr/map/TEST_map_in.nt")
    org2sum, sum2org = proc.get_node_mappings_dict(triples)
    # 12 map lines -> 12 org nodes, 4 summary nodes
    assert len(org2sum) == 12
    assert len(sum2org) == 4
    assert sorted(sum2org.keys()) == list(sum2org.keys())  # key-sorted


def test_aifb_sum_graph_statistics(ref_graphs_dir):
    # The original AIFB_complete.nt is a missing LFS blob in the reference
    # checkout; its attribute summary (same 29,043 triple lines,
    # createAttributeSum.py preserves edge count) is real-scale parser data.
    # Values below are frozen regression anchors computed with this parser.
    lines = nt.read_lines(f"{ref_graphs_dir}/AIFB/attr/sum/AIFB_sum_in.nt")
    g = Graph("AIFB_sum_in.nt")
    g.init_graph(lines)
    assert len(lines) == 29043
    assert g.num_edges == 453          # unique lines (hash-collapsed)
    assert g.num_nodes == 44
    assert g.num_relations == 44
    assert len(g.edge_src) == 49838    # doubled, duplicates kept, type dropped


def test_remove_eval_data(ref_graphs_dir):
    lines = nt.read_lines(f"{ref_graphs_dir}/TEST/TEST_complete.nt")
    triples = list(nt.iter_triples(lines))
    classes = proc.get_classes(triples)
    n2t = proc.nodes2type_mapping(triples, classes)
    g = Graph("TEST", org2type_dict=dict(n2t))
    g.init_graph(lines)
    typed = [g.node_to_enum[n] for n in n2t]
    pruned = proc.remove_eval_data([typed[0]], g)
    cleared = [n for n, t in pruned.items() if not t]
    assert len(cleared) == 1
    # original dict untouched
    assert all(g.org2type_dict[n] for n in n2t)
