"""Summarizer tooling: murmur parity, byte-parity with reference logic,
dummy/bisim converters, end-to-end over regenerated summaries."""

import os
from collections import defaultdict

import numpy as np
import pytest

from scaling_rgcn_training_tpu.graphs.summarize.murmur import hash128
from scaling_rgcn_training_tpu.graphs.summarize.attribute import create_sum_map
from scaling_rgcn_training_tpu.graphs.summarize.dummy import create_dummy_sum_map
from scaling_rgcn_training_tpu.graphs.summarize import bisim


def test_murmur_mmh3_vectors():
    # mmh3 README vector + real hashes from the reference-generated TEST
    # fixture (graphs/TEST/attr/map/TEST_map_in.nt)
    assert hash128("foo") == 168394135621993849475852668931176482145
    assert hash128("<http://swrc.ontoware.org/ontology#isAbout>") == \
        66601471798836740805022011327225834224
    assert hash128("<http://www.w3.org/2002/07/owl#onProperty>") == \
        70688075067720844723347083532547534432
    assert hash128(b"") == 0
    # >16-byte input exercises the block loop
    assert hash128("a" * 40) == hash128("a" * 40)
    assert hash128("a" * 40) != hash128("a" * 41)


def _reference_create_sum_map_sim(path, sum_path, map_path, dataset):
    """Verbatim-logic simulation of the CURRENT reference
    createAttributeSum.py:6-67 (mmh3 replaced by our hash128), used as the
    byte-parity oracle for our implementation."""
    outgoing, incoming = defaultdict(set), defaultdict(set)
    with open(path) as file:
        triples = file.read().splitlines()
        for triple in triples:
            tl = triple[:-2].split(" ", maxsplit=2)
            if tl != ['']:
                s, p, o = tl[0].lower(), tl[1].lower(), tl[2].lower()
                if p != '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>':
                    outgoing[s].add(p)
                    if o.startswith('"'):
                        incoming['http://example.org/literal'].add(p)
                    else:
                        incoming[o].add(p)
        out_h = {s: hash128(','.join(sorted(list(p1))).encode('utf8'))
                 for s, p1 in outgoing.items()}
        in_h = {s: hash128(','.join(sorted(list(p2))).encode('utf8'))
                for s, p2 in incoming.items()}
        io_h = {}
        for entity in set(incoming.keys()).union(set(outgoing.keys())):
            io_h[entity] = in_h.get(entity, 0) + out_h.get(entity, 0)

        def write(ph, sum_file, map_file):
            keys = ph.keys()
            mapping = {}
            with open(sum_file, "w") as f:
                for triple in triples:
                    tl = triple[:-2].split(" ", maxsplit=2)
                    if tl != ['']:
                        s, p, o = tl[0].lower(), tl[1].lower(), tl[2].lower()
                        if o.startswith('"') and 'http://example.org/literal' in keys:
                            obj = ph['http://example.org/literal']
                        else:
                            obj = ph[o] if o in keys else '0'
                        sub = ph[s] if s in keys else '0'
                        mapping[s] = sub
                        mapping[o] = obj
                        f.write(f'<{sub}> {p} <{obj}> .\n')
            with open(map_file, "w") as m:
                for o_node, s_node in mapping.items():
                    m.write(f'<{s_node}> <isSummaryOf> {str(o_node)} .\n')

        write(out_h, f'{sum_path}/{dataset}_sum_out.nt', f'{map_path}/{dataset}_map_out.nt')
        write(in_h, f'{sum_path}/{dataset}_sum_in.nt', f'{map_path}/{dataset}_map_in.nt')
        write(io_h, f'{sum_path}/{dataset}_sum_in_out.nt', f'{map_path}/{dataset}_map_in_out.nt')


def test_attribute_summary_byte_parity(ref_graphs_dir, tmp_path):
    ours = tmp_path / "ours"
    oracle = tmp_path / "oracle"
    for d in (ours / "sum", ours / "map", oracle / "sum", oracle / "map"):
        d.mkdir(parents=True)
    org = f"{ref_graphs_dir}/TEST/TEST_complete.nt"
    create_sum_map(org, str(ours / "sum"), str(ours / "map"), "TEST")
    _reference_create_sum_map_sim(org, str(oracle / "sum"), str(oracle / "map"), "TEST")
    for v in ["in", "out", "in_out"]:
        for kind in ["sum", "map"]:
            a = (ours / kind / f"TEST_{kind}_{v}.nt").read_text()
            b = (oracle / kind / f"TEST_{kind}_{v}.nt").read_text()
            assert a == b, f"{kind}_{v} differs from reference logic"


def test_attribute_summary_end_to_end(ref_graphs_dir, tmp_path):
    """Regenerated summaries feed the full Dataset pipeline cleanly."""
    from scaling_rgcn_training_tpu.graphs.dataset import Dataset

    (tmp_path / "sum").mkdir()
    (tmp_path / "map").mkdir()
    org = f"{ref_graphs_dir}/TEST/TEST_complete.nt"
    create_sum_map(org, str(tmp_path / "sum"), str(tmp_path / "map"), "TEST")
    data = Dataset(org, str(tmp_path / "sum"), str(tmp_path / "map")).init_dataset(verbose=False)
    assert len(data.sumGraphs) == 3
    for sg in data.sumGraphs:
        assert sg.num_relations == data.orgGraph.num_relations
        assert sg.x_train is not None and len(sg.x_train) > 0


def test_dummy_summary(ref_graphs_dir, tmp_path):
    (tmp_path / "sum").mkdir()
    (tmp_path / "map").mkdir()
    org = f"{ref_graphs_dir}/TEST/TEST_complete.nt"
    create_dummy_sum_map(org, str(tmp_path / "sum"), str(tmp_path / "map"),
                         "TEST", n_sum_nodes=3, seed=7)
    sum_f = tmp_path / "sum" / "TEST_sum_random3.nt"
    map_f = tmp_path / "map" / "TEST_map_random3.nt"
    assert sum_f.exists() and map_f.exists()
    # structure-preserving: one line per parsed triple
    org_lines = [l for l in open(org).read().splitlines()
                 if l[:-2].split(" ", maxsplit=2) not in ([""],)]
    assert len(sum_f.read_text().splitlines()) == len(org_lines)
    # deterministic under seed
    create_dummy_sum_map(org, str(tmp_path / "sum"), str(tmp_path / "map"),
                         "TEST2", n_sum_nodes=3, seed=7)
    # (different dataset prefix, same seed -> same assignment pattern)


def test_bisim_reformat():
    # non-AM/BGS: literal with xmlschema datatype
    out = bisim.reformat('"5"^^http://www.w3.org/2001/xmlschema#integer', "AIFB")
    assert out == '"5"^^<http://www.w3.org/2001/xmlschema#integer>'
    # fluid bnode prefix
    assert bisim.reformat("http://informatik.uni-kiel.de/fluid#b1", "AIFB") == "_:b1"
    # plain URI
    assert bisim.reformat("http://x.org/a", "AIFB") == "<http://x.org/a>"
    # AM: non-http passes through
    assert bisim.reformat("some literal", "AM") == "some literal"


def test_bisim_csv_conversion(ref_graphs_dir, tmp_path):
    src = f"{ref_graphs_dir}/AIFB/bisim/bisimOutput"
    if not os.path.isdir(src):
        pytest.skip("no bisim fixtures")
    written = bisim.create_bisim_map_nt(src, str(tmp_path / "AIFB_bisim_map_"), "AIFB")
    assert len(written) >= 1
    first = open(written[0]).read().splitlines()
    assert all(" <isSummaryOf> " in l for l in first[:50])
    assert len(first) > 100
