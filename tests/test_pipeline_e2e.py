"""End-to-end flagship pipeline vs the pure-Python oracle (FIXTURES.md F5).

Triple-level P/R target: 1.0 at fixture scale (north_rule requires >= 0.95).
"""

import glob

import pyarrow.parquet as pq

from kgray.pipeline import run_flagship
from tests.oracle import oracle_edges, oracle_nodes, oracle_turns


def _read_dir(path):
    return pq.ParquetDataset(path).read()


def test_flagship_end_to_end(sf_dir, tmp_path):
    out = run_flagship(sf_dir, str(tmp_path / "kg"), resume=False)
    edges = _read_dir(out["edges"])
    nodes = _read_dir(out["nodes"])

    got_triples = set(
        zip(
            edges["subject"].to_pylist(),
            edges["predicate"].to_pylist(),
            edges["object"].to_pylist(),
        )
    )
    expected = oracle_edges(oracle_turns(range(500)))
    missing = expected - got_triples
    extra = got_triples - expected
    precision = 1 - len(extra) / max(1, len(got_triples))
    recall = 1 - len(missing) / max(1, len(expected))
    assert precision == 1.0 and recall == 1.0, (len(missing), len(extra))

    # dedup: no repeated (s,p,o)
    assert len(got_triples) == edges.num_rows

    # node table = distinct canonical endpoints, normalized
    exp_nodes = oracle_nodes(expected)
    got_nodes = {r["id"]: r for r in nodes.to_pylist()}
    assert set(got_nodes) == set(exp_nodes)
    for nid, exp in exp_nodes.items():
        got = got_nodes[nid]
        assert got["name"] == exp["name"]
        assert got["labels"] == exp["labels"]
    # partition layout: hive dirs per primary class (P1)
    assert glob.glob(str(tmp_path / "kg" / "nodes" / "primary_class=*"))
    assert glob.glob(str(tmp_path / "kg" / "edges" / "predicate=*"))

    # canonical ids are all even members (union-find merged the pairs)
    assert all(int(i.split(":")[1]) % 2 == 0 for i in got_nodes)

    # edge uids unique + deterministic content hash
    uids = edges["edge_uid"].to_pylist()
    assert len(set(uids)) == len(uids)

    # lineage manifest with link-rate accounting
    import json

    with open(tmp_path / "kg" / "lineage.json") as f:
        lineage = json.load(f)
    link = lineage["stages"]["link"]
    assert link["dropped_unlinked"] > 0  # the planted unlinkables were counted
    assert 0.8 < link["link_rate"] < 1.0


def test_flagship_resume_skips(sf_dir, tmp_path):
    out1 = run_flagship(sf_dir, str(tmp_path / "kg2"))
    assert out1["resumed"] is False
    out2 = run_flagship(sf_dir, str(tmp_path / "kg2"))
    assert out2["resumed"] is True
