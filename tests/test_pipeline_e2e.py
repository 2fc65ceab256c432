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
    # partition layout: hive dirs per primary class (P1) and the FULL P2
    # (predicate, subject_class, object_class) triple binning (`Kuzu:344`)
    assert glob.glob(str(tmp_path / "kg" / "nodes" / "primary_class=*"))
    assert glob.glob(str(tmp_path / "kg" / "edges" / "predicate=*"))
    triple_dirs = glob.glob(
        str(tmp_path / "kg" / "edges" / "predicate=*" / "subject_class=*" / "object_class=*")
    )
    assert triple_dirs
    # co-located write: exactly ONE file per (pred, subj, obj) bin
    for d in triple_dirs[:20]:
        assert len(glob.glob(d + "/*.parquet")) == 1

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
    # lineage records the triple-keyed edge layout and per-bin counts
    write = lineage["stages"]["write"]
    assert write["edge_layout"] == ["predicate", "subject_class", "object_class"]
    assert len(write["edge_partitions"]) == len(triple_dirs)
    assert sum(write["edge_partitions"].values()) == edges.num_rows


def test_flagship_resume_skips(sf_dir, tmp_path):
    out1 = run_flagship(sf_dir, str(tmp_path / "kg2"))
    assert out1["resumed"] is False
    out2 = run_flagship(sf_dir, str(tmp_path / "kg2"))
    assert out2["resumed"] is True


def test_global_turn_order_matches_local(ray_session, sf_dir, tmp_path):
    """Block-local sort == global sort when conversations are
    block-contiguous (the generated corpus's layout)."""
    import ray.data

    from kgray.pipeline import KGPipeline
    from kgray.transcripts import transcripts_dataset

    outs = {}
    for mode in ("local", "global"):
        pipe = KGPipeline(
            out_dir=str(tmp_path / mode), resume=False, turn_order=mode
        )
        pipe.run(transcripts_dataset(sf_dir), fingerprint=mode)
        edges = ray.data.read_parquet(str(tmp_path / mode / "edges")).take_all()
        outs[mode] = sorted(
            (r["subject"], r["predicate"], r["object"], r["n_mentions"])
            for r in edges
        )
    assert outs["local"] == outs["global"]


def test_fingerprint_invalidation_forces_rerun(ray_session, sf_dir, tmp_path):
    from kgray.pipeline import KGPipeline
    from kgray.transcripts import transcripts_dataset

    out = str(tmp_path / "fp")
    pipe = KGPipeline(out_dir=out, resume=True)
    r1 = pipe.run(transcripts_dataset(sf_dir), fingerprint="v1")
    assert not r1["resumed"]
    r2 = KGPipeline(out_dir=out, resume=True).run(
        transcripts_dataset(sf_dir), fingerprint="v1"
    )
    assert r2["resumed"]  # same fingerprint -> skip
    r3 = KGPipeline(out_dir=out, resume=True).run(
        transcripts_dataset(sf_dir), fingerprint="v2"
    )
    assert not r3["resumed"]  # changed inputs -> full rebuild


def test_local_tail_matches_distributed(ray_session, sf_dir, tmp_path):
    """Size-routed tail parity: tail_local_limit=0 forces the distributed
    node-build/tag/write path; the default routes the same corpus through
    the driver-local tail. Outputs must match bit-for-bit (sorted), and
    the hive layout (incl. full P2 triple binning) must be identical."""
    import pyarrow.dataset as pads

    from kgray.pipeline import KGPipeline
    from kgray.transcripts import transcripts_dataset

    tables = {}
    layouts = {}
    for name, limit in (("dist", 0), ("loc", 2_000_000)):
        out = str(tmp_path / name)
        pipe = KGPipeline(out_dir=out, resume=False, tail_local_limit=limit)
        r = pipe.run(transcripts_dataset(sf_dir), fingerprint=name)
        assert r["metrics"]["stages"]["write"].get("tail_local") == (
            True if name == "loc" else None
        )
        for sub in ("nodes", "edges"):
            t = pads.dataset(f"{out}/{sub}", partitioning="hive").to_table()
            keys = [k for k in ("edge_uid", "id") if k in t.column_names]
            cols = sorted(t.column_names)
            tables[(name, sub)] = t.select(cols).sort_by(
                [(k, "ascending") for k in keys]
            )
        layouts[name] = sorted(
            p.relative_to(out).as_posix()
            for p in __import__("pathlib").Path(out).glob("edges/**/")
        )

    for sub in ("nodes", "edges"):
        assert tables[("dist", sub)].equals(tables[("loc", sub)]), sub
    assert layouts["dist"] == layouts["loc"]
