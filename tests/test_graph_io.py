"""Round-trip tests for the graph interchange formats (SURVEY.md §2.1)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from kgray import graph_io
from kgray.schema import header_to_arrow_schema

NODE_HEADER = "id:ID\tname:string\tcategory:LABEL\tequivalent_identifiers:string[]\tscore:float\trank:int"


@pytest.fixture
def kgx_csv(tmp_path):
    path = tmp_path / "nodes.csv"
    path.write_text(
        "id,name,category,equivalent_identifiers,score,rank\n"
        "RAW:1,Alpha,biolink:Gene;biolink:NamedThing,RAW:1;EQ:0,0.5,2\n"
        "RAW:2,Beta,biolink:Disease,RAW:2,,\n"
    )
    return str(path)


def test_read_kgx_csv_decodes_lists_and_casts(ray_session, kgx_csv):
    ds = graph_io.read_kgx_csv(kgx_csv, NODE_HEADER, rename_cols={"category": "labels"})
    t = ds.take_all()
    by_id = {r["id"]: r for r in t}
    assert by_id["RAW:1"]["labels"] == ["biolink:Gene", "biolink:NamedThing"]
    assert by_id["RAW:1"]["equivalent_identifiers"] == ["RAW:1", "EQ:0"]
    assert by_id["RAW:1"]["score"] == 0.5 and by_id["RAW:1"]["rank"] == 2
    # empty cells: lists -> [], scalars -> null (Kuzu:141 NaN convention)
    assert by_id["RAW:2"]["equivalent_identifiers"] == ["RAW:2"]
    assert by_id["RAW:2"]["score"] is None and by_id["RAW:2"]["rank"] is None


def test_kgx_csv_roundtrip(ray_session, kgx_csv, tmp_path):
    ds = graph_io.read_kgx_csv(kgx_csv, NODE_HEADER)
    out = str(tmp_path / "out")
    graph_io.write_kgx_csv(ds, out)
    back = graph_io.read_kgx_csv(
        [os.path.join(out, f) for f in sorted(os.listdir(out))], NODE_HEADER
    ).take_all()
    orig = ds.take_all()
    key = lambda r: r["id"]
    assert sorted(back, key=key) == sorted(orig, key=key)


def test_read_graph_jsonl(ray_session, tmp_path):
    p = tmp_path / "nodes.jsonl"
    rows = [
        {"id": "RAW:1", "name": "Alpha", "category": ["biolink:Gene"]},
        {"id": "RAW:2", "name": "Beta", "category": ["biolink:Disease"]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    got = graph_io.read_graph_jsonl(str(p)).take_all()
    assert sorted(got, key=lambda r: r["id"]) == rows


def test_schema_manifest(tmp_path):
    schema = header_to_arrow_schema(NODE_HEADER)
    path = graph_io.write_schema_manifest(str(tmp_path), schema, extra={"table": "nodes"})
    m = json.load(open(path))
    assert m["table"] == "nodes"
    fields = {f["name"]: f for f in m["fields"]}
    assert fields["category"]["header_type"] == "LABEL"
    assert fields["score"]["type"] == "double"


def _node_edge_datasets():
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "id": ["RAW:0", "RAW:2"],
                "name": ["Ent0", "Ent2"],
                "labels": [["biolink:Gene"], ["biolink:Disease", "biolink:NamedThing"]],
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "subject": ["RAW:0"],
                "predicate": ["biolink:treats"],
                "object": ["RAW:2"],
                "edge_uid": ["abc123"],
                "n_mentions": [3],
            }
        )
    )
    return nodes, edges


def test_memgraph_merge_and_json_array(ray_session, tmp_path):
    nodes, edges = _node_edge_datasets()
    merged = graph_io.merge_nodes_edges(nodes, edges)
    out = str(tmp_path / "graph.json")
    res = graph_io.write_json_array(merged, out)
    assert res["n_records"] == 3

    data = json.load(open(out))  # must be valid JSON (S6 byte format)
    assert [r["type"] for r in data].count("node") == 2
    rel = next(r for r in data if r["type"] == "relationship")
    # M9 key remap: subject->start, object->end, predicate->label
    assert rel["start"] == "RAW:0" and rel["end"] == "RAW:2"
    assert rel["label"] == "biolink:treats" and rel["id"] == "abc123"
    assert rel["properties"]["n_mentions"] == 3
    node = next(r for r in data if r["id"] == "RAW:2")
    # M8: original fields nested under properties; labels preserved
    assert node["labels"] == ["biolink:Disease", "biolink:NamedThing"]
    assert node["properties"]["name"] == "Ent2"


def test_read_kgx_csv_delete_cols(ray_session, tmp_path):
    """M4 column delete (`Kuzu:151`, `AGE:296`): config-driven drop applied
    during the ingest decode."""
    from kgray.graph_io import read_kgx_csv

    p = tmp_path / "n.csv"
    p.write_text("id,name,junk\nA:1,alpha,x\nA:2,beta,y\n")
    ds = read_kgx_csv(
        [str(p)], "id:ID\tname:string\tjunk:string", delete_cols=["junk"]
    )
    rows = sorted(ds.take_all(), key=lambda r: r["id"])
    assert [set(r) for r in rows] == [{"id", "name"}] * 2
    assert rows[0] == {"id": "A:1", "name": "alpha"}


def test_orc_source_sink_roundtrip(ray_session, tmp_path):
    """Ray has no ORC reader; the composed source/sink round-trips exactly
    and the reader prunes columns at the stripe level."""
    import pyarrow as pa

    import ray.data as rd

    from kgray.graph_io import read_orc, write_orc

    tbl = pa.table(
        {
            "id": pa.array(range(100), type=pa.int64()),
            "name": pa.array([f"n{i}" for i in range(100)]),
            "score": pa.array([i * 0.5 for i in range(100)]),
        }
    )
    out = str(tmp_path / "orc")
    manifest = write_orc(rd.from_arrow(tbl).repartition(3), out).take_all()
    assert sum(m["rows"] for m in manifest) == 100
    assert len(manifest) == 3  # one file per block

    back = read_orc([m["path"] for m in manifest]).take_all()
    assert sorted(r["id"] for r in back) == list(range(100))
    assert {r["id"]: r["name"] for r in back}[7] == "n7"

    pruned = read_orc([m["path"] for m in manifest], columns=["id"]).take_all()
    assert set(pruned[0].keys()) == {"id"}


def test_feather_source_sink_roundtrip(ray_session, tmp_path):
    """Arrow IPC source/sink: exact round-trip, one file per block,
    column projection at the reader."""
    import pyarrow as pa

    import ray.data as rd

    from kgray.graph_io import read_feather, write_feather

    tbl = pa.table(
        {
            "id": pa.array(range(80), type=pa.int64()),
            "name": pa.array([f"n{i}" for i in range(80)]),
            "vec": pa.array([[float(i), i + 0.5] for i in range(80)],
                            type=pa.list_(pa.float64())),
        }
    )
    out = str(tmp_path / "feather")
    manifest = write_feather(rd.from_arrow(tbl).repartition(4), out).take_all()
    assert sum(m["rows"] for m in manifest) == 80
    assert len(manifest) == 4

    back = read_feather([m["path"] for m in manifest]).take_all()
    assert sorted(r["id"] for r in back) == list(range(80))
    by_id = {r["id"]: r for r in back}
    assert by_id[3]["name"] == "n3" and list(by_id[3]["vec"]) == [3.0, 3.5]

    pruned = read_feather([m["path"] for m in manifest], columns=["id"]).take_all()
    assert set(pruned[0].keys()) == {"id"}


def test_tar_shard_roundtrip_and_pruning(ray_session, tmp_path):
    """WebDataset tar shards: key-grouped members round-trip exactly,
    missing members become nulls, suffix pruning never extracts
    unrequested member bytes, and rows_per_shard splits blocks."""
    import pyarrow as pa

    import ray.data as rd

    from kgray.graph_io import read_tar_shards, write_tar_shards

    n = 30
    tbl = pa.table(
        {
            "key": pa.array([f"s{i:04d}" for i in range(n)]),
            "jpg": pa.array(
                [b"IMG:%d" % i for i in range(n)], type=pa.binary()
            ),
            "json": pa.array(
                [(b'{"i":%d}' % i) if i % 3 else None for i in range(n)],
                type=pa.binary(),
            ),
        }
    )
    out = str(tmp_path / "wds")
    manifest = write_tar_shards(
        rd.from_arrow(tbl).repartition(4), out, ["jpg", "json"]
    ).take_all()
    assert sum(m["rows"] for m in manifest) == n
    assert len(manifest) == 4
    # null json members are skipped, not emitted as empty files
    assert sum(m["members"] for m in manifest) == n + sum(
        1 for i in range(n) if i % 3
    )

    back = read_tar_shards(
        [m["path"] for m in manifest], suffixes=("jpg", "json")
    ).take_all()
    assert len(back) == n
    by_key = {r["key"]: r for r in back}
    for i in range(n):
        r = by_key[f"s{i:04d}"]
        assert r["jpg"] == b"IMG:%d" % i
        if i % 3:
            assert r["json"] == b'{"i":%d}' % i
        else:
            assert r["json"] is None
        assert r["shard"].startswith("part-")

    # suffix pruning: json column absent entirely
    pruned = read_tar_shards(
        [m["path"] for m in manifest], suffixes=("jpg",)
    ).take_all()
    assert set(pruned[0].keys()) == {"shard", "key", "jpg"}

    # inferred suffixes (homogeneous corpus) match the explicit read
    inferred = read_tar_shards([m["path"] for m in manifest]).take_all()
    assert {r["key"]: r["jpg"] for r in inferred} == {
        r["key"]: r["jpg"] for r in back
    }

    # rows_per_shard re-shards inside the task
    out2 = str(tmp_path / "wds2")
    man2 = write_tar_shards(
        rd.from_arrow(tbl), out2, ["jpg"], rows_per_shard=8
    ).take_all()
    assert sorted(m["rows"] for m in man2) == [6, 8, 8, 8]

    # deterministic shard bytes: same block content -> same tar bytes
    out3 = str(tmp_path / "wds3")
    man3 = write_tar_shards(rd.from_arrow(tbl), out3, ["jpg"]).take_all()
    out4 = str(tmp_path / "wds4")
    man4 = write_tar_shards(rd.from_arrow(tbl), out4, ["jpg"]).take_all()
    b3 = open(man3[0]["path"], "rb").read()
    b4 = open(man4[0]["path"], "rb").read()
    assert b3 == b4


def test_tar_shard_gzip_roundtrip(ray_session, tmp_path):
    """compress='gz' writes .tar.gz shards with deterministic bytes
    (gzip mtime pinned); the reader's r:* mode accepts them unchanged."""
    import pyarrow as pa

    import ray.data as rd

    from kgray.graph_io import read_tar_shards, write_tar_shards

    tbl = pa.table(
        {
            "key": pa.array([f"k{i}" for i in range(12)]),
            "jpg": pa.array(
                [b"payload-%d" % i for i in range(12)], type=pa.binary()
            ),
        }
    )
    out = str(tmp_path / "gz")
    man = write_tar_shards(
        rd.from_arrow(tbl).repartition(3), out, ["jpg"], compress="gz"
    ).take_all()
    assert all(m["path"].endswith(".tar.gz") for m in man)
    back = read_tar_shards(
        [m["path"] for m in man], suffixes=("jpg",)
    ).take_all()
    assert sorted((r["key"], r["jpg"]) for r in back) == sorted(
        (f"k{i}", b"payload-%d" % i) for i in range(12)
    )
    # deterministic shard bytes for the same block content
    out2, out3 = str(tmp_path / "g2"), str(tmp_path / "g3")
    m2 = write_tar_shards(rd.from_arrow(tbl), out2, ["jpg"], compress="gz").take_all()
    m3 = write_tar_shards(rd.from_arrow(tbl), out3, ["jpg"], compress="gz").take_all()
    assert open(m2[0]["path"], "rb").read() == open(m3[0]["path"], "rb").read()


def test_tar_shard_property_roundtrip(ray_session, tmp_path):
    """Property-based WebDataset round-trip: arbitrary keys (dots split
    at the FIRST one only), member sizes incl. empty payloads, and
    arbitrary null patterns survive write -> read bit-for-bit."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    import ray.data as rd

    from kgray.graph_io import read_tar_shards, write_tar_shards

    keys = st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-",
            min_size=1, max_size=12,
        ),
        min_size=1, max_size=12, unique=True,
    )
    payload = st.one_of(st.none(), st.binary(max_size=64))

    @given(ks=keys, data=st.data())
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(ks, data):
        a = [data.draw(payload) for _ in ks]
        b = [data.draw(payload) for _ in ks]
        # a sample with EVERY member null emits no tar entries and is
        # unrecoverable by design — drop those rows from the expectation
        rows = [
            (k, x, y) for k, x, y in zip(ks, a, b)
            if x is not None or y is not None
        ]
        tbl = pa.table(
            {
                "key": pa.array(ks),
                "jpg": pa.array(a, type=pa.binary()),
                "cls": pa.array(b, type=pa.binary()),
            }
        )
        import tempfile

        with tempfile.TemporaryDirectory(dir=str(tmp_path)) as out:
            man = write_tar_shards(
                rd.from_arrow(tbl), out, ["jpg", "cls"]
            ).take_all()
            got = read_tar_shards(
                [m["path"] for m in man], suffixes=("jpg", "cls")
            ).take_all()
        assert sorted((r["key"], r["jpg"], r["cls"]) for r in got) == sorted(rows)

    check()
