"""Incremental graph update: flagship(full) == flagship(half) + update(rest);
re-applying the same delta is a no-op (exact idempotent union)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from kgray.pipeline import KGPipeline, update_graph
from kgray.transcripts import transcripts_dataset

SF = "/root/testdata/sf0.001"


def _split(ds, keep_even: bool):
    def f(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.replace_substring(t["conv_id"].combine_chunks(), "conv-", ""),
            pa.int64(),
        )
        mask = pc.equal(pc.bit_wise_and(c, 1), 0 if keep_even else 1)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def _edge_uids(path: str) -> set:
    return set(pq.ParquetDataset(path).read(columns=["edge_uid"])["edge_uid"].to_pylist())


def _node_ids(path: str) -> set:
    return set(pq.ParquetDataset(path).read(columns=["id"])["id"].to_pylist())


def test_update_graph_matches_oneshot(ray_session, tmp_path):
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")

    base = _split(transcripts_dataset(SF), keep_even=True)
    KGPipeline(out_dir=inc_dir).run(base, fingerprint="base")

    delta = _split(transcripts_dataset(SF), keep_even=False)
    res = update_graph(inc_dir, delta)
    assert res["new_edges"] > 0 and res["new_nodes"] >= 0

    KGPipeline(out_dir=full_dir).run(transcripts_dataset(SF), fingerprint="full")

    assert _edge_uids(f"{inc_dir}/edges") == _edge_uids(f"{full_dir}/edges")
    assert _node_ids(f"{inc_dir}/nodes") == _node_ids(f"{full_dir}/nodes")

    # idempotence: the same delta again adds nothing
    res2 = update_graph(inc_dir, _split(transcripts_dataset(SF), keep_even=False))
    assert res2["new_edges"] == 0 and res2["new_nodes"] == 0
    assert res2["duplicate_edges_skipped"] == res2["metrics"]["stages"]["update"][
        "candidate_edges"
    ]
    assert _edge_uids(f"{inc_dir}/edges") == _edge_uids(f"{full_dir}/edges")

    # snapshot diff between the incremental and one-shot outputs is empty
    from kgray.pipeline import snapshot_diff

    assert snapshot_diff(full_dir, inc_dir) == {
        "added_edges": 0, "removed_edges": 0,
    }


def test_compact_graph_preserves_content(ray_session, tmp_path):
    """base + delta leaves multi-file partitions; compaction folds each to
    one file without changing a row, is idempotent, and finishes an
    interrupted commit from the _COMMIT marker."""
    import glob
    import json
    import os
    import shutil

    from kgray.pipeline import compact_graph

    out = str(tmp_path / "g")
    KGPipeline(out_dir=out).run(_split(transcripts_dataset(SF), keep_even=True),
                                fingerprint="base")
    update_graph(out, _split(transcripts_dataset(SF), keep_even=False))

    edges_before = _edge_uids(f"{out}/edges")
    nodes_before = _node_ids(f"{out}/nodes")
    n_files_before = len(glob.glob(f"{out}/*/**/*.parquet", recursive=True))

    rep = compact_graph(out, target_rows_per_file=1 << 20)
    assert rep["partitions_compacted"] > 0
    assert rep["files_after"] < rep["files_before"]
    assert _edge_uids(f"{out}/edges") == edges_before
    assert _node_ids(f"{out}/nodes") == nodes_before
    n_files_after = len(glob.glob(f"{out}/*/**/*.parquet", recursive=True))
    assert n_files_after < n_files_before

    # idempotent: nothing left to compact
    rep2 = compact_graph(out, target_rows_per_file=1 << 20)
    assert rep2["partitions_compacted"] == 0

    # lineage carries the record
    doc = json.load(open(f"{out}/lineage.json"))
    assert len(doc["compactions"]) == 2

    # crash recovery: stage a fake interrupted commit (tmp with _COMMIT and
    # the staged file moved out of the partition) and verify it completes
    part = os.path.dirname(
        glob.glob(f"{out}/edges/**/*.parquet", recursive=True)[0]
    )
    tmp = os.path.join(part, ".compact_tmp")
    os.makedirs(tmp)
    staged = sorted(os.listdir(part))
    staged = [f for f in staged if f.endswith(".parquet")]
    for f in staged:
        shutil.copy(os.path.join(part, f), os.path.join(tmp, f))
    with open(os.path.join(tmp, "_COMMIT"), "w") as fh:
        json.dump({"files": staged, "rows": -1}, fh)
    rep3 = compact_graph(out, target_rows_per_file=1 << 20)
    assert rep3["partitions_compacted"] >= 1
    assert not os.path.isdir(tmp)
    assert _edge_uids(f"{out}/edges") == edges_before

    # crash recovery, mid-commit: the process died AFTER unlinking the old
    # files and moving part of the staged set in (part holds staged file A,
    # tmp still holds staged file B + _COMMIT).  Recovery must NOT treat A
    # as an old file to unlink — that is the data-loss path — and must move
    # B in to finish.
    part_files = sorted(
        f for f in os.listdir(part) if f.endswith(".parquet")
    )
    assert part_files, "partition should hold parquet after compaction"
    whole = pq.ParquetDataset(
        [os.path.join(part, f) for f in part_files]
    ).read()
    os.makedirs(tmp)
    # rename every current file to a staged name; move the first "staged"
    # file into part (simulating a completed replace), keep the rest in tmp
    staged2 = []
    for i, f in enumerate(part_files):
        name = f"staged_{i}.parquet"
        staged2.append(name)
        src = os.path.join(part, f)
        if i == 0:
            os.replace(src, os.path.join(part, name))  # already moved in
        else:
            os.replace(src, os.path.join(tmp, name))  # still staged
    with open(os.path.join(tmp, "_COMMIT"), "w") as fh:
        json.dump({"files": staged2, "rows": -1}, fh)
    compact_graph(out, target_rows_per_file=1 << 20)
    assert not os.path.isdir(tmp)
    after = pq.ParquetDataset(
        [os.path.join(part, f) for f in sorted(os.listdir(part))
         if f.endswith(".parquet")]
    ).read()
    assert after.num_rows == whole.num_rows
    assert _edge_uids(f"{out}/edges") == edges_before

    # torn marker: an unreadable _COMMIT proves the commit never started
    # (the marker is fsynced before any unlink), so tmp is discarded and
    # the old files are the truth.
    os.makedirs(tmp)
    with open(os.path.join(tmp, "junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    with open(os.path.join(tmp, "_COMMIT"), "w") as fh:
        fh.write('{"files": ["junk.parq')  # truncated mid-write
    compact_graph(out, target_rows_per_file=1 << 20)
    assert not os.path.isdir(tmp)
    assert _edge_uids(f"{out}/edges") == edges_before


def test_incremental_dedup_store_matches_oneshot(ray_session, tmp_path):
    """Two deltas through the store == one-shot exact dedup of the union;
    replaying a delta accepts nothing."""
    import ray.data as rd

    from kgray.dedup import exact_dedup, incremental_dedup_store
    from kgray.textops import fingerprint_batch

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    even = docs.filter(lambda r: r["doc_id"] % 2 == 0)
    odd = docs.filter(lambda r: r["doc_id"] % 2 == 1)

    store = str(tmp_path / "fp_store")
    r1 = incremental_dedup_store(even, store)
    assert r1["n_new"] > 0 and r1["n_dup"] == r1["n_in"] - r1["n_new"]
    # two-phase: fingerprints are staged until the caller commits — the
    # accepted docs must NOT be anti-joined away before commit
    r1_replay = incremental_dedup_store(even, store)
    assert r1_replay["n_new"] == r1["n_new"], (
        "pre-commit crash replay must re-accept the delta, not drop it"
    )
    assert r1_replay["commit"]() > 0
    assert r1_replay["commit"]() == 0  # commit is idempotent
    r2 = incremental_dedup_store(odd, store)
    r2["commit"]()

    got = {x["doc_id"] for x in r1_replay["accepted"].take_all()} | {
        x["doc_id"] for x in r2["accepted"].take_all()
    }
    # one-shot reference: first-by-fingerprint, but ordered even-then-odd
    # like the deltas (within a delta the lowest doc_id wins)
    fp = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    ref_rows = fp.select_columns(["doc_id", "fingerprint"]).take_all()
    seen, want = set(), set()
    for r in sorted(ref_rows, key=lambda r: (r["doc_id"] % 2, r["doc_id"])):
        if r["fingerprint"] not in seen:
            seen.add(r["fingerprint"])
            want.add(r["doc_id"])
    assert got == want

    # idempotence: replaying delta 2 accepts zero docs
    r3 = incremental_dedup_store(odd, store)
    assert r3["n_new"] == 0 and r3["n_dup"] == r3["n_in"]


def test_retract_edges_removes_and_recovers(ray_session, tmp_path):
    """CDC DELETE: retracting 5 uids removes exactly those rows (only
    their partitions rewrite), re-applying removes zero, and an
    interrupted commit (staged tmp + fsynced marker left behind)
    converges on the next run."""
    import json
    import os

    import ray.data as rd

    from kgray.pipeline import (
        _write_commit_marker, retract_edges, run_flagship,
    )

    out = str(tmp_path / "g")
    run_flagship(SF, out, resume=False)
    before = _edge_uids(f"{out}/edges")
    victims = sorted(before)[:5]

    rep = retract_edges(out, pa.table({"edge_uid": victims}))
    assert rep["edges_removed"] == 5
    after = _edge_uids(f"{out}/edges")
    assert after == before - set(victims)

    # idempotent
    rep2 = retract_edges(out, pa.table({"edge_uid": victims}))
    assert rep2["edges_removed"] == 0 and rep2["partitions_rewritten"] == 0

    # interrupted-commit recovery: stage a rewrite of one partition that
    # drops one more uid, leave the fsynced marker, "crash", re-run
    victim2 = sorted(after)[0]
    part = None
    import glob

    for d in sorted(glob.glob(f"{out}/edges/**/", recursive=True)):
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            continue
        uids = set(
            pq.ParquetDataset(files).read(columns=["edge_uid"])["edge_uid"].to_pylist()
        )
        if victim2 in uids:
            part = d.rstrip("/")
            break
    assert part
    files = glob.glob(os.path.join(part, "*.parquet"))
    tbl = pq.ParquetDataset(files).read()
    kept = tbl.filter(pc.invert(pc.equal(tbl["edge_uid"], victim2)))
    tmp = os.path.join(part, ".retract_tmp")
    os.makedirs(tmp)
    pq.write_table(kept, os.path.join(tmp, "staged-0.parquet"))
    _write_commit_marker(tmp, ["staged-0.parquet"], kept.num_rows)
    # crash here — next retraction run must finish the commit first
    rep3 = retract_edges(out, pa.table({"edge_uid": ["no-such-uid"]}))
    assert rep3["edges_removed"] == 0 and rep3["partitions_rewritten"] == 1
    assert _edge_uids(f"{out}/edges") == after - {victim2}
    assert not os.path.isdir(tmp)
    lineage = json.load(open(f"{out}/lineage.json"))
    assert len(lineage["retractions"]) == 3


def test_sparql_update_verbs_end_to_end(ray_session, tmp_path):
    """SPARQL UPDATE -> CDC wiring: INSERT DATA appends through the
    anti-join/append machinery (idempotent), DELETE DATA and DELETE
    WHERE compile to retract_edges' staged-partition rewrite, unknown
    endpoints are refused, and read queries refuse the update forms."""
    import pytest

    import ray.data as rd

    from kgray.pipeline import run_flagship, run_sparql_update
    from kgray.sparql import SparqlError, parse_sparql, run_sparql

    out = str(tmp_path / "g")
    run_flagship(SF, out, resume=False)
    base_uids = _edge_uids(out + "/edges")
    nodes = rd.read_parquet(out + "/nodes", columns=["id"]).take(2)
    a, b = nodes[0]["id"], nodes[1]["id"]

    # parser: forms and guards
    q = parse_sparql(f"INSERT DATA {{ {a} biolink:treats {b} }}")
    assert q["form"] == "insert_data" and q["triples"] == [
        (a, "biolink:treats", b)
    ]
    with pytest.raises(SparqlError, match="ground"):
        parse_sparql("INSERT DATA { ?s biolink:treats x:1 }")
    with pytest.raises(SparqlError, match="DELETE DATA"):
        parse_sparql("DELETE WHERE { a:1 p b:2 }")
    with pytest.raises(SparqlError, match="property paths"):
        parse_sparql("DELETE WHERE { ?s p/q ?o }")
    with pytest.raises(SparqlError, match="run_sparql_update"):
        run_sparql(
            rd.from_arrow(pa.table({"subject": ["x"], "predicate": ["p"],
                                    "object": ["y"]})),
            f"INSERT DATA {{ {a} biolink:treats {b} }}",
        )

    # INSERT DATA: appends exactly one edge; re-run is a no-op
    ins = f"INSERT DATA {{ {a} biolink:treats {b} }}"
    r1 = run_sparql_update(out, ins)
    assert r1["new_edges"] == 1
    after = _edge_uids(out + "/edges")
    assert len(after) == len(base_uids) + 1
    (new_uid,) = after - base_uids
    r2 = run_sparql_update(out, ins)
    assert r2["new_edges"] == 0 and r2["duplicate_edges_skipped"] == 1
    assert _edge_uids(out + "/edges") == after

    # DELETE DATA restores the original table exactly
    r3 = run_sparql_update(out, f"DELETE DATA {{ {a} biolink:treats {b} }}")
    assert r3["edges_removed"] == 1
    assert _edge_uids(out + "/edges") == base_uids

    # DELETE WHERE: re-insert, then delete every treats edge of `a`
    run_sparql_update(out, ins)
    treats_uids = _treats_uids_of(out, a)
    expect_removed = {new_uid} | (base_uids & treats_uids)
    r4 = run_sparql_update(
        out, f"DELETE WHERE {{ {a} biolink:treats ?o }}"
    )
    assert r4["edges_removed"] == len(expect_removed)
    assert _edge_uids(out + "/edges") == (base_uids | {new_uid}) - expect_removed

    # unknown endpoint refused loudly
    with pytest.raises(ValueError, match="node table"):
        run_sparql_update(out, f"INSERT DATA {{ ZZZ:404 biolink:treats {b} }}")


def _treats_uids_of(out: str, subj: str) -> set:
    t = pq.ParquetDataset(out + "/edges").read(
        columns=["subject", "predicate", "object", "edge_uid"]
    )
    from urllib.parse import unquote

    keep = set()
    for r in t.to_pylist():
        if r["subject"] == subj and unquote(r["predicate"]) == "biolink:treats":
            keep.add(r["edge_uid"])
    return keep


def test_sparql_templated_update_forms(ray_session, tmp_path):
    """SPARQL 1.1 templated updates: INSERT { t } WHERE { p } derives
    and appends the instantiated distinct triple set (idempotent);
    DELETE { t } WHERE { p } retracts it; unbound template variables
    and path predicates in templates are refused at the right layer."""
    import pytest

    from kgray.pipeline import run_flagship, run_sparql_update
    from kgray.sparql import SparqlError, parse_sparql

    out = str(tmp_path / "g")
    run_flagship(SF, out, resume=False)
    base = _edge_uids(out + "/edges")

    q = parse_sparql(
        "INSERT { ?a rel:linked ?c } WHERE "
        "{ ?a biolink:treats ?b . ?b biolink:part_of ?c }"
    )
    assert q["form"] == "insert_where"
    assert q["template"] == [("?a", "rel:linked", "?c")]
    assert len(q["patterns"]) == 2

    ins = ("INSERT { ?a rel:linked ?c } WHERE "
           "{ ?a biolink:treats ?b . ?b biolink:part_of ?c }")
    r = run_sparql_update(out, ins)
    assert r["new_edges"] > 0 and r["duplicate_edges_skipped"] == 0
    n_derived = r["new_edges"]
    assert len(_edge_uids(out + "/edges")) == len(base) + n_derived

    # idempotent
    r2 = run_sparql_update(out, ins)
    assert r2["new_edges"] == 0
    assert r2["duplicate_edges_skipped"] == n_derived

    # templated delete restores the base table exactly
    r3 = run_sparql_update(
        out, "DELETE { ?a rel:linked ?c } WHERE { ?a rel:linked ?c }"
    )
    assert r3["edges_removed"] == n_derived
    assert _edge_uids(out + "/edges") == base

    # guards
    with pytest.raises(SparqlError, match="not bound"):
        run_sparql_update(
            out, "INSERT { ?a rel:x ?z } WHERE { ?a biolink:treats ?b }"
        )
    with pytest.raises(SparqlError, match="constant predicate"):
        parse_sparql("INSERT { ?a ?p ?b } WHERE { ?a q ?b }")
    with pytest.raises(SparqlError, match="property paths"):
        parse_sparql("DELETE { ?a p/q ?b } WHERE { ?a p ?b }")
