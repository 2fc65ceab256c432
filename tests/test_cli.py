"""Staged CLI lifecycle (reference --type selector analog)."""

import json
import os

import pyarrow.parquet as pq

from kgray.__main__ import main
from kgray.schema import (
    NODE_SCHEMA, schema_to_cypher_property_map, schema_to_kuzu_node_ddl,
    schema_to_kuzu_rel_ddl,
)


def test_cli_staged_lifecycle(ray_session, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "cli")
    # stage 1: convert -> triples checkpoint only
    assert main(["--type=convert", f"--sf-dir={sf_dir}", f"--out={out}"]) == 0
    assert os.path.isdir(os.path.join(out, "triples"))
    assert not os.path.isdir(os.path.join(out, "edges"))

    # stage 2: bin -> full graph build, resuming the triples checkpoint
    # (--tail-local-limit=0 forces the distributed parallel writer so
    # stage 5's compaction has multi-file partitions to fold)
    assert main(["--type=bin", f"--sf-dir={sf_dir}", f"--out={out}",
                 "--tail-local-limit=0"]) == 0
    assert os.path.isdir(os.path.join(out, "edges"))
    assert os.path.isdir(os.path.join(out, "nodes"))

    # stage 3: create_lus -> Parquet lookup checkpoints (ST4 analog)
    assert main(["--type=create_lus", f"--sf-dir={sf_dir}", f"--out={out}"]) == 0
    canon = pq.read_table(os.path.join(out, "checkpoints", "canonical_map.parquet"))
    assert canon.num_rows == 1000
    lk = pq.read_table(os.path.join(out, "checkpoints", "node_class_lookup.parquet"))
    assert lk.num_rows > 0

    # stage 4: tables -> schema manifests + DDL codegen
    assert main(["--type=tables", f"--sf-dir={sf_dir}", f"--out={out}"]) == 0
    ddl = json.load(open(os.path.join(out, "ddl.json")))
    assert ddl["kuzu_node_ddl"].startswith("CREATE NODE TABLE Node (id STRING")
    assert "PRIMARY KEY (id)" in ddl["kuzu_node_ddl"]
    assert ddl["kuzu_rel_ddl"].startswith("CREATE REL TABLE Edge (FROM Node TO Node")
    assert os.path.exists(os.path.join(out, "nodes", "_schema.json"))
    # runnable importer text off the written partition layout
    assert ddl["kuzu_copy_nodes"] and all(
        s.startswith("COPY `biolink:") and "IGNORE_ERRORS=false" in s
        for s in ddl["kuzu_copy_nodes"]
    )
    assert ddl["kuzu_copy_edges"] and all(
        "IGNORE_ERRORS=true" in s for s in ddl["kuzu_copy_edges"]
    )
    assert 'load csv from "' in ddl["memgraph_load_nodes"]
    assert "match (a: Node {id: row.subject})" in ddl["memgraph_load_edges"]
    imp = open(os.path.join(out, "import.cypher")).read()
    assert imp.count("COPY ") == len(ddl["kuzu_copy_nodes"]) + len(ddl["kuzu_copy_edges"])

    # stage 5: compact -> maintenance pass folds the multi-file partitions
    # the parallel write produced; a second pass finds nothing left to do
    n_edges = pq.ParquetDataset(os.path.join(out, "edges")).read().num_rows
    assert main(["--type=compact", f"--out={out}"]) == 0
    assert main(["--type=compact", f"--out={out}"]) == 0
    reports = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{") and "partitions_compacted" in line
    ]
    assert reports[0]["partitions_compacted"] > 0
    assert reports[1]["partitions_compacted"] == 0
    assert pq.ParquetDataset(os.path.join(out, "edges")).read().num_rows == n_edges

    # stage 6: query -> SPARQL-subset BGP SELECT straight off the built
    # layout (incl. decoding the URL-quoted hive `predicate` values)
    assert main([
        "--type=query", f"--out={out}",
        "--bgp",
        '[["?a","biolink:treats","?b"],["?b","biolink:part_of","?c"]]',
        "--order-by", '[["?a","asc"],["?b","asc"],["?c","asc"]]',
        "--query-limit", "8",
    ]) == 0
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert 0 < len(rows) <= 8
    t = pq.ParquetDataset(os.path.join(out, "edges")).read()
    triples = list(zip(
        t.column("subject").to_pylist(), t.column("predicate").to_pylist(),
        t.column("object").to_pylist(),
    ))
    treats = {(s, o) for s, p, o in triples if p == "biolink:treats"}
    partof = {(s, o) for s, p, o in triples if p == "biolink:part_of"}
    for r in rows:
        assert (r["a"], r["b"]) in treats and (r["b"], r["c"]) in partof
    assert rows == sorted(rows, key=lambda r: (r["a"], r["b"], r["c"]))

    # aggregate mode: GROUP BY + full aggregate set + HAVING, checked
    # against the same pq-read ground truth
    assert main([
        "--type=query", f"--out={out}",
        "--bgp",
        '[["?a","biolink:treats","?b"],["?b","biolink:part_of","?c"]]',
        "--group-by", '["?a"]',
        "--aggs", '{"n":["count",null],"parents":["group_concat","?c"]}',
        "--having", '[[">=","n",3]]',
    ]) == 0
    agg_rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    from collections import defaultdict

    groups = defaultdict(list)
    for s, b in treats:
        for b2, c in partof:
            if b2 == b:
                groups[s].append(c)
    want = {
        a: (len(cs), ",".join(sorted(set(cs))))
        for a, cs in groups.items() if len(cs) >= 3
    }
    assert {r["a"]: (r["n"], r["parents"]) for r in agg_rows} == want

    # aggregate mode honors --order-by/--query-limit (SQL ORDER BY /
    # LIMIT after GROUP BY) instead of silently ignoring them
    assert main([
        "--type=query", f"--out={out}",
        "--bgp", '[["?a","biolink:treats","?b"]]',
        "--group-by", '["?a"]',
        "--aggs", '{"n":["count",null]}',
        "--order-by", '[["n","desc"],["?a","asc"]]',
        "--query-limit", "3",
    ]) == 0
    top = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    treat_counts = defaultdict(int)
    for s, _b in treats:
        treat_counts[s] += 1
    want_top = sorted(
        treat_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:3]
    assert [(r["a"], r["n"]) for r in top] == want_top
    # inapplicable modifiers with --group-by error instead of no-op
    import pytest

    with pytest.raises(SystemExit):
        main([
            "--type=query", f"--out={out}",
            "--bgp", '[["?a","biolink:treats","?b"]]',
            "--group-by", '["?a"]', "--aggs", '{"n":["count",null]}',
            "--project", '["?a"]',
        ])

    # SPARQL text front-end: the same two-hop query as stage 6, typed
    # as SPARQL, must produce the same rows
    assert main([
        "--type=query", f"--out={out}",
        "--sparql",
        "SELECT ?a ?b ?c WHERE { ?a biolink:treats ?b . "
        "?b biolink:part_of ?c } ORDER BY ?a ?b ?c LIMIT 8",
    ]) == 0
    sparql_rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert sparql_rows == rows  # bit-identical to the --bgp form
    # ASK prints a boolean
    assert main([
        "--type=query", f"--out={out}",
        "--sparql", 'ASK { ?a biolink:treats ?b }',
    ]) == 0
    out_text = capsys.readouterr().out
    assert '{"ask": true}' in out_text
    # --sparql refuses JSON modifier flags
    with pytest.raises(SystemExit):
        main([
            "--type=query", f"--out={out}",
            "--sparql", "SELECT ?a WHERE { ?a biolink:treats ?b }",
            "--project", '["?a"]',
        ])


def test_ddl_codegen_type_table():
    import pyarrow as pa

    from kgray.schema import header_to_arrow_schema

    hdr = "id:ID\tname:string\tflag:boolean\tscore:float\trank:int\tvals:float[]\ttags:string[]"
    schema = header_to_arrow_schema(hdr)
    ddl = schema_to_kuzu_node_ddl(schema, "T")
    # full type vocabulary of Kuzu:518-531
    for frag in ["id STRING", "flag BOOLEAN", "score FLOAT", "rank INT64",
                 "vals FLOAT[]", "tags STRING[]"]:
        assert frag in ddl
    cy = schema_to_cypher_property_map(schema)
    assert "toBoolean(row.flag)" in cy
    assert "toInteger(row.rank)" in cy
    assert "[x IN split(row.vals, ';') | toFloat(x)]" in cy
    assert "split(row.tags, ';')" in cy


def test_cli_sparql_update_stage(ray_session, sf_dir, tmp_path, capsys):
    """--type=update drives the SPARQL UPDATE verbs through the CLI:
    insert appends one edge (idempotent on re-run), delete restores,
    and the flag guards hold."""
    import pytest

    from kgray.__main__ import main as _main

    out = str(tmp_path / "upd")
    assert _main(["--type=bin", f"--sf-dir={sf_dir}", f"--out={out}"]) == 0
    capsys.readouterr()
    import ray.data as rd

    got = rd.read_parquet(os.path.join(out, "nodes"), columns=["id"]).take(2)
    a, b = got[0]["id"], got[1]["id"]

    assert _main([
        "--type=update", f"--out={out}",
        "--sparql", f"INSERT DATA {{ {a} biolink:treats {b} }}",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["new_edges"] == 1

    assert _main([
        "--type=update", f"--out={out}",
        "--sparql", f"DELETE DATA {{ {a} biolink:treats {b} }}",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["edges_removed"] == 1

    # lineage carries both records
    lineage = json.load(open(os.path.join(out, "lineage.json")))
    assert any(u.get("op") == "insert_data" for u in lineage["updates"])
    assert lineage["retractions"]

    # flag guards
    with pytest.raises(SystemExit):
        _main(["--type=update", f"--out={out}"])
    with pytest.raises(SystemExit):
        _main([
            "--type=update", f"--out={out}",
            "--sparql", "DELETE DATA { a p b }",
            "--bgp", "[]",
        ])
