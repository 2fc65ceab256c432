"""Staged CLI — the engine's analog of the reference's ``--type`` stage
selector (`Kuzu/kuzu_build_graph_csv.py:621-753`: CONVERT -> CREATE_LUS ->
BIN -> CREATE_TABLES -> IMPORT, one process per stage, artifacts on disk
between stages).

Stage map (reference -> kgray):

  convert      CONVERT     generate/order/extract/link -> triples Parquet
  create_lus   CREATE_LUS  canonical-id map + node-class lookup -> Parquet
                           checkpoints (the ST4 pickle analog, Kuzu:673-680)
  bin          BIN+IMPORT  edges/nodes build + partitioned Parquet write
                           (the terminal sink IS the partitioned table set)
  tables       CREATE_TABLES  _schema.json + Kuzu DDL + Cypher cast map
  compact      (maintenance) fold delta-appended small files per partition
  release      training-corpus release: clean -> leak-free split -> hive
  query        SPARQL over a built graph's edge partitions (the A7
               runbook-query analog: the reference's users run Cypher
               against the loaded DB; kgray users run this against the
               Parquet layout without any DB load). Two grammars:
               --sparql takes SPARQL text (SELECT/ASK/CONSTRUCT/
               DESCRIBE, OPTIONAL/MINUS/FILTER [NOT] EXISTS/VALUES/
               BIND/UNION/subselects, property paths, aggregates with
               GROUP BY/HAVING/ORDER BY/LIMIT); --bgp + modifier flags
               take the equivalent JSON structures
  update       SPARQL UPDATE over a built graph: INSERT DATA / DELETE
               DATA / DELETE WHERE / templated INSERT-or-DELETE
               {tmpl} WHERE {pats}, compiled onto the CDC machinery
               (idempotent anti-join appends; staged _COMMIT
               partition rewrites for deletes)
  all          the full checkpointed pipeline (resumable; default)

Every stage is resumable: rerunning skips work whose manifest fingerprint
matches (pipeline `_manifests/`).

Usage::

    python -m kgray --type=all --sf-dir /root/testdata/sf0.001 --out /tmp/kg

On a multi-node cluster the same CLI is the job entry point — the driver
attaches to the cluster named by RAY_ADDRESS::

    ray job submit --working-dir . -- \
        python -m kgray --type=all --sf-dir s3://corpus/turns --out s3://kg/run1
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kgray", description=__doc__)
    p.add_argument(
        "--type", default="all",
        choices=["all", "convert", "create_lus", "bin", "tables", "compact",
                 "release", "query", "update"],
        help="pipeline stage to run (reference --type selector)",
    )
    p.add_argument(
        "--bgp", default=None,
        help='query: JSON pattern list, e.g. \'[["?a","biolink:treats",'
             '"?b"],["?b","biolink:part_of*","?c"]]\' (property-path '
             "grammar allowed in the predicate slot)",
    )
    p.add_argument(
        "--sparql", default=None,
        help="query: a SPARQL string (SELECT/ASK/CONSTRUCT/DESCRIBE "
             "with OPTIONAL/MINUS/FILTER [NOT] EXISTS/VALUES/BIND, "
             "property paths, the aggregate set + GROUP BY/HAVING/"
             "ORDER BY/LIMIT) — the text form of the --bgp JSON "
             "grammar; mutually exclusive with --bgp and the JSON "
             "modifier flags",
    )
    p.add_argument(
        "--filters", default=None,
        help='query: JSON FILTER list, e.g. \'[["contains","?a","MONDO"]]\'',
    )
    p.add_argument(
        "--order-by", default=None,
        help='query: JSON ORDER BY list, e.g. \'[["?a","asc"]]\'',
    )
    p.add_argument("--query-limit", type=int, default=None,
                   help="query: LIMIT (with --order-by: distributed top-k)")
    p.add_argument("--query-distinct", action="store_true",
                   help="query: DISTINCT after projection")
    p.add_argument("--project", default=None,
                   help='query: JSON projection, e.g. \'["?a","?c"]\'')
    p.add_argument(
        "--query-out", default=None,
        help="query: write the result as Parquet here instead of "
             "printing rows as JSON lines (print caps at 100 rows)",
    )
    p.add_argument(
        "--group-by", default=None,
        help='query: JSON GROUP BY variables, e.g. \'["?a"]\' — switches '
             "the stage to bgp_agg (aggregate mode)",
    )
    p.add_argument(
        "--aggs", default=None,
        help='query: JSON aggregate map for --group-by, e.g. '
             '\'{"n":["count",null],"ys":["group_concat","?y"]}\' (ops: '
             "count, count_distinct, min, max, group_concat)",
    )
    p.add_argument(
        "--having", default=None,
        help='query: JSON HAVING conjunction over aggregate columns, '
             'e.g. \'[[">=","n",2]]\'',
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default="/tmp/kgray_out")
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--target-rows-per-file", type=int, default=1_000_000,
        help="compact: rewrite partitions to ceil(rows/target) files",
    )
    p.add_argument(
        "--tail-local-limit", type=int, default=2_000_000,
        help="deduped-edge row count at/under which the node-build/tag/"
             "write tail runs driver-local; 0 forces the distributed path",
    )
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # standalone: a local session; under `ray job submit` (or any set
        # RAY_ADDRESS) this attaches to the running cluster instead
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import ray.data as rd

    from .pipeline import KGPipeline
    from .transcripts import entity_catalog, transcripts_dataset

    os.makedirs(args.out, exist_ok=True)
    fingerprint = f"{args.sf_dir}|repeat={args.repeat}"

    if args.type in ("all", "convert", "bin"):
        pipe = KGPipeline(
            out_dir=args.out, resume=not args.no_resume,
            tail_local_limit=args.tail_local_limit,
        )
        stop = "triples" if args.type == "convert" else None
        res = pipe.run(
            transcripts_dataset(args.sf_dir, repeat=args.repeat),
            fingerprint=fingerprint, stop_after=stop,
        )
        print(json.dumps({k: v for k, v in res.items() if k != "metrics"}))

    if args.type in ("all", "create_lus"):
        from .canonicalize import canonical_map_local
        from .lookups import node_class_lookup

        ck = os.path.join(args.out, "checkpoints")
        os.makedirs(ck, exist_ok=True)
        catalog = entity_catalog()
        canon = canonical_map_local(
            rd.from_arrow(catalog.select(["id", "equivalent_identifiers"]))
        )
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "id": pa.array(list(canon.keys()), type=pa.string()),
                    "canonical_id": pa.array(list(canon.values()), type=pa.string()),
                }
            ),
            os.path.join(ck, "canonical_map.parquet"),
        )
        node_dir = os.path.join(args.out, "nodes")
        if os.path.isdir(node_dir) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(node_dir) for f in fs
        ):
            lookup = node_class_lookup(rd.read_parquet(node_dir))
            pq.write_table(
                pa.table(
                    {
                        "id": pa.array(list(lookup.keys()), type=pa.string()),
                        "primary_class": pa.array(list(lookup.values()), type=pa.string()),
                    }
                ),
                os.path.join(ck, "node_class_lookup.parquet"),
            )
        print(json.dumps({"checkpoints": ck}))

    if args.type == "update":
        # SPARQL UPDATE over a built layout: INSERT DATA / DELETE DATA
        # / DELETE WHERE, riding the CDC machinery (append-only insert,
        # staged _COMMIT partition rewrites for deletes)
        if not args.sparql:
            p.error("--type=update requires --sparql 'INSERT DATA "
                    "{...}' / 'DELETE DATA {...}' / 'DELETE WHERE "
                    "{...}' / 'INSERT {tmpl} WHERE {...}' / "
                    "'DELETE {tmpl} WHERE {...}'")
        if args.bgp or args.group_by or args.aggs:
            p.error("--type=update takes only --sparql")
        from .pipeline import run_sparql_update

        print(json.dumps(run_sparql_update(args.out, args.sparql)))

    if args.type == "query":
        from .bgp import bgp_select

        if not args.bgp and not args.sparql:
            p.error("--type=query requires --bgp or --sparql")
        if args.bgp and args.sparql:
            p.error("--bgp and --sparql are mutually exclusive")
        if args.sparql and any((
            args.filters, args.order_by, args.project, args.group_by,
            args.aggs, args.having, args.query_distinct,
        )):
            p.error(
                "--sparql carries its own modifiers (FILTER/ORDER BY/"
                "GROUP BY/...) — drop the JSON modifier flags"
            )
        patterns = ([tuple(t) for t in json.loads(args.bgp)]
                    if args.bgp else None)

        # the P2 layout stores `predicate` as a URL-quoted hive dir name
        # ('biolink%3Atreats', materialize.py:344) and Ray's hive read
        # returns it verbatim
        from .materialize import decode_hive_predicates

        edges = rd.read_parquet(
            os.path.join(args.out, "edges"),
            columns=["subject", "predicate", "object"],
        ).map_batches(decode_hive_predicates, batch_format="pyarrow")
        filters = ([tuple(f) for f in json.loads(args.filters)]
                   if args.filters else ())
        if args.sparql:
            from .sparql import run_sparql

            res = run_sparql(edges, args.sparql)
        elif args.group_by:
            from .bgp import bgp_agg

            if not args.aggs:
                p.error("--group-by requires --aggs")
            if args.project or args.query_distinct:
                p.error(
                    "--project/--query-distinct do not apply to "
                    "--group-by aggregates — name the outputs in "
                    "--aggs instead (group rows are already distinct)"
                )
            res = bgp_agg(
                edges, patterns,
                group_by=json.loads(args.group_by),
                aggs={k: tuple(v) for k, v in json.loads(args.aggs).items()},
                having=[tuple(h) for h in json.loads(args.having)]
                if args.having else (),
                filters=filters,
                reorder=len(patterns) > 1,
            )
            # ORDER BY / LIMIT apply after GROUP BY, SQL-style: keys
            # name aggregate outputs or group columns ('?'-prefix ok)
            if args.order_by:
                spec = [tuple(o) for o in json.loads(args.order_by)]
                cols = set(res.schema().names)
                keys, desc = [], []
                for col, direction in spec:
                    col = col[1:] if col.startswith("?") else col
                    if col not in cols:
                        p.error(
                            f"--order-by column {col!r} not in "
                            f"aggregate output {sorted(cols)}"
                        )
                    keys.append(col)
                    desc.append(direction == "desc")
                res = res.sort(key=keys, descending=desc)
            if args.query_limit:
                res = res.limit(args.query_limit)
        else:
            res = bgp_select(
                edges, patterns,
                project=json.loads(args.project) if args.project else None,
                distinct=args.query_distinct,
                order_by=[tuple(o) for o in json.loads(args.order_by)]
                if args.order_by else (),
                limit=args.query_limit,
                filters=filters,
                reorder=len(patterns) > 1,
            )
        if isinstance(res, bool):  # SPARQL ASK
            print(json.dumps({"ask": res}))
        elif args.query_out:
            res.write_parquet(args.query_out)
            print(json.dumps(
                {"rows": res.count(), "out": args.query_out}
            ))
        else:
            for r in res.take(min(args.query_limit or 100, 100)):
                print(json.dumps(r, sort_keys=True))

    if args.type == "compact":
        from .pipeline import compact_graph

        print(json.dumps(compact_graph(args.out, args.target_rows_per_file)))

    if args.type == "release":
        from .release import release_corpus

        print(json.dumps(release_corpus(args.sf_dir, args.out), sort_keys=True))

    if args.type in ("all", "tables"):
        from .graph_io import write_schema_manifest
        from .schema import (
            EDGE_SCHEMA, NODE_SCHEMA, generate_import_statements,
            memgraph_load_csv_edges, memgraph_load_csv_nodes,
            schema_to_cypher_property_map, schema_to_kuzu_node_ddl,
            schema_to_kuzu_rel_ddl,
        )

        node_dir, edge_dir = os.path.join(args.out, "nodes"), os.path.join(args.out, "edges")
        write_schema_manifest(node_dir, NODE_SCHEMA, extra={"table": "nodes"})
        write_schema_manifest(edge_dir, EDGE_SCHEMA, extra={"table": "edges"})
        ddl = {
            "kuzu_node_ddl": schema_to_kuzu_node_ddl(_typed(NODE_SCHEMA), "Node"),
            "kuzu_rel_ddl": schema_to_kuzu_rel_ddl(_typed(EDGE_SCHEMA), "Edge", "Node", "Node"),
            "cypher_node_map": schema_to_cypher_property_map(_typed(NODE_SCHEMA)),
            # runnable importer text (the part a migrating user pastes):
            # MemGraph LOAD CSV templates (MemGraph:163-188) ...
            "memgraph_load_nodes": memgraph_load_csv_nodes(
                os.path.join(node_dir, "nodes.csv"),
                schema_to_cypher_property_map(_typed(NODE_SCHEMA)),
            ),
            "memgraph_load_edges": memgraph_load_csv_edges(
                os.path.join(edge_dir, "edges.csv"),
                schema_to_cypher_property_map(_typed(EDGE_SCHEMA)),
            ),
        }
        # ... and per-partition Kuzu COPY statements off the written layout
        # (Kuzu:557-613 semantics incl. strict-nodes/lenient-edges)
        copy_stmts = generate_import_statements(args.out)
        ddl["kuzu_copy_nodes"] = copy_stmts["nodes"]
        ddl["kuzu_copy_edges"] = copy_stmts["edges"]
        with open(os.path.join(args.out, "ddl.json"), "w") as f:
            json.dump(ddl, f, indent=1)
        with open(os.path.join(args.out, "import.cypher"), "w") as f:
            f.write(
                "\n".join(copy_stmts["nodes"]) + "\n" + "\n".join(copy_stmts["edges"]) + "\n"
            )
        print(json.dumps({"ddl": os.path.join(args.out, "ddl.json"),
                          "import": os.path.join(args.out, "import.cypher")}))

    return 0


def _typed(schema):
    """Attach header-type metadata to the engine's native output schemas so
    the DDL generators (which are driven by header tokens) accept them."""
    import pyarrow as pa

    toks = {
        pa.string(): "string",
        pa.bool_(): "boolean",
        pa.float64(): "float",
        pa.int64(): "int",
        pa.list_(pa.string()): "string[]",
        pa.list_(pa.float64()): "float[]",
    }
    fields = []
    for f in schema:
        tok = "ID" if f.name == "id" else toks.get(f.type, "string")
        fields.append(pa.field(f.name, f.type, metadata={b"header_type": tok.encode()}))
    return pa.schema(fields)


if __name__ == "__main__":
    sys.exit(main())
