"""Schemas and the typed-header -> Arrow schema compiler.

Reproduces the reference's schema vocabulary:

- the Biolink class priority list (`Kuzu/kuzu_build_graph_csv.py:29-34`),
- the column-name sanitizer ``re.sub(r'[^A-Za-z0-9_]', '_', name)``
  (`Kuzu/kuzu_build_graph_csv.py:516`, `AGE/age_build_graph_csv.py:119`,
  `MemGraph/mg_build_individual_json.py:247`),
- the tab-delimited ``name:type`` header grammar and its type table
  (`Kuzu/kuzu_build_graph_csv.py:442-535`,
  `MemGraph/mg_build_individual_json.py:234-267`), mapped onto Arrow
  types instead of Kuzu DDL / Cypher casts,
- the node/edge rename maps (`Kuzu:103,114`: ``category->labels``,
  ``predicate->label``).
"""

from __future__ import annotations

import re

import pyarrow as pa

# Biolink class priority order used by node normalization (first match in a
# node's label set becomes its primary class). Data-driven config in the
# reference (`Kuzu/kuzu_build_graph_csv.py:29-34`).
ORDERED_CATEGORIES: list[str] = [
    "biolink:GeneFamily", "biolink:Gene", "biolink:Protein", "biolink:SmallMolecule",
    "biolink:MolecularMixture", "biolink:ChemicalMixture", "biolink:PhenotypicFeature",
    "biolink:Disease", "biolink:SequenceVariant", "biolink:CellularComponent",
    "biolink:Cell", "biolink:AnatomicalEntity", "biolink:MolecularActivity",
    "biolink:BiologicalProcess", "biolink:Pathway", "biolink:OrganismTaxon",
    "biolink:Phenomenon", "biolink:Procedure", "biolink:Device",
    "biolink:OrganismAttribute", "biolink:ClinicalAttribute", "biolink:Activity",
    "biolink:InformationContentEntity", "biolink:ChemicalEntity", "biolink:BiologicalEntity",
]

# rank for deterministic priority lookup; unknown classes rank below all
CATEGORY_RANK: dict[str, int] = {c: i for i, c in enumerate(ORDERED_CATEGORIES)}

# Transcript input table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Raw extracted triples (pre-linking), one row per pattern match per turn.
TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subject_mention", pa.string()),
        ("predicate", pa.string()),
        ("object_mention", pa.string()),
    ]
)

# Output node table — mirrors the reference's converted node shape
# (`MemGraph/mg_build_individual_json.py:19-39`, `Kuzu:101-110`).
NODE_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("labels", pa.list_(pa.string())),
        ("equivalent_identifiers", pa.list_(pa.string())),
        ("primary_class", pa.string()),
    ]
)

# Output edge table — mirrors the reference's edge shape
# (`MemGraph/mg_build_individual_json.py:41-55`, `Kuzu:112-127`).
EDGE_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("edge_uid", pa.string()),
        ("primary_knowledge_source", pa.string()),
        ("subject_class", pa.string()),
        ("object_class", pa.string()),
    ]
)

NODE_RENAME_MAP = {"category": "labels"}   # Kuzu:103
EDGE_RENAME_MAP = {"predicate": "label"}   # Kuzu:114

_SANITIZE_RE = re.compile(r"[^A-Za-z0-9_]")


def sanitize_column_name(name: str) -> str:
    """``re.sub(r'[^A-Za-z0-9_]', '_', name)`` — Kuzu:516 / AGE:119 / MemGraph:247."""
    return _SANITIZE_RE.sub("_", name)


# header token -> Arrow type (§1.3 of SURVEY.md; Kuzu:518-531)
_HEADER_TYPE_MAP: dict[str, pa.DataType] = {
    "ID": pa.string(),
    "START_ID": pa.string(),
    "END_ID": pa.string(),
    "TYPE": pa.string(),
    "string": pa.string(),
    "boolean": pa.bool_(),
    "float": pa.float64(),
    "int": pa.int64(),
    "float[]": pa.list_(pa.float64()),
    "string[]": pa.list_(pa.string()),
    "LABEL": pa.list_(pa.string()),
}

# tokens whose list cells are ';'-separated in the CSV serialization
LIST_HEADER_TOKENS = {"float[]", "string[]", "LABEL"}


def parse_header_token(token: str) -> tuple[str, pa.DataType, str]:
    """Parse one ``name:type`` header token into (sanitized_name, arrow_type, type_token).

    The name itself may contain ':' — the type is the last ':'-separated item,
    mirroring ``get_kuzu_data_conversion`` (Kuzu:510-516). Unknown types raise,
    matching the reference's "ERROR: No data type recognised" path (Kuzu:532).
    """
    items = token.strip().split(":")
    type_token = items[-1]
    name = sanitize_column_name(":".join(items[:-1]))
    if type_token not in _HEADER_TYPE_MAP:
        raise ValueError(f"No data type recognised for {token!r}")
    return name, _HEADER_TYPE_MAP[type_token], type_token


def header_to_arrow_schema(
    header_line: str, rename_cols: dict[str, str] | None = None
) -> pa.Schema:
    """Compile a tab-delimited typed header line into a ``pa.Schema``.

    Port of ``process_csv_header`` + ``get_kuzu_data_conversion``
    (Kuzu:442-535) with Arrow types instead of Kuzu DDL. ``rename_cols``
    applies the reference's post-parse rename (Kuzu:488-489), e.g.
    ``{'category': 'labels'}`` for nodes.
    """
    rename_cols = rename_cols or {}
    fields = []
    for token in header_line.rstrip("\n").split("\t"):
        if not token.strip():
            continue
        name, typ, type_token = parse_header_token(token)
        name = rename_cols.get(name, name)
        fields.append(pa.field(name, typ, metadata={b"header_type": type_token.encode()}))
    return pa.schema(fields)


def list_columns_of(schema: pa.Schema) -> list[str]:
    """Names of columns that are ';'-separated lists in CSV serialization."""
    return [f.name for f in schema if pa.types.is_list(f.type)]


# ---------------------------------------------------------------------------
# DDL / cast codegen (S8/M12) — the reference emits Kuzu CREATE TABLE DDL
# (`Kuzu/kuzu_build_graph_csv.py:390-439,498-535`) and MemGraph LOAD-CSV
# Cypher property maps with casts (`MemGraph/mg_build_individual_json.py:
# 156-231,234-267`) from the same typed header. Reproduced here as pure
# functions over the compiled Arrow schema.
# ---------------------------------------------------------------------------

_KUZU_TYPE: dict[str, str] = {
    "ID": "STRING", "START_ID": "STRING", "END_ID": "STRING", "TYPE": "STRING",
    "string": "STRING", "boolean": "BOOLEAN", "float": "FLOAT", "int": "INT64",
    "float[]": "FLOAT[]", "string[]": "STRING[]", "LABEL": "STRING[]",
}


def _header_types(schema: pa.Schema) -> dict[str, str]:
    return {
        f.name: (f.metadata or {}).get(b"header_type", b"string").decode()
        for f in schema
    }


def schema_to_kuzu_node_ddl(schema: pa.Schema, table: str, pk: str = "id") -> str:
    """``CREATE NODE TABLE <t> (col TYPE, ..., PRIMARY KEY (id))`` —
    mirrors `Kuzu/kuzu_build_graph_csv.py:405-414`."""
    ht = _header_types(schema)
    cols = ", ".join(f"{f.name} {_KUZU_TYPE[ht[f.name]]}" for f in schema)
    return f"CREATE NODE TABLE {table} ({cols}, PRIMARY KEY ({pk}))"


def schema_to_kuzu_rel_ddl(
    schema: pa.Schema, table: str, from_table: str, to_table: str,
    skip_cols: tuple[str, ...] = ("from", "to"),
) -> str:
    """``CREATE REL TABLE <t> (FROM a TO b, col TYPE, ...)`` — mirrors
    `Kuzu/kuzu_build_graph_csv.py:417-436` (from/to become the FROM/TO
    clause, not columns)."""
    ht = _header_types(schema)
    cols = ", ".join(
        f"{f.name} {_KUZU_TYPE[ht[f.name]]}" for f in schema if f.name not in skip_cols
    )
    return f"CREATE REL TABLE {table} (FROM {from_table} TO {to_table}, {cols})"


def schema_to_cypher_property_map(schema: pa.Schema, row_var: str = "row") -> str:
    """MemGraph LOAD-CSV property map with per-type casts — the `match`
    at `MemGraph/mg_build_individual_json.py:251-265`: toBoolean/toFloat/
    toInteger casts, ';'-split for string[], split+toFloat COLLECT for
    float[]."""
    ht = _header_types(schema)
    parts = []
    for f in schema:
        tok, col = ht[f.name], f.name
        src = f"{row_var}.{col}"
        if tok == "boolean":
            expr = f"toBoolean({src})"
        elif tok == "float":
            expr = f"toFloat({src})"
        elif tok == "int":
            expr = f"toInteger({src})"
        elif tok == "float[]":
            expr = f"[x IN split({src}, ';') | toFloat(x)]"
        elif tok in ("string[]", "LABEL"):
            expr = f"split({src}, ';')"
        else:
            expr = src
        parts.append(f"{col}: {expr}")
    return "{" + ", ".join(parts) + "}"


# ---------------------------------------------------------------------------
# COPY / LOAD-CSV statement codegen — the runnable importer text the
# reference emits around the DDL. Kuzu: one COPY per binned file with the
# strict-nodes / lenient-edges IGNORE_ERRORS asymmetry
# (`Kuzu/kuzu_build_graph_csv.py:571,607`); MemGraph: the LOAD CSV templates
# of `MemGraph/mg_build_individual_json.py:163-188`.
# ---------------------------------------------------------------------------

def kuzu_copy_node_stmt(node_class: str, path: str, ignore_errors: bool = False) -> str:
    """`COPY \\`biolink:<Class>\\` FROM "<file>" (HEADER=true, ...)` — the
    per-class node import, strict by default (`Kuzu:571`)."""
    flag = "true" if ignore_errors else "false"
    return (
        f'COPY `biolink:{node_class}` FROM "{path}" '
        f'(HEADER=true, DELIMITER=",", IGNORE_ERRORS={flag});'
    )


def kuzu_copy_rel_stmt(
    predicate: str, subject_class: str, object_class: str, path: str,
    ignore_errors: bool = True,
) -> str:
    """`COPY \\`<pred>\\` FROM '<file>' (from=..., to=..., ...)` — the
    per-(pred, subj, obj) edge import, lenient by default (`Kuzu:607`)."""
    flag = "true" if ignore_errors else "false"
    return (
        f"COPY `{predicate}` FROM '{path}' "
        f"(from='biolink:{subject_class}', to='biolink:{object_class}', "
        f"HEADER=true, DELIMITER=',', IGNORE_ERRORS={flag});"
    )


def memgraph_load_csv_nodes(path: str, property_map: str) -> str:
    """The node LOAD CSV template (`MemGraph/mg_build_individual_json.py:
    163-175`): create :Node with the cast property map, then explode the
    category list into labels via `set n: n.category`."""
    return (
        f'load csv from "{path}" with header as row\n'
        f"create (n: Node {property_map})\n"
        "with n\n"
        "    match (n: Node)\n"
        "    set n: n.category;"
    )


def memgraph_load_csv_edges(path: str, property_map: str) -> str:
    """The edge LOAD CSV template (`MemGraph/mg_build_individual_json.py:
    177-188`): MATCH both endpoints by id, CREATE the typed relationship."""
    return (
        f'load csv from "{path}" with header as row\n'
        "with row\n"
        "  match (a: Node {id: row.subject}), (b: Node {id: row.object})\n"
        "  create (a)-\n"
        f"    [e: row.predicate {property_map}]->(b);"
    )


def _partition_value(dirname: str) -> str:
    """hive dir component 'key=value' -> decoded value."""
    from urllib.parse import unquote

    return unquote(dirname.split("=", 1)[1])


def generate_import_statements(out_dir: str) -> dict[str, list[str]]:
    """Walk a written graph layout (``write_graph`` output: hive-partitioned
    ``nodes/primary_class=*`` and ``edges/predicate=*[/subject_class=*/
    object_class=*]``) and emit the runnable Kuzu COPY statements per
    partition, in the reference's deterministic order (sorted classes;
    predicates sorted, then subject class — `Kuzu:557,579-587`). Missing
    partitions are simply absent (the reference skips missing bin files).
    """
    import os

    node_stmts: list[str] = []
    node_root = os.path.join(out_dir, "nodes")
    if os.path.isdir(node_root):
        for d in sorted(os.listdir(node_root)):
            if not d.startswith("primary_class="):
                continue
            node_stmts.append(
                kuzu_copy_node_stmt(_partition_value(d), os.path.join(node_root, d))
            )

    edge_stmts: list[str] = []
    edge_root = os.path.join(out_dir, "edges")
    if os.path.isdir(edge_root):
        for pd_ in sorted(os.listdir(edge_root)):
            if not pd_.startswith("predicate="):
                continue
            pred = _partition_value(pd_)
            pred_dir = os.path.join(edge_root, pd_)
            triples = []
            for sd in sorted(os.listdir(pred_dir)):
                if not sd.startswith("subject_class="):
                    continue
                for od in sorted(os.listdir(os.path.join(pred_dir, sd))):
                    if not od.startswith("object_class="):
                        continue
                    triples.append(
                        (
                            _partition_value(sd), _partition_value(od),
                            os.path.join(pred_dir, sd, od),
                        )
                    )
            if triples:
                for subj, obj, path in sorted(triples):
                    edge_stmts.append(kuzu_copy_rel_stmt(pred, subj, obj, path))
            else:
                # predicate-only layout (class sub-partitioning guarded off)
                edge_stmts.append(
                    kuzu_copy_rel_stmt(pred, "NamedThing", "NamedThing", pred_dir)
                )
    return {"nodes": node_stmts, "edges": edge_stmts}


def schema_to_age_ddl(node_schema: pa.Schema, edge_schema: pa.Schema) -> dict[str, str]:
    """AGE-dialect DDL (`AGE/age_build_graph_csv.py:37-43`): one generic
    ``Node``/``Edge`` table pair instead of Kuzu's per-class/per-predicate
    tables — same column/type grammar, so it reuses the Kuzu generators."""
    return {
        "node": schema_to_kuzu_node_ddl(node_schema, "Node"),
        "edge": schema_to_kuzu_rel_ddl(edge_schema, "Edge", "Node", "Node"),
    }
