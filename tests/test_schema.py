import pyarrow as pa
import pytest

from kgray.schema import (
    ORDERED_CATEGORIES,
    header_to_arrow_schema,
    list_columns_of,
    parse_header_token,
    sanitize_column_name,
)

NODE_HDR = (
    "id:ID\tname:string\tcategory:LABEL\tequivalent_identifiers:string[]\t"
    "description:string\tinformation_content:float\tlipinski:int\thgvs:string[]"
)
EDGE_HDR = (
    "subject:START_ID\tpredicate:TYPE\tobject:END_ID\tpublications:string[]\t"
    "p_value:float[]\tknowledge_level:string\tagent_type:string\t"
    "distance_to_feature:int\tnegated:boolean"
)


def test_priority_list_matches_reference():
    # Kuzu/kuzu_build_graph_csv.py:29-34 — 25 classes, GeneFamily first
    assert len(ORDERED_CATEGORIES) == 25
    assert ORDERED_CATEGORIES[0] == "biolink:GeneFamily"
    assert ORDERED_CATEGORIES[-1] == "biolink:BiologicalEntity"


def test_sanitize():
    assert sanitize_column_name("a.b c:d-e") == "a_b_c_d_e"
    assert sanitize_column_name("ok_name9") == "ok_name9"


def test_parse_header_token_types():
    assert parse_header_token("id:ID")[:2] == ("id", pa.string())
    assert parse_header_token("negated:boolean")[1] == pa.bool_()
    assert parse_header_token("p_value:float[]")[1] == pa.list_(pa.float64())
    assert parse_header_token("category:LABEL")[1] == pa.list_(pa.string())
    # name containing ':' keeps all but the final type token (Kuzu:514)
    name, typ, _ = parse_header_token("CHEBI:ROLE:string")
    assert name == "CHEBI_ROLE" and typ == pa.string()


def test_unknown_type_errors():
    # reference: "ERROR: No data type recognised" (Kuzu:532)
    with pytest.raises(ValueError):
        parse_header_token("foo:decimal")


def test_node_header_schema_with_rename():
    schema = header_to_arrow_schema(NODE_HDR, rename_cols={"category": "labels"})
    assert schema.names[0] == "id"
    assert "labels" in schema.names and "category" not in schema.names
    assert schema.field("labels").type == pa.list_(pa.string())
    assert schema.field("information_content").type == pa.float64()
    assert schema.field("lipinski").type == pa.int64()
    assert set(list_columns_of(schema)) == {"labels", "equivalent_identifiers", "hgvs"}


def test_edge_header_schema():
    schema = header_to_arrow_schema(EDGE_HDR, rename_cols={"predicate": "label"})
    assert schema.field("subject").type == pa.string()
    assert schema.field("label").type == pa.string()
    assert schema.field("p_value").type == pa.list_(pa.float64())
    assert schema.field("negated").type == pa.bool_()


def test_predicate_pairs_and_lookup_checkpoint(ray_session, tmp_path):
    """ST2 distinct pair-sets + ST4 Parquet lookup checkpoint round trip."""
    import pyarrow as pa

    import ray.data as rd

    from kgray.lookups import load_lookup, predicate_pairs, save_lookup

    edges = rd.from_arrow(
        pa.table(
            {
                "predicate": ["p1", "p1", "p2", "p1"],
                "subject_class": ["A", "A", "B", "C"],
                "object_class": ["B", "B", "C", "D"],
            }
        )
    )
    got = sorted(
        predicate_pairs(edges).take_all(),
        key=lambda r: (r["predicate"], r["subject_class"]),
    )
    assert [(r["predicate"], r["subject_class"], r["object_class"], r["n_edges"]) for r in got] == [
        ("p1", "A", "B", 2), ("p1", "C", "D", 1), ("p2", "B", "C", 1),
    ]
    p = str(tmp_path / "ck" / "lookup.parquet")
    save_lookup({"a": "X", "b": "Y"}, p)
    assert load_lookup(p) == {"a": "X", "b": "Y"}


def test_kuzu_copy_statements_golden():
    """Statement text mirrors the reference importers exactly:
    strict nodes (`Kuzu:571`), lenient edges with from/to qualifiers
    (`Kuzu:607`)."""
    from kgray.schema import kuzu_copy_node_stmt, kuzu_copy_rel_stmt

    assert kuzu_copy_node_stmt("Gene", "/d/rk-nodes-bin-Gene.csv") == (
        'COPY `biolink:Gene` FROM "/d/rk-nodes-bin-Gene.csv" '
        '(HEADER=true, DELIMITER=",", IGNORE_ERRORS=false);'
    )
    assert kuzu_copy_rel_stmt(
        "biolink:affects", "Gene", "Disease", "/d/rk-edges-bin-affects_Gene_Disease.csv"
    ) == (
        "COPY `biolink:affects` FROM '/d/rk-edges-bin-affects_Gene_Disease.csv' "
        "(from='biolink:Gene', to='biolink:Disease', "
        "HEADER=true, DELIMITER=',', IGNORE_ERRORS=true);"
    )


def test_memgraph_load_csv_golden():
    """LOAD CSV templates match `MemGraph/mg_build_individual_json.py:163-188`:
    node create + label explode; edge endpoint MATCH by id."""
    from kgray.schema import memgraph_load_csv_edges, memgraph_load_csv_nodes

    nodes = memgraph_load_csv_nodes("/var/log/memgraph/n.csv", "{id: row.id}")
    assert nodes.splitlines() == [
        'load csv from "/var/log/memgraph/n.csv" with header as row',
        "create (n: Node {id: row.id})",
        "with n",
        "    match (n: Node)",
        "    set n: n.category;",
    ]
    edges = memgraph_load_csv_edges("/var/log/memgraph/e.csv", "{p: row.p}")
    assert "match (a: Node {id: row.subject}), (b: Node {id: row.object})" in edges
    assert edges.endswith("[e: row.predicate {p: row.p}]->(b);")


def test_generate_import_statements_walks_partition_layout(tmp_path):
    """COPY statements are generated per written partition, sorted like the
    reference's import loops (`Kuzu:557,579-587`); URL-encoded hive values
    decode back to CURIEs."""
    import os

    from kgray.schema import generate_import_statements

    root = tmp_path / "g"
    for d in [
        "nodes/primary_class=Gene",
        "nodes/primary_class=Disease",
        "edges/predicate=biolink%3Aaffects/subject_class=Gene/object_class=Disease",
        "edges/predicate=biolink%3Aaffects/subject_class=Cell/object_class=Gene",
        "edges/predicate=biolink%3Atreats/subject_class=Drug/object_class=Disease",
    ]:
        os.makedirs(root / d)
    stmts = generate_import_statements(str(root))
    assert [s.split(" FROM")[0] for s in stmts["nodes"]] == [
        "COPY `biolink:Disease`", "COPY `biolink:Gene`",
    ]
    assert stmts["edges"][0].startswith(
        "COPY `biolink:affects` FROM"
    ) and "from='biolink:Cell', to='biolink:Gene'" in stmts["edges"][0]
    assert "from='biolink:Gene', to='biolink:Disease'" in stmts["edges"][1]
    assert stmts["edges"][2].startswith("COPY `biolink:treats` FROM")
    assert all("IGNORE_ERRORS=false" in s for s in stmts["nodes"])
    assert all("IGNORE_ERRORS=true" in s for s in stmts["edges"])


def test_generate_import_statements_predicate_only_layout(tmp_path):
    import os

    from kgray.schema import generate_import_statements

    root = tmp_path / "g"
    os.makedirs(root / "edges/predicate=biolink%3Atreats")
    stmts = generate_import_statements(str(root))
    assert len(stmts["edges"]) == 1
    assert "from='biolink:NamedThing', to='biolink:NamedThing'" in stmts["edges"][0]


def test_age_ddl_single_node_edge_pair():
    """AGE dialect (`AGE:37-43`): one generic Node/Edge table pair."""
    from kgray.schema import header_to_arrow_schema, schema_to_age_ddl

    node = header_to_arrow_schema("id:ID\tname:string\tcategory:LABEL")
    edge = header_to_arrow_schema(
        "from:START_ID\tto:END_ID\tsubject:string\tpredicate:string"
    )
    ddl = schema_to_age_ddl(node, edge)
    assert ddl["node"] == (
        "CREATE NODE TABLE Node (id STRING, name STRING, category STRING[], "
        "PRIMARY KEY (id))"
    )
    assert ddl["edge"] == (
        "CREATE REL TABLE Edge (FROM Node TO Node, subject STRING, predicate STRING)"
    )
