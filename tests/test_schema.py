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
