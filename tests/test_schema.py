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
