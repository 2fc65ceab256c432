"""Validation strictness asymmetry (nodes strict / edges lenient)."""

import pytest

import ray.data

from kgray.validate import ValidationError, drop_count, validate_table


def _rows():
    return ray.data.from_items(
        [
            {"id": "RAW:1", "name": "a"},
            {"id": None, "name": "b"},
            {"id": "RAW:3", "name": None},
        ]
    )


def test_strict_raises_on_null_key(ray_session):
    with pytest.raises(Exception) as e:
        validate_table(_rows(), ["id", "name"], non_null_cols=["id"], strict=True).take_all()
    assert "null keys" in str(e.value)


def test_lenient_drops_and_counts(ray_session):
    out = validate_table(
        _rows(), ["id", "name"], non_null_cols=["id"], strict=False
    ).take_all()
    assert {r["id"] for r in out} == {"RAW:1", "RAW:3"}
    stats = drop_count(_rows(), ["id"])
    assert stats == {"rows": 3, "dropped": 1}


def test_missing_required_column_always_raises(ray_session):
    with pytest.raises(Exception) as e:
        validate_table(_rows(), ["id", "missing_col"], strict=False).take_all()
    assert "missing required columns" in str(e.value)


def test_field_union(ray_session):
    from kgray.graph_io import infer_field_union

    a = ray.data.from_items([{"id": "1", "x": 2}])
    b = ray.data.from_items([{"id": "2", "y": 3}])
    assert infer_field_union(a.union(b)) == ["id", "x", "y"]


def test_semi_anti_join(ray_session):
    from kgray.relational import anti_join, semi_join

    left = ray.data.from_items(
        [{"k": i, "v": f"r{i}"} for i in range(6)]
    )
    right = ray.data.from_items(
        [{"rk": 1}, {"rk": 1}, {"rk": 3}, {"rk": 4}]  # duplicate key on purpose
    )
    semi = semi_join(left, right, on="k", right_on="rk", num_partitions=2).take_all()
    # key-distinct: no duplication of left rows despite duplicate right keys
    assert sorted(r["k"] for r in semi) == [1, 3, 4]
    anti = anti_join(left, right, on="k", right_on="rk", num_partitions=2).take_all()
    assert sorted(r["k"] for r in anti) == [0, 2, 5]
    assert all(set(r) == {"k", "v"} for r in semi + anti)
