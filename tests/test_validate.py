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


def test_quarantine_splits_and_writes_reasons(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from kgray.validate import quarantine

    tbl = pa.table(
        {
            "id": pa.array([1, None, 3, None], type=pa.int64()),
            "key": pa.array(["a", "b", None, None], type=pa.string()),
            "v": pa.array([10, 20, 30, 40], type=pa.int64()),
        }
    )
    out = str(tmp_path / "quar")
    good, rep = quarantine(rd.from_arrow(tbl).repartition(2), ["id", "key"], out)
    assert rep == {"rows": 4, "quarantined": 3, "path": out}
    assert sorted(r["v"] for r in good.take_all()) == [10]
    bad = pq.ParquetDataset(out).read().to_pylist()
    why = {r["v"]: r["reason"] for r in bad}
    assert why[20] == "null:id"
    assert why[30] == "null:key"
    assert why[40] == "null:id,null:key"


def test_quarantine_reason_interior_gap(ray_session, tmp_path):
    """A valid MIDDLE column must not leave an empty reason segment:
    null c1, valid c2, null c3 -> 'null:c1,null:c3' (advice r2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from kgray.validate import quarantine

    tbl = pa.table(
        {
            "c1": pa.array([None, 1], type=pa.int64()),
            "c2": pa.array(["ok", "ok"], type=pa.string()),
            "c3": pa.array([None, 3.0], type=pa.float64()),
            "v": pa.array([1, 2], type=pa.int64()),
        }
    )
    out = str(tmp_path / "quar")
    good, rep = quarantine(
        rd.from_arrow(tbl), ["c1", "c2", "c3"], out
    )
    assert rep["quarantined"] == 1
    bad = pq.ParquetDataset(out).read().to_pylist()
    assert bad[0]["reason"] == "null:c1,null:c3"
