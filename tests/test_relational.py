"""Size-routed join policies (relational.py)."""

import pandas as pd
import pyarrow as pa

import ray.data

from kgray import relational


def _fact_dim():
    fact = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 2, 9], type=pa.int64()),
                  "x": pa.array([10, 20, 30, 40, 21, 90], type=pa.int64())})
    )
    dim = ray.data.from_arrow(
        pa.table({"dk": pa.array([1, 2, 3, 4, 5, 6, 7, 8], type=pa.int64()),
                  "name": [f"n{i}" for i in range(1, 9)]})
    )
    return fact, dim


def _rows(ds):
    out = []
    for r in ds.take_all():
        v = r.get("name")
        v = None if v is None or (isinstance(v, float) and pd.isna(v)) else v
        out.append((r["k"], r["x"], v))
    return sorted(out, key=lambda t: (t[0], t[1], t[2] or ""))


def test_broadcast_lookup_join_routes_small_dim_to_broadcast(ray_session):
    fact, dim = _fact_dim()
    out = relational.broadcast_lookup_join(fact, dim, "k", "dk", ["name"])
    rows = _rows(out)
    assert rows == sorted(
        [(1, 10, "n1"), (2, 20, "n2"), (3, 30, "n3"), (4, 40, "n4"),
         (2, 21, "n2"), (9, 90, None)],
        key=lambda t: (t[0], t[1], t[2] or ""),
    )


def test_broadcast_lookup_join_routes_large_dim_to_shuffle_join(ray_session):
    """Past broadcast_limit the dim side must go through the hash join —
    same left-join contract, no driver pandas of the dim table."""
    fact, dim = _fact_dim()
    out = relational.broadcast_lookup_join(
        fact, dim, "k", "dk", ["name"], broadcast_limit=2, num_partitions=2
    )
    rows = _rows(out)
    assert rows == sorted(
        [(1, 10, "n1"), (2, 20, "n2"), (3, 30, "n3"), (4, 40, "n4"),
         (2, 21, "n2"), (9, 90, None)],
        key=lambda t: (t[0], t[1], t[2] or ""),
    )


def test_broadcast_lookup_join_accepts_dataframe(ray_session):
    fact, dim = _fact_dim()
    dim_df = pd.DataFrame({"dk": [1, 2], "name": ["n1", "n2"]})
    out = relational.broadcast_lookup_join(fact, dim_df, "k", "dk", ["name"])
    assert (1, 10, "n1") in _rows(out)


def test_marker_join_empty_right_side(ray_session):
    """anti_join(left, empty) == left; semi_join(left, empty) == empty
    (the advisor-found null-typed is_in crash)."""
    fact, _ = _fact_dim()
    empty = ray.data.from_arrow(pa.table({"dk": pa.array([], type=pa.int64())}))
    assert relational.anti_join(fact, empty, on="k", right_on="dk").count() == 6
    assert relational.semi_join(fact, empty, on="k", right_on="dk").count() == 0
