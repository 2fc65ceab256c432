"""Empty-input behavior of the late-round operators: every op must return
an empty (or source-only) result, never raise, on zero-row datasets."""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgray.graphalgo import _pagerank_counts, bfs_distances
from kgray.relational import mode_per_group, quantile_disc_per_group
from kgray.sketch import histogram_quantiles
from kgray.streaming import ordered_transitions


def _empty(cols: dict) -> rd.Dataset:
    return rd.from_pandas(
        pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
    )


def test_empty_mode_and_quantile(ray_session):
    ds = _empty({"k": str, "v": "int64"})
    assert mode_per_group(ds, "k", "v").count() == 0
    assert quantile_disc_per_group(ds, "k", "v").count() == 0


def test_empty_transitions_and_histogram(ray_session):
    ds = _empty({"k": str, "i": "int64", "v": str})
    assert ordered_transitions(ds, "k", "i", "v").count() == 0
    g = _empty({"g": str, "value": "float64"})
    assert histogram_quantiles(g, "g", "value").count() == 0


def test_empty_graph_ops(ray_session):
    e = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
        )
    )
    # BFS always emits the source row (dist 0), matching the SQL mirror
    bfs = bfs_distances(e, source=0)
    assert bfs.num_rows == 1 and bfs["dist"].to_pylist() == [0]
    assert _pagerank_counts(e.materialize(), "src", "dst", 3, 10**12).num_rows == 0
