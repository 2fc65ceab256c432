"""Lookup builds + checkpoints (reference ST1/ST2/ST4).

- ST1 node-class lookup (`Kuzu/kuzu_build_graph_csv.py:210-239`): id ->
  primary class, built as a Dataset aggregation and collected into a
  broadcastable dict (the reference holds ~10M entries in one dict; past
  ``broadcast_limit`` callers should switch to the join path in
  ``canonicalize.rewrite_ids``-style instead of collecting).
- ST2 predicate pair-sets (`Kuzu:242-271`): predicate ->
  {(subject_class, object_class)} as a distinct groupby — this drives the
  partitioned output layout (P2).
- ST4 pickle checkpoints (`Kuzu:673-680`) become Parquet checkpoint tables.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count


def node_class_lookup(nodes_ds: ray.data.Dataset) -> dict[str, str]:
    """ST1: stream (id, primary_class) into a driver dict for broadcast."""
    lookup: dict[str, str] = {}
    for batch in nodes_ds.select_columns(["id", "primary_class"]).iter_batches(
        batch_format="pyarrow", batch_size=1 << 18
    ):
        lookup.update(zip(batch["id"].to_pylist(), batch["primary_class"].to_pylist()))
    return lookup


def predicate_pairs(edges_ds: ray.data.Dataset) -> ray.data.Dataset:
    """ST2: distinct (predicate, subject_class, object_class) + edge count."""
    return edges_ds.groupby(["predicate", "subject_class", "object_class"]).aggregate(
        Count(alias_name="n_edges")
    )


def broadcast(obj) -> "ray.ObjectRef":
    """Ship a small lookup once; stages ray.get it in actor __init__."""
    return ray.put(obj)


def save_lookup(lookup: dict[str, str], path: str, key: str = "id", value: str = "value") -> None:
    """ST4 analog: checkpoint a lookup dict as a Parquet table."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(
        pa.table({key: list(lookup.keys()), value: list(lookup.values())}), path
    )


def load_lookup(path: str, key: str = "id", value: str = "value") -> dict[str, str]:
    t = pq.read_table(path)
    return dict(zip(t[key].to_pylist(), t[value].to_pylist()))
