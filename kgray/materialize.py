"""Graph materialization — deduped edge + normalized node Parquet tables.

Re-expresses the reference's binning topology on Ray Data:

- edge dedup on (subject, predicate, object): explicit here (the reference
  delegates uniqueness to DB PKs / ``IGNORE_ERRORS=true``, `Kuzu:414,607`);
  implemented as a per-batch partial combine followed by one
  ``groupby`` — the classic pre-aggregation pattern, so the shuffle moves
  one row per distinct triple per block, not one per occurrence.
- provenance = the FIRST occurrence by (conv_id, turn_idx), made
  order-free by aggregating ``min`` over a zero-padded sort key instead of
  relying on arrival order (replaces ST3's sequential counter,
  `MemGraph/mg_build_merge_json.py:61,157`).
- edge_uid = deterministic content hash of (subject, predicate, object) —
  stable across runs/cluster sizes, unlike the reference's arrival-order id.
- node normalization M6/M7 (label-priority reorder, primary class) from
  ``kgray.normalize``.
- partitioned writes: nodes by primary class (P1, `Kuzu:332-335,350`),
  edges by (predicate, subject_class, object_class) (P2, `Kuzu:344`) via
  ``write_parquet(partition_cols=...)`` — the Ray-native form of the
  reference's per-key CSV files (S5, `Kuzu:355-376`).
"""

from __future__ import annotations

import os
from urllib.parse import quote as _quote

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from .normalize import primary_class, reorder_labels
from .transcripts import KNOWLEDGE_SOURCE


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _prov_key(conv_id: pa.Array, turn_idx: pa.Array) -> pa.Array:
    """Lexicographically-ordered provenance key 'conv#00000042'."""
    padded = pc.utf8_lpad(pc.cast(turn_idx, pa.string()), 8, "0")
    return pc.binary_join_element_wise(conv_id, padded, "#")


def _partial_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per distinct triple with min(prov), count."""
    prov = _prov_key(_chunked(batch["conv_id"]), _chunked(batch["turn_idx"]))
    t = pa.table(
        {
            "subject": _chunked(batch["subject_id"]),
            "predicate": _chunked(batch["predicate"]),
            "object": _chunked(batch["object_id"]),
            "prov": prov,
        }
    )
    return t.group_by(["subject", "predicate", "object"]).aggregate(
        [("prov", "min"), ("prov", "count")]
    ).rename_columns(["subject", "predicate", "object", "prov_min", "n_mentions"])


def edge_uid(subject, predicate, obj) -> pa.Array:
    """Deterministic 64-bit content hash of the triple, hex-encoded."""
    key = (
        pd.Series(np.asarray(subject, dtype=object))
        + "|" + pd.Series(np.asarray(predicate, dtype=object))
        + "|" + pd.Series(np.asarray(obj, dtype=object))
    )
    h = pd.util.hash_pandas_object(key, index=False).to_numpy()
    return pa.array([format(x, "016x") for x in h], type=pa.string())


def build_edges(
    linked_triples: ray.data.Dataset,
    class_lookup_ref=None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """linked triples (subject_id, predicate, object_id, conv_id, turn_idx)
    -> deduplicated edge table.

    ``class_lookup_ref``: optional broadcast (ray.put) dict id -> primary
    class; when given, edges are tagged with subject_class/object_class (J1)
    and rows with unknown endpoints are KEPT with null classes — endpoint
    existence was already enforced by the linker (J2).
    """
    from .relational import hash_bucketed_groupby

    # combiner at block granularity (batch_size=None): an explicit row-count
    # batch_size would COALESCE upstream blocks — a serializing exchange that
    # measured 2.5x slower than per-block combining at 8M rows/32 CPUs; the
    # partial output is ~n_distinct rows per block either way
    partial = linked_triples.map_batches(
        _partial_dedup, batch_format="pyarrow", batch_size=None
    )

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["subject", "predicate", "object"], sort=False, as_index=False).agg(
            prov=("prov_min", "min"), n_mentions=("n_mentions", "sum")
        )
        return out

    deduped = hash_bucketed_groupby(
        partial, ["subject", "predicate", "object"], reduce_bucket,
        num_buckets=num_partitions or 64,
    )

    def finish(t: pa.Table) -> pa.Table:
        subject = _chunked(t["subject"])
        predicate = _chunked(t["predicate"])
        obj = _chunked(t["object"])
        prov = _chunked(t["prov"])
        split = pc.split_pattern(prov, "#")
        conv = pc.list_element(split, 0)
        turn = pc.cast(pc.list_element(split, 1), pa.int32())
        out = pa.table(
            {
                "subject": subject,
                "predicate": predicate,
                "object": obj,
                "edge_uid": edge_uid(subject, predicate, obj),
                "primary_knowledge_source": pa.array(
                    [KNOWLEDGE_SOURCE] * len(t), type=pa.string()
                ),
                "n_mentions": pc.cast(_chunked(t["n_mentions"]), pa.int64()),
                "first_conv_id": conv,
                "first_turn_idx": turn,
            }
        )
        return out

    edges = deduped.map_batches(finish, batch_format="pyarrow")

    if class_lookup_ref is not None:
        edges = tag_edge_classes(edges, class_lookup_ref)
    return edges


def decode_hive_predicates(t: pa.Table) -> pa.Table:
    """Undo the hive writer's URL-quoting on the ``predicate`` column
    read back from the P2 layout ('biolink%3Atreats' -> 'biolink:treats').
    The column is a tiny dictionary per batch, so decode through the
    dictionary, never per row. Shared by the CLI query stage and the
    SPARQL-UPDATE executor — any reader of the partitioned edge table
    needs exactly this."""
    from urllib.parse import unquote

    col = t["predicate"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    dec = pa.DictionaryArray.from_arrays(
        enc.indices,
        pa.array(
            [unquote(v.as_py()) for v in enc.dictionary], pa.string()
        ),
    ).cast(pa.string())
    return t.set_column(
        t.schema.get_field_index("predicate"), "predicate", dec
    )


def tag_edge_classes(edges_ds: ray.data.Dataset, class_lookup_ref) -> ray.data.Dataset:
    """J1: attach subject_class/object_class from the broadcast ST1 lookup.
    Unknown endpoints keep null classes (existence was enforced upstream by
    the linker — J2)."""

    def tag(t: pa.Table, _ref=class_lookup_ref) -> pa.Table:
        lookup = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref

        def cls(col):
            enc = pc.dictionary_encode(_chunked(col))
            get = lookup.get
            mapped = pa.array(
                [get(v) for v in enc.dictionary.to_pylist()], type=pa.string()
            )
            return mapped.take(enc.indices)

        return t.append_column("subject_class", cls(t["subject"])).append_column(
            "object_class", cls(t["object"])
        )

    return edges_ds.map_batches(tag, batch_format="pyarrow")


def build_nodes(
    edges_ds: ray.data.Dataset,
    catalog_index_ref,
    endpoint_cols: tuple[str, str] = ("subject", "object"),
) -> ray.data.Dataset:
    """Distinct endpoint ids of the edge/triple stream -> normalized node table.

    ``catalog_index_ref``: broadcast dict id -> (name, categories list,
    equivalent_identifiers list). Node normalization = M6 label reorder +
    M7 primary class.
    """
    s_col, o_col = endpoint_cols

    def endpoints(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [_chunked(t[s_col]).cast(pa.string()), _chunked(t[o_col]).cast(pa.string())]
        )
        return pa.table({"id": ids.unique()})

    # distributed distinct: per-batch unique (combiner) then a bucketed
    # dedup — the node id set never lands on the driver. Bucketed shuffle
    # instead of Ray's sort-based groupby: on the (small, already-deduped)
    # edge table the sort shuffle's fixed cost GROWS with cluster size
    # (measured 1.1s@8cpu -> 1.9s@32cpu); 16 hash buckets keep it flat.
    from .relational import hash_bucketed_groupby

    ids_ds = hash_bucketed_groupby(
        edges_ds.select_columns(list(endpoint_cols)).map_batches(
            endpoints, batch_format="pyarrow"
        ),
        ["id"],
        lambda df: df.drop_duplicates("id"),
        num_buckets=16,
    )

    def attrs(t: pa.Table, _ref=catalog_index_ref) -> pa.Table:
        idx = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        ids = _chunked(t["id"]).to_pylist()
        rows = [idx.get(i) for i in ids]
        names = pa.array([r[0] if r else None for r in rows], type=pa.string())
        cats = pa.array(
            [r[1] if r else [] for r in rows], type=pa.list_(pa.string())
        )
        equiv = pa.array(
            [r[2] if r else [] for r in rows], type=pa.list_(pa.string())
        )
        labels = reorder_labels(cats)
        return pa.table(
            {
                "id": _chunked(t["id"]),
                "name": names,
                "labels": labels,
                "equivalent_identifiers": equiv,
                "primary_class": primary_class(labels),
            }
        )

    return ids_ds.map_batches(attrs, batch_format="pyarrow")


def catalog_index(catalog: pa.Table) -> dict[str, tuple]:
    """id -> (name, categories, equivalent_identifiers) broadcast payload."""
    return {
        i: (n, c, e)
        for i, n, c, e in zip(
            catalog["id"].to_pylist(),
            catalog["name"].to_pylist(),
            catalog["categories"].to_pylist(),
            catalog["equivalent_identifiers"].to_pylist(),
        )
    }


def write_graph(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    out_dir: str,
    partition_edges_by_classes: bool = True,
    num_write_buckets: int = 32,
) -> dict[str, str]:
    """Partitioned Parquet sinks (P1/P2). Returns the output paths.

    Edge layout defaults to the reference's full P2 binning —
    (predicate, subject_class, object_class), `Kuzu:344` — with the rows
    first co-located by a hash of the partition key: ``write_parquet``
    emits one file per (block x partition-key) combination, so without
    co-location every key fragments across every block (thousands of tiny
    files). One bucketed shuffle of the (already deduped, small) edge
    table caps it at one file per key.
    """
    from .relational import hash_bucketed_groupby

    node_dir = f"{out_dir}/nodes"
    edge_dir = f"{out_dir}/edges"
    nodes.write_parquet(node_dir, partition_cols=["primary_class"])
    part_cols = ["predicate"]
    if partition_edges_by_classes:
        part_cols += ["subject_class", "object_class"]
        edges = hash_bucketed_groupby(
            edges, part_cols, lambda df: df, num_buckets=num_write_buckets
        )
    edges.write_parquet(edge_dir, partition_cols=part_cols)
    return {"nodes": node_dir, "edges": edge_dir}


def build_nodes_local(
    edges_tbl: pa.Table,
    cat_idx: dict,
    endpoint_cols: tuple[str, str] = ("subject", "object"),
) -> pa.Table:
    """``build_nodes`` for a DRIVER-RESIDENT edge table (the size-routed
    tail: after (s,p,o) dedup the edge table is distinct-triple-bounded,
    and under the pipeline's ``tail_local_limit`` the whole node build is
    one vectorized pass — no Dataset stages). Same kernels, same rows as
    the distributed path (parity-tested in tests/test_pipeline_e2e.py)."""
    s_col, o_col = endpoint_cols
    ids = pa.concat_arrays(
        [
            _chunked(edges_tbl[s_col]).cast(pa.string()),
            _chunked(edges_tbl[o_col]).cast(pa.string()),
        ]
    ).unique()
    rows = [cat_idx.get(i) for i in ids.to_pylist()]
    names = pa.array([r[0] if r else None for r in rows], type=pa.string())
    cats = pa.array([r[1] if r else [] for r in rows], type=pa.list_(pa.string()))
    equiv = pa.array([r[2] if r else [] for r in rows], type=pa.list_(pa.string()))
    labels = reorder_labels(cats)
    return pa.table(
        {
            "id": ids,
            "name": names,
            "labels": labels,
            "equivalent_identifiers": equiv,
            "primary_class": primary_class(labels),
        }
    )


def tag_edge_classes_local(edges_tbl: pa.Table, class_lookup: dict) -> pa.Table:
    """``tag_edge_classes`` for a driver-resident edge table."""

    def cls(col):
        enc = pc.dictionary_encode(_chunked(col))
        get = class_lookup.get
        mapped = pa.array(
            [get(v) for v in enc.dictionary.to_pylist()], type=pa.string()
        )
        return mapped.take(enc.indices)

    return edges_tbl.append_column(
        "subject_class", cls(edges_tbl["subject"])
    ).append_column("object_class", cls(edges_tbl["object"]))


@ray.remote
def _write_partition_slice(
    tbl: pa.Table, part_cols: list[str], keys: list[tuple], out_dir: str
) -> int:
    """Write the rows of ``tbl`` whose partition key is in ``keys`` as one
    hive-layout file per key (pyarrow dirs are read-compatible with the
    Dataset writer's layout; nulls use the hive default-partition sentinel,
    which pyarrow's hive discovery reads back as null). ``keys`` holds
    stringified tuples from :func:`_partition_keys_str`. Row→key matching
    is ONE dictionary-encode of the combined key column + one numpy
    compare per key — never a Python loop over rows."""
    import numpy as _np
    import pyarrow.parquet as pq

    combo = _combined_key(tbl, part_cols)
    enc = pc.dictionary_encode(combo)
    code_of = {v: i for i, v in enumerate(enc.dictionary.to_pylist())}
    idx = enc.indices.to_numpy(zero_copy_only=False)
    n = 0
    for key in keys:
        code = code_of.get("\x1f".join(key))
        if code is None:
            continue
        sub = tbl.filter(pa.array(idx == code)).drop_columns(part_cols)
        # URL-quote values like the Dataset writer does ('biolink:x' ->
        # 'biolink%3Ax') so both writers land in the SAME directories
        d = os.path.join(
            out_dir, *(f"{c}={_quote(v, safe='')}" for c, v in zip(part_cols, key))
        )
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, "part-local.parquet"))
        n += sub.num_rows
    return n


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _combined_key(tbl: pa.Table, part_cols: list[str]) -> pa.Array:
    """'\\x1f'-joined stringified partition key per row, nulls → hive
    sentinel (so null keys round-trip through the directory name)."""
    cols = [
        pc.fill_null(_chunked(tbl[c]).cast(pa.string()), _HIVE_NULL)
        for c in part_cols
    ]
    return cols[0] if len(cols) == 1 else pc.binary_join_element_wise(*cols, "\x1f")


def _partition_keys_str(tbl: pa.Table, part_cols: list[str]) -> list[tuple]:
    """Sorted distinct stringified partition keys of ``tbl``."""
    return sorted(
        tuple(k.split("\x1f")) for k in _combined_key(tbl, part_cols).unique().to_pylist()
    )


def write_graph_local(
    nodes_tbl: pa.Table,
    edges_tbl: pa.Table,
    out_dir: str,
    partition_edges_by_classes: bool = True,
    num_write_tasks: int = 16,
) -> dict[str, str]:
    """``write_graph`` for driver-resident tables (size-routed tail): the
    same hive layout, written by ``num_write_tasks`` flat Ray tasks over
    disjoint partition-key ranges instead of a bucketed shuffle + Dataset
    sink — one task round replaces three stage executions. Layout parity
    with the distributed writer is asserted by tests that read both back."""
    node_dir = f"{out_dir}/nodes"
    edge_dir = f"{out_dir}/edges"
    part_cols = ["predicate"] + (
        ["subject_class", "object_class"] if partition_edges_by_classes else []
    )

    nodes_ref = ray.put(nodes_tbl)
    node_keys = _partition_keys_str(nodes_tbl, ["primary_class"])
    edge_keys = _partition_keys_str(edges_tbl, part_cols)
    edges_ref = ray.put(edges_tbl)

    futs = [
        _write_partition_slice.remote(
            nodes_ref, ["primary_class"], node_keys, node_dir
        )
    ]
    chunk = max(1, (len(edge_keys) + num_write_tasks - 1) // num_write_tasks)
    for i in range(0, len(edge_keys), chunk):
        futs.append(
            _write_partition_slice.remote(
                edges_ref, part_cols, edge_keys[i : i + chunk], edge_dir
            )
        )
    ray.get(futs)
    return {"nodes": node_dir, "edges": edge_dir}


def zorder_key(x: "np.ndarray", y: "np.ndarray", bits: int = 16) -> "np.ndarray":
    """Morton / Z-order interleave of two non-negative int columns (low
    ``bits`` bits each) — the clustering key that makes a SINGLE sort give
    range-scan locality on BOTH dimensions at once (sort by z, write; a
    reader filtering either column touches O(sqrt) of the row groups).
    Vectorized bit spread: one masked shift per bit position, exactly
    mirrorable in integer SQL via a powers-of-4 sum."""
    x = x.astype(np.int64) & ((1 << bits) - 1)
    y = y.astype(np.int64) & ((1 << bits) - 1)
    z = np.zeros_like(x)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
