"""ID canonicalization — union-find over equivalent identifiers.

The reference's data model carries ``equivalent_identifiers`` per node
(`MemGraph/mg_build_individual_json.py:29-38`) and relies on the DB's
primary-key-on-id to collapse duplicates (`Kuzu:414`). Here canonicalization
is an explicit engine stage (north_rule): entities sharing any equivalent
identifier merge into one component whose canonical id is the
lexicographically smallest member id.

Two execution paths behind one interface (mirroring the reference's ST1
broadcast-dict pattern, `Kuzu:210-239`, which holds ~10M entries in memory):

- ``canonical_map_local``: the entity *vocabulary* (not the corpus) is
  usually orders of magnitude smaller than the edge stream; pairs are
  streamed off the Dataset once and union-find runs driver-side, then the
  id->canonical map is broadcast. This is the default below
  ``local_limit`` members.
- ``canonical_map_distributed``: min-label propagation over the bipartite
  (member, equiv-key) graph — each round is a ``groupby(key).min`` plus a
  hash join, all Ray Data shuffles, so it scales past driver memory.
  Convergence is detected with a cheap global label-checksum aggregate
  (one pass) instead of a compare join. Rounds needed = component
  diameter (tiny for equivalence-list data).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min


def explode_equivalents(batch: pa.Table) -> pa.Table:
    """(id, equivalent_identifiers) -> (member, key) pair rows."""
    ids = batch["id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    eq = batch["equivalent_identifiers"]
    if isinstance(eq, pa.ChunkedArray):
        eq = eq.combine_chunks()
    lengths = pc.list_value_length(eq).to_numpy(zero_copy_only=False)
    idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), lengths))
    return pa.table({"member": ids.take(idx), "key": eq.flatten()})


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        # path compression
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # canonical = lexicographic min
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def canonical_map_local(
    nodes_ds: "ray.data.Dataset | pa.Table",
) -> dict[str, str]:
    """Stream (member, key) pairs once; union-find on the driver.

    Returns id -> canonical id for every member id (equiv keys are used
    only to connect members, never emitted as canonical ids themselves:
    each key's members union with each other).

    Accepts a plain ``pa.Table`` for catalog-sized inputs — zero Dataset
    executions (each streaming execution costs ~0.3-1s of fixed executor
    latency, pure overhead when the vocabulary already sits on the driver).
    """
    uf = _UnionFind()
    first_member_of_key: dict[str, str] = {}
    members: set[str] = set()
    if isinstance(nodes_ds, pa.Table):
        batches = [explode_equivalents(nodes_ds.select(["id", "equivalent_identifiers"]))]
    else:
        pairs = nodes_ds.select_columns(["id", "equivalent_identifiers"]).map_batches(
            explode_equivalents, batch_format="pyarrow"
        )
        batches = pairs.iter_batches(batch_format="pyarrow", batch_size=1 << 18)
    for batch in batches:
        for member, key in zip(batch["member"].to_pylist(), batch["key"].to_pylist()):
            members.add(member)
            anchor = first_member_of_key.setdefault(key, member)
            if anchor != member:
                uf.union(anchor, member)
    return {m: uf.find(m) for m in members}


def canonical_map_distributed(
    nodes_ds: ray.data.Dataset,
    max_iters: int = 6,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """-> Dataset(id, canonical_id); fully distributed label propagation."""
    pairs = nodes_ds.select_columns(["id", "equivalent_identifiers"]).map_batches(
        explode_equivalents, batch_format="pyarrow"
    )
    # re-joined every round; node-vocabulary-sized, so pin it once
    pairs = pairs.materialize()

    labels = pairs.groupby("member").aggregate(Min("member", alias_name="label"))
    labels = labels.materialize()
    prev_sum = _label_checksum(labels)

    for _ in range(max_iters):
        with_labels = pairs.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("member",)
        )
        key_labels = with_labels.groupby("key").aggregate(
            Min("label", alias_name="key_label")
        )
        prop = pairs.join(
            key_labels, join_type="inner", num_partitions=num_partitions, on=("key",)
        )
        labels = prop.groupby("member").aggregate(
            Min("key_label", alias_name="label")
        ).materialize()
        cur_sum = _label_checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"id": t["member"], "canonical_id": t["label"]}),
        batch_format="pyarrow",
    )


def _label_checksum(labels: ray.data.Dataset) -> int:
    """Order-independent checksum of the (member, label) assignment —
    changes (w.h.p.) iff any label changed; one streaming aggregate."""
    import pandas as pd

    def part(t: pa.Table) -> pa.Table:
        s = pd.Series(t["member"].to_pandas() + "\x1f" + t["label"].to_pandas())
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        val = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pa.table({"h": pa.array([val], type=pa.uint64())})

    vals = [r["h"] for r in labels.map_batches(part, batch_format="pyarrow").take_all()]
    out = 0
    for v in vals:
        out ^= v
    return out


def canonical_map(
    nodes_ds: "ray.data.Dataset | pa.Table",
    local_limit: int = 20_000_000,
    **kwargs,
) -> "dict[str, str] | ray.data.Dataset":
    """Pick the execution path by vocabulary size (ST1-style broadcast dict
    below ``local_limit`` members, distributed propagation above)."""
    if isinstance(nodes_ds, pa.Table):
        return canonical_map_local(nodes_ds)
    if nodes_ds.count() <= local_limit:
        return canonical_map_local(nodes_ds)
    return canonical_map_distributed(nodes_ds, **kwargs)


def rewrite_ids(
    edges_ds: ray.data.Dataset,
    canonical: "ray.data.Dataset | dict[str, str]",
    cols: tuple[str, str] = ("subject_id", "object_id"),
) -> ray.data.Dataset:
    """Rewrite edge endpoint ids to canonical ids.

    dict maps (the common case — node-vocabulary sized) are broadcast via
    ``ray.put`` and applied with a dictionary-encoded lookup inside
    ``map_batches`` — no shuffle of the (much larger) edge stream. Dataset
    maps (too large to broadcast) go through one hash join per endpoint.
    """
    import ray

    if isinstance(canonical, ray.data.Dataset):
        out = edges_ds
        for col in cols:
            out = out.join(
                canonical, join_type="left_outer", num_partitions=16,
                on=(col,), right_on=("id",),
            )
            out = out.map_batches(
                lambda t, c=col: t.set_column(
                    t.column_names.index(c), c, pc.coalesce(t["canonical_id"], t[c])
                ).drop_columns(
                    [x for x in ("canonical_id", "id") if x in t.column_names]
                ),
                batch_format="pyarrow",
            )
        return out

    ref = ray.put(canonical)

    def rewrite(t: pa.Table, _ref=ref) -> pa.Table:
        # stateless task (fuses with neighbors); per-worker object fetch is
        # amortized by the module cache
        mapping = _REWRITE_CACHE.get(_ref.hex())
        if mapping is None:
            mapping = ray.get(_ref)
            _REWRITE_CACHE[_ref.hex()] = mapping
        for col in cols:
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            enc = pc.dictionary_encode(arr)
            get = mapping.get
            mapped = pa.array(
                [get(v, v) for v in enc.dictionary.to_pylist()], type=pa.string()
            )
            t = t.set_column(t.column_names.index(col), col, mapped.take(enc.indices))
        return t

    return edges_ds.map_batches(rewrite, batch_format="pyarrow")


_REWRITE_CACHE: dict = {}
