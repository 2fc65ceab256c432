"""Distributed graph algorithms over edge Datasets — connected components,
integer-exact PageRank, degree stats, triangle counting.

The reference builds graphs for EXTERNAL engines to analyse (the Kuzu /
MemGraph runbook queries in `docs/cypher-cmds*.txt` stop at lookups and
counts); kgray keeps the analytics layer inside the engine so the KG never
has to leave Ray. Everything here follows the repo's dual-path discipline
(SURVEY §7, mirrored from the reference's ST1 broadcast-dict pattern,
`Kuzu/kuzu_build_graph_csv.py:210-239`): a broadcast path while the *node
vocabulary* fits the driver (the edge stream always stays distributed), and
a join/shuffle path past ``node_limit``.

Determinism: PageRank uses pure int64 fixed-point arithmetic (floor
division on non-negative values) so results are bit-identical regardless of
summation order, partitioning or cluster size — and exactly reproducible by
integer SQL (see ``pagerank_sql`` in ``__ray_entry__``).

Scale notes (100 TB discipline):
- ``connected_components`` streams the PAIR set; the distributed path is
  min-label propagation (one vocab-sized join + grouped-min per round,
  rounds = component diameter). The local path holds only node ids that
  appear in a pair — for dedup workloads that is the duplicate subset, not
  the corpus.
- ``pagerank``'s join path shuffles vocab-sized rank tables per iteration
  and scans the (materialized) edge stream once per iteration — the
  irreducible cost of power iteration.
- ``triangle_count`` enumerates wedges; a hot node of degree d contributes
  d^2/2 wedges. ``max_degree`` caps enumeration per node (dropped wedge
  count is reported via the returned table, never silently).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

logger = logging.getLogger(__name__)

_SCALE = 10**12
_DAMP_NUM = 850  # damping 0.85 as an exact rational, fixed-point safe
_DAMP_DEN = 1000


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _clamp_partitions(requested: int, n_rows: int, rows_per_partition: int = 4096) -> int:
    """Ray's hash join misbehaves (schema-less empty build partitions; at
    worst a hang) when key cardinality is far below num_partitions — clamp
    the partition count to the known row count so tiny inputs use tiny
    fan-outs while large inputs keep the requested parallelism. Delegates
    to ``util.join_partitions`` which additionally caps at the cluster CPU
    count (more aggregator actors than cores deadlocks small sessions)."""
    from .util import join_partitions

    return join_partitions(requested, n_rows, rows_per_partition)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def connected_components_local(
    pairs: "ray.data.Dataset | pa.Table",
    col_a: str = "doc_a",
    col_b: str = "doc_b",
) -> pa.Table:
    """Union-find over the streamed pair set; driver memory holds one dict
    entry per node THAT APPEARS IN A PAIR (the duplicate subset, typically
    orders of magnitude below the corpus). Component id = min member.

    Returns a pa.Table(id, component_id) sorted by id.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    if isinstance(pairs, pa.Table):
        batches = [pairs]
    else:
        batches = pairs.select_columns([col_a, col_b]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 18
        )
    members: set[int] = set()
    for b in batches:
        for a_, b_ in zip(b[col_a].to_pylist(), b[col_b].to_pylist()):
            members.add(a_)
            members.add(b_)
            ra, rb = find(a_), find(b_)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    ids = sorted(members)
    # int64 for int keys (back-compat, incl. the empty case); inferred
    # type otherwise so string-keyed entity merges work unchanged
    typ = (
        pa.int64()
        if not ids or isinstance(ids[0], (int, np.integer))
        else None
    )
    return pa.table(
        {
            "id": pa.array(ids, type=typ),
            "component_id": pa.array([find(i) for i in ids], type=typ),
        }
    )


def connected_components_distributed(
    pairs: ray.data.Dataset,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iters: int = 20,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Min-label propagation -> Dataset(id, component_id).

    Each round: (1) labels ride one hash join onto the symmetric edge set
    and a grouped min picks each node's best neighbour label; (2) a
    POINTER-JUMP (label <- label(label), one self-join of the vocab-sized
    label table) compresses label chains, so convergence needs O(log
    diameter) rounds instead of O(diameter) — a 30-node path closes in ~5
    rounds, and a pathological 1M-node chain in ~20. Convergence is
    detected with an order-independent label checksum (one cheap pass)
    instead of a compare join — same trick as canonicalize.py.
    """

    def sym(t: pa.Table) -> pa.Table:
        a = pc.cast(_chunked(t[col_a]), pa.int64())
        b = pc.cast(_chunked(t[col_b]), pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.select_columns([col_a, col_b]).map_batches(
        sym, batch_format="pyarrow"
    ).materialize()
    num_partitions = _clamp_partitions(num_partitions, edges.count())

    labels = edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "id": t["src"],
                "label": pc.min_element_wise(t["src"], t["nbr_min"]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    prev = _int_label_checksum(labels)

    for _ in range(max_iters):
        # neighbour labels: edges ⋈ labels on dst, min per src
        nbr = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("id",),
        )
        cand = nbr.groupby("src").aggregate(Min("label", alias_name="nbr_label"))
        merged = labels.join(
            cand.map_batches(
                lambda t: pa.table({"id": t["src"], "nbr_label": t["nbr_label"]}),
                batch_format="pyarrow",
            ),
            join_type="left_outer", num_partitions=num_partitions, on=("id",),
        )
        labels = merged.map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "label": pc.min_element_wise(
                        t["label"], pc.coalesce(t["nbr_label"], t["label"])
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        # pointer jump: label <- label(label) (label ids are node ids, so
        # the parent's label is in the same table — one self-join)
        jumped = labels.join(
            labels.map_batches(
                lambda t: pa.table({"pid": t["id"], "plabel": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="left_outer", num_partitions=num_partitions,
            on=("label",), right_on=("pid",),
        )
        labels = jumped.map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "label": pc.min_element_wise(
                        t["label"], pc.coalesce(t["plabel"], t["label"])
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        cur = _int_label_checksum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda t: pa.table({"id": t["id"], "component_id": t["label"]}),
        batch_format="pyarrow",
    )


def _int_label_checksum(labels: ray.data.Dataset) -> int:
    """Order-independent checksum over (id, label) int rows — changes
    (w.h.p.) iff any assignment changed; one streaming pass."""

    def part(t: pa.Table) -> pa.Table:
        ids = _chunked(t["id"]).to_numpy(zero_copy_only=False).astype(np.uint64)
        lab = _chunked(t["label"]).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15) + lab) * np.uint64(0xFF51AFD7ED558CCD)
        val = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pa.table({"h": pa.array([val], type=pa.uint64())})

    out = 0
    for b in labels.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v in b["h"].to_pylist():
            out ^= v
    return out


def connected_components(
    pairs: ray.data.Dataset,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    local_limit: int = 20_000_000,
    **kwargs,
) -> "pa.Table | ray.data.Dataset":
    """Size-routed: union-find on the driver while the PAIR count is
    bounded, min-label propagation (all Ray Data shuffles) above.

    Pairs are pinned once (object store; spills under pressure) so the
    count probe and the chosen path don't re-execute the upstream dedup
    pipeline."""
    pairs = pairs.materialize()
    if pairs.count() <= local_limit:
        return connected_components_local(pairs, col_a, col_b)
    return connected_components_distributed(pairs, col_a, col_b, **kwargs)


def dedup_clusters(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    local_limit: int = 20_000_000,
) -> ray.data.Dataset:
    """Pairs -> transitive clusters -> per-document verdict.

    Completes the dedup story (exact/minhash/simhash/ngram emit PAIRS;
    training pipelines need CLUSTERS and a deterministic survivor): every
    document gets (cluster_id = min doc id of its component, is_canonical =
    1 for the survivor). Unpaired documents are their own singleton
    cluster.

    The component map is keyed by paired docs only, so the broadcast path
    holds the duplicate subset — not the corpus — on the driver; above
    ``local_limit`` pairs it degrades to a left join against the
    distributed label table.
    """
    comp = connected_components(pairs, col_a, col_b, local_limit=local_limit)

    if isinstance(comp, pa.Table):
        ids = comp["id"].to_numpy(zero_copy_only=False)
        labels = comp["component_id"].to_numpy(zero_copy_only=False)
        ref = ray.put((ids, labels))

        def attach(t: pa.Table, _ref=ref) -> pa.Table:
            m_ids, m_labels = ray.get(_ref)
            d = pc.cast(_chunked(t[id_col]), pa.int64()).to_numpy(zero_copy_only=False)
            if len(m_ids) == 0:
                cluster = d
            else:
                pos = np.clip(np.searchsorted(m_ids, d), 0, len(m_ids) - 1)
                hit = m_ids[pos] == d
                cluster = np.where(hit, m_labels[pos], d)
            return pa.table(
                {
                    id_col: pa.array(d, type=pa.int64()),
                    "cluster_id": pa.array(cluster, type=pa.int64()),
                    "is_canonical": pa.array((d == cluster).astype(np.int64)),
                }
            )

        return docs.select_columns([id_col]).map_batches(attach, batch_format="pyarrow")

    comp = comp.materialize()
    out = docs.select_columns([id_col]).join(
        comp, join_type="left_outer",
        num_partitions=_clamp_partitions(16, comp.count()),
        on=(id_col,), right_on=("id",),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "cluster_id": pc.cast(
                    pc.coalesce(t["component_id"], t[id_col]), pa.int64()
                ),
                "is_canonical": pc.cast(
                    pc.equal(t[id_col], pc.coalesce(t["component_id"], t[id_col])),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# PageRank (integer fixed-point; bit-stable at any parallelism)
# ---------------------------------------------------------------------------

def _degree_partials(edges: ray.data.Dataset, col: str):
    """Per-batch (v, c) out-degree partials — the shuffle input is one row
    per distinct key per batch, not the edge stream."""

    def part(t: pa.Table) -> pa.Table:
        v = _chunked(t[col]).to_numpy(zero_copy_only=False)
        ids, counts = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(ids, type=pa.int64()), "c": pa.array(counts, type=pa.int64())}
        )

    return edges.map_batches(part, batch_format="pyarrow")


def _collect_vocab(edges: ray.data.Dataset, src: str, dst: str):
    """Driver-side (ids, outdeg) arrays — node-VOCABULARY sized (the edge
    stream is reduced to per-batch distinct partials before collection)."""
    out_parts: list[pa.Table] = []
    for b in _degree_partials(edges, src).iter_batches(batch_format="pyarrow"):
        out_parts.append(b)
    dst_parts: list[pa.Table] = []
    for b in edges.map_batches(
        lambda t: pa.table({"v": _chunked(t[dst]).unique()}), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        dst_parts.append(b)

    out_df = (
        pa.concat_tables(out_parts).to_pandas()
        if out_parts
        else pd.DataFrame({"v": [], "c": []})
    )
    outdeg = out_df.groupby("v")["c"].sum()
    dst_ids = (
        pa.concat_tables(dst_parts)["v"].to_numpy(zero_copy_only=False)
        if dst_parts
        else np.array([], dtype=np.int64)
    )
    ids = np.union1d(outdeg.index.to_numpy(dtype=np.int64), np.unique(dst_ids))
    deg = np.zeros(len(ids), dtype=np.int64)
    if len(outdeg):
        pos = np.searchsorted(ids, outdeg.index.to_numpy(dtype=np.int64))
        deg[pos] = outdeg.to_numpy(dtype=np.int64)
    return ids, deg


def pagerank(
    edges_ds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = _SCALE,
    node_limit: int = 20_000_000,
    num_buckets: int = 32,
) -> "pa.Table | ray.data.Dataset":
    """Power iteration with damping 0.85 in int64 fixed-point.

    Exact integer semantics (mirrored verbatim by the SQL oracle):
      r0(v)        = scale // N
      contrib(e)   = (r[src] * 850) // (1000 * outdeg[src])   per edge
      r'(v)        = (150 * scale) // (1000 * N) + Σ contrib(in-edges)
    Floor division on non-negative ints is associative-safe: the SUM is
    exact, so block order / partitioning / cluster size cannot change a
    single bit of the result. Dangling-node mass decays (both arms agree).

    Multi-edges each carry a contribution (edge multiplicity = mention
    weight for KG edge streams). Returns (node_id, rank_fp).

    Broadcast path: node vocabulary (ids, outdeg, ranks — three int64
    arrays) broadcast once per iteration via ray.put; the edge stream is
    scanned per iteration with per-batch bincount partials, reduced by a
    vocab-sized grouped sum. Join path above ``node_limit``: ranks live in
    a Dataset and ride hash joins — no driver-side state at all.
    """
    edges = edges_ds.select_columns([src, dst]).materialize()
    res = _pagerank_counts(edges, src, dst, iters, scale, node_limit=node_limit)
    if res is not None:
        return res
    n_nodes_probe = _vocab_count(edges, src, dst)
    if n_nodes_probe <= node_limit:
        return _pagerank_broadcast(edges, src, dst, iters, scale)
    return _pagerank_join(edges, src, dst, iters, scale, num_buckets)


def _pagerank_counts(
    edges, src, dst, iters, scale, pair_limit=5_000_000, node_limit=20_000_000
):
    """Fast path: ONE distributed reduction of the edge stream to
    (src, dst, multiplicity) per-batch partials, then every power
    iteration as exact int64 numpy over the collected count table.

    Valid because identical edges contribute identical floored values —
    ``m * ((r[s]*850) // (1000*deg[s]))`` equals summing m copies — so
    the result is bit-identical to the per-edge streaming loop while
    paying one Dataset execution instead of one per iteration (the
    per-execution fixed cost dominated the 5-iteration runtime at small
    vocabularies). Returns None (caller falls back to the streaming /
    join paths) if the partial stream exceeds ``pair_limit`` rows —
    the driver only ever holds a bounded table.
    """

    def part(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                src: pc.cast(_chunked(t[src]), pa.int64()),
                dst: pc.cast(_chunked(t[dst]), pa.int64()),
            }
        )
        return t.group_by([src, dst]).aggregate([([dst], "count")]).rename_columns(
            [src, dst, "m"]
        )

    parts: list[pa.Table] = []
    total = 0
    for b in edges.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        parts.append(b)
        total += b.num_rows
        if total > pair_limit:
            return None

    if not parts or total == 0:
        return pa.table(
            {
                "node_id": pa.array([], type=pa.int64()),
                "rank_fp": pa.array([], type=pa.int64()),
            }
        )

    df = (
        pa.concat_tables(parts)
        .to_pandas()
        .groupby([src, dst], as_index=False)["m"]
        .sum()
    )
    s = df[src].to_numpy(np.int64)
    d = df[dst].to_numpy(np.int64)
    m = df["m"].to_numpy(np.int64)
    ids = np.union1d(s, d)
    if len(ids) > node_limit:
        # honor the caller's broadcast-vs-join routing contract: past the
        # node limit ranks must live in a Dataset, not on the driver
        return None
    si = np.searchsorted(ids, s)
    di = np.searchsorted(ids, d)
    n = len(ids)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, si, m)

    ranks = np.full(n, scale // n, dtype=np.int64)
    base = (150 * scale) // (1000 * n)
    for _ in range(iters):
        c = (ranks[si] * _DAMP_NUM) // (_DAMP_DEN * deg[si]) * m
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, di, c)
        ranks = base + acc

    return pa.table(
        {
            "node_id": pa.array(ids, type=pa.int64()),
            "rank_fp": pa.array(ranks, type=pa.int64()),
        }
    )


def _vocab_count(edges, src, dst) -> int:
    parts = edges.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        pc.cast(_chunked(t[src]).unique(), pa.int64()),
                        pc.cast(_chunked(t[dst]).unique(), pa.int64()),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
    )
    seen: set[int] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        seen.update(b["v"].to_pylist())
        if len(seen) > 50_000_000:
            # probe only needs "above node_limit?" — stop growing the set
            break
    return len(seen)


def _pagerank_broadcast(edges, src, dst, iters, scale) -> pa.Table:
    ids, deg = _collect_vocab(edges, src, dst)
    n = len(ids)
    if n == 0:
        return pa.table(
            {"node_id": pa.array([], type=pa.int64()), "rank_fp": pa.array([], type=pa.int64())}
        )
    ranks = np.full(n, scale // n, dtype=np.int64)
    base = (150 * scale) // (1000 * n)

    for _ in range(iters):
        ref = ray.put((ids, ranks, deg))

        def contrib(t: pa.Table, _ref=ref) -> pa.Table:
            m_ids, m_ranks, m_deg = ray.get(_ref)
            s = pc.cast(_chunked(t[src]), pa.int64()).to_numpy(zero_copy_only=False)
            d = pc.cast(_chunked(t[dst]), pa.int64()).to_numpy(zero_copy_only=False)
            si = np.searchsorted(m_ids, s)
            di = np.searchsorted(m_ids, d)
            c = (m_ranks[si] * _DAMP_NUM) // (_DAMP_DEN * m_deg[si])
            # NOT np.bincount(weights=...): float64 weights would break the
            # exact-integer contract — accumulate with int64 add.at
            acc = np.zeros(len(m_ids), dtype=np.int64)
            np.add.at(acc, di, c)
            nz = np.nonzero(acc)[0]
            return pa.table(
                {
                    "v": pa.array(m_ids[nz], type=pa.int64()),
                    "m": pa.array(acc[nz], type=pa.int64()),
                }
            )

        inflow = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(contrib, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            v = b["v"].to_numpy(zero_copy_only=False)
            m = b["m"].to_numpy(zero_copy_only=False)
            # iter_batches can concat partials from several tasks into one
            # batch, so v may repeat — fancy-index += would drop repeats
            np.add.at(inflow, np.searchsorted(ids, v), m)
        ranks = base + inflow

    return pa.table(
        {"node_id": pa.array(ids, type=pa.int64()), "rank_fp": pa.array(ranks, type=pa.int64())}
    )


def _pagerank_join(edges, src, dst, iters, scale, num_buckets) -> ray.data.Dataset:
    """Fully distributed power iteration: ranks live in a Dataset; per
    iteration one hash join (edge ⋈ rank on src) + one bucketed grouped
    sum (vocab-sized) + one left join onto the node table."""
    from .relational import hash_bucketed_groupby

    num_buckets = _clamp_partitions(num_buckets, edges.count())
    outdeg = _degree_partials(edges, src)
    outdeg = hash_bucketed_groupby(
        outdeg,
        ["v"],
        lambda df: df.groupby("v", as_index=False)["c"].sum(),
        num_buckets,
    ).materialize()

    dsts = edges.map_batches(
        lambda t: pa.table({"v": pc.cast(_chunked(t[dst]).unique(), pa.int64())}),
        batch_format="pyarrow",
    )
    nodes = hash_bucketed_groupby(
        outdeg.select_columns(["v"]).union(dsts),
        ["v"],
        lambda df: df.drop_duplicates("v"),
        num_buckets,
    ).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node_id": pa.array([], type=pa.int64()), "rank_fp": pa.array([], type=pa.int64())}
            )
        )
    base = (150 * scale) // (1000 * n)
    r0 = scale // n

    # edges with the src out-degree attached once (reused every iteration)
    edeg = edges.join(
        outdeg.map_batches(
            lambda t: pa.table({"v": t["v"], "outdeg": t["c"]}), batch_format="pyarrow"
        ),
        join_type="inner", num_partitions=num_buckets, on=(src,), right_on=("v",),
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "v": pc.cast(t["v"], pa.int64()),
                "r": pa.array(np.full(len(t), r0, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        j = edeg.join(
            ranks, join_type="inner", num_partitions=num_buckets,
            on=(src,), right_on=("v",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = _chunked(t["r"]).to_numpy(zero_copy_only=False)
            od = _chunked(t["outdeg"]).to_numpy(zero_copy_only=False)
            d = pc.cast(_chunked(t[dst]), pa.int64()).to_numpy(zero_copy_only=False)
            c = (r * _DAMP_NUM) // (_DAMP_DEN * od)
            ids_, inv = np.unique(d, return_inverse=True)
            acc = np.zeros(len(ids_), dtype=np.int64)
            np.add.at(acc, inv, c)
            return pa.table(
                {"v": pa.array(ids_, type=pa.int64()), "m": pa.array(acc, type=pa.int64())}
            )

        inflow = hash_bucketed_groupby(
            j.map_batches(contrib, batch_format="pyarrow"),
            ["v"],
            lambda df: df.groupby("v", as_index=False)["m"].sum(),
            num_buckets,
        )
        merged = nodes.join(
            inflow, join_type="left_outer", num_partitions=num_buckets, on=("v",),
        )
        ranks = merged.map_batches(
            lambda t: pa.table(
                {
                    "v": pc.cast(t["v"], pa.int64()),
                    "r": pc.add(
                        pc.cast(pc.coalesce(t["m"], pa.scalar(0, pa.int64())), pa.int64()),
                        pa.scalar(base, pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node_id": t["v"], "rank_fp": t["r"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# degree stats + triangles
# ---------------------------------------------------------------------------

def node_degrees(
    edges_ds: ray.data.Dataset, src: str = "src", dst: str = "dst",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(node_id, out_deg, in_deg) counting multi-edges; one bucketed
    shuffle over per-batch partials."""
    from .relational import hash_bucketed_groupby

    def part(t: pa.Table) -> pa.Table:
        s = pc.cast(_chunked(t[src]), pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(_chunked(t[dst]), pa.int64()).to_numpy(zero_copy_only=False)
        sv, sc = np.unique(s, return_counts=True)
        dv, dc = np.unique(d, return_counts=True)
        return pa.table(
            {
                "node_id": pa.array(np.concatenate([sv, dv]), type=pa.int64()),
                "out_deg": pa.array(
                    np.concatenate([sc, np.zeros(len(dv), dtype=np.int64)]), type=pa.int64()
                ),
                "in_deg": pa.array(
                    np.concatenate([np.zeros(len(sv), dtype=np.int64), dc]), type=pa.int64()
                ),
            }
        )

    partials = edges_ds.select_columns([src, dst]).map_batches(
        part, batch_format="pyarrow"
    )
    return hash_bucketed_groupby(
        partials,
        ["node_id"],
        lambda df: df.groupby("node_id", as_index=False)[["out_deg", "in_deg"]].sum(),
        num_buckets,
    )


def undirected_distinct_edges(
    edges_ds: ray.data.Dataset, src: str = "src", dst: str = "dst",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Normalize to (a < b), drop self-loops, distinct — the simple-graph
    projection used by triangle counting."""
    from .relational import hash_bucketed_groupby

    def norm(t: pa.Table) -> pa.Table:
        s = pc.cast(_chunked(t[src]), pa.int64())
        d = pc.cast(_chunked(t[dst]), pa.int64())
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        keep = pc.not_equal(a, b)
        tbl = pa.table({"a": a, "b": b}).filter(keep)
        # per-batch distinct combiner before the keyed shuffle
        return tbl.group_by(["a", "b"]).aggregate([])

    normed = edges_ds.select_columns([src, dst]).map_batches(
        norm, batch_format="pyarrow"
    )
    return hash_bucketed_groupby(
        normed, ["a", "b"], lambda df: df.drop_duplicates(), num_buckets
    )


def k_core(
    edges_ds: ray.data.Dataset,
    k: int = 5,
    src: str = "src",
    dst: str = "dst",
    edge_broadcast_limit: int = 50_000_000,
    max_rounds: int = 64,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """k-core decomposition by iterative peel: drop every node of degree
    < k from the simple undirected projection, recompute degrees, repeat
    to fixpoint — the density filter a graph-curation pass runs before
    embedding training (peripheral nodes contribute noise walks).

    Dual path, routed by the DISTINCT edge count (cheap: the projection
    is materialized):

    - under ``edge_broadcast_limit``: per-round degree partials (node-
      bounded per block) fold on the driver, the keep-set broadcasts via
      ``ray.put``, and the peel is one vectorized ``is_in`` filter pass
      per round — no shuffles inside the loop;
    - beyond it: degrees reduce via ``grouped_agg`` and the peel is two
      keep-set hash joins per round; nothing node- or edge-scale touches
      the driver. Bit-parity with the driver path is tested with a
      forced limit of 0.

    Peeling a converged core is the identity, so extra rounds are
    harmless (the SQL mirror relies on this: it unrolls a fixed round
    count ≥ the fixture's convergence depth). Returns
    Dataset(node_id, core_deg) — the k-core members with their degree
    inside the core.
    """
    e = undirected_distinct_edges(edges_ds, src, dst, num_buckets).materialize()
    if e.count() > edge_broadcast_limit:
        return _k_core_joined(e, k, max_rounds, num_buckets)

    def part(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                _chunked(t["a"]).to_numpy(zero_copy_only=False),
                _chunked(t["b"]).to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        v, c = np.unique(both, return_counts=True)
        return pa.table({"v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    def fold_degrees(ds):
        acc: dict = {}
        for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 18
        ):
            for v, c in zip(
                b["v"].to_numpy(zero_copy_only=False),
                b["c"].to_numpy(zero_copy_only=False),
            ):
                acc[int(v)] = acc.get(int(v), 0) + int(c)
        return acc

    deg = fold_degrees(e)
    for _ in range(max_rounds):
        keep = np.array(
            sorted(v for v, c in deg.items() if c >= k), dtype=np.int64
        )
        if len(keep) == len(deg):
            break
        ref = ray.put(keep)

        def peel(t: pa.Table, _ref=ref) -> pa.Table:
            kp = pa.array(ray.get(_ref))
            m = pc.and_(
                pc.is_in(_chunked(t["a"]), value_set=kp),
                pc.is_in(_chunked(t["b"]), value_set=kp),
            )
            return t.filter(m)

        e = e.map_batches(peel, batch_format="pyarrow").materialize()
        deg = fold_degrees(e)

    nodes = np.array(sorted(deg), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "node_id": pa.array(nodes),
                "core_deg": pa.array(
                    np.array([deg[int(v)] for v in nodes], dtype=np.int64)
                ),
            }
        )
    )


def _k_core_joined(
    e: ray.data.Dataset, k: int, max_rounds: int, num_buckets: int
) -> ray.data.Dataset:
    """The beyond-broadcast peel: grouped degree reduce + two keep-set
    SEMI joins per round; terminates when the edge count stops falling.

    The peel uses ``relational.semi_join`` (size-routed membership
    filter / bloom-prefiltered marker join), NOT Ray's hash ``join``:
    map_groups reducers and hash-join outputs emit schema-less empty
    blocks for empty partitions, those blocks BYPASS map_batches (so no
    normalization pass can repair them), and pyarrow's acero join
    rejects any side containing one. The marker machinery never feeds
    acero, so it is immune."""
    from ray.data.aggregate import Sum

    from .relational import semi_join

    def part(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                _chunked(t["a"]).to_numpy(zero_copy_only=False),
                _chunked(t["b"]).to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        v, c = np.unique(both, return_counts=True)
        return pa.table({"v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    def degrees(ds):
        return (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("c", alias_name="deg"))
        )

    empty = ray.data.from_arrow(
        pa.table(
            {
                "node_id": pa.array([], type=pa.int64()),
                "core_deg": pa.array([], type=pa.int64()),
            }
        )
    )

    prev = e.count()
    for _ in range(max_rounds):
        if prev == 0:
            return empty
        keep = degrees(e).map_batches(
            lambda t: t.filter(pc.greater_equal(_chunked(t["deg"]), k)).select(
                ["v"]
            ),
            batch_format="pyarrow",
        ).materialize()  # probed by BOTH semi joins — never recompute
        if keep.count() == 0:
            return empty
        e = semi_join(e, keep, on="a", right_on="v")
        e = semi_join(e, keep, on="b", right_on="v").materialize()
        n = e.count()
        if n == prev:
            break
        prev = n

    if e.count() == 0:
        return empty
    return degrees(e).map_batches(
        lambda t: pa.table(
            {
                "node_id": _chunked(t["v"]),
                "core_deg": pc.cast(_chunked(t["deg"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def triangle_count(
    edges_ds: ray.data.Dataset, src: str = "src", dst: str = "dst",
    num_partitions: int = 16,
) -> pa.Table:
    """Exact triangle count on the simple undirected projection.

    Wedge enumeration on ordered edges: (a<b) ⋈ (b<c) on b gives each
    candidate wedge a<b<c exactly once; a semi-join of the (a, c) legs
    against the edge set closes the triangles. Returns one row
    {n_triangles}. At scale the wedge stream is the quadratic term —
    partition-by-b keeps it distributed; cap hub degrees upstream if a
    single b's wedge set cannot fit one task.
    """
    e = undirected_distinct_edges(edges_ds, src, dst).materialize()
    num_partitions = _clamp_partitions(num_partitions, e.count())

    wedges = e.join(
        e.map_batches(
            lambda t: pa.table({"b2": t["a"], "c": t["b"]}), batch_format="pyarrow"
        ),
        join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("b2",),
    )
    from .relational import semi_join

    closed = semi_join(
        wedges.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"], "k": _pair_key(t["a"], t["c"])}),
            batch_format="pyarrow",
        ),
        e.map_batches(
            lambda t: pa.table({"k": _pair_key(t["a"], t["b"])}), batch_format="pyarrow"
        ),
        on="k",
    )
    n = closed.count()
    return pa.table({"n_triangles": pa.array([n], type=pa.int64())})


def clustering_coefficients(
    edges_ds: ray.data.Dataset, src: str = "src", dst: str = "dst",
    num_partitions: int = 16,
    broadcast_limit: int = 5_000_000,
    wedge_cap: int = 200_000_000,
) -> ray.data.Dataset:
    """Per-node local clustering coefficient over the simple undirected
    projection: coeff(v) = 2 * triangles_at(v) / (deg(v) * (deg(v)-1)),
    emitted as INTEGER ppm (floor) so the SQL mirror hash-matches.
    Degree-<2 nodes (undefined denominator) are excluded.

    Dual-path (the engine-wide size-routing discipline): a distinct
    undirected edge set under ``broadcast_limit`` whose wedge count
    (computed EXACTLY from endpoint multiplicities before any join)
    stays under ``wedge_cap`` runs driver-local — one acero wedge join
    + an int64 ``is_in`` closure + numpy unique counts — because the
    distributed plan's five exchanges dwarf dimension-sized graphs.
    Past either cap: ``triangle_count``'s wedge enumeration (ordered
    edges joined on the middle node, (a, c) legs closed by a semi-join)
    carrying all three corners; per-node triangle and degree counts are
    per-batch numpy partials folded by ONE bucketed shuffle each; the
    final coeff is a node-keyed left join (triangle nodes are a subset
    of degree->=2 nodes) — node-bounded, never corpus-bounded. The two
    arms are parity-tested (tests/test_graphalgo.py)."""
    e = undirected_distinct_edges(edges_ds, src, dst).materialize()
    n_e = e.count()
    if n_e <= broadcast_limit:
        batches = list(e.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        tbl = (
            pa.concat_tables(batches).combine_chunks()
            if batches else pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        )
        a = pc.cast(_chunked(tbl["a"]), pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(_chunked(tbl["b"]), pa.int64()).to_numpy(zero_copy_only=False)
        # exact wedge count: rows pair up wherever some edge's b equals
        # another edge's a — sum of multiplicity products per shared node
        bv, bc = np.unique(b, return_counts=True)
        av, ac = np.unique(a, return_counts=True)
        pos = np.searchsorted(av, bv)
        pos_ok = (pos < len(av)) & (av[np.clip(pos, 0, max(len(av) - 1, 0))] == bv)
        n_wedges = int(np.sum(bc[pos_ok] * ac[pos[pos_ok]])) if len(av) else 0
        if n_wedges <= wedge_cap:
            return ray.data.from_arrow(_clustering_local(tbl, a, b))
        logger.warning(
            "clustering_coefficients: %d wedges exceed wedge_cap=%d; "
            "using the distributed plan", n_wedges, wedge_cap,
        )
    num_partitions = _clamp_partitions(num_partitions, n_e)

    wedges = e.join(
        e.map_batches(
            lambda t: pa.table({"b2": t["a"], "c": t["b"]}), batch_format="pyarrow"
        ),
        join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("b2",),
    )
    from .relational import grouped_agg, semi_join

    closed = semi_join(
        wedges.map_batches(
            lambda t: pa.table(
                {"a": t["a"], "b": t["b"], "c": t["c"],
                 "k": _pair_key(t["a"], t["c"])}
            ),
            batch_format="pyarrow",
        ),
        e.map_batches(
            lambda t: pa.table({"k": _pair_key(t["a"], t["b"])}), batch_format="pyarrow"
        ),
        on="k",
    )

    def tri_part(t: pa.Table) -> pa.Table:
        corners = np.concatenate(
            [
                pc.cast(_chunked(t[c]), pa.int64()).to_numpy(zero_copy_only=False)
                for c in ("a", "b", "c")
            ]
        )
        v, n = np.unique(corners, return_counts=True)
        return pa.table(
            {"node": pa.array(v, pa.int64()),
             "n_tri": pa.array(n.astype(np.int64), pa.int64())}
        )

    tri = grouped_agg(
        closed.map_batches(tri_part, batch_format="pyarrow"),
        keys=["node"], sums={"n_tri": "n_tri"},
    )

    def deg_part(t: pa.Table) -> pa.Table:
        ends = np.concatenate(
            [
                pc.cast(_chunked(t[c]), pa.int64()).to_numpy(zero_copy_only=False)
                for c in ("a", "b")
            ]
        )
        v, n = np.unique(ends, return_counts=True)
        return pa.table(
            {"node": pa.array(v, pa.int64()),
             "degree": pa.array(n.astype(np.int64), pa.int64())}
        )

    deg = grouped_agg(
        e.map_batches(deg_part, batch_format="pyarrow"),
        keys=["node"], sums={"degree": "degree"},
    ).map_batches(
        lambda t: t.filter(
            pc.greater_equal(pc.cast(_chunked(t["degree"]), pa.int64()), 2)
        ),
        batch_format="pyarrow",
    ).materialize()

    tri = tri.materialize()
    joined = (
        deg if tri.count() == 0
        else deg.join(
            tri, join_type="left_outer",
            num_partitions=_clamp_partitions(num_partitions, deg.count()),
            on=("node",),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(_chunked(t["degree"]), pa.int64())
        n = (
            pc.fill_null(pc.cast(_chunked(t["n_tri"]), pa.int64()), 0)
            if "n_tri" in t.column_names
            else pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        )
        denom = pc.multiply(d, pc.subtract(d, pa.scalar(1, pa.int64())))
        coeff = pc.divide(
            pc.multiply(n, pa.scalar(2_000_000, pa.int64())), denom
        )
        return pa.table(
            {"node": t["node"], "degree": d, "n_tri": n, "coeff_ppm": coeff}
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _clustering_local(tbl: pa.Table, a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Driver-local arm of ``clustering_coefficients``: one acero wedge
    join, an int64 ``is_in`` closure, numpy unique counts."""
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "degree": pa.array([], pa.int64()),
            "n_tri": pa.array([], pa.int64()),
            "coeff_ppm": pa.array([], pa.int64()),
        }
    )
    if len(a) == 0:
        return empty
    ends, deg_all = np.unique(np.concatenate([a, b]), return_counts=True)
    keep = deg_all >= 2
    nodes, deg = ends[keep], deg_all[keep].astype(np.int64)
    if len(nodes) == 0:
        return empty
    wedges = tbl.join(
        pa.table({"b": tbl["a"], "c": tbl["b"]}), keys=["b"], join_type="inner"
    )
    closed = wedges.filter(
        pc.is_in(
            _pair_key(wedges["a"], wedges["c"]),
            value_set=_pair_key(tbl["a"], tbl["b"]),
        )
    )
    corners = np.concatenate(
        [
            pc.cast(_chunked(closed[c]), pa.int64()).to_numpy(zero_copy_only=False)
            for c in ("a", "b", "c")
        ]
    )
    tri_v, tri_n = np.unique(corners, return_counts=True)
    n_tri = np.zeros(len(nodes), dtype=np.int64)
    # every triangle corner has degree >= 2, so tri_v is a subset of nodes
    n_tri[np.searchsorted(nodes, tri_v)] = tri_n.astype(np.int64)
    coeff = (2 * n_tri * 1_000_000) // (deg * (deg - 1))
    return pa.table(
        {
            "node": pa.array(nodes.astype(np.int64), pa.int64()),
            "degree": pa.array(deg, pa.int64()),
            "n_tri": pa.array(n_tri, pa.int64()),
            "coeff_ppm": pa.array(coeff, pa.int64()),
        }
    )


def _pair_key(a, b) -> pa.Array:
    """(a, b) -> single int64 join key: a * 2^31 + b (node ids must fit
    31 bits; assert upstream for the test corpora)."""
    a64 = pc.cast(_chunked(a), pa.int64())
    b64 = pc.cast(_chunked(b), pa.int64())
    return pc.add(pc.multiply(a64, pa.scalar(1 << 31, pa.int64())), b64)


def bfs_distances(
    edges_ds: ray.data.Dataset,
    source: int,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    frontier_limit: int = 50_000_000,
) -> pa.Table:
    """BFS distance labels (hop counts) from ``source`` over the directed
    edge stream, out to ``max_hops`` — iterative frontier expansion, the
    k-hop generalization of the two-hop neighborhood audit.

    Each hop is ONE vectorized pass over the edge stream: the frontier id
    set is broadcast (``ray.put``) and every batch emits the unique
    successors of frontier rows (``pc.is_in`` + filter + unique) — no
    shuffle at any hop. The visited map lives on the driver and is
    node-VOCABULARY sized; past ``frontier_limit`` the SAME expansion
    re-runs as ``_bfs_distances_joined`` — a per-hop semi-join frontier
    with a distributed visited set (parity-tested bit-for-bit) — so a
    graph whose reachable set outgrows the driver degrades to the scale
    path instead of failing.

    The source row is always emitted with dist 0, reachable or not (the
    SQL mirror seeds its recursion the same way).
    """
    edges = edges_ds.select_columns([src, dst]).materialize()
    if frontier_limit <= 1:  # forced scale path (tests / tiny budgets)
        return _bfs_distances_joined(edges, source, max_hops, src, dst)
    dist: dict[int, int] = {int(source): 0}
    frontier = [int(source)]

    for d in range(1, max_hops + 1):
        ref = ray.put(pa.array(frontier, type=pa.int64()))

        def nexts(t: pa.Table, _ref=ref) -> pa.Table:
            fa = ray.get(_ref)
            s = pc.cast(_chunked(t[src]), pa.int64())
            hit = pc.is_in(s, value_set=fa)
            return pa.table(
                {"v": pc.cast(_chunked(t[dst]), pa.int64()).filter(hit).unique()}
            )

        found: set[int] = set()
        for b in edges.map_batches(nexts, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            found.update(b["v"].to_pylist())
        frontier = [v for v in found if v not in dist]
        if not frontier:
            break
        if len(dist) + len(frontier) > frontier_limit:
            # restart distributed rather than die: one wasted prefix, but
            # the violation is discovered at most once per graph
            logger.warning(
                "bfs visited set passed frontier_limit=%d at hop %d; "
                "restarting with the join-based frontier", frontier_limit, d,
            )
            return _bfs_distances_joined(edges, source, max_hops, src, dst)
        for v in frontier:
            dist[v] = d

    nodes = sorted(dist)
    return pa.table(
        {
            "node_id": pa.array(nodes, type=pa.int64()),
            "dist": pa.array([dist[v] for v in nodes], type=pa.int64()),
        }
    )


def _bfs_distances_joined(
    edges: ray.data.Dataset,
    source: int,
    max_hops: int,
    src: str,
    dst: str,
) -> pa.Table:
    """Beyond-broadcast BFS: frontier and visited set are DATASETS.
    Per hop: semi-join the edge stream on the frontier (bloom-prefiltered
    marker join — the edge stream is never collected), bucketed-distinct
    the successors, anti-join against the visited set, tag with the hop
    distance and union into it. Bit-identical to the broadcast path
    (tests/test_graphalgo.py)."""
    from .relational import anti_join, hash_bucketed_groupby, semi_join

    seed = pa.table(
        {
            "node_id": pa.array([int(source)], type=pa.int64()),
            "dist": pa.array([0], type=pa.int64()),
        }
    )
    visited = ray.data.from_arrow(seed).materialize()
    frontier = ray.data.from_arrow(seed.select(["node_id"])).materialize()

    for d in range(1, max_hops + 1):
        succ = semi_join(edges, frontier, on=src, right_on="node_id")
        succ = succ.map_batches(
            lambda t: pa.table(
                {"node_id": pc.cast(_chunked(t[dst]), pa.int64()).unique()}
            ),
            batch_format="pyarrow",
        )
        succ = hash_bucketed_groupby(
            succ, ["node_id"], lambda df: df.drop_duplicates(), num_buckets=16
        )
        fresh = anti_join(succ, visited, "node_id", "node_id").materialize()
        if fresh.count() == 0:
            break
        tagged = fresh.map_batches(
            lambda t, _d=d: pa.table(
                {
                    "node_id": _chunked(t["node_id"]),
                    "dist": pa.array(np.full(len(t), _d, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        visited = visited.union(tagged).materialize()
        frontier = fresh

    tbl = pa.concat_tables(
        visited.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    return tbl.sort_by([("node_id", "ascending")])


def sssp_khop(
    edges_ds: ray.data.Dataset,
    source: int,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    frontier_limit: int = 50_000_000,
) -> pa.Table:
    """Weighted single-source shortest paths, bounded to ``max_hops``
    edges — ``max_hops`` rounds of Bellman-Ford relaxation over the
    directed edge stream with int64 weights. dist(v) = min total weight
    over paths of <= ``max_hops`` edges, so the result is a pure
    function of the graph (exact integer arithmetic, no float
    summation-order drift) and a recursive-CTE SQL mirror reproduces it
    bit-for-bit. Parallel edges are harmless (MIN absorbs them) — no
    distinct pre-shuffle is needed.

    Dual-path like ``bfs_distances``: while the settled-node map fits
    the driver, each round is ONE vectorized edge-stream pass (frontier
    dists broadcast via ``ray.put``, per-batch searchsorted lookup +
    grouped min over successors — no shuffle). Past ``frontier_limit``
    (or when it is forced <= 1) the SAME relaxation runs distributed:
    frontier dists ride a size-routed inner join onto the edge stream,
    candidates reduce by grouped min, and a node-keyed bucketed merge
    against the visited table keeps only improvements. Parity-tested
    bit-for-bit (tests/test_graphalgo.py).

    The source row is always emitted with dist 0, reachable or not.
    """
    edges = edges_ds.select_columns([src, dst, weight]).materialize()
    if frontier_limit <= 1:  # forced scale path (tests / tiny budgets)
        return _sssp_khop_joined(edges, source, max_hops, src, dst, weight)

    dist: dict[int, int] = {int(source): 0}
    frontier: dict[int, int] = {int(source): 0}

    for _ in range(max_hops):
        fn = np.array(sorted(frontier), dtype=np.int64)
        fd = np.array([frontier[v] for v in fn], dtype=np.int64)
        ref = ray.put((fn, fd))

        def relax(t: pa.Table, _ref=ref) -> pa.Table:
            nodes, dists = ray.get(_ref)
            s = pc.cast(_chunked(t[src]), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            idx = np.searchsorted(nodes, s)
            idx[idx >= len(nodes)] = 0
            hit = nodes[idx] == s
            if not hit.any():
                return pa.table(
                    {
                        "v": pa.array([], type=pa.int64()),
                        "cand": pa.array([], type=pa.int64()),
                    }
                )
            w = pc.cast(_chunked(t[weight]), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            d = pc.cast(_chunked(t[dst]), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            cand = pa.table(
                {
                    "v": pa.array(d[hit]),
                    "cand": pa.array(dists[idx[hit]] + w[hit]),
                }
            )
            return (
                cand.group_by("v")
                .aggregate([("cand", "min")])
                .rename_columns(["v", "cand"])
            )

        vs_parts, cs_parts = [], []
        for b in edges.map_batches(relax, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows:
                vs_parts.append(b["v"].to_numpy(zero_copy_only=False))
                cs_parts.append(b["cand"].to_numpy(zero_copy_only=False))
        if not vs_parts:
            break
        # ONE C-level grouped min over all per-batch partials (int64
        # stays int64 — no NaN enters), then a single pass over unique
        # candidate nodes for the dict compare (the same driver-fold
        # cost class as bfs_distances' visited update)
        mins = (
            pd.Series(np.concatenate(cs_parts))
            .groupby(pd.Series(np.concatenate(vs_parts)), sort=False)
            .min()
        )
        frontier = {
            int(v): int(c)
            for v, c in mins.items()
            if c < dist.get(int(v), c + 1)
        }
        if not frontier:
            break
        if len(dist) + len(frontier) > frontier_limit:
            logger.warning(
                "sssp settled set passed frontier_limit=%d; restarting "
                "with the join-based relaxation", frontier_limit,
            )
            return _sssp_khop_joined(edges, source, max_hops, src, dst, weight)
        dist.update(frontier)

    nodes_out = sorted(dist)
    return pa.table(
        {
            "node_id": pa.array(nodes_out, type=pa.int64()),
            "dist": pa.array([dist[v] for v in nodes_out], type=pa.int64()),
        }
    )


def _sssp_khop_joined(
    edges: ray.data.Dataset,
    source: int,
    max_hops: int,
    src: str,
    dst: str,
    weight: str,
) -> pa.Table:
    """Beyond-broadcast SSSP: dist tables are DATASETS. Per round: the
    frontier's dists ride a size-routed inner join onto the edge stream
    (``broadcast_lookup_join`` — broadcast while small, hash join past
    its limit), candidates reduce by one grouped min per successor, and
    a node-keyed bucketed merge against the visited table emits the new
    dist + improvement flag. Bit-identical to the broadcast path."""
    from .relational import (
        broadcast_lookup_join,
        grouped_agg,
        hash_bucketed_groupby,
    )

    seed = pa.table(
        {
            "node_id": pa.array([int(source)], type=pa.int64()),
            "__d": pa.array([0], type=pa.int64()),
        }
    )
    visited = ray.data.from_arrow(seed).materialize()
    frontier = visited

    for _ in range(max_hops):
        touched = broadcast_lookup_join(
            edges, frontier, fact_key=src, dim_key="node_id",
            take_cols=["__d"], how="inner",
        )

        def cand_batch(t: pa.Table) -> pa.Table:
            c = pc.add(
                pc.cast(_chunked(t["__d"]), pa.int64()),
                pc.cast(_chunked(t[weight]), pa.int64()),
            )
            out = pa.table(
                {"node_id": pc.cast(_chunked(t[dst]), pa.int64()), "cand": c}
            )
            return (
                out.group_by("node_id")
                .aggregate([("cand", "min")])
                .rename_columns(["node_id", "cand"])
            )

        cands = grouped_agg(
            touched.map_batches(cand_batch, batch_format="pyarrow"),
            keys=["node_id"], mins={"cand": "cand"},
        )
        tagged = visited.map_batches(
            lambda t: pa.table(
                {
                    "node_id": pc.cast(_chunked(t["node_id"]), pa.int64()),
                    "d": pc.cast(_chunked(t["__d"]), pa.int64()),
                    "tag": pa.array(np.zeros(len(t), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ).union(
            cands.map_batches(
                lambda t: pa.table(
                    {
                        "node_id": pc.cast(_chunked(t["node_id"]), pa.int64()),
                        "d": pc.cast(_chunked(t["cand"]), pa.int64()),
                        "tag": pa.array(np.ones(len(t), dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            # int64-exact merge (no outer-join NaN/float64 round trip, so
            # dists >= 2^53 stay bit-identical to the broadcast path):
            # the new dist is the min over ALL of a node's rows — every
            # node has at least one — and the previous dist rides along
            # as an int64 max-sentinel where the node is newly reached
            d = df["d"].to_numpy()
            old_d = np.where(
                df["tag"].to_numpy() == 0, d, np.iinfo(np.int64).max
            )
            g = (
                pd.DataFrame(
                    {
                        "node_id": df["node_id"].to_numpy(),
                        "__d": d,
                        "__old": old_d,
                    }
                )
                .groupby("node_id", sort=False, as_index=False)
                .min()
            )
            g["improved"] = g["__d"] < g["__old"]
            return g[["node_id", "__d", "improved"]]

        merged = hash_bucketed_groupby(
            tagged, ["node_id"], merge, num_buckets=16
        ).materialize()
        frontier = merged.map_batches(
            lambda t: t.filter(_chunked(t["improved"])).select(
                ["node_id", "__d"]
            ),
            batch_format="pyarrow",
        ).materialize()
        visited = merged.select_columns(["node_id", "__d"]).materialize()
        if frontier.count() == 0:
            break

    tbl = pa.concat_tables(
        visited.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    ).rename_columns(["node_id", "dist"])
    return tbl.sort_by([("node_id", "ascending")])


_STEP_MIX = 2654435769  # second odd Weyl constant for the walk-step mix


def _walk_step_hash(node: np.ndarray, step: int) -> np.ndarray:
    """The walk recurrence's per-(node, step) hash — shared by the
    broadcast-CSR and distributed-join paths so they are bit-identical."""
    from .sampling import KNUTH, MOD32

    return (
        node.astype(np.int64) * np.int64(KNUTH)
        + np.int64(step) * np.int64(_STEP_MIX)
    ) % np.int64(MOD32)


def random_walks(
    edges: ray.data.Dataset,
    walk_len: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    adjacency_broadcast_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """DeepWalk-style walk corpus, DETERMINISTIC: from every node with
    out-edges, a ``walk_len``-step walk whose step t moves to neighbor
    number ``h(v, t) mod outdeg(v)`` in the dst-sorted adjacency — a hash
    replaces the RNG (the sampling-for-embeddings analog of
    ``hash_sample``), so the corpus is reproducible at any parallelism
    and in SQL. Dead ends stop a walk early.

    The dst-sorted DISTINCT adjacency broadcasts as CSR arrays under
    ``adjacency_broadcast_limit`` edges; every walk then runs vectorized
    with zero shuffles — step t is one searchsorted + gather. Beyond the
    limit ``_random_walks_joined`` runs the identical recurrence as
    ``walk_len`` current-node-keyed hash joins against per-step
    transition tables (the standard distributed walk plan) — the chosen
    neighbor depends only on (node, step), so each step's transition is
    a per-ROW filter of the ranked adjacency, and the only per-step
    shuffle is one node-sized hash join. Parity-tested against the
    broadcast path (tests/test_graphalgo.py).

    Emits (walk_id = start node, step 0..walk_len, node).
    """
    import ray as _ray

    from .relational import hash_bucketed_groupby

    def dedup_batch(t: pa.Table) -> pa.Table:
        # arrow-native per-batch distinct (a group_by over the two key
        # columns with no aggregates) — no pandas round-trip
        return t.select([src_col, dst_col]).group_by(
            [src_col, dst_col]
        ).aggregate([])

    distinct = hash_bucketed_groupby(
        edges.map_batches(dedup_batch, batch_format="pyarrow"),
        [src_col, dst_col],
        lambda df: df.drop_duplicates(),
        num_buckets=32,
    ).materialize()
    if distinct.count() > adjacency_broadcast_limit:
        return _random_walks_joined(distinct, walk_len, src_col, dst_col)
    srcs_l, dsts_l = [], []
    for b in distinct.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        srcs_l.append(_chunked(b[src_col]).to_numpy(zero_copy_only=False))
        dsts_l.append(_chunked(b[dst_col]).to_numpy(zero_copy_only=False))
    srcs = np.concatenate(srcs_l).astype(np.int64, copy=False)
    dsts = np.concatenate(dsts_l).astype(np.int64, copy=False)
    order = np.lexsort((dsts, srcs))
    srcs, dsts = srcs[order], dsts[order]
    uniq, first = np.unique(srcs, return_index=True)
    counts = np.diff(np.append(first, len(srcs)))
    ref = _ray.put(
        (uniq, first.astype(np.int64), counts.astype(np.int64), dsts)
    )

    def walk(df) -> pa.Table:
        u, st, cn, ds_ = _ray.get(ref)
        start = np.unique(df[src_col].to_numpy(np.int64))
        parts = [(start, np.zeros(len(start), dtype=np.int64), start)]
        cur, wid = start, start
        for step in range(1, walk_len + 1):
            pos = np.searchsorted(u, cur)
            posc = np.clip(pos, 0, max(len(u) - 1, 0))
            has = (pos < len(u)) & (u[posc] == cur)
            if not has.any():
                break
            h = _walk_step_hash(cur, step)
            idx = st[posc] + (h % np.maximum(cn[posc], 1))
            nxt = ds_[np.clip(idx, 0, len(ds_) - 1)]
            cur, wid = nxt[has], wid[has]
            parts.append((wid, np.full(len(wid), step, dtype=np.int64), cur))
        return pa.table(
            {
                "walk_id": pa.array(np.concatenate([p[0] for p in parts])),
                "step": pa.array(np.concatenate([p[1] for p in parts])),
                "node": pa.array(np.concatenate([p[2] for p in parts])),
            }
        )

    starts_ds = hash_bucketed_groupby(
        edges.map_batches(
            lambda t: pa.table({src_col: _chunked(t[src_col])}),
            batch_format="pyarrow",
        ),
        [src_col],
        lambda df: df.drop_duplicates(),
        num_buckets=16,
    )
    return starts_ds.map_batches(walk, batch_format="pandas")


def _random_walks_joined(
    distinct: ray.data.Dataset,
    walk_len: int,
    src_col: str,
    dst_col: str,
) -> ray.data.Dataset:
    """Beyond-broadcast walk plan over a DISTINCT (src, dst) edge stream.

    Key fact: the deterministic recurrence picks neighbor
    ``h(node, step) mod outdeg(node)`` — the transition depends only on
    (node, step), never on the walk. So each step t has a TRANSITION
    TABLE: exactly one (src -> dst) row per src, selected from the
    dst-ranked adjacency by a per-row predicate
    ``rank == h(src, t) mod outdeg`` (no grouping at apply time). The
    distributed plan is then:

    1. ONE bucketed shuffle ranks the adjacency per src (rank, outdeg);
    2. per step: a zero-shuffle vectorized filter derives the transition
       table, and one node-sized hash join advances the walk frontier
       (dead ends — srcs absent from the adjacency — drop out of the
       inner join, ending those walks exactly like the CSR path).

    Peak state is one (walk_id, node) row per live walk; nothing
    corpus-sized ever lands on the driver.
    """
    from .relational import hash_bucketed_groupby, shuffle_join

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([src_col, dst_col], kind="mergesort")
        grp = df.groupby(src_col, sort=False)
        out = pd.DataFrame(
            {
                "src": df[src_col].to_numpy(np.int64),
                "dst": df[dst_col].to_numpy(np.int64),
                "rank": grp.cumcount().to_numpy(np.int64),
                "outdeg": grp[dst_col].transform("size").to_numpy(np.int64),
            }
        )
        return out

    adj = hash_bucketed_groupby(
        distinct, [src_col], rank_group, num_buckets=64
    ).materialize()

    def transition(step: int):
        def pick(t: pa.Table) -> pa.Table:
            s = _chunked(t["src"]).to_numpy(zero_copy_only=False)
            r = _chunked(t["rank"]).to_numpy(zero_copy_only=False)
            d = _chunked(t["outdeg"]).to_numpy(zero_copy_only=False)
            keep = (_walk_step_hash(s, step) % d) == r
            return pa.table(
                {
                    "src": pa.array(s[keep]),
                    "__next": _chunked(t["dst"]).filter(pa.array(keep)),
                }
            )

        return adj.map_batches(pick, batch_format="pyarrow")

    def starts_batch(t: pa.Table) -> pa.Table:
        s = _chunked(t["src"])
        return pa.table(
            {"walk_id": s,
             "step": pa.array(np.zeros(len(s), dtype=np.int64)),
             "node": s}
        )

    # step 0: every node with out-edges starts a walk at itself
    state = adj.map_batches(
        lambda t: t.filter(pc.equal(_chunked(t["rank"]), 0)).select(["src"]),
        batch_format="pyarrow",
    ).map_batches(starts_batch, batch_format="pyarrow").materialize()
    emitted = [state]

    for step in range(1, walk_len + 1):
        cur = state.map_batches(
            lambda t: pa.table(
                {"walk_id": _chunked(t["walk_id"]), "cur": _chunked(t["node"])}
            ),
            batch_format="pyarrow",
        )
        nxt = shuffle_join(cur, transition(step), on=("cur",), right_on=("src",))
        state = nxt.map_batches(
            lambda t, _s=step: pa.table(
                {
                    "walk_id": _chunked(t["walk_id"]),
                    "step": pa.array(np.full(len(t), _s, dtype=np.int64)),
                    "node": _chunked(t["__next"]),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if state.count() == 0:
            break
        emitted.append(state)

    out = emitted[0]
    for e in emitted[1:]:
        out = out.union(e)
    return out


_PREV_MIX = 2246822519  # third odd Weyl constant: mixes the prev node


def _node2vec_step_hash(
    prev: np.ndarray, cur: np.ndarray, step: int
) -> np.ndarray:
    """Second-order walk hash — depends on (prev, cur, step) so the
    biased pick is reproducible at any parallelism and mirrorable in
    SQL (small-int node ids; arbitrary int64 ids stay deterministic
    engine-side but wrap differently than the 64-bit SQL mirror, same
    caveat as ``_walk_step_hash``). Shared by the broadcast-CSR and
    joined paths so they are bit-identical."""
    from .sampling import KNUTH, MOD32

    return (
        prev.astype(np.int64) * np.int64(_PREV_MIX)
        + cur.astype(np.int64) * np.int64(KNUTH)
        + np.int64(step) * np.int64(_STEP_MIX)
    ) % np.int64(MOD32)


def node2vec_walks(
    edges: ray.data.Dataset,
    walk_len: int = 3,
    back_w: int = 1,
    common_w: int = 4,
    far_w: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    adjacency_broadcast_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """node2vec-style SECOND-ORDER biased walk corpus (Grover &
    Leskovec 2016), DETERMINISTIC: the in/out bias 1/p, 1, 1/q becomes
    integer weight classes over the dst-sorted neighbors of the current
    node — ``back_w`` when the neighbor IS the previous node, ``common_w``
    when it is also a neighbor of the previous node (distance 1, a
    triangle), ``far_w`` otherwise — and the "random" draw is
    ``h(prev, cur, step) mod sum(weights)`` resolved through the
    cumulative weight ladder (a hash replaces the RNG, exactly like
    ``random_walks``). Step 1 has no prev and picks uniformly with the
    first-order hash, so ``back_w == common_w == far_w`` degenerates to
    an unbiased DeepWalk-style corpus (drawn with the second-order
    hash, so not bit-identical to ``random_walks``).

    Dual path: under ``adjacency_broadcast_limit`` distinct edges the
    CSR adjacency (plus a packed (src,dst) key array for the
    triangle-membership test) broadcasts once via ``ray.put`` and every
    step is pure vectorized numpy (searchsorted + cumsum ladder, zero
    shuffles). Beyond it ``_node2vec_joined`` runs the identical
    recurrence as per-step distributed joins: one frontier->adjacency
    fan-out join, one (prev, dst) edge-membership left join, and one
    walk-keyed bucketed pick — peak state is one candidate row per
    (live walk, neighbor), never driver-resident. Parity-tested
    bit-for-bit (tests/test_graphalgo.py).

    Emits (walk_id = start node, step 0..walk_len, node); dead ends
    stop a walk early.
    """
    import ray as _ray

    from .relational import hash_bucketed_groupby

    for name, w in (("back_w", back_w), ("common_w", common_w),
                    ("far_w", far_w)):
        if not isinstance(w, int) or w < 1:
            raise ValueError(f"{name} must be an integer >= 1, got {w!r}")

    def dedup_batch(t: pa.Table) -> pa.Table:
        return t.select([src_col, dst_col]).group_by(
            [src_col, dst_col]
        ).aggregate([])

    distinct = hash_bucketed_groupby(
        edges.map_batches(dedup_batch, batch_format="pyarrow"),
        [src_col, dst_col],
        lambda df: df.drop_duplicates(),
        num_buckets=32,
    ).materialize()
    if distinct.count() > adjacency_broadcast_limit:
        return _node2vec_joined(
            distinct, walk_len, back_w, common_w, far_w, src_col, dst_col
        )

    srcs_l, dsts_l = [], []
    for b in distinct.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        srcs_l.append(_chunked(b[src_col]).to_numpy(zero_copy_only=False))
        dsts_l.append(_chunked(b[dst_col]).to_numpy(zero_copy_only=False))
    srcs = np.concatenate(srcs_l).astype(np.int64, copy=False)
    dsts = np.concatenate(dsts_l).astype(np.int64, copy=False)
    order = np.lexsort((dsts, srcs))
    srcs, dsts = srcs[order], dsts[order]
    uniq, first = np.unique(srcs, return_index=True)
    counts = np.diff(np.append(first, len(srcs)))
    # dense-index packed (src, dst) keys for the vectorized triangle
    # membership test: allv maps node id -> [0, V), pack stays sorted
    # because (srcs, dsts) is lexsorted and the map is monotone
    allv = np.unique(np.concatenate([srcs, dsts]))
    v_n = np.int64(len(allv))
    pack = (
        np.searchsorted(allv, srcs).astype(np.int64) * v_n
        + np.searchsorted(allv, dsts).astype(np.int64)
    )
    ref = _ray.put(
        (uniq, first.astype(np.int64), counts.astype(np.int64), dsts,
         allv, v_n, pack)
    )
    bw, cw, fw = np.int64(back_w), np.int64(common_w), np.int64(far_w)

    def walk(df) -> pa.Table:
        u, st, cn, ds_, av, vn, pk = _ray.get(ref)
        start = np.unique(df[src_col].to_numpy(np.int64))
        parts = [(start, np.zeros(len(start), dtype=np.int64), start)]
        # step 1: uniform first-order pick (no prev yet)
        pos = np.searchsorted(u, start)
        posc = np.clip(pos, 0, max(len(u) - 1, 0))
        has = (pos < len(u)) & (u[posc] == start)
        prev, wid = start[has], start[has]
        h = _walk_step_hash(prev, 1)
        idx = st[posc[has]] + (h % np.maximum(cn[posc[has]], 1))
        cur = ds_[np.clip(idx, 0, max(len(ds_) - 1, 0))]
        if len(cur):
            parts.append((wid, np.ones(len(wid), dtype=np.int64), cur))
        for step in range(2, walk_len + 1):
            if not len(cur):
                break
            pos = np.searchsorted(u, cur)
            posc = np.clip(pos, 0, max(len(u) - 1, 0))
            has = (pos < len(u)) & (u[posc] == cur)
            if not has.any():
                break
            cur_a, prev_a, wid_a = cur[has], prev[has], wid[has]
            seg_start, cnt = st[posc[has]], cn[posc[has]]
            rep = np.repeat(np.arange(len(cur_a)), cnt)
            seg_first = np.cumsum(cnt) - cnt
            intra = np.arange(int(cnt.sum())) - np.repeat(seg_first, cnt)
            nbr = ds_[seg_start[rep] + intra]
            prev_rep = prev_a[rep]
            q = (
                np.searchsorted(av, prev_rep).astype(np.int64) * vn
                + np.searchsorted(av, nbr).astype(np.int64)
            )
            loc = np.clip(np.searchsorted(pk, q), 0, len(pk) - 1)
            member = pk[loc] == q
            wt = np.where(
                nbr == prev_rep, bw, np.where(member, cw, fw)
            ).astype(np.int64)
            cum = np.cumsum(wt)
            seg_base = (cum - wt)[seg_first]
            tot = np.add.reduceat(wt, seg_first)
            r = _node2vec_step_hash(prev_a, cur_a, step) % tot
            chosen = np.searchsorted(cum, seg_base + r, side="right")
            prev, cur, wid = cur_a, nbr[chosen], wid_a
            parts.append((wid, np.full(len(wid), step, dtype=np.int64), cur))
        return pa.table(
            {
                "walk_id": pa.array(np.concatenate([p[0] for p in parts])),
                "step": pa.array(np.concatenate([p[1] for p in parts])),
                "node": pa.array(np.concatenate([p[2] for p in parts])),
            }
        )

    starts_ds = hash_bucketed_groupby(
        edges.map_batches(
            lambda t: pa.table({src_col: _chunked(t[src_col])}),
            batch_format="pyarrow",
        ),
        [src_col],
        lambda df: df.drop_duplicates(),
        num_buckets=32,
    )
    return starts_ds.map_batches(walk, batch_format="pandas")


def _node2vec_joined(
    distinct: ray.data.Dataset,
    walk_len: int,
    back_w: int,
    common_w: int,
    far_w: int,
    src_col: str,
    dst_col: str,
) -> ray.data.Dataset:
    """Beyond-broadcast node2vec plan. Per step >= 2: (1) the frontier
    (walk_id, prev, cur) fan-out joins the adjacency on cur; (2) one
    (prev, dst) left join against the distinct edge set flags the
    triangle class; (3) a walk-keyed bucketed shuffle sorts each walk's
    candidates by dst and resolves the cumulative-weight ladder with
    the same reduceat kernel as the CSR path. Step 1 reuses the
    first-order transition-table trick (pick depends only on (node,
    step) when there is no prev). The partitioning assumption is the
    standard one: one walk's candidate set (outdeg of one node) fits a
    task — hub nodes bound it by max outdeg, not corpus size."""
    from .relational import hash_bucketed_groupby, shuffle_join

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([src_col, dst_col], kind="mergesort")
        grp = df.groupby(src_col, sort=False)
        return pd.DataFrame(
            {
                "src": df[src_col].to_numpy(np.int64),
                "dst": df[dst_col].to_numpy(np.int64),
                "rank": grp.cumcount().to_numpy(np.int64),
                "outdeg": grp[dst_col].transform("size").to_numpy(np.int64),
            }
        )

    adj = hash_bucketed_groupby(
        distinct, [src_col], rank_group, num_buckets=64
    ).materialize()
    mem = adj.map_batches(
        lambda t: pa.table(
            {
                "__ms": _chunked(t["src"]),
                "__md": _chunked(t["dst"]),
                "__is_edge": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def starts_batch(t: pa.Table) -> pa.Table:
        s = _chunked(t["src"])
        return pa.table(
            {"walk_id": s,
             "step": pa.array(np.zeros(len(s), dtype=np.int64)),
             "node": s}
        )

    state0 = adj.map_batches(
        lambda t: t.filter(pc.equal(_chunked(t["rank"]), 0)).select(["src"]),
        batch_format="pyarrow",
    ).map_batches(starts_batch, batch_format="pyarrow").materialize()
    emitted = [state0]

    # step 1: first-order transition table (rank == h(src, 1) % outdeg)
    def pick1(t: pa.Table) -> pa.Table:
        s = _chunked(t["src"]).to_numpy(zero_copy_only=False)
        r = _chunked(t["rank"]).to_numpy(zero_copy_only=False)
        d = _chunked(t["outdeg"]).to_numpy(zero_copy_only=False)
        keep = (_walk_step_hash(s, 1) % d) == r
        return pa.table(
            {"src": pa.array(s[keep]),
             "__next": _chunked(t["dst"]).filter(pa.array(keep))}
        )

    frontier = shuffle_join(
        state0.map_batches(
            lambda t: pa.table(
                {"walk_id": _chunked(t["walk_id"]),
                 "cur": _chunked(t["node"])}
            ),
            batch_format="pyarrow",
        ),
        adj.map_batches(pick1, batch_format="pyarrow"),
        on=("cur",), right_on=("src",),
    ).map_batches(
        lambda t: pa.table(
            {"walk_id": _chunked(t["walk_id"]),
             "prev": _chunked(t["cur"]),
             "cur": _chunked(t["__next"])}
        ),
        batch_format="pyarrow",
    ).materialize()
    if frontier.count():
        emitted.append(
            frontier.map_batches(
                lambda t: pa.table(
                    {"walk_id": _chunked(t["walk_id"]),
                     "step": pa.array(np.ones(len(t), dtype=np.int64)),
                     "node": _chunked(t["cur"])}
                ),
                batch_format="pyarrow",
            )
        )

    bw, cw, fw = np.int64(back_w), np.int64(common_w), np.int64(far_w)
    for step in range(2, walk_len + 1):
        if frontier.count() == 0:
            break
        cand = shuffle_join(
            frontier, adj.map_batches(
                lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
            ),
            on=("cur",), right_on=("src",),
        )
        flagged = shuffle_join(
            cand, mem, on=("prev", "dst"), right_on=("__ms", "__md"),
            how="left_outer",
        )

        def pick_bucket(df: pd.DataFrame, _step=step) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {"walk_id": pd.Series([], dtype="int64"),
                     "prev": pd.Series([], dtype="int64"),
                     "cur": pd.Series([], dtype="int64")}
                )
            df = df.sort_values(["walk_id", "dst"], kind="mergesort")
            wid = df["walk_id"].to_numpy(np.int64)
            prev = df["prev"].to_numpy(np.int64)
            cur = df["cur"].to_numpy(np.int64)
            nbr = df["dst"].to_numpy(np.int64)
            is_edge = df["__is_edge"].notna().to_numpy()
            seg_first = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
            wt = np.where(
                nbr == prev, bw, np.where(is_edge, cw, fw)
            ).astype(np.int64)
            cum = np.cumsum(wt)
            seg_base = (cum - wt)[seg_first]
            tot = np.add.reduceat(wt, seg_first)
            r = _node2vec_step_hash(
                prev[seg_first], cur[seg_first], _step
            ) % tot
            chosen = np.searchsorted(cum, seg_base + r, side="right")
            return pd.DataFrame(
                {"walk_id": wid[seg_first], "prev": cur[seg_first],
                 "cur": nbr[chosen]}
            )

        frontier = hash_bucketed_groupby(
            flagged, ["walk_id"], pick_bucket, num_buckets=64
        ).materialize()
        if frontier.count() == 0:
            break
        emitted.append(
            frontier.map_batches(
                lambda t, _s=step: pa.table(
                    {"walk_id": _chunked(t["walk_id"]),
                     "step": pa.array(np.full(len(t), _s, dtype=np.int64)),
                     "node": _chunked(t["cur"])}
                ),
                batch_format="pyarrow",
            )
        )

    out = emitted[0]
    for e in emitted[1:]:
        out = out.union(e)
    return out


def neighbor_fanout_sample(
    edges_ds: ray.data.Dataset,
    seeds,
    fanouts: "list[int]",
    src: str = "src",
    dst: str = "dst",
    hash_a: int = 31,
    hash_b: int = 17,
    hash_mod: int = 997,
    num_buckets: int = 32,
    semi_broadcast_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """GraphSAGE-style layered neighbor-fanout sampling (Hamilton et al.
    2017) for GNN / KG-embedding minibatch prep: starting from ``seeds``,
    draw at most ``fanouts[l]`` out-neighbors per frontier node at layer
    l+1; the layer's sampled targets become the next frontier.

    Determinism (no RNG state, reproducible on any partitioning): the
    "random" neighbor order is the integer hash
    ``(hash_a*src + hash_b*dst) % hash_mod`` with ``dst`` as the exact
    tiebreak, over the DISTINCT edge set — so the sample is a pure
    function of the graph, exactly reproducible by a SQL
    ``ROW_NUMBER() OVER (PARTITION BY src ORDER BY hash, dst)`` mirror.

    Scale (100-TB discipline): no frontier ever lands on the driver.
    Each layer is ONE size-routed semi-join of the edge stream against
    the frontier Dataset (``relational.semi_join``: broadcast under
    ``semi_broadcast_limit`` distinct keys, bloom-prefiltered shuffle
    beyond) plus ONE src-keyed top-k shuffle whose exchange moves at most
    ``fanout`` rows per (src, block): the per-batch combiner keeps each
    block's local top-``fanout`` per src, and the global top-``fanout``
    by (hash, dst) is always contained in the union of block-local
    top-``fanout`` sets. The multigraph needs NO global distinct shuffle:
    the rank is a pure function of (src, dst), so duplicate edges are
    adjacent after the kernel's sort and a per-kernel
    ``drop_duplicates([src, dst])`` yields the distinct-graph sample.

    Returns a Dataset with columns (layer, src, dst, rk) — rk is the
    1-based rank of dst within src's sampled neighbors at that layer.
    """
    from . import relational

    edges = edges_ds.select_columns([src, dst]).materialize()
    # the frontier key column gets a reserved name: the semi-join's shuffle
    # arm carries it through the marker join, where a name shared with a
    # LEFT column (e.g. layer-2 frontiers keyed by ``dst``) would collide
    if isinstance(seeds, ray.data.Dataset):
        seed_col = seeds.schema().names[0]
        frontier = seeds.map_batches(
            lambda t, _c=seed_col: pa.table(
                {"__frontier": pc.cast(_chunked(t[_c]), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    else:
        frontier = ray.data.from_arrow(
            pa.table({"__frontier": pa.array(list(seeds), type=pa.int64())})
        )

    def topk(df: pd.DataFrame, f: int) -> pd.DataFrame:
        df = df.drop_duplicates([src, dst])
        h = (
            hash_a * df[src].to_numpy(dtype=np.int64)
            + hash_b * df[dst].to_numpy(dtype=np.int64)
        ) % hash_mod
        out = df.assign(_h=h).sort_values([src, "_h", dst], kind="mergesort")
        out["rk"] = out.groupby(src, sort=False).cumcount() + 1
        return out.loc[out["rk"] <= f, [src, dst, "rk"]]

    layers: list[ray.data.Dataset] = []
    for layer_no, fanout in enumerate(fanouts, start=1):
        cand = relational.semi_join(
            edges, frontier, on=src, right_on="__frontier",
            broadcast_limit=semi_broadcast_limit,
        )
        # block-local top-fanout combiner (rk recomputed after the shuffle)
        pre = cand.map_batches(
            lambda df, _f=fanout: topk(df, _f)[[src, dst]],
            batch_format="pandas",
        )
        sampled = relational.hash_bucketed_groupby(
            pre, [src], lambda df, _f=fanout: topk(df, _f), num_buckets
        ).map_batches(
            lambda t, _l=layer_no: pa.table(
                {
                    "layer": pa.array(np.full(len(t), _l, dtype=np.int64)),
                    src: pc.cast(_chunked(t[src]), pa.int64()),
                    dst: pc.cast(_chunked(t[dst]), pa.int64()),
                    "rk": pc.cast(_chunked(t["rk"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if sampled.count() == 0:
            break
        layers.append(sampled)
        frontier = sampled.map_batches(
            lambda t: pa.table({"__frontier": _chunked(t[dst])}),
            batch_format="pyarrow",
        )

    if not layers:
        return ray.data.from_arrow(
            pa.table(
                {
                    "layer": pa.array([], type=pa.int64()),
                    src: pa.array([], type=pa.int64()),
                    dst: pa.array([], type=pa.int64()),
                    "rk": pa.array([], type=pa.int64()),
                }
            )
        )
    out = layers[0]
    for l in layers[1:]:
        out = out.union(l)
    return out


def metapath_counts(
    edges_ds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    pred: str = "p",
    num_buckets: int = 32,
) -> pa.Table:
    """2-hop metapath counts per ordered predicate pair — for each (p1,
    p2), the number of distinct-edge paths a -p1-> v -p2-> b. The classic
    KG feature/statistics pass for link prediction and schema audit.

    Scale shape: NO wedge enumeration. n_paths(p1, p2) =
    sum_v in_p1(v) * out_p2(v), so the plan contracts per node first:
    one distinct-(s,p,o) shuffle, then per-batch (node, pred) in/out
    partial counts riding ONE node-keyed shuffle whose kernel both
    finishes the counts and crosses in x out predicates within each
    node — the exchange is (node x predicate)-bounded, never
    path-bounded. The final fold is predicate-pair-bounded (tiny) on the
    driver.

    Returns a table (p1, p2, n_paths) with predicates as given (the
    caller maps index -> name).
    """
    from .relational import hash_bucketed_groupby

    combined = edges_ds.select_columns([src, pred, dst]).map_batches(
        lambda t: t.select([src, pred, dst]).group_by([src, pred, dst]).aggregate([]),
        batch_format="pyarrow",
    )
    e = hash_bucketed_groupby(
        combined, [src, pred, dst], lambda df: df.drop_duplicates(), num_buckets
    )

    def partials(t: pa.Table) -> pa.Table:
        i = (
            t.select([dst, pred]).group_by([dst, pred]).aggregate([([dst], "count")])
            .rename_columns(["v", "p", "n"])
        )
        o = (
            t.select([src, pred]).group_by([src, pred]).aggregate([([src], "count")])
            .rename_columns(["v", "p", "n"])
        )
        z_i = pa.array(np.zeros(len(i), dtype=np.int64))
        z_o = pa.array(np.zeros(len(o), dtype=np.int64))
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [_chunked(i["v"]).cast(pa.int64()), _chunked(o["v"]).cast(pa.int64())]
                ),
                "p": pa.concat_arrays([_chunked(i["p"]), _chunked(o["p"])]),
                "n_in": pa.concat_arrays(
                    [pc.cast(_chunked(i["n"]), pa.int64()), z_o]
                ),
                "n_out": pa.concat_arrays(
                    [z_i, pc.cast(_chunked(o["n"]), pa.int64())]
                ),
            }
        )

    def cross(df: pd.DataFrame) -> pd.DataFrame:
        # finish the (v, p) sums, then cross in x out predicates per node;
        # every v's rows are co-located (the shuffle is keyed by v alone)
        g = df.groupby(["v", "p"], sort=False)[["n_in", "n_out"]].sum().reset_index()
        m = g.merge(g, on="v", suffixes=("_1", "_2"))
        m = m[(m["n_in_1"] > 0) & (m["n_out_2"] > 0)]
        out = (
            m.assign(n=m["n_in_1"] * m["n_out_2"])
            .groupby(["p_1", "p_2"], sort=False)["n"].sum().reset_index()
        )
        return out.rename(columns={"p_1": "p1", "p_2": "p2"})

    folded = hash_bucketed_groupby(
        e.map_batches(partials, batch_format="pyarrow"), ["v"], cross, num_buckets
    )
    # predicate-pair-bounded final fold (<= |preds|^2 rows)
    acc: dict = {}
    for b in folded.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        if "p1" not in b.schema.names:  # schema-less empty reducer block
            continue
        for p1, p2, n in zip(
            b["p1"].to_pylist(), b["p2"].to_pylist(), b["n"].to_pylist()
        ):
            acc[(p1, p2)] = acc.get((p1, p2), 0) + int(n)
    keys = sorted(acc)
    return pa.table(
        {
            "p1": pa.array([k[0] for k in keys]),
            "p2": pa.array([k[1] for k in keys]),
            "n_paths": pa.array([acc[k] for k in keys], type=pa.int64()),
        }
    )


@ray.remote
class _HubNeighborHolder:
    """Zero-CPU staging actor for hot-hub adjacency: staging TASKS send
    each hub's sorted neighbor array here, the actor ``ray.put``s it
    and keeps only the ObjectRef — so the objects are OWNED by this
    actor (they survive the staging workers' exit, the classic
    worker-owned-ref pitfall) and the driver never materializes any
    hub's adjacency. ``ref`` returns the ref WRAPPED in a list so the
    caller receives the ref itself, not an auto-dereferenced copy; the
    consuming task then ``ray.get``s it, which the object store caches
    per node. Heap cost: one array transits the actor at a time; the
    store holds sum-of-hot-degrees x 8 B, same as before, minus the
    driver copy."""

    def __init__(self):
        self._refs: dict = {}

    def put(self, mid: int, w_sorted) -> int:
        self._refs[mid] = ray.put(w_sorted)
        return len(w_sorted)

    def ref(self, mid: int) -> list:
        return [self._refs[mid]]


def _undirected_adj_and_degrees(
    edges_ds: ray.data.Dataset, src: str, dst: str, num_buckets: int
):
    """Simple undirected projection -> (both-direction adjacency
    Dataset ``(v, w)``, TRUE degree table Dataset ``(node, d)``), both
    materialized. The degree definition shared by
    ``link_pred_features``, ``triangle_count``-style wedge plans and
    ``degree_percentile`` — one partial count per block, one bucketed
    sum shuffle over the node-bounded partials."""
    from .relational import hash_bucketed_groupby

    e = undirected_distinct_edges(edges_ds, src, dst).materialize()
    adj = e.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [_chunked(t["a"]).cast(pa.int64()), _chunked(t["b"]).cast(pa.int64())]
                ),
                "w": pa.concat_arrays(
                    [_chunked(t["b"]).cast(pa.int64()), _chunked(t["a"]).cast(pa.int64())]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    deg_partial = adj.map_batches(
        lambda t: t.group_by(["v"]).aggregate([(["v"], "count")]).rename_columns(
            ["node", "d"]
        ),
        batch_format="pyarrow",
    )
    deg = hash_bucketed_groupby(
        deg_partial, ["node"],
        lambda df: df.groupby("node", sort=False, as_index=False)["d"].sum(),
        num_buckets,
    ).materialize()
    return adj, deg


def degree_percentile(
    edges_ds: ray.data.Dataset,
    pct: int = 50,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
) -> int:
    """Exact discrete percentile of the TRUE undirected-degree
    distribution: the SMALLEST degree value ``d`` with
    ``100 * #{v : deg(v) <= d} >= pct * n`` — all-integer, so a SQL
    mirror (cumulative SUM over the degree histogram) agrees
    bit-for-bit at any scale. The scale-invariant way to cut a
    ``max_middle_degree`` cap: a constant cap that prunes at one SF
    excludes everything (or nothing) at another, while "middles above
    the pct-th percentile" prunes a comparable tail everywhere.

    Distribution discipline: degrees stay distributed; only the
    per-block DEGREE-VALUE histogram is folded on the driver —
    bounded by the number of distinct degree values (<= max degree,
    O(sqrt(m)) on Zipf graphs), never by node count."""
    if not (0 < pct <= 100):
        raise ValueError(f"pct must be in (0, 100], got {pct}")
    _adj, deg = _undirected_adj_and_degrees(
        edges_ds, src, dst, num_buckets
    )
    return _percentile_from_degrees(deg, pct)


def _percentile_from_degrees(deg: ray.data.Dataset, pct: int) -> int:
    """The histogram fold of :func:`degree_percentile` off an
    already-built (node, d) degree table — shared with
    ``link_pred_features(max_middle_degree='pNN')`` so a percentile
    cap there costs ZERO extra adjacency builds."""

    def _vc(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(_chunked(t["d"]))
        return pa.table({"d": vc.field("values"), "c": vc.field("counts")})

    hist: dict = {}
    for t in deg.map_batches(
        _vc, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for d, c in zip(t["d"].to_pylist(), t["c"].to_pylist()):
            hist[int(d)] = hist.get(int(d), 0) + int(c)
    if not hist:
        raise ValueError("degree_percentile: empty graph")
    n = sum(hist.values())
    cum = 0
    for d in sorted(hist):
        cum += hist[d]
        if 100 * cum >= pct * n:
            return d
    return max(hist)  # pct == 100 with float-free arithmetic


def link_pred_features(
    edges_ds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
    num_buckets: int = 32,
    max_middle_degree: "int | str | None" = None,
    hot_middle_degree: int = 4096,
    hot_chunk: int = 2048,
    return_audit: bool = False,
):
    """Per-pair link-prediction features over the simple undirected
    projection: common-neighbor count, preferential attachment
    (deg(u)*deg(v)), integer Jaccard
    (``jaccard_ppm = floor(1e6*cn / (deg(u)+deg(v)-cn))``) and the
    resource-allocation index (Zhou et al. 2009) as
    ``ra_ppm = sum_w floor(1e6 / deg(w))`` over common neighbors w —
    for every unordered pair with >= 1 common neighbor.

    All-integer outputs (per-term floor then sum, so exact and
    order-free on any partitioning). The wedge join on the middle node
    is the quadratic term (triangle_count's layout) — partition-by-middle
    keeps it distributed; the middle's degree is attached to the
    node-bounded adjacency BEFORE the join (never a second pass over the
    quadratic wedge stream); endpoint degrees ride a size-routed lookup
    join (broadcast under the node budget, hash join beyond).

    Hot-middle skew: one celebrity middle of degree d implies d^2 wedge
    rows, and a hash join lands ALL of them in one partition's task.
    Two defenses, composable:

    - middles with degree > ``hot_middle_degree`` leave the hash join
      for a chunked path — their sorted neighbor array is staged in the
      object store once (``ray.put``) and upper-triangle C x C blocks
      of the pair matrix are emitted by independent tasks, so per-task
      output is <= ``hot_chunk``^2 rows no matter how hot the hub.
      Exact: same partials, same downstream sum.
    - ``max_middle_degree`` (the standard CN/RA practice) SKIPS middles
      above it entirely — the quadratic work itself is the problem at
      Zipf scale, not just its placement. Skips are audited (middle
      count + exact wedge count skipped); pass ``return_audit=True``
      to get ``(dataset, audit_dict)``. With a cap, cn/ra undercount
      pairs whose only witnesses are capped hubs and endpoint degrees
      stay TRUE degrees (pref_attach/jaccard denominators unchanged) —
      mirror the cap in any oracle as a ``deg(middle) <= cap`` filter.

    Driver memory note: hot-middle detection reads only the filtered
    degree table; the staged adjacency is bounded by sum-of-hot-degrees
    (with a cap: <= n_hot * max_middle_degree), each hub one int64
    array in the object store, never concatenated on the driver heap.
    """
    from .relational import broadcast_lookup_join, hash_bucketed_groupby

    adj, deg = _undirected_adj_and_degrees(
        edges_ds, src, dst, num_buckets
    )

    if isinstance(max_middle_degree, str):
        # 'pNN' percentile spec: resolve against the degree table this
        # function ALREADY built — the scale-invariant cap costs one
        # bounded histogram fold, never a second adjacency pass
        if not (max_middle_degree.startswith("p")
                and max_middle_degree[1:].isdigit()):
            raise ValueError(
                f"max_middle_degree must be an int or 'pNN' percentile "
                f"spec, got {max_middle_degree!r}"
            )
        max_middle_degree = _percentile_from_degrees(
            deg, int(max_middle_degree[1:])
        )

    # exact hot/capped-middle detection off the (node-bounded, already
    # materialized) degree table — only rows over the threshold leave
    # the cluster, a hub-count-bounded pull
    audit = {"capped_middles": 0, "capped_wedges": 0,
             "hot_chunked_middles": 0, "hot_chunk_tasks": 0}
    thresh = hot_middle_degree
    if max_middle_degree is not None:
        thresh = min(thresh, max_middle_degree)
    hot_rows = deg.map_batches(
        lambda t, _th=thresh: t.filter(
            pc.greater(pc.cast(_chunked(t["d"]), pa.int64()), _th)
        ),
        batch_format="pyarrow",
    ).take_all()
    capped_mids: set = set()
    hot_mids: list = []
    for r in hot_rows:
        node_, d_ = int(r["node"]), int(r["d"])
        if max_middle_degree is not None and d_ > max_middle_degree:
            capped_mids.add(node_)
            audit["capped_middles"] += 1
            audit["capped_wedges"] += d_ * (d_ - 1) // 2
        else:
            hot_mids.append((node_, d_))
    audit["hot_chunked_middles"] = len(hot_mids)
    excluded = capped_mids | {m for m, _ in hot_mids}

    # middle-node degree rides the node-bounded adjacency into the join,
    # so each wedge row already carries deg(middle) for the RA index
    adj_d = broadcast_lookup_join(
        adj, deg.map_batches(
            lambda t: pa.table({"node": _chunked(t["node"]), "dmid": _chunked(t["d"])}),
            batch_format="pyarrow",
        ), "v", "node", ["dmid"],
    )
    # an aggressive cap on a dense graph can exclude EVERY middle —
    # skip the wedge join outright then (a join over all-empty filtered
    # sides is both wasted work and fragile on zero-row partitions)
    all_excluded = excluded and len(excluded) >= deg.count()
    if excluded and not all_excluded:
        excl = pa.array(sorted(excluded), pa.int64())

        def drop_hot(t: pa.Table, _col: str, _ex=excl) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(pc.cast(_chunked(t[_col]), pa.int64()),
                                   value_set=_ex))
            )

        adj_d = adj_d.map_batches(
            lambda t, _f=drop_hot: _f(t, "v"), batch_format="pyarrow"
        )
        adj_right = adj.map_batches(
            lambda t, _f=drop_hot: _f(t, "v"), batch_format="pyarrow"
        )
    else:
        adj_right = adj

    def pair_partial(t: pa.Table) -> pa.Table:
        keep = pc.less(_chunked(t["w"]), _chunked(t["w2"]))
        dmid = pc.cast(_chunked(t["dmid"]), pa.int64()).to_numpy(zero_copy_only=False)
        p = pa.table(
            {
                "u": _chunked(t["w"]),
                "v": _chunked(t["w2"]),
                "ra": pa.array(1_000_000 // dmid),
            }
        ).filter(keep)
        return p.group_by(["u", "v"]).aggregate(
            [(["u"], "count"), (["ra"], "sum")]
        ).rename_columns(["u", "v", "cn", "ra"])

    _empty_partials = pa.table({
        "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
        "cn": pa.array([], pa.int64()), "ra": pa.array([], pa.int64()),
    })
    if all_excluded:
        partials = ray.data.from_arrow(_empty_partials)
    else:
        wedges = adj_d.join(
            adj_right.map_batches(
                lambda t: pa.table(
                    {"v2": _chunked(t["v"]), "w2": _chunked(t["w"])}
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=_clamp_partitions(num_partitions, adj.count()),
            on=("v",), right_on=("v2",),
        )
        partials = wedges.map_batches(pair_partial, batch_format="pyarrow")

    if hot_mids:
        # stage each hot hub's sorted neighbor array in the object
        # store ONCE — built INSIDE TASKS, never on the driver: the
        # hot adjacency is bucket-shuffled by hub, each group task
        # sorts its hub's neighbors and ships them to a zero-CPU
        # holder actor that `ray.put`s them (the actor OWNS the
        # objects, so the refs outlive the staging workers). The
        # driver holds only (hub, degree) specs — block decomposition
        # needs nothing else, because a hub's neighbor-array length IS
        # its degree on the simple undirected projection. Then
        # block-decompose each pair matrix so no task emits more than
        # hot_chunk^2 rows (upper-triangle blocks only).
        holder = _HubNeighborHolder.options(num_cpus=0).remote()
        hot_set = pa.array(sorted(m for m, _ in hot_mids), pa.int64())
        hot_adj = adj.map_batches(
            lambda t, _hs=hot_set: t.filter(
                pc.is_in(pc.cast(_chunked(t["v"]), pa.int64()), value_set=_hs)
            ),
            batch_format="pyarrow",
        )

        def _stage_group(df, _holder=holder):
            mids, lens = [], []
            for m, g in df.groupby("v", sort=False):
                arr = np.sort(
                    g["w"].to_numpy(dtype=np.int64, na_value=0)
                )
                lens.append(ray.get(_holder.put.remote(int(m), arr)))
                mids.append(int(m))
            import pandas as pd

            return pd.DataFrame({"mid": mids, "n": lens})

        # eager barrier (hub-count rows): staging must complete before
        # any emit task asks the holder for a ref
        staged = {
            int(r["mid"]): int(r["n"])
            for r in hash_bucketed_groupby(
                hot_adj, ["v"], _stage_group, num_buckets
            ).take_all()
        }
        specs = []
        for m, d_ in hot_mids:
            n_ = staged.get(m, 0)
            assert n_ == d_, (m, n_, d_)  # array length IS the degree
            ra_term = 1_000_000 // max(d_, 1)
            blocks = range(0, n_, hot_chunk)
            for i in blocks:
                for j in range(i, n_, hot_chunk):
                    specs.append({"mid": m, "i": i, "j": j, "ra": ra_term})
        audit["hot_chunk_tasks"] = len(specs)

        def emit_block(batch: "dict", _holder=holder, _c=hot_chunk) -> pa.Table:
            us, vs, ras = [], [], []
            ref_cache: dict = {}
            for mid, i, j, ra_t in zip(
                batch["mid"], batch["i"], batch["j"], batch["ra"]
            ):
                mid = int(mid)
                if mid not in ref_cache:
                    ref_cache[mid] = ray.get(_holder.ref.remote(mid))[0]
                w_all = ray.get(ref_cache[mid])
                left = w_all[int(i): int(i) + _c]
                right = w_all[int(j): int(j) + _c]
                u = np.repeat(left, len(right))
                v = np.tile(right, len(left))
                if i == j:
                    keep = u < v
                    u, v = u[keep], v[keep]
                us.append(u)
                vs.append(v)
                ras.append(np.full(len(u), int(ra_t), np.int64))
            if not us:
                return pa.table({
                    "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                    "cn": pa.array([], pa.int64()), "ra": pa.array([], pa.int64()),
                })
            uu = np.concatenate(us)
            return pa.table({
                "u": pa.array(uu), "v": pa.array(np.concatenate(vs)),
                "cn": pa.array(np.ones(len(uu), np.int64)),
                "ra": pa.array(np.concatenate(ras)),
            })

        hot_partials = ray.data.from_items(specs).map_batches(
            emit_block, batch_format="numpy", batch_size=1,
        )
        partials = partials.union(hot_partials)

    cn = hash_bucketed_groupby(
        partials, ["u", "v"],
        lambda df: df.groupby(["u", "v"], sort=False, as_index=False)[
            ["cn", "ra"]
        ].sum(),
        num_buckets,
    )

    du = deg.map_batches(
        lambda t: pa.table({"node": _chunked(t["node"]), "du": _chunked(t["d"])}),
        batch_format="pyarrow",
    )
    dv = deg.map_batches(
        lambda t: pa.table({"node": _chunked(t["node"]), "dv": _chunked(t["d"])}),
        batch_format="pyarrow",
    )
    with_deg = broadcast_lookup_join(
        broadcast_lookup_join(cn, du, "u", "node", ["du"]), dv, "v", "node", ["dv"]
    )

    def finish(t: pa.Table) -> pa.Table:
        cn_ = pc.cast(_chunked(t["cn"]), pa.int64()).to_numpy(zero_copy_only=False)
        du_ = pc.cast(_chunked(t["du"]), pa.int64()).to_numpy(zero_copy_only=False)
        dv_ = pc.cast(_chunked(t["dv"]), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pc.cast(_chunked(t["u"]), pa.int64()),
                "v": pc.cast(_chunked(t["v"]), pa.int64()),
                "cn": pa.array(cn_),
                "pref_attach": pa.array(du_ * dv_),
                "jaccard_ppm": pa.array((1_000_000 * cn_) // (du_ + dv_ - cn_)),
                "ra_ppm": pc.cast(_chunked(t["ra"]), pa.int64()),
            }
        )

    out = with_deg.map_batches(finish, batch_format="pyarrow")
    return (out, audit) if return_audit else out


def _distinct_pairs(ds: ray.data.Dataset, a: str, b: str,
                    num_buckets: int) -> ray.data.Dataset:
    """Distinct (a, b) pairs: per-batch combiner, then one keyed shuffle."""
    from .relational import hash_bucketed_groupby

    combined = ds.select_columns([a, b]).map_batches(
        lambda t: t.group_by([a, b]).aggregate([]), batch_format="pyarrow"
    )
    deduped = hash_bucketed_groupby(
        combined, [a, b], lambda df: df.drop_duplicates(), num_buckets
    )
    # map_groups emits PANDAS blocks; downstream unions mix them with
    # arrow join outputs, which Ray refuses — normalize here
    return deduped.map_batches(
        lambda t: t.select([a, b]), batch_format="pyarrow"
    )


def _pack_pair_key(t: pa.Table, a: str, b: str) -> pa.Table:
    key = pc.binary_join_element_wise(
        pc.cast(_chunked(t[a]), pa.string()),
        pc.cast(_chunked(t[b]), pa.string()),
        "\x1f",
    )
    return t.append_column("pair_key", key)


def _closure_local(
    tbl: pa.Table, src: str, dst: str, max_iters: int, pair_cap: int
) -> "pa.Table | None":
    """Driver-local semi-naive closure: node ids factorized to codes,
    pairs packed into int64 keys, the delta-join expanded with
    searchsorted + repeat — every step a numpy kernel. Returns None if
    the closure outgrows ``pair_cap`` (caller falls back to the
    distributed plan, which streams the output instead of holding it)."""
    a = pc.cast(_chunked(tbl[src]), pa.string())
    b = pc.cast(_chunked(tbl[dst]), pa.string())
    both = pa.concat_arrays([a, b])
    uniques = both.unique()
    n = len(uniques)
    codes = pc.index_in(both, value_set=uniques).to_numpy(zero_copy_only=False).astype(np.int64)
    a_c, b_c = codes[: len(a)], codes[len(a):]
    base_keys = np.unique(a_c * n + b_c)
    order = np.argsort(a_c, kind="stable")
    base_a, base_b = a_c[order], b_c[order]

    closure = base_keys
    delta = base_keys
    for _ in range(max_iters):
        dx, dy = delta // n, delta % n
        lo = np.searchsorted(base_a, dy, side="left")
        hi = np.searchsorted(base_a, dy, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            break
        starts = np.cumsum(cnt) - cnt
        idx = np.repeat(lo - starts, cnt) + np.arange(total)
        new_keys = np.repeat(dx, cnt) * n + base_b[idx]
        fresh = np.setdiff1d(np.unique(new_keys), closure, assume_unique=True)
        if fresh.size == 0:
            break
        closure = np.union1d(closure, fresh)
        if closure.size > pair_cap:
            return None
        delta = fresh
    else:
        raise RuntimeError(f"transitive_closure: no fixpoint in {max_iters} rounds")
    out_type = tbl.schema.field(src).type
    return pa.table(
        {
            src: pc.cast(uniques.take(pa.array(closure // n)), out_type),
            dst: pc.cast(uniques.take(pa.array(closure % n)), out_type),
        }
    )


def transitive_closure(
    edges_ds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    method: str = "seminaive",
    num_partitions: int = 32,
    max_iters: int = 64,
    broadcast_limit: int = 2_000_000,
    local_pair_cap: int = 50_000_000,
) -> ray.data.Dataset:
    """Reachability closure: all (a, b) with a directed path a -> b of
    length >= 1 (SPARQL property-path ``p+`` / Datalog ancestor). Cycles
    are fine — a node on a cycle reaches itself and the result is the
    reachability SET, mirrored exactly by a recursive-CTE UNION.

    Dual-path (SURVEY §7 discipline): up to ``broadcast_limit`` distinct
    base pairs the whole recurrence runs as numpy kernels on the driver
    (factorized codes, packed int64 keys, searchsorted joins) — each
    distributed round costs ~2 shuffles of fixed overhead, ruinous for a
    hierarchy-sized relation. If the LOCAL closure outgrows
    ``local_pair_cap`` it is abandoned (loudly) for the distributed plan.

    Two distributed plans past the limit, parity-tested against each
    other, the local path and a brute-force binder
    (tests/test_graphalgo.py):

    - ``seminaive``: delta-join-base per round — new pairs =
      distinct(delta(a,m) JOIN base(m,b)) anti-joined against the
      closure-so-far. Work-efficient (every closure pair is produced by
      its shortest derivation; the exchange per round is delta-bounded),
      rounds = longest shortest-path length.
    - ``doubling``: R <- distinct(R UNION R(a,m) JOIN R(m,b)) —
      logarithmic rounds (ceil(log2 diameter) + 1) for latency-bound
      deep hierarchies, at the cost of re-deriving pairs each round.

    Scale note: the OUTPUT is the closure itself — Theta(V^2) on dense
    graphs. That is inherent to the operator, not the plan; the
    distributed plans stream it through bucketed shuffles without ever
    collecting pairs on the driver. ``max_iters`` bounds runaway inputs
    (raises past it).
    """
    from .relational import anti_join
    from .util import join_partitions

    if method not in ("seminaive", "doubling"):
        raise ValueError(f"unknown method {method!r}")
    base = _distinct_pairs(edges_ds, src, dst, num_partitions).materialize()
    n_base = base.count()
    if n_base == 0:
        return base

    if n_base <= broadcast_limit:
        tbl = pa.concat_tables(
            base.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        ).combine_chunks()
        local = _closure_local(tbl, src, dst, max_iters, local_pair_cap)
        if local is not None:
            return ray.data.from_arrow(local)
        logger.warning(
            "transitive_closure: local closure exceeded local_pair_cap=%d; "
            "falling back to the distributed %s plan", local_pair_cap, method,
        )

    def compose(left: ray.data.Dataset, n_left: int,
                right: ray.data.Dataset, n_right: int) -> ray.data.Dataset:
        """left(a, m) JOIN right(m, b) -> distinct (a, b)."""
        l = left.map_batches(
            lambda t: pa.table({"a_": _chunked(t[src]), "m_": _chunked(t[dst])}),
            batch_format="pyarrow",
        )
        r = right.map_batches(
            lambda t: pa.table({"m_": _chunked(t[src]), "b_": _chunked(t[dst])}),
            batch_format="pyarrow",
        )
        joined = l.join(
            r,
            join_type="inner",
            num_partitions=join_partitions(
                num_partitions, max(n_left, n_right)
            ),
            on=("m_",),
        ).map_batches(
            lambda t: pa.table({src: _chunked(t["a_"]), dst: _chunked(t["b_"])}),
            batch_format="pyarrow",
        )
        return _distinct_pairs(joined, src, dst, num_partitions)

    if method == "doubling":
        closure, n = base, n_base
        for _ in range(max_iters):
            squared = compose(closure, n, closure, n)
            closure = _distinct_pairs(
                closure.union(squared), src, dst, num_partitions
            ).materialize()
            n_new = closure.count()
            if n_new == n:
                return closure
            n = n_new
        raise RuntimeError(f"transitive_closure: no fixpoint in {max_iters} rounds")

    # the closure's key column gets a RESERVED name: past the broadcast
    # limit anti_join falls back to a marker hash join, and a right_on
    # name that collides with a left column breaks that arm
    def rekey(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(
            lambda t: pa.table({"__tc_key": _chunked(t["pair_key"])}),
            batch_format="pyarrow",
        )

    keyed = base.map_batches(
        lambda t: _pack_pair_key(t, src, dst), batch_format="pyarrow"
    ).materialize()
    closure_keys = rekey(keyed).materialize()
    closure = base
    delta, n_delta = base, n_base
    for _ in range(max_iters):
        new = compose(delta, n_delta, base, n_base).map_batches(
            lambda t: _pack_pair_key(t, src, dst), batch_format="pyarrow"
        )
        fresh = anti_join(
            new, closure_keys, "pair_key", "__tc_key",
            num_partitions=num_partitions,
        ).materialize()
        n_delta = fresh.count()
        if n_delta == 0:
            return closure
        delta = fresh.select_columns([src, dst]).materialize()
        closure = closure.union(delta).materialize()
        closure_keys = closure_keys.union(rekey(fresh)).materialize()
    raise RuntimeError(f"transitive_closure: no fixpoint in {max_iters} rounds")
