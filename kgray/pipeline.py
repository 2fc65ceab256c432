"""The flagship KG-construction pipeline (staged, checkpointed, resumable).

Ray-native analog of the reference's 5-stage checkpointed lifecycle
(`Kuzu/kuzu_build_graph_csv.py:621-753`: CONVERT -> CREATE_LUS -> BIN ->
CREATE_TABLES -> IMPORT, artifacts on disk between stages):

    transcripts (Parquet / generated)
      1. order      sort(conv_id, turn_idx)          [stable turn ordering]
      2. extract    map_batches(TripleExtractor)     [actor pool, Arrow]
      3. link       map_batches(EntityLinker)        [actor pool, broadcast dict]
      4. canonical  union-find over equivalent ids   [groupby shuffles]
      5. edges      partial-dedup + groupby          [(s,p,o) distinct]
      6. nodes      distinct endpoints + normalize   [M6/M7]
      7. write      partitioned Parquet (P1/P2) + lineage manifest

Each run writes per-stage manifests under ``<out_dir>/_manifests``; a rerun
with the same input fingerprint skips stages whose outputs already exist
(the ST4 pickle-checkpoint contract, `Kuzu:673-731`, as Parquet + JSON).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from . import canonicalize, extract, link, lookups, materialize
from .link import build_alias_index
from .materialize import catalog_index
from .metrics import StageMetrics
from .transcripts import entity_catalog, transcripts_dataset


LINKED_TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subject_mention", pa.string()),
        ("predicate", pa.string()),
        ("object_mention", pa.string()),
        ("subject_id", pa.string()),
        ("object_id", pa.string()),
        ("linked", pa.bool_()),
    ]
)


def _sort_turns_in_block(t: pa.Table) -> pa.Table:
    """Block-local (conv_id, turn_idx) sort — O(block log block), no
    shuffle; correct when conversations are block-contiguous (see
    ``KGPipeline.turn_order``)."""
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _partition_counts(ds: ray.data.Dataset, cols: "str | list[str]") -> dict:
    """Row count per output partition key (per-partition lineage). One
    combiner pass over cached blocks + driver merge of a key-cardinality-
    sized dict. Multi-column keys join with '/' (the partition-dir shape);
    a None component is preserved as the string 'None' so callers can see
    un-partitionable keys."""
    if isinstance(cols, str):
        cols = [cols]
    parts = ds.map_batches(
        lambda t, cs=cols: t.group_by(cs).aggregate([([cs[0]], "count")]).rename_columns(
            cs + ["n"]
        ),
        batch_format="pyarrow",
    )
    out: dict = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        keys = zip(*(b[c].to_pylist() for c in cols))
        for k, n in zip(keys, b["n"].to_pylist()):
            kk = "/".join(str(x) for x in k)
            out[kk] = out.get(kk, 0) + int(n)
    return out


def _partition_counts_local(tbl: pa.Table, cols: list[str]) -> dict:
    """``_partition_counts`` for a driver-resident table (size-routed
    tail) — one vectorized group_by, same 'a/b/c' key shape incl. the
    'None' marker for null components."""
    g = tbl.group_by(cols).aggregate([([cols[0]], "count")]).rename_columns(
        cols + ["n"]
    )
    keys = zip(*(g[c].to_pylist() for c in cols))
    return {
        "/".join(str(x) for x in k): int(n)
        for k, n in zip(keys, g["n"].to_pylist())
    }


def _ensure_parquet_dir(path: str, schema: pa.Schema) -> None:
    """write_parquet on an empty dataset writes no files; give readers an
    empty-but-typed table so the pipeline degrades gracefully."""
    import pyarrow.parquet as pq

    has_files = os.path.isdir(path) and any(
        f.endswith(".parquet") for _, _, files in os.walk(path) for f in files
    )
    if not has_files:
        os.makedirs(path, exist_ok=True)
        pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))


class KGPipeline:
    def __init__(
        self,
        out_dir: str,
        catalog=None,
        rules=None,
        extract_concurrency=None,
        resume: bool = True,
        turn_order: str = "local",
        checkpoint_memory_reuse: bool = True,
        max_edge_partitions: int = 4096,
        tail_local_limit: int = 2_000_000,
    ):
        """``turn_order`` — how the stable (conv_id, turn_idx) ordering is
        enforced before extraction:

        - ``'local'`` (default): sort within each block. Correct whenever
          conversations are block-contiguous — true for the generated
          corpus and for any transcript store partitioned/bucketed by
          conv_id (the only layout that makes sense at 10^12-turn scale;
          a global corpus sort would be an all-to-all over everything).
        - ``'global'``: full ``Dataset.sort`` — for arbitrary unpartitioned
          inputs where conversations span blocks.
        - ``'none'``: input is already ordered.

        ``checkpoint_memory_reuse``: keep the linked-triple blocks pinned in
        the object store and feed downstream stages from memory (default —
        right whenever the triple set fits the store). Set False for runs
        whose triple volume would force heavy plasma spilling: the
        checkpoint is then written streaming and read back once from disk
        instead of being spilled AND read.

        ``max_edge_partitions``: cap on the (predicate, subject_class,
        object_class) partition count for the full P2 edge layout
        (`Kuzu:344`); past it — or when any class is null — the write
        falls back to predicate-only binning (skew/explosion guard).

        ``tail_local_limit``: size route for the post-dedup tail (node
        build + class tagging + partitioned write). The deduped edge table
        is distinct-triple-bounded — orders smaller than the turn stream —
        and at/below this row count the tail runs driver-local (vectorized
        Arrow kernels + one flat task round for the write) instead of 4+
        Ray stage executions whose fixed scheduling cost dominates at that
        size. Beyond the limit the distributed path is unchanged (the
        100-TB route). 2M edges ≈ 200 MB driver heap.
        """
        self.out_dir = out_dir
        self.catalog = catalog if catalog is not None else entity_catalog()
        self.rules = rules
        self.extract_concurrency = extract_concurrency
        self.resume = resume
        self.turn_order = turn_order
        self.checkpoint_memory_reuse = checkpoint_memory_reuse
        self.max_edge_partitions = max_edge_partitions
        self.tail_local_limit = tail_local_limit
        self.metrics = StageMetrics(run_id=os.path.basename(out_dir.rstrip("/")))

    # -- checkpoint manifests -------------------------------------------------
    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, "_manifests", f"{stage}.json")

    def _done(self, stage: str, fingerprint: str) -> bool:
        p = self._manifest_path(stage)
        if not (self.resume and os.path.exists(p)):
            return False
        with open(p) as f:
            return json.load(f).get("fingerprint") == fingerprint

    def _mark_done(self, stage: str, fingerprint: str, **extra) -> None:
        p = self._manifest_path(stage)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "fingerprint": fingerprint, **extra}, f)
        os.replace(tmp, p)

    @staticmethod
    def _read_blocks() -> int:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        return max(32, 2 * cpus)

    # -- stages ---------------------------------------------------------------
    def run(
        self, transcripts: ray.data.Dataset, fingerprint: str = "",
        stop_after: str | None = None,
    ) -> dict:
        """Execute end-to-end; returns output paths + metrics.

        ``stop_after='triples'`` runs only the extract+link stages and their
        checkpoint — the CLI's CONVERT stage (reference `--type` selector,
        `Kuzu/kuzu_build_graph_csv.py:644-693`)."""
        m = self.metrics
        edge_out = os.path.join(self.out_dir, "edges")
        node_out = os.path.join(self.out_dir, "nodes")

        if self._done("write", fingerprint):
            m.record("write", skipped=True)
            return {"nodes": node_out, "edges": edge_out, "metrics": m.to_dict(),
                    "resumed": True}

        triples_dir = os.path.join(self.out_dir, "triples")

        # stages 1-3 checkpoint: linked triples as a Parquet stage artifact
        # (the Ray-native form of the reference's between-stage files/pickles,
        # Kuzu:673-731) — written once, streamed twice below.
        if not self._done("triples", fingerprint):
            # 1. stable turn ordering (per-turn text equality invariant)
            with m.time_stage("order"):
                if self.turn_order == "global":
                    ordered = transcripts.sort(["conv_id", "turn_idx"])
                elif self.turn_order == "local":
                    ordered = transcripts.map_batches(
                        _sort_turns_in_block, batch_format="pyarrow"
                    )
                else:
                    ordered = transcripts

            # 2. rule/pattern triple extraction (actor pool, zero-copy Arrow)
            with m.time_stage("extract"):
                triples = extract.extract_triples(
                    ordered, rules=self.rules, concurrency=self.extract_concurrency
                )

            # 3. entity linking against the broadcast alias index; unlinked
            #    rows are KEPT in the artifact (linked=false) for accounting
            with m.time_stage("link"):
                alias_ref = lookups.broadcast(build_alias_index(self.catalog))
                linked_all = link.link_entities(triples, alias_ref)
                if self.checkpoint_memory_reuse:
                    # materialize once: the blocks feed BOTH the checkpoint
                    # write and the downstream stages (no same-run
                    # write->read round trip)
                    linked_mat = linked_all.materialize()
                    linked_mat.write_parquet(
                        triples_dir, mode="overwrite", max_rows_per_file=1 << 18
                    )
                else:
                    # spill-avoidance path for triple sets >> object store:
                    # stream straight to the checkpoint, read back below
                    linked_mat = None
                    linked_all.write_parquet(
                        triples_dir, mode="overwrite", max_rows_per_file=1 << 18
                    )
                _ensure_parquet_dir(triples_dir, LINKED_TRIPLE_SCHEMA)
            self._mark_done("triples", fingerprint)
        else:
            m.record("extract", skipped=True)
            linked_mat = None

        if stop_after == "triples":
            m.write(self.out_dir)
            return {"triples": triples_dir, "metrics": m.to_dict(), "resumed": False}

        if linked_mat is None:
            # resume path: stream the checkpoint. It is small on disk
            # (dictionary+snappy) but fans out ~20x in memory; without an
            # explicit block override Ray sizes the read by FILE bytes and
            # packs it into a handful of tasks, pinning the downstream
            # chain to a few cores
            linked_mat = ray.data.read_parquet(
                triples_dir, override_num_blocks=self._read_blocks()
            )
        linked = linked_mat.map_batches(
            lambda t: t.filter(t["linked"].combine_chunks()), batch_format="pyarrow"
        )

        # 4. canonicalization: union-find over equivalent identifiers of the
        #    catalog, applied to edge endpoints via broadcast rewrite
        with m.time_stage("canonicalize"):
            # catalog is driver-resident -> pure-python union-find, zero
            # Dataset executions; Dataset path kicks in past local_limit
            canon = canonicalize.canonical_map(
                self.catalog.select(["id", "equivalent_identifiers"])
            )
            canonical_triples = canonicalize.rewrite_ids(linked, canon)

        # 5. edge table: partial-dedup combine + one (s,p,o) bucket shuffle.
        #    The deduped edge table is orders smaller than the triple
        #    stream — materialize it once and derive everything downstream
        #    (nodes, class lookup, tagging) from it instead of re-scanning
        #    the triples.
        with m.time_stage("edges"):
            edges = materialize.build_edges(canonical_triples).materialize()
            edges_pre_tag_count = edges.count()

        # 6. node table: distinct edge endpoints + M6/M7 normalization;
        #    then tag edges with endpoint classes (J1) for the layout.
        # 7. partitioned writes + metrics. Edges get the reference's FULL
        #    P2 layout — (predicate, subject_class, object_class) bins,
        #    `Kuzu/kuzu_build_graph_csv.py:344` — guarded: fall back to
        #    predicate-only when the triple key would explode the partition
        #    count or contains nulls (un-partitionable keys).
        #
        # Both stages are SIZE-ROUTED on the deduped edge count (the same
        # discipline as broadcast_lookup_join): at/under tail_local_limit
        # the whole tail is driver-vectorized + one flat write-task round;
        # beyond it the distributed Dataset path runs unchanged.
        triple_cols = ["predicate", "subject_class", "object_class"]
        from .metrics import partition_skew
        from .schema import EDGE_SCHEMA, NODE_SCHEMA

        if 0 < edges_pre_tag_count <= self.tail_local_limit:
            with m.time_stage("nodes"):
                # iter_batches (not to_arrow_refs): blocks may be pandas
                # after the bucketed dedup; this converts per block
                edges_tbl = pa.concat_tables(
                    edges.iter_batches(batch_format="pyarrow", batch_size=None)
                )
                nodes_tbl = materialize.build_nodes_local(
                    edges_tbl, catalog_index(self.catalog)
                )
                class_lookup = dict(
                    zip(
                        nodes_tbl["id"].to_pylist(),
                        nodes_tbl["primary_class"].to_pylist(),
                    )
                )
                edges_tbl = materialize.tag_edge_classes_local(
                    edges_tbl, class_lookup
                )
            with m.time_stage("write"):
                triple_counts = _partition_counts_local(edges_tbl, triple_cols)
                use_classes = (
                    0 < len(triple_counts) <= self.max_edge_partitions
                    and not any("None" in k.split("/") for k in triple_counts)
                )
                paths = materialize.write_graph_local(
                    nodes_tbl, edges_tbl, self.out_dir,
                    partition_edges_by_classes=use_classes,
                )
                _ensure_parquet_dir(paths["nodes"], NODE_SCHEMA)
                _ensure_parquet_dir(paths["edges"], EDGE_SCHEMA)
                n_nodes = nodes_tbl.num_rows
                n_edges = edges_pre_tag_count
                node_parts = _partition_counts_local(nodes_tbl, ["primary_class"])
                edge_parts = (
                    triple_counts
                    if use_classes
                    else _partition_counts_local(edges_tbl, ["predicate"])
                )
                m.record(
                    "write", n_nodes=n_nodes, n_edges=n_edges,
                    edge_layout=triple_cols if use_classes else ["predicate"],
                    node_partitions=node_parts, edge_partitions=edge_parts,
                    node_skew=partition_skew(list(node_parts.values())),
                    edge_skew=partition_skew(list(edge_parts.values())),
                    tail_local=True,
                )
        else:
            with m.time_stage("nodes"):
                cat_ref = lookups.broadcast(catalog_index(self.catalog))
                nodes = materialize.build_nodes(edges, cat_ref).materialize()
                class_ref = lookups.broadcast(lookups.node_class_lookup(nodes))
                # materialize the tagged table once: the partition-count pass
                # and the write both consume it (the deduped table is small)
                edges = materialize.tag_edge_classes(edges, class_ref).materialize()

            with m.time_stage("write"):
                triple_counts = _partition_counts(edges, triple_cols)
                use_classes = (
                    0 < len(triple_counts) <= self.max_edge_partitions
                    and not any("None" in k.split("/") for k in triple_counts)
                )
                paths = materialize.write_graph(
                    nodes, edges, self.out_dir,
                    partition_edges_by_classes=use_classes,
                )
                _ensure_parquet_dir(paths["nodes"], NODE_SCHEMA)
                _ensure_parquet_dir(paths["edges"], EDGE_SCHEMA)
                # counts come from the already-materialized datasets (cached
                # metadata, no extra execution); tagging keeps row counts
                n_nodes = nodes.count()
                n_edges = edges_pre_tag_count
                # per-partition lineage + skew (cheap: blocks already cached)
                node_parts = _partition_counts(nodes, "primary_class")
                edge_parts = (
                    triple_counts
                    if use_classes
                    else _partition_counts(edges, "predicate")
                )
                m.record(
                    "write", n_nodes=n_nodes, n_edges=n_edges,
                    edge_layout=triple_cols if use_classes else ["predicate"],
                    node_partitions=node_parts, edge_partitions=edge_parts,
                    node_skew=partition_skew(list(node_parts.values())),
                    edge_skew=partition_skew(list(edge_parts.values())),
                )

        # drop accounting (J2: count, never silently truncate) — ONE pass
        # over the cached linked column computing both totals
        art = linked_mat.select_columns(["linked"])
        sums = art.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array([t.num_rows], type=pa.int64()),
                    "n_linked": pa.array(
                        [pc.sum(t["linked"]).as_py() or 0], type=pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ).sum(["n", "n_linked"]) or {}
        # Dataset.sum returns None (not a dict) when no blocks are produced
        n_triples = sums.get("sum(n)", 0) or 0
        n_linked = sums.get("sum(n_linked)", 0) or 0
        m.record("link", triples_in=n_triples, linked=n_linked,
                 dropped_unlinked=n_triples - n_linked,
                 link_rate=round(n_linked / n_triples, 4) if n_triples else 1.0)

        m.write(self.out_dir)
        self._mark_done("write", fingerprint, n_nodes=n_nodes, n_edges=n_edges)
        return {"nodes": paths["nodes"], "edges": paths["edges"],
                "metrics": m.to_dict(), "resumed": False}


def run_flagship(sf_dir: str, out_dir: str, repeat: int = 1, resume: bool = True) -> dict:
    """Generate the transcript corpus for ``sf_dir`` and run the pipeline."""
    transcripts = transcripts_dataset(sf_dir, repeat=repeat)
    pipe = KGPipeline(out_dir=out_dir, resume=resume)
    return pipe.run(transcripts, fingerprint=f"{sf_dir}|repeat={repeat}")


def snapshot_diff(old_dir: str, new_dir: str) -> dict:
    """Edge-level diff between two graph outputs: added / removed edge
    counts via two key-only anti joins — only the pruned ``edge_uid``
    column is ever read or shuffled, so diffing two 100-TB-scale outputs
    moves key streams, not edge payloads."""
    from . import relational

    old = ray.data.read_parquet(f"{old_dir}/edges", columns=["edge_uid"])
    new = ray.data.read_parquet(f"{new_dir}/edges", columns=["edge_uid"])
    added = relational.anti_join(new, old, "edge_uid", "edge_uid").count()
    removed = relational.anti_join(old, new, "edge_uid", "edge_uid").count()
    return {"added_edges": added, "removed_edges": removed}


def update_graph(
    out_dir: str,
    new_transcripts: ray.data.Dataset,
    catalog=None,
    rules=None,
    turn_order: str = "local",
) -> dict:
    """Incremental append: run extract → link → canonicalize → dedup on a
    DELTA of transcripts and merge the result into an EXISTING graph
    output, never rewriting a finished partition.

    New candidate edges are anti-joined against the existing edge ``uid``
    set (key-only: the existing table contributes one pruned column, and
    the marker join size-routes broadcast-vs-shuffle); candidate nodes
    likewise against existing ``id``. Class tags for the fresh edges come
    from existing ∪ fresh nodes so an endpoint whose node row already
    exists still tags correctly. Files APPEND into the same hive layout
    (``write_parquet`` SaveMode.APPEND — existing files untouched; the
    layout — full triple vs predicate-only — is detected from the dirs on
    disk), and ``lineage.json`` gains an ``update`` record with the
    new/duplicate edge accounting. Union semantics are idempotent:
    re-applying the same delta adds zero rows.

    The CDC half of the reference's per-partition import loop (P4): the
    reference re-imports whole files; here only never-seen (s, p, o)
    edges and never-seen endpoints touch the sink.
    """
    import glob as _glob

    from . import relational
    from .materialize import build_edges, build_nodes, tag_edge_classes

    catalog = catalog if catalog is not None else entity_catalog()
    m = StageMetrics(run_id=f"update:{os.path.basename(out_dir.rstrip('/'))}")
    edge_dir = f"{out_dir}/edges"
    node_dir = f"{out_dir}/nodes"

    with m.time_stage("delta_extract"):
        if turn_order == "global":
            ordered = new_transcripts.sort(["conv_id", "turn_idx"])
        elif turn_order == "local":
            ordered = new_transcripts.map_batches(
                _sort_turns_in_block, batch_format="pyarrow"
            )
        else:
            ordered = new_transcripts
        triples = extract.extract_triples(ordered, rules=rules)
        alias_ref = lookups.broadcast(build_alias_index(catalog))
        linked = link.link_entities(triples, alias_ref).map_batches(
            lambda t: t.filter(t["linked"].combine_chunks()), batch_format="pyarrow"
        )
        canon = canonicalize.canonical_map(
            catalog.select(["id", "equivalent_identifiers"])
        )
        cand_edges = build_edges(canonicalize.rewrite_ids(linked, canon)).materialize()

    with m.time_stage("dedup_vs_existing"):
        existing_uids = ray.data.read_parquet(edge_dir, columns=["edge_uid"])
        fresh_edges = relational.anti_join(
            cand_edges, existing_uids, "edge_uid", "edge_uid"
        ).materialize()
        n_cand = cand_edges.count()
        n_fresh = fresh_edges.count()

        cat_ref = lookups.broadcast(catalog_index(catalog))
        cand_nodes = build_nodes(fresh_edges, cat_ref)
        existing_node_keys = ray.data.read_parquet(node_dir, columns=["id"])
        fresh_nodes = relational.anti_join(
            cand_nodes, existing_node_keys, "id", "id"
        ).materialize()
        n_new_nodes = fresh_nodes.count()

    with m.time_stage("append"):
        # class lookup over existing ∪ fresh nodes: endpoints whose node
        # rows predate this delta still tag with their real class
        existing_min = ray.data.read_parquet(
            node_dir, columns=["id", "primary_class"]
        )
        lookup = lookups.node_class_lookup(existing_min)
        lookup.update(lookups.node_class_lookup(fresh_nodes))
        class_ref = lookups.broadcast(lookup)
        tagged = tag_edge_classes(fresh_edges, class_ref)
        # match the layout already on disk
        use_classes = bool(_glob.glob(f"{edge_dir}/predicate=*/subject_class=*"))
        if n_new_nodes:
            fresh_nodes.write_parquet(node_dir, partition_cols=["primary_class"])
        if n_fresh:
            part_cols = ["predicate"] + (
                ["subject_class", "object_class"] if use_classes else []
            )
            if use_classes:
                tagged = relational.hash_bucketed_groupby(
                    tagged, part_cols, lambda df: df, num_buckets=32
                )
            tagged.write_parquet(edge_dir, partition_cols=part_cols)
        paths = {"nodes": node_dir, "edges": edge_dir}

    m.record(
        "update", candidate_edges=n_cand, new_edges=n_fresh,
        duplicate_edges_skipped=n_cand - n_fresh, new_nodes=n_new_nodes,
        edge_layout=(
            ["predicate", "subject_class", "object_class"]
            if use_classes else ["predicate"]
        ),
    )
    # fold the update record into the existing lineage file
    lineage_path = os.path.join(out_dir, "lineage.json")
    doc = {}
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            doc = json.load(f)
    doc.setdefault("updates", []).append(m.to_dict())
    with open(lineage_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    return {
        "nodes": paths["nodes"], "edges": paths["edges"],
        "new_edges": n_fresh, "duplicate_edges_skipped": n_cand - n_fresh,
        "new_nodes": n_new_nodes, "metrics": m.to_dict(),
    }


def _graph_partition_dirs(root: str):
    """Yield every hive partition dir under ``root`` holding parquet
    files (dot-dirs — staging areas — excluded)."""
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        if any(f.endswith(".parquet") for f in filenames):
            yield dirpath


def _commit_partition(part: str, tmp: str) -> int:
    """Finish a staged partition rewrite. Re-entrant: a crash can land
    between any two steps below and a re-run must converge. Two rules
    make that safe: (1) never unlink a file whose basename is in the
    staged set — after a partial commit those very files sit in ``part``
    and ARE the data; (2) a staged file missing from tmp was already
    moved, so require it to exist at the destination instead of
    replacing."""
    import glob as _glob
    import shutil as _shutil

    with open(os.path.join(tmp, "_COMMIT")) as f:
        staged = set(json.load(f)["files"])
    for old in _glob.glob(os.path.join(part, "*.parquet")):
        if os.path.basename(old) not in staged:
            os.unlink(old)
    for name in staged:
        src, dst = os.path.join(tmp, name), os.path.join(part, name)
        if os.path.exists(src):
            os.replace(src, dst)
        elif not os.path.exists(dst):
            raise RuntimeError(
                f"commit lost staged file {name!r} in {part}: "
                "missing from both tmp and partition"
            )
    _shutil.rmtree(tmp)
    return len(staged)


def _write_commit_marker(tmp: str, staged: list, n_rows: int) -> None:
    """fsync marker + its dir so recovery can trust: readable marker ->
    staging finished before any unlink; torn/absent marker -> the commit
    phase provably never started and tmp is discardable."""
    path = os.path.join(tmp, "_COMMIT")
    with open(path, "w") as f:
        json.dump({"files": staged, "rows": n_rows}, f)
        f.flush()
        os.fsync(f.fileno())
    dfd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _recover_partition(part: str, tmp: str) -> bool:
    """Converge a partition that has a leftover staging dir. Returns True
    when an interrupted COMMIT was finished (partition is now the staged
    content); False when staged-only work was discarded (old files whole,
    caller should redo its rewrite)."""
    import shutil as _shutil

    marker = os.path.join(tmp, "_COMMIT")
    staged_meta = None
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                staged_meta = json.load(f)
        except (json.JSONDecodeError, ValueError):
            staged_meta = None  # torn marker: commit provably never started
    if staged_meta is not None:
        _commit_partition(part, tmp)
        return True
    _shutil.rmtree(tmp)
    return False


def compact_graph(
    out_dir: str,
    target_rows_per_file: int = 1_000_000,
    min_files: int = 2,
) -> dict:
    """Small-file compaction for a graph output that has absorbed
    incremental deltas (every ``update_graph`` APPEND adds files): rewrite
    each hive partition dir holding more parquet files than its row count
    needs into ``ceil(rows / target_rows_per_file)`` files.

    The unit of work, failure and restart is ONE partition dir — exactly
    the resumability grain of the write manifests — so a crashed
    compaction never poisons the table:

    1. stage:  rewrite the partition into ``<part>/.compact_tmp/`` and
       fsync a ``_COMMIT`` marker holding the staged file list;
    2. commit: unlink the old files, move staged files in, drop the tmp.

    Recovery on re-run: tmp without ``_COMMIT`` -> discard tmp and redo
    (old files still complete); tmp with ``_COMMIT`` -> finish the commit
    (old files may be partially gone; the staged set is the truth).
    Readers (pyarrow / Ray ``read_parquet``) ignore dot-directories, so a
    concurrent read during staging still sees exactly the old content.

    Mirrors the maintenance half of the reference's per-partition import
    loop (P4, `Kuzu/kuzu_build_graph_csv.py` per-bin files): the reference
    re-emits whole bins; here only over-fragmented partitions rewrite.
    """
    import glob as _glob
    import shutil as _shutil

    _partition_dirs = _graph_partition_dirs
    _commit = _commit_partition
    _write_marker = _write_commit_marker

    report = {"partitions_compacted": 0, "files_before": 0, "files_after": 0,
              "partitions_skipped": 0, "rows": 0}
    for root in (os.path.join(out_dir, "nodes"), os.path.join(out_dir, "edges")):
        if not os.path.isdir(root):
            continue
        for part in _partition_dirs(root):
            tmp = os.path.join(part, ".compact_tmp")
            if os.path.isdir(tmp):
                marker = os.path.join(tmp, "_COMMIT")
                staged_meta = None
                if os.path.exists(marker):
                    try:
                        with open(marker) as f:
                            staged_meta = json.load(f)
                    except (json.JSONDecodeError, ValueError):
                        # torn marker: it is fsynced before any unlink, so
                        # an unreadable one proves the commit never started
                        staged_meta = None
                if staged_meta is not None:
                    n_after = _commit(part, tmp)  # finish interrupted commit
                    report["partitions_compacted"] += 1
                    report["files_after"] += n_after
                    continue
                _shutil.rmtree(tmp)  # staged-only crash: old files are whole
            files = sorted(_glob.glob(os.path.join(part, "*.parquet")))
            # partitioning=None: the hive key lives in the DIR NAME; letting
            # the reader infer it would bake a physical column into the
            # rewritten files and fork the schema against the old ones
            ds = (
                ray.data.read_parquet(files, partitioning=None) if files else None
            )
            n_rows = ds.count() if ds is not None else 0
            want = max(1, -(-n_rows // target_rows_per_file))
            if len(files) < min_files or want >= len(files):
                report["partitions_skipped"] += 1
                continue
            ds.repartition(want).write_parquet(tmp)
            staged = sorted(os.path.basename(p)
                            for p in _glob.glob(os.path.join(tmp, "*.parquet")))
            _write_marker(tmp, staged, n_rows)
            report["partitions_compacted"] += 1
            report["files_before"] += len(files)
            report["files_after"] += _commit(part, tmp)
            report["rows"] += n_rows

    lineage_path = os.path.join(out_dir, "lineage.json")
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            doc = json.load(f)
        doc.setdefault("compactions", []).append(report)
        with open(lineage_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    return report


def retract_edges(
    out_dir: str,
    retractions: "ray.data.Dataset | pa.Table",
    broadcast_limit: int = 5_000_000,
) -> dict:
    """CDC DELETE for the graph output: remove every edge whose
    ``edge_uid`` appears in the retraction feed — the maintenance verb
    the create/append (``update_graph``)/compact lifecycle was missing
    (a source document withdrawn, a triple ruled wrong downstream).

    Only partitions that actually HOLD a retracted uid rewrite, and each
    rewrite uses the same stage → fsynced ``_COMMIT`` → swap machinery as
    ``compact_graph``, so a crash mid-retraction never poisons the table
    and a re-run converges (idempotent: re-applying the same feed removes
    zero rows).

    Routing: a retraction feed is delta-sized, so up to
    ``broadcast_limit`` uids it collects to ONE driver set broadcast via
    ``ray.put`` and membership is a vectorized ``is_in`` per batch; a
    larger feed falls back to ``relational.anti_join`` per affected
    partition (key-only, itself size-routed). Node rows are untouched —
    an endpoint that loses its last edge remains a valid catalog node;
    orphan GC is a separate policy decision.
    """
    import glob as _glob

    from . import relational

    if isinstance(retractions, pa.Table):
        retr_ds = ray.data.from_arrow(retractions.select(["edge_uid"]))
    else:
        retr_ds = retractions.select_columns(["edge_uid"])
    retr_ds = retr_ds.materialize()
    n_retr = retr_ds.count()

    uid_set = None
    if n_retr <= broadcast_limit:
        chunks = [
            b["edge_uid"].combine_chunks()
            if isinstance(b["edge_uid"], pa.ChunkedArray) else b["edge_uid"]
            for b in retr_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 18)
            if "edge_uid" in b.schema.names
        ]
        uid_set = (
            pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                              else c for c in chunks]).unique()
            if chunks else pa.array([], type=pa.string())
        )
        set_ref = ray.put(uid_set)

    report = {
        "uids_requested": n_retr, "edges_removed": 0,
        "partitions_rewritten": 0, "partitions_affected": 0,
    }
    edge_root = os.path.join(out_dir, "edges")

    # converge any interrupted commits FIRST (cheap dir walk, no Datasets)
    for part in _graph_partition_dirs(edge_root):
        tmp = os.path.join(part, ".retract_tmp")
        if os.path.isdir(tmp) and _recover_partition(part, tmp):
            report["partitions_rewritten"] += 1

    # ONE corpus scan locates the affected partitions: every edge row
    # carries its source file path, the retraction filter keeps the hits,
    # and the distinct parent dirs (bounded by the feed size) come back to
    # the driver — NOT a per-partition scan loop, which pays a fixed
    # Dataset execution per hive bin (thousands under the P2 layout)
    all_edges = ray.data.read_parquet(edge_root, include_paths=True)

    def hit_paths(t: pa.Table, _r=set_ref if uid_set is not None else None):
        col = (
            t["edge_uid"].combine_chunks()
            if isinstance(t["edge_uid"], pa.ChunkedArray) else t["edge_uid"]
        )
        if _r is not None:
            m = pc.is_in(col, value_set=ray.get(_r))
            t = t.filter(m)
        return pa.table({"path": t["path"]})

    if uid_set is not None:
        hits = all_edges.map_batches(hit_paths, batch_format="pyarrow")
    else:
        hits = relational.semi_join(
            all_edges, retr_ds, on="edge_uid", right_on="edge_uid"
        ).map_batches(hit_paths, batch_format="pyarrow")
    hit_files: set = set()
    for b in hits.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        if "path" in b.schema.names:
            hit_files.update(b["path"].to_pylist())
    affected = sorted({os.path.dirname(p) for p in hit_files})
    report["partitions_affected"] = len(affected)

    for part in affected:
        tmp = os.path.join(part, ".retract_tmp")
        files = sorted(_glob.glob(os.path.join(part, "*.parquet")))
        if not files:
            continue
        full = ray.data.read_parquet(files, partitioning=None)
        n_before = full.count()
        if uid_set is not None:

            def drop(t: pa.Table, _r=set_ref) -> pa.Table:
                col = (
                    t["edge_uid"].combine_chunks()
                    if isinstance(t["edge_uid"], pa.ChunkedArray)
                    else t["edge_uid"]
                )
                return t.filter(
                    pc.invert(pc.is_in(col, value_set=ray.get(_r)))
                )

            kept = full.map_batches(drop, batch_format="pyarrow")
        else:
            kept = relational.anti_join(
                full, retr_ds, on="edge_uid", right_on="edge_uid"
            )
        kept = kept.materialize()
        n_kept = kept.count()
        if n_kept:
            kept.write_parquet(tmp)
        else:
            os.makedirs(tmp, exist_ok=True)  # partition becomes empty
        staged = sorted(
            os.path.basename(p) for p in _glob.glob(os.path.join(tmp, "*.parquet"))
        )
        _write_commit_marker(tmp, staged, n_kept)
        _commit_partition(part, tmp)
        report["partitions_rewritten"] += 1
        report["edges_removed"] += n_before - n_kept

    lineage_path = os.path.join(out_dir, "lineage.json")
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            doc = json.load(f)
        doc.setdefault("retractions", []).append(report)
        with open(lineage_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    return report


# ---------------------------------------------------------------------------
# SPARQL UPDATE -> CDC: the text front-end for the incremental verbs.
# INSERT DATA appends ground edges through the same anti-join/append
# machinery as update_graph; DELETE DATA / DELETE WHERE compile to
# retract_edges' staged-partition rewrite. Reference anchor: the
# reference mutates its store only by re-importing files
# (SURVEY §2 P4); kgray exposes the standard SPARQL update verbs over
# the same partition-safe CDC plumbing.
# ---------------------------------------------------------------------------


#: INSERT ... WHERE instantiations collect to a driver list for the
#: validated insert path; past this cap the derivation is bulk-sized
#: and belongs to CONSTRUCT + update_graph, said loudly.
INSERT_WHERE_ROW_CAP = 100_000


def insert_triples(out_dir: str, triples) -> dict:
    """INSERT DATA executor: ground ``(subject, predicate, object)``
    rows -> edge table append.

    Semantics (loud, by design): endpoints must ALREADY exist in the
    node table — this store's nodes come from the entity catalog
    (linker J2 discipline), so an insert naming an unknown entity is
    refused with the missing ids rather than silently minting
    unclassed nodes. Inserted edges carry
    ``primary_knowledge_source='sparql:insert_data'`` for lineage,
    dedupe against existing ``edge_uid``s (idempotent: re-running the
    same INSERT adds zero rows), tag classes from the node table, and
    APPEND into whatever hive layout is on disk — existing files are
    never touched."""
    import glob as _glob

    from . import relational
    from .materialize import edge_uid, tag_edge_classes

    triples = [tuple(map(str, t)) for t in triples]
    if not triples:
        raise ValueError("insert_triples: empty triple list")
    edge_dir = f"{out_dir}/edges"
    node_dir = f"{out_dir}/nodes"

    need = sorted({t[0] for t in triples} | {t[2] for t in triples})
    need_arr = pa.array(need, pa.string())
    known = set()
    node_min = ray.data.read_parquet(
        node_dir, columns=["id", "primary_class"]
    )
    hits = node_min.map_batches(
        lambda t, _n=need_arr: t.filter(
            pc.is_in(
                t["id"].combine_chunks()
                if isinstance(t["id"], pa.ChunkedArray) else t["id"],
                value_set=_n,
            )
        ),
        batch_format="pyarrow",
    ).take_all()  # bounded by the insert's own endpoint count
    lookup = {r["id"]: r["primary_class"] for r in hits}
    known = set(lookup)
    missing = [x for x in need if x not in known]
    if missing:
        raise ValueError(
            f"INSERT DATA names {len(missing)} endpoint(s) not in the "
            f"node table (first 10: {missing[:10]}) — this store's "
            "nodes come from the entity catalog; load them first "
            "(update_graph) or fix the ids"
        )

    subj = pa.array([t[0] for t in triples], pa.string())
    pred = pa.array([t[1] for t in triples], pa.string())
    obj = pa.array([t[2] for t in triples], pa.string())
    cand = pa.table(
        {
            "subject": subj, "predicate": pred, "object": obj,
            "edge_uid": edge_uid(subj, pred, obj),
            "primary_knowledge_source": pa.array(
                ["sparql:insert_data"] * len(triples), pa.string()
            ),
            "n_mentions": pa.array([1] * len(triples), pa.int64()),
            "first_conv_id": pa.array(
                ["sparql:insert_data"] * len(triples), pa.string()
            ),
            "first_turn_idx": pa.array([-1] * len(triples), pa.int32()),
        }
    )
    cand_ds = ray.data.from_arrow(cand)
    existing_uids = ray.data.read_parquet(edge_dir, columns=["edge_uid"])
    fresh = relational.anti_join(
        cand_ds, existing_uids, "edge_uid", "edge_uid"
    ).materialize()
    n_fresh = fresh.count()
    use_classes = bool(
        _glob.glob(f"{edge_dir}/predicate=*/subject_class=*")
    )
    if n_fresh:
        tagged = tag_edge_classes(fresh, lookups.broadcast(lookup))
        part_cols = ["predicate"] + (
            ["subject_class", "object_class"] if use_classes else []
        )
        tagged.write_parquet(edge_dir, partition_cols=part_cols)

    report = {
        "op": "insert_data", "candidate_edges": len(triples),
        "new_edges": n_fresh,
        "duplicate_edges_skipped": len(triples) - n_fresh,
    }
    lineage_path = os.path.join(out_dir, "lineage.json")
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            doc = json.load(f)
        doc.setdefault("updates", []).append(report)
        with open(lineage_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    return report


def run_sparql_update(out_dir: str, text: str, num_partitions: int = 32) -> dict:
    """Execute a SPARQL UPDATE string against a built graph layout:

    - ``INSERT DATA { s p o . ... }`` -> :func:`insert_triples`
    - ``DELETE DATA { s p o . ... }`` -> uid-hash the ground triples,
      :func:`retract_edges`
    - ``DELETE WHERE { patterns }``   -> match the patterns over the
      edge table (constants + variables, constant predicates), uid-hash
      every matched triple, :func:`retract_edges`
    - ``INSERT { tmpl } WHERE { pats }`` (SPARQL 1.1 templated) ->
      solutions instantiate the template; the distinct asserted set
      (capped at :data:`INSERT_WHERE_ROW_CAP` — past it the derivation
      is bulk-sized and belongs to CONSTRUCT + ``update_graph``) goes
      through :func:`insert_triples`
    - ``DELETE { tmpl } WHERE { pats }`` -> instantiated template
      triples stream uid-hashed into :func:`retract_edges`

    Every verb rides the existing CDC machinery — appends never rewrite
    finished partitions, deletes stage + fsync ``_COMMIT`` + swap only
    the partitions that hold a retracted uid, and every verb is
    idempotent. Returns the verb's report dict."""
    from .materialize import edge_uid
    from .sparql import SparqlError, parse_sparql

    q = parse_sparql(text)
    form = q.get("form")
    if form == "insert_data":
        return insert_triples(out_dir, q["triples"])
    if form == "delete_data":
        s = pa.array([t[0] for t in q["triples"]], pa.string())
        p = pa.array([t[1] for t in q["triples"]], pa.string())
        o = pa.array([t[2] for t in q["triples"]], pa.string())
        feed = pa.table({"edge_uid": edge_uid(s, p, o)})
        return retract_edges(out_dir, feed)
    if form in ("delete_where", "insert_where", "delete_tmpl_where"):
        from . import bgp
        from .materialize import decode_hive_predicates

        edges = ray.data.read_parquet(
            f"{out_dir}/edges", columns=["subject", "predicate", "object"]
        ).map_batches(decode_hive_predicates, batch_format="pyarrow")
        # run the WHERE match once, then instantiate each template (or
        # pattern, for the bare DELETE WHERE form) triple with every
        # solution — SPARQL update semantics: the instantiated set is
        # what's asserted/retracted
        template = q.get("template") or q["patterns"]
        sol = bgp.bgp_match(edges, q["patterns"],
                            num_partitions=num_partitions)
        bound = set(sol.schema().names)
        missing = sorted({
            str(t)[1:]
            for tri in template for t in tri
            if str(t).startswith("?") and str(t)[1:] not in bound
        })
        if missing:
            raise SparqlError(
                f"template variables {missing} are not bound by the "
                f"WHERE patterns (bound: {sorted(bound)})"
            )

        def instantiate(t: pa.Table) -> pa.Table:
            outs = []
            n = t.num_rows
            for s_t, p_t, o_t in template:
                def col(term):
                    if str(term).startswith("?"):
                        c = t[str(term)[1:]]
                        return (
                            c.combine_chunks()
                            if isinstance(c, pa.ChunkedArray) else c
                        )
                    return pa.array([str(term)] * n, pa.string())
                outs.append(pa.table({
                    "subject": col(s_t),
                    "predicate": col(p_t),
                    "object": col(o_t),
                }))
            return pa.concat_tables(outs)

        inst = sol.map_batches(instantiate, batch_format="pyarrow")
        if form == "insert_where":
            # the asserted set is delta-sized by nature; distinct it
            # per-batch then once across batches, cap the driver pull
            from .relational import hash_bucketed_groupby

            distinct = hash_bucketed_groupby(
                inst.map_batches(
                    lambda t: t.group_by(
                        ["subject", "predicate", "object"]
                    ).aggregate([]),
                    batch_format="pyarrow",
                ),
                ["subject", "predicate", "object"],
                lambda df: df.drop_duplicates(),
                num_partitions,
            )
            rows = distinct.take(INSERT_WHERE_ROW_CAP + 1)
            if len(rows) > INSERT_WHERE_ROW_CAP:
                raise SparqlError(
                    f"INSERT ... WHERE instantiates more than "
                    f"{INSERT_WHERE_ROW_CAP} distinct triples — that's "
                    "a bulk derivation, not an update delta; "
                    "materialize it with CONSTRUCT + update_graph "
                    "instead"
                )
            return insert_triples(
                out_dir,
                [(r["subject"], r["predicate"], r["object"])
                 for r in rows],
            )
        feed = inst.map_batches(
            lambda t: pa.table({
                "edge_uid": edge_uid(
                    t["subject"], t["predicate"], t["object"]
                )
            }),
            batch_format="pyarrow",
        )
        return retract_edges(out_dir, feed)
    raise SparqlError(
        f"not an update form: {form!r} — run read queries through "
        "run_sparql"
    )
