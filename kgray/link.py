"""Entity linking — an actor-pool stage holding the alias dictionary.

The Ray-native descendant of the reference's broadcast-lookup join
(`Kuzu/kuzu_build_graph_csv.py:265-271,338-347`): the build side (entity
catalog -> alias dict) is materialized once, shipped via ``ray.put``, and
each actor deserializes it ONCE in ``__init__`` (the ST6 "state loaded at
connection setup" pattern, `common/pg_utils_multi.py:36-76`). Per batch, the
mention column is dictionary-encoded so the Python dict lookup runs only on
the (small) set of distinct mentions, then fans back out with a vectorized
``take``.

Unlinkable mentions follow the reference's drop-with-warning join semantics
(J2, `Kuzu:342-347`) but are *counted, not silently dropped*: the stage tags
rows with ``linked`` and downstream filters + metrics account for them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from .util import join_partitions, pool_concurrency


def build_alias_index(catalog: pa.Table) -> dict[str, str]:
    """surface form -> entity id. Exact names win over aliases; aliases are
    additionally matched case-insensitively."""
    index: dict[str, str] = {}
    ids = catalog["id"].to_pylist()
    for aliases, eid in zip(catalog["aliases"].to_pylist(), ids):
        for a in aliases or []:
            index.setdefault(a, eid)
            index.setdefault(a.lower(), eid)
    for name, eid in zip(catalog["name"].to_pylist(), ids):
        index[name] = eid
    return index


class EntityLinker:
    """map_batches actor: adds ``subject_id``/``object_id``/``linked``.

    ``index_ref`` is either a ``ray.ObjectRef`` to the alias index (broadcast
    once from the driver — the scale path) or a plain dict (unit tests).
    """

    def __init__(self, index_ref):
        self._index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref

    def _lookup(self, col: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        get = self._index.get
        mapped = pa.array(
            [get(m) or get(m.lower() if m else m) for m in enc.dictionary.to_pylist()],
            type=pa.string(),
        )
        return mapped.take(enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subject_id = self._lookup(batch["subject_mention"])
        object_id = self._lookup(batch["object_mention"])
        linked = pc.and_(pc.is_valid(subject_id), pc.is_valid(object_id))
        return (
            batch.append_column("subject_id", subject_id)
            .append_column("object_id", object_id)
            .append_column("linked", linked)
        )


# per-worker-process linker cache (task path): the broadcast index is
# fetched from the object store once per worker and reused across tasks
_LINKER_CACHE: dict = {}


def _link_batch(batch: pa.Table, index_ref=None) -> pa.Table:
    key = index_ref.hex() if isinstance(index_ref, ray.ObjectRef) else id(index_ref)
    linker = _LINKER_CACHE.get(key)
    if linker is None:
        linker = EntityLinker(index_ref)
        _LINKER_CACHE[key] = linker
    return linker(batch)


def link_entities(
    triples, index_ref, batch_size: int | None = None, concurrency=None,
    use_actors: bool = False,
):
    """Attach entity ids to extracted triples.

    Default: stateless tasks + per-worker index cache (fuses with the
    extraction stage — one task graph end to end). ``use_actors=True``
    switches to the actor-pool form for heavyweight linker state whose
    total memory must be bounded by an explicit pool size.
    """
    if use_actors:
        return triples.map_batches(
            EntityLinker,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            batch_size=batch_size or 16384,
            concurrency=concurrency or pool_concurrency(),
        )
    return triples.map_batches(
        _link_batch,
        fn_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def alias_forms_table(catalog: pa.Table) -> pa.Table:
    """(form, entity_id) surface-form table with ``build_alias_index``'s
    precedence flattened in EXACTLY: per form a name claim beats alias
    claims (names overwrite the dict after aliases); among duplicate
    NAMES the last catalog row wins (dict assignment), among duplicate
    ALIASES the earliest wins (setdefault). The join-path equivalent of
    the broadcast dict."""
    import pandas as pd

    rows = []
    n_rows = catalog.num_rows
    for pos, (eid, name, aliases) in enumerate(
        zip(
            catalog["id"].to_pylist(),
            catalog["name"].to_pylist(),
            catalog["aliases"].to_pylist(),
        )
    ):
        rows.append((name, eid, 0, n_rows - pos))
        for a in aliases or []:
            rows.append((a, eid, 1, pos))
            rows.append((a.lower(), eid, 1, pos))
    df = pd.DataFrame(rows, columns=["form", "entity_id", "prio", "pos"])
    df = df.sort_values(["form", "prio", "pos"], kind="mergesort").drop_duplicates(
        "form", keep="first"
    )
    return pa.table(
        {
            "form": pa.array(df["form"], type=pa.string()),
            "entity_id": pa.array(df["entity_id"], type=pa.string()),
        }
    )


def link_entities_join(
    triples, catalog_forms: "pa.Table", num_partitions: int = 16,
):
    """Distributed linking for catalogs past broadcast limits: hash joins of
    the triple stream against the exploded surface-form table. Same output
    contract AND matching semantics as ``link_entities``: per endpoint, an
    exact-form join first, then a lowered-mention fallback join for the
    rows the exact pass missed (the join-side mirror of the broadcast
    path's ``get(m) or get(m.lower())``), coalesced exact-first.

    Both linking paths sit behind one interface by design (SURVEY.md §7.5
    broadcast-lookup-scale trap): pick by alias-index size.

    Caveat: Ray's hash join crashes when a partition receives ZERO left
    rows (schema-less block) — only possible when distinct-mention
    cardinality < ``num_partitions``, i.e. exactly the dimension-sized
    regime where the broadcast path should have been chosen instead.
    """
    import pyarrow.compute as _pc

    import ray.data as _rd

    forms = _rd.from_arrow(catalog_forms)
    out = triples
    for col, out_col in (("subject_mention", "subject_id"), ("object_mention", "object_id")):
        # pass 1: exact surface form
        out = out.join(
            forms, join_type="left_outer",
            num_partitions=join_partitions(num_partitions),
            on=(col,), right_on=("form",),
        )
        out = out.map_batches(
            lambda t, oc=out_col, c=col: t.rename_columns(
                [f"{oc}__exact" if x == "entity_id" else x for x in t.column_names]
            ).drop_columns([x for x in ("form",) if x in t.column_names]).append_column(
                "__lowered", _pc.utf8_lower(t[c].combine_chunks())
            ),
            batch_format="pyarrow",
        )
        # pass 2: lowered mention against the SAME form table
        out = out.join(
            forms, join_type="left_outer",
            num_partitions=join_partitions(num_partitions),
            on=("__lowered",), right_on=("form",),
        )

        def coalesce(t: pa.Table, oc=out_col) -> pa.Table:
            exact = t[f"{oc}__exact"].combine_chunks()
            lowered = t["entity_id"].combine_chunks()
            merged = _pc.if_else(_pc.is_valid(exact), exact, lowered)
            t = t.drop_columns(
                [c for c in (f"{oc}__exact", "entity_id", "__lowered", "form")
                 if c in t.column_names]
            )
            return t.append_column(oc, merged)

        out = out.map_batches(coalesce, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.append_column(
            "linked",
            _pc.and_(
                _pc.is_valid(t["subject_id"].combine_chunks()),
                _pc.is_valid(t["object_id"].combine_chunks()),
            ),
        ),
        batch_format="pyarrow",
    )


def split_linked(linked_ds):
    """(linked, dropped) pair of lazy datasets; both remain streaming."""
    keep = linked_ds.map_batches(
        lambda t: t.filter(t["linked"]), batch_format="pyarrow"
    )
    dropped = linked_ds.map_batches(
        lambda t: t.filter(pc.invert(t["linked"])), batch_format="pyarrow"
    )
    return keep, dropped


def fuzzy_name_pairs(
    nodes: "ray.data.Dataset",
    id_col: str = "id",
    name_col: str = "name",
    threshold: float = 0.7,
    k: int = 2,
    max_df: int = 1000,
    **kwargs,
):
    """Entity-resolution candidate pairs: node ids whose NORMALIZED names
    (lowercased, non-alphanumerics stripped) have char-``k``-gram Jaccard
    >= ``threshold``. The blocking+verify half of ER — downstream merge
    decisions ride ``graphalgo.dedup_clusters`` like any other pair set.

    Plan: the exact inverted-index join of ``dedup.ngram_jaccard_pairs``
    in char mode — ONE gram-keyed shuffle regardless of corpus size; the
    normalization makes byte grams equal character grams so the SQL
    oracle can mirror it with substr(). Returns (id_a, id_b,
    jaccard_ppm)."""
    from .dedup import ngram_jaccard_pairs

    def norm(t: pa.Table) -> pa.Table:
        name = pc.cast(t[name_col], pa.string())
        return pa.table(
            {
                id_col: t[id_col],
                "__norm_name": pc.replace_substring_regex(
                    pc.utf8_lower(pc.fill_null(name, "")), "[^a-z0-9]", ""
                ),
            }
        )

    pairs = ngram_jaccard_pairs(
        nodes.select_columns([id_col, name_col]).map_batches(
            norm, batch_format="pyarrow"
        ),
        threshold=threshold, id_col=id_col, text_col="__norm_name",
        k=k, max_df=max_df, gram_mode="char", **kwargs,
    )
    return pairs.map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "jaccard_ppm"]),
        batch_format="pyarrow",
    )
