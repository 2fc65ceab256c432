"""Graph-table sources and sinks — the reference's interchange formats on
Ray Data.

Covers SURVEY.md §2.1:

- S1/S2 CSV shard reader (`Kuzu/kuzu_build_graph_csv.py:98,223-231`): KGX-style
  CSV with ``;``-separated list cells, decoded against the typed tab-header
  schema into native Arrow list columns at ingest.
- S3 JSONL reader (`MemGraph/mg_build_individual_json.py:310-313,383-388`):
  node/edge JSON-lines via ``ray.data.read_json``.
- S4 CSV writer (`Kuzu:154`): list columns re-encoded as ``;``-joined cells.
- S6 JSON-array streaming writer (`MemGraph/mg_build_merge_json.py:90-176`):
  the exact ``[{...},\n{...}]`` byte format, streamed batch-at-a-time with
  O(1) driver memory. Conformance sink only — the engine's scale-out
  interchange is partitioned Parquet.
- S8 schema-manifest sink (`Kuzu:390-439`): ``_schema.json`` written next to
  output Parquet instead of CREATE TABLE DDL.
- M8/M9 MemGraph record nesting (`MemGraph/mg_build_individual_json.py:291,
  316-322,372,391-397`): node/edge rows -> ``{id, labels, properties, type}``
  import records; the reference's sequential edge id (ST3,
  `mg_build_merge_json.py:61`) is replaced by the deterministic content-hash
  ``edge_uid`` so output is stable under parallelism.
- A6 node+edge stream union (`MemGraph/mg_build_merge_json.py:95-180`).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .normalize import join_list_cells, split_list_cells
from .schema import header_to_arrow_schema, list_columns_of


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def read_graph_jsonl(paths, **read_kwargs) -> ray.data.Dataset:
    """S3: node/edge JSON-lines -> Dataset (Arrow blocks, nested lists kept)."""
    return ray.data.read_json(paths, **read_kwargs)


def infer_field_union(ds: ray.data.Dataset) -> list[str]:
    """A3 schema key-union: the union of field names over every record
    (`get_csv_field_names`, `MemGraph/mg_build_individual_json.py:131-153`
    — a full-scan reduce there; here a per-block set union + driver merge).
    Sorted for determinism (the reference's dict-order is arrival-dependent).
    """
    parts = ds.map_batches(
        lambda t: pa.table({"field": pa.array(sorted(t.column_names), type=pa.string())}),
        batch_format="pyarrow",
    )
    return sorted(set(parts.unique("field")))


def read_kgx_csv(
    paths,
    header_line: str,
    rename_cols: dict[str, str] | None = None,
    delete_cols: list[str] | None = None,
    list_sep: str = ";",
    **read_kwargs,
) -> ray.data.Dataset:
    """S1/S2 + M2/M12: CSV shards with ``;``-separated list cells, decoded
    against the typed tab-header (`Kuzu:442-535`) into real Arrow types.

    All columns are read as strings (the reference reads with
    ``low_memory=False`` / positional ``csv.reader`` — stringly), then ONE
    vectorized ``map_batches`` applies the schema: list columns split on
    ``list_sep`` (NaN -> ``[]``, Kuzu:141), scalars cast per the header type
    table (§1.3).
    """
    import pyarrow.csv as pacsv

    rename_cols = rename_cols or {}
    # files carry the ORIGINAL column names; the rename is applied post-parse
    # (the reference renames after load, Kuzu:103,114)
    raw_schema = header_to_arrow_schema(header_line)
    schema = header_to_arrow_schema(header_line, rename_cols)
    convert = pacsv.ConvertOptions(column_types={n: pa.string() for n in raw_schema.names})
    ds = ray.data.read_csv(paths, convert_options=convert, **read_kwargs)

    list_cols = list_columns_of(schema)
    scalar_casts = {
        f.name: f.type
        for f in schema
        if f.name not in list_cols and not pa.types.is_string(f.type)
    }

    delete_cols = delete_cols or []  # M4: reformat_del_cols (Kuzu:151, AGE:257-267)

    def decode(t: pa.Table) -> pa.Table:
        # M1 rename first, then align by name; tolerate missing columns
        # (schema drift is the norm in the reference, §1.4)
        t = t.rename_columns([rename_cols.get(c, c) for c in t.column_names])
        drop = [c for c in delete_cols if c in t.column_names]
        if drop:
            t = t.drop_columns(drop)
        for col in list_cols:
            if col not in t.column_names:
                continue
            value_type = schema.field(col).type.value_type
            t = split_list_cells(t, [col], sep=list_sep, value_type=value_type)
        for col, typ in scalar_casts.items():
            if col not in t.column_names:
                continue
            raw = _chunked(t[col])
            # empty string == missing (CSV NaN convention)
            raw = pc.if_else(pc.equal(raw, ""), pa.scalar(None, pa.string()), raw)
            t = t.set_column(t.column_names.index(col), col, pc.cast(raw, typ))
        return t

    return ds.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_kgx_csv(ds: ray.data.Dataset, out_dir: str, list_sep: str = ";", **kwargs):
    """S4: encode list columns back to ``;``-joined cells and write CSV
    shards (one file per block — the Ray-native form of the reference's
    pt-file sharding, P3)."""

    def encode(t: pa.Table) -> pa.Table:
        cols = [c for c in t.column_names if pa.types.is_list(t[c].type)]
        return join_list_cells(t, cols, sep=list_sep)

    ds.map_batches(encode, batch_format="pyarrow").write_csv(out_dir, **kwargs)
    return out_dir


def write_schema_manifest(out_dir: str, schema: pa.Schema, extra: dict | None = None) -> str:
    """S8: ``_schema.json`` manifest next to the Parquet output — the
    engine's replacement for generated CREATE TABLE DDL (`Kuzu:390-439`)."""
    manifest = {
        "fields": [
            {
                "name": f.name,
                "type": str(f.type),
                "header_type": (
                    f.metadata.get(b"header_type", b"").decode() if f.metadata else ""
                ),
                "nullable": f.nullable,
            }
            for f in schema
        ],
        **(extra or {}),
    }
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "_schema.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# MemGraph import-record nesting (M8/M9) + merged stream (A6/S6)
# ---------------------------------------------------------------------------

def to_memgraph_nodes(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """M8: node rows -> ``{id, labels, properties, type:'node'}`` records.

    ``properties`` carries ALL original columns as a JSON-encoded string
    (the reference nests the full source record,
    `mg_build_individual_json.py:391-397`); JSON-string keeps the Arrow
    schema fixed regardless of how sparse/wide the property set is.
    """

    def conv(t: pa.Table) -> pa.Table:
        props = _rows_as_json(t)
        return pa.table(
            {
                "id": pc.cast(_chunked(t["id"]), pa.string()),
                "labels": _chunked(t["labels"]) if "labels" in t.column_names
                else pa.array([[]] * len(t), type=pa.list_(pa.string())),
                "start": pa.nulls(len(t), pa.string()),
                "end": pa.nulls(len(t), pa.string()),
                "label": pa.nulls(len(t), pa.string()),
                "properties": props,
                "type": pa.array(["node"] * len(t), type=pa.string()),
            }
        )

    return nodes.map_batches(conv, batch_format="pyarrow")


def to_memgraph_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """M9: edge rows -> ``{id, start, end, label, properties,
    type:'relationship'}``. The id is the deterministic ``edge_uid`` content
    hash, not ST3's arrival-order counter (order-free under parallelism)."""

    def conv(t: pa.Table) -> pa.Table:
        props = _rows_as_json(t)
        return pa.table(
            {
                "id": pc.cast(_chunked(t["edge_uid"]), pa.string()),
                "labels": pa.array([[]] * len(t), type=pa.list_(pa.string())),
                "start": pc.cast(_chunked(t["subject"]), pa.string()),
                "end": pc.cast(_chunked(t["object"]), pa.string()),
                "label": pc.cast(_chunked(t["predicate"]), pa.string()),
                "properties": props,
                "type": pa.array(["relationship"] * len(t), type=pa.string()),
            }
        )

    return edges.map_batches(conv, batch_format="pyarrow")


def _rows_as_json(t: pa.Table) -> pa.Array:
    """Each row's full column set as a canonical (sorted-key) JSON string.
    Conformance-sink encoding — not a hot analytical path."""
    cols = {c: _chunked(t[c]).to_pylist() for c in sorted(t.column_names)}
    n = len(t)
    out = [
        json.dumps(
            {c: v[i] for c, v in cols.items() if v[i] is not None},
            ensure_ascii=True, sort_keys=True, default=str,
        )
        for i in range(n)
    ]
    return pa.array(out, type=pa.string())


def merge_nodes_edges(nodes: ray.data.Dataset, edges: ray.data.Dataset) -> ray.data.Dataset:
    """A6: one merged import stream, nodes then edges
    (`mg_build_merge_json.py:95-180`). Schemas are pre-aligned by the
    ``to_memgraph_*`` converters so ``union`` is zero-copy."""
    return to_memgraph_nodes(nodes).union(to_memgraph_edges(edges))


def write_json_array(ds: ray.data.Dataset, path: str) -> dict:
    """S6: the reference's exact single-file JSON-array byte format —
    ``[`` + comma-separated ``json.dumps(record, ensure_ascii=True)`` + ``]``
    (`mg_build_individual_json.py:300-349`, first-record-flag comma logic at
    `mg_build_merge_json.py:120-128,162-170`).

    Streams ``iter_batches`` so driver memory is one batch; a single output
    file is inherent to the format (the MemGraph ``import_util.json`` target
    reads one file) — use ``Dataset.write_json`` for the scale path.
    """
    n = 0
    with open(path, "w") as f:
        f.write("[")
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            records = _memgraph_records(batch)
            for rec in records:
                if not first:
                    f.write(",\n")
                f.write(rec)
                first = False
                n += 1
        f.write("]")
    return {"path": path, "n_records": n}


def _memgraph_records(batch: pa.Table) -> list[str]:
    """Serialize merged-stream rows back to the reference's record shape
    (properties re-inflated from the JSON string)."""
    cols = {c: _chunked(batch[c]).to_pylist() for c in batch.column_names}
    out = []
    for i in range(len(batch)):
        typ = cols["type"][i]
        rec: dict = {"id": cols["id"][i], "type": typ}
        if typ == "node":
            rec["labels"] = cols["labels"][i] or []
        else:
            rec["start"] = cols["start"][i]
            rec["end"] = cols["end"][i]
            rec["label"] = cols["label"][i]
        rec["properties"] = json.loads(cols["properties"][i] or "{}")
        out.append(json.dumps(rec, ensure_ascii=True, sort_keys=True))
    return out


def read_orc(paths, columns: "list[str] | None" = None):
    """ORC source — Ray Data ships no ORC reader, so compose one: each
    file arrives as one ``read_binary_files`` row (the file is the block
    unit) and decodes in a task via the pyarrow ORC reader, which prunes
    ``columns`` at the stripe level. batch_size=1 bounds per-task heap to
    one file's decoded size; scale by splitting the INPUT into more files,
    exactly like the reference's sharded-CSV discipline. num_cpus=0.99
    blocks the optimizer from fusing this stage into a downstream
    actor pool, where batch_size would count FILES instead of rows
    (see ``read_tar_shards`` for the measured pathology)."""
    import pyarrow.orc as pa_orc

    import ray.data

    raw = ray.data.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        tables = [
            pa_orc.ORCFile(pa.BufferReader(b)).read(columns=columns)
            for b in t["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return raw.map_batches(
        decode, batch_format="pyarrow", batch_size=1, num_cpus=0.99
    )


def write_orc(ds, out_dir: str):
    """ORC sink: one file per input block, written inside the task (the
    driver never sees data), returning a manifest Dataset of
    (path, rows) — consume it to both drive execution and audit the
    write. Partition the input upstream for the multi-file layout."""
    import uuid

    import pyarrow.orc as pa_orc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        pa_orc.write_table(t, path)
        return pa.table({"path": [path], "rows": [t.num_rows]})

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


_NT_SAFE = ":/#?&=@_.~-"  # RFC 3986 chars we keep verbatim inside IRIs


def write_ntriples(
    ds: ray.data.Dataset,
    out_dir: str,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    subject_ns: str = "urn:kg:",
    predicate_ns: str = "urn:rel:",
) -> ray.data.Dataset:
    """W3C N-Triples sink — the lingua-franca RDF interchange a KG built
    here hands to triple stores the reference never targeted. One ``.nt``
    file per input block written inside the task (the driver never sees
    data), manifest Dataset of (path, rows) back — identical discipline
    to ``write_orc``. IRIs are minted as ``<ns + percent-encoded-id>``
    with a conservative safe set, so rendering is injective and
    ``read_ntriples`` inverts it byte-exactly (round-trip tested)."""
    import uuid
    from urllib.parse import quote

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        s = _chunked(t[subject_col]).to_pylist()
        p = _chunked(t[predicate_col]).to_pylist()
        o = _chunked(t[object_col]).to_pylist()
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        with open(path, "w") as f:
            for i in range(len(s)):
                f.write(
                    f"<{subject_ns}{quote(s[i], safe=_NT_SAFE)}> "
                    f"<{predicate_ns}{quote(p[i], safe=_NT_SAFE)}> "
                    f"<{subject_ns}{quote(o[i], safe=_NT_SAFE)}> .\n"
                )
        return pa.table({"path": [path], "rows": [t.num_rows]})

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def read_ntriples(
    paths,
    subject_ns: str = "urn:kg:",
    predicate_ns: str = "urn:rel:",
) -> ray.data.Dataset:
    """N-Triples source: ``read_text`` (each file splits into line blocks)
    then one vectorized ``pc.extract_regex`` per batch pulls the three IRI
    slots; percent-decoding falls back to Python only for rows that
    actually contain ``%`` (ASCII-clean corpora never leave Arrow)."""
    from urllib.parse import unquote

    import re

    pat = (
        rf"^<{re.escape(subject_ns)}(?P<s>[^>]*)> "
        rf"<{re.escape(predicate_ns)}(?P<p>[^>]*)> "
        rf"<{re.escape(subject_ns)}(?P<o>[^>]*)> \.$"
    )

    def parse(t: pa.Table) -> pa.Table:
        text = _chunked(t["text"])
        st = pc.extract_regex(text, pattern=pat)
        cols = {}
        for name, out_name in (("s", "subject"), ("p", "predicate"), ("o", "object")):
            arr = _chunked(pc.struct_field(st, name))
            if pc.any(pc.match_substring(arr, "%")).as_py():
                arr = pa.array(
                    [None if v is None else unquote(v) for v in arr.to_pylist()],
                    type=pa.string(),
                )
            cols[out_name] = arr
        out = pa.table(cols)
        bad = pc.sum(pc.cast(pc.is_null(cols["subject"]), pa.int64())).as_py() or 0
        if bad:
            raise ValueError(f"{bad} lines are not <iri> <iri> <iri> . triples")
        return out

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")


def read_feather(paths, columns: "list[str] | None" = None):
    """Arrow IPC / Feather-v2 source — same composition as ``read_orc``
    (one ``read_binary_files`` row per file, decoded in a task); the IPC
    reader projects ``columns`` without deserializing the rest, and
    memory-maps nothing here because the bytes already live in the object
    store (zero-copy into Arrow)."""
    import pyarrow.feather as pa_feather

    import ray.data

    raw = ray.data.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        tables = [
            pa_feather.read_table(pa.BufferReader(b), columns=columns)
            for b in t["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return raw.map_batches(
        decode, batch_format="pyarrow", batch_size=1, num_cpus=0.99
    )


def write_feather(ds, out_dir: str, compression: str = "zstd"):
    """Arrow IPC / Feather-v2 sink: one file per input block written
    inside the task, manifest Dataset of (path, rows) back — identical
    discipline to ``write_orc``."""
    import uuid

    import pyarrow.feather as pa_feather

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.feather")
        pa_feather.write_feather(t, path, compression=compression)
        return pa.table({"path": [path], "rows": [t.num_rows]})

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Sharded-archive (tar / WebDataset) media ingestion — how real multimodal
# training corpora ship: thousands of .tar shards, each holding adjacent
# members  key.jpg / key.json / key.cls ...  (the WebDataset convention:
# the sample key is the member basename up to the FIRST dot, the rest is
# the suffix/column). No reference anchor (the reference is text-only);
# builder-brief item. The shard is the unit of parallelism AND of resume,
# exactly like the reference's sharded-CSV discipline — scale by adding
# shards, never by growing one.
# ---------------------------------------------------------------------------


def read_tar_shards(paths, suffixes=None, include_shard: bool = True):
    """Tar/WebDataset source: each shard arrives as ONE
    ``read_binary_files`` row and is walked in a task by stdlib
    ``tarfile`` (``r:*`` — plain or gzipped), grouping members into
    samples by the WebDataset key rule (basename up to the first dot).
    Returns rows ``(shard, key, <one binary column per suffix>)``.

    ``suffixes``: pass the expected member suffixes (e.g. ``("jpg",
    "json")``) for a STABLE cross-shard schema — members outside the
    set are never extracted (suffix pruning: the tar walk skips their
    bytes), and a sample missing a requested suffix gets null. With
    ``suffixes=None`` the columns are inferred per shard — fine for a
    homogeneous corpus, but heterogeneous shards then produce blocks
    with differing schemas, so prefer explicit suffixes in pipelines.

    Scale notes: one task per shard bounds per-task heap to one
    decoded shard (shard your corpus at 100 MB-1 GB like WebDataset
    recommends); the driver never sees member bytes; a 100 TB corpus
    is just more shard rows streaming through the same stage. The
    decode stage declares ``num_cpus=0.99`` ON PURPOSE: with the
    default spec Ray's optimizer fuses this stage into a downstream
    actor-pool ``map_batches``, whose ``batch_size`` then counts SHARD
    FILES instead of samples — one actor call swallows batch_size
    whole shards (measured 6x slower at 64 shards x 512 samples). The
    off-by-0.01 resource spec blocks that fusion while keeping both
    stages streaming (no all-to-all barrier, unlike
    ``randomize_block_order``) and still schedules one task per core."""
    import io
    import tarfile

    raw = ray.data.read_binary_files(paths, include_paths=True)
    want = tuple(suffixes) if suffixes is not None else None

    def decode(t: pa.Table) -> pa.Table:
        rows_shard, rows_key, cols = [], [], {}
        seen_exts: list[str] = list(want) if want is not None else []
        samples = []  # (shard, key, {ext: bytes}) in member order
        for path, buf in zip(
            t["path"].to_pylist(), t["bytes"].to_pylist()
        ):
            shard = os.path.basename(path)
            groups: dict = {}
            order: list = []
            with tarfile.open(fileobj=io.BytesIO(buf), mode="r:*") as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    base = os.path.basename(m.name)
                    key, _, ext = base.partition(".")
                    if want is not None and ext not in want:
                        continue  # pruned: bytes never extracted
                    if ext not in seen_exts:
                        seen_exts.append(ext)
                    if key not in groups:
                        groups[key] = {}
                        order.append(key)
                    groups[key][ext] = tf.extractfile(m).read()
            for key in order:
                samples.append((shard, key, groups[key]))
        for shard, key, members in samples:
            rows_shard.append(shard)
            rows_key.append(key)
        for ext in seen_exts:
            cols[ext] = pa.array(
                [members.get(ext) for _, _, members in samples],
                type=pa.binary(),
            )
        out = {"key": pa.array(rows_key, type=pa.string())}
        if include_shard:
            out = {
                "shard": pa.array(rows_shard, type=pa.string()), **out
            }
        out.update(cols)
        return pa.table(out)

    return raw.map_batches(
        decode, batch_format="pyarrow", batch_size=1, num_cpus=0.99
    )


def write_tar_shards(
    ds, out_dir: str, suffixes, key_col: str = "key",
    rows_per_shard: "int | None" = None, compress: "str | None" = None,
):
    """Tar/WebDataset sink: one ``part-<uuid>.tar`` per input block
    (or per ``rows_per_shard`` slice of a block), written INSIDE the
    task — the driver never sees member bytes. Each row becomes the
    members ``{key}.{suffix}`` for every non-null ``suffixes`` column,
    emitted key-major in row order (the WebDataset adjacency rule).
    Member mtimes are pinned to 0 so shard bytes are deterministic for
    a given block content. Returns a manifest Dataset of
    (path, rows, members) — consume it to drive execution and audit,
    same discipline as ``write_orc``. Repartition upstream to choose
    the shard count. ``compress="gz"`` writes ``.tar.gz`` shards
    (stdlib gzip with mtime pinned, so bytes stay deterministic);
    the reader's ``r:*`` mode transparently accepts both."""
    import io
    import tarfile
    import uuid

    if compress not in (None, "gz"):
        raise ValueError(f"compress must be None or 'gz', got {compress!r}")
    suffixes = list(suffixes)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        paths, rows, members = [], [], []
        n = t.num_rows
        step = rows_per_shard or max(n, 1)
        for lo in range(0, max(n, 1), step):
            part = t.slice(lo, step)
            if part.num_rows == 0:
                continue
            ext = ".tar.gz" if compress else ".tar"
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}{ext}")
            nm = 0
            keys = part[key_col].to_pylist()
            payloads = {s: part[s].to_pylist() for s in suffixes}
            if compress:
                import gzip

                raw = io.BytesIO()
                sink = gzip.GzipFile(fileobj=raw, mode="wb", mtime=0)
            else:
                raw = sink = None
            with tarfile.open(
                path if not compress else None, mode="w",
                fileobj=sink,
            ) as tf:
                for i, key in enumerate(keys):
                    for s in suffixes:
                        data = payloads[s][i]
                        if data is None:
                            continue
                        info = tarfile.TarInfo(name=f"{key}.{s}")
                        info.size = len(data)
                        info.mtime = 0
                        tf.addfile(info, io.BytesIO(data))
                        nm += 1
            if compress:
                sink.close()
                with open(path, "wb") as f:
                    f.write(raw.getvalue())
            paths.append(path)
            rows.append(part.num_rows)
            members.append(nm)
        return pa.table(
            {
                "path": pa.array(paths, type=pa.string()),
                "rows": pa.array(rows, type=pa.int64()),
                "members": pa.array(members, type=pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
