"""Per-table validation with strictness flags.

The reference loads nodes strictly (``IGNORE_ERRORS=false``,
`Kuzu/kuzu_build_graph_csv.py:571`) but edges leniently
(``IGNORE_ERRORS=true``, `Kuzu:607` — bad/duplicate rows silently dropped
by the DB). The engine encodes that asymmetry explicitly (SURVEY.md §7.5):
``strict=True`` raises on the first invalid block; ``strict=False`` filters
invalid rows and COUNTS them (no silent truncation — J2 discipline,
`Kuzu:342-347`).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


class ValidationError(ValueError):
    pass


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def validate_table(
    ds: ray.data.Dataset,
    required_cols: list[str],
    non_null_cols: list[str] | None = None,
    strict: bool = True,
) -> ray.data.Dataset:
    """Schema + null-key validation as a streaming stage.

    - missing ``required_cols``: always an error (schema problems are never
      row-skippable, matching the reference's hard failure on unknown header
      types, Kuzu:532).
    - null values in ``non_null_cols`` (e.g. the PK `id`, or edge
      subject/object): ``strict`` raises with a row sample; lenient drops
      the rows (account for them with ``drop_count`` — J2 discipline).
    """
    non_null_cols = non_null_cols or []

    def check(t: pa.Table) -> pa.Table:
        missing = [c for c in required_cols if c not in t.column_names]
        if missing:
            raise ValidationError(f"missing required columns: {missing}")
        if not non_null_cols:
            return t
        ok = None
        for c in non_null_cols:
            v = pc.is_valid(_chunked(t[c]))
            ok = v if ok is None else pc.and_(ok, v)
        n_bad = t.num_rows - (pc.sum(ok).as_py() or 0)
        if n_bad and strict:
            bad = t.filter(pc.invert(ok)).slice(0, 3)
            raise ValidationError(
                f"{n_bad} rows with null keys in {non_null_cols}; sample: "
                f"{bad.to_pylist()}"
            )
        return t.filter(ok)  # dropped rows are accounted via drop_count()

    return ds.map_batches(check, batch_format="pyarrow")


def drop_count(
    ds: ray.data.Dataset, non_null_cols: list[str]
) -> dict[str, int]:
    """Count rows a lenient ``validate_table`` would drop — one streaming
    pass, reported into lineage metrics (never silent)."""
    def count(t: pa.Table) -> pa.Table:
        ok = None
        for c in non_null_cols:
            v = pc.is_valid(_chunked(t[c]))
            ok = v if ok is None else pc.and_(ok, v)
        good = pc.sum(ok).as_py() or 0
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "n_bad": pa.array([t.num_rows - good], type=pa.int64()),
            }
        )

    # Dataset.sum returns None (not a dict) when the input produces no blocks
    sums = ds.map_batches(count, batch_format="pyarrow").sum(["n", "n_bad"]) or {}
    return {"rows": sums.get("sum(n)", 0) or 0, "dropped": sums.get("sum(n_bad)", 0) or 0}


def quarantine(
    ds: ray.data.Dataset,
    non_null_cols: list[str],
    out_dir: str,
) -> tuple[ray.data.Dataset, dict]:
    """Poison-pill handling: split the stream into good rows (returned,
    still lazy) and bad rows (null in any ``non_null_cols``) written to a
    Parquet side table WITH a per-row ``reason`` column — the triage
    artifact an operator replays after fixing the producer, instead of the
    lenient path's count-only drop. One pass materializes the verdict per
    row; the good stream re-filters lazily (cheap vectorized null checks),
    so nothing corpus-sized is ever collected.

    Returns (good_ds, report) with report = {rows, quarantined, path}.
    """
    import os

    def split_bad(t: pa.Table) -> pa.Table:
        ok = None
        reasons = None
        for c in non_null_cols:
            v = pc.is_valid(_chunked(t[c]))
            ok = v if ok is None else pc.and_(ok, v)
            r = pc.if_else(v, pa.scalar(None, pa.string()),
                           pa.scalar(f"null:{c}", pa.string()))
            reasons = r if reasons is None else pc.binary_join_element_wise(
                pc.fill_null(reasons, ""), pc.fill_null(r, ""), ","
            )
        bad = t.filter(pc.invert(ok))
        # collapse interior runs too: a valid middle column leaves an empty
        # segment ("null:c1,,null:c3"), not just leading/trailing commas
        why = pc.replace_substring_regex(
            pc.replace_substring_regex(
                reasons.filter(pc.invert(ok))
                if len(bad) else pa.array([], pa.string()),
                ",{2,}", ",",
            ),
            "^,+|,+$", "",
        )
        return bad.append_column("reason", why)

    def keep_good(t: pa.Table) -> pa.Table:
        ok = None
        for c in non_null_cols:
            v = pc.is_valid(_chunked(t[c]))
            ok = v if ok is None else pc.and_(ok, v)
        return t.filter(ok)

    os.makedirs(out_dir, exist_ok=True)
    bad_ds = ds.map_batches(split_bad, batch_format="pyarrow")
    n_bad = bad_ds.count()
    if n_bad:
        bad_ds.write_parquet(out_dir)
    n_total = ds.count()
    report = {"rows": n_total, "quarantined": n_bad, "path": out_dir}
    return ds.map_batches(keep_good, batch_format="pyarrow"), report
