"""Node/edge normalization kernels — pure functions over Arrow batches.

Ports (vectorized) of the reference's per-record converters:

- M6 label-priority reorder: ``reorder_node_classes``
  (`Kuzu/kuzu_build_graph_csv.py:159-182`). The reference dedups via
  ``list(set(...))`` whose order is nondeterministic (Kuzu:167); here the
  rule is re-specified deterministically as *highest-priority class first,
  remaining labels sorted ascending*. The primary class (element 0) is
  identical to the reference's for any input; only the tail order differs.
- M7 primary-class extraction (`Kuzu:233-239,332-335`): first label,
  suffix after the CURIE prefix (``biolink:Gene`` -> ``Gene``).
- M2 list-cell decode/encode (`Kuzu:137-141`, `AGE:284-287`): ``;``-separated
  string cells <-> native Arrow list columns (plus the bracket-text Kuzu
  form with the ``'`` -> `` ` `` quote swap for byte-level conformance).
- M3 int cast with null passthrough (`Kuzu:144-148`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import CATEGORY_RANK

_NO_RANK = len(CATEGORY_RANK) + 1


def _label_ranks(values: pa.Array) -> np.ndarray:
    """Vectorized CATEGORY_RANK lookup via dictionary encoding."""
    dict_arr = pc.dictionary_encode(values)
    dictionary = dict_arr.dictionary.to_pylist()
    rank_per_code = np.array(
        [CATEGORY_RANK.get(v, _NO_RANK) for v in dictionary], dtype=np.int64
    )
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    return rank_per_code[codes]


def reorder_labels(arr: pa.Array) -> pa.ListArray:
    """M6: dedup each label list, move the highest-priority class to front,
    sort the remaining labels ascending. Null lists become empty lists.

    Vectorized: flatten -> per-row dedup -> rank lookup -> lexsort by
    (row, is_not_primary, label) -> rebuild ListArray. No Python loop over rows.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    # null rows -> empty lists
    arr = pc.if_else(pc.is_valid(arr), arr, pa.scalar([], type=arr.type))
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten()
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    if len(flat) == 0:
        return pa.ListArray.from_arrays(pa.array(np.zeros(n + 1, dtype=np.int32)), flat)

    labels = np.asarray(flat.to_pylist(), dtype=object)
    # dedup within row: sort by (row, label), drop repeats
    order = np.lexsort((labels, row_ids))
    r_s, l_s = row_ids[order], labels[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (r_s[1:] != r_s[:-1]) | (l_s[1:] != l_s[:-1])
    r_s, l_s = r_s[keep], l_s[keep]

    ranks = _label_ranks(pa.array(l_s.tolist(), type=pa.string()))
    # per-row min rank (rows are contiguous in r_s after the sort)
    row_starts = np.searchsorted(r_s, np.arange(n))
    new_lengths = np.diff(np.append(row_starts, len(r_s)))
    has_any = new_lengths > 0
    min_rank = np.full(n, _NO_RANK, dtype=np.int64)
    if has_any.any():
        min_rank[has_any] = np.minimum.reduceat(ranks, row_starts[has_any])
    is_primary = (ranks == min_rank[r_s]) & (min_rank[r_s] < _NO_RANK)

    # final order: (row, primary-first, label asc)
    order2 = np.lexsort((l_s, (~is_primary).astype(np.int8), r_s))
    l_f = l_s[order2]

    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lengths, out=new_offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32()) if new_offsets[-1] < 2**31 else pa.array(new_offsets),
        pa.array(l_f.tolist(), type=pa.string()),
    )


def primary_class(labels: pa.Array, strip_prefix: bool = True) -> pa.Array:
    """M7: first element of the (reordered) label list; optionally the CURIE
    suffix after ':' (``row[2].split(',')[0][1:]`` then ``.split(':')[1]``,
    Kuzu:233-239). Empty lists -> null.
    """
    first = _safe_first(labels)
    if strip_prefix:
        # suffix after the last ':' (greedy regex strips the CURIE prefix)
        first = pc.replace_substring_regex(first, r"^.*:", "")
    return first


def _safe_first(labels: pa.Array) -> pa.Array:
    """First list element with empty lists mapped to null."""
    non_empty = pc.greater(pc.list_value_length(labels), 0)
    padded = pc.if_else(non_empty, labels, pa.scalar([""], type=pa.list_(pa.string())))
    if isinstance(padded, pa.ChunkedArray):
        padded = padded.combine_chunks()
    first = pc.list_element(padded, 0)
    return pc.if_else(non_empty, first, pa.scalar(None, type=pa.string()))


def split_list_cells(
    table: pa.Table, cols: list[str], sep: str = ";", value_type: pa.DataType | None = None
) -> pa.Table:
    """M2 decode: ``;``-separated string cells -> native list columns.

    Null / empty cells -> empty lists (the reference maps NaN -> ``[]``,
    Kuzu:141). ``value_type`` (e.g. float64) casts the split elements.
    """
    for col in cols:
        if col not in table.column_names:
            continue
        raw = table[col]
        if isinstance(raw, pa.ChunkedArray):
            raw = raw.combine_chunks()
        filled = pc.if_else(
            pc.and_kleene(pc.is_valid(raw), pc.not_equal(raw, "")), raw, pa.scalar(None, pa.string())
        )
        lst = pc.split_pattern(filled, sep)
        lst = pc.if_else(pc.is_valid(lst), lst, pa.scalar([], type=pa.list_(pa.string())))
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        if value_type is not None and not pa.types.is_string(value_type):
            lst = pc.cast(lst, pa.list_(value_type))
        table = table.set_column(table.column_names.index(col), col, lst)
    return table


def join_list_cells(table: pa.Table, cols: list[str], sep: str = ";") -> pa.Table:
    """M2 encode (inverse): list columns -> ``;``-joined string cells."""
    for col in cols:
        if col not in table.column_names:
            continue
        lst = table[col]
        if not pa.types.is_list(lst.type):
            continue
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        if not pa.types.is_string(lst.type.value_type):
            lst = pc.cast(lst, pa.list_(pa.string()))
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
        joined = pc.binary_join(lst, sep)
        table = table.set_column(table.column_names.index(col), col, joined)
    return table


def bracket_encode_list_cells(table: pa.Table, cols: list[str]) -> pa.Table:
    """M2 Kuzu-CSV byte format: ``a;b`` -> ``[a,b]`` with ``'`` -> `` ` ``
    (Kuzu:141). Null -> ``[]``. Kept only for conformance fixtures; the
    engine's native interchange is real Arrow list columns.
    """
    for col in cols:
        if col not in table.column_names:
            continue
        raw = table[col]
        if isinstance(raw, pa.ChunkedArray):
            raw = raw.combine_chunks()
        if pa.types.is_list(raw.type):
            inner = raw
            if not pa.types.is_string(inner.type.value_type):
                inner = pc.cast(inner, pa.list_(pa.string()))
                if isinstance(inner, pa.ChunkedArray):
                    inner = inner.combine_chunks()
            joined = pc.binary_join(inner, ",")
        else:
            filled = pc.if_else(pc.is_valid(raw), raw, pa.scalar(None, pa.string()))
            joined = pc.replace_substring(filled, ";", ",")
        joined = pc.replace_substring(joined, "'", "`")
        bracketed = pc.binary_join_element_wise("[", joined, "]", "")
        bracketed = pc.if_else(pc.is_valid(bracketed), bracketed, pa.scalar("[]", pa.string()))
        table = table.set_column(table.column_names.index(col), col, bracketed)
    return table


def cast_int_cols(table: pa.Table, cols: list[str]) -> pa.Table:
    """M3: float-with-null columns -> int64 with null passthrough
    (``str(int(x)) if not NaN`` at Kuzu:144-148; truncating cast)."""
    for col in cols:
        if col not in table.column_names:
            continue
        c = table[col]
        if pa.types.is_integer(c.type):
            continue
        casted = pc.cast(pc.floor(c) if pa.types.is_floating(c.type) else c, pa.int64(), safe=False)
        table = table.set_column(table.column_names.index(col), col, casted)
    return table


def rename_columns(table: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """M1: rename columns (``category->labels``, ``predicate->label``)."""
    return table.rename_columns([mapping.get(c, c) for c in table.column_names])
