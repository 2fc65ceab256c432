"""Stream-shaped operators over ordered event logs.

Ray Data is a (streaming-)batch engine with no watermarks; windowed
semantics are expressed as keyed shuffles over event time (guide: treat
the log as partitioned by key, ordered by ts within the group).

- ``windowed_agg``: tumbling event-time windows — window id computed
  vectorized per batch, partial-aggregated, then one (key, window)
  groupby.
- ``sessionize``: gap-based sessions per key —
  ``groupby(key).map_groups`` sorts the group by (ts, tiebreak) and
  splits on gaps; deterministic given the tiebreak column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from .relational import grouped_agg
from .util import join_partitions


def windowed_agg(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
) -> ray.data.Dataset:
    """Tumbling window sum/count per key.

    Output: (key, window_start_epoch, sum_value, n_events).
    """

    def add_window(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch_us = ts.cast(pa.int64())
        win = pc.multiply(
            pc.divide(epoch_us, window_sec * 1_000_000), window_sec
        )  # integer floor-div -> window start in epoch seconds
        return t.append_column("window_start", pc.cast(win, pa.int64()))

    windowed = events.select_columns([key_col, ts_col, value_col]).map_batches(
        add_window, batch_format="pyarrow"
    )
    return grouped_agg(
        windowed,
        keys=[key_col, "window_start"],
        sums={"sum_value": value_col},
        count_alias="n_events",
    )


def hopping_window_agg(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    hop_sec: int = 900,
) -> ray.data.Dataset:
    """Hopping (sliding) event-time windows: each event contributes to
    every window of length ``window_sec`` starting at a ``hop_sec``
    multiple that covers it. ``hop_sec == window_sec`` degenerates to the
    tumbling case.

    Vectorized fan-out per batch: an event at t belongs to
    ``ceil(window/hop)`` windows — indices are computed with numpy repeat
    arithmetic, then the standard partial-agg + bucketed shuffle runs on
    the expanded stream. Output: (key, window_start_epoch, sum, count).
    """
    assert window_sec % hop_sec == 0, "window must be a multiple of hop"
    fan = window_sec // hop_sec

    def expand(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        n = len(epoch)
        # last window start covering t: floor(t/hop)*hop; prior fan-1 hops
        last = (epoch // hop_sec) * hop_sec
        # every one of the fan windows covers the event by construction
        # (window = fan * hop): starts = last - j*hop, j in [0, fan)
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), fan))
        starts = np.repeat(last, fan) - np.tile(
            np.arange(fan, dtype=np.int64) * hop_sec, n
        )

        def col(name):
            c = t[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return c.take(take)

        return pa.table(
            {
                key_col: col(key_col),
                "window_start": pa.array(starts, type=pa.int64()),
                value_col: col(value_col),
            }
        )

    expanded = events.select_columns([key_col, ts_col, value_col]).map_batches(
        expand, batch_format="pyarrow"
    )
    return grouped_agg(
        expanded,
        keys=[key_col, "window_start"],
        sums={"sum_value": value_col},
        count_alias="n_events",
    )


def sessionize(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_sec: int = 1800,
) -> ray.data.Dataset:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds ``gap_sec``.

    Output: (key, session_id, n_events, session_start_epoch,
    session_end_epoch) — session_id is 0-based per key in time order.
    """

    from .relational import hash_bucketed_groupby

    def split(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized over a bucket of many keys: one sort, shift-based
        # session flags, per-key rebasing via groupby.transform (C kernels)
        df = df.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ts = (df[ts_col].astype("int64") // 1_000_000).to_numpy()  # epoch sec
        keys = df[key_col].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap = np.empty(len(df), dtype=np.int64)
        gap[:1] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_sess = new_key | (gap > gap_sec)
        g = np.cumsum(new_sess)
        out = pd.DataFrame({key_col: keys, "_g": g, "_ts": ts})
        out["session_id"] = g - out.groupby(key_col, sort=False)["_g"].transform("min")
        agg = out.groupby([key_col, "session_id"], sort=False, as_index=False).agg(
            n_events=("_ts", "size"),
            session_start=("_ts", "min"),
            session_end=("_ts", "max"),
        )
        return agg

    return hash_bucketed_groupby(
        events.select_columns([key_col, ts_col, order_col]), [key_col], split
    )


def running_total(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_buckets: int = 64,
):
    """Per-key running (cumulative) sum of ``value_col`` in ``order_cols``
    order — the ordered-scan window aggregate (SQL ``SUM() OVER (PARTITION
    BY key ORDER BY ... ROWS UNBOUNDED PRECEDING)``).

    One keyed shuffle co-locates each key's rows (hash buckets), then a
    per-bucket mergesort + vectorized ``groupby.cumsum``. Pass an exact
    integer ``value_col`` (fixed-point cents) for order-independent sums.
    Pass ``order_cols`` that totally order rows within a key, or ties make
    the intermediate running values arbitrary.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        df = df.copy(deep=False)
        df[out_col] = df.groupby(key, sort=False)[value_col].cumsum()
        return df

    return hash_bucketed_groupby(ds, [key], fn, num_buckets)


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    time_col: str,
    lo_col: str,
    hi_col: str,
    bucket_sec: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Distributed range join: left rows matched to right INTERVALS —
    emit left x right where ``lo <= t <= hi`` and the keys agree, each
    qualifying pair exactly once.

    Ray Data has equi-joins only, so the range predicate is bucketized
    (the standard interval-join decomposition): every right interval is
    replicated to each ``bucket_sec``-wide time bucket it overlaps (a
    vectorized ``np.repeat`` fan-out, ceil(span/bucket)+1 copies), the
    left side lands in exactly ONE bucket (t // bucket_sec), and an
    equi-join on (key, bucket) + an exact range filter finishes the job.
    Left-in-one-bucket is what makes each pair match exactly once — no
    dedup pass needed.

    Pick ``bucket_sec`` ~ the typical interval span: replication factor is
    span/bucket_sec, while too-large buckets inflate the per-bucket join
    fan-in (at 100 TB both matter; skewed hot (key, bucket) pairs salt the
    same way as any equi-join). All times are int64 (epoch seconds or any
    monotone integer clock). Payload column names must be disjoint between
    the two sides (rename upstream) — only ``key`` is shared.
    """

    def tag_left(t: pa.Table) -> pa.Table:
        # integer floor-div, exact for any int64 clock (numpy // floors
        # toward -inf, matching the bucket math in expand_right)
        tn = _chunked_i64(t[time_col]).to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(tn // bucket_sec, type=pa.int64()))

    def expand_right(t: pa.Table) -> pa.Table:
        lo = _chunked_i64(t[lo_col]).to_numpy(zero_copy_only=False)
        hi = _chunked_i64(t[hi_col]).to_numpy(zero_copy_only=False)
        b0 = lo // bucket_sec
        b1 = hi // bucket_sec
        counts = np.maximum(b1 - b0 + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        # intra-row offset 0..counts[i]-1 for each replicated copy
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        out = t.take(pa.array(idx))
        return out.append_column("_b", pa.array(b0[idx] + pos, type=pa.int64()))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(expand_right, batch_format="pyarrow")
    joined = lt.join(
        rt, join_type="inner", num_partitions=join_partitions(num_partitions),
        on=(key, "_b"),
    )

    def finish(t: pa.Table) -> pa.Table:
        ts = _chunked_i64(t[time_col])
        keep = pc.and_(
            pc.greater_equal(ts, _chunked_i64(t[lo_col])),
            pc.less_equal(ts, _chunked_i64(t[hi_col])),
        )
        return t.filter(keep).drop_columns(["_b"])

    return joined.map_batches(finish, batch_format="pyarrow")


def _chunked_i64(arr):
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return a.cast(pa.int64()) if a.type != pa.int64() else a


def ohlc(
    ds: ray.data.Dataset,
    key_col: str,
    window_col: str,
    order_cols: list[str],
    value_col: str,
    num_buckets: int = 64,
):
    """Per-(key, window) OHLC summary — open (FIRST_VALUE), high, low,
    close (LAST_VALUE), count — the ordered first/last aggregate SQL
    expresses with an UNBOUNDED window frame.

    First/last are not plain associative aggregates, but they ARE
    mergeable when each partial carries its ordering key: the per-batch
    combiner reduces every (key, window) to one row holding (open order
    key, open value, close order key, close value, hi, lo, n), and the
    bucket reducer merges partials by re-running the same pick — so the
    shuffle moves one row per (key, window, block), never the events.
    ``order_cols`` must totally order rows within a window.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    keys = [key_col, window_col]
    o1, o2 = order_cols[0], order_cols[1] if len(order_cols) > 1 else order_cols[0]

    def combine(df: pd.DataFrame, first_pass: bool) -> pd.DataFrame:
        if first_pass:
            df = df.assign(
                _o1o=df[o1], _o2o=df[o2], _vo=df[value_col],
                _o1c=df[o1], _o2c=df[o2], _vc=df[value_col],
                _hi=df[value_col], _lo=df[value_col], _n=1,
            )
        d = df.sort_values(keys + ["_o1o", "_o2o"], kind="mergesort")
        opens = d.drop_duplicates(keys, keep="first")[keys + ["_o1o", "_o2o", "_vo"]]
        d2 = df.sort_values(keys + ["_o1c", "_o2c"], kind="mergesort")
        closes = d2.drop_duplicates(keys, keep="last")[keys + ["_o1c", "_o2c", "_vc"]]
        rest = df.groupby(keys, sort=False, as_index=False).agg(
            _hi=("_hi", "max"), _lo=("_lo", "min"), _n=("_n", "sum")
        )
        out = rest.merge(opens, on=keys).merge(closes, on=keys)
        return out.astype({"_n": "int64"})

    partials = ds.map_batches(
        lambda df: combine(df, first_pass=True), batch_format="pandas"
    )
    merged = hash_bucketed_groupby(
        partials, keys, lambda df: combine(df, first_pass=False), num_buckets
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: df[key_col], window_col: df[window_col],
                "open_v": df["_vo"].astype("int64"),
                "high_v": df["_hi"].astype("int64"),
                "low_v": df["_lo"].astype("int64"),
                "close_v": df["_vc"].astype("int64"),
                "n": df["_n"].astype("int64"),
            }
        )

    return merged.map_batches(finish, batch_format="pandas")


def cohort_retention(
    ds: ray.data.Dataset,
    key_col: str,
    period_col: str,
    num_buckets: int = 64,
):
    """Cohort retention counts: distinct users per (cohort period, period
    offset), where a user's cohort is their FIRST active period.

    Single keyed shuffle: a per-batch distinct-(key, period) combiner,
    then one user-keyed bucket pass that dedups, derives the per-user
    cohort min, and emits (cohort, offset) partial counts — the final
    reduce moves only n_cohorts x n_offsets rows. Pass an integer
    ``period_col`` (e.g. epoch-week)."""
    import pandas as pd

    from .relational import grouped_agg, hash_bucketed_groupby

    pairs = ds.select_columns([key_col, period_col]).map_batches(
        lambda df: df.drop_duplicates([key_col, period_col]),
        batch_format="pandas",
    )

    def cohort(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([key_col, period_col])
        cw = d.groupby(key_col, sort=False)[period_col].transform("min")
        out = pd.DataFrame(
            {"cohort_period": cw, "period_offset": d[period_col] - cw}
        )
        return (
            out.groupby(["cohort_period", "period_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
            .astype("int64")
        )

    parts = hash_bucketed_groupby(pairs, [key_col], cohort, num_buckets)
    return grouped_agg(
        parts, keys=["cohort_period", "period_offset"], sums={"n_users": "n_users"}
    )


def rolling_sum(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "rolling",
    num_buckets: int = 64,
):
    """Per-key bounded rolling sum over the last ``window`` ordered rows
    (inclusive) — SQL ``SUM() OVER (PARTITION BY key ORDER BY ... ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Same one-shuffle plan as ``running_total``; the bounded window is a
    cumsum minus its group-wise ``shift(window)`` (exact integer
    arithmetic, no per-row loop). Pass an integer ``value_col``.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        df = df.copy(deep=False)
        cs = df.groupby(key, sort=False)[value_col].cumsum()
        df["_cs"] = cs
        shifted = df.groupby(key, sort=False)["_cs"].shift(window)
        df[out_col] = (cs - shifted.fillna(0)).astype("int64")
        return df.drop(columns=["_cs"])

    return hash_bucketed_groupby(ds, [key], fn, num_buckets)


def gap_stats(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    ts_col: str,
    num_buckets: int = 64,
):
    """Per-key statistics of the deltas between consecutive ordered rows —
    the ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ...)`` window
    aggregate reduced to (n_gaps, sum_gap, max_gap) per key.

    One keyed shuffle co-locates each key's rows; the per-bucket reducer
    mergesorts, takes a vectorized shifted difference, and aggregates —
    so the output is one row per key (keys with a single row have no gap
    and are absent, matching SQL's NULL-LAG filter). Pass integer
    ``ts_col`` (epoch seconds) so sums are exact, and ``order_cols`` that
    totally order rows within a key.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort")
        k = df[key_col].to_numpy()
        v = df[ts_col].to_numpy()
        if len(df) < 2:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=df[key_col].dtype),
                 "n_gaps": pd.Series([], dtype="int64"),
                 "sum_gap": pd.Series([], dtype="int64"),
                 "max_gap": pd.Series([], dtype="int64")}
            )
        same = k[1:] == k[:-1]
        gaps = pd.DataFrame({key_col: k[1:][same], "gap": (v[1:] - v[:-1])[same]})
        out = gaps.groupby(key_col, sort=False, as_index=False).agg(
            n_gaps=("gap", "size"), sum_gap=("gap", "sum"), max_gap=("gap", "max")
        )
        return out.astype({"n_gaps": "int64", "sum_gap": "int64", "max_gap": "int64"})

    cols = [key_col] + [c for c in order_cols if c != key_col]
    if ts_col not in cols:
        cols.append(ts_col)
    return hash_bucketed_groupby(ds.select_columns(cols), [key_col], fn, num_buckets)


def ordered_transitions(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    val_col: str,
    num_buckets: int = 64,
    from_alias: str = "from_v",
    to_alias: str = "to_v",
):
    """Adjacent-pair (bigram) transition counts per ordered key sequence —
    e.g. which tool call follows which across agent-transcript turns.

    One keyed shuffle co-locates each key's rows (hash buckets), a
    per-bucket mergesort + vectorized shift emits (from, to) PARTIAL
    counts (one row per distinct transition per bucket, not per row), and
    a tiny keyed reduce sums partials — so the second exchange moves at
    most |alphabet|^2 x num_buckets rows regardless of corpus size.
    """
    import pandas as pd

    from .relational import grouped_agg, hash_bucketed_groupby

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, order_col], kind="mergesort")
        k = df[key_col].to_numpy()
        v = df[val_col].to_numpy()
        if len(df) < 2:
            return pd.DataFrame({from_alias: [], to_alias: [], "n": []}).astype(
                {"n": "int64"}
            )
        same = k[1:] == k[:-1]
        out = pd.DataFrame({from_alias: v[:-1][same], to_alias: v[1:][same]})
        g = out.groupby([from_alias, to_alias], sort=False, as_index=False).size()
        return g.rename(columns={"size": "n"})

    partials = hash_bucketed_groupby(
        ds.select_columns([key_col, order_col, val_col]), [key_col], fn, num_buckets
    )
    return grouped_agg(partials, keys=[from_alias, to_alias], sums={"n": "n"})


def funnel_counts(
    ds: ray.data.Dataset,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    num_buckets: int = 64,
) -> pa.Table:
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    users completed it IN ORDER — user u completes step i when some
    event of type ``steps[i]`` has a timestamp strictly after u's
    (earliest-completion) time of step i-1. The classic product-analytics
    window query, exact and deterministic (int64 timestamps, MIN per
    step, strict > between steps).

    Plan: prune to funnel event types at the scan, ONE user-keyed
    shuffle co-locates each user's funnel events, then the per-bucket
    kernel resolves all steps vectorized — per step one groupby-min over
    the rows later than the user's previous-step time (k merges, no
    per-row Python). Per-step user counts are per-bucket partials summed
    on the driver (``len(steps)`` ints per bucket). The exchange moves
    only (user, type, ts) for in-funnel events; funnel semantics
    irreducibly require per-user co-location, so that shuffle IS the
    lower bound.
    """
    from .relational import hash_bucketed_groupby

    step_arr = pa.array(steps, type=pa.string())
    # index_in maps every event of a repeated step name to the FIRST
    # occurrence's index, so resolve must compare against that alias —
    # a repeat-purchase funnel ['signup','purchase','purchase'] works
    first_of = [steps.index(s) for s in steps]

    def prune(t: pa.Table) -> pa.Table:
        types = _chunked_str(t[type_col])
        keep = pc.is_in(types, value_set=step_arr)
        f = t.select([user_col, type_col, ts_col]).filter(keep)
        return pa.table(
            {
                "u": _chunked_i64(f[user_col]),
                "s": pc.cast(
                    pc.index_in(_chunked_str(f[type_col]), value_set=step_arr),
                    pa.int64(),
                ),
                "t": _chunked_i64(f[ts_col]),
            }
        )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # cur: per-user completion time of the previous step (None = out)
        counts = []
        cur = None
        for i in range(len(steps)):
            rows = df[df["s"] == first_of[i]]
            if cur is not None:
                rows = rows.merge(cur, on="u", how="inner")
                rows = rows[rows["t"] > rows["t_prev"]]
            cur = (
                rows.groupby("u", sort=False, as_index=False)["t"].min()
                .rename(columns={"t": "t_prev"})
            )
            counts.append(len(cur))
        return pd.DataFrame({"step_idx": range(len(steps)), "n_users": counts})

    parts = hash_bucketed_groupby(
        ds.map_batches(prune, batch_format="pyarrow"), ["u"], resolve, num_buckets
    )
    totals = [0] * len(steps)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        if "step_idx" not in b.schema.names:
            continue
        for i, n in zip(b["step_idx"].to_pylist(), b["n_users"].to_pylist()):
            totals[int(i)] += int(n)
    return pa.table(
        {
            "step_idx": pa.array(range(1, len(steps) + 1), type=pa.int64()),
            "step": pa.array(steps, type=pa.string()),
            "n_users": pa.array(totals, type=pa.int64()),
        }
    )


def _chunked_str(arr):
    c = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return c.cast(pa.string()) if c.type != pa.string() else c


def watermark_late_events(
    ds: ray.data.Dataset,
    seq_col: str = "event_id",
    ts_col: str = "ts_s",
    delay: int = 30,
    num_ranges: int = 1024,
) -> ray.data.Dataset:
    """Event-time watermark / late-data audit — the Flink/Beam
    bounded-out-of-orderness rule made deterministic. Events are replayed
    in arrival order (``seq_col``); after any arrival prefix the watermark
    is ``max(event time over the prefix) - delay``, and an event is LATE
    iff its event time falls strictly below the watermark carried by
    earlier arrivals. A streaming engine would drop (or side-output)
    those rows; here every row is kept and flagged so the result is a
    full per-event table an oracle can hash.

    A running prefix-max is inherently sequential, so it distributes the
    way ``sampling.mixture_sample``'s prefix sum does:

    1. range-partition arrivals into ``num_ranges`` equal-width
       ``seq_col`` slices; one combiner pass folds a per-range max-ts
       table (bounded: ``num_ranges`` rows) on the driver,
    2. an exclusive running max over that tiny table gives each range its
       carry-in watermark,
    3. one bucketed shuffle co-locates each range and a vectorized
       ``np.maximum.accumulate`` finishes it.

    ``num_ranges`` bounds per-task memory at corpus/num_ranges rows —
    raise it for bigger corpora (the driver fold stays num_ranges-sized).
    Output: (seq_col, ts_col, late) — late is int64 0/1.
    """
    lo = ds.min(seq_col)
    hi = ds.max(seq_col)
    if lo is None or hi is None:  # empty input
        return ray.data.from_arrow(
            pa.table(
                {seq_col: pa.array([], pa.int64()), ts_col: pa.array([], pa.int64()),
                 "late": pa.array([], pa.int64())}
            )
        )
    width = max(1, (int(hi) - int(lo)) // num_ranges + 1)
    _lo = int(lo)

    def tag(t: pa.Table) -> pa.Table:
        seq = pc.cast(_chunked_i64(t[seq_col]), pa.int64())
        rng = pc.divide(pc.subtract(seq, _lo), width)
        return pa.table(
            {
                seq_col: seq,
                ts_col: pc.cast(_chunked_i64(t[ts_col]), pa.int64()),
                "_rng": pc.cast(rng, pa.int64()),
            }
        )

    tagged = ds.select_columns([seq_col, ts_col]).map_batches(
        tag, batch_format="pyarrow"
    )

    def max_part(t: pa.Table) -> pa.Table:
        agg = t.group_by("_rng").aggregate([(ts_col, "max")])
        return agg.rename_columns(["_rng", "max_ts"])

    range_max: dict[int, int] = {}
    for b in tagged.map_batches(max_part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 16
    ):
        for r, m in zip(b["_rng"].to_pylist(), b["max_ts"].to_pylist()):
            r = int(r)
            m = int(m)
            if r not in range_max or m > range_max[r]:
                range_max[r] = m

    none = np.iinfo(np.int64).min // 4  # sentinel: "no earlier arrival"
    carry_in: dict[int, int] = {}
    running = none
    for r in sorted(range_max):
        carry_in[r] = running
        running = max(running, range_max[r])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # a hash bucket holds SEVERAL ranges: segmented exclusive cummax —
        # python cost is per segment (<= num_ranges/num_buckets), numpy within
        if len(df) == 0:
            return pd.DataFrame(
                {seq_col: pd.Series([], dtype="int64"),
                 ts_col: pd.Series([], dtype="int64"),
                 "late": pd.Series([], dtype="int64")}
            )
        df = df.sort_values(["_rng", seq_col], kind="mergesort")
        rng = df["_rng"].to_numpy(dtype=np.int64)
        ts = df[ts_col].to_numpy(dtype=np.int64)
        prev = np.empty_like(ts)
        starts = np.flatnonzero(np.r_[True, rng[1:] != rng[:-1]])
        bounds = np.r_[starts, len(ts)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            c = carry_in.get(int(rng[a]), none)
            prev[a] = c
            if b - a > 1:
                seg = np.maximum(ts[a : b - 1], c)
                np.maximum.accumulate(seg, out=seg)
                prev[a + 1 : b] = seg
        late = (prev > none) & (ts < prev - delay)
        return pd.DataFrame(
            {
                seq_col: df[seq_col].to_numpy(dtype=np.int64),
                ts_col: ts,
                "late": late.astype(np.int64),
            }
        )

    from .relational import hash_bucketed_groupby

    return hash_bucketed_groupby(tagged, ["_rng"], finish, num_buckets=64)
