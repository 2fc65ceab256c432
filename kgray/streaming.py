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
from ray.data.aggregate import Sum

from .relational import grouped_agg


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

    def split(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, order_col], kind="mergesort")
        ts = df[ts_col].astype("int64") // 1_000_000  # epoch seconds
        gaps = ts.diff().fillna(0)
        session = (gaps > gap_sec).cumsum()
        out = (
            pd.DataFrame(
                {
                    key_col: df[key_col].to_numpy(),
                    "session_id": session.to_numpy(),
                    "_ts": ts.to_numpy(),
                }
            )
            .groupby("session_id", sort=True)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "n_events": ("_ts", "size"),
                    "session_start": ("_ts", "min"),
                    "session_end": ("_ts", "max"),
                }
            )
            .reset_index()
        )
        return out[[key_col, "session_id", "n_events", "session_start", "session_end"]]

    return events.select_columns([key_col, ts_col, order_col]).groupby(
        key_col
    ).map_groups(split, batch_format="pandas")
