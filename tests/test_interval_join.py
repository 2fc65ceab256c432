"""Interval (range) join: exact-once matching across bucket spans,
inclusive bounds, key isolation."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from kgray import streaming


def _ds(table, nblocks=3):
    return rd.from_arrow(table).repartition(nblocks)


def _collect(ds):
    t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    )
    return t


def _run(left_rows, right_rows, bucket_sec):
    left = pa.table(
        {
            "k": pa.array([r[0] for r in left_rows], type=pa.int64()),
            "t": pa.array([r[1] for r in left_rows], type=pa.int64()),
            "lid": pa.array([r[2] for r in left_rows], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([r[0] for r in right_rows], type=pa.int64()),
            "lo": pa.array([r[1] for r in right_rows], type=pa.int64()),
            "hi": pa.array([r[2] for r in right_rows], type=pa.int64()),
            "rid": pa.array([r[3] for r in right_rows], type=pa.int64()),
        }
    )
    out = streaming.interval_join(
        _ds(left), _ds(right), key="k", time_col="t",
        lo_col="lo", hi_col="hi", bucket_sec=bucket_sec,
    )
    t = _collect(out)
    return sorted(zip(t["lid"].to_pylist(), t["rid"].to_pylist()))


def test_exact_once_across_bucket_spans():
    # interval [5, 95] spans many 10-wide buckets; each in-range left
    # point must match exactly once despite the replication
    left = [(1, t, t) for t in range(0, 120, 7)]
    right = [(1, 5, 95, 900)]
    got = _run(left, right, bucket_sec=10)
    expected = sorted((t, 900) for t in range(0, 120, 7) if 5 <= t <= 95)
    assert got == expected


def test_inclusive_bounds():
    left = [(1, 9, 1), (1, 10, 2), (1, 20, 3), (1, 21, 4)]
    right = [(1, 10, 20, 77)]
    assert _run(left, right, bucket_sec=4) == [(2, 77), (3, 77)]


def test_key_isolation_and_multi_intervals():
    left = [(1, 15, 1), (2, 15, 2)]
    right = [(1, 10, 20, 100), (1, 14, 16, 101), (2, 0, 5, 200)]
    # key 1 point matches both overlapping intervals; key 2 matches none
    assert _run(left, right, bucket_sec=8) == [(1, 100), (1, 101)]


def test_brute_force_parity():
    rng = np.random.default_rng(3)
    left = [(int(k), int(t), i) for i, (k, t) in enumerate(
        zip(rng.integers(0, 4, 300), rng.integers(0, 1000, 300)))]
    right = []
    for j, (k, lo) in enumerate(zip(rng.integers(0, 4, 80), rng.integers(0, 950, 80))):
        right.append((int(k), int(lo), int(lo + rng.integers(0, 120)), 10_000 + j))
    got = _run(left, right, bucket_sec=64)
    expected = sorted(
        (lid, rid)
        for (lk, t, lid) in left
        for (rk, lo, hi, rid) in right
        if lk == rk and lo <= t <= hi
    )
    assert got == expected


def test_asof_dedup_right_matches_separate_dedup(ray_session):
    """asof_join(dedup_right=True) must equal exact_dedup on
    (key, ts) with the take column as the order key, followed by the
    plain as-of join — the fused path is an optimization, not a
    semantics change."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgray import dedup
    from kgray.relational import asof_join

    rng = np.random.RandomState(5)
    n_l, n_r = 800, 600
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 20, n_l).astype(np.int64),
            "ts": rng.randint(0, 1000, n_l).astype(np.int64),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    # right has DUPLICATE (k, ts) rows with differing payloads
    right = pd.DataFrame(
        {
            "rk": rng.randint(0, 20, n_r).astype(np.int64),
            "rts": rng.randint(0, 1000, n_r).astype(np.int64) // 50 * 50,
            "payload": rng.randint(0, 10**6, n_r).astype(np.int64),
        }
    )

    def run(fused: bool) -> pd.DataFrame:
        l_ds = rd.from_pandas(left, override_num_blocks=4)
        r = rd.from_pandas(right, override_num_blocks=4)
        if not fused:
            r = dedup.exact_dedup(r, ["rk", "rts"], ["payload"])
        out = asof_join(
            l_ds, r, left_on="k", right_on="rk", left_ts="ts", right_ts="rts",
            left_cols=["lid"], take_cols=["payload"], dedup_right=fused,
        )
        return (
            out.to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)[["lid", "payload"]]
        )

    a, b = run(True), run(False)
    pd.testing.assert_frame_equal(a, b)
