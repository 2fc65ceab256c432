"""Size-routed join policies (relational.py)."""

import pandas as pd
import pyarrow as pa

import ray.data

from kgray import relational


def _fact_dim():
    fact = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 2, 9], type=pa.int64()),
                  "x": pa.array([10, 20, 30, 40, 21, 90], type=pa.int64())})
    )
    dim = ray.data.from_arrow(
        pa.table({"dk": pa.array([1, 2, 3, 4, 5, 6, 7, 8], type=pa.int64()),
                  "name": [f"n{i}" for i in range(1, 9)]})
    )
    return fact, dim


def _rows(ds):
    out = []
    for r in ds.take_all():
        v = r.get("name")
        v = None if v is None or (isinstance(v, float) and pd.isna(v)) else v
        out.append((r["k"], r["x"], v))
    return sorted(out, key=lambda t: (t[0], t[1], t[2] or ""))


def test_broadcast_lookup_join_routes_small_dim_to_broadcast(ray_session):
    fact, dim = _fact_dim()
    out = relational.broadcast_lookup_join(fact, dim, "k", "dk", ["name"])
    rows = _rows(out)
    assert rows == sorted(
        [(1, 10, "n1"), (2, 20, "n2"), (3, 30, "n3"), (4, 40, "n4"),
         (2, 21, "n2"), (9, 90, None)],
        key=lambda t: (t[0], t[1], t[2] or ""),
    )


def test_broadcast_lookup_join_routes_large_dim_to_shuffle_join(ray_session):
    """Past broadcast_limit the dim side must go through the hash join —
    same left-join contract, no driver pandas of the dim table."""
    fact, dim = _fact_dim()
    out = relational.broadcast_lookup_join(
        fact, dim, "k", "dk", ["name"], broadcast_limit=2, num_partitions=2
    )
    rows = _rows(out)
    assert rows == sorted(
        [(1, 10, "n1"), (2, 20, "n2"), (3, 30, "n3"), (4, 40, "n4"),
         (2, 21, "n2"), (9, 90, None)],
        key=lambda t: (t[0], t[1], t[2] or ""),
    )


def test_broadcast_lookup_join_accepts_dataframe(ray_session):
    fact, dim = _fact_dim()
    dim_df = pd.DataFrame({"dk": [1, 2], "name": ["n1", "n2"]})
    out = relational.broadcast_lookup_join(fact, dim_df, "k", "dk", ["name"])
    assert (1, 10, "n1") in _rows(out)


def test_marker_join_empty_right_side(ray_session):
    """anti_join(left, empty) == left; semi_join(left, empty) == empty
    (the advisor-found null-typed is_in crash)."""
    fact, _ = _fact_dim()
    empty = ray.data.from_arrow(pa.table({"dk": pa.array([], type=pa.int64())}))
    assert relational.anti_join(fact, empty, on="k", right_on="dk").count() == 6
    assert relational.semi_join(fact, empty, on="k", right_on="dk").count() == 0


def test_asof_join_backward_and_nulls(ray_session):
    import numpy as np
    import pyarrow as pa

    def ts(s):
        return np.datetime64(f"2025-01-0{s}T00:00:00", "us")

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], type=pa.int64()),
                "lts": pa.array([ts(3), ts(1), ts(5), ts(2)], type=pa.timestamp("us")),
                "lid": pa.array([10, 11, 12, 13], type=pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 1, 2], type=pa.int64()),
                "rts": pa.array([ts(1), ts(2), ts(9)], type=pa.timestamp("us")),
                "v": pa.array([100, 200, 300], type=pa.int64()),
            }
        )
    )
    out = relational.asof_join(
        left, right, left_on="k", right_on="rk", left_ts="lts", right_ts="rts",
        left_cols=["lid"], take_cols=["v"], num_buckets=4,
    ).take_all()
    got = {r["lid"]: r["v"] for r in out}
    assert got == {
        10: 200,   # k=1 @d3 -> latest right <= d3 is d2
        11: 100,   # k=1 @d1 -> exact-match d1 (backward includes equality)
        12: None,  # k=2 @d5 -> only right is d9 (future) -> null
        13: None,  # k=3 -> no right rows at all
    }
    # int64 take column survives the pandas null round trip as int64/null
    assert all(isinstance(r["v"], int) for r in out if r["v"] is not None)


def test_asof_join_forward(ray_session):
    import numpy as np
    import pyarrow as pa

    def ts(s):
        return np.datetime64(f"2025-01-0{s}T00:00:00", "us")

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "lts": pa.array([ts(3)], type=pa.timestamp("us")),
                "lid": pa.array([10], type=pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 1], type=pa.int64()),
                "rts": pa.array([ts(1), ts(5)], type=pa.timestamp("us")),
                "v": pa.array([100, 500], type=pa.int64()),
            }
        )
    )
    out = relational.asof_join(
        left, right, left_on="k", right_on="rk", left_ts="lts", right_ts="rts",
        left_cols=["lid"], take_cols=["v"], direction="forward", num_buckets=2,
    ).take_all()
    assert out[0]["v"] == 500  # earliest right >= d3


def test_running_total_matches_pandas(ray_session):
    import numpy as np
    import pyarrow as pa

    from kgray.streaming import running_total

    rng = np.random.RandomState(7)
    n = 500
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(0, 20, n), type=pa.int64()),
            "o": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(rng.randint(-50, 50, n), type=pa.int64()),
        }
    )
    out = running_total(
        ray.data.from_arrow(tbl), key="k", order_cols=["o"], value_col="v",
        out_col="run", num_buckets=8,
    ).take_all()
    df = tbl.to_pandas().sort_values(["k", "o"])
    df["run"] = df.groupby("k")["v"].cumsum()
    expected = {(r.k, r.o): r.run for r in df.itertuples()}
    assert len(out) == n
    assert all(expected[(r["k"], r["o"])] == r["run"] for r in out)


def test_hll_distinct_matches_exact_within_error(ray_session):
    """HyperLogLog distinct-per-group tracks the exact operator within the
    p=12 error bound across blocks/partials; deterministic across runs."""
    import numpy as np
    import pyarrow as pa

    from kgray.sketch import hll_distinct_per_group

    rng = np.random.RandomState(9)
    n = 30000
    tbl = pa.table(
        {
            "g": pa.array(rng.choice(["x", "y", "z"], n)),
            "v": pa.array(rng.randint(0, 5000, n), type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct_per_group(ds, "g", "v", precision=12).take_all()
    }
    df = tbl.to_pandas()
    exact = df.groupby("g")["v"].nunique()
    for g in ("x", "y", "z"):
        assert abs(got[g] - exact[g]) / exact[g] < 0.05
    # deterministic: a second run returns identical estimates
    again = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct_per_group(ds, "g", "v", precision=12).take_all()
    }
    assert got == again


def test_semi_join_bloom_shuffle_path_matches_broadcast(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import relational

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(2000, dtype=np.int64) % 700),
                "payload": pa.array(np.arange(2000, dtype=np.int64)),
            }
        )
    ).repartition(4)
    right = rd.from_arrow(
        pa.table({"dk": pa.array(np.arange(0, 700, 3, dtype=np.int64))})
    ).repartition(3)

    def collect(ds):
        t = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        )
        return sorted(zip(t["k"].to_pylist(), t["payload"].to_pylist()))

    broadcast = relational.semi_join(left, right, on="k", right_on="dk")
    # broadcast_limit=0 forces the bloom-prefilter + shuffle-join path
    bloomed = relational.semi_join(
        left, right, on="k", right_on="dk", broadcast_limit=0
    )
    expected = collect(broadcast)
    assert expected == collect(bloomed)
    assert len(expected) == sum(1 for i in range(2000) if (i % 700) % 3 == 0)

    # anti on the shuffle path (no bloom) must stay exact too
    anti = relational.anti_join(left, right, on="k", right_on="dk", broadcast_limit=0)
    assert anti.count() == 2000 - len(expected)


def test_bloom_prefilter_sound_and_selective(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import relational

    left = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(50_000, dtype=np.int64))})
    ).repartition(4)
    keys = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(0, 50_000, 100, dtype=np.int64))})
    ).materialize()

    out = relational._bloom_prefilter(left, keys, "k", "k")
    kept = set()
    for b in out.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        kept.update(b["k"].to_pylist())
    truth = set(range(0, 50_000, 100))
    assert truth <= kept  # soundness: zero false negatives
    fpr = (len(kept) - len(truth)) / (50_000 - len(truth))
    assert fpr < 0.01  # 16 bits/key, 8 probes -> ~5e-4 expected

    # the distributed partial-bitmap build (forced via threshold 0) must
    # produce the identical bitmap -> identical kept set
    dist = relational._bloom_prefilter(left, keys, "k", "k", partial_threshold=0)
    kept_dist = set()
    for b in dist.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        kept_dist.update(b["k"].to_pylist())
    assert kept_dist == kept


def test_percentile_rank_joined_matches_broadcast(ray_session):
    """The beyond-cap distributed percentile path (value-range prefix sum
    + hash join, forced via cardinality_cap=0) must be bit-identical to
    the driver-fold broadcast path on a skewed multiset — and must keep
    every other column intact."""
    import numpy as np

    import ray.data as rd

    rng = np.random.RandomState(41)
    vals = np.concatenate(
        [
            rng.randint(-500, 4000, 5000),     # dense ties
            rng.randint(10**9, 10**9 + 10**6, 3000),  # far sparse band
            np.full(200, 7),                   # hot value
        ]
    ).astype(np.int64)
    ids = np.arange(len(vals), dtype=np.int64)
    t = pa.table({"id": pa.array(ids), "x": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(7)

    base = {
        r["id"]: r["pct_ppm"]
        for r in relational.percentile_rank(ds, "x").take_all()
    }
    joined = relational.percentile_rank(ds, "x", cardinality_cap=0).take_all()
    assert {r["id"]: r["pct_ppm"] for r in joined} == base
    assert set(joined[0].keys()) == {"id", "x", "pct_ppm"}

    # spot-check the definition on the hot value: floor(1e6 * below / n)
    below = int((vals < 7).sum())
    want = 1_000_000 * below // len(vals)
    hot_ids = set(ids[vals == 7].tolist())
    assert all(base[i] == want for i in hot_ids)


def test_percentile_rank_high_cardinality_routes_distributed(ray_session):
    """~10^6 near-distinct values with a small cardinality_cap: the driver
    fold must abort at the cap and the joined path must still produce
    exact ranks (spot-checked against numpy on the generated array)."""
    import numpy as np

    import ray.data as rd

    n = 1_000_000
    rng = np.random.RandomState(8)
    vals = rng.randint(0, 1 << 40, n).astype(np.int64)  # ~all distinct
    t = pa.table(
        {"id": pa.array(np.arange(n, dtype=np.int64)), "x": pa.array(vals)}
    )
    ds = rd.from_arrow(t).repartition(16)
    out = relational.percentile_rank(ds, "x", cardinality_cap=10_000)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        ids = b["id"].to_numpy(zero_copy_only=False)
        ppm = b["pct_ppm"].to_numpy(zero_copy_only=False)
        for i in range(0, len(ids), 9973):  # sparse spot-check
            got[int(ids[i])] = int(ppm[i])
    assert len(got) > 50
    order = np.sort(vals)
    for i, p in got.items():
        below = int(np.searchsorted(order, vals[i], side="left"))
        assert p == (1_000_000 * below) // n


def test_hll_ranks_exact_at_bit_boundaries():
    """ADVICE r4: float64 log2 misrounds a few ulps below powers of two
    (floor(log2(2**50 - 1)) == 50.0) — _ranks must compute the
    highest-set-bit position EXACTLY (integer smear) so the engine
    register agrees with the bit-exact SQL mirror for every suffix."""
    import numpy as np

    from kgray.sketch import _ranks

    p = 14
    q = 64 - p
    vals = {0, 1, (1 << q) - 1}
    for e in range(1, q):
        vals.update({(1 << e) - 1, (1 << e), (1 << e) + 1})
        if (1 << e) >= 2:
            vals.add((1 << e) - 2)
    vals = sorted(v for v in vals if 0 <= v < (1 << q))
    h = np.array(vals, dtype=np.uint64)  # register 0, suffix = value
    _reg, rank = _ranks(h, p)
    for v, r in zip(vals, rank):
        expect = q + 1 if v == 0 else q - (int(v).bit_length() - 1)
        assert r == expect, (v, r, expect)
