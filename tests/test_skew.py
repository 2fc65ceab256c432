"""Hot-key skew: a dominant triple / entity must not break correctness,
and the partial-combine discipline must bound what the shuffle moves."""

import numpy as np
import pyarrow as pa

import ray.data

from kgray.materialize import _partial_dedup, build_edges


def _skewed_triples(n=20000, n_blocks=8):
    """50% of all mentions are ONE hot triple; the rest spread over 1000."""
    rng = np.random.RandomState(42)
    hot = rng.random(n) < 0.5
    s = np.where(hot, 0, rng.randint(1, 1000, n))
    o = np.where(hot, 1, rng.randint(1, 1000, n))
    p = np.where(hot, 0, rng.randint(0, 6, n))
    t = pa.table(
        {
            "conv_id": pa.array([f"conv-{i % 97}" for i in range(n)]),
            "turn_idx": pa.array((np.arange(n) % 7).astype(np.int32)),
            "subject_id": pa.array([f"RAW:{x}" for x in s]),
            "predicate": pa.array([f"biolink:p{x}" for x in p]),
            "object_id": pa.array([f"RAW:{x}" for x in o]),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks), t


def test_partial_combine_bounds_shuffle_volume():
    # within ONE block, the hot key collapses to a single row
    _, t = _skewed_triples()
    partial = _partial_dedup(t)
    # 1 hot row + at most one row per cold mention (~half the input)
    assert partial.num_rows <= 1 + 10100
    hot = partial.filter(
        pa.compute.and_(
            pa.compute.equal(partial["subject"], "RAW:0"),
            pa.compute.equal(partial["predicate"], "biolink:p0"),
        )
    )
    assert hot.num_rows == 1
    assert hot["n_mentions"][0].as_py() > 9000


def test_skewed_edges_correct(ray_session):
    ds, t = _skewed_triples()
    edges = build_edges(ds).take_all()
    by_key = {(r["subject"], r["predicate"], r["object"]): r for r in edges}
    # exact dedup: hot triple appears once with the full mention count
    hot = by_key[("RAW:0", "biolink:p0", "RAW:1")]
    n = t.num_rows
    expect_hot = sum(
        1 for s, o in zip(t["subject_id"].to_pylist(), t["object_id"].to_pylist())
        if s == "RAW:0" and o == "RAW:1"
    )
    assert hot["n_mentions"] == expect_hot
    assert sum(r["n_mentions"] for r in edges) == n
    # provenance is the minimum (conv, turn) key, deterministic under skew
    assert hot["first_conv_id"] == "conv-0"


def test_salted_groupby_hot_key_mode(ray_session):
    """One key holds 99% of rows; mode via the salted two-phase groupby
    must equal the scalar reference, and every phase-1 (key, salt) slice
    must be ~1/num_salts of the hot key (the skew-spread guarantee)."""
    import pandas as pd

    from kgray.relational import mode_per_group

    rng = np.random.RandomState(7)
    n = 50_000
    hot = rng.random(n) < 0.99
    key = np.where(hot, "hot", "cold")
    val = np.where(hot, rng.randint(0, 50, n), rng.randint(0, 5, n)).astype(np.int64)
    df = pd.DataFrame({"k": key, "v": val})

    ds = ray.data.from_pandas(df, override_num_blocks=8)
    out = (
        mode_per_group(ds, "k", "v", num_salts=8)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )

    for k, sub in df.groupby("k"):
        cnt = sub.groupby("v").size()
        top_n = cnt.max()
        expect = cnt[cnt == top_n].index.min()  # ties -> smallest value
        assert out.loc[k, "v_mode"] == expect
        assert out.loc[k, "n_mode"] == top_n


def test_quantile_disc_counts_matches_row_sort(ray_session):
    """Count-CDF quantile pick == sorting the raw rows, across qs and
    group sizes (incl. a size-1 group and a giant skewed group)."""
    import pandas as pd

    from kgray.relational import quantile_disc_per_group

    rng = np.random.RandomState(3)
    ks = np.r_[np.repeat("giant", 30_000), np.repeat("mid", 500), ["one"]]
    vs = np.r_[
        rng.randint(0, 100, 30_000), rng.randint(0, 1_000_000, 500), [42]
    ].astype(np.int64)
    df = pd.DataFrame({"g": ks, "x": vs})
    ds = ray.data.from_pandas(df, override_num_blocks=8)

    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        out = (
            quantile_disc_per_group(ds, "g", "x", q=q)
            .to_pandas()
            .set_index("g")["x_q"]
        )
        for g, sub in df.groupby("g"):
            xs = np.sort(sub["x"].to_numpy())
            assert out[g] == xs[int(np.floor((len(xs) - 1) * q))], (g, q)


def test_skew_routed_join_parity_and_routing(ray_session):
    """skew_routed_join == shuffle_join row-for-row with a forced tiny
    threshold (both routes live), with no hot keys (cold-only route),
    and under a celebrity key holding half the fact stream."""
    import pandas as pd

    from kgray.relational import shuffle_join, skew_routed_join

    rng = np.random.RandomState(7)
    n = 6000
    # key 0 is the celebrity: half the stream
    keys = np.where(rng.random(n) < 0.5, 0, rng.randint(1, 200, n)).astype(np.int64)
    fact = ray.data.from_arrow(
        pa.table({"k": keys, "v": np.arange(n, dtype=np.int64)})
    ).repartition(6)
    dim = ray.data.from_arrow(
        pa.table(
            {
                "dk": np.arange(200, dtype=np.int64),
                "name": [f"n{i}" for i in range(200)],
            }
        )
    ).repartition(2)

    def collect(ds):
        rows = ds.take_all()
        return sorted((r["k"], r["v"], r["name"]) for r in rows)

    want = collect(
        shuffle_join(fact, dim, on=("k",), right_on=("dk",), how="inner")
        .map_batches(lambda df: df[["k", "v", "name"]], batch_format="pandas")
    )
    # forced threshold: the celebrity (and a few more) route hot
    got = collect(
        skew_routed_join(
            fact, dim, "k", "dk", ["name"], hot_count_threshold=100
        )
    )
    assert got == want
    # threshold nothing reaches: pure cold route, same rows
    got_cold = collect(
        skew_routed_join(
            fact, dim, "k", "dk", ["name"], hot_count_threshold=10**9
        )
    )
    assert got_cold == want
    # forced beyond-cap detection AND beyond-limit cold dim: the
    # distributed grouped-reduce detection and the hash-shuffle cold
    # branch must find the same hot set and produce the same rows
    got_dist = collect(
        skew_routed_join(
            fact, dim, "k", "dk", ["name"], hot_count_threshold=100,
            detect_cardinality_cap=0, dim_broadcast_limit=0,
        )
    )
    assert got_dist == want


def test_exact_hot_detection_and_local_agg_parity(ray_session):
    """skew_routed_join's detection is EXACT: the hot set equals the true
    over-threshold keys even when a key's rows are split across many
    blocks (the failure mode of per-block top-k folds). grouped_agg_local
    == grouped_agg on a dimension-bounded key."""
    import pandas as pd

    from kgray.relational import grouped_agg, grouped_agg_local

    rng = np.random.RandomState(11)
    n = 8000
    # every key appears 4..120 times, spread uniformly over 16 blocks so
    # no single block's top-k would surface the per-block slivers
    keys = rng.randint(0, 400, n).astype(np.int64)
    vals = rng.randint(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(16)

    import collections

    true_counts = collections.Counter(keys.tolist())
    thresh = 30
    want_hot = {k for k, c in true_counts.items() if c >= thresh}

    # drive detection through the public join: dim covers every key, so
    # routing exactness is observable via the hot-branch row count
    from kgray.relational import skew_routed_join, shuffle_join

    dim = ray.data.from_arrow(
        pa.table({"dk": np.arange(400, dtype=np.int64),
                  "tag": [f"t{i}" for i in range(400)]})
    )
    got = skew_routed_join(ds, dim, "k", "dk", ["tag"],
                           hot_count_threshold=thresh).take_all()
    want = shuffle_join(ds, dim, on=("k",), right_on=("dk",), how="inner")
    want = want.map_batches(
        lambda df: df[["k", "v", "tag"]], batch_format="pandas"
    ).take_all()
    assert sorted((r["k"], r["v"], r["tag"]) for r in got) == sorted(
        (r["k"], r["v"], r["tag"]) for r in want
    )

    # the detection itself, probed directly: grouped_agg partial-count
    # equals the true counter, and local-fold equals the shuffled fold
    shuffled = grouped_agg(ds, keys=["k"], sums={"sv": "v"}, count_alias="n")
    a = pd.concat(
        list(shuffled.iter_batches(batch_format="pandas", batch_size=1 << 20))
    ).sort_values("k").reset_index(drop=True)
    b = grouped_agg_local(ds, keys=["k"], sums={"sv": "v"}, count_alias="n")
    b = b.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["k", "sv", "n"]], b[["k", "sv", "n"]], check_dtype=False
    )
    assert dict(zip(a["k"], a["n"])) == dict(true_counts)
    assert {k for k, c in zip(a["k"], a["n"]) if c >= thresh} == want_hot
