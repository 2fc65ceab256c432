"""Round-2 late operators: gap stats, above-mean counts, postings index,
text normalization (engine result vs an independent pandas/python check)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from kgray import relational, textops
from kgray.streaming import gap_stats


def _events_tbl(n=400, n_keys=17, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "k": pa.array(rng.randint(0, n_keys, n), type=pa.int64()),
            "eid": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(rng.randint(0, 10_000, n), type=pa.int64()),
            "v": pa.array(rng.randint(-500, 500, n), type=pa.int64()),
        }
    )


def test_gap_stats_matches_pandas(ray_session):
    tbl = _events_tbl()
    out = gap_stats(
        ray.data.from_arrow(tbl), "k", ["ts", "eid"], "ts", num_buckets=8
    ).take_all()
    df = tbl.to_pandas().sort_values(["k", "ts", "eid"])
    df["gap"] = df["ts"] - df.groupby("k")["ts"].shift(1)
    g = df.dropna(subset=["gap"]).groupby("k")["gap"]
    expected = {
        k: (int(s.size), int(s.sum()), int(s.max())) for k, s in g
    }
    got = {r["k"]: (r["n_gaps"], r["sum_gap"], r["max_gap"]) for r in out}
    assert got == expected


def test_gap_stats_single_row_keys_absent(ray_session):
    tbl = pa.table(
        {
            "k": pa.array([1, 2, 2], type=pa.int64()),
            "eid": pa.array([0, 1, 2], type=pa.int64()),
            "ts": pa.array([5, 10, 25], type=pa.int64()),
        }
    )
    out = gap_stats(ray.data.from_arrow(tbl), "k", ["ts", "eid"], "ts").take_all()
    assert {r["k"]: (r["n_gaps"], r["sum_gap"], r["max_gap"]) for r in out} == {
        2: (1, 15, 15)
    }


def test_above_mean_per_group_exact(ray_session):
    tbl = _events_tbl(n=300, n_keys=5, seed=11)
    out = relational.above_mean_per_group(
        ray.data.from_arrow(tbl), "k", "v"
    ).to_pandas()
    df = tbl.to_pandas()
    stats = df.groupby("k")["v"].agg(["sum", "size"])
    for r in out.itertuples():
        s, n = stats.loc[r.k, "sum"], stats.loc[r.k, "size"]
        expected = int((df.loc[df["k"] == r.k, "v"] * n > s).sum())
        assert (r.n_total, r.n_above) == (n, expected)
    assert set(out["k"]) == set(stats.index)


def test_above_mean_per_group_constant_group_zero(ray_session):
    tbl = pa.table(
        {"k": pa.array([1, 1, 1], type=pa.int64()),
         "v": pa.array([7, 7, 7], type=pa.int64())}
    )
    out = relational.above_mean_per_group(ray.data.from_arrow(tbl), "k", "v")
    assert out.to_pylist() == [{"k": 1, "n_total": 3, "n_above": 0}]


def test_postings_index_truncates_visibly(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(8)), type=pa.int64()),
            # 'common' in all 8 docs, 'rare' only in docs 2 and 5
            "text": [
                "common rare x2" if i in (2, 5) else "common only"
                for i in range(8)
            ],
        }
    )
    out = textops.postings_index(
        ray.data.from_arrow(docs), k=3, num_buckets=4
    ).take_all()
    by_term = {r["term"]: r for r in out}
    assert by_term["common"]["df"] == 8
    assert by_term["common"]["postings"] == "0,1,2"  # capped at k=3, df true
    assert by_term["rare"]["df"] == 2
    assert by_term["rare"]["postings"] == "2,5"
    assert by_term["only"]["df"] == 6


def test_normalize_text_batch_kernels():
    t = pa.table(
        {"text": ['  Hello, WORLD!! {"k": 42}', "", "a--b  c", "ALL CAPS"]}
    )
    out = textops.normalize_text_batch(t)
    assert out["norm_text"].to_pylist() == [
        "hello world k 42", "", "a b c", "all caps"
    ]
    assert out["n_chars"].to_pylist() == [16, 0, 5, 8]


def test_rolling_sum_matches_pandas(ray_session):
    from kgray.streaming import rolling_sum

    tbl = _events_tbl(n=300, n_keys=9, seed=5)
    out = rolling_sum(
        ray.data.from_arrow(tbl), key="k", order_cols=["ts", "eid"],
        value_col="v", window=3, out_col="roll", num_buckets=8,
    ).take_all()
    df = tbl.to_pandas().sort_values(["k", "ts", "eid"])
    df["roll"] = (
        df.groupby("k")["v"].rolling(3, min_periods=1).sum().to_numpy()
    )
    expected = {(r.k, r.eid): int(r.roll) for r in df.itertuples()}
    assert len(out) == 300
    assert all(expected[(r["k"], r["eid"])] == r["roll"] for r in out)


def test_embedding_norms_exact_fixed_point(ray_session):
    from kgray.similarity import embedding_norms

    vecs = np.array([[3.0, 4.0], [0.0, 0.0], [1.0, 1.0]])
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )
    out = {
        r["vec_id"]: r["norm_fp"]
        for r in embedding_norms(ray.data.from_arrow(tbl)).take_all()
    }
    # 3-4-5 triangle: exactly 5e6; sqrt(2)*1e6 floored
    assert out == {0: 5_000_000, 1: 0, 2: int(np.floor(np.sqrt(2e12)))}


def test_cohort_retention_matches_pandas(ray_session):
    from kgray.streaming import cohort_retention

    rng = np.random.RandomState(13)
    n = 500
    tbl = pa.table(
        {
            "u": pa.array(rng.randint(0, 40, n), type=pa.int64()),
            "w": pa.array(rng.randint(0, 6, n), type=pa.int64()),
        }
    )
    out = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(
            ray.data.from_arrow(tbl), "u", "w", num_buckets=8
        ).take_all()
    }
    df = tbl.to_pandas().drop_duplicates()
    df["cw"] = df.groupby("u")["w"].transform("min")
    exp = (
        df.assign(off=df["w"] - df["cw"])
        .groupby(["cw", "off"])
        .size()
        .to_dict()
    )
    assert out == exp


def test_broadcast_lookup_join_inner_both_routes(ray_session):
    fact, dim = _fact_dim_small()
    for limit in (100, 0):  # broadcast route, then forced shuffle-join route
        out = relational.broadcast_lookup_join(
            fact, dim, "k", "dk", ["name"], broadcast_limit=limit, how="inner"
        ).take_all()
        got = sorted((r["k"], r["x"], r["name"]) for r in out)
        assert got == [(1, 10, "n1"), (2, 20, "n2"), (2, 21, "n2")]


def _fact_dim_small():
    fact = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 9], type=pa.int64()),
                  "x": pa.array([10, 20, 21, 90], type=pa.int64())})
    )
    dim = ray.data.from_arrow(
        pa.table({"dk": pa.array([1, 2, 3], type=pa.int64()),
                  "name": ["n1", "n2", "n3"]})
    )
    return fact, dim


def test_feature_scale_exact_and_constant_dim(ray_session):
    from kgray.similarity import feature_scale

    vecs = np.array(
        [[0.0, 5.0, 1.0], [1.0, 5.0, 3.0], [0.5, 5.0, 2.0]], dtype=np.float64
    )
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )
    out = {
        (r["vec_id"], r["pos"]): r["scaled_ppm"]
        for r in feature_scale(ray.data.from_arrow(tbl)).take_all()
    }
    # dim 1: min 0, max 1e6 -> 0 / 1e6 / 5e5; dim 2 constant -> 0; dim 3 linear
    assert out[(0, 1)] == 0 and out[(1, 1)] == 1_000_000 and out[(2, 1)] == 500_000
    assert out[(0, 2)] == out[(1, 2)] == out[(2, 2)] == 0
    assert out[(0, 3)] == 0 and out[(1, 3)] == 1_000_000 and out[(2, 3)] == 500_000


def test_kmeans_assign_planted_clusters(ray_session):
    from kgray.similarity import kmeans_assign

    rng = np.random.RandomState(17)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    pts = np.vstack(
        [c + rng.normal(0, 0.3, size=(30, 2)) for c in centers]
    )
    # ids 0..2 are one point from each planted cluster (the k-means seeds)
    order = np.concatenate([[0, 30, 60], np.delete(np.arange(90), [0, 30, 60])])
    pts = pts[order]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(90), type=pa.int64()),
            "embedding": pa.array(list(pts), type=pa.list_(pa.float32())),
        }
    )
    out = kmeans_assign(
        ray.data.from_arrow(tbl), k=3, iters=3
    ).to_pandas().sort_values("vec_id")
    lab = out["cluster"].to_numpy()
    truth = np.array([0, 1, 2] + [0] * 29 + [1] * 29 + [2] * 29)
    # well-separated planted clusters: assignment == truth exactly
    assert (lab == truth).all()


def test_grouped_linfit_exact_rational(ray_session):
    tbl = pa.table(
        {
            "g": pa.array([0, 0, 0, 1, 1], type=pa.int64()),
            "x": pa.array([0, 1, 2, 10, 20], type=pa.int64()),
            "y": pa.array([5, 7, 9, 100, 50], type=pa.int64()),
        }
    )
    out = {
        r["g"]: (r["n"], r["slope_num"], r["slope_den"])
        for r in relational.grouped_linfit(
            ray.data.from_arrow(tbl), "g", "x", "y"
        ).to_pylist()
    }
    # group 0: perfect slope 2 -> num/den = 12/6; group 1: slope -5 -> -500/100
    assert out[0] == (3, 12, 6)
    assert out[1] == (2, -500, 100)
    # empty input degenerates to an empty table, never raises
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    assert relational.grouped_linfit(empty, "g", "x", "y").num_rows == 0


def test_bm25_keywords_formula_and_ranking(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "apple apple banana",   # apple tf=2 rare -> top
                "banana banana banana", # only banana
                "apple cherry",
            ],
        }
    )
    out = textops.bm25_keywords(ray.data.from_arrow(docs), k=2).to_pandas()
    top0 = out[out["doc_id"] == 0].sort_values("rn")
    # apple (tf 2, df 2) must outrank banana (tf 1, df 2) in doc 0
    assert list(top0["term"]) == ["apple", "banana"]
    # spot-check the exact integer formula for doc 0 / apple:
    # N=3, T=8, tf=2, dl=3, df=2 -> num=1000*22*2*8*(2*3-4+1), den=((20+3)*8+9*3*3)*(2*2+1)
    num = 1000 * 22 * 2 * 8 * 3
    den = ((10 * 2 + 3) * 8 + 9 * 3 * 3) * 5
    assert int(top0.iloc[0]["score_ppk"]) == num // den
    # every doc emits at most k rows with rn 1..k
    assert out.groupby("doc_id")["rn"].max().le(2).all()


def test_heavy_hitters_exact_and_complete(ray_session):
    # skewed corpus: 'hot' dominates; 'warm' sits just above 1/4; the rest
    # are a long tail no single batch promotes
    texts = (["hot hot hot warm"] * 10) + [f"cold{i} x{i} y{i}" for i in range(10)]
    docs = pa.table({"text": texts})
    out = {
        r["term"]: r["n"]
        for r in textops.heavy_hitters(
            ray.data.from_arrow(docs), k=4
        ).to_pylist()
    }
    # 70 tokens total: hot=30 (3/7), warm=10 (1/7 < 1/4 -> excluded)
    assert out == {"hot": 30}
    # lower threshold admits warm with its exact count
    out2 = {
        r["term"]: r["n"]
        for r in textops.heavy_hitters(
            ray.data.from_arrow(docs), k=8
        ).to_pylist()
    }
    assert out2 == {"hot": 30, "warm": 10}


def test_ohlc_merges_partials_across_blocks(ray_session):
    from kgray.streaming import ohlc

    rng = np.random.RandomState(23)
    n = 600
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(0, 4, n), type=pa.int64()),
            "win": pa.array(rng.randint(0, 3, n) * 3600, type=pa.int64()),
            "ts": pa.array(rng.randint(0, 10_000, n), type=pa.int64()),
            "eid": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(rng.randint(-999, 999, n), type=pa.int64()),
        }
    )
    # many small blocks so the combiner + merge path is actually exercised
    ds = ray.data.from_arrow(tbl).repartition(12)
    got = {
        (r["k"], r["win"]): (r["open_v"], r["high_v"], r["low_v"], r["close_v"], r["n"])
        for r in ohlc(ds, "k", "win", ["ts", "eid"], "v", num_buckets=8).take_all()
    }
    df = tbl.to_pandas().sort_values(["k", "win", "ts", "eid"])
    exp = {}
    for (k, w), g in df.groupby(["k", "win"]):
        exp[(k, w)] = (
            int(g["v"].iloc[0]), int(g["v"].max()), int(g["v"].min()),
            int(g["v"].iloc[-1]), len(g),
        )
    assert got == exp


def test_fuzzy_name_pairs_radius_one_complete_and_exact(ray_session):
    from kgray.dedup import _one_edit, fuzzy_name_pairs

    # one-edit scan vs all edit kinds + a distance-2 variant-collision trap
    assert _one_edit("cat", "cat") and _one_edit("cat", "cut")      # sub
    assert _one_edit("cat", "cats") and _one_edit("cart", "cat")    # ins/del
    assert not _one_edit("ab", "ba")  # distance 2 but shares deletion variants
    assert not _one_edit("cat", "dog")

    names = ["gold ring", "bold ring", "gold rings", "silver bar",
             "ab", "ba", "gold ring"]
    ds = ray.data.from_arrow(pa.table({"p_name": names}))
    got = sorted(
        (r["name_a"], r["name_b"]) for r in fuzzy_name_pairs(ds).take_all()
    )
    assert got == [("bold ring", "gold ring"), ("gold ring", "gold rings")]


def test_ntile_uneven_split_matches_sql_semantics(ray_session):
    # n=10, k=4 -> bucket sizes 3,3,2,2 (first n%k buckets take the extra)
    tbl = pa.table(
        {
            "g": pa.array([0] * 10, type=pa.int64()),
            "o": pa.array(list(range(10)), type=pa.int64()),
        }
    )
    out = relational.ntile_per_group(
        ray.data.from_arrow(tbl), "g", ["o"], k=4, num_buckets=4
    ).to_pandas().sort_values("o")
    assert list(out["tile"]) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # tiny group: n=2, k=4 -> tiles 1 and 2, never an empty-middle skip
    t2 = pa.table(
        {"g": pa.array([5, 5], type=pa.int64()),
         "o": pa.array([0, 1], type=pa.int64())}
    )
    out2 = relational.ntile_per_group(
        ray.data.from_arrow(t2), "g", ["o"], k=4
    ).to_pandas().sort_values("o")
    assert list(out2["tile"]) == [1, 2]
