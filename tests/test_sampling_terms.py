"""Deterministic sampling (Knuth hash, stratified) and corpus term stats."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgray import sampling, textops


def _orders(n=5000, nblocks=4):
    keys = np.arange(1, n + 1, dtype=np.int64)
    prio = np.where(keys % 10 == 0, "1-URGENT", np.where(keys % 3 == 0, "2-HIGH", "3-LOW"))
    t = pa.table({"k": pa.array(keys), "prio": pa.array(prio.tolist(), type=pa.string())})
    return rd.from_arrow(t).repartition(nblocks), keys, prio


class TestHashSample:
    def test_rate_and_determinism(self):
        ds, keys, _ = _orders()
        out1 = sampling.hash_sample(ds, "k", rate_ppm=100_000)
        out2 = sampling.hash_sample(ds.repartition(9), "k", rate_ppm=100_000)
        k1 = sorted(r["k"] for b in out1.iter_batches(batch_format="pandas") for r in b.to_dict("records"))
        k2 = sorted(r["k"] for b in out2.iter_batches(batch_format="pandas") for r in b.to_dict("records"))
        assert k1 == k2  # partition-invariant
        # ~10% +- generous tolerance
        assert 0.05 * len(keys) < len(k1) < 0.15 * len(keys)
        # the exact keep rule is the documented integer arithmetic
        th = ((1 << 32) * 100_000) // 1_000_000
        expected = sorted(int(k) for k in keys if (int(k) * sampling.KNUTH) % (1 << 32) < th)
        assert k1 == expected

    def test_zero_and_full_rates(self):
        ds, keys, _ = _orders(500, 2)
        assert sampling.hash_sample(ds, "k", rate_ppm=0).count() == 0
        assert sampling.hash_sample(ds, "k", rate_ppm=1_000_000).count() == len(keys)


class TestStratifiedSample:
    def test_yield_per_stratum(self):
        ds, keys, prio = _orders(9000, 5)
        out = sampling.stratified_sample(ds, ["prio"], "k", target_per_stratum=150)
        df = pd.concat(list(out.iter_batches(batch_format="pandas")), ignore_index=True)
        got = df.groupby("prio").size()
        for stratum in ("1-URGENT", "2-HIGH", "3-LOW"):
            # Bernoulli: target +- 4*sqrt(target)
            assert 100 <= got[stratum] <= 220, (stratum, got[stratum])

    def test_small_stratum_kept_whole(self):
        t = pa.table(
            {
                "k": pa.array(np.arange(1, 1001, dtype=np.int64)),
                "s": pa.array(["rare"] * 20 + ["common"] * 980),
            }
        )
        ds = rd.from_arrow(t).repartition(3)
        out = sampling.stratified_sample(ds, ["s"], "k", target_per_stratum=50)
        df = pd.concat(list(out.iter_batches(batch_format="pandas")), ignore_index=True)
        assert (df["s"] == "rare").sum() == 20  # below target -> all kept


class TestTermStats:
    def test_top_terms_batch(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["b b a a c", "x  y x"]),
            }
        )
        out = textops.top_terms_batch(t, k=2)
        rows = out.to_pylist()
        # doc 1: a(2) and b(2) tie -> term ASC breaks it
        assert rows[0] == {"doc_id": 1, "term": "a", "tf": 2, "rn": 1}
        assert rows[1] == {"doc_id": 1, "term": "b", "tf": 2, "rn": 2}
        # doc 2: double space yields an empty token which must be dropped
        assert rows[2] == {"doc_id": 2, "term": "x", "tf": 2, "rn": 1}
        assert rows[3] == {"doc_id": 2, "term": "y", "tf": 1, "rn": 2}

    def test_term_df_order_and_truncation(self):
        docs = [f"common t{i}" for i in range(30)]  # 'common' df=30, t_i df=1
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(30, dtype=np.int64)),
                "text": pa.array(docs),
            }
        )
        out = textops.term_df(rd.from_arrow(t).repartition(3), top_n=5)
        assert out["term"].to_pylist() == ["common", "t0", "t1", "t10", "t11"]
        assert out["df"].to_pylist() == [30, 1, 1, 1, 1]


def test_weighted_sample_threshold_semantics(ray_session):
    """weight >= cap always survives, zero weight never, half-cap keeps
    exactly the keys whose 32-bit hash lands under 2^31."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.sampling import weighted_sample

    keys = list(range(1, 201))
    cap = 1000
    tbl = pa.table(
        {
            "k": keys * 3,
            "w": [cap] * 200 + [0] * 200 + [cap // 2] * 200,
            "tag": ["full"] * 200 + ["zero"] * 200 + ["half"] * 200,
        }
    )
    out = weighted_sample(
        rd.from_arrow(tbl).repartition(3), "k", "w", weight_cap=cap
    ).take_all()
    by_tag = {}
    for r in out:
        by_tag.setdefault(r["tag"], set()).add(r["k"])
    assert by_tag["full"] == set(keys)
    assert "zero" not in by_tag
    expect_half = {k for k in keys if (k * 2654435761) % 2**32 < 2**31}
    assert by_tag["half"] == expect_half


def test_mixture_sample_matches_sequential_cumsum(ray_session):
    """Distributed prefix-sum cutoff == single-threaded cumsum in hash
    order, with a budget that genuinely bisects every source."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray.sampling import KNUTH, MOD32, mixture_sample

    n = 400
    ids = np.arange(n)
    src = np.array([f"s{i % 3}" for i in ids])
    size = (ids % 37 + 5).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": ids, "source": src, "n_chars": size})
    ).repartition(5)
    budget = 600
    got = {
        r["doc_id"]
        for r in mixture_sample(ds, "source", "n_chars", budget=budget).take_all()
    }
    # independent reference
    expect = set()
    h = (ids * KNUTH) % MOD32
    for s in np.unique(src):
        sel = np.where(src == s)[0]
        order = sel[np.lexsort((ids[sel], h[sel]))]
        cum = 0
        for i in order:
            cum += int(size[i])
            if cum <= budget:
                expect.add(int(ids[i]))
    assert got == expect
    assert 0 < len(got) < n  # the budget actually bisected


def test_epoch_shuffle_order_matches_sequential(ray_session):
    """Distributed ROW_NUMBER == sequential lexsort rank per epoch, at
    two parallelisms; each epoch is a permutation of [0, n) and the two
    epochs order the corpus differently."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray.sampling import KNUTH, MOD32, epoch_shuffle_order

    n, E = 300, 2
    ids = np.arange(n, dtype=np.int64)
    expect = {}
    for e in range(E):
        h = ((ids * E + e) * KNUTH) % MOD32
        order = ids[np.lexsort((ids, h))]
        for pos, i in enumerate(order):
            expect[(int(i), e)] = pos

    for nblocks in (1, 5):
        ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(nblocks)
        rows = epoch_shuffle_order(ds, epochs=E).take_all()
        assert len(rows) == n * E
        got = {(r["doc_id"], r["epoch"]): r["ord"] for r in rows}
        assert got == expect
    perm0 = [expect[(i, 0)] for i in range(n)]
    perm1 = [expect[(i, 1)] for i in range(n)]
    assert sorted(perm0) == list(range(n)) and perm0 != perm1


def test_balanced_resample_factors(ray_session):
    """Oversample factors: 10-vs-3-vs-1 class counts give reps 1, 4
    (ceil 10/3), and 8 (ceil 10/1 capped); identical at two block
    counts."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.sampling import balanced_resample

    labels = [0] * 10 + [1] * 3 + [2]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(labels)), type=pa.int64()),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    for nblocks in (1, 3):
        ds = rd.from_arrow(t).repartition(nblocks)
        rows = balanced_resample(ds, max_rep=8).take_all()
        per_key = {}
        for r in rows:
            per_key.setdefault(r["vec_id"], []).append(r["rep"])
        assert all(len(per_key[k]) == 1 for k in range(10))        # majority
        assert all(sorted(per_key[k]) == [0, 1, 2, 3] for k in range(10, 13))
        assert sorted(per_key[13]) == list(range(8))               # capped


def test_train_bpe_classic_example(ray_session):
    """Sennrich-style worked example: corpus low x3, lower x2, newest x4,
    widest x1 -> merges (w,e) n=6, then the 5-count tie (l,o) before (s,t)
    by the lexicographic tiebreak."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.textops import train_bpe

    text = " ".join(["low"] * 3 + ["lower"] * 2 + ["newest"] * 4 + ["widest"])
    ds = rd.from_arrow(pa.table({"text": [text]})).repartition(1)
    out = train_bpe(ds, n_merges=3).to_pylist()
    assert [(r["left"], r["right"], r["n"]) for r in out] == [
        ("w", "e", 6), ("l", "o", 5), ("s", "t", 5),
    ]
    # parallelism invariance: words split across blocks, same merge table
    words = (["low"] * 3 + ["lower"] * 2 + ["newest"] * 4 + ["widest"])
    ds2 = rd.from_arrow(pa.table({"text": words})).repartition(4)
    out2 = train_bpe(ds2, n_merges=3).to_pylist()
    assert out2 == out
