"""tf-idf keyword extraction and the hash train/val/test split."""

import numpy as np
import pyarrow as pa


def _toy_docs():
    import ray.data as rd

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "apple egg egg egg fig",
        "cherry date fig",
        "unique singleton words only",
    ]
    return rd.from_arrow(
        pa.table({"doc_id": list(range(5)), "text": texts})
    ).repartition(2)


def _collect(ds):
    import pandas as pd

    dfs = list(ds.iter_batches(batch_format="pandas", batch_size=1 << 16))
    out = pd.concat(dfs, ignore_index=True)
    return out.sort_values(["doc_id", "rn"]).reset_index(drop=True)


def test_tfidf_ranks_rare_terms_above_common(ray_session):
    from kgray.textops import tfidf_top_terms

    out = _collect(tfidf_top_terms(_toy_docs(), k=2))
    by_doc = {d: list(g["term"]) for d, g in out.groupby("doc_id")}
    # doc 0: apple tf=2 df=2 -> 1e6; banana tf=1 df=2, cherry tf=1 df=2 ->
    # 5e5 each, banana wins the term tiebreak
    assert by_doc[0] == ["apple", "banana"]
    # doc 2: egg tf=3 df=1 -> 3e6 beats apple tf=1 df=2
    assert by_doc[2][0] == "egg"
    # singleton-word doc: all score 1e6, term-alphabetical
    assert by_doc[4] == ["only", "singleton"]


def test_tfidf_join_path_matches_broadcast(ray_session):
    from kgray.textops import tfidf_top_terms

    broadcast = _collect(tfidf_top_terms(_toy_docs(), k=3))
    joined = _collect(tfidf_top_terms(_toy_docs(), k=3, vocab_broadcast_limit=0))
    cols = ["doc_id", "term", "tf", "df", "score", "rn"]
    assert broadcast[cols].astype(str).values.tolist() == \
        joined[cols].astype(str).values.tolist()


def test_hash_split_coherent_and_mirrorable(ray_session):
    import ray.data as rd

    from kgray.sampling import hash_split

    ids = np.arange(20_000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(4)
    out = {}
    for b in hash_split(ds, "doc_id", val_permille=100, test_permille=50).iter_batches(
        batch_format="pyarrow", batch_size=1 << 16
    ):
        out.update(zip(b["doc_id"].to_pylist(), b["split"].to_pylist()))

    bucket = (ids * 2654435761) % (1 << 32) % 1000
    expect = np.where(bucket < 100, "val", np.where(bucket < 150, "test", "train"))
    assert all(out[i] == expect[i] for i in ids)
    n_val = sum(1 for v in out.values() if v == "val")
    n_test = sum(1 for v in out.values() if v == "test")
    # Bernoulli-by-hash: ~10% / ~5% within a loose band
    assert 0.08 < n_val / len(ids) < 0.12
    assert 0.035 < n_test / len(ids) < 0.065


def test_hash_split_rejects_bad_budget(ray_session):
    import pytest
    import ray.data as rd

    from kgray.sampling import hash_split

    ds = rd.from_arrow(pa.table({"doc_id": [1]}))
    with pytest.raises(ValueError):
        hash_split(ds, "doc_id", val_permille=900, test_permille=200)


def test_cluster_coherent_split_no_near_dup_leak(ray_session):
    """Two near-identical docs whose DOC-ID buckets land in different
    splits must still share one split (the cluster id is the key)."""
    import ray.data as rd

    from kgray.sampling import KNUTH, MOD32, cluster_coherent_split

    def bucket(i):
        return (i * KNUTH) % MOD32 % 1000

    # find a ('val', 'train') id pair under the 100/50 permille budget
    val_id = next(i for i in range(1, 500) if bucket(i) < 100)
    train_id = next(i for i in range(1, 500) if bucket(i) >= 150)
    dup = "the exact same sentence repeated for the near dup pair"
    rows = [
        {"doc_id": val_id, "text": dup},
        {"doc_id": train_id, "text": dup + " tail"},
        {"doc_id": 400, "text": "completely different singleton content here"},
    ]
    docs = rd.from_items(rows, override_num_blocks=2)
    from kgray import dedup

    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, k=2)
    out = {r["doc_id"]: r for r in cluster_coherent_split(
        docs, pairs, val_permille=100, test_permille=50
    ).take_all()}

    a, b = out[val_id], out[train_id]
    assert a["cluster_id"] == b["cluster_id"] == min(val_id, train_id)
    assert a["split"] == b["split"]  # no straddle, by construction
    # plain doc-id split WOULD have separated them
    from kgray.sampling import hash_split

    plain = {r["doc_id"]: r["split"] for r in hash_split(
        docs.select_columns(["doc_id"]), "doc_id",
        val_permille=100, test_permille=50,
    ).take_all()}
    assert plain[val_id] != plain[train_id]
    # survivor flag: exactly one canonical per cluster
    assert a["is_canonical"] + b["is_canonical"] == 1


def test_doc_rarity_exact(ray_session):
    """Hand-computed integer-idf rarity: df(a)=2, df(b)=1, df(c)=2 over
    3 docs -> idf ppm 1.5M / 3M / 1.5M."""
    import ray.data as rd

    from kgray.textops import doc_rarity

    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["a b a", "a c", "c c c"]})
    ).repartition(2)
    out = {r["doc_id"]: r for r in doc_rarity(ds).take_all()}
    assert out[1]["n_tokens"] == 3 and out[1]["rarity_sum"] == 6_000_000
    assert out[1]["rarity_avg"] == 2_000_000
    assert out[2]["n_tokens"] == 2 and out[2]["rarity_sum"] == 3_000_000
    assert out[3]["n_tokens"] == 3 and out[3]["rarity_sum"] == 4_500_000
    assert out[3]["rarity_avg"] == 1_500_000


def test_hashed_normal_equations_match_dense_reference(ray_session):
    """X^T X / X^T y sums equal the dense numpy computation on the same
    hashed design matrix, and the driver-side solve reconstructs y for a
    solvable toy system."""
    import ray.data as rd

    from kgray.textops import hashed_normal_equations, rolling_hash64

    texts = ["alpha beta", "alpha alpha gamma", "beta", "delta epsilon zeta"]
    k = 8
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": texts})).repartition(2)
    got = {(r["i"], r["j"]): r["s"]
           for r in hashed_normal_equations(ds, k=k).take_all()}

    # dense reference
    X = np.zeros((4, k + 1), dtype=np.int64)
    X[:, 0] = 1
    y = np.zeros(4, dtype=np.int64)
    for d, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        y[d] = len(toks)
        fp = rolling_hash64(pa.array(toks))
        for f in fp:
            idx = int(f % np.uint64(k)) + 1
            sign = 1 if int((f // np.uint64(k)) % np.uint64(2)) == 0 else -1
            X[d, idx] += sign
    xtx = X.T @ X
    xty = X.T @ y
    for (i, j), s in got.items():
        if j == -1:
            assert s == xty[i]
        else:
            assert s == xtx[i, j]
    # completeness: every nonzero reference entry is present
    for i in range(k + 1):
        for j in range(i, k + 1):
            if xtx[i, j] != 0:
                assert got[(i, j)] == xtx[i, j]

    # the solve (driver no-op) reproduces y on this full-rank toy system
    A = xtx.astype(np.float64)
    w = np.linalg.lstsq(A, xty.astype(np.float64), rcond=None)[0]
    assert np.allclose(X @ w, y, atol=1e-6)
