"""Dedup + similarity operators on corpora with planted duplicates."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kgray import dedup, multimodal, similarity


def _docs_with_dupes():
    """40 distinct docs + 5 planted near-duplicate pairs."""
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for j in range(5):
        base = texts[j].split()
        base[5] = "CHANGED"  # one-word edit -> high jaccard, not exact
        rows.append({"doc_id": 100 + j, "text": " ".join(base)})
    return rows


def _true_jaccard_pairs(rows, k, threshold):
    def grams(t):
        w = t.split()
        return set(" ".join(w[i : i + k]) for i in range(len(w) - k + 1))

    gs = {r["doc_id"]: grams(r["text"]) for r in rows}
    out = set()
    for a, b in itertools.combinations(sorted(gs), 2):
        inter = len(gs[a] & gs[b])
        u = len(gs[a]) + len(gs[b]) - inter
        if u and inter / u >= threshold:
            out.add((a, b))
    return out


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    rows = _docs_with_dupes()
    ds = ray.data.from_items(rows, override_num_blocks=8)
    got = dedup.ngram_jaccard_pairs(ds, threshold=0.5, k=2).take_all()
    got_pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert got_pairs == _true_jaccard_pairs(rows, 2, 0.5)
    assert len(got_pairs) >= 5  # the planted pairs are found
    for r in got:
        assert 500_000 <= r["jaccard_ppm"] <= 1_000_000


def test_minhash_lsh_finds_planted_dupes(ray_session):
    rows = _docs_with_dupes()
    ds = ray.data.from_items(rows, override_num_blocks=8)
    got = dedup.minhash_lsh_pairs(ds, threshold=0.7, shingle_k=2).take_all()
    found = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])) for r in got}
    for j in range(5):  # every planted pair must surface via some band
        assert (j, 100 + j) in found
    for r in got:  # verified exact jaccard, so no false positives
        assert r["jaccard"] >= 0.7


def test_simhash_finds_planted_dupes(ray_session):
    rows = _docs_with_dupes()
    ds = ray.data.from_items(rows, override_num_blocks=8)
    got = dedup.simhash_pairs(ds, max_hamming=10).take_all()
    found = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])) for r in got}
    assert sum((j, 100 + j) in found for j in range(5)) >= 4
    for r in got:
        assert r["hamming"] <= 10


def _embeddings_with_dupes(n=60, dim=16):
    rng = np.random.RandomState(5)
    mat = rng.standard_normal((n, dim))
    mat[50] = mat[0] + rng.standard_normal(dim) * 1e-4  # near-dup of 0
    mat[51] = mat[1] * 2.0  # exact direction dup of 1
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
        }
    ), mat


def test_cosine_pairs_exact(ray_session):
    tbl, mat = _embeddings_with_dupes()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    truth = {
        (i, j)
        for i in range(len(mat))
        for j in range(i + 1, len(mat))
        if sims[i, j] >= 0.8
    }
    ds = ray.data.from_arrow(tbl)
    got = similarity.cosine_pairs(ds, threshold=0.8).take_all()
    assert {(r["vec_a"], r["vec_b"]) for r in got} == truth
    assert (0, 50) in truth and (1, 51) in truth  # planted


def test_embedding_dedup_lsh_finds_planted(ray_session):
    tbl, _ = _embeddings_with_dupes()
    ds = ray.data.from_arrow(tbl)
    got = dedup.embedding_dedup_pairs(ds, threshold=0.95, dim=16).take_all()
    found = {(r["vec_a"], r["vec_b"]) for r in got}
    # sign-LSH: identical directions always share a bucket
    assert (1, 51) in found
    assert (0, 50) in found  # 1e-4 perturbation -> same signs (seeded corpus)


def test_knn_ivf_recall_vs_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    mat = rng.standard_normal((300, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    queries = mat[:3]
    exact = similarity.knn_bruteforce(ds, queries, k=5)
    approx = similarity.knn_ivf(ds, queries, k=5, n_clusters=8, nprobe=4)
    recalls = []
    for qid in range(3):
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 lists


def test_knn_ivf_sampled_path_deterministic(ray_session):
    """Force the LCG train-sample branch (train_sample << n) and check the
    result is bit-identical across block layouts — the engine's
    any-parallelism guarantee for the sampled coarse quantizer — and that
    the sample filter matches the documented LCG-top-30-bits predicate."""
    rng = np.random.RandomState(7)
    mat = rng.standard_normal((300, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
        }
    )
    queries = mat[:2]
    outs = []
    for blocks in (2, 8):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = similarity.knn_ivf(
            ds, queries, k=5, n_clusters=4, nprobe=2, train_sample=64
        )
        outs.append(list(zip(out["query_id"], out["vec_id"])))
    assert outs[0] == outs[1]
    # the sample predicate is the documented closed form
    ids = np.arange(300, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = ids * np.uint64(similarity._IVF_LCG_A) + np.uint64(
            similarity._IVF_LCG_C
        )
    thr = np.uint64(int(64 / 300 * (1 << 30)))
    n_sampled = int(((h >> np.uint64(34)) < thr).sum())
    assert 20 <= n_sampled <= 150  # ~64 expected, binomial spread


def test_multimodal_plumbing(ray_session):
    ds = ray.data.from_arrow(multimodal.synthetic_media_table(16))
    out = multimodal.extract_features(
        multimodal.decode_media(ds, fake=True), batch_size=4
    ).take_all()
    assert len(out) == 16
    for r in out:
        assert r["width"] >= 16 and r["height"] >= 16 and 1 <= r["n_frames"] <= 4
        assert len(r["features"]) == multimodal.FEATURE_DIM
    # deterministic across runs
    out2 = multimodal.extract_features(
        multimodal.decode_media(ray.data.from_arrow(multimodal.synthetic_media_table(16)), fake=True)
    ).take_all()
    key = lambda r: r["media_id"]
    assert sorted(out, key=key) == sorted(out2, key=key)


def test_decode_stub_raises_without_fake(ray_session):
    ds = ray.data.from_arrow(multimodal.synthetic_media_table(4))
    with pytest.raises(Exception):
        multimodal.decode_media(ds, fake=False).take_all()


def test_multimodal_resize_and_frame_sample(ray_session):
    ds = ray.data.from_arrow(multimodal.synthetic_media_table(12))
    out = (
        multimodal.decode_media(ds, fake=True)
        .map_batches(multimodal.ResizeStub(target=224), batch_format="pyarrow")
        .map_batches(multimodal.FrameSampleStub(n=3), batch_format="pyarrow")
        .take_all()
    )
    for r in out:
        assert max(r["resized_w"], r["resized_h"]) == 224  # aspect-fit
        if r["kind"] == "video":
            assert 1 <= len(r["sample_frames"]) <= 3
            assert all(0 <= f < r["n_frames"] for f in r["sample_frames"])
        else:
            assert r["sample_frames"] == []

# ---------------------------------------------------------------------------
# scale-path parity: the join-based verify paths (broadcast_limit=0) must
# produce the same results as the broadcast paths, with NO whole-corpus
# ray.put / driver dict anywhere (VERDICT r01 #1-2)
# ---------------------------------------------------------------------------


def _bigger_corpus(mult=10):
    """~10x the planted-dupe corpus: distinct doc ids per replica, shared
    vocab so cross-replica similarity stays below thresholds."""
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(80)]
    rows = []
    for rep in range(mult):
        for i in range(40):
            rows.append(
                {
                    "doc_id": rep * 1000 + i,
                    "text": " ".join(rng.choice(vocab, size=30)),
                }
            )
        # one planted near-dup per replica
        base = rows[-40]["text"].split()
        base[5] = "CHANGED"
        rows.append({"doc_id": rep * 1000 + 500, "text": " ".join(base)})
    return rows


def test_minhash_join_verify_matches_broadcast(ray_session):
    rows = _bigger_corpus()
    ds = ray.data.from_items(rows, override_num_blocks=8)
    kw = dict(threshold=0.7, shingle_k=2)
    bc = dedup.minhash_lsh_pairs(ds, broadcast_limit=1 << 30, **kw).take_all()
    jn = dedup.minhash_lsh_pairs(ds, broadcast_limit=0, num_partitions=4, **kw).take_all()
    key = lambda r: (r["doc_a"], r["doc_b"])
    assert sorted(bc, key=key) == sorted(jn, key=key)
    assert len(bc) >= 10  # one planted pair per replica


def test_ngram_join_counts_match_broadcast(ray_session):
    rows = _bigger_corpus()
    ds = ray.data.from_items(rows, override_num_blocks=8)
    stats = {}
    bc = dedup.ngram_jaccard_pairs(
        ds, threshold=0.5, k=2, broadcast_limit=1 << 30
    ).take_all()
    jn = dedup.ngram_jaccard_pairs(
        ds, threshold=0.5, k=2, broadcast_limit=0, num_partitions=4, stats=stats
    ).take_all()
    key = lambda r: (r["doc_a"], r["doc_b"])
    assert sorted(bc, key=key) == sorted(jn, key=key)
    assert len(bc) >= 10
    assert stats["dropped_grams"] == 0  # corpus far under max_df=1000


def test_ngram_max_df_cut_counts_drops(ray_session):
    """A degenerate shared gram above max_df leaves BOTH numerator and
    denominator, and the drop is counted (never silent)."""
    rows = [{"doc_id": i, "text": f"common gram plus unique{i} tail{i}"} for i in range(8)]
    ds = ray.data.from_items(rows, override_num_blocks=8)
    stats = {}
    got = dedup.ngram_jaccard_pairs(
        ds, threshold=0.1, k=2, max_df=4, stats=stats
    ).take_all()
    # 'common gram' / 'gram plus' appear in all 8 docs (> max_df=4) -> dropped;
    # remaining grams are unique per doc -> zero intersections -> no pairs
    assert got == []
    assert stats["dropped_grams"] >= 2


def test_cosine_pairs_tiled_matches_broadcast(ray_session):
    tbl, _ = _embeddings_with_dupes(n=120, dim=16)
    ds = ray.data.from_arrow(tbl)
    bc = similarity.cosine_pairs(ds, threshold=0.6).take_all()
    tiled = similarity.cosine_pairs(
        ds, threshold=0.6, broadcast_limit=0, tile_rows=16
    ).take_all()
    key = lambda r: (r["vec_a"], r["vec_b"])
    assert sorted(bc, key=key) == sorted(tiled, key=key)
    assert len(bc) > 0


def test_embedding_dedup_join_verify_matches_broadcast(ray_session):
    tbl, _ = _embeddings_with_dupes(n=100, dim=16)
    ds = ray.data.from_arrow(tbl)
    kw = dict(threshold=0.8, dim=16, n_bands=16, band_bits=4)
    bc = dedup.embedding_dedup_pairs(ds, broadcast_limit=1 << 30, **kw).take_all()
    jn = dedup.embedding_dedup_pairs(ds, broadcast_limit=0, num_partitions=4, **kw).take_all()
    key = lambda r: (r["vec_a"], r["vec_b"])
    assert sorted(bc, key=key) == sorted(jn, key=key)
    found = {(r["vec_a"], r["vec_b"]) for r in bc}
    assert (0, 50) in found and (1, 51) in found  # planted dupes recalled


def test_embedding_dedup_banded_recall_low_threshold(ray_session):
    """Short bands give usable recall at moderate thresholds — the regime
    the old single-table LSH structurally missed (VERDICT r01 #4)."""
    tbl, mat = _embeddings_with_dupes(n=80, dim=16)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    truth = {
        (i, j)
        for i in range(len(mat))
        for j in range(i + 1, len(mat))
        if sims[i, j] >= 0.8
    }
    ds = ray.data.from_arrow(tbl)
    got = dedup.embedding_dedup_pairs(
        ds, threshold=0.8, dim=16, n_bands=16, band_bits=4
    ).take_all()
    found = {(r["vec_a"], r["vec_b"]) for r in got}
    assert found <= truth  # exact verify -> no false positives
    assert len(found) / max(1, len(truth)) >= 0.8  # banded OR-amplified recall


def test_minhash_truncation_flagged_not_silent(ray_session):
    """A hot bucket past max_bucket caps pair generation but flags every
    emitted pair (the VERDICT r01 doc/code-mismatch fix)."""
    rows = [{"doc_id": i, "text": "same text for every doc here"} for i in range(12)]
    ds = ray.data.from_items(rows, override_num_blocks=8)
    got = dedup.minhash_lsh_pairs(ds, threshold=0.5, shingle_k=2, max_bucket=5).take_all()
    assert len(got) == 10  # C(5,2) from the capped bucket
    assert all(r["truncated"] for r in got)
    got_uncapped = dedup.minhash_lsh_pairs(ds, threshold=0.5, shingle_k=2).take_all()
    assert len(got_uncapped) == 66  # C(12,2)
    assert not any(r["truncated"] for r in got_uncapped)


def test_pair_jaccard_matches_scalar_reference():
    texts_a = ["a b c d", "", "one", "x y", "a b c d e f"]
    texts_b = ["a b c e", "", "one two", "x y", "a b c d e f"]
    got = dedup.pair_jaccard(pa.array(texts_a), pa.array(texts_b), 2)
    expected = [dedup._jaccard(a, b, 2) for a, b in zip(texts_a, texts_b)]
    assert np.allclose(got, expected)


def test_label_centroids_exact_sums(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgray.similarity import label_centroids

    rng = np.random.RandomState(11)
    n, d = 300, 8
    mat = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.randint(0, 3, n)
    tbl = pa.table(
        {
            "label": pa.array(labels, type=pa.int32()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    out = label_centroids(ds).to_pandas()

    q = np.round(mat.astype(np.float64) * 1_000_000).astype(np.int64)
    for lab in np.unique(labels):
        sel = q[labels == lab]
        sub = out[out["label"] == lab].sort_values("pos")
        assert (sub["sum_q"].to_numpy() == sel.sum(axis=0)).all()
        assert (sub["n"].to_numpy() == len(sel)).all()


def test_embedding_covariance_exact(ray_session):
    """Hand-computed 2-dim Gram/sum/count accumulators, exact in int64."""
    from kgray.similarity import embedding_covariance

    rows = [
        {"vec_id": 1, "embedding": [1.0, 2.0]},
        {"vec_id": 2, "embedding": [3.0, -1.0]},
        {"vec_id": 3, "embedding": [0.5, 0.25]},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    out = {
        (r["i"], r["j"]): r for r in embedding_covariance(ds).take_all()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 2)}
    assert out[(1, 1)]["sum_xy"] == 10_250_000_000_000
    assert out[(1, 2)]["sum_xy"] == -875_000_000_000
    assert out[(2, 2)]["sum_xy"] == 5_062_500_000_000
    for r in out.values():
        assert r["n"] == 3
        assert r["sum_xi"] == (4_500_000 if r["i"] == 1 else 1_250_000)
        assert r["sum_xj"] == (4_500_000 if r["j"] == 1 else 1_250_000)


def test_random_project_exact(ray_session):
    """d=2, out_dim=2: the hash-seeded JL matrix is [[-1,0],[0,1]], so a
    vector projects to (-q1, q2) exactly."""
    from kgray.similarity import _jl_matrix, random_project

    assert _jl_matrix(2, 2).tolist() == [[-1, 0], [0, 1]]
    ds = ray.data.from_items(
        [{"vec_id": 7, "embedding": [1.0, 2.0]}], override_num_blocks=1
    )
    out = {(r["vec_id"], r["k"]): r["comp"] for r in random_project(ds, out_dim=2).take_all()}
    assert out == {(7, 1): -1_000_000, (7, 2): 2_000_000}


def test_duplicate_spans_planted(ray_session):
    """Cross-doc shared phrase, within-doc repetition, sub-k doc."""
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog tonight"},
        {"doc_id": 2, "text": "prefix words here the quick brown fox jumps over something else"},
        {"doc_id": 3, "text": "completely unrelated content with zero common windows anywhere"},
        {"doc_id": 4, "text": "short doc"},
        {"doc_id": 5, "text": "rep rep rep rep rep rep rep rep"},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=4)
    got = sorted(
        (r["doc_id"], r["start_word"], r["end_word"], r["n_windows"])
        for r in dedup.duplicate_spans(ds, k=4).take_all()
    )
    # docs 1/2 share the 6-word phrase -> 3 windows each, merged into one
    # span per doc; doc 5's 8x repetition self-duplicates every window
    assert got == [(1, 1, 6, 3), (2, 4, 9, 3), (5, 1, 8, 5)]


def test_excise_spans_planted(ray_session):
    """detect -> excise round trip: spans removed, clean docs untouched,
    fully-duplicated doc collapses to ''."""
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog tonight"},
        {"doc_id": 2, "text": "prefix words here the quick brown fox jumps over something else"},
        {"doc_id": 3, "text": "completely unrelated content with zero common windows anywhere"},
        {"doc_id": 4, "text": "short doc"},
        {"doc_id": 5, "text": "rep rep rep rep rep rep rep rep"},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=4)
    spans = dedup.duplicate_spans(ds, k=4)
    out = {r["doc_id"]: r for r in dedup.excise_spans(ds, spans).take_all()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["clean_text"] == "the lazy dog tonight"
    assert out[1]["n_removed_words"] == 6
    assert out[2]["clean_text"] == "prefix words here something else"
    assert out[2]["n_removed_words"] == 6
    assert out[3]["clean_text"] == rows[2]["text"]
    assert out[4]["n_removed_words"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_removed_words"] == 8


def test_duplicate_spans_empty_and_clean(ray_session):
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "all words perfectly unique here"}],
        override_num_blocks=1,
    )
    assert dedup.duplicate_spans(ds, k=4).take_all() == []


def test_pca_project_known_line(ray_session):
    """Rank-1 data on the line y=2x: first component is (1,2)/sqrt(5)
    (sign: largest coefficient positive), second carries zero variance;
    output is identical at different parallelisms."""
    from kgray.similarity import pca_project

    rows = [
        {"vec_id": 0, "embedding": [1.0, 2.0]},
        {"vec_id": 1, "embedding": [2.0, 4.0]},
        {"vec_id": 2, "embedding": [-1.0, -2.0]},
        {"vec_id": 3, "embedding": [0.0, 0.0]},
    ]
    expect1 = {0: 1.118034, 1: 3.354102, 2: -3.354102, 3: -1.118034}
    for nblocks in (1, 3):
        ds = ray.data.from_items(rows, override_num_blocks=nblocks)
        out = {(r["vec_id"], r["k"]): r["comp"]
               for r in pca_project(ds, out_dim=2).take_all()}
        for vid, want in expect1.items():
            assert abs(out[(vid, 1)] - want) < 1e-5
            assert abs(out[(vid, 2)]) < 1e-5


def test_pca_invariants_certificate(ray_session):
    """The certificate row: trace_q2 equals the hand-computed exact
    integer trace of the quantized covariance, every ppb gauge is 0,
    and the row is identical at different parallelisms."""
    from kgray.similarity import pca_invariants

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 5)) * np.array([3.0, 1.0, 0.5, 0.2, 0.1])
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(40)]

    q = np.round(mat * 1_000_000)
    n = q.shape[0]
    want_trace = sum(
        (n * int((q[:, i] ** 2).sum()) - int(q[:, i].sum()) ** 2) // (n * n)
        for i in range(q.shape[1])
    )
    for nblocks in (1, 4):
        ds = ray.data.from_items(rows, override_num_blocks=nblocks)
        row = pca_invariants(ds).to_pylist()[0]
        assert row["n_rows"] == 40 and row["d"] == 5
        assert row["trace_q2"] == want_trace
        for g in ("eigsum_gap_ppb", "max_ortho_ppb",
                  "max_norm_gap_ppb", "proj_var_gap_ppb"):
            assert row[g] == 0, g


def test_wav_codec_roundtrip_and_chunk_walk():
    """encode/decode round-trips PCM16 exactly (mono and stereo), the
    chunk walker tolerates an extra LIST chunk before data, and non-WAV /
    non-PCM16 payloads raise."""
    import struct

    from kgray import multimodal

    mono = (np.arange(-500, 500, 7)).astype(np.int16)
    out, rate = multimodal.decode_wav(multimodal.encode_wav(mono, 16000))
    assert rate == 16000 and out.shape == (len(mono), 1)
    assert (out[:, 0] == mono).all()

    stereo = np.stack([mono, (mono // 3).astype(np.int16)], axis=1)
    out2, _ = multimodal.decode_wav(multimodal.encode_wav(stereo, 8000))
    assert (out2 == stereo).all()

    # splice a LIST chunk between fmt and data — still decodes
    p = multimodal.encode_wav(mono, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = p[:fmt_end] + extra + p[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out3, _ = multimodal.decode_wav(spliced)
    assert (out3[:, 0] == mono).all()

    with pytest.raises(ValueError):
        multimodal.decode_wav(b"not audio at all")
    bad = bytearray(p)
    bad[20] = 3  # fmt codec tag -> IEEE float
    with pytest.raises(ValueError):
        multimodal.decode_wav(bytes(bad))


def test_wav_audio_features_real_dsp(ray_session):
    """The DSP features recover the generating signal: dominant rFFT bin
    equals the synthetic tone's bin exactly, RMS is amp/sqrt(2) within
    rounding, zero crossings are 2 per cycle, stereo clips report 2
    channels."""
    from kgray import multimodal

    ds = ray.data.from_arrow(multimodal.synthetic_wav_media_table(12))
    rows = {r["media_id"]: r for r in multimodal.audio_features(ds).take_all()}
    for i in range(12):
        r = rows[f"a{i:04d}"]
        bin_i, amp = 20 + 3 * i, 8000 + 100 * i
        assert r["dom_bin"] == bin_i
        assert r["dom_freq_mhz"] == (bin_i * 8000 * 1000) // 2048
        assert r["sample_rate"] == 8000 and r["n_samples"] == 2048
        assert r["duration_ms"] == 256
        assert r["n_channels"] == (2 if i % 3 == 0 else 1)
        # stereo mix = 0.75 * tone; mono mix = tone
        mix_amp = amp * (0.75 if i % 3 == 0 else 1.0)
        want_rms = 1000 * mix_amp / np.sqrt(2)
        assert abs(r["rms_milli"] - want_rms) < 0.01 * want_rms
        assert abs(r["zero_crossings"] - 2 * bin_i) <= 1
        assert abs(r["peak"] - amp) <= 1


def test_raw_image_codec_roundtrip_and_kernels(ray_session):
    """KGRW encode/decode round-trips pixels exactly; resize and channel
    sums are real pixel math (pinned on a hand-built 2x4 image)."""
    from kgray.multimodal import (
        RawImagePipeline, decode_raw_image, encode_raw_image,
        raw_image_features, synthetic_raw_media_table,
    )

    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    assert (decode_raw_image(encode_raw_image(img)) == img).all()

    tbl = pa.table(
        {
            "media_id": ["x"],
            "payload": pa.array([encode_raw_image(img)], type=pa.binary()),
        }
    )
    out = RawImagePipeline(target=2)(tbl).to_pylist()[0]
    assert (out["width"], out["height"]) == (4, 2)
    assert (out["resized_w"], out["resized_h"]) == (2, 1)
    flat = img.reshape(-1, 3).sum(axis=0)
    assert (out["r_sum"], out["g_sum"], out["b_sum"]) == tuple(int(v) for v in flat)

    # actor-pool pipeline over the synthetic corpus, parallelism-invariant
    ds = ray.data.from_arrow(synthetic_raw_media_table(16)).repartition(4)
    rows = sorted(raw_image_features(ds).take_all(), key=lambda r: r["media_id"])
    assert len(rows) == 16
    ds1 = ray.data.from_arrow(synthetic_raw_media_table(16))
    rows1 = sorted(raw_image_features(ds1).take_all(), key=lambda r: r["media_id"])
    keys = ["width", "height", "resized_w", "resized_h", "r_sum", "g_sum", "b_sum"]
    assert [[r[k] for k in keys] for r in rows] == [[r[k] for k in keys] for r in rows1]


def test_knn_graph_exact_mips(ray_session):
    """Self never appears as a neighbor (the int64 sentinel negation bug),
    ranking follows exact integer dots, and ties break on smaller id."""
    from kgray.similarity import knn_graph

    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0]},
        {"vec_id": 1, "embedding": [2.0, 0.0]},   # strongest for 0
        {"vec_id": 2, "embedding": [1.0, 0.0]},   # ties vec 0's view of 3
        {"vec_id": 3, "embedding": [1.0, 0.0]},   # same dot as 2 -> id tiebreak
        {"vec_id": 4, "embedding": [0.0, 1.0]},   # orthogonal
    ]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    out = {}
    for r in knn_graph(ds, k=3).take_all():
        out.setdefault(r["src"], []).append((r["rank"], r["dst"], r["dot"]))
        assert r["dst"] != r["src"]
    got0 = sorted(out[0])
    # dots vs 0: id1=2e12, id2=1e12, id3=1e12, id4=0 -> top3 = 1, then 2
    # before 3 by the id tiebreak
    assert [d for _, d, _ in got0] == [1, 2, 3]
    assert got0[0][2] == 2_000_000_000_000
    assert got0[1][2] == got0[2][2] == 1_000_000_000_000


def test_knn_graph_tiled_matches_broadcast(ray_session):
    """The beyond-broadcast tiled sweep produces the identical edge set
    (dots, ranks, tiebreaks) as the broadcast path."""
    from kgray.similarity import knn_graph

    rng = np.random.RandomState(9)
    mat = rng.standard_normal((300, 8))
    mat[120] = mat[7]  # planted exact tie in every third vector's view
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    key = lambda r: (r["src"], r["rank"])
    base = sorted(knn_graph(ds, k=4).take_all(), key=key)
    tiled = sorted(
        knn_graph(ds, k=4, broadcast_limit=0, tile_rows=64).take_all(), key=key
    )
    assert base == tiled
    assert len(base) == 300 * 4


def test_topk_dot_id_overflow_fallback():
    """The packed composite key D*2L-idx overflows int64 when
    max|D| * 2L exceeds int64 range (advice r2); _topk_dot_id must route
    such matrices through the stable-argsort fallback and keep the exact
    dot-desc / smaller-index-tie order of the packed path."""
    from kgray.similarity import _I64_MAX, _topk_dot_id

    rng = np.random.RandomState(3)
    # small-dot matrix: both branches valid -> force fallback by scaling
    D_small = rng.randint(-(10**6), 10**6, size=(17, 41)).astype(np.int64)
    want = _topk_dot_id(D_small, 5)
    # scale so max|D|*2L no longer fits int64 but |D| itself still does
    L = D_small.shape[1]
    f = _I64_MAX // (int(np.abs(D_small).max()) * L)  # > threshold factor
    D_big = D_small * np.int64(f)
    assert int(np.abs(D_big).max()) > (_I64_MAX - L) // (2 * L)
    got = _topk_dot_id(D_big, 5)
    # scaling by a positive constant preserves order except where ties are
    # CREATED by rounding — f is exact here (int multiply), so no new ties
    assert np.array_equal(want, got)

    # exclude mask respected on both branches
    excl = np.zeros_like(D_small, dtype=bool)
    excl[:, 0] = True
    for D in (D_small, D_big):
        nbr = _topk_dot_id(D, 5, exclude=excl)
        assert not (nbr == 0).any()


def test_knn_graph_large_dot_magnitude(ray_session):
    """End-to-end knn_graph on vectors whose quantized dots are near the
    packed-key overflow regime: results must match a numpy brute-force
    reference instead of silently wrapping."""
    from kgray.similarity import knn_graph

    rng = np.random.RandomState(11)
    # components ~2.0 at dim 64: |dot| up to ~2.6e14; with n=40 the packed
    # key fits, so ALSO force the tiled path at a tile size where it fits —
    # the guard itself is exercised by the unit test above; here we pin
    # correctness of the guarded code path end-to-end
    mat = rng.uniform(-2.0, 2.0, size=(40, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    q = np.round(mat * 1_000_000).astype(np.int64)
    D = q @ q.T
    neg = -D
    np.fill_diagonal(neg, np.iinfo(np.int64).max)  # self ranks last
    got = {}
    for r in knn_graph(ds, k=3).take_all():
        got.setdefault(r["src"], []).append((r["rank"], r["dst"], r["dot"]))
    for src in range(40):
        order = np.lexsort((np.arange(40), neg[src]))[:3]
        want = [(i + 1, int(j), int(D[src, j])) for i, j in enumerate(order)]
        assert sorted(got[src]) == want


def test_png_codec_roundtrip_all_filters():
    """encode_png/decode_png roundtrip bit-exactly for every scanline
    filter type and every channel layout (grey/GA/RGB/RGBA)."""
    rng = np.random.RandomState(77)
    shapes = [(9, 13), (9, 13, 2), (9, 13, 3), (9, 13, 4)]
    for shape in shapes:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        for ft in range(5):
            payload = multimodal.encode_png(img, filter_type=ft)
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            back = multimodal.decode_png(payload)
            assert back.shape == img.shape and back.dtype == np.uint8
            assert np.array_equal(back, img), (shape, ft)


def test_png_decoder_rejects_unsupported():
    img16 = np.zeros((4, 4, 3), dtype=np.uint8)
    good = multimodal.encode_png(img16)
    # corrupt the IHDR bit depth to 16 -> NotImplementedError, not garbage
    import struct, zlib as _z

    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    bad = good[:8] + chunk + good[8 + 12 + 13:]
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(bad)
    with pytest.raises(ValueError):
        multimodal.decode_png(b"nonsense")


def test_png_media_pipeline_matches_raw(ray_session):
    """The REAL PNG decode path: identical gradient images encoded as
    PNG (cycling all filter types) and as KGRW must produce identical
    channel sums and dimensions through the same actor pipeline — and
    DecodeStub must report real dimensions for PNG without fake mode."""
    png = multimodal.synthetic_png_media_table(15)
    raw = multimodal.synthetic_raw_media_table(15)
    key = lambda r: r["media_id"][1:]  # strip the p/r prefix
    a = sorted(
        multimodal.raw_image_features(ray.data.from_arrow(png)).take_all(), key=key
    )
    b = sorted(
        multimodal.raw_image_features(ray.data.from_arrow(raw)).take_all(), key=key
    )
    for ra, rb in zip(a, b):
        for c in ("width", "height", "resized_w", "resized_h",
                  "r_sum", "g_sum", "b_sum"):
            assert ra[c] == rb[c], c

    decoded = multimodal.decode_media(
        ray.data.from_arrow(png), fake=False
    ).take_all()
    want = {f"p{i:04d}": (8 + (i * 7) % 64, 8 + (i * 13) % 64) for i in range(15)}
    for r in decoded:
        assert (r["width"], r["height"]) == want[r["media_id"]]
        assert r["n_frames"] == 1


def test_semdedup_oversized_cluster_degrades(ray_session):
    """A cluster over max_cluster no longer dies: sign-LSH sub-splitting
    bounds every leaf matmul; exact duplicates (which no hyperplane can
    separate) fall to overlapped id-chunks and still chain into ONE
    component with the min id canonical. The audit reports exactly what
    was oversized, on_oversize='raise' preserves the old contract, and
    the verdicts are parallelism-invariant."""
    import pytest

    rng = np.random.RandomState(11)
    base = rng.standard_normal(8)
    # 40 EXACT duplicates (one dense semantic cluster) + 24 scattered
    vecs = [base.copy() for _ in range(40)]
    vecs += [rng.standard_normal(8) * (3 + i) for i in range(24)]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float64())
            ),
        }
    )
    outs = []
    for blocks in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out, audit = dedup.semdedup(
            ds, threshold=0.95, n_clusters=4, max_cluster=8,
            return_audit=True,
        )
        rows = sorted(
            (r["vec_id"], r["cluster_id"], r["is_canonical"])
            for r in out.take_all()
        )
        outs.append(rows)
        assert audit["oversized_clusters"] >= 1
        assert audit["oversized_rows"] >= 40
        assert audit["largest_cluster"] >= 40
    assert outs[0] == outs[1]  # deterministic under any block layout
    verdict = {v: (c, k) for v, c, k in outs[0]}
    # all 40 exact duplicates: one component rooted at id 0
    assert all(verdict[i] == (0, 0) for i in range(1, 40))
    assert verdict[0] == (0, 1)
    # every row is present exactly once
    assert sorted(verdict) == list(range(len(vecs)))
    # the old loud contract is still available
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="max_cluster"):
        dedup.semdedup(
            ds, threshold=0.95, n_clusters=4, max_cluster=8,
            on_oversize="raise",
        ).take_all()


def test_gif_codec_roundtrip_and_frames(ray_session):
    """The pure-stdlib GIF/LZW codec: exact pixel roundtrip (random
    indices, 256-color table forcing code-width growth and mid-stream
    CLEARs, interlaced first frame), real multi-frame counts through
    DecodeStub, and the frame-sample pipeline matching a per-clip
    numpy recomputation."""
    pal8 = np.stack([
        np.arange(8) * 32 + 16, 255 - np.arange(8) * 32,
        (np.arange(8) * 64 + 96) % 256,
    ], axis=1).astype(np.uint8)
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 8, (3, 13, 21), dtype=np.uint8)
    for inter in (False, True):
        dec = multimodal.decode_gif(
            multimodal.encode_gif(frames, pal8, interlace_first=inter)
        )
        assert np.array_equal(dec, pal8[frames]), inter
    pal256 = np.stack([
        np.arange(256), 255 - np.arange(256), (np.arange(256) * 7) % 256,
    ], axis=1).astype(np.uint8)
    big = rng.randint(0, 256, (1, 80, 90), dtype=np.uint8)
    assert np.array_equal(
        multimodal.decode_gif(multimodal.encode_gif(big, pal256)),
        pal256[big],
    )
    # DecodeStub reports REAL frame counts for GIF without fake mode
    tbl = multimodal.synthetic_gif_media_table(8)
    stub = multimodal.DecodeStub(fake=False)
    out = stub(tbl)
    for i in range(8):
        assert out["n_frames"][i].as_py() == 2 + i % 5
        assert out["width"][i].as_py() == 8 + (i * 5) % 24
    # pipeline stats vs an independent numpy recomputation
    got = {
        r["media_id"]: (r["n_frames"], r["n_sampled"],
                        r["r_sum"], r["g_sum"], r["b_sum"])
        for r in multimodal.gif_frame_features(
            ray.data.from_arrow(tbl)
        ).take_all()
    }
    for i in range(8):
        w, h, nf = 8 + (i * 5) % 24, 8 + (i * 7) % 24, 2 + i % 5
        k = min(4, nf)
        cs = [(i + 3 * (s * nf // k)) % 8 for s in range(k)]
        want = (
            nf, k,
            sum(w * h * (32 * c + 16) for c in cs),
            sum(w * h * (255 - 32 * c) for c in cs),
            sum(w * h * ((64 * c + 96) % 256) for c in cs),
        )
        assert got[f"g{i:04d}"] == want, i
    # contract errors stay loud
    import pytest

    with pytest.raises(ValueError, match="not a GIF"):
        multimodal.decode_gif(b"JUNK00")


def test_jpeg_closed_form_margins():
    """The jpeg_media_features oracle rests on two measured claims:
    (1) block-constant inputs decode to clamp(3*round((v-128)/3)+128)
    at quality 34, pixel-exact through the real codec; (2) both float
    rounding steps sit far from .5 ties (so numpy's DCT float error of
    ~1e-13 can never flip a round), making DuckDB round_even a faithful
    mirror."""
    q00 = int(multimodal.jpeg_quant_table(multimodal._JPEG_Q_LUM, 34)[0])
    assert q00 == 24  # the 3-per-step closed form depends on this
    # margin of (v-128)/3 to the nearest .5 boundary over all v
    v = np.arange(256, dtype=np.float64)
    frac = np.abs(((v - 128) / 3.0) % 1.0 - 0.5)
    assert frac.min() > 0.16  # 1/6 ~ 0.1667, >> 1e-13 DCT error
    # reconstruction 3k+128 is integral -> second round margin is 0.5
    for i in (0, 1, 2, 3, 7):  # spot-check full codec vs closed form
        w, h = 8 * (2 + (i * 3) % 6), 8 * (2 + (i * 5) % 6)
        by, bx = np.mgrid[0: h // 8, 0: w // 8]
        vv = (37 * i + 17 * bx + 29 * by) % 256
        img = np.kron(vv, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        dec = multimodal.decode_jpeg(
            multimodal.encode_jpeg(img, quality=34,
                                   restart_interval=2 if i % 3 == 0 else 0)
        )
        exp = np.clip(
            3 * np.round((vv - 128) / 3.0).astype(np.int64) + 128, 0, 255
        )
        assert np.array_equal(
            dec.astype(np.int64), np.kron(exp, np.ones((8, 8), np.int64))
        ), i


def test_jpeg_ac_coefficient_roundtrip():
    """The AC entropy path (run-lengths, ZRL for 16+ zero runs, EOB,
    negative coefficients across size categories) decodes exactly: the
    image is synthesized FROM known quantized coefficients, the test
    verifies the forward DCT re-quantizes to those coefficients with
    safe margins, so the decoder must recover the synthesized pixels
    bit-for-bit."""
    qt = multimodal.jpeg_quant_table(multimodal._JPEG_Q_LUM, 90).astype(
        np.float64
    ).reshape(8, 8)
    C = multimodal._JPEG_C
    coeffs = np.zeros((8, 8), np.float64)
    coeffs[0, 0] = 11
    coeffs[0, 1] = -7          # size-3 negative, run 0
    coeffs[1, 0] = 5
    coeffs[3, 2] = -2          # mid-zigzag after a zero run
    coeffs[7, 6] = 1           # forces a >16 zero run -> ZRL symbol
    px = C.T @ (coeffs * qt) @ C + 128.0
    img = np.clip(np.round(px), 0, 255).astype(np.uint8)
    # precondition: the rounded pixels re-quantize to exactly `coeffs`
    f = C @ (img.astype(np.float64) - 128.0) @ C.T
    q = f / qt
    assert np.array_equal(np.round(q), coeffs)
    margins = np.abs((q % 1.0) - 0.5)
    assert margins.min() > 0.05  # no tie ambiguity in requantization
    dec = multimodal.decode_jpeg(multimodal.encode_jpeg(img, quality=90))
    # decode = round(idct(coeffs*qt))+128 clamped == img by construction
    assert np.array_equal(dec, img)


def test_jpeg_color_subsampling_closed_form():
    """Color JPEG: one constant color per 16x16 MCU makes 4:4:4 and
    4:2:0 identical and closed-form (YCbCr round -> per-channel DC
    round-trip with the luma/chroma tables -> RGB round/clamp); the
    codec must match the independently-computed expectation for both
    subsampling modes."""
    q = 34
    qlum = float(multimodal.jpeg_quant_table(multimodal._JPEG_Q_LUM, q)[0])
    qchr = float(multimodal.jpeg_quant_table(multimodal._JPEG_Q_CHR, q)[0])

    def dc_rt(v, q00):
        k = np.round(8.0 * (v - 128.0) / q00)
        return np.clip(np.round(k * q00 / 8.0) + 128.0, 0, 255)

    colors = np.array(
        [[[10, 200, 60], [255, 0, 128]], [[90, 90, 90], [30, 140, 250]]],
        dtype=np.float64,
    )
    rgb = np.kron(colors, np.ones((16, 16, 1))).astype(np.uint8)
    r, g, b = colors[..., 0], colors[..., 1], colors[..., 2]
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
    cr = np.clip(np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
    ry, rcb, rcr = dc_rt(y, qlum), dc_rt(cb, qchr), dc_rt(cr, qchr)
    exp = np.kron(
        np.stack(
            [
                np.clip(np.round(ry + 1.402 * (rcr - 128)), 0, 255),
                np.clip(np.round(ry - 0.344136 * (rcb - 128)
                                 - 0.714136 * (rcr - 128)), 0, 255),
                np.clip(np.round(ry + 1.772 * (rcb - 128)), 0, 255),
            ],
            axis=2,
        ),
        np.ones((16, 16, 1)),
    ).astype(np.uint8)
    for sub in ("444", "420"):
        dec = multimodal.decode_jpeg(
            multimodal.encode_jpeg(rgb, quality=q, subsample=sub)
        )
        assert np.array_equal(dec, exp), sub


def test_g711_expansion_tables_and_margins(ray_session):
    """G.711 expansion matches the canonical CCITT values (mu-law 0x80
    -> +32124, 0x00 -> -32124, 0xFF/0x7F -> 0; A-law 0xAA -> +32256,
    0x55 -> -8), full companding lattice is symmetric, the WAV codec-6/7
    path decodes end-to-end, and every corpus clip's 1000*rms sits far
    from a .5 rounding boundary (so the SQL mirror's exact-integer
    route and numpy's float route round identically)."""
    import pytest

    mu = multimodal.mulaw_expand(np.arange(256, dtype=np.uint8))
    al = multimodal.alaw_expand(np.arange(256, dtype=np.uint8))
    assert (int(mu[0x80]), int(mu[0x00])) == (32124, -32124)
    assert int(mu[0xFF]) == 0 and int(mu[0x7F]) == 0
    assert (int(al[0xAA]), int(al[0x55])) == (32256, -8)
    # sign symmetry: flipping the sign bit negates (mu: exact; A-law:
    # sign-bit-SET positive)
    assert np.array_equal(mu[: 128], -mu[128:])
    assert np.array_equal(al[np.arange(128)],
                          -al[np.arange(128) + 128])
    # end-to-end WAV decode + pipeline vs direct expansion
    tbl = multimodal.synthetic_g711_media_table(8)
    rows = {r["media_id"]: r for r in multimodal.audio_features(
        ray.data.from_arrow(tbl)).take_all()}
    t = np.arange(1024, dtype=np.int64)
    for i in range(8):
        law_mu = i % 2 == 0
        base = (7 * i + 13 * t) % 256 if law_mu else (11 * i + 17 * t) % 256
        expand = multimodal.mulaw_expand if law_mu else multimodal.alaw_expand
        chans = [expand(base.astype(np.uint8)).astype(np.int64)]
        if i % 4 == 0:
            chans.append(expand(((base + 1) % 256).astype(np.uint8))
                         .astype(np.int64))
        arr = np.stack(chans, axis=1)
        r = rows[f"t{i:04d}"]
        assert r["n_channels"] == len(chans) and r["sample_rate"] == 8000
        assert r["peak"] == int(np.abs(arr).max())
        mix = arr.mean(axis=1)
        rms1000 = 1000 * float(np.sqrt(np.mean(mix * mix)))
        assert r["rms_milli"] == int(round(rms1000))
        # rounding margin: distance to the nearest .5 boundary must
        # dwarf any float-summation ulp drift between engines
        assert abs((rms1000 % 1.0) - 0.5) > 1e-3, i
    # contract: unknown codecs raise naming the codec
    bad = bytearray(multimodal.encode_wav_g711(
        np.zeros(8, np.uint8), 8000, "mulaw"))
    fmt = bad.find(b"fmt ") + 8
    bad[fmt:fmt + 2] = (85).to_bytes(2, "little")  # MPEG Layer 3
    with pytest.raises(ValueError, match="codec=85"):
        multimodal.decode_wav(bytes(bad))


def test_ima_adpcm_state_machine(ray_session):
    """IMA ADPCM decode vs an INDEPENDENT re-implementation of the
    reference state machine (written here, not shared with the codec):
    every sample of every corpus clip matches; both clamps engage;
    rms rounding margins stay far from .5; bad step indices and
    foreign codecs refuse."""
    import pytest
    import struct as _s

    step_t = multimodal._IMA_STEP_TABLE
    idx_t = [-1, -1, -1, -1, 2, 4, 6, 8]

    def ref_decode(pred, idx, nibs):
        out = [pred]
        for nb in nibs:
            st = int(step_t[idx])
            d = st >> 3
            if nb & 4:
                d += st
            if nb & 2:
                d += st >> 1
            if nb & 1:
                d += st >> 2
            pred = pred - d if nb & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + idx_t[nb & 7]))
            out.append(pred)
        return out

    tbl = multimodal.synthetic_adpcm_media_table(6)
    clamped_lo = clamped_hi = False
    for i in range(6):
        arr, rate = multimodal.decode_wav(tbl["payload"][i].as_py())
        assert rate == 8000 and arr.shape == (258, 1)
        want = []
        for blk in range(2):
            pred = (997 * i + 313 * blk) % 60000 - 30000
            idx = (5 * i + 7 * blk) % 89
            nibs = [(3 * i + 5 * blk + 11 * t) % 16 for t in range(128)]
            want += ref_decode(pred, idx, nibs)
        assert arr[:, 0].tolist() == want, i
        clamped_lo |= min(want) == -32768
        clamped_hi |= max(want) == 32767
        # rms margin for the SQL mirror
        mix = arr[:, 0].astype(np.float64)
        rms1000 = 1000 * float(np.sqrt(np.mean(mix * mix)))
        assert abs((rms1000 % 1.0) - 0.5) > 1e-3, i
    assert clamped_lo and clamped_hi  # both clamps exercised
    # contract: out-of-range step index, foreign codec
    bad_blocks = [(0, 99, bytes(64))]
    with pytest.raises(ValueError, match="step index"):
        multimodal.decode_wav(
            multimodal.encode_wav_adpcm(bad_blocks, 8000, 68)
        )
    raw = bytearray(multimodal.encode_wav_adpcm([(0, 0, bytes(64))],
                                                8000, 68))
    fmt = raw.find(b"fmt ") + 8
    raw[fmt:fmt + 2] = _s.pack("<H", 2)  # MS ADPCM
    with pytest.raises(ValueError, match="codec=2"):
        multimodal.decode_wav(bytes(raw))


def test_avi_mjpeg_video_roundtrip(ray_session):
    """The AVI/MJPEG container: RIFF walk + per-frame JPEG decode must
    reproduce exactly what decode_jpeg gives on each frame payload
    (incl. PROGRESSIVE frames); DecodeStub reports real video
    dimensions and frame counts; the frame-sample pipeline matches an
    independent numpy recomputation; non-MJPEG streams refuse by
    fourcc."""
    import pytest

    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(3)]
    jps = [multimodal.encode_jpeg(f, quality=90) for f in frames]
    jps.append(multimodal.encode_jpeg_progressive(frames[0], quality=90))
    avi = multimodal.encode_avi_mjpeg(jps, 32, 24)
    dec = multimodal.decode_avi_mjpeg(avi)
    exp = np.stack([multimodal.decode_jpeg(j) for j in jps])
    assert np.array_equal(dec, exp) and dec.shape == (4, 24, 32, 3)
    # DecodeStub: real (w, h, n_frames) for AVI without fake mode
    tbl = multimodal.synthetic_avi_media_table(8)
    out = multimodal.DecodeStub(fake=False)(tbl)
    for i in range(8):
        assert out["n_frames"][i].as_py() == 2 + i % 4
        assert out["width"][i].as_py() == 8 * (2 + (i * 3) % 4)
    # pipeline stats vs independent numpy recomputation
    got = {
        r["media_id"]: (r["n_frames"], r["n_sampled"],
                        r["r_sum"], r["g_sum"], r["b_sum"])
        for r in multimodal.video_frame_features(
            ray.data.from_arrow(tbl)
        ).take_all()
    }
    for i in range(8):
        w, h, nf = 8 * (2 + (i * 3) % 4), 8 * (2 + (i * 5) % 4), 2 + i % 4
        k = min(4, nf)
        tot = 0
        for s in range(k):
            f = s * nf // k
            by, bx = np.mgrid[0: h // 8, 0: w // 8]
            v = (37 * i + 11 * f + 17 * bx + 29 * by) % 256
            rv = np.clip(
                3 * np.round((v - 128) / 3.0).astype(np.int64) + 128, 0, 255
            )
            tot += int(64 * rv.sum())
        assert got[f"v{i:04d}"] == (nf, k, tot, tot, tot), i
    # contract: a foreign video codec refuses by fourcc
    bad = bytearray(avi)
    idx = bad.find(b"vidsMJPG")
    bad[idx + 4: idx + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        multimodal.decode_avi_mjpeg(bytes(bad))
    with pytest.raises(ValueError, match="not an AVI"):
        multimodal.decode_avi_mjpeg(b"RIFFxxxxWAVE")


def test_jpeg_progressive_parity():
    """Progressive (SOF2) decode is bit-identical to baseline decode of
    the SAME quantized coefficients — the encoder emits the full
    successive-approximation scan chain (interleaved DC first/refine,
    per-component AC first with EOB runs, AC refinement with
    correction-bit windows), so parity across random images, odd
    sizes, 4:2:0, and every EOB-cap regime pins the whole T.81 G.1.2
    machine."""
    rng = np.random.RandomState(99)
    cases = [
        ((16, 16), "444", 34), ((33, 50, 3), "420", 75),
        ((19, 27, 3), "444", 90), ((41, 23), "444", 50),
        ((24, 56, 3), "420", 95),
    ]
    for shape, sub, q in cases:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        base = multimodal.decode_jpeg(
            multimodal.encode_jpeg(img, quality=q, subsample=sub)
        )
        for cap in (32767, 1, 4):
            prog = multimodal.decode_jpeg(
                multimodal.encode_jpeg_progressive(
                    img, quality=q, subsample=sub, eob_cap=cap
                )
            )
            assert np.array_equal(prog, base), (shape, sub, q, cap)
    # the hash-checked corpus mixes baseline and progressive payloads;
    # both must decode to the same closed form (spot-check a SOF2 one)
    tbl = multimodal.synthetic_jpeg_media_table(13)
    p = tbl["payload"][7].as_py()  # i=7: 7%5==2 -> progressive
    # byte stuffing guarantees 0xFFC2 can only be the SOF2 marker
    assert b"\xff\xc2" in p
    img7 = multimodal.decode_jpeg(p)
    by, bx = np.mgrid[0: img7.shape[0] // 8, 0: img7.shape[1] // 8]
    v = (37 * 7 + 17 * bx + 29 * by) % 256
    exp = np.clip(3 * np.round((v - 128) / 3.0).astype(np.int64) + 128,
                  0, 255)
    assert np.array_equal(
        img7.astype(np.int64), np.kron(exp, np.ones((8, 8), np.int64))
    )


def test_jpeg_contract_errors():
    """Arithmetic-coded JPEG raises the honest stub
    (NotImplementedError), garbage raises ValueError, and DecodeStub
    reports real dimensions for JPEG payloads without fake mode."""
    import pytest

    img = np.full((8, 8), 100, np.uint8)
    jpg = bytearray(multimodal.encode_jpeg(img, quality=75))
    sof = jpg.find(b"\xff\xc0")
    jpg[sof + 1] = 0xC9  # rebrand the frame as arithmetic-coded
    with pytest.raises(NotImplementedError, match="arithmetic"):
        multimodal.decode_jpeg(bytes(jpg))
    with pytest.raises(ValueError, match="not a JPEG"):
        multimodal.decode_jpeg(b"\x00\x01rubbish")
    stub = multimodal.DecodeStub(fake=False)
    out = stub(
        pa.table(
            {
                "media_id": ["x"],
                "kind": ["image"],
                "payload": pa.array(
                    [multimodal.encode_jpeg(
                        np.zeros((12, 20), np.uint8), quality=50
                    )],
                    pa.binary(),
                ),
                "mime": ["image/jpeg"],
                "n_bytes": pa.array([1], pa.int64()),
            }
        )
    )
    assert out["width"][0].as_py() == 20 and out["height"][0].as_py() == 12


def test_semdedup_planted_and_parallelism_invariant(ray_session):
    """SemDeDup: the same-magnitude planted near-dup (0, 50) must land in
    one component with the smaller id as survivor, and the full verdict
    table must be bit-identical across block layouts (int kmeans + exact
    cosine are both order-free)."""
    tbl, _ = _embeddings_with_dupes()
    outs = []
    for blocks in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = dedup.semdedup(ds, threshold=0.95, n_clusters=4).take_all()
        outs.append(sorted((r["vec_id"], r["cluster_id"], r["is_canonical"])
                           for r in out))
    assert outs[0] == outs[1]
    verdict = {v: (c, k) for v, c, k in outs[0]}
    assert verdict[50] == (0, 0)   # clustered under survivor 0, not canonical
    assert verdict[0] == (0, 1)    # the survivor
    # every row is present exactly once and singletons self-cluster
    assert len(verdict) == 60
    singles = [v for v, (c, k) in verdict.items() if c == v]
    assert all(verdict[v][1] == 1 for v in singles)


def _make_bmp(img: np.ndarray, bottom_up: bool = True) -> bytes:
    """Minimal uncompressed BITMAPINFOHEADER encoder for the test:
    uint8 (h, w) -> 8-bit (palette omitted from use, still emitted),
    (h, w, 3) RGB -> 24-bit BGR, (h, w, 4) RGBA -> 32-bit BGRA."""
    import struct as _st

    if img.ndim == 2:
        bpp, px = 8, img[:, :, None]
    elif img.shape[2] == 3:
        bpp, px = 24, img[:, :, ::-1]
    else:
        bpp, px = 32, img[:, :, [2, 1, 0, 3]]
    h, w = img.shape[:2]
    stride = (w * bpp // 8 + 3) & ~3
    palette = b"".join(
        _st.pack("<BBBB", i, i, i, 0) for i in range(256)
    ) if bpp == 8 else b""
    data_off = 14 + 40 + len(palette)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * bpp // 8] = px.reshape(h, -1)
    if bottom_up:
        rows = rows[::-1]
    raster = rows.tobytes()
    return (
        b"BM"
        + _st.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
        + _st.pack(
            "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, bpp, 0,
            len(raster), 2835, 2835, 256 if bpp == 8 else 0, 0,
        )
        + palette
        + raster
    )


def test_bmp_codec_all_layouts():
    rng = np.random.RandomState(41)
    for shape in ((7, 5), (7, 5, 3), (7, 5, 4)):
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        for bottom_up in (True, False):
            back = multimodal.decode_bmp(_make_bmp(img, bottom_up))
            assert np.array_equal(back, img), (shape, bottom_up)
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"nonsense")
    rle = bytearray(_make_bmp(np.zeros((4, 4), np.uint8)))
    rle[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError):
        multimodal.decode_bmp(bytes(rle))


def test_pnm_codec_p5_p6():
    rng = np.random.RandomState(42)
    grey = rng.randint(0, 256, size=(6, 9)).astype(np.uint8)
    rgb = rng.randint(0, 256, size=(6, 9, 3)).astype(np.uint8)
    p5 = b"P5\n# a comment\n9 6\n255\n" + grey.tobytes()
    p6 = b"P6 9\n# mid-header comment\n6 255\n" + rgb.tobytes()
    assert np.array_equal(multimodal.decode_pnm(p5), grey)
    assert np.array_equal(multimodal.decode_pnm(p6), rgb)
    with pytest.raises(ValueError):
        multimodal.decode_pnm(b"P4\n1 1\n\x00")  # bitmap PBM unsupported
    with pytest.raises(ValueError):
        multimodal.decode_pnm(b"P5\n2 2\n65535\n" + b"\x00" * 8)  # 16-bit


def test_decode_stub_handles_bmp_and_pnm(ray_session):
    """DecodeStub reports REAL dimensions for BMP and PNM payloads
    without fake mode, through the actor-pool stage."""
    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, size=(11, 17, 3)).astype(np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["image", "image"]),
            "payload": pa.array(
                [_make_bmp(img), b"P6\n17 11\n255\n" + img.tobytes()],
                pa.binary(),
            ),
        }
    )
    out = multimodal.decode_media(ray.data.from_arrow(t), fake=False).take_all()
    assert [(r["width"], r["height"], r["n_frames"]) for r in out] == [
        (17, 11, 1), (17, 11, 1)
    ]


def test_jpeg_noninterleaved_sequential_parity():
    """ADVICE r4: a SEQUENTIAL non-interleaved scan of a subsampled
    component must walk the component's OWN raster block grid (T.81
    A.2.2), not the MCU-padded grid — and a multi-scan sequential file
    must reconstruct only after ALL components are decoded. The
    one-scan-per-component encoder produces byte-identical quantized
    coefficients to the interleaved baseline, so decode parity is
    bit-for-bit; with 4:2:0 the padded-MCU walk would consume a
    different block count for luma (e.g. 16 vs 9 blocks at 24 x 24)
    and garble."""
    rng = np.random.RandomState(41)
    cases = [
        ((24, 24, 3), "420", 50), ((24, 24, 3), "444", 75),
        ((17, 23, 3), "420", 90), ((16, 16), "444", 34),
        ((40, 24, 3), "420", 75),
    ]
    for shape, sub, q in cases:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        base = multimodal.decode_jpeg(
            multimodal.encode_jpeg(img, quality=q, subsample=sub)
        )
        ni = multimodal.decode_jpeg(
            multimodal.encode_jpeg_noninterleaved(
                img, quality=q, subsample=sub
            )
        )
        assert np.array_equal(base, ni), (shape, sub, q)


def test_shard_media_features_resumable(ray_session, tmp_path):
    """Shard-level resume for the WDS media pipeline: outputs land one
    Parquet per input shard (atomic rename), finished shards are
    skipped by NAME before any byte is read, and a deleted output is
    the only thing a re-run recomputes — bit-identical to the
    first pass."""
    import os

    import pyarrow.parquet as pq

    import ray.data as rd

    from kgray.graph_io import write_tar_shards

    tbl = multimodal.synthetic_jpeg_media_table(48)
    wds = pa.table({"key": tbl["media_id"], "jpg": tbl["payload"]})
    shards_dir = str(tmp_path / "shards")
    out = str(tmp_path / "features")
    man = write_tar_shards(
        rd.from_arrow(wds).repartition(4), shards_dir, ["jpg"]
    ).take_all()
    paths = [m["path"] for m in man]

    r1 = multimodal.shard_media_features(paths, out)
    assert r1["processed"] == 4 and r1["skipped"] == 0 and r1["rows"] == 48

    def read_all():
        parts = []
        for d in sorted(os.listdir(out)):
            parts.append(pq.read_table(os.path.join(out, d, "features.parquet")))
        t = pa.concat_tables(parts)
        return sorted(
            zip(t["media_id"].to_pylist(), t["r_sum"].to_pylist(),
                t["width"].to_pylist())
        )

    first = read_all()
    assert len(first) == 48

    # all done -> nothing re-read
    r2 = multimodal.shard_media_features(paths, out)
    assert r2["processed"] == 0 and r2["skipped"] == 4

    # delete one shard's output -> exactly that shard recomputes, and
    # the union is bit-identical to the first pass
    victim = sorted(os.listdir(out))[0]
    os.remove(os.path.join(out, victim, "features.parquet"))
    r3 = multimodal.shard_media_features(paths, out)
    assert r3["processed"] == 1 and r3["skipped"] == 3
    assert read_all() == first
