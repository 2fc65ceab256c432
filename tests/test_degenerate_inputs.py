"""Empty-input behavior of the late-round operators: every op must return
an empty (or source-only) result, never raise, on zero-row datasets."""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgray.graphalgo import _pagerank_counts, bfs_distances
from kgray.relational import mode_per_group, quantile_disc_per_group
from kgray.sketch import histogram_quantiles
from kgray.streaming import ordered_transitions


def _empty(cols: dict) -> rd.Dataset:
    return rd.from_pandas(
        pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
    )


def test_empty_mode_and_quantile(ray_session):
    ds = _empty({"k": str, "v": "int64"})
    assert mode_per_group(ds, "k", "v").count() == 0
    assert quantile_disc_per_group(ds, "k", "v").count() == 0


def test_empty_transitions_and_histogram(ray_session):
    ds = _empty({"k": str, "i": "int64", "v": str})
    assert ordered_transitions(ds, "k", "i", "v").count() == 0
    g = _empty({"g": str, "value": "float64"})
    assert histogram_quantiles(g, "g", "value").count() == 0


def test_empty_graph_ops(ray_session):
    e = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
        )
    )
    # BFS always emits the source row (dist 0), matching the SQL mirror
    bfs = bfs_distances(e, source=0)
    assert bfs.num_rows == 1 and bfs["dist"].to_pylist() == [0]
    assert _pagerank_counts(e.materialize(), "src", "dst", 3, 10**12).num_rows == 0


def test_empty_session_r2_late_ops(ray_session):
    from kgray.relational import above_mean_per_group
    from kgray.similarity import embedding_norms, feature_scale
    from kgray.streaming import cohort_retention, gap_stats, rolling_sum
    from kgray.textops import postings_index

    ev = _empty({"k": "int64", "eid": "int64", "ts": "int64", "v": "int64"})
    assert gap_stats(ev, "k", ["ts", "eid"], "ts").count() == 0
    assert rolling_sum(ev, "k", ["ts", "eid"], "v", window=3).count() == 0
    assert cohort_retention(ev.select_columns(["k", "ts"]), "k", "ts").count() == 0
    assert above_mean_per_group(ev, "k", "v").num_rows == 0

    docs = _empty({"doc_id": "int64", "text": str})
    assert postings_index(docs).count() == 0

    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
            }
        )
    )
    assert embedding_norms(emb).count() == 0
    assert feature_scale(emb).count() == 0


def test_empty_session6_late_ops(ray_session):
    from kgray.dedup import fuzzy_name_pairs
    from kgray.relational import dq_profile, grouped_linfit, ntile_per_group
    from kgray.streaming import ohlc
    from kgray.textops import bm25_keywords, heavy_hitters
    from kgray.transcripts import context_pairs

    ev = _empty({"k": "int64", "win": "int64", "ts": "int64",
                 "eid": "int64", "v": "int64"})
    assert ohlc(ev, "k", "win", ["ts", "eid"], "v").count() == 0
    assert ntile_per_group(ev, "k", ["v", "eid"]).count() == 0
    assert grouped_linfit(ev, "k", "ts", "v").num_rows == 0
    prof = dq_profile(ev.select_columns(["k", "v"]), ["k", "v"]).take_all()
    assert {r["column"]: (r["n"], r["n_null"]) for r in prof} == {} or all(
        r["n"] == 0 for r in prof
    )

    docs = _empty({"doc_id": "int64", "text": str})
    assert bm25_keywords(docs).count() == 0
    assert heavy_hitters(docs).num_rows == 0
    assert fuzzy_name_pairs(docs.select_columns(["text"]), col="text").count() == 0

    tr = _empty({"conv_id": str, "turn_idx": "int64", "role": str, "text": str})
    assert context_pairs(tr).count() == 0


def test_empty_session7_ops(ray_session):
    """Session-7 operators on zero-row inputs: empty results, no raise."""
    from kgray.dedup import duplicate_spans, excise_spans
    from kgray.sampling import mixture_sample, weighted_sample
    from kgray.sketch import bloom_semi_join, cms_build, cms_estimate
    from kgray.textops import doc_rarity

    docs = _empty({"doc_id": "int64", "text": str})
    assert doc_rarity(docs).count() == 0
    assert excise_spans(
        docs, _empty({"doc_id": "int64", "start_word": "int64", "end_word": "int64"})
    ).count() == 0

    keyed = _empty({"k": "int64", "w": "int64"})
    assert weighted_sample(keyed, "k", "w", weight_cap=10).count() == 0
    mix = _empty({"doc_id": "int64", "source": str, "n_chars": "int64"})
    assert mixture_sample(mix, "source", "n_chars", budget=100).count() == 0

    # bloom: empty build side -> nothing passes; empty probe -> empty out
    probe = rd.from_arrow(pa.table({"k": pa.array([1, 2], type=pa.int64())}))
    empty_k = _empty({"k": "int64"})
    assert bloom_semi_join(probe, empty_k, "k", "k").count() == 0
    assert bloom_semi_join(empty_k, probe, "k", "k").count() == 0

    cms = cms_build(empty_k, "k")
    assert cms.sum() == 0
    assert cms_estimate(empty_k, cms, "k").count() == 0


def test_excise_spans_null_text(ray_session):
    """A null-text doc comes back as '' with zero removals, never crashes
    the doc/span discriminator."""
    from kgray.dedup import duplicate_spans, excise_spans

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["a b c d a b c d", None], type=pa.string()),
            }
        )
    )
    spans = duplicate_spans(docs, k=4)
    out = {r["doc_id"]: r for r in excise_spans(docs, spans).take_all()}
    assert out[2]["clean_text"] == "" and out[2]["n_removed_words"] == 0


def test_empty_round3_ops(ray_session):
    from kgray.graphalgo import k_core
    from kgray.sampling import balanced_resample, epoch_shuffle_order
    from kgray.transcripts import (
        mention_density, preference_pairs, speaker_token_share,
    )

    tr = _empty({"conv_id": str, "turn_idx": "int64", "role": str,
                 "text": str, "conv_key": "int64"})
    assert speaker_token_share(tr).count() == 0
    assert mention_density(tr).count() == 0
    assert preference_pairs(tr).count() == 0

    ids = _empty({"doc_id": "int64"})
    assert epoch_shuffle_order(ids, epochs=2).count() == 0

    lab = _empty({"vec_id": "int64", "label": "int64"})
    assert balanced_resample(lab).count() == 0

    e = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()),
             "dst": pa.array([], type=pa.int64())}
        )
    )
    assert k_core(e, k=3).count() == 0
    assert k_core(e, k=3, edge_broadcast_limit=0).count() == 0


def test_empty_sssp_and_funnel(ray_session):
    from kgray.graphalgo import sssp_khop
    from kgray.streaming import funnel_counts

    e = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
                "w": pa.array([], type=pa.int64()),
            }
        )
    )
    # SSSP always emits the source row (dist 0) on both paths
    for lim in (50_000_000, 0):
        out = sssp_khop(e, source=5, max_hops=3, frontier_limit=lim)
        assert out.num_rows == 1 and out["dist"].to_pylist() == [0]

    # funnel over a stream with NO events of the funnel types: every
    # step counts zero users (prune emits schema-less empty blocks —
    # the bucketed groupby + partial fold must survive them)
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2], type=pa.int64()),
                "event_type": pa.array(["view", "view"]),
                "ts_us": pa.array([10, 20], type=pa.int64()),
            }
        )
    )
    out = funnel_counts(ev, steps=["signup", "purchase"])
    assert out["n_users"].to_pylist() == [0, 0]
