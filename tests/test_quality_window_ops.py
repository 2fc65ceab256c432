"""Unit tests for the round-2 additions: repetition quality stats,
ordered transition counts, and histogram-sketch quantiles — each checked
against a straightforward scalar reference on small in-memory data."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kgray.sketch import histogram_quantiles
from kgray.streaming import ordered_transitions
from kgray.textops import repetition_stats_batch


def _ref_repetition(text: str) -> tuple[int, int, int]:
    words = text.split(" ")
    n = len(words)
    dup_ppm = ((n - len(set(words))) * 1_000_000) // max(n, 1)
    if n < 2:
        top_ppm = 0
    else:
        grams = collections.Counter(zip(words, words[1:]))
        top_ppm = (max(grams.values()) * 1_000_000) // (n - 1)
    return n, dup_ppm, top_ppm


@pytest.mark.parametrize(
    "text",
    [
        "a b a b a",
        "x",
        "same same same same",
        "one two three four five six",
        "",  # split(' ') of '' -> [''] (one word), matches SQL string_split
        "repeat pair repeat pair repeat pair tail",
    ],
)
def test_repetition_stats_matches_reference(text):
    t = pa.table({"doc_id": [7], "text": [text]})
    out = repetition_stats_batch(t).to_pylist()[0]
    n, dup_ppm, top_ppm = _ref_repetition(text)
    assert out["n_words"] == n
    assert out["dup_word_ppm"] == dup_ppm
    assert out["top_bigram_ppm"] == top_ppm
    assert out["keep"] == int(dup_ppm < 900_000 and top_ppm < 200_000)


def test_repetition_stats_batched_multi_doc():
    texts = ["a a a a", "b c d e", "z", "m n m n m n"]
    t = pa.table({"doc_id": list(range(4)), "text": texts})
    out = repetition_stats_batch(t).to_pandas().sort_values("doc_id")
    for row, text in zip(out.itertuples(), texts):
        n, dup_ppm, top_ppm = _ref_repetition(text)
        assert (row.n_words, row.dup_word_ppm, row.top_bigram_ppm) == (
            n, dup_ppm, top_ppm,
        )


def test_ordered_transitions_counts(ray_session):
    # two keys with interleaved arrival order; transitions follow order_col
    rows = [
        {"k": "a", "i": 2, "v": "y"},
        {"k": "a", "i": 0, "v": "x"},
        {"k": "b", "i": 1, "v": "x"},
        {"k": "a", "i": 1, "v": "x"},
        {"k": "b", "i": 0, "v": "x"},
        {"k": "c", "i": 0, "v": "z"},  # single-turn key: no transition
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (
        ordered_transitions(ds, "k", "i", "v", num_buckets=4)
        .to_pandas()
        .sort_values(["from_v", "to_v"])
        .reset_index(drop=True)
    )
    # a: x->x->y ; b: x->x ; c: none
    expected = {("x", "x"): 2, ("x", "y"): 1}
    got = {(r.from_v, r.to_v): r.n for r in out.itertuples()}
    assert got == expected


def test_histogram_quantiles_matches_scalar_cdf(ray_session):
    rng = np.random.RandomState(7)
    vals = np.round(rng.exponential(50.0, size=2000), 2)
    grp = np.where(np.arange(2000) % 2 == 0, "even", "odd")
    ds = rd.from_pandas(pd.DataFrame({"g": grp, "value": vals}))
    out = histogram_quantiles(ds, "g", "value", qs=(50, 90, 99)).to_pandas()
    out = out.set_index("g").sort_index()

    for g in ("even", "odd"):
        bins = np.floor(vals[grp == g] * 100).astype(np.int64)
        bins.sort()
        n = len(bins)
        for q in (50, 90, 99):
            # smallest bin whose cumulative count reaches ceil(q% * n)
            k = -(-q * n // 100)  # ceil
            assert out.loc[g, f"p{q}_c"] == bins[k - 1]


def test_bloom_semi_join_no_false_negatives(ray_session):
    """Every true match passes (bloom negatives are exact); with a roomy
    bitmap the tiny key set passes exactly, and the pass set is always a
    superset of the true semi-join."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray.sketch import bloom_build, bloom_semi_join, _bloom_positions

    build = rd.from_arrow(pa.table({"k": [10, 20, 30]})).repartition(2)
    probe = rd.from_arrow(
        pa.table({"k": list(range(100)), "v": list(range(100))})
    ).repartition(3)
    got = {r["k"] for r in bloom_semi_join(probe, build, "k", "k").take_all()}
    assert {10, 20, 30} <= got
    # exact-membership check against the bitmap the engine built
    bm = bloom_build(build, "k", n_bits=1 << 20)
    pos = _bloom_positions(np.arange(100), 1 << 20)
    expect = {
        int(k)
        for k, row in zip(np.arange(100), pos)
        if all((int(bm[int(p) // 64]) >> (int(p) % 64)) & 1 for p in row)
    }
    assert got == expect


def test_cms_never_undercounts(ray_session):
    """est >= exact always; with few keys vs width the estimates are exact."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from kgray.sketch import cms_build, cms_estimate

    keys = [1] * 50 + [2] * 7 + [3] * 1 + [99] * 20
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(3)
    cms = cms_build(ds, "k", width=1 << 16)
    uniq = rd.from_arrow(pa.table({"k": sorted(set(keys))}))
    got = {r["k"]: r["est"] for r in cms_estimate(uniq, cms, "k").take_all()}
    exact = collections.Counter(keys)
    assert all(got[k] >= exact[k] for k in exact)
    assert got == dict(exact)  # roomy width: no collisions among 4 keys


def test_dsir_select_prefers_target_domain(ray_session):
    """DSIR importance selection: raw docs sharing the target corpus's
    vocabulary must outrank off-domain docs; blank docs are dropped; the
    result is bit-identical across block layouts (int64 fixed-point
    scores are order-free)."""
    from kgray.textops import dsir_select

    target_words = "alpha beta gamma delta"
    off_words = "zork quux blorp fnord"
    raw_rows = (
        [(i, f"{target_words} alpha beta") for i in range(10)]          # on-domain
        + [(i, f"{off_words} zork quux") for i in range(10, 30)]        # off-domain
        + [(30, ""), (31, "   ")]                                       # blank
    )
    raw = pa.table(
        {
            "doc_id": pa.array([r[0] for r in raw_rows], type=pa.int64()),
            "text": pa.array([r[1] for r in raw_rows]),
        }
    )
    tgt = pa.table(
        {
            "doc_id": pa.array([100, 101], type=pa.int64()),
            "text": pa.array([target_words, "alpha beta gamma"]),
        }
    )
    outs = []
    for blocks in (1, 4):
        out = dsir_select(
            rd.from_arrow(raw).repartition(blocks),
            rd.from_arrow(tgt),
            n_select=10,
        )
        outs.append(list(zip(out["doc_id"].to_pylist(),
                             out["dsir_score"].to_pylist())))
    assert outs[0] == outs[1]
    picked = {d for d, _ in outs[0]}
    assert picked == set(range(10))          # exactly the on-domain docs
    assert 30 not in picked and 31 not in picked


def test_gopher_gate_rules_each_bite():
    """Each Gopher rule fails exactly the doc planted to violate it."""
    from kgray.textops import gopher_gate_batch

    rows = {
        0: "the cat and dog of the house went to the market today ok",  # clean
        1: "too short",                                                 # wordcount
        2: "the a of to and " + " ".join(["supercalifragilistic"] * 10),  # meanlen
        3: "the a of " + " ".join(["123", "456", "789"] * 5),           # alpha
        4: "the a of and to " + " ".join(["x#y"] * 12),                 # symbol
        5: " ".join(["alpha", "beta", "gamma"] * 5),                    # stopwords
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(rows), type=pa.int64()),
            "text": pa.array([rows[k] for k in sorted(rows)]),
        }
    )
    out = gopher_gate_batch(t).to_pydict()
    by = {d: i for i, d in enumerate(out["doc_id"])}
    assert out["keep"][by[0]] == 1
    assert out["wordcount_ok"][by[1]] == 0
    assert out["meanlen_ok"][by[2]] == 0
    assert out["alpha_ok"][by[3]] == 0
    assert out["symbol_ok"][by[4]] == 0
    assert out["stop_ok"][by[5]] == 0
    for d in (1, 2, 3, 4, 5):
        assert out["keep"][by[d]] == 0


class TestFunnelCounts:
    def test_strict_ordered_funnel(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from kgray import streaming

        # u1 completes all three; u2's purchase precedes its signup
        # (fails step 2); u3's purchase ties the signup ts (strict >
        # excludes it)
        rows = [
            (1, "signup", 10), (1, "purchase", 20), (1, "error", 30),
            (2, "purchase", 5), (2, "signup", 10),
            (3, "signup", 10), (3, "purchase", 10),
            (4, "error", 50),  # never signed up: counts nowhere
        ]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "ts_us": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        out = streaming.funnel_counts(
            rd.from_arrow(t).repartition(3),
            steps=["signup", "purchase", "error"],
        )
        assert out.to_pydict() == {
            "step_idx": [1, 2, 3],
            "step": ["signup", "purchase", "error"],
            "n_users": [3, 1, 1],
        }

    def test_repeated_step_funnel(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from kgray import streaming

        # repeat-purchase funnel: u1 purchases twice after signup (in
        # order); u2 purchases only once — fails the repeated 3rd step;
        # u3's second purchase ties the first (strict > excludes it)
        rows = [
            (1, "signup", 10), (1, "purchase", 20), (1, "purchase", 30),
            (2, "signup", 10), (2, "purchase", 20),
            (3, "signup", 10), (3, "purchase", 20), (3, "purchase", 20),
        ]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "ts_us": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        out = streaming.funnel_counts(
            rd.from_arrow(t).repartition(2),
            steps=["signup", "purchase", "purchase"],
        )
        assert out["n_users"].to_pylist() == [3, 3, 1]
