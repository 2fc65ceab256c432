"""Session-4 operators: N-Triples source/sink round-trip, the
event-time watermark late-data audit (property-tested vs a scalar
replay), and query->doc BM25 retrieval (vs a scalar reference using the
same exact-integer kernel)."""

import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from kgray.graph_io import read_ntriples, write_ntriples
from kgray.streaming import watermark_late_events
from kgray.textops import bm25_retrieval


# ---------------------------------------------------------------------------
# N-Triples round trip
# ---------------------------------------------------------------------------

def test_ntriples_round_trip(ray_session, tmp_path):
    triples = [
        ("GENE:1", "biolink:affects", "DISEASE:2"),
        ("a b", "has space", "x>y"),          # chars that must percent-encode
        ("ünï:code", "100%", "tab\there"),
        ("plain", "biolink:related_to", "plain2"),
    ]
    t = pa.table(
        {
            "subject": [s for s, _, _ in triples],
            "predicate": [p for _, p, _ in triples],
            "object": [o for _, _, o in triples],
        }
    )
    out = str(tmp_path / "nt")
    manifest = write_ntriples(rd.from_arrow(t).repartition(2), out).take_all()
    assert sum(m["rows"] for m in manifest) == len(triples)

    back = read_ntriples([m["path"] for m in manifest]).take_all()
    got = sorted((r["subject"], r["predicate"], r["object"]) for r in back)
    assert got == sorted(triples)


def test_ntriples_rejects_malformed(ray_session, tmp_path):
    bad = tmp_path / "bad.nt"
    bad.write_text("<urn:kg:a> <urn:rel:p> not-an-iri .\n")
    with pytest.raises(Exception, match="triples"):
        read_ntriples([str(bad)]).take_all()


# ---------------------------------------------------------------------------
# Watermark / late-event audit
# ---------------------------------------------------------------------------

def _ref_watermark(rows, delay):
    """Scalar replay in arrival (seq) order: late iff ts falls strictly
    below (max ts over earlier arrivals) - delay."""
    out = {}
    wm = None
    for seq, ts in sorted(rows):
        out[seq] = 1 if (wm is not None and ts < wm - delay) else 0
        wm = ts if wm is None else max(wm, ts)
    return out


arrivals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),   # seq (arrival order)
        st.integers(min_value=0, max_value=100),   # event time
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda e: e[0],
)


@settings(max_examples=12, deadline=None)
@given(arrivals_strategy, st.integers(min_value=0, max_value=10))
def test_watermark_matches_replay(ray_session, rows, delay):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts_s": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    out = watermark_late_events(
        rd.from_arrow(t).repartition(3), "event_id", "ts_s",
        delay=delay, num_ranges=7,
    ).take_all()
    assert len(out) == len(rows)
    got = {r["event_id"]: r["late"] for r in out}
    assert got == _ref_watermark(rows, delay)


def test_watermark_empty_input(ray_session):
    t = pa.table(
        {"event_id": pa.array([], pa.int64()), "ts_s": pa.array([], pa.int64())}
    )
    out = watermark_late_events(rd.from_arrow(t), "event_id", "ts_s")
    assert out.take_all() == []


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

def _ref_bm25(docs, query_terms, k):
    """Scalar reference with the same exact-integer kernel as
    textops.bm25_keywords (idf odds-ratio, k1=1.1, b=0.75 in tenths)."""
    toks = {d: [w for w in text.split(" ") if w] for d, text in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    vocab = {t for ts in query_terms.values() for t in ts}
    df = {t: sum(1 for v in toks.values() if t in v) for t in vocab}
    rows = []
    for q, terms in sorted(query_terms.items()):
        scored = []
        for d, v in toks.items():
            s, present = 0, False
            for t in set(terms):
                tf = v.count(t)
                if tf == 0:
                    continue
                present = True
                num = 1000 * (22 * tf * total) * (2 * n - 2 * df[t] + 1)
                den = ((10 * tf + 3) * total + 9 * len(v) * n) * (2 * df[t] + 1)
                s += num // den
            if present:
                scored.append((s, d))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(scored[:k], 1):
            rows.append((q, d, s, rank))
    return rows


def test_bm25_retrieval_matches_reference(ray_session):
    docs = [
        (0, "scan join scan window"),
        (1, "join join merge sort"),
        (2, "window window window scan"),
        (3, "sort merge query the a"),
        (4, "unrelated words only here"),
        (5, ""),
    ]
    qt = {0: ["scan", "join"], 1: ["window"], 2: ["merge", "sort", "query"]}
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": [x for _, x in docs],
        }
    )
    out = bm25_retrieval(rd.from_arrow(t).repartition(3), qt, k=3)
    got = list(out.itertuples(index=False, name=None))
    assert sorted(got) == sorted(_ref_bm25(docs, qt, 3))


def test_bm25_retrieval_no_hits(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["alpha beta"]})
    out = bm25_retrieval(rd.from_arrow(t), {0: ["zzz"]}, k=5)
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "doc_id", "score", "rank"]
