"""PII scrub, training-context chunking, and benchmark decontamination."""

import numpy as np
import pyarrow as pa

from kgray.textops import PII_PATTERNS, chunk_text_batch, scrub_text_batch


def test_scrub_redacts_planted_pii():
    t = pa.table(
        {
            "text": [
                "mail jane.doe+x@corp.example.org today",
                "call 555-123-4567 or +1 (212) 555-0100",
                "ssn 123-45-6789 on file",
                "see https://example.com/a?b=1 and http://x.io",
                "nothing sensitive here",
                "",
                None,
            ]
        }
    )
    out = scrub_text_batch(t)
    clean = out["clean_text"].to_pylist()
    n = out["n_redactions"].to_pylist()
    assert clean[0] == "mail [EMAIL] today" and n[0] == 1
    assert clean[1] == "call [PHONE] or [PHONE]" and n[1] == 2
    assert clean[2] == "ssn [SSN] on file" and n[2] == 1
    assert clean[3] == "see [URL] and [URL]" and n[3] == 2
    assert clean[4] == "nothing sensitive here" and n[4] == 0
    assert clean[5] == "" and n[5] == 0
    assert clean[6] is None and n[6] == 0


def test_scrub_counts_on_progressively_scrubbed_text():
    # the URL contains digits that look phone-ish AFTER the email pattern
    # runs; counting happens step-by-step so each char is redacted once
    t = pa.table({"text": ["a@b.co https://x.io/555-123-4567"]})
    out = scrub_text_batch(t)
    # email first; the phone INSIDE the URL matches the phone pattern
    # (which runs before the URL pattern); the URL remainder then matches
    # too — 3 counted steps, order is part of the contract
    assert out["n_redactions"][0].as_py() == 3
    assert out["clean_text"][0].as_py() == "[EMAIL] [URL]"


def test_scrub_custom_patterns():
    t = pa.table({"text": ["the key of the hash"]})
    out = scrub_text_batch(
        t, patterns=PII_PATTERNS + ((r"\b(key|hash)\b", "[MASK]"),)
    )
    assert out["clean_text"][0].as_py() == "the [MASK] of the [MASK]"
    assert out["n_redactions"][0].as_py() == 2


def test_chunk_window_math():
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["x" * 128, "short", "", "a" * 48, "b" * 49],
        }
    )
    out = chunk_text_batch(t, size=48, overlap=8).to_pandas()
    by_doc = {d: g.sort_values("chunk_id") for d, g in out.groupby("doc_id")}
    # 128 chars, stride 40: windows [0,48) [40,88) [80,128) -> 3 chunks
    assert list(by_doc[1]["chunk_id"]) == [0, 1, 2]
    assert all(len(c) == 48 for c in by_doc[1]["chunk"])
    assert by_doc[1]["n_chunks"].iloc[0] == 3
    # short + empty texts emit exactly one chunk: themselves
    assert list(by_doc[2]["chunk"]) == ["short"]
    assert list(by_doc[3]["chunk"]) == [""]
    # exact window size -> one chunk; one char over -> clipped second chunk
    assert list(by_doc[4]["chunk"]) == ["a" * 48]
    assert list(by_doc[5]["chunk"]) == ["b" * 48, "b" * 9]


def test_chunk_overlap_reconstructs_text():
    text = "".join(chr(ord("a") + i % 26) for i in range(130))
    out = chunk_text_batch(
        pa.table({"doc_id": [7], "text": [text]}), size=32, overlap=4
    ).to_pandas().sort_values("chunk_id")
    stride = 32 - 4
    # invariant: chunk j starts at j*stride and matches the source
    for _, r in out.iterrows():
        j = r["chunk_id"]
        assert r["chunk"] == text[j * stride : j * stride + 32]


def test_chunk_empty_batch():
    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = chunk_text_batch(t)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "chunk_id", "chunk", "n_chunks"]


def test_decontaminate_drops_planted_overlap(ray_session):
    import ray.data as rd

    from kgray.dedup import decontaminate

    words = lambda seed, n: " ".join(
        f"w{x}" for x in np.random.RandomState(seed).randint(0, 50, n)
    )
    texts = [words(i, 20) for i in range(40)]
    bench_texts = [texts[0], words(999, 30)]
    # doc 7 lifts a 10-word run from benchmark doc 0; doc 9 is an exact
    # copy of benchmark doc 1; doc 11 shares only a 7-word run (< k=8)
    texts[7] = "zz aa " + " ".join(texts[0].split()[3:13]) + " qq"
    texts[9] = words(999, 30)
    texts[11] = "uu " + " ".join(texts[0].split()[0:7]) + " vv"
    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(40)), "text": texts})
    ).repartition(3)
    bench = rd.from_arrow(pa.table({"text": bench_texts}))

    survivors = sorted(r["doc_id"] for r in decontaminate(docs, bench, k=8).take_all())
    dropped = sorted(set(range(40)) - set(survivors))
    assert dropped == [0, 7, 9]  # 11's 7-gram is below the shingle width


def test_decontaminate_empty_benchmark_keeps_everything(ray_session):
    import ray.data as rd

    from kgray.dedup import decontaminate

    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["a b c d e f g h"] * 3})
    )
    bench = rd.from_arrow(pa.table({"text": pa.array([], type=pa.string())}))
    out = decontaminate(docs, bench, k=8)
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 2, 3]


def test_decontaminate_forced_bloom_join_path(ray_session):
    import ray.data as rd

    from kgray.dedup import decontaminate

    texts = [f"alpha beta g{i} d{i} e{i} f{i} h{i} k{i} m{i} n{i}" for i in range(60)]
    texts[5] = texts[50]  # doc 5 duplicates doc 50 (a benchmark doc below)
    docs = rd.from_arrow(pa.table({"doc_id": list(range(50)), "text": texts[:50]}))
    bench = rd.from_arrow(pa.table({"text": texts[50:]}))

    # broadcast_limit=0 forces the bloom-prefiltered hash-join path on
    # both the gram semi join and the id anti join
    survivors = sorted(
        r["doc_id"]
        for r in decontaminate(docs, bench, k=8, broadcast_limit=0).take_all()
    )
    assert survivors == [i for i in range(50) if i != 5]
