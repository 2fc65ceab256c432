"""End-to-end training-corpus release — the capstone composition a data
team actually ships: clean -> near-dup-aware split -> split-partitioned
Parquet with a release manifest.

Every stage is one of the engine's audited operators (each has its own
oracle-checked query): mod-97 benchmark holdout, vectorized language-ID
filter, token floor, exact text dedup, k-shingle decontamination against
the holdout, n-gram dedup clusters as the split key (near-duplicates
never straddle train/val/test), hash split, hive write by split. The
whole chain is streaming: the only exchanges are exact_dedup's bucketed
shuffle, the two key-only joins inside decontaminate, and the pair/CC
machinery of the split — nothing corpus-sized lands on the driver.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _mod97(t: pa.Table, keep_bench: bool) -> pa.Table:
    ids = _chunk(t["doc_id"]).to_numpy(zero_copy_only=False)
    mask = (ids % 97 == 0) if keep_bench else (ids % 97 != 0)
    return t.filter(pa.array(mask))


def release_corpus(
    sf_dir: str,
    out_dir: str,
    lang: str = "en",
    min_tokens: int = 10,
    val_permille: int = 100,
    test_permille: int = 50,
) -> dict:
    """Run the full release chain over ``<sf_dir>/documents.parquet`` and
    write ``<out_dir>/docs/split=train|val|test/*.parquet`` plus
    ``_release.json`` (per-split doc/token counts and the stage recipe).
    Returns the manifest dict."""
    from . import dedup, textops
    from .sampling import cluster_coherent_split

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = docs.map_batches(
        lambda t: _mod97(t, keep_bench=True), batch_format="pyarrow"
    )
    corpus = docs.map_batches(
        lambda t: _mod97(t, keep_bench=False), batch_format="pyarrow"
    )
    corpus = corpus.map_batches(textops.LangId(), batch_format="pyarrow")
    corpus = corpus.map_batches(textops.token_count_batch, batch_format="pyarrow")
    corpus = corpus.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(_chunk(t["lang_pred"]), lang),
                pc.greater_equal(_chunk(t["n_tokens"]), min_tokens),
            )
        ),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "text", "n_tokens"])
    corpus = dedup.exact_dedup(corpus, ["text"], ["doc_id"])
    corpus = dedup.decontaminate(corpus, bench, k=8)

    pairs = dedup.ngram_jaccard_pairs(corpus, threshold=0.5, k=2, max_df=200)
    split = cluster_coherent_split(
        corpus, pairs, val_permille=val_permille, test_permille=test_permille
    ).select_columns(["doc_id", "split"])

    from .relational import broadcast_lookup_join

    labeled = broadcast_lookup_join(
        corpus, split, fact_key="doc_id", dim_key="doc_id", take_cols=["split"]
    )
    docs_dir = os.path.join(out_dir, "docs")
    labeled.write_parquet(docs_dir, partition_cols=["split"])

    counts: dict = {}
    for b in labeled.map_batches(
        lambda t: t.select(["split", "n_tokens"])
        .group_by("split")
        .aggregate([("n_tokens", "sum"), ("split", "count")]),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        for r in b.to_pylist():
            c = counts.setdefault(r["split"], {"docs": 0, "tokens": 0})
            c["docs"] += r["split_count"]
            c["tokens"] += r["n_tokens_sum"]
    manifest = {
        "splits": counts,
        "recipe": {
            "holdout": "doc_id % 97 == 0",
            "lang": lang,
            "min_tokens": min_tokens,
            "dedup": "exact text, lowest doc_id wins",
            "decontaminate": "8-word shingles vs holdout",
            "split_key": "ngram-0.5 dedup cluster id (leak-free)",
            "val_permille": val_permille,
            "test_permille": test_permille,
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_release.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
