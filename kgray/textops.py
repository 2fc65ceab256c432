"""Text-analysis operators for large-scale corpus pipelines.

All kernels are vectorized Arrow (`pc.utf8_*` / `split_whitespace`) or
compiled-regex actor stages — no per-row Python in hot paths except where
the regex engine itself is per-row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "and", "of", "to")

# crude BPE-ish token grammar: words, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per row (vectorized)."""
    toks = pc.utf8_split_whitespace(_chunked(batch[text_col]))
    return batch.append_column("n_tokens", pc.cast(pc.list_value_length(toks), pa.int64()))


class BpeTokenCounter:
    """Actor stage: BPE-ish regex token counting (regex compiled once)."""

    def __init__(self, pattern: str = BPE_RE):
        self._rx = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        counts = np.fromiter(
            (len(self._rx.findall(t)) if t else 0 for t in texts),
            dtype=np.int64, count=len(texts),
        )
        return batch.append_column("n_bpe_tokens", pa.array(counts))


def quality_score_batch(
    batch: pa.Table, text_col: str = "text", stopwords: tuple[str, ...] = STOPWORDS
) -> pa.Table:
    """Quality metrics per document: token count, char count, stopword
    ratio, punctuation ratio (all 6-decimal rounded for stable compare)."""
    text = _chunked(batch[text_col])
    toks = _chunked(pc.utf8_split_whitespace(text))
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())

    flat = toks.flatten()
    is_stop = pc.is_in(flat, value_set=pa.array(list(stopwords)))
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    stops = is_stop.to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    stop_counts = np.zeros(len(lengths), dtype=np.int64)
    nz = lengths > 0
    if stops.size and nz.any():
        # reduceat over the starts of non-empty rows: each segment covers
        # exactly that row's tokens (empty rows contribute no elements)
        stop_counts[nz] = np.add.reduceat(stops.astype(np.int64), offsets[:-1][nz])
    stop_ratio = np.round(
        np.divide(stop_counts, lengths, out=np.zeros(len(lengths)), where=lengths > 0), 6
    )

    # punctuation ratio over characters
    n_punct = np.zeros(len(lengths), dtype=np.int64)
    for ch in ".,;:!?":
        n_punct += pc.count_substring(text, ch).to_numpy(zero_copy_only=False)
    chars = n_chars.to_numpy(zero_copy_only=False)
    punct_ratio = np.round(
        np.divide(n_punct, chars, out=np.zeros(len(chars), dtype=float), where=chars > 0), 6
    )

    return (
        batch.append_column("n_tokens", n_tokens)
        .append_column("n_chars_m", n_chars)
        .append_column("n_stop", pa.array(stop_counts))
        .append_column("stop_ratio", pa.array(stop_ratio))
        .append_column("punct_ratio", pa.array(punct_ratio))
    )


# language marker profiles for the n-gram/stopword heuristic language-ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was"),
    "es": ("el", "la", "los", "es", "una"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "est", "une"),
    "zh": (),  # no latin markers — fallback bucket
}


class LangId:
    """Stopword-profile language-ID heuristic.

    Scores each language by marker-word hits; ties and zero-evidence rows
    fall back to 'und'. (Synthetic corpora have no real language signal —
    this op exists for the operator surface and its plumbing.)

    The marker state is a tiny dict, so pass a prebuilt INSTANCE to
    task-based ``map_batches`` (it ships with the task, built once on the
    driver) — an actor pool's spin-up costs more than the state is worth.
    A real model-backed language ID would go back to the class-with-
    ``concurrency`` actor form.
    """

    def __init__(self, markers: dict[str, tuple[str, ...]] | None = None):
        self._markers = {
            lang: frozenset(ws) for lang, ws in (markers or LANG_MARKERS).items() if ws
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized: one tokenize, one is_in + reduceat per language —
        # the quality_score_batch pattern; no per-row Python
        text = pc.utf8_lower(_chunked(batch["text"]))
        toks = _chunked(pc.utf8_split_whitespace(text))
        flat = toks.flatten()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        n = len(lengths)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        nz = lengths > 0
        langs = sorted(self._markers)
        scores = np.zeros((n, len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            # DISTINCT marker hits per row (set-intersection semantics):
            # count marker words, but each marker at most once per row
            col = np.zeros(n, dtype=np.int64)
            for w in sorted(self._markers[lang]):
                hit = pc.equal(flat, w).to_numpy(zero_copy_only=False)
                if hit.size and nz.any():
                    col[nz] += (
                        np.add.reduceat(hit.astype(np.int64), offsets[:-1][nz]) > 0
                    ).astype(np.int64)
            scores[:, li] = col
        best = np.argmax(scores, axis=1)  # first max wins = sorted-lang tiebreak
        max_score = scores[np.arange(n), best]
        lang_arr = np.array(langs, dtype=object)
        out = np.where(max_score > 0, lang_arr[best], "und")
        return batch.append_column("lang_pred", pa.array(out.tolist(), type=pa.string()))


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _explode_terms(t: pa.Table, text_col: str, id_col: str):
    """(id, term) token-occurrence rows, all-Arrow: ``split_pattern(" ")``
    + ``list_flatten`` + parent-index take, empties dropped — exactly
    the tokenization of the pandas ``str.split/explode/notna`` combiner
    it replaces (and of DuckDB's ``string_split(text, ' ')`` mirror);
    null texts contribute no rows in all three. Returns
    ``(ids, terms)`` as Arrow arrays."""
    toks = pc.split_pattern(_chunked(t[text_col]), " ")
    flat = pc.list_flatten(toks)
    ids = pc.take(_chunked(t[id_col]), pc.list_parent_indices(toks))
    mask = pc.fill_null(pc.not_equal(flat, ""), False)
    return ids.filter(mask), flat.filter(mask)


def rolling_hash64(texts: pa.Array) -> np.ndarray:
    """Vectorized 64-bit polynomial rolling hash per string:
    ``fp(s) = sum_i byte[i] * P^(L-1-i)`` (uint64 wraparound, P = FNV
    prime). One numpy pass over the column's raw UTF-8 buffer — no Python
    per row, no per-byte loop. Deterministic across workers/libraries.
    Null / empty strings hash to 0."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    off_dtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    offs = np.frombuffer(texts.buffers()[1], dtype=off_dtype)[
        texts.offset : texts.offset + n + 1
    ].astype(np.int64)
    data_buf = texts.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8).astype(np.uint64)
        if data_buf is not None and len(data_buf) > 0
        else np.empty(0, dtype=np.uint64)
    )
    starts, ends = offs[:-1], offs[1:]
    lengths = ends - starts
    out = np.zeros(n, dtype=np.uint64)
    total = int(offs[-1] - offs[0])
    if total == 0:
        return out
    data = data[offs[0] : offs[-1]]
    starts0, ends0 = starts - offs[0], ends - offs[0]
    maxlen = int(lengths.max())
    pows = np.empty(maxlen, dtype=np.uint64)
    pows[0] = 1
    if maxlen > 1:
        np.multiply.accumulate(np.full(maxlen - 1, _FNV_PRIME, dtype=np.uint64), out=pows[1:])
    exp = np.repeat(ends0 - 1, lengths) - np.arange(total, dtype=np.int64)
    terms = data * pows[exp]
    nz = lengths > 0
    out[nz] = np.add.reduceat(terms, starts0[nz])
    return out


def json_field_int(
    batch: pa.Table, col: str = "props", key: str = "k", out: str | None = None
) -> pa.Table:
    """Vectorized integer-field extraction from a JSON-string column via
    the Arrow ``extract_regex`` C kernel (zero Python per row). Exact for
    flat numeric fields; nested/escaped documents need a real JSON parser
    stage (`map_batches` over ``json.loads`` — the slow general path)."""
    pattern = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)'
    src = _chunked(batch[col])
    extracted = pc.extract_regex(src, pattern)
    vals = pc.if_else(
        pc.is_valid(extracted),
        pc.cast(pc.struct_field(extracted, "v"), pa.int64()),
        pa.scalar(None, pa.int64()),
    )
    return batch.append_column(out or key, vals)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling-hash content fingerprint, hex-encoded."""
    h = rolling_hash64(_chunked(batch[text_col]))
    hexed = np.char.zfill(
        np.vectorize(lambda x: format(x, "x"), otypes=[object])(h).astype(str), 16
    )
    return batch.append_column("fingerprint", pa.array(hexed.tolist(), type=pa.string()))


# ---------------------------------------------------------------------------
# corpus term statistics (TF / DF)
# ---------------------------------------------------------------------------

def top_terms_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> pa.Table:
    """Per-document top-``k`` terms by (tf DESC, term ASC).

    Documents are rows, so term frequencies are COMPLETE within a batch —
    this is embarrassingly parallel (no shuffle at all), unlike the
    corpus-wide ``term_df``. Tokenization is a plain single-space split
    with empty tokens dropped (exactly DuckDB's ``string_split(text, ' ')``
    so the oracle can mirror it). All-Arrow: split + list_flatten +
    group_by count, then one vectorized sort and a numpy running rank —
    no pandas round-trip. (tf, term) is unique per (doc, term) after the
    group_by, so the sort is a total order and tie handling never
    differs from the old stable pandas sort.
    """
    ids, flat = _explode_terms(batch, text_col, id_col)
    tf = (
        pa.table({id_col: ids, "term": flat})
        .group_by([id_col, "term"])
        .aggregate([([], "count_all")])
    )
    tf = tf.take(
        pc.sort_indices(
            tf,
            sort_keys=[
                (id_col, "ascending"),
                ("count_all", "descending"),
                ("term", "ascending"),
            ],
        )
    )
    gid = tf[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(gid)
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
            }
        )
    pos = np.arange(n, dtype=np.int64)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = gid[1:] != gid[:-1]
    rn = pos - np.maximum.accumulate(np.where(first, pos, 0)) + 1
    keepm = pa.array(rn <= k)
    kept = tf.filter(keepm)
    return pa.table(
        {
            id_col: pc.cast(_chunked(kept[id_col]), pa.int64()),
            "term": _chunked(kept["term"]),
            "tf": pc.cast(_chunked(kept["count_all"]), pa.int64()),
            "rn": pa.array(rn[rn <= k]),
        }
    )


def normalize_text_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "norm_text",
) -> pa.Table:
    """Canonical text normalization: lowercase, non-alphanumerics to
    spaces, space runs collapsed, ends trimmed — entirely Arrow C kernels
    (``utf8_lower`` + two RE2 ``replace_substring_regex`` passes), zero
    per-row Python. DuckDB mirrors it verbatim with
    ``trim(regexp_replace(regexp_replace(lower(x),'[^a-z0-9 ]+',' ','g'),' +',' ','g'))``.
    """
    s = pc.utf8_lower(_chunked(batch[text_col]))
    s = pc.replace_substring_regex(s, "[^a-z0-9 ]+", " ")
    s = pc.replace_substring_regex(s, " +", " ")
    s = pc.utf8_trim(s, " ")
    out = batch.append_column(out_col, s)
    return out.append_column("n_chars", pc.cast(pc.utf8_length(s), pa.int64()))


def postings_index(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    num_buckets: int = 32,
):
    """Capped inverted index: per term, the TRUE document frequency plus
    the first ``k`` doc ids ascending, comma-joined.

    Combiner discipline as in ``term_df``: each batch emits its distinct
    (term, doc) pairs, one keyed shuffle co-locates terms, the per-bucket
    reducer sorts, truncates the postings list at ``k`` and joins. The cap
    bounds the payload per term at scale; ``df`` carries the untruncated
    count so the cut is visible in the output, never silent.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def pairs(t: pa.Table) -> pa.Table:
        ids, flat = _explode_terms(t, text_col, id_col)
        # distinct (doc, term) pairs via an empty-agg group_by
        return pa.table({id_col: ids, "term": flat}).group_by(
            [id_col, "term"]
        ).aggregate([])

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["term", id_col]).sort_values(
            ["term", id_col], kind="mergesort"
        )
        dfc = df.groupby("term", sort=False).size().rename("df")
        heads = df.groupby("term", sort=False).head(k)
        posts = heads.groupby("term", sort=False)[id_col].agg(
            lambda s: ",".join(map(str, s))
        )
        return pd.DataFrame(
            {
                "term": dfc.index.to_numpy(),
                "df": dfc.to_numpy().astype("int64"),
                "postings": posts.reindex(dfc.index).to_numpy(),
            }
        )

    combined = ds.map_batches(pairs, batch_format="pyarrow")
    return hash_bucketed_groupby(combined, ["term"], build, num_buckets)


def term_df(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
    num_buckets: int = 32,
) -> pa.Table:
    """Corpus document frequencies -> top-``top_n`` terms by (df DESC,
    term ASC).

    Per-batch combiner emits one row per DISTINCT (doc, term) reduced to
    per-term partial counts; a bucketed shuffle sums them; each reduced
    batch is pruned to its own top-``top_n`` (only those can reach the
    global top) so the driver merges a few hundred candidate rows — never
    the vocabulary.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def partial(t: pa.Table) -> pa.Table:
        ids, flat = _explode_terms(t, text_col, id_col)
        dedup = pa.table({id_col: ids, "term": flat}).group_by(
            [id_col, "term"]
        ).aggregate([])
        return dedup.group_by("term").aggregate(
            [([], "count_all")]
        ).rename_columns(["term", "df"])

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("term", as_index=False)["df"].sum()
        return agg.sort_values(
            ["df", "term"], ascending=[False, True], kind="mergesort"
        ).head(top_n)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    pruned = hash_bucketed_groupby(partials, ["term"], local_top, num_buckets)
    cands = [b for b in pruned.iter_batches(batch_format="pandas", batch_size=1 << 16)]
    merged = (
        pd.concat(cands, ignore_index=True)
        if cands
        else pd.DataFrame({"term": [], "df": []})
    )
    final = merged.sort_values(
        ["df", "term"], ascending=[False, True], kind="mergesort"
    ).head(top_n)
    return pa.table(
        {
            "term": pa.array(final["term"].astype(str).tolist(), type=pa.string()),
            "df": pa.array(final["df"].to_numpy(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# pattern scrub (PII redaction) and training-context chunking
# ---------------------------------------------------------------------------

# Default PII redaction set. Arrow's regex engine is RE2 (same as DuckDB's),
# so the identical pattern strings drive both the engine and the oracle.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"(\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]\d{4}", "[PHONE]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"https?://[^\s]+", "[URL]"),
)


def scrub_text_batch(
    batch: pa.Table,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    out_col: str = "clean_text",
    count_col: str = "n_redactions",
) -> pa.Table:
    """Redact every ``patterns`` match (PII scrub) — all Arrow RE2 C kernels.

    Patterns apply SEQUENTIALLY and each is counted on the text as it
    stands at that step (a phone inside an already-redacted URL is not
    double-counted) — mirror the same ordering in any oracle."""
    text = _chunked(batch[text_col])
    counts = np.zeros(len(text), dtype=np.int64)
    for pat, repl in patterns:
        counts += pc.fill_null(pc.count_substring_regex(text, pat), 0).to_numpy(
            zero_copy_only=False
        )
        text = pc.replace_substring_regex(text, pat, repl)
    return batch.append_column(out_col, text).append_column(
        count_col, pa.array(counts)
    )


def chunk_text_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 48,
    overlap: int = 8,
) -> pa.Table:
    """Fan each document out into fixed-width training-context chunks.

    Windows of ``size`` codepoints advance by ``size - overlap``; the last
    window clips at the text end; every document emits at least one chunk
    (short/empty texts emit themselves). Embarrassingly parallel — chunking
    is complete within a batch, no shuffle — and vectorized: one Arrow
    slice kernel per chunk INDEX (bounded by the longest doc in the batch,
    independent of row count), never per row. Slicing counts codepoints,
    matching SQL ``substring`` character semantics.

    Emits (id_col, chunk_id, chunk, n_chunks).
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    text = _chunked(batch[text_col])
    n = pc.fill_null(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    n = n.astype(np.int64)
    n_chunks = np.where(n <= size, 1, -(-(n - size) // stride) + 1)
    ids = _chunked(batch[id_col])
    out = []
    for j in range(int(n_chunks.max()) if len(n_chunks) else 0):
        idx = np.nonzero(n_chunks > j)[0]
        sel = pa.array(idx)
        out.append(
            pa.table(
                {
                    id_col: ids.take(sel),
                    "chunk_id": pa.array(np.full(len(idx), j, dtype=np.int64)),
                    "chunk": pc.utf8_slice_codeunits(
                        text.take(sel), start=j * stride, stop=j * stride + size
                    ),
                    "n_chunks": pa.array(n_chunks[idx]),
                }
            )
        )
    if not out:
        return pa.table(
            {
                id_col: pa.array([], type=ids.type),
                "chunk_id": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
                "n_chunks": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(out)


def doc_rarity(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_scale: int = 1_000_000,
    num_buckets: int = 32,
):
    """Per-document rarity score — the model-free "informativeness" signal
    a quality filter uses where no LM is available: each token contributes
    ``(n_docs * score_scale) // df(term)`` (an integer idf), summed over
    ALL token occurrences, plus the floor mean per token. Pure int64
    arithmetic end to end, so both arms agree bit-for-bit (``ln()`` idf
    would rank identically but round differently across engines).

    One term-keyed bucketed shuffle does everything term-side: within a
    bucket every (doc, term, tf) row for a term is present, so df is the
    per-term row count and the per-doc partials (token count, rarity sum)
    fall out of the same pass — no separate vocabulary join or broadcast.
    A doc-keyed ``grouped_agg`` then merges partials across term buckets.
    Docs with zero tokens produce no row (a curation pass drops them
    anyway). With ppm scaling the sum stays inside int64 while
    n_docs * doc_len < ~9e12 — pass a smaller ``score_scale`` beyond that.
    """
    import pandas as pd

    from .relational import grouped_agg, hash_bucketed_groupby

    n_docs = ds.count()

    def tf_rows(t: pa.Table) -> pa.Table:
        ids, flat = _explode_terms(t, text_col, id_col)
        return pa.table({id_col: ids, "term": flat}).group_by(
            [id_col, "term"]
        ).aggregate([([], "count_all")]).rename_columns(
            [id_col, "term", "tf"]
        )

    def per_term(df: pd.DataFrame) -> pd.DataFrame:
        dfc = df.groupby("term")["tf"].transform("size").to_numpy(np.int64)
        tf = df["tf"].to_numpy(np.int64)
        part = pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_tokens": tf,
                "rarity_sum": tf * ((n_docs * score_scale) // dfc),
            }
        )
        return part.groupby(id_col, as_index=False)[["n_tokens", "rarity_sum"]].sum()

    tf = ds.select_columns([id_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    partials = hash_bucketed_groupby(tf, ["term"], per_term, num_buckets)
    agg = grouped_agg(
        partials,
        keys=[id_col],
        sums={"n_tokens": "n_tokens", "rarity_sum": "rarity_sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rarity_avg",
            pc.divide(t["rarity_sum"], t["n_tokens"]),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def tfidf_top_terms(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    score_scale: int = 1_000_000,
    vocab_broadcast_limit: int = 2_000_000,
    num_buckets: int = 32,
):
    """Per-document top-``k`` keywords by integer tf-idf score.

    ``score = (tf * score_scale) // df`` — pure int64 arithmetic, so the
    ranking is bit-stable across engines and SQL-mirrorable (1/df keeps
    idf's ordering at fixed tf; ``ln()`` would introduce cross-engine
    float rounding at rank boundaries). Ties break on term.

    Two passes over the corpus, both streaming: (1) per-batch (doc, term,
    tf) partials reduce to corpus document frequencies via one bucketed
    sum (vocabulary-sized output); (2) the same tf explode re-runs with
    the df table attached. When the vocabulary fits
    ``vocab_broadcast_limit`` it ships once via ``ray.put`` and pass 2 is
    shuffle-free — a doc's rows never leave their batch, so the per-doc
    top-k is embarrassingly parallel. A larger vocabulary degrades to a
    term-keyed hash join plus a doc-keyed bucketed top-k.

    Tokenization matches ``top_terms_batch`` (single-space split, empty
    tokens dropped) so the same SQL mirror applies.
    """
    import pandas as pd

    import ray as _ray

    from .relational import hash_bucketed_groupby, shuffle_join
    from .util import join_partitions

    def tf_rows(t: pa.Table) -> pa.Table:
        ids, flat = _explode_terms(t, text_col, id_col)
        return pa.table({id_col: ids, "term": flat}).group_by(
            [id_col, "term"]
        ).aggregate([([], "count_all")]).rename_columns(
            [id_col, "term", "tf"]
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [id_col, "score", "term"], ascending=[True, False, True], kind="mergesort"
        )
        out = df.groupby(id_col, as_index=False).head(k).copy()
        out["rn"] = out.groupby(id_col).cumcount() + 1
        return out

    tf = ds.select_columns([id_col, text_col]).map_batches(tf_rows, batch_format="pyarrow")

    # corpus document frequencies: tf rows are one per (doc, term), so the
    # per-term row count IS df; per-batch partial -> one bucketed sum
    df_partial = tf.map_batches(
        lambda d: d.groupby("term", as_index=False).size().rename(columns={"size": "df"}),
        batch_format="pandas",
    )
    df_ds = hash_bucketed_groupby(
        df_partial, ["term"],
        lambda d: d.groupby("term", as_index=False)["df"].sum(),
        num_buckets=num_buckets,
    ).materialize()

    if df_ds.count() <= vocab_broadcast_limit:
        vocab = pd.concat(
            list(df_ds.iter_batches(batch_format="pandas", batch_size=1 << 20)),
            ignore_index=True,
        ) if df_ds.count() else pd.DataFrame({"term": [], "df": []})
        ref = _ray.put(pd.Series(
            vocab["df"].to_numpy(np.int64), index=vocab["term"]
        ))

        def score_local(d: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            dfs = _ray.get(_ref)
            d = d.copy()
            d["df"] = d["term"].map(dfs).astype(np.int64)
            d["score"] = (d["tf"].to_numpy(np.int64) * score_scale) // d["df"].to_numpy(
                np.int64
            )
            return topk(d)

        return tf.map_batches(score_local, batch_format="pandas")

    joined = shuffle_join(
        tf, df_ds, on=("term",),
        num_partitions=join_partitions(num_buckets),
    )
    scored = joined.map_batches(
        lambda d: d.assign(
            score=(d["tf"].to_numpy(np.int64) * score_scale)
            // d["df"].to_numpy(np.int64)
        ),
        batch_format="pandas",
    )
    return hash_bucketed_groupby(scored, [id_col], topk, num_buckets=num_buckets)


def repetition_stats_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_word_max_ppm: int = 900_000,
    top_bigram_max_ppm: int = 200_000,
) -> pa.Table:
    """Gopher-style repetition quality filter (Rae et al. 2021 §A1.1),
    doc-local so it runs as a plain map_batches with NO shuffle:

    - ``dup_word_ppm``   = floor(1e6 * (n_words - n_distinct_words) / n_words)
    - ``top_bigram_ppm`` = floor(1e6 * count(most frequent word bigram)
                                      / n_bigrams)
    - ``keep`` = both below their thresholds (int64 0/1)

    Splitting is the single-space split (matches SQL ``string_split``);
    per-doc distinct/bigram counts run as pandas C-level groupbys over the
    flattened word stream — no Python loop over rows or words.
    """
    import pandas as pd

    texts = _chunked(batch[text_col])
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_docs = len(words)
    n_words = pc.list_value_length(words).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    flat = pd.Series(words.flatten().to_pandas(), copy=False)

    n_distinct = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        nd = flat.groupby(doc_idx, sort=False).nunique()
        n_distinct[nd.index.to_numpy()] = nd.to_numpy(np.int64)

    top_bigram = np.zeros(n_docs, dtype=np.int64)
    if len(flat) > 1:
        same = doc_idx[1:] == doc_idx[:-1]
        if same.any():
            grams = flat.iloc[:-1].reset_index(drop=True)[same].str.cat(
                flat.iloc[1:].reset_index(drop=True)[same], sep=" "
            )
            gdoc = doc_idx[:-1][same]
            cnt = grams.groupby([gdoc, grams.to_numpy()], sort=False).size()
            top = cnt.groupby(level=0).max()
            top_bigram[top.index.to_numpy()] = top.to_numpy(np.int64)

    safe_w = np.maximum(n_words, 1)
    dup_ppm = ((n_words - n_distinct) * 1_000_000) // safe_w
    n_bigrams = np.maximum(n_words - 1, 1)
    top_ppm = np.where(
        n_words < 2, 0, (top_bigram * 1_000_000) // n_bigrams
    ).astype(np.int64)
    keep = ((dup_ppm < dup_word_max_ppm) & (top_ppm < top_bigram_max_ppm)).astype(
        np.int64
    )
    return pa.table(
        {
            id_col: pc.cast(_chunked(batch[id_col]), pa.int64()),
            "n_words": pa.array(n_words),
            "dup_word_ppm": pa.array(dup_ppm),
            "top_bigram_ppm": pa.array(top_ppm),
            "keep": pa.array(keep),
        }
    )


def bm25_keywords(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_buckets: int = 32,
):
    """Per-doc top-``k`` keywords by an EXACT-INTEGER BM25 variant
    (k1=1.2, b=0.75, and the classic log-idf replaced by the raw odds
    ratio ``(2N - 2df + 1) / (2df + 1)`` so no transcendental ever enters
    — every score is one positive integer floor division, reproducible
    bit-for-bit in SQL):

        score_ppk = (1000 · 22·tf·T · idf_num)
                    // (((10·tf + 3)·T + 9·dl·N) · idf_den)

    with T = total corpus tokens, N = docs, dl = doc length. Two cheap
    stat passes (df map + (N, T) scalars — the df dict is vocabulary-
    sized, bounded by language, and broadcast once), then a shuffle-free
    scoring pass: tf and dl are complete within a batch because docs are
    rows. int64 bound: 1000·22·tf·T·idf_num must stay < 2^63 — holds to
    ~1e7 docs at this corpus shape; drop the ppk scale for more.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def _tok(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.assign(term=df[text_col].str.split(" ")).explode("term")[[id_col, "term"]]
        return ex[ex["term"].notna() & (ex["term"] != "")]

    def df_part(df: pd.DataFrame) -> pd.DataFrame:
        d = _tok(df).drop_duplicates()
        return d.groupby("term", as_index=False).size().rename(columns={"size": "df"})

    def df_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False)["df"].sum()

    df_map: dict = {}
    reduced = hash_bucketed_groupby(
        ds.map_batches(df_part, batch_format="pandas"), ["term"], df_sum, num_buckets
    )
    for b in reduced.iter_batches(batch_format="pandas", batch_size=1 << 16):
        df_map.update(zip(b["term"], b["df"].astype("int64")))

    def nt_part(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tok(df)
        return pd.DataFrame({"n_docs": [len(df)], "total": [len(toks)]})

    nt = ds.map_batches(nt_part, batch_format="pandas").sum(["n_docs", "total"]) or {}
    n_docs = int(nt.get("sum(n_docs)", 0) or 0)
    total = int(nt.get("sum(total)", 0) or 0)

    def score(df: pd.DataFrame, _df=df_map, _n=n_docs, _t=total) -> pd.DataFrame:
        toks = _tok(df)
        tf = toks.groupby([id_col, "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        dl = toks.groupby(id_col, as_index=False).size().rename(columns={"size": "dl"})
        m = tf.merge(dl, on=id_col)
        tfv = m["tf"].to_numpy(dtype="int64")
        dlv = m["dl"].to_numpy(dtype="int64")
        dfv = m["term"].map(_df).to_numpy(dtype="int64")
        idf_num = 2 * _n - 2 * dfv + 1
        idf_den = 2 * dfv + 1
        num = 1000 * (22 * tfv * _t) * idf_num
        den = ((10 * tfv + 3) * _t + 9 * dlv * _n) * idf_den
        m["score_ppk"] = num // den
        m = m.sort_values(
            [id_col, "score_ppk", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = m.groupby(id_col, sort=False).head(k).copy()
        top["rn"] = top.groupby(id_col, sort=False).cumcount() + 1
        return top[[id_col, "term", "score_ppk", "rn"]].astype(
            {id_col: "int64", "score_ppk": "int64", "rn": "int64"}
        )

    return ds.map_batches(score, batch_format="pandas")


def heavy_hitters(
    ds,
    text_col: str = "text",
    k: int = 16,
):
    """Terms occupying more than 1/``k`` of all corpus tokens, with exact
    counts — the two-pass heavy-hitters pattern:

    pass 1 collects CANDIDATES: each batch keeps terms heavier than 1/k
    of its own tokens (at most k per batch). A globally-heavy term's
    corpus fraction is a weighted average of its batch fractions, so it
    must exceed 1/k in at least one batch — the candidate union provably
    covers every true heavy hitter while staying k x n_blocks small.
    pass 2 re-streams once counting ONLY the broadcast candidates plus
    the total, then applies the exact threshold ``n * k > total`` — the
    output is exact and deterministic (no sketch error, no merge-order
    dependence), yet no pass ever shuffles or holds the vocabulary.
    """
    import pandas as pd

    def _tok(df: pd.DataFrame) -> pd.Series:
        ex = df[text_col].str.split(" ").explode()
        return ex[ex.notna() & (ex != "")]

    def cand_part(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tok(df)
        vc = toks.value_counts()
        heavy = vc[vc * k > len(toks)]
        return pd.DataFrame({"term": heavy.index.astype(str)})

    cands: set = set()
    for b in ds.map_batches(cand_part, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=1 << 16
    ):
        cands.update(b["term"])
    cand_list = sorted(cands)

    def count_part(df: pd.DataFrame, _c=frozenset(cand_list)) -> pd.DataFrame:
        toks = _tok(df)
        hits = toks[toks.isin(_c)]
        vc = hits.value_counts()
        out = pd.DataFrame({"term": vc.index.astype(str), "n": vc.to_numpy()})
        out.loc[len(out)] = ["", len(toks)]  # total-token tally rides along
        return out.astype({"n": "int64"})

    from .relational import grouped_agg

    sums = grouped_agg(
        ds.map_batches(count_part, batch_format="pandas"),
        keys=["term"], sums={"n": "n"},
    ).to_pandas()
    if "term" not in sums.columns:  # degenerate empty input
        return pa.table(
            {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    total = int(sums.loc[sums["term"] == "", "n"].sum())
    out = sums[(sums["term"] != "") & (sums["n"] * k > total)]
    return pa.table(
        {
            "term": pa.array(out["term"].astype(str), type=pa.string()),
            "n": pa.array(out["n"].astype("int64")),
        }
    )


def train_bpe(
    ds,
    text_col: str = "text",
    n_merges: int = 10,
    num_buckets: int = 32,
) -> pa.Table:
    """Learn ``n_merges`` byte-pair-encoding merges from the corpus — the
    tokenizer-training step of an LLM data pipeline. Classic word-level
    BPE (Sennrich et al. 2016): words split to characters, then the most
    frequent adjacent symbol pair merges, n_merges times; ties break on
    the lexicographically smallest pair, so the merge table is
    deterministic at any parallelism.

    Scale split: the CORPUS-scale pass is one vectorized token-count
    shuffle producing the (word, freq) vocabulary Dataset; every
    iteration after that is VOCABULARY-bounded — a per-word symbol scan
    (plain Python over each batch's words, standard for symbolic BPE),
    one grouped pair-count reduce, a driver argmax over distinct pairs,
    and a broadcast merge apply. The vocab Dataset is re-materialized per
    iteration so upstream never re-executes.

    Returns pa.Table(rank, left, right, n) — the ordered merge table.
    """
    import pandas as pd

    from .relational import grouped_agg

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.assign(w=df[text_col].str.split(" ")).explode("w")[["w"]]
        ex = ex[ex["w"].notna() & (ex["w"] != "")]
        return ex.groupby("w", as_index=False).size().rename(columns={"size": "freq"})

    vocab = grouped_agg(
        ds.map_batches(word_counts, batch_format="pandas"),
        keys=["w"],
        sums={"freq": "freq"},
    )

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "freq": df["freq"].to_numpy(np.int64),
                "syms": [list(w) for w in df["w"]],
            }
        )

    state = vocab.map_batches(to_syms, batch_format="pandas").materialize()
    merges = []
    for rank in range(1, n_merges + 1):

        def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
            acc: dict = {}
            for syms, f in zip(df["syms"], df["freq"]):
                for a, b in zip(syms, syms[1:]):
                    k = (a, b)
                    acc[k] = acc.get(k, 0) + int(f)
            if not acc:
                return pd.DataFrame({"a": [], "b": [], "n": []})
            ks = list(acc)
            return pd.DataFrame(
                {
                    "a": [k[0] for k in ks],
                    "b": [k[1] for k in ks],
                    "n": np.fromiter(acc.values(), dtype=np.int64),
                }
            )

        # per-batch pair partials fold on the DRIVER — distinct adjacent
        # pairs are vocabulary-bounded, and the bucketed groupby's fixed
        # shuffle cost per iteration dwarfed this tiny aggregation
        acc: dict = {}
        for bt in state.map_batches(
            pair_counts, batch_format="pandas"
        ).iter_batches(batch_format="pandas", batch_size=1 << 18):
            for a_, b_, n_ in zip(bt["a"], bt["b"], bt["n"]):
                key = (a_, b_)
                acc[key] = acc.get(key, 0) + int(n_)
        if not acc:
            break
        (a, b), n_best = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n_best))
        ab = a + b

        def apply_merge(df: pd.DataFrame, _a=a, _b=b, _ab=ab) -> pd.DataFrame:
            out = []
            for syms in df["syms"]:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == _a and syms[i + 1] == _b:
                        res.append(_ab)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pd.DataFrame({"freq": df["freq"].to_numpy(np.int64), "syms": out})

        state = state.map_batches(apply_merge, batch_format="pandas").materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], type=pa.int64()),
            "left": pa.array([m[1] for m in merges], type=pa.string()),
            "right": pa.array([m[2] for m in merges], type=pa.string()),
            "n": pa.array([m[3] for m in merges], type=pa.int64()),
        }
    )


def apply_bpe(
    ds,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus TOKENIZATION with a trained BPE merge table — the APPLY
    side of :func:`train_bpe` (Sennrich et al. 2016 §3), i.e. what a
    training pipeline actually runs over the whole corpus once the
    tokenizer is fixed. Each word splits to characters and the merges
    apply in rank order, leftmost-non-overlapping per rank — the
    byte-identical twin of the trainer's ``apply_merge`` kernel, so
    train -> apply round-trips exactly. Emits one row per document
    with >= 1 word: ``(id_col, n_words, n_subwords)`` (empty docs
    produce no row, same convention as ``doc_rarity``).

    Scale shape: MAP-ONLY — documents are rows, so per-doc sums are
    complete within a batch and there is no shuffle at all. Each batch
    encodes its UNIQUE words once (batch-vocabulary-bounded Python,
    the standard symbolic-BPE cost) and maps lengths back to token
    occurrences through the dictionary indices, vectorized. The merge
    table is ~n_merges strings closed over by the tasks."""
    if isinstance(merges, pa.Table):
        pairs = list(zip(merges["left"].to_pylist(),
                         merges["right"].to_pylist()))
    else:
        pairs = [(str(a), str(b)) for a, b in merges]

    def _encode_len(word: str) -> int:
        syms = list(word)
        for a, b in pairs:
            if len(syms) == 1:
                break
            ab = a + b
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    def part(t: pa.Table) -> pa.Table:
        ids, flat = _explode_terms(t, text_col, id_col)
        flat = (
            flat.combine_chunks()
            if isinstance(flat, pa.ChunkedArray) else flat
        )
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                    "n_subwords": pa.array([], pa.int64()),
                }
            )
        enc = pc.dictionary_encode(flat)
        lens = np.fromiter(
            (_encode_len(w) for w in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary),
        )
        occ = lens[enc.indices.to_numpy(zero_copy_only=False)]
        g = (
            pa.table(
                {
                    id_col: ids,
                    "n_words": np.ones(len(occ), np.int64),
                    "n_subwords": occ,
                }
            )
            .group_by([id_col])
            .aggregate([("n_words", "sum"), ("n_subwords", "sum")])
            .rename_columns([id_col, "n_words", "n_subwords"])
        )
        return g

    return ds.select_columns([id_col, text_col]).map_batches(
        part, batch_format="pyarrow"
    )


def bigram_lm_scores(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Model-free bigram-LM fluency score — the quality signal a curation
    pipeline uses to rank documents by in-corpus n-gram plausibility
    where no trained LM is available. Every bigram OCCURRENCE (w1, w2)
    contributes ``(scale * c(w1,w2)) // c(w1, .)`` — the floored ppm
    conditional frequency P(w2 | w1) over the corpus — and a document
    scores the floored mean contribution. Pure int64 end to end, so the
    SQL mirror hash-matches at any parallelism (a float log-prob would
    rank identically but round differently across engines).

    Plan (all corpus-scale volumes bounded): a per-batch vectorized
    bigram-tf combiner (Arrow tokenize + offset-mask, pandas str.cat —
    no per-row Python) feeds ONE materialized (doc, gram, tf) stream;
    bigram counts are ONE vocabulary-bounded gram-keyed ``grouped_agg``
    over it, prefix counts derive from that (vocabulary-sized) table —
    c1(w1) = Σ c12 — rather than a second corpus-stream aggregation, and
    the two join size-routed on w1; the counts attach back to the doc
    stream via a size-routed lookup join on the gram key; one doc-keyed
    reduce finishes. Docs with fewer than two words have no bigrams and
    emit no row.

    Returns Dataset(doc_id, n_bigrams, lm_score_ppm).
    """
    import pandas as pd

    import ray.data  # noqa: F401  (type reference only)

    from .relational import broadcast_lookup_join, grouped_agg

    US = "\x1f"

    def big_rows(t: pa.Table) -> pd.DataFrame:
        toks = pc.utf8_split_whitespace(_chunked(t[text_col]))
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = toks.flatten().to_pandas()
        n = len(flat)
        empty = pd.DataFrame(
            {id_col: pd.Series([], dtype=np.int64), "g": pd.Series([], dtype=object),
             "tf": pd.Series([], dtype=np.int64),
             "kind": pd.Series([], dtype=np.int64)}
        )
        if n < 2:
            return empty
        left = flat.iloc[:-1].reset_index(drop=True)
        gram = left.str.cat(flat.iloc[1:].reset_index(drop=True), sep=US)
        # position i pairs word i with i+1; the LAST word of every doc
        # opens no bigram — mask those boundary positions out
        ends = np.cumsum(lengths)
        valid = np.ones(n - 1, dtype=bool)
        bound = ends[ends >= 1] - 1
        valid[bound[bound <= n - 2]] = False
        ids = _chunked(t[id_col]).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(ids, lengths)[: n - 1]
        df = pd.DataFrame(
            {
                id_col: doc_ids[valid],
                "g": gram.to_numpy()[valid],
            }
        )
        if df.empty:
            return empty
        out0 = (
            df.groupby([id_col, "g"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        out0["kind"] = 0
        # batch-combined prefix partials (vocab-bounded per batch) ride
        # the SAME exchange as the doc stream, tagged kind=1 — the ngram
        # max_df fused-shuffle pattern
        out1 = (
            pd.DataFrame({"g": left.to_numpy()[valid]})
            .groupby("g", as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        out1[id_col] = -1
        out1["kind"] = 1
        return pd.concat(
            [out0, out1[[id_col, "g", "tf", "kind"]]], ignore_index=True
        )

    stream = ds.select_columns([id_col, text_col]).map_batches(
        big_rows, batch_format="pyarrow"
    ).materialize()
    if stream.count() == 0:
        # zero bigrams corpus-wide (every doc < 2 words): the lookup joins
        # below would meet schema-less empty blocks — return the empty
        # contract directly
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "lm_score_ppm": pa.array([], type=pa.int64()),
                }
            )
        )

    # ONE fused (kind, key) count shuffle: kind 0 reduces c12 per gram,
    # kind 1 reduces c1 per prefix — no second corpus-stream aggregation
    # and no separate prefix exchange
    counts_all = grouped_agg(
        stream, keys=["kind", "g"], sums={"c": "tf"}
    ).materialize()

    def take_c12(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(_chunked(t["kind"]), 0))
        w1 = pc.list_element(pc.split_pattern(_chunked(t["g"]), US), 0)
        return pa.table({"g": _chunked(t["g"]), "c12": _chunked(t["c"]), "w1": w1})

    def take_c1(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(_chunked(t["kind"]), 1))
        return pa.table({"w1": _chunked(t["g"]), "c1": _chunked(t["c"])})

    c12 = counts_all.map_batches(take_c12, batch_format="pyarrow")
    c1 = counts_all.map_batches(take_c1, batch_format="pyarrow")
    counts = broadcast_lookup_join(
        c12, c1, "w1", "w1", ["c1"], broadcast_limit=broadcast_limit, how="inner"
    )
    # inner join on the gram key also drops the kind-1 rider rows from the
    # doc stream: prefix keys never contain the US separator, gram keys
    # always do, so they cannot collide
    attached = broadcast_lookup_join(
        stream, counts.select_columns(["g", "c12", "c1"]), "g", "g",
        ["c12", "c1"], broadcast_limit=broadcast_limit, how="inner",
    )

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        tf = df["tf"].to_numpy(np.int64)
        c12_ = df["c12"].to_numpy(np.int64)
        c1_ = df["c1"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_bigrams": tf,
                "contrib": tf * ((scale * c12_) // c1_),
            }
        )

    per_doc = grouped_agg(
        attached.map_batches(contrib, batch_format="pandas"),
        keys=[id_col], sums={"n_bigrams": "n_bigrams", "contrib": "contrib"},
    )

    def finish(t: pa.Table) -> pa.Table:
        nb = _chunked(t["n_bigrams"]).to_numpy(zero_copy_only=False)
        c = _chunked(t["contrib"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: _chunked(t[id_col]),
                "n_bigrams": pa.array(nb.astype(np.int64)),
                "lm_score_ppm": pa.array((c // nb).astype(np.int64)),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def perplexity_buckets(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    head_ppm: int = 666_666,
    middle_ppm: int = 333_333,
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """CCNet-style corpus partition (Wenzek et al. 2020, "CCNet:
    extracting high-quality monolingual datasets from web crawl data"):
    score every document with the in-corpus bigram LM, percentile-rank
    the scores corpus-wide, and cut head / middle / tail thirds — the
    standard pre-training split where the head feeds the model and the
    tail feeds the discard pile. CCNet ranks by KenLM perplexity
    (lower = better); ``bigram_lm_scores`` is a fluency (higher =
    better), so head = the TOP third by score — the same documents.

    Everything stays exact int64: the score is ``bigram_lm_scores``'
    ppm integer, the corpus position is ``percentile_rank``'s
    floor(1e6 * strictly_below / n) (cardinality-routed — a near-unique
    score column never folds onto the driver), and the bucket cut is two
    integer comparisons, so the SQL RANK() mirror hash-matches at any
    parallelism. Docs with fewer than two words have no bigrams, hence
    no score and no bucket — identical on both arms.

    Returns Dataset(id, n_bigrams, lm_score_ppm, pct_ppm, bucket).
    """
    from .relational import percentile_rank

    scores = bigram_lm_scores(ds, text_col=text_col, id_col=id_col, scale=scale)
    ranked = percentile_rank(scores, "lm_score_ppm", out_col="pct_ppm")

    def tag(t: pa.Table) -> pa.Table:
        p = _chunked(t["pct_ppm"]).to_numpy(zero_copy_only=False)
        bucket = np.where(
            p >= head_ppm, "head", np.where(p >= middle_ppm, "middle", "tail")
        )
        return t.append_column("bucket", pa.array(bucket, type=pa.string()))

    return ranked.map_batches(tag, batch_format="pyarrow")


def phrase_tag(
    ds,
    phrases: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Multi-phrase containment tagging: emit (id, phrase) for every
    catalog phrase contained in a document — the keyword/taxonomy tagging
    pass of a curation pipeline. The catalog is dimension-sized, so the
    loop runs over PHRASES while each pass is one zero-copy Arrow
    ``match_substring`` C kernel over the whole column; the corpus is
    never scanned in Python. (A catalog too large to loop would compile
    into one alternation regex inside an actor pool — the MentionDetector
    pattern in kgray/extract.py.) Shuffle-free."""
    phrases = sorted(phrases)

    def tag(t: pa.Table) -> pa.Table:
        ids = _chunked(t[id_col])
        id_parts, ph_parts = [], []
        for ph in phrases:
            m = pc.match_substring(_chunked(t[text_col]), ph)
            sel = ids.filter(m)
            if len(sel):
                id_parts.append(sel)
                ph_parts.append(pa.array([ph] * len(sel), type=pa.string()))
        if not id_parts:
            return pa.table(
                {id_col: pa.array([], type=ids.type),
                 "phrase": pa.array([], type=pa.string())}
            )
        return pa.table(
            {id_col: pa.concat_arrays(id_parts),
             "phrase": pa.concat_arrays(ph_parts)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        tag, batch_format="pyarrow"
    )


def feature_hashing(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    num_buckets: int = 32,
):
    """Hashing-trick vectorizer (Weinberger et al. 2009): every token
    occurrence adds sign(h) to component h(term) mod k, giving each doc a
    k-dim integer vector with no vocabulary to build, ship or look up —
    the classic fixed-memory featurizer for corpus-scale linear models.

    The term hash is the engine's byte-polynomial ``rolling_hash64`` (one
    vectorized pass over the token column's UTF-8 buffer), so the exact
    vector mirrors in HUGEINT SQL; sign comes from the next hash bit
    above the index. Emits sparse (id, idx, val) rows with val != 0;
    per-batch partials reduce through one doc-keyed grouped sum.
    All-Arrow combiner: split + list_flatten + hash + group_by sum, no
    pandas round-trip.
    """
    from .relational import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        ids, flat = _explode_terms(t, text_col, id_col)
        fp = rolling_hash64(flat)
        idx = (fp % np.uint64(k)).astype(np.int64)
        sign = np.where(
            (fp // np.uint64(k)) % np.uint64(2) == 0, 1, -1
        ).astype(np.int64)
        return (
            pa.table({id_col: ids, "idx": idx, "val": sign})
            .group_by([id_col, "idx"])
            .aggregate([("val", "sum")])
            .rename_columns([id_col, "idx", "val"])
        )

    summed = grouped_agg(
        ds.map_batches(part, batch_format="pyarrow"),
        keys=[id_col, "idx"],
        sums={"val": "val"},
    )
    return summed.map_batches(
        lambda t: t.filter(pc.not_equal(_chunked(t["val"]), 0)),
        batch_format="pyarrow",
    )


def gopher_gate_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
) -> pa.Table:
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1), with a
    PER-RULE audit column so drops are attributable — the form the paper's
    pipeline actually ships, not just a keep bit. Doc-local, so it runs as
    a plain ``map_batches`` with NO shuffle; every rule is exact integer
    arithmetic (means compared by cross-multiplication), so the SQL mirror
    is value-exact. Rules (single-space split, like the SQL
    ``string_split``):

    - ``wordcount_ok``: min_words <= n_words <= max_words
    - ``meanlen_ok``: min_mean_len <= mean word length <= max_mean_len,
      as ``min*n <= sum_len`` and ``sum_len <= max*n``
    - ``alpha_ok``: >= 80% of words contain an alphabetic character
      (``5 * n_alpha >= 4 * n_words``)
    - ``symbol_ok``: <= 10% of words contain '#' or '...'
      (``10 * n_sym <= n_words``)
    - ``stop_ok``: >= 2 DISTINCT stopwords of the fixed 5-word list appear
    - ``keep`` = AND of all five.

    The paper's line-based rules (bullet/ellipsis line fractions) are
    omitted: the synthetic corpus is single-line, so they would be
    vacuously true; the repetition rules live in
    ``repetition_stats_batch`` and compose upstream/downstream.
    """
    import pandas as pd

    texts = _chunked(batch[text_col])
    words = pc.split_pattern(pc.fill_null(texts, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_docs = len(words)
    lens = pc.list_value_length(words).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    flat = words.flatten()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)

    def per_doc(vals: np.ndarray) -> np.ndarray:
        out = np.zeros(n_docs, dtype=np.int64)
        np.add.at(out, doc_idx, vals.astype(np.int64))
        return out

    n_words = per_doc(nonempty)
    sum_len = per_doc(
        pc.utf8_length(flat).to_numpy(zero_copy_only=False) * nonempty
    )
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha = per_doc(alpha & nonempty)
    sym = pc.match_substring_regex(flat, r"#|\.\.\.").to_numpy(
        zero_copy_only=False
    )
    n_sym = per_doc(sym & nonempty)
    stop_mask = pc.is_in(
        flat, value_set=pa.array(list(STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    n_stop_distinct = np.zeros(n_docs, dtype=np.int64)
    if stop_mask.any():
        s = pd.DataFrame(
            {
                "d": doc_idx[stop_mask],
                "w": np.asarray(flat.to_pandas(), dtype=object)[stop_mask],
            }
        )
        nd = s.groupby("d", sort=False)["w"].nunique()
        n_stop_distinct[nd.index.to_numpy()] = nd.to_numpy(np.int64)

    wordcount_ok = (n_words >= min_words) & (n_words <= max_words)
    meanlen_ok = (min_mean_len * n_words <= sum_len) & (
        sum_len <= max_mean_len * n_words
    ) & (n_words > 0)
    alpha_ok = 5 * n_alpha >= 4 * n_words
    symbol_ok = 10 * n_sym <= n_words
    stop_ok = n_stop_distinct >= 2
    keep = wordcount_ok & meanlen_ok & alpha_ok & symbol_ok & stop_ok
    cols = {
        id_col: _chunked(batch[id_col]),
        "n_words": pa.array(n_words, type=pa.int64()),
    }
    for name, arr in [
        ("wordcount_ok", wordcount_ok), ("meanlen_ok", meanlen_ok),
        ("alpha_ok", alpha_ok), ("symbol_ok", symbol_ok),
        ("stop_ok", stop_ok), ("keep", keep),
    ]:
        cols[name] = pa.array(arr.astype(np.int64), type=pa.int64())
    return pa.table(cols)


def dsir_select(
    raw_ds,
    target_ds,
    n_select: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    ratio_scale: int = 1_000_000,
) -> pa.Table:
    """DSIR-style importance selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): fit hashed unigram
    bag-of-words LMs over the target and raw corpora, score every raw
    document by its importance log-ratio, keep the top ``n_select``.

    Distributed plan — two bounded exchanges and one streaming pass:

    1. each side reduces to (bucket, cnt) partials inside ``map_batches``
       (tokens -> ``rolling_hash64`` -> ``% num_buckets`` -> bincount) and
       one grouped sum; the driver folds a fixed ``num_buckets``-long
       vector per side (the fold is dimension-bounded, never corpus-sized);
    2. the per-bucket log-ratio ``round(scale*(ln p̂_t - ln p̂_r))`` with
       +1 smoothing quantizes ONCE on the driver to int64 fixed-point, so
       per-doc scores are order-free integer sums — bit-identical at any
       parallelism and in the SQL mirror (ratio rounding margins are
       measured in the oracle helper);
    3. one pass over the raw docs emits local top-``n_select`` partials
       (score DESC, id ASC); the driver merges ``n_select x n_blocks``
       rows. Temperature-0 selection — the paper's Gumbel resampling
       variant adds hash-salted noise to the same score; the greedy cut
       keeps the oracle exact and is what curation pipelines run at
       fixed token budgets.

    Documents with no non-empty tokens are dropped (no grams -> no score),
    matching the SQL mirror's inner per-doc aggregation.
    """
    from .relational import grouped_agg

    nb = np.uint64(num_buckets)

    def _bucket_partials(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(_chunked(t[text_col]), ""), " ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        cnt = np.bincount(
            (rolling_hash64(toks) % nb).astype(np.int64), minlength=num_buckets
        )
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, type=pa.int64()),
                "cnt": pa.array(cnt[nz], type=pa.int64()),
            }
        )

    def _model_vec(ds) -> np.ndarray:
        agg = grouped_agg(
            ds.map_batches(_bucket_partials, batch_format="pyarrow"),
            keys=["bucket"], sums={"cnt": "cnt"},
        )
        vec = np.zeros(num_buckets, dtype=np.int64)
        for bt in agg.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            vec[_chunked(bt["bucket"]).to_numpy()] = _chunked(bt["cnt"]).to_numpy()
        return vec

    ct = _model_vec(target_ds.select_columns([text_col]))
    cr = _model_vec(raw_ds.select_columns([text_col]))
    nt, nr = int(ct.sum()), int(cr.sum())
    ratio = np.round(
        ratio_scale
        * (np.log((ct + 1.0) / (nt + num_buckets))
           - np.log((cr + 1.0) / (nr + num_buckets)))
    ).astype(np.int64)

    def _score_part(t: pa.Table, _r=ratio) -> pa.Table:
        ids = _chunked(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(pc.fill_null(_chunked(t[text_col]), ""), " ")
        offs = np.asarray(lists.offsets)
        offs = offs - offs[0]  # sliced-array offsets align with list_flatten
        toks = pc.list_flatten(lists)
        vals = _r[(rolling_hash64(toks) % nb).astype(np.int64)]
        valid = pc.not_equal(toks, "").to_numpy(zero_copy_only=False)
        vals = np.where(valid, vals, 0)
        lens = offs[1:] - offs[:-1]
        nzdoc = lens > 0
        scores = np.zeros(len(ids), dtype=np.int64)
        nvalid = np.zeros(len(ids), dtype=np.int64)
        if nzdoc.any():
            starts = offs[:-1][nzdoc]
            scores[nzdoc] = np.add.reduceat(vals, starts)
            nvalid[nzdoc] = np.add.reduceat(valid.astype(np.int64), starts)
        keep = nvalid > 0
        ids, scores = ids[keep], scores[keep]
        loc = np.lexsort((ids, -scores))[:n_select]
        return pa.table(
            {
                id_col: pa.array(ids[loc], type=pa.int64()),
                "dsir_score": pa.array(scores[loc], type=pa.int64()),
            }
        )

    empty = pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "dsir_score": pa.array([], type=pa.int64())}
    )
    parts = pa.concat_tables(
        [empty]  # zero-batch guard: an all-blank corpus yields no partials
        + list(
            raw_ds.select_columns([id_col, text_col])
            .map_batches(_score_part, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        )
    )
    ids = _chunked(parts[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
    scores = _chunked(parts["dsir_score"]).to_numpy()
    top = np.lexsort((ids, -scores))[:n_select]
    return pa.table(
        {
            id_col: pa.array(ids[top], type=pa.int64()),
            "dsir_score": pa.array(scores[top], type=pa.int64()),
        }
    )


def hashed_normal_equations(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
):
    """Exact training statistics for a linear probe over hashed features:
    the normal-equation sums X^T X (upper triangle, bias = component 0,
    hashed features at 1..k) and X^T y (emitted as j = -1 rows), with
    y = the document's token count. All int64 — every entry mirrors in
    SQL — and every partial is mergeable, so the exchange is one
    (i, j)-keyed grouped sum of O(k^2) rows per block regardless of
    corpus size; the k+1 x k+1 solve itself is a driver no-op.
    The distributed-training shape: map once over the corpus, reduce
    fixed-size sufficient statistics, fit centrally.
    """
    import pandas as pd

    from .relational import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        # Arrow front-end (tokenize + hash + per-doc component sums);
        # the X^T X self-merge below stays pandas — it needs the
        # suffixed self-join pandas expresses directly
        ids_a, flat = _explode_terms(t, text_col, id_col)
        fp = rolling_hash64(flat)
        ex_ids = (
            ids_a.combine_chunks()
            if isinstance(ids_a, pa.ChunkedArray) else ids_a
        ).to_numpy(zero_copy_only=False)
        feats = pd.DataFrame(
            {
                id_col: ex_ids,
                "idx": (fp % np.uint64(k)).astype(np.int64) + 1,
                "val": np.where(
                    (fp // np.uint64(k)) % np.uint64(2) == 0, 1, -1
                ).astype(np.int64),
            }
        ).groupby([id_col, "idx"], as_index=False)["val"].sum()
        feats = feats[feats["val"] != 0]
        doc_ids = _chunked(t[id_col]).to_numpy(zero_copy_only=False)
        bias = pd.DataFrame({id_col: doc_ids, "idx": 0, "val": 1})
        fb = pd.concat([feats, bias], ignore_index=True)
        y = (
            pd.DataFrame({id_col: ex_ids})
            .groupby(id_col, as_index=False).size()
            .rename(columns={"size": "y"})
        )
        y = pd.DataFrame({id_col: doc_ids}).merge(
            y, on=id_col, how="left"
        ).fillna({"y": 0})
        # X^T X upper triangle via a per-doc self-merge (docs are complete
        # within a batch, so no doc-keyed shuffle is ever needed)
        m = fb.merge(fb, on=id_col, suffixes=("_a", "_b"))
        m = m[m["idx_b"] >= m["idx_a"]]
        xtx = (
            m.assign(s=m["val_a"].to_numpy(np.int64) * m["val_b"].to_numpy(np.int64))
            .groupby(["idx_a", "idx_b"], as_index=False)["s"].sum()
            .rename(columns={"idx_a": "i", "idx_b": "j"})
        )
        my = fb.merge(y, on=id_col)
        xty = (
            my.assign(s=my["val"].to_numpy(np.int64) * my["y"].to_numpy(np.int64))
            .groupby("idx", as_index=False)["s"].sum()
            .rename(columns={"idx": "i"})
        )
        xty["j"] = -1
        out = pd.concat([xtx, xty[["i", "j", "s"]]], ignore_index=True)
        return pa.Table.from_pandas(out[["i", "j", "s"]], preserve_index=False)

    return grouped_agg(
        ds.map_batches(part, batch_format="pyarrow"), keys=["i", "j"], sums={"s": "s"}
    )


def bm25_retrieval(
    ds,
    query_terms: "dict[int, list[str]]",
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Query -> document LEXICAL retrieval with ``bm25_keywords``' exact-
    integer BM25 kernel: a document's score for a query is the sum of its
    per-term ``score_ppk`` over the query's terms, so every score is an
    int64 and the ranking is reproducible bit-for-bit in SQL.

    One combined stats pass (per-term df restricted to the query
    vocabulary + (N, T) scalars — the driver fold is |vocab|+2 rows, a
    constant), then a shuffle-free scoring pass: tf and dl are complete
    within a batch because docs are rows; each batch emits only its local
    top-``k`` per query, and the driver merges ``n_blocks x |queries| x k``
    partial rows — bounded, never corpus-sized. Returns a small pandas
    DataFrame (query_id, doc_id, score, rank) with rank 1..k per query,
    ties broken by doc_id.
    """
    import pandas as pd

    vocab = sorted({t for ts in query_terms.values() for t in ts})
    vset = frozenset(vocab)

    def _tok(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.assign(term=df[text_col].str.split(" ")).explode("term")[[id_col, "term"]]
        return ex[ex["term"].notna() & (ex["term"] != "")]

    def stats_part(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tok(df)
        hits = toks[toks["term"].isin(vset)].drop_duplicates()
        d = hits.groupby("term", as_index=False).size().rename(columns={"size": "n"})
        d = pd.concat(
            [d, pd.DataFrame({"term": ["\x00n_docs", "\x00total"],
                              "n": [len(df), len(toks)]})],
            ignore_index=True,
        )
        return d

    folded: dict = {}
    for b in ds.map_batches(stats_part, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=1 << 16
    ):
        for t, n in zip(b["term"], b["n"]):
            folded[t] = folded.get(t, 0) + int(n)
    n_docs = folded.pop("\x00n_docs", 0)
    total = folded.pop("\x00total", 0)
    df_map = {t: folded.get(t, 0) for t in vocab}

    # (query_id, term) expansion as a small frame each task joins against
    q_expand = pd.DataFrame(
        [(q, t) for q, ts in sorted(query_terms.items()) for t in ts],
        columns=["query_id", "term"],
    )

    def score(df: pd.DataFrame, _df=df_map, _n=n_docs, _t=total) -> pd.DataFrame:
        toks = _tok(df)
        dl = toks.groupby(id_col, as_index=False).size().rename(columns={"size": "dl"})
        toks = toks[toks["term"].isin(vset)]
        if len(toks) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 id_col: pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="int64")}
            )
        tf = toks.groupby([id_col, "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        m = tf.merge(dl, on=id_col)
        tfv = m["tf"].to_numpy(dtype="int64")
        dlv = m["dl"].to_numpy(dtype="int64")
        dfv = m["term"].map(_df).to_numpy(dtype="int64")
        idf_num = 2 * _n - 2 * dfv + 1
        idf_den = 2 * dfv + 1
        num = 1000 * (22 * tfv * _t) * idf_num
        den = ((10 * tfv + 3) * _t + 9 * dlv * _n) * idf_den
        m["score_ppk"] = num // den
        qd = m.merge(q_expand, on="term")
        sc = qd.groupby(["query_id", id_col], as_index=False)["score_ppk"].sum()
        sc = sc.rename(columns={"score_ppk": "score"})
        sc = sc.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True],
            kind="mergesort",
        )
        top = sc.groupby("query_id", sort=False).head(k)
        return top.astype({"query_id": "int64", id_col: "int64", "score": "int64"})

    parts = ds.map_batches(score, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("query_id", id_col, "score", "rank")}
        )
    parts = parts.sort_values(
        ["query_id", "score", id_col], ascending=[True, False, True], kind="mergesort"
    )
    out = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", id_col, "score", "rank"]].astype("int64")
