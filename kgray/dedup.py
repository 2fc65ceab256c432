"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle discipline: every variant pre-reduces inside ``map_batches``
(within-batch keep-first / per-doc signatures) before its single
``groupby`` exchange, so the all-to-all moves one row per key/bucket per
block — not one per input row. Hash seeds are fixed constants: results are
deterministic across runs, block layouts and cluster sizes.

Verify discipline (the near-dup family): candidate pairs are generated
from LSH buckets WITHOUT payloads (texts/vectors never ride the band
shuffle), deduped across bands, and only then joined back against the
payload table via the size-routed ``attach_pair_payload`` — a broadcast
dict under ``broadcast_limit`` rows, two endpoint-keyed hash joins beyond
it. No whole-corpus object ever lands on the driver, at any scale. All
verifies are vectorized (hashed-gram Jaccard / xor+popcount Hamming /
row-wise cosine); hot buckets are capped at ``max_bucket`` with every
affected pair flagged ``truncated`` — cut, but never silently.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from .util import join_partitions, stateful_task_batches

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1
_RNG_SEED = 24601  # fixed engine seed — deterministic across runs/workers

_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _stable_hash64(s: str) -> int:
    """FNV-1a — Python's builtin hash() is per-process randomized and must
    never be used for cross-worker dedup keys."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group first)
# ---------------------------------------------------------------------------

def _sortable_key(df: pd.DataFrame, order_cols: list[str]) -> pd.Series:
    """Fixed-width encoding of ``order_cols`` whose lexicographic order
    equals the numeric row order (ints offset to unsigned hex; floats via
    the IEEE-754 monotone bit trick; strings passed through)."""
    parts = []
    for c in order_cols:
        v = df[c]
        if pd.api.types.is_integer_dtype(v):
            # two's-complement sign-bit flip: unsigned order == signed order
            enc = v.to_numpy().astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
            parts.append(pd.Series([format(x, "016x") for x in enc], index=df.index))
        elif pd.api.types.is_float_dtype(v):
            bits = v.to_numpy().astype(np.float64).view(np.uint64)
            flip = np.where(bits >> 63 == 1, ~bits, bits | (1 << 63)).astype(np.uint64)
            parts.append(pd.Series([format(x, "016x") for x in flip], index=df.index))
        else:
            parts.append(v.astype(str))
    out = parts[0]
    for p in parts[1:]:
        out = out + "\x1f" + p
    return out


def exact_dedup(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: "str | list[str]",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep, per distinct ``key_cols``, the lexicographically smallest row
    by ``order_cols`` (deterministic representative — no arrival-order
    dependence; pass enough columns to break ties).

    Hash-partition + per-group first, with every per-group step vectorized:
    a within-batch pandas combiner, then ONE shuffle keyed on a coarse hash
    bucket of the keys, then a per-bucket pandas sort+drop_duplicates (Ray's
    native per-group paths cost Python time per key — ruinous at millions
    of keys; see ``relational.hash_bucketed_groupby``)."""
    from .relational import hash_bucketed_groupby

    if isinstance(order_cols, str):
        order_cols = [order_cols]

    def batch_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, kind="mergesort").drop_duplicates(
            subset=key_cols, keep="first"
        )

    combined = ds.map_batches(batch_first, batch_format="pandas")
    return hash_bucketed_groupby(combined, key_cols, batch_first, num_buckets)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _word_hashes(texts_col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a string column and hash every word (flat word
    hash array + per-row word counts). Tokenization is an Arrow C kernel;
    word hashing is pandas' siphash (fixed key -> stable across workers)."""
    import pandas as pd

    # Match Python's str.split(): Arrow's split keeps leading/trailing empty
    # tokens and maps '' -> [''] — trim first and route empty/null texts
    # through null so they produce ZERO tokens
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(texts_col, ""))
    filled = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(None, pa.string()), trimmed
    )
    toks = pc.utf8_split_whitespace(filled)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = toks.flatten()
    hashes = pd.util.hash_array(flat.to_numpy(zero_copy_only=False)).astype(np.uint64)
    return hashes, lengths


def _char_hashes(texts_col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Per-BYTE values + per-row byte counts for char-gram similarity
    (zero-copy off the Arrow string buffer — rows are contiguous, so the
    flat byte stream between the first and last offsets IS the row
    concatenation). Callers should pre-normalize to lowercase ASCII so
    byte grams equal character grams."""
    arr = pc.cast(pc.fill_null(texts_col, ""), pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lengths = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1]
    data_buf = arr.buffers()[2]
    if data_buf is None or int(lengths.sum()) == 0:
        return np.zeros(0, dtype=np.uint64), lengths
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data[offsets[0] : offsets[-1]].astype(np.uint64), lengths


def _gram_hashes(
    word_h: np.ndarray, lengths: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-gram hashes per row, fully vectorized.

    Gram hash = sum_j C_j * word_hash[i+j] (uint64 wraparound) over shifted
    slices. Rows shorter than ``k`` contribute ONE gram combining all their
    words (mirrors the short-text fallback of the scalar implementation);
    empty rows contribute none. Duplicate grams are kept — min() is
    idempotent so MinHash is unaffected.

    Returns (flat gram hashes, grams per row).
    """
    n_rows = len(lengths)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    n_grams = np.maximum(lengths - k + 1, np.minimum(lengths, 1))
    total = int(n_grams.sum())
    out = np.zeros(total, dtype=np.uint64)

    coef = (np.uint64(_FNV_PRIME) ** np.arange(1, k + 1, dtype=np.uint64))
    g_ends = np.cumsum(n_grams)
    g_starts = g_ends - n_grams
    # long rows (>= k words): shifted-slice combine
    long = lengths >= k
    if long.any():
        m = n_grams[long]
        # 0..m_i-1 within each long row, flat (no per-row Python arange)
        tot = int(m.sum())
        intra = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
        first = np.repeat(starts[long], m) + intra   # gram's first word pos
        acc = np.zeros(tot, dtype=np.uint64)
        for j in range(k):
            acc += coef[j] * word_h[first + j]
        out[np.repeat(g_starts[long], m) + intra] = acc
    # short rows (1..k-1 words): one gram folding all words
    short = (lengths > 0) & (lengths < k)
    if short.any():
        for ri in np.nonzero(short)[0]:
            ws = word_h[starts[ri] : ends[ri]]
            out[g_starts[ri]] = (coef[: len(ws)] * ws).sum(dtype=np.uint64)
    return out, n_grams


class MinHasher:
    """Actor stage: word-shingle MinHash signatures + LSH band keys.

    Emits ``n_bands`` rows per document: (doc key, band_id, band_hash).
    Fully vectorized over the batch: Arrow tokenization, rolling-hash
    shingles, one (num_perm x n_grams) permutation matrix with per-row
    ``minimum.reduceat``, vectorized band folding. Fixed seeds ->
    deterministic across runs, workers and block layouts.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 64,
        n_bands: int = 16,
        shingle_k: int = 3,
    ):
        assert num_perm % n_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.n_bands, self.shingle_k = num_perm, n_bands, shingle_k
        rng = np.random.RandomState(_RNG_SEED)
        self._a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self._b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def signatures(self, texts_col: pa.Array) -> np.ndarray:
        """(n_rows, num_perm) uint64 signature matrix; empty rows -> zeros."""
        word_h, lengths = _word_hashes(texts_col)
        grams, n_grams = _gram_hashes(word_h, lengths, self.shingle_k)
        n_rows = len(lengths)
        sigs = np.zeros((n_rows, self.num_perm), dtype=np.uint64)
        if len(grams) == 0:
            return sigs
        grams = grams & np.uint64(0x7FFFFFFFFFFFFFFF)
        # (num_perm, n_grams) permuted hashes; uint64 wraparound then mod
        hashed = (self._a[:, None] * grams[None, :] + self._b[:, None]) % np.uint64(_MERSENNE)
        g_ends = np.cumsum(n_grams)
        g_starts = (g_ends - n_grams)
        nz = n_grams > 0
        mins = np.minimum.reduceat(hashed, g_starts[nz].astype(np.int64), axis=1)
        # reduceat segments end at the next start, so each segment == one row
        sigs[nz] = mins.T
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        sigs = self.signatures(texts)
        n = len(ids)
        r = self.num_perm // self.n_bands
        bands = sigs.reshape(n, self.n_bands, r)
        # vectorized FNV-style fold across the r values of every band
        h = np.full((n, self.n_bands), _FNV_OFFSET, dtype=np.uint64)
        for j in range(r):
            h = (h ^ bands[:, :, j]) * np.uint64(_FNV_PRIME)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.n_bands))
        return pa.table(
            {
                "doc_id": ids.take(idx),
                "band_id": pa.array(
                    np.tile(np.arange(self.n_bands, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(h.reshape(-1), type=pa.uint64()),
            }
        )


def _jaccard(a: str, b: str, k: int) -> float:
    """Scalar reference implementation (tests / oracles only — the engine
    path is the vectorized ``pair_jaccard``)."""
    def grams(t):
        w = t.split()
        if len(w) < k:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    ga, gb = grams(a or ""), grams(b or "")
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)


def pair_jaccard(text_a: pa.Array, text_b: pa.Array, k: int) -> np.ndarray:
    """Row-wise exact word-``k``-gram Jaccard for aligned text columns,
    fully vectorized over hashed grams (64-bit rolling hashes; a collision
    would need two distinct grams sharing a 64-bit hash — negligible).

    Matches ``_jaccard`` semantics: rows shorter than ``k`` words contribute
    one combined gram; two empty texts are similarity 1.0.
    """
    def row_gram_sets(col):
        word_h, lengths = _word_hashes(_chunked(col))
        grams, n_grams = _gram_hashes(word_h, lengths, k)
        rows = np.repeat(np.arange(len(n_grams), dtype=np.int64), n_grams)
        order = np.lexsort((grams, rows))
        r, g = rows[order], grams[order]
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
        return r[keep], g[keep], len(n_grams)

    ra, ga, n = row_gram_sets(text_a)
    rb, gb, _ = row_gram_sets(text_b)
    ca = np.bincount(ra, minlength=n)
    cb = np.bincount(rb, minlength=n)
    rr = np.concatenate([ra, rb])
    gg = np.concatenate([ga, gb])
    order = np.lexsort((gg, rr))
    rr, gg = rr[order], gg[order]
    dup = (rr[1:] == rr[:-1]) & (gg[1:] == gg[:-1])
    inter = np.bincount(rr[1:][dup], minlength=n)
    denom = ca + cb - inter
    out = np.ones(n, dtype=np.float64)  # both-empty rows -> 1.0
    nz = denom > 0
    out[nz] = inter[nz] / denom[nz]
    return out


def pairs_from_buckets(
    df: pd.DataFrame,
    bucket_cols: list[str],
    id_col: str,
    out_cols: tuple[str, str],
    max_bucket: int,
) -> pd.DataFrame:
    """All within-bucket candidate pairs (a < b) for every bucket in ``df``.

    Buckets beyond ``max_bucket`` ids are capped (hot-bucket guard for
    degenerate corpora) — never silently: every pair from an oversized
    bucket carries ``truncated=True`` so downstream consumers can see that
    recall was cut there. Pair emission is vectorized (``triu_indices``)
    per bucket; the loop is only over non-singleton buckets.
    """
    a_parts, b_parts, t_parts = [], [], []
    for _, grp in df.groupby(bucket_cols, sort=False):
        if len(grp) < 2:
            continue
        ids = np.sort(grp[id_col].to_numpy())
        big = len(ids) > max_bucket
        ids = ids[:max_bucket]
        ii, jj = np.triu_indices(len(ids), k=1)
        a_parts.append(ids[ii])
        b_parts.append(ids[jj])
        t_parts.append(np.full(len(ii), big))
    if not a_parts:
        dt = df[id_col].dtype if len(df) else object
        return pd.DataFrame(
            {
                out_cols[0]: pd.Series([], dtype=dt),
                out_cols[1]: pd.Series([], dtype=dt),
                "truncated": pd.Series([], dtype=bool),
            }
        )
    return pd.DataFrame(
        {
            out_cols[0]: np.concatenate(a_parts),
            out_cols[1]: np.concatenate(b_parts),
            "truncated": np.concatenate(t_parts),
        }
    )


def attach_pair_payload(
    pairs: ray.data.Dataset,
    payload: ray.data.Dataset,
    pair_cols: tuple[str, str],
    key_col: str,
    value_cols: tuple[str, ...],
    broadcast_limit: int = 100_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Attach per-id payload columns (text, embedding, counts, ...) to BOTH
    endpoints of a candidate-pair stream — the verify-stage join.

    Size-routed like ``relational._marker_join``: payloads up to
    ``broadcast_limit`` rows ship once via ``ray.put`` and resolve with a
    dictionary-encoded lookup (no shuffle of the pair stream); larger
    payloads go through two hash joins keyed on the pair endpoints, so no
    whole-corpus object ever lands on the driver. Output columns:
    ``{value}_a`` / ``{value}_b``.
    """
    import ray as _ray

    # materialize once: the routing count, the broadcast scan and BOTH join
    # probes otherwise each re-execute the payload pipeline from scratch
    payload = payload.select_columns([key_col, *value_cols]).materialize()
    n = payload.count()
    if n <= broadcast_limit:
        idx: dict = {}
        types = {}
        for b in payload.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            for vc in value_cols:
                types[vc] = b.schema.field(vc).type
            keys = b[key_col].to_pylist()
            vals = [b[vc].to_pylist() for vc in value_cols]
            for i, kk in enumerate(keys):
                idx[kk] = tuple(v[i] for v in vals)
        idx_ref = _ray.put(idx)
        types_ref = types

        def resolve(t: pa.Table, _ref=idx_ref, _types=types_ref) -> pa.Table:
            lookup = _ray.get(_ref)
            for side, col in zip(("_a", "_b"), pair_cols):
                enc = pc.dictionary_encode(_chunked(t[col]))
                hits = [lookup.get(v) for v in enc.dictionary.to_pylist()]
                for vi, vc in enumerate(value_cols):
                    mapped = pa.array(
                        [h[vi] if h is not None else None for h in hits],
                        type=_types[vc],
                    )
                    t = t.append_column(f"{vc}{side}", mapped.take(enc.indices))
            return t

        return pairs.map_batches(resolve, batch_format="pyarrow")

    # join path: two endpoint-keyed hash joins, payload renamed per side
    out = pairs
    for side, col in zip(("_a", "_b"), pair_cols):
        out = out.join(
            payload, join_type="left_outer",
            num_partitions=join_partitions(num_partitions),
            on=(col,), right_on=(key_col,),
        )
        out = out.map_batches(
            lambda t, s=side: t.rename_columns(
                [f"{c}{s}" if c in value_cols else c for c in t.column_names]
            ).drop_columns([x for x in (key_col,) if x in t.column_names]),
            batch_format="pyarrow",
        )
    return out


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 200,
    broadcast_limit: int = 100_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Near-dup pairs: LSH band-bucket candidate generation + exact Jaccard
    verify. Returns (doc_a, doc_b, jaccard, truncated) with doc_a < doc_b,
    deduplicated; ``truncated`` marks pairs from a capped hot bucket.

    Scale plan: candidate pairs are generated from (band, hash) buckets
    WITHOUT text (the shuffle moves 16 small rows per doc), deduped across
    bands, and only then joined back against the (id, text) table via
    ``attach_pair_payload`` — broadcast under ``broadcast_limit`` docs,
    two hash joins beyond it. No whole-corpus driver dict at any size.
    The verify is the vectorized hashed-gram ``pair_jaccard`` — zero
    per-pair Python.
    """
    from .relational import hash_bucketed_groupby

    # light state (two 64-entry coefficient arrays): cached tasks, not an
    # actor pool — see util.stateful_task_batches
    bands = stateful_task_batches(
        docs, MinHasher,
        dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm,
            n_bands=n_bands, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
    )

    candidates = hash_bucketed_groupby(
        bands, ["band_id", "band_hash"],
        lambda df: pairs_from_buckets(
            df, ["band_id", "band_hash"], "doc_id", ("doc_a", "doc_b"), max_bucket
        ),
    )
    # same pair can surface from several bands -> dedup BEFORE the payload
    # join ('False' sorts first, so a pair seen in any clean bucket is kept
    # untruncated)
    candidates = exact_dedup(candidates, ["doc_a", "doc_b"], ["truncated"])

    paired = attach_pair_payload(
        candidates, docs, ("doc_a", "doc_b"), id_col, (text_col,),
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_a": t["doc_a"], "doc_b": t["doc_b"],
                    "jaccard": pa.array([], type=pa.float64()),
                    "truncated": t["truncated"],
                }
            )
        sims = pair_jaccard(t[f"{text_col}_a"], t[f"{text_col}_b"], shingle_k)
        keep = sims >= threshold
        return pa.table(
            {
                "doc_a": _chunked(t["doc_a"]).filter(pa.array(keep)),
                "doc_b": _chunked(t["doc_b"]).filter(pa.array(keep)),
                "jaccard": pa.array(np.round(sims[keep], 6), type=pa.float64()),
                "truncated": _chunked(t["truncated"]).filter(pa.array(keep)),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (inverted-index, no approximation)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    max_df: int = 1000,
    broadcast_limit: int = 500_000,
    num_partitions: int = 32,
    stats: dict | None = None,
    gram_mode: str = "word",
) -> ray.data.Dataset:
    """EXACT word-``k``-gram Jaccard pairs >= ``threshold`` via a distributed
    inverted-index join (gram -> posting list -> co-occurrence counts) — no
    LSH approximation, so it is oracle-checkable against SQL (the oracle
    applies the identical ``max_df`` cut).

    ``max_df``: grams appearing in more than this many documents are dropped
    from the similarity computation in BOTH the numerator and denominator
    (the standard stop-gram cut for set-similarity joins — a gram shared by
    half the corpus generates O(df^2) candidate pairs and carries no
    signal). Never silent: when a finite ``max_df`` is set, the number of
    distinct dropped grams is logged and reported via ``stats``
    (``{'dropped_grams': n}``) if a dict is passed.

    ``gram_mode='char'`` grams over BYTES instead of words (pre-normalize
    to lowercase ASCII so bytes == characters) — the entity-resolution
    name-similarity configuration (``link.fuzzy_name_pairs``).

    Shuffle plan: ONE gram-keyed exchange of (doc, gram) rows whose
    per-bucket pass emits all three reductions as a tagged union (pair
    co-counts, per-doc retained-gram counts, over-``max_df`` drop audit) —
    the gram stream, the widest dataset in the plan, is shuffled exactly
    once. A pair-keyed sum follows, then the per-doc counts — a Dataset,
    never a driver dict — are attached back onto the pair stream via the
    size-routed ``attach_pair_payload`` (broadcast small, hash-join large).
    """
    from .relational import hash_bucketed_groupby

    if gram_mode not in ("word", "char"):
        raise ValueError(f"unknown gram_mode {gram_mode!r}")

    def to_grams(batch: pa.Table) -> pa.Table:
        # vectorized: rolling-hash k-grams (same equality structure as the
        # string grams — two docs share a hashed gram iff they share the
        # word k-gram, modulo a 2^-64 collision), deduped per row to SET
        # semantics; the shuffle then moves uint64s instead of strings
        if gram_mode == "char":
            unit_h, lengths = _char_hashes(_chunked(batch[text_col]))
        else:
            unit_h, lengths = _word_hashes(_chunked(batch[text_col]))
        grams, n_grams = _gram_hashes(unit_h, lengths, k)
        rows = np.repeat(np.arange(len(n_grams), dtype=np.int64), n_grams)
        order = np.lexsort((grams, rows))
        r, g = rows[order], grams[order]
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
        ids = _chunked(batch[id_col]).take(pa.array(r[keep]))
        return pa.table(
            {"doc_id": ids, "gram": pa.array(g[keep].view(np.int64), type=pa.int64())}
        )

    grams_ds = docs.map_batches(to_grams, batch_format="pyarrow")

    def fused_gram_pass(df: pd.DataFrame) -> pd.DataFrame:
        # one pass per bucket emits a tagged union: kind 0 = candidate-pair
        # partial (a,b = doc pair, n = co-count), kind 1 = per-doc
        # retained-gram count (a = doc, n = count), kind 2 = distinct
        # over-max_df grams dropped in this bucket (audit; a gram hashes to
        # exactly one bucket, so per-bucket distincts sum to the global
        # figure). The postings self-merge materializes sum(df^2) candidate
        # rows per bucket — max_df is the guard against degenerate grams;
        # all C kernels (a per-gram Python pair loop measured ~8x slower).
        sizes = df.groupby("gram", sort=False)["doc_id"].transform("size")
        within = sizes <= max_df
        kept = df[within & (sizes >= 2)]
        m = kept.merge(kept, on="gram")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        pairs_p = m.groupby(["doc_id_x", "doc_id_y"], sort=False, as_index=False).size()
        counts_p = (
            df[within].groupby("doc_id", sort=False, as_index=False).agg(n=("gram", "size"))
        )
        parts = [
            pd.DataFrame(
                {"kind": 0, "a": pairs_p["doc_id_x"], "b": pairs_p["doc_id_y"],
                 "n": pairs_p["size"]}
            ),
            # b = a keeps the column's dtype stable (b is ignored for kind 1)
            pd.DataFrame(
                {"kind": 1, "a": counts_p["doc_id"], "b": counts_p["doc_id"],
                 "n": counts_p["n"]}
            ),
        ]
        if max_df < (1 << 30):
            n_drop = int(df.loc[~within, "gram"].nunique())
            if n_drop:
                parts.append(
                    pd.DataFrame(
                        {"kind": [2], "a": df["doc_id"].iloc[:1].reset_index(drop=True),
                         "b": df["doc_id"].iloc[:1].reset_index(drop=True),
                         "n": [n_drop]}
                    )
                )
        out = pd.concat(parts, ignore_index=True)
        out["kind"] = out["kind"].astype("int8")
        out["n"] = out["n"].astype("int64")
        return out

    # partial-sized (pairs + vocab + audit rows), pinned once for 3 readers
    fused = hash_bucketed_groupby(grams_ds, ["gram"], fused_gram_pass).materialize()

    def _split(kind_val: int, names: list[str], cols: list[str]):
        def take(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(_chunked(t["kind"]), kind_val))
            return pa.table({nm: f[c] for nm, c in zip(names, cols)})

        return fused.map_batches(take, batch_format="pyarrow")

    pair_partials = _split(0, ["doc_a", "doc_b", "n_inter"], ["a", "b", "n"])
    count_partials = _split(1, ["doc_id", "n"], ["a", "n"])

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], sort=False, as_index=False).agg(
            n_inter=("n_inter", "sum")
        )

    pairs = hash_bucketed_groupby(pair_partials, ["doc_a", "doc_b"], sum_pairs)

    # per-doc retained-gram counts: a DATASET (one row per doc after the
    # bucketed re-sum), attached to the pair stream by the size-routed join
    doc_counts = hash_bucketed_groupby(
        count_partials, ["doc_id"],
        lambda df: df.groupby("doc_id", sort=False, as_index=False).agg(n=("n", "sum")),
        num_buckets=16,
    )

    if max_df < (1 << 30):
        # dropped-gram accounting (J2 discipline: cut, but never silently)
        import logging

        dropped = int(_split(2, ["n"], ["n"]).sum("n") or 0)
        if dropped:
            logging.getLogger(__name__).info(
                "ngram_jaccard_pairs: %d distinct grams over max_df=%d dropped "
                "from numerator and denominator", dropped, max_df,
            )
        if stats is not None:
            stats["dropped_grams"] = dropped

    paired = attach_pair_payload(
        pairs, doc_counts, ("doc_a", "doc_b"), "doc_id", ("n",),
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["n_a"].astype("int64")
        cb = df["n_b"].astype("int64")
        n = df["n_inter"].astype("int64")
        denom = ca + cb - n
        keep = (n * 1.0 / denom) >= threshold
        out = pd.DataFrame(
            {
                "doc_a": df["doc_a"],
                "doc_b": df["doc_b"],
                # exact integer ppm (floor) — FP-free cross-engine compare
                "jaccard_ppm": (1_000_000 * n) // denom,
            }
        )
        return out[keep.to_numpy()]

    return paired.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def _word_hashes_poly(texts_col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Like ``_word_hashes`` but hashing each token with the byte-
    polynomial ``rolling_hash64`` instead of pandas' siphash — the
    deterministic SQL-mirrorable family (same one the ``fingerprints``
    oracle replicates with HUGEINT arithmetic), which is what lets
    ``simhash_pairs`` be value-hash-checked end to end."""
    from .textops import rolling_hash64

    trimmed = pc.utf8_trim_whitespace(pc.fill_null(texts_col, ""))
    filled = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(None, pa.string()), trimmed
    )
    toks = pc.utf8_split_whitespace(filled)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = toks.flatten()
    return rolling_hash64(flat).astype(np.uint64), lengths


class SimHasher:
    """Actor stage: 64-bit SimHash over byte-polynomial word hashes +
    16-bit chunk keys (4 chunks; near-dups within Hamming distance <= 3
    share >= 1 chunk by pigeonhole — recall 1 at the default threshold).
    Vectorized: Arrow tokenization + per-bit ``add.reduceat`` row sums.
    The word hash is the SQL-mirrorable polynomial (``rolling_hash64``),
    so the emitted pair set is value-hash-checked against a DuckDB
    mirror that recomputes the simhashes exactly."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash_column(texts_col: pa.Array) -> np.ndarray:
        """(n_rows,) uint64 simhash; empty rows hash to 0."""
        word_h, lengths = _word_hashes_poly(texts_col)
        n = len(lengths)
        ends = np.cumsum(lengths)
        starts = (ends - lengths).astype(np.int64)
        nz = lengths > 0
        out = np.zeros(n, dtype=np.uint64)
        if not nz.any():
            return out
        acc = np.zeros((n, 64), dtype=np.int64)
        for b in range(64):
            bits = ((word_h >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
            acc[nz, b] = np.add.reduceat(bits, starts[nz])
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        out[nz] = ((acc[nz] > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h = self.simhash_column(texts)
        n = len(h)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        rep = np.repeat(h, 4)
        chunk_ids = np.tile(np.arange(4, dtype=np.int64), n)
        chunks = (rep >> (16 * chunk_ids).astype(np.uint64)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": ids.take(idx),
                "chunk_id": pa.array(chunk_ids.astype(np.int32), type=pa.int32()),
                "chunk": pa.array(chunks.astype(np.int64), type=pa.int64()),
                "simhash": pa.array(rep, type=pa.uint64()),
            }
        )


def simhash_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash chunk blocking + Hamming verify."""
    chunks = stateful_task_batches(
        docs, SimHasher, dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )

    from .relational import hash_bucketed_groupby

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within-bucket verify: pairwise XOR of the uint64
        # simhashes + table-free popcount via unpackbits — no per-pair Python
        a_parts, b_parts, d_parts = [], [], []
        for _, grp in df.groupby(["chunk_id", "chunk"], sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id").head(max_bucket)
            ids = grp["doc_id"].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.uint64)
            ii, jj = np.triu_indices(len(ids), k=1)
            x = hs[ii] ^ hs[jj]
            dist = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
            keep = dist <= max_hamming
            a_parts.append(ids[ii][keep])
            b_parts.append(ids[jj][keep])
            d_parts.append(dist[keep].astype(np.int64))
        if not a_parts:
            dt = df["doc_id"].dtype if len(df) else object
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=dt),
                    "doc_b": pd.Series([], dtype=dt),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(a_parts),
                "doc_b": np.concatenate(b_parts),
                "hamming": np.concatenate(d_parts),
            }
        )

    pairs = hash_bucketed_groupby(chunks, ["chunk_id", "chunk"], bucket_pairs)
    return exact_dedup(pairs, ["doc_a", "doc_b"], "hamming")


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (suffix-array semantics at fixed k)
# ---------------------------------------------------------------------------

def duplicate_spans(
    docs: ray.data.Dataset,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Span-level exact-substring dedup: for every document, the maximal
    word-index spans covered by ``k``-word windows that occur at least twice
    in the corpus (within- or cross-document) — the fixed-granularity form
    of suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): any duplicated substring of
    >= 2k-1 words is guaranteed to surface as a merged span, shorter ones
    down to k words surface when window-aligned.

    Returns (doc_id, start_word, end_word, n_windows) with 1-based inclusive
    word indexes; documents shorter than ``k`` words emit nothing.

    Plan (two keyed shuffles, both over bounded rows):
    1. one pass emits every window as (doc, pos, 64-bit rolling hash) — the
       window stream is word-count sized, like the n-gram stream;
    2. gram-keyed bucket pass keeps windows whose hash occurs >= 2 times
       (vectorized ``transform('size')`` per bucket — a gram lives in
       exactly one bucket, so the per-bucket count IS the corpus count);
    3. doc-keyed bucket pass merges surviving window positions into maximal
       spans (vectorized islands: break where the gap exceeds ``k``).
    Hash-for-string equivalence is the same 2^-64-collision tradeoff the
    n-gram Jaccard join documents.
    """
    from .relational import hash_bucketed_groupby

    def to_windows(batch: pa.Table) -> pa.Table:
        word_h, lengths = _word_hashes(_chunked(batch[text_col]))
        # windows only for rows with >= k words (no short-row folding here:
        # substring dedup has nothing to say about docs shorter than k)
        n_wins = np.maximum(lengths - k + 1, 0)
        grams, n_grams = _gram_hashes(word_h, lengths, k)
        # _gram_hashes folds short rows into one gram; mask those rows out
        rows = np.repeat(np.arange(len(lengths), dtype=np.int64), n_grams)
        starts = np.concatenate([[0], np.cumsum(n_grams)[:-1]])
        pos = np.arange(len(grams), dtype=np.int64) - starts[rows] + 1
        keep = n_wins[rows] > 0
        ids = _chunked(batch[id_col]).take(pa.array(rows[keep]))
        return pa.table(
            {
                "doc_id": ids,
                "pos": pa.array(pos[keep], type=pa.int64()),
                "gram": pa.array(grams[keep].view(np.int64), type=pa.int64()),
            }
        )

    windows = docs.map_batches(to_windows, batch_format="pyarrow")

    def keep_duplicated(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("gram", sort=False)["pos"].transform("size")
        return df.loc[sizes >= 2, ["doc_id", "pos"]]

    dup_wins = hash_bucketed_groupby(windows, ["gram"], keep_duplicated,
                                     num_buckets=num_buckets)

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        doc = df["doc_id"].to_numpy()
        pos = df["pos"].to_numpy()
        brk = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            same = doc[1:] == doc[:-1]
            brk[1:] = (~same | (pos[1:] - pos[:-1] > k)).astype(np.int64)
        df = df.assign(_g=np.cumsum(brk))
        out = df.groupby(["doc_id", "_g"], sort=False, as_index=False).agg(
            start_word=("pos", "min"), end_word=("pos", "max"),
            n_windows=("pos", "size"),
        )
        out["end_word"] = out["end_word"] + (k - 1)
        return out[["doc_id", "start_word", "end_word", "n_windows"]]

    return hash_bucketed_groupby(dup_wins, ["doc_id"], merge_spans,
                                 num_buckets=min(num_buckets, 16))


def excise_spans(
    docs: ray.data.Dataset,
    spans: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Rebuild each document's text with the given word spans removed —
    the apply step after ``duplicate_spans`` (policy stays with the caller:
    pass every span for aggressive both-copies removal, or pre-filter the
    span set — e.g. by ``dedup_clusters`` canonicity — for keep-one
    semantics a la Lee et al.).

    One doc-keyed exchange co-locates texts with their spans (docs and
    spans ride the same bucketed shuffle as a tagged union — no join
    operator spin-up); the per-doc excision is a numpy mask over the word
    positions, and only span-bearing docs enter the rebuild loop. Returns
    (doc_id, clean_text, n_removed_words) for EVERY input document.
    """
    from .relational import hash_bucketed_groupby

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[id_col],
                # null text -> "" so the doc/span discriminator (text
                # null-ness) never misroutes a document row
                "text": pc.fill_null(_chunked(t[text_col]), ""),
                "start_word": pa.nulls(t.num_rows, pa.int64()),
                "end_word": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_spans(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[id_col],
                "text": pa.nulls(t.num_rows, pa.string()),
                "start_word": pc.cast(_chunked(t["start_word"]), pa.int64()),
                "end_word": pc.cast(_chunked(t["end_word"]), pa.int64()),
            }
        )

    union = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        spans.map_batches(tag_spans, batch_format="pyarrow")
    )

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        is_doc = df["text"].notna()
        d = df[is_doc]
        s = df[~is_doc]
        by_doc: dict = {}
        for did, st, en in zip(
            s["doc_id"].to_numpy(), s["start_word"].to_numpy(), s["end_word"].to_numpy()
        ):
            by_doc.setdefault(did, []).append((int(st), int(en)))
        # clean docs (the vast majority at scale) pass through untouched —
        # only the span-bearing subset pays the per-doc rebuild
        hit = d["doc_id"].isin(by_doc).to_numpy()
        clean = d[~hit]
        cut = d[hit]
        out_text, out_removed = [], []
        for did, text in zip(cut["doc_id"].to_numpy(), cut["text"].to_numpy()):
            words = text.split()
            keep = np.ones(len(words), dtype=bool)
            for st, en in by_doc[did]:  # 1-based inclusive
                keep[st - 1 : en] = False
            out_text.append(" ".join(np.array(words, dtype=object)[keep]))
            out_removed.append(int((~keep).sum()))
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [clean["doc_id"].to_numpy(), cut["doc_id"].to_numpy()]
                ),
                "clean_text": np.concatenate(
                    [clean["text"].to_numpy(dtype=object),
                     np.asarray(out_text, dtype=object)]
                ),
                "n_removed_words": np.concatenate(
                    [np.zeros(len(clean), dtype=np.int64),
                     np.asarray(out_removed, dtype=np.int64)]
                ),
            }
        )

    return hash_bucketed_groupby(union, ["doc_id"], rebuild, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (BANDED random-hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------

def hashed_gaussian_planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic (dim x n_planes) standard-normal hyperplane matrix from
    a counter-mode hash: two 64-bit LCG steps on the flat plane index give
    two uniforms, Box-Muller turns them Gaussian. Statistically equivalent
    to an MT19937 draw for LSH directions (measured mean -5e-4 / std 1.0007
    over 16384 draws), but every component is a closed-form function of its
    own index — so the SQL oracle regenerates the planes with HUGEINT
    mod-2^64 arithmetic instead of embedding 16k float constants, and each
    component is stable under dim/band reconfiguration. Sign decisions only
    need the two arms to agree to ~1e-9 (measured min |dot| margin 2.9e-6
    on the fixtures), far coarser than the <=1-ulp libm LN/COS drift."""
    idx = np.arange(dim * n_planes, dtype=np.uint64)
    a = np.uint64(6364136223846793005)
    c = np.uint64(1442695040888963407)
    with np.errstate(over="ignore"):  # uint64 wrap IS the hash
        m1 = idx * a + c
        m2 = m1 * a + c
    u1 = (m1.astype(np.float64) + 0.5) / 2.0**64
    u2 = (m2.astype(np.float64) + 0.5) / 2.0**64
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return z.reshape(n_planes, dim).T


class SignBucketer:
    """Task stage (cached per worker): banded sign-LSH band keys per vector.

    The hyperplanes are regenerated deterministically in ``__init__`` — a
    (dim x n_bands*band_bits) draw is microseconds, so no broadcast object
    is needed and the per-worker instance cache keys purely on the scalar
    parameters. Plane p occupies band p // band_bits, bit p % band_bits."""

    def __init__(self, id_col: str, vec_col: str, n_bands: int,
                 band_bits: int, dim: int):
        self.id_col, self.vec_col = id_col, vec_col
        self.n_bands, self.band_bits = n_bands, band_bits
        self._planes = hashed_gaussian_planes(dim, n_bands * band_bits)
        self._weights = 1 << np.arange(band_bits, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .util import list_to_matrix

        n_bands = self.n_bands
        vecs = list_to_matrix(batch[self.vec_col], dtype=np.float64)
        n = len(vecs)
        signs = (vecs @ self._planes) > 0  # (n, n_bands*band_bits)
        bands = signs.reshape(n, n_bands, self.band_bits)
        hashes = bands @ self._weights  # (n, n_bands) int64 band keys
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
        return pa.table(
            {
                "vec_id": _chunked(batch[self.id_col]).take(idx),
                "band_id": pa.array(
                    np.tile(np.arange(n_bands, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(hashes.reshape(-1), type=pa.int64()),
            }
        )


def embedding_dedup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
    band_bits: int = 8,
    dim: int = 64,
    max_bucket: int = 500,
    broadcast_limit: int = 100_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Near-duplicate vector pairs by MULTI-BAND sign-LSH + exact cosine
    verify. Returns (vec_a, vec_b, cosine, truncated) with vec_a < vec_b.

    Banding gives the same OR-amplification as MinHash LSH: a pair is a
    candidate if its sign bits agree on ALL ``band_bits`` planes of ANY of
    the ``n_bands`` bands — recall 1-(1-p^r)^b for per-plane agreement
    p = 1 - theta/pi, instead of the recall cliff of one monolithic hash
    table. Tune ``band_bits`` down / ``n_bands`` up for lower thresholds.

    Scale plan mirrors ``minhash_lsh_pairs``: band keys shuffle WITHOUT the
    vectors (b small rows per vector) through the bucketed groupby;
    candidate pairs are deduped across bands and only then joined back
    against the (id, vector) table (size-routed broadcast/hash-join); the
    verify is one row-wise dot product per pair — no per-pair Python, no
    whole-corpus driver object, no sort-based groupby. Hot buckets are
    capped at ``max_bucket`` with the cut flagged per pair (never silent).
    """
    from .relational import hash_bucketed_groupby

    bands_ds = stateful_task_batches(
        embeddings, SignBucketer,
        dict(id_col=id_col, vec_col=vec_col, n_bands=n_bands,
             band_bits=band_bits, dim=dim),
        batch_format="pyarrow",
    )

    candidates = hash_bucketed_groupby(
        bands_ds, ["band_id", "band_hash"],
        lambda df: pairs_from_buckets(
            df, ["band_id", "band_hash"], "vec_id", ("vec_a", "vec_b"), max_bucket
        ),
    )
    candidates = exact_dedup(candidates, ["vec_a", "vec_b"], ["truncated"])

    # vectors ride the verify join as fixed-size binary: acero (Ray's hash
    # join kernel) rejects list<double> non-key fields, and the fixed-width
    # encode/decode is a zero-copy buffer view both ways
    def pack(t: pa.Table) -> pa.Table:
        from .util import list_to_matrix

        mat = list_to_matrix(t[vec_col], dtype="<f8")
        data = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
        packed = pa.Array.from_buffers(pa.binary(dim * 8), len(t), [None, data])
        return pa.table({id_col: _chunked(t[id_col]), "__vec": packed})

    payload = embeddings.map_batches(pack, batch_format="pyarrow")
    paired = attach_pair_payload(
        candidates, payload, ("vec_a", "vec_b"), id_col, ("__vec",),
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_a": t["vec_a"], "vec_b": t["vec_b"],
                    "cosine": pa.array([], type=pa.float64()),
                    "truncated": t["truncated"],
                }
            )

        def unit(col):
            arr = _chunked(col)
            buf = arr.buffers()[1]
            m = np.frombuffer(buf, dtype=np.float64)[
                arr.offset * dim : (arr.offset + len(arr)) * dim
            ].reshape(len(arr), dim)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return m / norms

        sims = np.einsum("ij,ij->i", unit(t["__vec_a"]), unit(t["__vec_b"]))
        keep = sims >= threshold
        return pa.table(
            {
                "vec_a": _chunked(t["vec_a"]).filter(pa.array(keep)),
                "vec_b": _chunked(t["vec_b"]).filter(pa.array(keep)),
                "cosine": pa.array(np.round(sims[keep], 6), type=pa.float64()),
                "truncated": _chunked(t["truncated"]).filter(pa.array(keep)),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-dedupe semantic dedup)
# ---------------------------------------------------------------------------

def semdedup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.4,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    offset: int = 16_000_000,
    num_buckets: int = 64,
    max_cluster: int = 65_536,
    on_oversize: str = "split",
    return_audit: bool = False,
):
    """SemDeDup (Abbas et al. 2023, "Semantic deduplication"): k-means-
    cluster the embedding space, compare pairs ONLY within a cluster —
    the all-pairs n^2 cosine scan becomes sum(n_c^2), the trick that makes
    semantic dedup tractable at corpus scale — then transitive components
    and a per-item survivor verdict. Returns (id, cluster_id,
    is_canonical) for every row, the same contract as ``dedup_clusters``.

    Deterministic end to end, so the SQL oracle re-runs the whole path:
    the coarse clustering is the shared exact-int64 Lloyd trainer
    (``similarity._kmeans_train_int`` — bit-stable at any parallelism),
    per-batch assignment is exact int-L2 with ties to the smaller cid,
    and within-cluster similarity is exact float cosine with the same
    >= threshold cut the green ``cosine_pairs`` oracle exercises.

    Scale plan: one training pass (k x d partials), one tag pass that
    ships (id, cluster, packed unit vector) through a cluster-keyed
    bucketed shuffle — vectors ride as fixed-size binary, and only
    same-cluster rows ever meet in a task.

    A cluster larger than ``max_cluster`` (the within-cluster matmul is
    that task's heap bound) DEGRADES instead of dying when
    ``on_oversize="split"`` (default): the oversized cluster is
    recursively bisected by deterministic sign-LSH hyperplanes
    (``hashed_gaussian_planes`` — order-free, parallelism-invariant)
    until every leaf fits, and pairs are emitted within leaves only —
    Abbas et al.'s own within-cluster restriction applied one level
    deeper, trading cross-leaf recall for a bounded task. Vectors no
    plane can separate (e.g. exact duplicates) fall to id-ordered
    chunks OVERLAPPED by one row, so runs of identical vectors still
    chain into one component. ``on_oversize="raise"`` restores the old
    loud failure. ``return_audit=True`` returns ``(dataset, audit)``
    where audit counts oversized clusters and their rows (driver-side,
    n_clusters-bounded). On real embedding corpora the dense cluster is
    often the interesting one — the audit says exactly where recall was
    traded."""
    from .graphalgo import dedup_clusters
    from .relational import hash_bucketed_groupby
    from .similarity import _int_sq_dists, _kmeans_train_int, _quantize_pack_ds
    from .util import list_to_matrix

    # one quantize-once read carries BOTH the int64 kmeans view and the
    # packed float unit vectors, so training, tagging and the cosine
    # verify all scan object-store blocks instead of re-reading parquet
    qds = _quantize_pack_ds(
        embeddings, id_col, vec_col, scale, offset, with_unit=True
    )
    cids, cents = _kmeans_train_int(qds, n_clusters, iters, id_col)
    dim = cents.shape[1]

    def tag(t: pa.Table) -> pa.Table:
        q = list_to_matrix(t["__q"], dtype=np.int64)
        cl = cids[np.argmin(_int_sq_dists(q, cents), axis=1)]
        return pa.table(
            {
                id_col: _chunked(t[id_col]),
                "kcluster": pa.array(cl, type=pa.int64()),
                "__vec": _chunked(t["__u"]),
            }
        )

    tagged = qds.map_batches(tag, batch_format="pyarrow")

    if on_oversize not in ("split", "raise"):
        raise ValueError("on_oversize must be 'split' or 'raise'")

    def _emit_exact(ids, m, a_p, b_p):
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a_p.append(np.minimum(ids[ii], ids[jj]))
        b_p.append(np.maximum(ids[ii], ids[jj]))

    def _emit_split(ids, m, depth, planes, a_p, b_p):
        """Recursive deterministic bisection of an oversized cluster;
        every leaf matmul is <= max_cluster^2."""
        n = len(ids)
        if n <= max_cluster:
            _emit_exact(ids, m, a_p, b_p)
            return
        for d in range(depth, planes.shape[1]):
            side = (m @ planes[:, d]) > 0
            if side.any() and not side.all():
                _emit_split(ids[side], m[side], d + 1, planes, a_p, b_p)
                _emit_split(ids[~side], m[~side], d + 1, planes, a_p, b_p)
                return
        # no plane separates these vectors (exact duplicates): chunk by
        # id order, overlapping one row so identical runs stay chained
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        step = max_cluster - 1
        for s in range(0, n, step):
            lo = max(0, s - 1)
            _emit_exact(ids[lo: s + step], m[lo: s + step], a_p, b_p)

    def cluster_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_p, b_p = [], []
        planes = None
        for _, g in df.groupby("kcluster", sort=False):
            n = len(g)
            if n < 2:
                continue
            ids = g[id_col].to_numpy(dtype=np.int64)
            m = np.frombuffer(
                b"".join(g["__vec"].tolist()), dtype=np.float64
            ).reshape(n, dim)
            if n > max_cluster:
                if on_oversize == "raise":
                    raise ValueError(
                        f"semdedup cluster of {n} rows exceeds max_cluster="
                        f"{max_cluster}; raise n_clusters so per-cluster "
                        "matmuls fit a task heap (or use the default "
                        "on_oversize='split' degrade path)"
                    )
                if planes is None:
                    planes = hashed_gaussian_planes(dim, 64)
                logger.warning(
                    "semdedup: cluster of %d rows exceeds max_cluster=%d; "
                    "sub-splitting by sign-LSH (cross-leaf pairs traded "
                    "for bounded tasks)", n, max_cluster,
                )
                _emit_split(ids, m, 0, planes, a_p, b_p)
                continue
            _emit_exact(ids, m, a_p, b_p)
        if not a_p:
            a_p = b_p = [np.array([], dtype=np.int64)]
        return pd.DataFrame(
            {"vec_a": np.concatenate(a_p), "vec_b": np.concatenate(b_p)}
        )

    pairs = hash_bucketed_groupby(
        tagged, ["kcluster"], cluster_pairs, num_buckets=num_buckets
    )
    out = dedup_clusters(
        embeddings, pairs, id_col=id_col, col_a="vec_a", col_b="vec_b"
    )
    if not return_audit:
        return out
    # driver-side audit: per-coarse-cluster sizes are n_clusters-bounded
    sizes: dict = {}
    for b in tagged.map_batches(
        lambda t: t.group_by(["kcluster"]).aggregate([(["kcluster"], "count")])
        .rename_columns(["kcluster", "n"]),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for k, c in zip(b["kcluster"].to_pylist(), b["n"].to_pylist()):
            sizes[k] = sizes.get(k, 0) + c
    over = {k: c for k, c in sizes.items() if c > max_cluster}
    audit = {
        "oversized_clusters": len(over),
        "oversized_rows": sum(over.values()),
        "max_cluster": max_cluster,
        "largest_cluster": max(sizes.values()) if sizes else 0,
    }
    return out, audit


# ---------------------------------------------------------------------------
# benchmark decontamination (shared-shingle removal)
# ---------------------------------------------------------------------------

def decontaminate(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    num_partitions: int = 32,
    broadcast_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Drop every document that shares at least one ``k``-word shingle with
    the ``benchmark`` corpus — the standard training-set decontamination
    pass (eval contamination travels as verbatim runs, so one shared
    shingle is the drop signal).

    Distributed as two key-only exchanges, no text ever rides a shuffle:

    1. both sides expand to (id, gram-hash) rows via the same vectorized
       rolling-hash kernel as MinHash (``_gram_hashes``; rows shorter than
       ``k`` words fold into one whole-row gram);
    2. ``semi_join`` keeps contaminated doc grams — benchmark gram hashes
       are dimension-sized (8 B per distinct shingle), so this is normally
       the broadcast membership path, and past ``broadcast_limit`` it
       rides the bloom-prefiltered hash join;
    3. ``anti_join`` removes the distinct contaminated ids from ``docs``.

    Gram equality is 64-bit-hash equality: a cross-sequence collision
    (~n_grams^2 / 2^64) can spuriously drop a document, which at training
    scale is an accepted no-op (dedup-side false positives cost one doc,
    never correctness of survivors' content).
    """
    from .relational import anti_join, semi_join

    # the corpus stream is consumed twice (gram expansion feeding the semi
    # join, then as the anti join's left side); pin the blocks once so an
    # expensive upstream chain (language-ID actors, a dedup shuffle) isn't
    # recomputed — the object store spills past memory, which beats a
    # second full execution
    docs = docs.materialize()

    def grams(t: pa.Table, with_ids: bool) -> pa.Table:
        wh, lens = _word_hashes(_chunked(t[text_col]))
        gh, n = _gram_hashes(wh, lens, k)
        cols = {"gram": pa.array(gh, type=pa.uint64())}
        if with_ids:
            ids = _chunked(t[id_col]).to_numpy(zero_copy_only=False)
            cols[id_col] = pa.array(np.repeat(ids, n))
        out = pa.table(cols)
        # per-batch distinct: shrink the exchange before it happens
        # (pyarrow group_by keeps key dtypes — no pandas round-trip)
        return out.group_by(out.column_names).aggregate([])

    doc_grams = docs.select_columns([id_col, text_col]).map_batches(
        lambda t: grams(t, with_ids=True), batch_format="pyarrow"
    )
    bench_grams = benchmark.select_columns([text_col]).map_batches(
        lambda t: grams(t, with_ids=False), batch_format="pyarrow"
    )
    contaminated = semi_join(
        doc_grams, bench_grams, on="gram",
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )
    return anti_join(
        docs, contaminated, on=id_col,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )


def _one_edit(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) <= 1 in one O(len) scan (no DP table)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = edits = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        else:
            edits += 1
            if edits > 1:
                return False
            j += 1
    return True


def fuzzy_name_pairs(
    ds,
    col: str = "p_name",
    num_buckets: int = 32,
    out_a: str = "name_a",
    out_b: str = "name_b",
):
    """Distinct name pairs within edit distance 1 — fuzzy entity-name
    matching via FastSS deletion-neighborhood blocking.

    Every distance-<=1 pair shares a member of D1(x) = {x} ∪ {x minus one
    char} (substitution: delete the differing char from both; ins/del:
    the shorter string IS a deletion of the longer), so bucketing by
    deletion variant is a COMPLETE blocking scheme for this radius; a
    variant collision can reach distance 2, so candidates are verified
    with an exact O(len) one-edit scan — no false positives survive.

    Per-name Python here runs over the DISTINCT name vocabulary (already
    deduped by the first shuffle), which is bounded by the catalog, not
    the corpus — for corpus-scale fuzzy joins use the MinHash family.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    names = ds.select_columns([col]).map_batches(
        lambda df: df.drop_duplicates([col]), batch_format="pandas"
    )
    names = hash_bucketed_groupby(
        names, [col], lambda df: df.drop_duplicates([col]), num_buckets
    )

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        rows_n, rows_v = [], []
        for s in df[col].astype(str):
            rows_n.append(s)
            rows_v.append(s)
            for i in range(len(s)):
                rows_n.append(s)
                rows_v.append(s[:i] + s[i + 1:])
        return pd.DataFrame({"name": rows_n, "variant": rows_v}).drop_duplicates()

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, g in df.groupby("variant", sort=False):
            ns = sorted(set(g["name"]))
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    a_out.append(ns[i])
                    b_out.append(ns[j])
        return pd.DataFrame({out_a: a_out, out_b: b_out}).drop_duplicates()

    cand = hash_bucketed_groupby(
        names.map_batches(variants, batch_format="pandas"),
        ["variant"], emit_pairs, num_buckets,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([out_a, out_b])
        keep = [bool(_one_edit(x, y)) for x, y in zip(df[out_a], df[out_b])]
        return df[pd.Series(keep, index=df.index)]

    return hash_bucketed_groupby(cand, [out_a, out_b], verify, num_buckets)


def incremental_dedup_store(
    new_docs: ray.data.Dataset,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    auto_commit: bool = False,
) -> dict:
    """Production CDC-for-dedup: deduplicate a NEW document shard against
    a persisted fingerprint store without ever re-reading the historical
    corpus — the store holds one 64-bit content fingerprint per document
    ever accepted, and each delta (1) fingerprints its texts, (2) dedups
    within itself (lowest id wins), (3) anti-joins the store's key-only
    fingerprint column (size-routed broadcast vs shuffle, like
    ``update_graph``), and (4) STAGES the survivors' fingerprints. At
    100 TB the store is ~8 bytes/doc of keys — the only state the
    historical corpus leaves behind.

    **Ordering requirement**: the store append is a second phase. The
    survivors' fingerprints are written to a staging dir inside the
    store, and only ``result["commit"]()`` promotes them. Call it AFTER
    the downstream corpus write of ``accepted`` has durably succeeded —
    committing first means a crash before that write makes the
    re-applied delta anti-join those docs away (silently dropped), which
    is exactly the failure idempotent replay must protect against. A
    crash before commit leaves an orphan staging dir that the next run
    sweeps (single-writer store assumed). ``auto_commit=True`` restores
    the old commit-immediately behavior for callers whose consumption of
    ``accepted`` IS the materialize (tests, pure counting).

    Returns {"accepted": Dataset, "n_in", "n_new", "n_dup", "commit"} —
    consume ``accepted`` (still carrying the fingerprint column) to
    drive the write, then call ``commit()`` (idempotent, returns the
    number of fingerprint files promoted).
    """
    import glob as _glob
    import os
    import shutil as _shutil
    import uuid as _uuid

    from . import textops
    from .relational import anti_join

    fp = new_docs.map_batches(
        lambda t: textops.fingerprint_batch(t, text_col=text_col),
        batch_format="pyarrow",
    )
    fp = exact_dedup(fp, ["fingerprint"], [id_col])
    n_in = new_docs.count()

    os.makedirs(store_dir, exist_ok=True)
    # sweep staging dirs orphaned by a pre-commit crash: never committed,
    # so their fingerprints were never observable by an anti-join
    for stale in _glob.glob(os.path.join(store_dir, ".staging_*")):
        _shutil.rmtree(stale, ignore_errors=True)
    have_store = bool(_glob.glob(os.path.join(store_dir, "*.parquet")))
    if have_store:
        seen = ray.data.read_parquet(store_dir, columns=["fingerprint"])
        fresh = fp.materialize()
        fresh = anti_join(fresh, seen, "fingerprint", "fingerprint")
    else:
        fresh = fp
    fresh = fresh.materialize()
    n_new = fresh.count()

    staging = os.path.join(store_dir, f".staging_{_uuid.uuid4().hex}")
    if n_new:
        fresh.map_batches(
            lambda t: t.select(["fingerprint"]), batch_format="pyarrow"
        ).write_parquet(staging)

    def commit() -> int:
        if not os.path.isdir(staging):  # nothing staged / already promoted
            return 0
        moved = 0
        for p in sorted(_glob.glob(os.path.join(staging, "*.parquet"))):
            os.replace(p, os.path.join(store_dir, os.path.basename(p)))
            moved += 1
        _shutil.rmtree(staging, ignore_errors=True)
        return moved

    if auto_commit:
        commit()
    return {
        "accepted": fresh,
        "n_in": n_in,
        "n_new": n_new,
        "n_dup": n_in - n_new,
        "commit": commit,
    }
