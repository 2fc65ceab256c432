"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle discipline: every variant pre-reduces inside ``map_batches``
(within-batch keep-first / per-doc signatures) before its single
``groupby`` exchange, so the all-to-all moves one row per key/bucket per
block — not one per input row. Hash seeds are fixed constants: results are
deterministic across runs, block layouts and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from .util import pool_concurrency

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


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Candidate generation by LSH band buckets + exact Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, deduplicated.
    Buckets larger than ``max_bucket`` are truncated (hot-bucket guard for
    degenerate corpora) — truncation is counted in the 'truncated' column
    of oversized groups rather than silent.
    """
    text_by_id_ref = _broadcast_texts(docs, id_col, text_col)

    bands = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm,
            n_bands=n_bands, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=pool_concurrency(),
    )

    import ray as _ray

    from .relational import hash_bucketed_groupby

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # df holds MANY lsh buckets (co-located by coarse hash); iterate
        # them here instead of paying a Ray task per lsh bucket
        texts = _ray.get(text_by_id_ref)
        rows = []
        for _, grp in df.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(grp["doc_id"].tolist())[:max_bucket]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    sim = _jaccard(texts.get(ids[i], ""), texts.get(ids[j], ""), shingle_k)
                    if sim >= threshold:
                        rows.append((ids[i], ids[j], round(sim, 6)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    pairs = hash_bucketed_groupby(bands, ["band_id", "band_hash"], bucket_pairs)
    # same pair can surface from several bands -> dedup
    return exact_dedup(pairs, ["doc_a", "doc_b"], "jaccard")


def _broadcast_texts(docs, id_col, text_col):
    """Broadcast id->text for verify stages. Fine for catalog-size corpora;
    at larger scale the verify step should join text back by id instead."""
    import ray as _ray

    texts = {}
    for b in docs.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow", batch_size=1 << 16
    ):
        texts.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    return _ray.put(texts)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (inverted-index, no approximation)
# ---------------------------------------------------------------------------

def _word_grams(text: str, k: int) -> set:
    w = (text or "").split()
    if len(w) < k:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    max_df: int = 1 << 30,
) -> ray.data.Dataset:
    """EXACT word-``k``-gram Jaccard pairs >= ``threshold`` via a distributed
    inverted-index join (gram -> posting list -> co-occurrence counts) — no
    LSH approximation, so it is oracle-checkable against SQL.

    ``max_df``: grams appearing in more than this many documents are dropped
    from the similarity computation in BOTH the numerator and denominator
    (the standard stop-gram cut for set-similarity joins — a gram shared by
    half the corpus generates O(df^2) candidate pairs and carries no signal).
    Default keeps everything.

    Shuffle plan: one gram-keyed exchange of (doc, gram) pairs feeding two
    reductions (pair co-counts + per-doc retained-gram counts), then a
    pair-keyed sum; per-doc counts are corpus-vocabulary sized and broadcast
    (at larger scale, replace the broadcast with a join on doc id).
    """
    import ray as _ray

    from .relational import hash_bucketed_groupby

    def to_grams(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            gset = _word_grams(text, k)
            ids.extend([did] * len(gset))
            grams.extend(gset)
        return pa.table({"doc_id": pa.array(ids), "gram": pa.array(grams, type=pa.string())})

    grams_ds = docs.map_batches(to_grams, batch_format="pyarrow").materialize()

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # many grams co-located per bucket; postings self-merge -> pair
        # counts, all C kernels (a per-gram Python pair loop measured ~8x
        # slower at 5k docs). The merge materializes sum(df^2) candidate
        # rows per bucket — max_df is the guard against degenerate grams.
        sizes = df.groupby("gram", sort=False)["doc_id"].transform("size")
        kept = df[(sizes <= max_df) & (sizes >= 2)]
        m = kept.merge(kept, on="gram")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.groupby(["doc_id_x", "doc_id_y"], sort=False, as_index=False).size()
        return out.rename(
            columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b", "size": "n_inter"}
        )

    def bucket_doc_counts(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("gram", sort=False)["doc_id"].transform("size")
        kept = df[sizes <= max_df]
        return kept.groupby("doc_id", sort=False, as_index=False).agg(n=("gram", "size"))

    pair_partials = hash_bucketed_groupby(grams_ds, ["gram"], bucket_pairs)
    count_partials = hash_bucketed_groupby(grams_ds, ["gram"], bucket_doc_counts)

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], sort=False, as_index=False).agg(
            n_inter=("n_inter", "sum")
        )

    pairs = hash_bucketed_groupby(pair_partials, ["doc_a", "doc_b"], sum_pairs)

    # per-doc retained-gram counts: corpus-vocab sized -> broadcast dict
    doc_counts: dict = {}
    for b in count_partials.iter_batches(batch_format="pandas", batch_size=1 << 16):
        for did, n in zip(b["doc_id"], b["n"]):
            doc_counts[did] = doc_counts.get(did, 0) + int(n)
    counts_ref = _ray.put(doc_counts)

    def finish(df: pd.DataFrame, _ref=counts_ref) -> pd.DataFrame:
        counts = _ray.get(_ref)
        ca = df["doc_a"].map(counts).astype("int64")
        cb = df["doc_b"].map(counts).astype("int64")
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

    return pairs.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor stage: 64-bit SimHash over word hashes + 16-bit chunk keys
    (4 chunks; near-dups within Hamming distance <= 3 share >= 1 chunk).
    Vectorized: Arrow tokenization + per-bit ``add.reduceat`` row sums."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash_column(texts_col: pa.Array) -> np.ndarray:
        """(n_rows,) uint64 simhash; empty rows hash to 0."""
        word_h, lengths = _word_hashes(texts_col)
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
    chunks = docs.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=pool_concurrency(),
    )

    from .relational import hash_bucketed_groupby

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in df.groupby(["chunk_id", "chunk"], sort=False):
            grp = grp.sort_values("doc_id").head(max_bucket)
            ids = grp["doc_id"].tolist()
            hs = grp["simhash"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(int(hs[i]) ^ int(hs[j])).count("1")
                    if d <= max_hamming:
                        rows.append((ids[i], ids[j], d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    pairs = hash_bucketed_groupby(chunks, ["chunk_id", "chunk"], bucket_pairs)
    return exact_dedup(pairs, ["doc_a", "doc_b"], "hamming")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------

def embedding_dedup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    max_bucket: int = 500,
) -> ray.data.Dataset:
    """Near-duplicate vector pairs: sign-LSH bucket groupby, then exact
    cosine verification inside each bucket (numpy matmul)."""
    rng = np.random.RandomState(_RNG_SEED)
    planes = rng.standard_normal((dim, n_planes))
    import ray as _ray

    planes_ref = _ray.put(planes)

    class Bucketer:
        def __init__(self):
            self._planes = _ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            signs = (vecs @ self._planes) > 0
            bucket = signs @ (1 << np.arange(n_planes, dtype=np.int64))
            return pa.table(
                {
                    "vec_id": _chunked(batch[id_col]),
                    "bucket": pa.array(bucket, type=pa.int64()),
                    "vec": pa.array(vecs.tolist(), type=pa.list_(pa.float64())),
                }
            )

    bucketed = embeddings.map_batches(Bucketer, batch_format="pyarrow", concurrency=pool_concurrency())

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id").head(max_bucket)
        ids = df["vec_id"].tolist()
        mat = np.asarray(df["vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    rows.append((ids[i], ids[j], round(float(sims[i, j]), 6)))
        return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    return exact_dedup(pairs, ["vec_a", "vec_b"], "cosine")
