"""Mergeable sketches for at-scale approximate aggregation.

``hll_distinct_per_group``: HyperLogLog COUNT(DISTINCT) per group — the
sketch form of ``relational.distinct_count_per_group`` for cardinalities
where shuffling every distinct (group, value) pair is too expensive. At
100 TB the exact operator moves one row per distinct pair through the
exchange; the sketch moves at most ``m = 2^precision`` register rows per
(group, block) — a fixed-size combiner regardless of cardinality.

Classic HLL (Flajolet et al. 2007): value -> 64-bit hash; the top
``precision`` bits pick a register, the count of leading zero bits of the
remainder (+1) is the register's candidate rank; registers take the MAX
rank seen (associative and idempotent -> partials merge exactly); estimate
``alpha_m * m^2 / sum(2^-reg)`` with the standard small-range correction.

The hash for integer keys is the murmur3 ``fmix64`` finalizer (public
domain, Appleby) — pure shift/xor/multiply-mod-2^64, so an integer-SQL
oracle replicates the registers BIT-FOR-BIT (DuckDB HUGEINT xor/>> and
product % 2^64; ``length(bin(w)) - 1`` is an exact floor(log2)). The
harmonic sum is kept as an exact scaled integer (every term
``2^(q+1-rank)``), so both engines divide the same two numbers and the
estimate is reproducible to the last bit. Non-integer keys fall back to
``pd.util.hash_array`` (deterministic, but siphash — not SQL-mirrorable).

Everything is vectorized: hashing is one numpy pass, ranks come from a
``log2`` trick, and the per-batch register fold is a pandas groupby-max
over (group, register) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


# murmur3 fmix64 finalizer constants (public domain; Appleby 2011)
_MIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(x: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 over uint64 — shift/xor/multiply mod 2^64 only,
    replicable verbatim in HUGEINT SQL."""
    x = x.astype(np.uint64)
    x = x ^ (x >> np.uint64(33))
    x = x * _MIX_C1
    x = x ^ (x >> np.uint64(33))
    x = x * _MIX_C2
    x = x ^ (x >> np.uint64(33))
    return x


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _ranks(h: np.ndarray, precision: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash — rank = leading-zero count of the
    (64 - precision)-bit suffix, + 1."""
    q = 64 - precision
    reg = (h >> np.uint64(q)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(q)) - np.uint64(1))
    # floor(log2(w)) via float64 is exact for w < 2^53; HLL suffixes are
    # 64-p bits, so mask down to 52 bits first (only ZERO vs POSITION of
    # the highest set bit matters, and bits below 52 shift rank by a
    # constant we account for)
    rank = np.empty(len(h), dtype=np.int64)
    zero = w == 0
    rank[zero] = q + 1
    nz = ~zero
    if nz.any():
        # EXACT highest-set-bit position, all-integer: float64 log2 of
        # an arbitrary w misrounds for suffixes a few ulps below a
        # power of two (np.floor(np.log2(2**50 - 1)) == 50.0), which
        # would diverge from the bit-exact SQL register mirror. Smear
        # the top bit down so v = 2^(top+1) - 1, then v + 1 is an
        # EXACT power of two (top <= q-1 <= 59, so v+1 <= 2^60 fits
        # float64 exactly and its log2 is exact by IEEE-754).
        v = w[nz].copy()
        for s in (1, 2, 4, 8, 16, 32):
            v |= v >> np.uint64(s)
        top = np.log2((v + np.uint64(1)).astype(np.float64)).astype(
            np.int64
        ) - 1
        rank[nz] = q - top
    return reg, rank


def hll_partials(
    df: pd.DataFrame, group_col: str, value_col: str, precision: int
) -> pd.DataFrame:
    """Per-batch combiner: (group, register, max rank) rows — at most
    ``2^precision`` rows per group per batch, whatever the cardinality.
    Integer keys hash via the SQL-mirrorable ``mix64``; anything else
    falls back to pandas' siphash (deterministic, rows-only oracle)."""
    vals = df[value_col].to_numpy()
    if np.issubdtype(vals.dtype, np.integer):
        h = mix64(vals)
    else:
        h = pd.util.hash_array(vals).astype(np.uint64)
    reg, rank = _ranks(h, precision)
    part = pd.DataFrame({group_col: df[group_col], "_reg": reg, "_rank": rank})
    return part.groupby([group_col, "_reg"], sort=False, as_index=False).agg(
        _rank=("_rank", "max")
    )


def hll_estimate(sub: pd.DataFrame, group_col: str, precision: int) -> pd.DataFrame:
    """Merge register partials per group and run the HLL estimator."""
    m = 1 << precision
    merged = sub.groupby([group_col, "_reg"], sort=False, as_index=False).agg(
        _rank=("_rank", "max")
    )
    q = 64 - precision
    scale = 1 << (q + 1)
    out_groups, out_est = [], []
    for g, grp in merged.groupby(group_col, sort=False):
        ranks = grp["_rank"].to_numpy()
        nnz = len(ranks)
        zeros = m - nnz
        # exact integer harmonic sum scaled by 2^(q+1): each register
        # contributes 2^(q+1-rank) (rank <= q+1 -> shift >= 0), empty
        # registers 2^(q+1) each — both engines then divide the SAME
        # two numbers, so the float estimate is bit-reproducible
        s_int = zeros * scale + sum(1 << (q + 1 - int(r)) for r in ranks)
        e = _alpha(m) * m * m * scale / s_int
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        out_groups.append(g)
        out_est.append(int(np.floor(e + 0.5)))  # half-up: FLOOR(e+0.5) in SQL
    return pd.DataFrame({group_col: out_groups, "approx_distinct": out_est})


def hll_distinct_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    precision: int = 12,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT value_col) per group (standard error
    ~= 1.04 / sqrt(2^precision); ~1.6% at the default p=12).

    One combiner pass emits bounded (group, register, rank) partials per
    block; ONE keyed shuffle merges them; the estimator runs per group.
    Deterministic for a given corpus (fixed hash), like every dedup key in
    the engine.
    """
    from .relational import hash_bucketed_groupby

    parts = ds.select_columns([group_col, value_col]).map_batches(
        lambda df: hll_partials(df, group_col, value_col, precision),
        batch_format="pandas",
    )
    return hash_bucketed_groupby(
        parts, [group_col], lambda df: hll_estimate(df, group_col, precision),
        num_buckets=num_buckets,
    )


def histogram_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: tuple[int, ...] = (50, 90, 99),
    unit: float = 100.0,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Approximate per-group quantiles via a mergeable fixed-point
    histogram sketch: value -> integer bin ``floor(value * unit)``; the
    q-th percentile is the smallest bin whose cumulative count reaches
    ``ceil(q% * n)`` (the standard lower-quantile on the binned CDF).

    Exact within bin resolution (1/unit), deterministic, and
    shuffle-bounded: the exchange moves one (group, bin, count) partial
    row per distinct bin per block — fixed size regardless of row count,
    which is what makes per-group percentiles viable at 100 TB where an
    exact distributed sort per group is not.

    Output: one row per group with columns ``p{q}_c`` (int64 bins).
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg, hash_bucketed_groupby

    def binify(t: pa.Table) -> pa.Table:
        col = t[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        b = pc.cast(pc.floor(pc.multiply(col, unit)), pa.int64())
        return pa.table({group_col: t[group_col], "bin": b})

    counts = grouped_agg(
        ds.select_columns([group_col, value_col]).map_batches(
            binify, batch_format="pyarrow"
        ),
        keys=[group_col, "bin"],
        count_alias="n",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "bin"], kind="mergesort")
        g = df.groupby(group_col, sort=False)
        cum = g["n"].cumsum().to_numpy(np.int64)
        tot = g["n"].transform("sum").to_numpy(np.int64)
        cols = {}
        for q in qs:
            ok = df[cum * 100 >= q * tot]
            cols[f"p{q}_c"] = ok.groupby(group_col, sort=False)["bin"].first()
        return pd.DataFrame(cols).reset_index()

    return hash_bucketed_groupby(counts, [group_col], finish, num_buckets)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join (broadcast a fixed-size bitmap instead of
# shuffling the fact table)
# ---------------------------------------------------------------------------

# public multiplicative-hash constants (Knuth 1998; xxhash primes)
_BLOOM_MULTS = (2654435761, 2246822519, 3266489917)
_MOD32 = 1 << 32


def _bloom_positions(keys: np.ndarray, n_bits: int) -> np.ndarray:
    """(len(keys), k) bit positions — h_i(x) = ((x mod 2^32) * A_i mod 2^32)
    mod n_bits, exact in uint64 (operands < 2^32 so the product never
    wraps) and reproducible verbatim in integer SQL."""
    y = (keys.astype(np.int64) % _MOD32).astype(np.uint64)
    return np.stack(
        [(y * np.uint64(a)) % np.uint64(_MOD32) % np.uint64(n_bits)
         for a in _BLOOM_MULTS],
        axis=1,
    )


def bloom_build(
    ds: ray.data.Dataset,
    key_col: str,
    n_bits: int = 1 << 20,
) -> np.ndarray:
    """Fold the build side into ONE n_bits-wide bitmap (numpy uint64
    words). Each block reduces to a fixed-size partial bitmap on its
    worker; the driver ORs one bitmap per block — constant memory at any
    build cardinality (2^20 bits = 128 KiB). Size ``n_bits`` ~ 10x the
    expected distinct keys for a sub-percent false-positive rate."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        words = np.zeros(n_bits // 64, dtype=np.uint64)
        pos = _bloom_positions(keys, n_bits).reshape(-1)
        np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % np.uint64(64)))
        return pa.table({"words": [words.tobytes()]})

    bitmap = np.zeros(n_bits // 64, dtype=np.uint64)
    for b in ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=64):
        for buf in b["words"].to_pylist():
            bitmap |= np.frombuffer(buf, dtype=np.uint64)
    return bitmap


def bloom_semi_join(
    probe: ray.data.Dataset,
    build: ray.data.Dataset,
    probe_key: str,
    build_key: str,
    n_bits: int = 1 << 20,
) -> ray.data.Dataset:
    """Probabilistic semi-join: keep probe rows whose key tests positive in
    a Bloom filter of the build keys. No shuffle touches the probe table —
    the bitmap ships once via the object store and every probe block tests
    locally; false positives pass (rate set by ``n_bits``), negatives are
    exact (never drops a true match). The 100-TB pattern: a 10^11-row fact
    stream filters against a 10^7-key dim set through a 128-KiB broadcast
    instead of an all-to-all exchange; chase with an exact join on the
    survivors when exactness matters."""
    import ray as _ray

    bitmap_ref = _ray.put(bloom_build(build, build_key, n_bits))

    def test(t: pa.Table) -> pa.Table:
        bm = _ray.get(bitmap_ref)
        keys = t[probe_key].combine_chunks().to_numpy(zero_copy_only=False)
        pos = _bloom_positions(keys, n_bits)
        hit = (bm[pos // 64] >> (pos % np.uint64(64))) & np.uint64(1)
        return t.filter(pa.array(hit.all(axis=1)))

    return probe.map_batches(test, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable approximate frequencies)
# ---------------------------------------------------------------------------

def cms_build(
    ds: ray.data.Dataset,
    key_col: str,
    depth: int = 3,
    width: int = 1 << 16,
) -> np.ndarray:
    """Fold the stream into one (depth x width) count-min matrix. Each
    block reduces to sparse (row, pos, count) partials via one bincount
    per hash row; the driver folds one fixed-size partial per block —
    constant memory at any stream length (3 x 2^16 x 8 B = 1.5 MiB).
    Hash row i uses the same multiplicative family as the Bloom filter,
    so the SQL mirror is exact."""

    assert depth <= len(_BLOOM_MULTS), "one multiplicative hash per row"

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        pos = _bloom_positions(keys, width)  # (n, depth<=3) positions
        rows, ps, cs = [], [], []
        for i in range(depth):
            counts = np.bincount(pos[:, i].astype(np.int64), minlength=0)
            nz = np.nonzero(counts)[0]
            rows.append(np.full(len(nz), i, dtype=np.int64))
            ps.append(nz.astype(np.int64))
            cs.append(counts[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows)),
                "pos": pa.array(np.concatenate(ps)),
                "c": pa.array(np.concatenate(cs)),
            }
        )

    cms = np.zeros((depth, width), dtype=np.int64)
    for b in ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        np.add.at(
            cms,
            (
                b["row"].to_numpy(zero_copy_only=False),
                b["pos"].to_numpy(zero_copy_only=False),
            ),
            b["c"].to_numpy(zero_copy_only=False),
        )
    return cms


def cms_estimate(
    keys: ray.data.Dataset,
    cms: np.ndarray,
    key_col: str,
    out_col: str = "est",
) -> ray.data.Dataset:
    """Point-estimate every key against a built sketch: est = min over
    hash rows of the addressed counter (never an undercount). The sketch
    ships once via the object store; probing is one gather per row."""
    import ray as _ray

    depth, width = cms.shape
    cms_ref = _ray.put(cms)

    def probe(t: pa.Table) -> pa.Table:
        m = _ray.get(cms_ref)
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        pos = _bloom_positions(k, width).astype(np.int64)
        est = np.min(
            np.stack([m[i, pos[:, i]] for i in range(depth)], axis=1), axis=1
        )
        return t.append_column(out_col, pa.array(est.astype(np.int64)))

    return keys.map_batches(probe, batch_format="pyarrow")
