"""Deterministic sampling — hash samples and stratified samples.

Training-data pipelines need samples that are (a) reproducible bit-for-bit
across runs, partitionings and cluster sizes, (b) computable in one
streaming pass with no global shuffle, and (c) auditable by an external
system. Random-state samplers (``Dataset.random_sample``) give none of
these; kgray samples by a KNUTH MULTIPLICATIVE HASH of a caller-named key:

    h(k) = (k * 2654435761) mod 2^32        (Fibonacci hashing; public
                                             domain constant, Knuth TAOCP v3)
    keep  <=>  h(k) < floor(2^32 * rate)

Pure int64 arithmetic (no overflow below k < 2^35), so the exact keep set
is reproducible by integer SQL — every sampler here is oracle-checkable.

Scale: sampling is a stateless vectorized filter fused into the read — no
shuffle, no driver state. ``stratified_sample`` adds ONE dimension-sized
grouped count (strata vocabulary, broadcast via ray.put) to derive
per-stratum rates; the corpus pass itself stays a filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

KNUTH = 2654435761  # 2^32 / phi, rounded to odd
MOD32 = 1 << 32


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def knuth_hash32(keys: np.ndarray) -> np.ndarray:
    """int64 keys -> uniform int64 in [0, 2^32). Mirrors the SQL form
    ``(k * 2654435761) % 4294967296`` exactly (callers must keep
    k < 2^35 so k * KNUTH stays inside int64 — assert upstream)."""
    k = keys.astype(np.int64, copy=False)
    return (k * np.int64(KNUTH)) % np.int64(MOD32)


def hash_sample(
    ds: ray.data.Dataset,
    key_col: str,
    rate_ppm: int,
) -> ray.data.Dataset:
    """Keep rows where h(key) < 2^32 * rate_ppm / 1e6 — a deterministic
    ``rate_ppm``-per-million Bernoulli sample keyed on ``key_col``.

    All rows sharing a key are kept or dropped TOGETHER (key-coherent
    sampling: sample by document / user / order, not by row), which is
    what makes held-out splits leak-free.
    """
    threshold = (MOD32 * rate_ppm) // 1_000_000

    def keep(t: pa.Table) -> pa.Table:
        k = pc.cast(_chunked(t[key_col]), pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(knuth_hash32(k) < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    weight_cap: int,
) -> ray.data.Dataset:
    """Probability-proportional-to-weight Bernoulli sample: keep a row iff
    ``h(key) < 2^32 * min(weight, cap) / cap`` — rows at or above
    ``weight_cap`` always survive, lighter rows survive with probability
    weight/cap. Deterministic (same hash-threshold trick as
    ``hash_sample``: no RNG state, key-coherent, restart-stable) and
    embarrassingly parallel — no global weight pass; the caller picks the
    cap, which is what makes the operator one streaming filter instead of
    a max-reduce plus a second pass. The curation use: sample documents
    proportional to quality/length without materializing scores."""

    def keep(t: pa.Table) -> pa.Table:
        k = pc.cast(_chunked(t[key_col]), pa.int64()).to_numpy(zero_copy_only=False)
        w = pc.cast(_chunked(t[weight_col]), pa.int64()).to_numpy(zero_copy_only=False)
        thr = (MOD32 * np.minimum(w, weight_cap)) // weight_cap
        return t.filter(pa.array(knuth_hash32(k) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    strata_cols: list[str],
    key_col: str,
    target_per_stratum: int,
) -> ray.data.Dataset:
    """~``target_per_stratum`` rows from EVERY stratum, however skewed.

    Two passes: (1) a grouped count over per-batch partials gives each
    stratum's population (strata vocabulary is dimension-sized — broadcast
    as a dict via ray.put, same ST1 discipline as the rest of the engine);
    (2) a stateless filter keeps rows with h(key) < 2^32 * target / count.
    Strata at or below target are kept whole (threshold clamps to 2^32).

    Expected yield per stratum is target ± O(sqrt(target)) — hash sampling
    is Bernoulli, not exact-k; exact-k would need a per-stratum top-k
    shuffle, deliberately avoided.
    """
    # per-batch partial counts merged on the DRIVER — the strata
    # vocabulary is dimension-sized by assumption, so collecting
    # vocab-per-block partials costs one execution and NO shuffle (the
    # previous grouped_agg paid a bucketed-reduce exchange whose fixed
    # cost dwarfed the count itself)
    counts = ds.select_columns(strata_cols).map_batches(
        lambda df: df.groupby(strata_cols, sort=False, as_index=False)
        .size()
        .rename(columns={"size": "n"}),
        batch_format="pandas",
    )
    parts = [
        b for b in counts.iter_batches(batch_format="pandas", batch_size=1 << 16)
    ]
    th = (
        pd.concat(parts, ignore_index=True)
        .groupby(strata_cols, sort=False, as_index=False)["n"]
        .sum()
        if parts
        else pd.DataFrame({c: [] for c in [*strata_cols, "n"]})
    )
    th["_lim"] = np.minimum(
        (MOD32 * target_per_stratum) // np.maximum(th["n"].to_numpy(np.int64), 1),
        MOD32,
    )
    ref = ray.put(th[[*strata_cols, "_lim"]])

    def keep(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        lim_df = ray.get(_ref)
        h = knuth_hash32(df[key_col].to_numpy(dtype=np.int64))
        merged = df.merge(lim_df, on=strata_cols, how="left")
        lim = merged["_lim"].fillna(0).to_numpy(np.int64)
        return df[h < lim]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(
    ds: ray.data.Dataset,
    key_col: str,
    val_permille: int = 100,
    test_permille: int = 0,
    split_col: str = "split",
) -> ray.data.Dataset:
    """Label every row 'train' / 'val' / 'test' by key hash — the
    leak-free held-out split a training pipeline cuts before anything
    else. Key-coherent (all rows of a key land in one split), stateless,
    reproducible at any parallelism, and integer-SQL-mirrorable:

        bucket = ((k * 2654435761) % 2^32) % 1000
        val:   bucket <  val_permille
        test:  val_permille <= bucket < val_permille + test_permille
        train: the rest
    """
    if not 0 <= val_permille + test_permille <= 1000:
        raise ValueError("permille budgets must sum within [0, 1000]")

    def label(t: pa.Table) -> pa.Table:
        k = pc.cast(_chunked(t[key_col]), pa.int64()).to_numpy(zero_copy_only=False)
        bucket = knuth_hash32(k) % np.int64(1000)
        out = np.where(
            bucket < val_permille,
            "val",
            np.where(bucket < val_permille + test_permille, "test", "train"),
        )
        return t.append_column(split_col, pa.array(out.tolist(), type=pa.string()))

    return ds.map_batches(label, batch_format="pyarrow")


def cluster_coherent_split(
    docs,
    pairs,
    id_col: str = "doc_id",
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    val_permille: int = 100,
    test_permille: int = 0,
):
    """Near-dup-aware train/val/test split: the split key is the dedup
    CLUSTER id, not the document id, so two near-duplicate documents can
    never straddle a split boundary (the classic eval-leak a plain
    ``hash_split`` on doc ids cannot prevent — reference anchor: the node
    PK/duplicate-name discipline of `docs/cypher-cmds-1.txt:81` lifted to
    corpus hygiene).

    ``pairs`` is any near-dup pair stream (minhash / simhash / n-gram /
    embedding); documents in no pair are their own singleton cluster.
    Returns (doc_id, cluster_id, is_canonical, split) — downstream keeps
    e.g. only ``is_canonical`` rows of 'train'.
    """
    from .graphalgo import dedup_clusters

    clusters = dedup_clusters(docs, pairs, id_col=id_col, col_a=col_a, col_b=col_b)
    return hash_split(clusters, "cluster_id", val_permille, test_permille)


def mixture_sample(
    ds: ray.data.Dataset,
    source_col: str,
    size_col: str,
    budget: int,
    key_col: str = "doc_id",
    prefix_bits: int = 6,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Budget-capped corpus mixing: per source, keep documents in
    deterministic hash order until the cumulative ``size_col`` reaches
    ``budget`` (the straddling doc is dropped) — the data-mixing step that
    turns per-source quotas into an actual training corpus.

    A running prefix sum is inherently sequential, so it distributes in
    two bounded exchanges instead of one global sort:

    1. range-partition each source by the top ``prefix_bits`` of the key
       hash and reduce per (source, range) size sums — a fixed
       ``n_sources x 2^prefix_bits`` table lands on the driver, which
       turns it into exclusive range offsets;
    2. one bucketed shuffle co-locates each (source, range) group; the
       group sorts locally by (hash, key), adds its offset to the local
       cumsum, and keeps rows while offset + cumsum <= budget.

    Ranges strictly order the hash space (equal hashes share a range), so
    the result is identical to the single-threaded cumsum — and to the
    SQL window-SUM mirror — at any parallelism.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    shift = 32 - prefix_bits

    def tag(t: pa.Table) -> pa.Table:
        k = pc.cast(_chunked(t[key_col]), pa.int64()).to_numpy(zero_copy_only=False)
        h = knuth_hash32(k)
        return pa.table(
            {
                key_col: _chunked(t[key_col]),
                source_col: _chunked(t[source_col]),
                size_col: pc.cast(_chunked(t[size_col]), pa.int64()),
                "_h": pa.array(h),
                "_range": pa.array(h >> shift),
            }
        )

    tagged = ds.select_columns([key_col, source_col, size_col]).map_batches(
        tag, batch_format="pyarrow"
    )

    # per-batch (source, range) size partials fold on the DRIVER — the
    # table is n_sources x 2^prefix_bits at any corpus size, so the
    # bucketed groupby's fixed shuffle cost would dwarf it
    def spart(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                source_col: _chunked(t[source_col]).to_pylist(),
                "_range": _chunked(t["_range"]).to_numpy(zero_copy_only=False),
                "s": _chunked(t[size_col]).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([source_col, "_range"], as_index=False)["s"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    acc: dict = {}
    for b in tagged.map_batches(spart, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 18
    ):
        for src_, rng_, s_ in zip(
            b[source_col].to_pylist(),
            b["_range"].to_numpy(zero_copy_only=False),
            b["s"].to_numpy(zero_copy_only=False),
        ):
            k2 = (src_, int(rng_))
            acc[k2] = acc.get(k2, 0) + int(s_)
    range_sums = [
        {source_col: src_, "_range": rng_, "s": s_}
        for (src_, rng_), s_ in acc.items()
    ]
    rows = sorted(range_sums, key=lambda r: (r[source_col], r["_range"]))
    per_source: dict = {}
    offs = []
    for r in rows:
        base = per_source.get(r[source_col], 0)
        offs.append(base)
        per_source[r[source_col]] = base + r["s"]
    off_df = pd.DataFrame(
        {
            source_col: [r[source_col] for r in rows],
            "_range": [r["_range"] for r in rows],
            "_off": np.asarray(offs, dtype=np.int64),
        }
    )
    off_ref = ray.put(off_df)

    # a coarse bucket holds SEVERAL (source, range) groups — cut each with
    # one vectorized grouped cumsum, not a per-group loop
    def cut(df: pd.DataFrame, _ref=off_ref) -> pd.DataFrame:
        df = df.merge(ray.get(_ref), on=[source_col, "_range"], how="left")
        df = df.sort_values(
            [source_col, "_range", "_h", key_col], kind="mergesort"
        )
        cum = (
            df.groupby([source_col, "_range"], sort=False)[size_col]
            .cumsum()
            .to_numpy(np.int64)
            + df["_off"].fillna(0).to_numpy(np.int64)
        )
        return df.loc[cum <= budget, [key_col, source_col, size_col]]

    return hash_bucketed_groupby(tagged, [source_col, "_range"], cut, num_buckets)


def balanced_resample(
    ds: ray.data.Dataset,
    label_col: str = "label",
    key_col: str = "vec_id",
    max_rep: int = 8,
) -> ray.data.Dataset:
    """Deterministic class-balancing oversample: each row of a minority
    class repeats ``ceil(max_class_count / class_count)`` times (capped
    at ``max_rep``), emitted with a 0-based ``rep`` index — the label-
    rebalancing step before training a classifier head on skewed data.
    No RNG: the multiset is a pure function of the label histogram, so
    the SQL mirror reproduces it exactly.

    Plan: per-batch label value-counts fold on the driver (bounded by
    the label vocabulary — class labels, not content), the factor map
    broadcasts via ``ray.put``, and the oversample is one vectorized
    ``np.repeat`` pass per batch. Shuffle-free.
    """

    acc: dict = {}
    for b in (
        ds.select_columns([label_col])
        .map_batches(
            lambda df: df[label_col].value_counts().rename_axis(label_col)
            .reset_index(name="n"),
            batch_format="pandas",
        )
        .iter_batches(batch_format="pandas", batch_size=1 << 16)
    ):
        for lab, n in zip(b[label_col], b["n"]):
            acc[int(lab)] = acc.get(int(lab), 0) + int(n)
    mx = max(acc.values()) if acc else 0
    factors = {
        lab: min((mx + n - 1) // n, max_rep) for lab, n in acc.items()
    }
    ref = ray.put(factors)

    def oversample(t: pa.Table, _ref=ref) -> pa.Table:
        f = ray.get(_ref)
        lab = pc.cast(_chunked(t[label_col]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        key = pc.cast(_chunked(t[key_col]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        reps = np.array([f.get(int(x), 1) for x in lab], dtype=np.int64)
        idx = np.repeat(np.arange(len(lab), dtype=np.int64), reps)
        ends = np.cumsum(reps)
        rep_i = np.arange(ends[-1] if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - reps, reps
        )
        return pa.table(
            {
                key_col: pa.array(key[idx]),
                label_col: pa.array(lab[idx]),
                "rep": pa.array(rep_i),
            }
        )

    return ds.select_columns([key_col, label_col]).map_batches(
        oversample, batch_format="pyarrow"
    )


def epoch_shuffle_order(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    epochs: int = 2,
    prefix_bits: int = 6,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Reproducible per-epoch global training order WITHOUT a global sort
    — the epoch-shuffle a training pipeline needs to replay a run exactly
    (same data order on any cluster, resumable mid-epoch at a known
    position).

    Each (row, epoch) gets the deterministic key
    ``h = knuth32(key * epochs + epoch)``; the epoch's order is ROW_NUMBER
    over (h, key). A global ROW_NUMBER is inherently sequential, so it
    distributes the same way ``mixture_sample``'s prefix sum does:

    1. range-partition each epoch by the top ``prefix_bits`` of h and
       reduce per (epoch, range) ROW COUNTS — a fixed
       ``epochs x 2^prefix_bits`` table folds on the driver into
       exclusive offsets;
    2. one bucketed shuffle co-locates each (epoch, range) group, which
       sorts locally by (h, key) and emits offset + local position.

    Ranges strictly order the hash space, so the result is bit-identical
    to the sequential ROW_NUMBER — and to the SQL window mirror — at any
    parallelism. ``key * epochs`` must stay under 2^35 (the knuth_hash32
    domain bound); re-scale the key upstream for larger id spaces.

    Returns Dataset(key_col, epoch, ord) with ord in [0, n) per epoch.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    shift = 32 - prefix_bits

    def tag(t: pa.Table) -> pa.Table:
        k = pc.cast(_chunked(t[key_col]), pa.int64()).to_numpy(zero_copy_only=False)
        n = len(k)
        kk = np.repeat(k, epochs)
        ee = np.tile(np.arange(epochs, dtype=np.int64), n)
        h = knuth_hash32(kk * epochs + ee)
        return pa.table(
            {
                key_col: pa.array(kk),
                "epoch": pa.array(ee),
                "_h": pa.array(h),
                "_range": pa.array(h >> shift),
            }
        )

    tagged = ds.select_columns([key_col]).map_batches(tag, batch_format="pyarrow")

    # (epoch, range) row counts fold on the driver — epochs x 2^prefix_bits
    # ints at any corpus size
    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "epoch": _chunked(t["epoch"]).to_numpy(zero_copy_only=False),
                "_range": _chunked(t["_range"]).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["epoch", "_range"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}), preserve_index=False)

    acc: dict = {}
    for b in tagged.map_batches(cpart, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 18
    ):
        for e_, r_, n_ in zip(
            b["epoch"].to_numpy(zero_copy_only=False),
            b["_range"].to_numpy(zero_copy_only=False),
            b["n"].to_numpy(zero_copy_only=False),
        ):
            k2 = (int(e_), int(r_))
            acc[k2] = acc.get(k2, 0) + int(n_)
    rows = sorted(acc.items())
    per_epoch: dict = {}
    off_rows = []
    for (e_, r_), n_ in rows:
        base = per_epoch.get(e_, 0)
        off_rows.append((e_, r_, base))
        per_epoch[e_] = base + n_
    off_df = pd.DataFrame(
        off_rows, columns=["epoch", "_range", "_off"]
    ).astype(np.int64)
    off_ref = ray.put(off_df)

    def rank(df: pd.DataFrame, _ref=off_ref) -> pd.DataFrame:
        df = df.merge(ray.get(_ref), on=["epoch", "_range"], how="left")
        df = df.sort_values(["epoch", "_range", "_h", key_col], kind="mergesort")
        pos = df.groupby(["epoch", "_range"], sort=False).cumcount().to_numpy(np.int64)
        out = pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                "epoch": df["epoch"].to_numpy(np.int64),
                "ord": df["_off"].fillna(0).to_numpy(np.int64) + pos,
            }
        )
        return out

    return hash_bucketed_groupby(tagged, ["epoch", "_range"], rank, num_buckets)
