"""Approximate-nearest-neighbor search over an embedding column.

- ``knn_bruteforce``: exact cosine top-k — the baseline. The query matrix
  is broadcast once (``ray.put``); each batch does one numpy matmul and
  emits only its LOCAL top-k per query (a partial reduction), so the final
  global merge handles k × n_blocks rows, never the corpus.
- ``knn_ivf``: the scale path — deterministic k-means coarse quantizer
  (seeded, few iterations on a sample), corpus partitioned by nearest
  centroid, queries probe only ``nprobe`` inverted lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from .util import stateful_task_batches


def _chunk1(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _to_matrix(col) -> np.ndarray:
    # zero-copy values-buffer view + reshape — no per-element Python
    from .util import list_to_matrix

    return list_to_matrix(col, dtype=np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


_I64_MAX = np.iinfo(np.int64).max


def _check_dot_bound(a: np.ndarray, b: np.ndarray) -> int:
    """Guard the exact int64 matmul ``a @ b.T``: the worst-case |dot| is
    dim * max|a| * max|b| (quantized entries). Returns the bound; raises
    when it exceeds int64, where the matmul would wrap silently."""
    if a.size == 0 or b.size == 0:
        return 0
    bound = int(np.abs(a).max()) * int(np.abs(b).max()) * a.shape[1]
    if bound > _I64_MAX:
        raise ValueError(
            "quantized dot product can overflow int64 "
            f"(bound {bound:.3e}); lower `scale` or pre-normalize the "
            "embedding column"
        )
    return bound


def _topk_dot_id(D: np.ndarray, kk: int, exclude=None) -> np.ndarray:
    """Per-row top-``kk`` column indices of the exact int64 dot matrix
    ``D``, ranked dot-DESC with smaller column index (== smaller id when
    columns are id-sorted) breaking ties; ``exclude`` cells never win.

    Fast path packs both keys into one int64 (``D*2L - idx``) for an
    O(L) argpartition — but that product can overflow near large L/|D|
    (advice r2), so it only runs when ``max|D| * 2L + L`` provably fits;
    otherwise a stable full argsort on the (safe) negated dots gives the
    identical order: stability preserves the ascending column index
    among equal dots."""
    L = D.shape[1]
    m = int(np.abs(D).max()) if D.size else 0
    if m <= (_I64_MAX - L) // max(1, 2 * L):
        idx = np.arange(L, dtype=np.int64)
        M = -(D * np.int64(2 * L) - idx[None, :])
        if exclude is not None:
            M[exclude] = _I64_MAX
        part = np.argpartition(M, kk - 1, axis=1)[:, :kk]
        ordr = np.take_along_axis(M, part, axis=1).argsort(
            axis=1, kind="stable"
        )
        return np.take_along_axis(part, ordr, axis=1)
    # |D| <= int64 max is guaranteed by _check_dot_bound, so -D is safe
    neg = -D  # fresh array; mutating it below never touches D
    if exclude is not None:
        neg[exclude] = _I64_MAX
    return np.argsort(neg, axis=1, kind="stable")[:, :kk]


class _PartialTopK:
    """Task stage (cached per worker): local cosine top-k of each batch
    against the broadcast query matrix (``q_ref`` = ``ray.put`` ref; a local
    ``ray.get`` is zero-copy)."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        self._q = ray.get(q_ref)
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _chunk1(batch[self.id_col]).to_numpy()
        mat = _unit(_to_matrix(batch[self.vec_col]))
        sims = self._q @ mat.T  # (n_queries, n_batch)
        n_q, n_b = sims.shape
        kk = min(self.k, n_b)
        # local top-k per query (argpartition, then exact sort of the k)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {"query_id": [], "vec_id": [], "score": []}
        for qi in range(n_q):
            sel = part[qi]
            rows["query_id"].extend([qi] * kk)
            rows["vec_id"].extend(ids[sel].tolist())
            rows["score"].extend(sims[qi, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "vec_id": pa.array(rows["vec_id"]),
                "score": pa.array(rows["score"], type=pa.float64()),
            }
        )


def knn_bruteforce(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row; returns a small DataFrame
    (query_id, vec_id, score) sorted by (query_id, -score, vec_id)."""
    q_unit = _unit(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(q_unit)

    partials = stateful_task_batches(
        embeddings, _PartialTopK,
        dict(q_ref=q_ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", batch_size=4096,
    )
    # global merge: k × n_blocks rows per query — small; finish on driver
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["score"] = out["score"].round(6)
    return out


def cosine_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_limit: int = 65_536,
    tile_rows: int = 8_192,
) -> ray.data.Dataset:
    """EXACT all-pairs cosine similarity join: every (a, b) with
    ``cos(a, b) >= threshold`` and ``a < b`` — oracle-checkable (unlike the
    LSH-bucketed ``dedup.embedding_dedup_pairs``, which trades recall for
    scale).

    Two size-routed plans, same matmul kernel and identical output:

    - corpus <= ``broadcast_limit`` rows: the normalized matrix is broadcast
      once (``ray.put``); each batch does one (batch x corpus) matmul and
      emits only above-threshold pairs. O(n^2) similarities, O(n) shuffle.
    - beyond it: BLOCK-TILED — the corpus is normalized and materialized as
      ~``tile_rows``-row Arrow blocks that stay in the OBJECT STORE (the
      driver holds only their refs); a task grid over the upper-triangular
      (row-block, col-block) pairs fetches exactly its two blocks zero-copy
      and matmuls them. No whole-corpus object anywhere; peak task memory
      is two tiles + the boolean mask.
    """
    prep = embeddings.select_columns([id_col, vec_col]).materialize()
    n = prep.count()
    if n <= broadcast_limit:
        rows = []
        for b in prep.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            rows.append((_chunk1(b[id_col]).to_numpy(), _to_matrix(b[vec_col])))
        all_ids = np.concatenate([r[0] for r in rows])
        all_unit = _unit(np.vstack([r[1] for r in rows]))
        order = np.argsort(all_ids, kind="stable")
        all_ids, all_unit = all_ids[order], all_unit[order]
        ref = ray.put((all_ids, all_unit))

        def part(batch: pa.Table) -> pa.Table:
            ids_c, unit_c = ray.get(ref)
            ids = _chunk1(batch[id_col]).to_numpy()
            unit = _unit(_to_matrix(batch[vec_col]))
            sims = unit @ unit_c.T  # (n_batch, n_corpus)
            ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < ids_c[None, :]))
            return pa.table(
                {
                    "vec_a": pa.array(ids[ii], type=pa.int64()),
                    "vec_b": pa.array(ids_c[jj], type=pa.int64()),
                    "cos_e4": pa.array(
                        np.round(sims[ii, jj] * 1e4).astype(np.int64), type=pa.int64()
                    ),
                }
            )

        return embeddings.map_batches(part, batch_format="pyarrow")

    return _cosine_pairs_tiled(prep, threshold, id_col, vec_col, n, tile_rows)


def _cosine_pairs_tiled(prep, threshold, id_col, vec_col, n, tile_rows):
    """The block-tiled plan (see ``cosine_pairs``). Partitioning assumption:
    ids are globally unique; blocks need not be sorted or disjoint in id
    range — each unordered pair of blocks is visited exactly once and pairs
    are emitted as (min_id, max_id)."""
    import ray.data as rd

    n_blocks = max(1, -(-n // tile_rows))

    def normalize(t: pa.Table) -> pa.Table:
        unit = _unit(_to_matrix(t[vec_col]))
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        packed = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(unit).reshape(-1)), unit.shape[1]
        )
        return pa.table({id_col: ids, "__unit": packed})

    mat = prep.repartition(n_blocks).map_batches(
        normalize, batch_format="pyarrow", batch_size=None
    ).materialize()
    block_refs = [
        ref for bundle in mat.iter_internal_ref_bundles() for ref in bundle.block_refs
    ]
    nb = len(block_refs)
    tiles = [{"bi": i, "bj": j} for i in range(nb) for j in range(i, nb)]

    def tile_kernel(batch, _refs=block_refs):
        # one task handles a few (row-block, col-block) tiles; each block is
        # fetched zero-copy from the object store (shared on-node memory)
        out_a, out_b, out_c = [], [], []
        for bi, bj in zip(batch["bi"].to_pylist(), batch["bj"].to_pylist()):
            ta = ray.get(_refs[bi])
            tb = ray.get(_refs[bj])
            ids_a = _chunk1(ta[id_col]).to_numpy()
            ids_b = _chunk1(tb[id_col]).to_numpy()
            ua = _to_matrix(ta["__unit"])
            ub = _to_matrix(tb["__unit"])
            sims = ua @ ub.T
            if bi == bj:
                mask = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
                ii, jj = np.nonzero(mask)
                a, b = ids_a[ii], ids_b[jj]
            else:
                ii, jj = np.nonzero(sims >= threshold)
                a = np.minimum(ids_a[ii], ids_b[jj])
                b = np.maximum(ids_a[ii], ids_b[jj])
            out_a.append(a)
            out_b.append(b)
            out_c.append(np.round(sims[ii, jj] * 1e4).astype(np.int64))
        if not out_a:
            out_a = [np.array([], dtype=np.int64)]
            out_b = [np.array([], dtype=np.int64)]
            out_c = [np.array([], dtype=np.int64)]
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cos_e4": pa.array(np.concatenate(out_c), type=pa.int64()),
            }
        )

    tiles_ds = rd.from_items(tiles, override_num_blocks=len(tiles))
    return tiles_ds.map_batches(tile_kernel, batch_format="pyarrow")


class _ProbeTopK:
    """Task stage (cached per worker): IVF probe — assign each vector to
    its nearest centroid by EXACT int64 L2 (quantized in-batch with the
    trainer's scale/offset, ties to the smaller cid), keep only vectors in
    a probed list, float-cosine local top-k per query with the
    (score DESC, id ASC) bruteforce tiebreak. ``state_ref`` bundles
    (cents, cids, unit queries, probe lists, scale, offset)."""

    def __init__(self, state_ref, k: int, id_col: str, vec_col: str):
        (self._cents, self._cids, self._q, self._probes,
         self._scale, self._offset) = ray.get(state_ref)
        self._wanted = np.unique(self._probes.reshape(-1))
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _chunk1(batch[self.id_col]).to_numpy()
        mat = _to_matrix(batch[self.vec_col])
        q = np.round(mat * self._scale).astype(np.int64) + self._offset
        # argmin over cid-sorted centroids == tie to the smaller cid
        assign = self._cids[np.argmin(_int_sq_dists(q, self._cents), axis=1)]
        keep = np.isin(assign, self._wanted)
        ids, assign = ids[keep], assign[keep]
        unit = _unit(mat[keep])
        rows = {"query_id": [], "vec_id": [], "score": []}
        if len(ids):
            sims = self._q @ unit.T
            for qi in range(len(self._q)):
                in_probe = np.isin(assign, self._probes[qi])
                if not in_probe.any():
                    continue
                cand = np.where(in_probe)[0]
                kk = min(self.k, len(cand))
                # (score DESC, id ASC) so the local cut is deterministic
                # even when scores tie at the k boundary
                sel = cand[np.lexsort((ids[cand], -sims[qi, cand]))[:kk]]
                rows["query_id"].extend([qi] * kk)
                rows["vec_id"].extend(ids[sel].tolist())
                rows["score"].extend(sims[qi, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "vec_id": pa.array(rows["vec_id"]),
                "score": pa.array(rows["score"], type=pa.float64()),
            }
        )


_IVF_LCG_A = 6364136223846793005
_IVF_LCG_C = 1442695040888963407


def knn_ivf(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    scale: int = 1_000_000,
    offset: int = 16_000_000,
) -> pd.DataFrame:
    """IVF ANN: train a coarse quantizer on a sample, tag each vector with
    its nearest centroid inside map_batches, search only the ``nprobe``
    closest inverted lists per query. Same output contract as bruteforce.

    Fully deterministic and SQL-mirrorable end to end (the
    ``knn_ivf`` oracle re-runs sample -> train -> probe -> top-k):

    - the training sample keeps ids whose LCG-hash TOP 30 bits fall under
      ``train_sample/n`` (top bits: the low bits of a 2^64 LCG alternate;
      and never first-N — a ``limit()`` sample follows block order, which
      at scale means one shard of the corpus biases every centroid);
    - the coarse quantizer is the shared exact-int64 Lloyd trainer
      (``_kmeans_train_int``: quantize ``round(scale*x)+offset``, seed on
      the k smallest sampled ids, integer mean floors) — the FAISS-style
      L2 coarse geometry, bit-identical at any parallelism;
    - probe lists and vector assignment are exact-int64 L2 argmins with
      ties to the smaller cid;
    - only the final within-list ranking is float cosine, with the same
      (score DESC, id ASC) deterministic tiebreak the green
      ``knn_bruteforce`` oracle already exercises."""
    n = embeddings.count()
    qds = _quantize_pack_ds(embeddings, id_col, vec_col, scale, offset)
    train = qds
    if n > train_sample:
        thr = np.uint64(int(train_sample / n * (1 << 30)))
        a, c = np.uint64(_IVF_LCG_A), np.uint64(_IVF_LCG_C)

        def keep_sample(t: pa.Table) -> pa.Table:
            ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):  # uint64 wrap IS the hash
                h = ids.astype(np.uint64) * a + c
            return t.filter(pa.array((h >> np.uint64(34)) < thr))

        train = qds.map_batches(keep_sample, batch_format="pyarrow")
    cids, cents = _kmeans_train_int(train, n_clusters, iters, id_col)

    qq = np.round(
        np.atleast_2d(np.asarray(queries, dtype=np.float64)) * scale
    ).astype(np.int64) + offset
    qd = _int_sq_dists(qq, cents)           # (nq, n_cents) exact int64
    # per query: nprobe nearest centroids, ties to the smaller cid
    order = np.argsort(qd, axis=1, kind="stable")  # cids are cid-sorted
    probes = cids[order[:, :nprobe]]
    q_unit = _unit(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    state_ref = ray.put((cents, cids, q_unit, probes, scale, offset))

    partials = stateful_task_batches(
        embeddings, _ProbeTopK,
        dict(state_ref=state_ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", batch_size=4096,
    )
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["score"] = out["score"].round(6)
    return out


def label_centroids(
    embeddings: ray.data.Dataset,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-label embedding centroid (prototype vector) as EXACT int64
    fixed-point component sums + counts — the class-prototype aggregation
    a curation pass uses for centroid-distance outlier filtering.

    Each batch reduces to (label, pos, sum_q, n) partials with one
    ``np.add.at`` over the zero-copy matrix — the exchange moves
    n_labels x dim rows per block regardless of row count, and integer
    sums are order-free, so the result is bit-stable at any parallelism.
    The mean is left to the consumer (sum_q // n floors differently in
    numpy vs SQL for negative sums; the sums themselves are exact in
    both arms).
    """
    from .relational import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        q = np.round(mat * scale).astype(np.int64)
        labs = _chunk1(t[label_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, codes = np.unique(labs, return_inverse=True)
        k, d = len(uniq), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, codes, q)
        cnt = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), type=pa.int64()),
                "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
                "sum_q": pa.array(sums.reshape(-1), type=pa.int64()),
                "n": pa.array(np.repeat(cnt, d), type=pa.int64()),
            }
        )

    parts = embeddings.select_columns([label_col, vec_col]).map_batches(
        part, batch_format="pyarrow"
    )
    return grouped_agg(
        parts, keys=["label", "pos"], sums={"sum_q": "sum_q", "n": "n"}
    )


def embedding_covariance(
    embeddings: ray.data.Dataset,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Upper-triangle Gram/covariance accumulators for PCA / whitening prep
    — EXACT int64 fixed point, the d x d statistics a curation pass needs
    before decorrelating or reducing an embedding column.

    Each batch reduces to d*(d+1)/2 rows (i, j, sum_xy, sum_xi, sum_xj, n)
    via one int64 ``q.T @ q`` — the exchange moves O(d^2) rows per block
    regardless of row count, and integer partials are order-free, so the
    result is bit-stable at any parallelism. The consumer forms
    cov_ij = (sum_xy - sum_xi*sum_xj/n) / n (and the eigen step) on the
    driver: d x d is tiny at any corpus size. Components are quantized to
    ``round(scale * x)`` int64 first (same trick as ``label_centroids``);
    with ppm quantization the global sum stays inside int64 up to ~5M rows
    per the docline bound — pass a smaller ``scale`` beyond that.
    """
    from .relational import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        q = np.round(mat * scale).astype(np.int64)
        d = q.shape[1]
        gram = q.T @ q
        sums = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64) + 1),
                "j": pa.array(ju.astype(np.int64) + 1),
                "sum_xy": pa.array(gram[iu, ju]),
                "sum_xi": pa.array(sums[iu]),
                "sum_xj": pa.array(sums[ju]),
                "n": pa.array(np.full(len(iu), t.num_rows, dtype=np.int64)),
            }
        )

    parts = embeddings.select_columns([vec_col]).map_batches(
        part, batch_format="pyarrow"
    )
    return grouped_agg(
        parts,
        keys=["i", "j"],
        sums={"sum_xy": "sum_xy", "sum_xi": "sum_xi", "sum_xj": "sum_xj", "n": "n"},
    )


_JL_KNUTH = 2654435761  # Knuth multiplicative hash constant (public domain)


def _jl_matrix(d: int, out_dim: int) -> np.ndarray:
    """Deterministic sparse JL matrix in {-1, 0, +1}: entry (pos, k) is
    ``((pos*out_dim + k) * KNUTH mod 2^32) mod 3 - 1`` — pure integer hash,
    reproducible bit-for-bit in SQL, no RNG state to ship."""
    key = (
        np.arange(d, dtype=np.int64)[:, None] * out_dim
        + np.arange(out_dim, dtype=np.int64)[None, :]
    )
    return (key * _JL_KNUTH) % (1 << 32) % 3 - 1


def random_project(
    embeddings: ray.data.Dataset,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Sparse random projection (Achlioptas/JL) of the embedding column to
    ``out_dim`` components — the dimensionality cut a pipeline takes before
    ANN indexing or clustering at scale. Exact int64 fixed point: inputs
    quantize to ppm, the projection matrix is {-1,0,+1} from a
    deterministic integer hash (no RNG), so both arms agree bit-for-bit;
    the consumer applies the sqrt(3/out_dim) JL scaling when it needs real
    units. Embarrassingly parallel: one int64 matmul per batch, no shuffle.
    Emits (id, k, comp) rows, k 1-based.
    """

    def part(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        q = np.round(mat * scale).astype(np.int64)
        comp = q @ _jl_matrix(q.shape[1], out_dim)
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, out_dim)),
                "k": pa.array(
                    np.tile(np.arange(1, out_dim + 1, dtype=np.int64), len(ids))
                ),
                "comp": pa.array(comp.reshape(-1)),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        part, batch_format="pyarrow"
    )


def _fold_covariance(
    embeddings: ray.data.Dataset, vec_col: str, scale: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact int64 (gram, column sums, n) for the ppm-quantized embedding
    column, folded on the driver. Each block reduces to ONE row carrying a
    d x d int64 gram plus a d-vector of sums as fixed-size binary, so the
    fold input is O(d^2) per block at ANY corpus size — this skips
    ``embedding_covariance``'s bucketed reduce (one Ray stage fewer) while
    staying bit-stable at any parallelism (integer partials are order-free).
    """

    def cpart(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        q = np.round(mat * scale).astype(np.int64)
        return pa.table(
            {
                "gram": [np.ascontiguousarray(q.T @ q).tobytes()],
                "sums": [q.sum(axis=0).tobytes()],
                "n": pa.array([t.num_rows], type=pa.int64()),
                "d": pa.array([q.shape[1]], type=pa.int64()),
            }
        )

    gram = sums = None
    n = 0
    for b in embeddings.select_columns([vec_col]).map_batches(
        cpart, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=64):
        for g, s, bn, d_ in zip(
            b["gram"].to_pylist(), b["sums"].to_pylist(),
            b["n"].to_pylist(), b["d"].to_pylist(),
        ):
            gm = np.frombuffer(g, dtype=np.int64).reshape(d_, d_)
            sm = np.frombuffer(s, dtype=np.int64)
            gram = gm.copy() if gram is None else gram + gm
            sums = sm.copy() if sums is None else sums + sm
            n += bn
    return gram, sums, n


def pca_project(
    embeddings: ray.data.Dataset,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """PCA projection of the embedding column to its top ``out_dim``
    principal components — the exact-variance counterpart of
    ``random_project``. Stats come from ``embedding_covariance`` (one
    O(d^2)-per-block pass), the d x d eigendecomposition runs on the
    driver (trivial at any corpus size — d is the embedding width), and
    the centered projection matrix broadcasts once; projecting is one
    float matmul per batch, shuffle-free.

    Float output (eigenvectors are irrational), deterministic for a fixed
    input: the integer covariance is bit-stable at any parallelism and
    eigh is deterministic on it. Sign convention: each component's
    largest-|coefficient| entry is made positive.
    Emits (id, k, comp) rows, k 1-based by descending eigenvalue.
    """
    import ray as _ray

    gram, sums, n = _fold_covariance(embeddings, vec_col, scale)
    d = gram.shape[0]
    cov = (gram - np.outer(sums, sums) / n) / n
    mean = sums / n
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:out_dim]
    w = vecs[:, order]
    w *= np.sign(w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])])
    w_ref = _ray.put((mean / scale, w))

    def project(t: pa.Table) -> pa.Table:
        mu, wm = _ray.get(w_ref)
        mat = _to_matrix(t[vec_col])
        comp = (np.round(mat * scale) / scale - mu) @ wm
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        k = wm.shape[1]
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, k)),
                "k": pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids))),
                "comp": pa.array(np.round(comp.reshape(-1), 6)),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow"
    )


def pca_invariants(
    embeddings: ray.data.Dataset,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> pa.Table:
    """Hash-checkable PCA correctness certificate — the invariants a full-
    rank eigendecomposition of the embedding covariance MUST satisfy,
    reduced to one row of exact integers so a SQL oracle can verify the
    eigen step without being able to express it.

    The exact part (``trace_q2``) is the covariance trace in quantized^2
    units, Σ_i floor((n·Σx_i² − (Σx_i)²) / n²), computed from the same
    int64 gram/sums fold as ``pca_project`` with arbitrary-precision
    Python ints (n·Σx² overflows int64 at corpus scale) — SQL mirrors it
    with HUGEINT arithmetic. The eigen part is four parts-per-billion
    deviation gauges that are 0 for a correct decomposition and stay 0
    under float64 noise (eigh errors are ~1e-15·d, six orders below ppb):

    - ``eigsum_gap_ppb``: |Σλ − trace| / trace — eigenvalue completeness;
    - ``max_ortho_ppb``: max_{i≠j} |w_i·w_j| — eigenvector orthogonality;
    - ``max_norm_gap_ppb``: max_k |‖w_k‖² − 1| — unit norms;
    - ``proj_var_gap_ppb``: max_k |scale²·var(comp_k) − λ_k| / λ_max —
      the PROJECTED data's per-component variance equals its eigenvalue
      (this one re-projects the corpus, so it exercises the broadcast +
      per-batch matmul path end to end, with float sum/sumsq partials
      folded on the driver: k floats per block).

    Returns a one-row pa.Table (n_rows, d, trace_q2, eigsum_gap_ppb,
    max_ortho_ppb, max_norm_gap_ppb, proj_var_gap_ppb).
    """
    import ray as _ray

    gram, sums, n = _fold_covariance(embeddings, vec_col, scale)
    d = gram.shape[0]
    trace_q2 = sum(
        (int(n) * int(gram[i, i]) - int(sums[i]) ** 2) // (int(n) * int(n))
        for i in range(d)
    )

    cov = (gram - np.outer(sums, sums) / n) / n
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, w = vals[order], vecs[:, order]

    trace_f = float(np.trace(cov))
    eigsum_gap = abs(float(vals.sum()) - trace_f) / max(trace_f, 1e-30)
    wtw = w.T @ w
    max_ortho = float(np.abs(wtw - np.diag(np.diag(wtw))).max()) if d > 1 else 0.0
    max_norm_gap = float(np.abs(np.diag(wtw) - 1.0).max())

    mean = sums / n
    w_ref = _ray.put((mean / scale, w))

    def vpart(t: pa.Table) -> pa.Table:
        mu, wm = _ray.get(w_ref)
        mat = _to_matrix(t[vec_col])
        comp = (np.round(mat * scale) / scale - mu) @ wm
        return pa.table(
            {
                "s1": [comp.sum(axis=0).tobytes()],
                "s2": [(comp * comp).sum(axis=0).tobytes()],
                "n": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    s1 = np.zeros(d)
    s2 = np.zeros(d)
    nv = 0
    for b in embeddings.select_columns([vec_col]).map_batches(
        vpart, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=64):
        for a1, a2, bn in zip(
            b["s1"].to_pylist(), b["s2"].to_pylist(), b["n"].to_pylist()
        ):
            s1 += np.frombuffer(a1, dtype=np.float64)
            s2 += np.frombuffer(a2, dtype=np.float64)
            nv += bn
    proj_var = s2 / nv - (s1 / nv) ** 2
    lam_max = max(float(vals.max()), 1e-30)
    proj_gap = float(np.abs(proj_var * scale * scale - vals).max()) / lam_max

    def ppb(x: float) -> int:
        return int(round(1e9 * x))

    return pa.table(
        {
            "n_rows": pa.array([n], type=pa.int64()),
            "d": pa.array([d], type=pa.int64()),
            "trace_q2": pa.array([trace_q2], type=pa.int64()),
            "eigsum_gap_ppb": pa.array([ppb(eigsum_gap)], type=pa.int64()),
            "max_ortho_ppb": pa.array([ppb(max_ortho)], type=pa.int64()),
            "max_norm_gap_ppb": pa.array([ppb(max_norm_gap)], type=pa.int64()),
            "proj_var_gap_ppb": pa.array([ppb(proj_gap)], type=pa.int64()),
        }
    )


def knn_graph(
    embeddings: ray.data.Dataset,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    broadcast_limit: int = 65_536,
    tile_rows: int = 8_192,
) -> ray.data.Dataset:
    """Exact k-nearest-neighbor GRAPH by maximum inner product: for every
    vector, its top-``k`` neighbors ranked by the EXACT int64 dot of
    ppm-quantized vectors (ties -> smaller neighbor id) — the kNN-graph
    construction step ahead of graph-based clustering/dedup, in the MIPS
    retrieval mode. Integer ranking keys make the edge set bit-identical
    across parallelism and in SQL (float cosines would reorder ties).

    Corpus <= ``broadcast_limit``: the quantized matrix ships once via the
    object store and every batch does one (batch x corpus) int64 matmul +
    a guarded top-k (packed composite-key argpartition when it provably
    fits int64, stable argsort fallback otherwise — see ``_topk_dot_id``).
    Beyond the limit, ``_knn_graph_tiled`` runs the same per-row top-k as
    a mergeable column-tile sweep (the ``_cosine_pairs_tiled`` block grid
    with a per-row k-merge), bit-identical to the broadcast path
    (parity-tested in tests/test_dedup_similarity.py).
    """
    import ray as _ray

    prep = embeddings.select_columns([id_col, vec_col]).materialize()
    n = prep.count()
    if n > broadcast_limit:
        return _knn_graph_tiled(prep, k, id_col, vec_col, scale, tile_rows)
    ids_l, mats = [], []
    for b in prep.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        ids_l.append(_chunk1(b[id_col]).to_numpy(zero_copy_only=False))
        mats.append(np.round(_to_matrix(b[vec_col]) * scale).astype(np.int64))
    order = np.argsort(np.concatenate(ids_l), kind="stable")
    all_ids = np.concatenate(ids_l)[order]
    Q = np.concatenate(mats)[order]
    ref = _ray.put((all_ids, Q))

    def topk(t: pa.Table) -> pa.Table:
        ids_c, Qc = _ray.get(ref)
        qi = np.round(_to_matrix(t[vec_col]) * scale).astype(np.int64)
        src = _chunk1(t[id_col]).to_numpy(zero_copy_only=False)
        _check_dot_bound(qi, Qc)
        D = qi @ Qc.T  # exact int64 (batch x corpus)
        # self excluded via the exclude mask; ids are sorted so column
        # index order == id order for the tiebreak
        excl = np.zeros_like(D, dtype=bool)
        excl[np.arange(len(src)), np.searchsorted(ids_c, src)] = True
        kk = min(k, len(ids_c) - 1)
        nbr = _topk_dot_id(D, kk, exclude=excl)
        rows = np.repeat(src, kk)
        return pa.table(
            {
                "src": pa.array(rows),
                "rank": pa.array(
                    np.tile(np.arange(1, kk + 1, dtype=np.int64), len(src))
                ),
                "dst": pa.array(ids_c[nbr].reshape(-1)),
                "dot": pa.array(
                    np.take_along_axis(D, nbr, axis=1).reshape(-1)
                ),
            }
        )

    return prep.map_batches(topk, batch_format="pyarrow")


def _knn_graph_tiled(prep, k, id_col, vec_col, scale, tile_rows: int = 8_192):
    """Beyond-broadcast kNN graph: the corpus is id-SORTED and re-blocked
    into ~``tile_rows`` tiles that live in the object store; every row
    batch walks the column tiles in id order keeping a running per-row
    top-k (candidates concatenate globally id-ascending, so a STABLE
    re-sort on dot alone reproduces the broadcast path's dot-desc /
    id-asc order exactly). Peak task memory: one tile + the (rows x 2k)
    merge state; no whole-corpus object anywhere."""
    import ray as _ray

    SMALL = np.iinfo(np.int64).min // 2  # self-edge dot sentinel

    def quantize(t: pa.Table) -> pa.Table:
        q = np.round(_to_matrix(t[vec_col]) * scale).astype(np.int64)
        packed = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(q).reshape(-1)), q.shape[1]
        )
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids, "__q": packed})

    n = prep.count()
    n_blocks = max(1, -(-n // tile_rows))
    mat = (
        prep.sort(id_col)  # globally id-ascending tiles
        .repartition(n_blocks)
        .map_batches(quantize, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    refs = [
        ref for bundle in mat.iter_internal_ref_bundles() for ref in bundle.block_refs
    ]

    def sweep(t: pa.Table, _refs=refs) -> pa.Table:
        qi = _to_matrix(t["__q"]).astype(np.int64)
        src = _chunk1(t[id_col]).to_numpy(zero_copy_only=False)
        rows = len(src)
        run_dot = np.empty((rows, 0), dtype=np.int64)
        run_id = np.empty((rows, 0), dtype=np.int64)
        for ref in _refs:
            tb = _ray.get(ref)
            ids_b = _chunk1(tb[id_col]).to_numpy(zero_copy_only=False)
            Qb = _to_matrix(tb["__q"]).astype(np.int64)
            _check_dot_bound(qi, Qb)
            D = qi @ Qb.T
            L = len(ids_b)
            eq = src[:, None] == ids_b[None, :]
            kk = min(k, L)
            # tile-local top-k: dot ranks first, smaller id wins ties
            # (columns are id-sorted); self excluded via the mask
            nbr = _topk_dot_id(D, kk, exclude=eq)
            t_dot = np.take_along_axis(D, nbr, axis=1)
            t_dot[np.take_along_axis(eq, nbr, axis=1)] = SMALL  # self never wins
            cand_dot = np.concatenate([run_dot, t_dot], axis=1)
            cand_id = np.concatenate([run_id, ids_b[nbr]], axis=1)
            # stable sort on dot alone: earlier (smaller-id) candidates win
            # ties because tiles arrive in global id order
            sel = np.argsort(-cand_dot, axis=1, kind="stable")[:, :k]
            run_dot = np.take_along_axis(cand_dot, sel, axis=1)
            run_id = np.take_along_axis(cand_id, sel, axis=1)
        kk = run_id.shape[1]
        keep = (run_dot.reshape(-1) > SMALL)
        return pa.table(
            {
                "src": pa.array(np.repeat(src, kk)[keep]),
                "rank": pa.array(
                    np.tile(np.arange(1, kk + 1, dtype=np.int64), rows)[keep]
                ),
                "dst": pa.array(run_id.reshape(-1)[keep]),
                "dot": pa.array(run_dot.reshape(-1)[keep]),
            }
        )

    return mat.map_batches(sweep, batch_format="pyarrow")


def quantize_int8(
    embeddings: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Symmetric per-dimension int8 quantization — the serving/ANN-index
    compression step. Each component maps to trunc(q * 127 / max|q|_dim)
    in pure integer arithmetic (q = ppm-quantized input, per-dim max from
    one d-bounded driver fold), so the quantized table is bit-identical
    across parallelism and in SQL (DuckDB's ``//`` truncates; the numpy
    arm truncates via abs-floor-sign). Emits (id, pos, q8) rows."""
    import ray as _ray

    def mpart(t: pa.Table) -> pa.Table:
        q = np.abs(np.round(_to_matrix(t[vec_col]) * scale).astype(np.int64))
        return pa.table(
            {
                "pos": pa.array(np.arange(1, q.shape[1] + 1, dtype=np.int64)),
                "m": pa.array(q.max(axis=0) if len(q) else np.zeros(0, np.int64)),
            }
        )

    mx: dict = {}
    for b in embeddings.select_columns([vec_col]).map_batches(
        mpart, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        for p, m in zip(b["pos"].to_pylist(), b["m"].to_pylist()):
            mx[p] = max(mx.get(p, 1), int(m), 1)
    d = max(mx) if mx else 0
    scales = np.array([mx.get(p, 1) for p in range(1, d + 1)], dtype=np.int64)
    ref = _ray.put(scales)

    def quant(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        q = np.round(_to_matrix(t[vec_col]) * scale).astype(np.int64)
        q8 = (np.abs(q) * 127 // m[None, :]) * np.sign(q)  # truncation
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        dd = q.shape[1]
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, dd)),
                "pos": pa.array(np.tile(np.arange(1, dd + 1, dtype=np.int64), len(ids))),
                "q8": pa.array(q8.reshape(-1)),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        quant, batch_format="pyarrow"
    )


def embedding_norms(
    embeddings: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-vector L2 norm in exact fixed point — the magnitude column a
    curation pass derives before cosine work (so unnormalized embeddings
    are visible as data, not silently renormalized).

    Components are quantized to ``round(scale * x)`` int64 FIRST, so the
    squared sum is exact integer arithmetic in both the engine and the SQL
    oracle, and the final sqrt+floor is a single correctly-rounded double
    op — bit-identical across arms (same trick as ``label_centroids``).
    Embarrassingly parallel: one zero-copy batch kernel, no shuffle.
    """

    def part(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        q = np.round(mat * scale).astype(np.int64)
        ss = (q * q).sum(axis=1)
        norm = np.floor(np.sqrt(ss.astype(np.float64))).astype(np.int64)
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(ids), "norm_fp": pa.array(norm)})

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        part, batch_format="pyarrow"
    )


def feature_scale(
    embeddings: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-dimension min-max normalization (the classic feature scaler a
    training pipeline runs before quantization) — entirely in exact fixed
    point so both arms agree bit-for-bit.

    Two-pass broadcast-stats: pass 1 reduces each batch to per-dimension
    (min, max) partials (dim rows per block, tiny) and collects the final
    dim-length table once; pass 2 re-streams the vectors applying
    ``(q - min) * scale // (max - min)`` with the stats closed over by the
    tasks. Output is long-form (id, pos, scaled_ppm) int64 rows. A
    constant dimension scales to 0 (range guard), matching the oracle.
    """
    from .relational import grouped_agg

    def stats_part(t: pa.Table) -> pa.Table:
        q = np.round(_to_matrix(t[vec_col]) * scale).astype(np.int64)
        d = q.shape[1] if len(q) else 0
        return pa.table(
            {
                "pos": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "mn": pa.array(q.min(axis=0) if len(q) else [], type=pa.int64()),
                "mx": pa.array(q.max(axis=0) if len(q) else [], type=pa.int64()),
            }
        )

    stats_ds = grouped_agg(
        embeddings.select_columns([vec_col]).map_batches(
            stats_part, batch_format="pyarrow"
        ),
        keys=["pos"], mins={"mn": "mn"}, maxs={"mx": "mx"},
    )
    stats = stats_ds.to_pandas()
    if "pos" not in stats.columns or not len(stats):  # degenerate empty input
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "scaled_ppm": pa.array([], pa.int64()),
                }
            )
        )
    stats = stats.sort_values("pos")
    mn = stats["mn"].to_numpy(dtype=np.int64)
    rng = stats["mx"].to_numpy(dtype=np.int64) - mn
    safe_rng = np.where(rng == 0, 1, rng)

    def apply(t: pa.Table, _mn=mn, _rng=rng, _safe=safe_rng) -> pa.Table:
        q = np.round(_to_matrix(t[vec_col]) * scale).astype(np.int64)
        scaled = (q - _mn) * scale // _safe
        scaled[:, _rng == 0] = 0
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        n, d = q.shape
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, d), type=pa.int64()),
                "pos": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), n)
                ),
                "scaled_ppm": pa.array(scaled.reshape(-1), type=pa.int64()),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        apply, batch_format="pyarrow"
    )


def kmeans_assign(
    embeddings: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    offset: int = 16_000_000,
) -> pa.Table:
    """Distributed Lloyd k-means over the embedding table with EXACT
    integer arithmetic end to end, so every assignment is bit-identical
    to an unrolled SQL mirror.

    Components quantize to ``round(scale*x) + offset`` (the offset keeps
    every value positive so centroid means ``sum // n`` floor identically
    in numpy and SQL; squared distances are invariant to the common
    shift). Init is the ``k`` smallest ids. Each iteration is ONE streaming
    pass: per-batch argmin assignment against the driver-broadcast k x d
    centroid matrix plus (cid, pos, sum_q, n) partial emission — the
    exchange moves k x d rows per block, never the vectors. Clusters that
    lose all members are dropped (matching SQL's natural inner-join drop).
    Ties in distance break to the smallest cid in both arms. Returns the
    final (id, cluster) assignment.
    """
    from .util import list_to_matrix

    qds = _quantize_pack_ds(embeddings, id_col, vec_col, scale, offset)

    def qmat(t: pa.Table) -> np.ndarray:
        return list_to_matrix(t["__q"], dtype=np.int64)

    cids, cents = _kmeans_train_int(qds, k, iters, id_col)

    def final(t: pa.Table, _c=cents, _ids=cids) -> pa.Table:
        q = qmat(t)
        assign = _ids[np.argmin(_int_sq_dists(q, _c), axis=1)]
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {id_col: pa.array(ids), "cluster": pa.array(assign, type=pa.int64())}
        )

    out = qds.map_batches(final, batch_format="pyarrow")
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )


def _quantize_pack_ds(
    embeddings: ray.data.Dataset, id_col: str, vec_col: str,
    scale: int, offset: int, with_unit: bool = False,
) -> ray.data.Dataset:
    """Quantize ONCE into a materialized int64 ``__q`` fixed-size-list
    dataset (``round(scale*x) + offset``): every subsequent pass (seed
    pull, per-iteration partials, final assignment, IVF probe) reads
    object-store blocks instead of re-reading parquet + re-quantizing —
    the fixed per-round cost dominates the wall at small k*d.
    ``with_unit`` additionally packs the float64 UNIT vector as
    fixed-size binary (``__u``) for consumers that follow the integer
    stages with an exact-cosine step (semdedup) — one read instead of
    two, at dim x 8 bytes/row extra only when asked for."""
    def pack(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        q = np.round(mat * scale).astype(np.int64) + offset
        packed = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(q).reshape(-1)), q.shape[1]
        )
        cols = {id_col: _chunk1(t[id_col]), "__q": packed}
        if with_unit:
            u = np.ascontiguousarray(_unit(mat))
            cols["__u"] = pa.Array.from_buffers(
                pa.binary(q.shape[1] * 8), len(t), [None, pa.py_buffer(u.tobytes())]
            )
        return pa.table(cols)

    return (
        embeddings.select_columns([id_col, vec_col])
        .map_batches(pack, batch_format="pyarrow")
        .materialize()
    )


def _int_sq_dists(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact int64 squared L2 distances, one cluster at a time (k small)."""
    out = np.empty((len(q), len(c)), dtype=np.int64)
    for j in range(len(c)):
        d = q - c[j]
        out[:, j] = (d * d).sum(axis=1)
    return out


def _kmeans_train_int(
    qds: ray.data.Dataset, k: int, iters: int, id_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """The exact-integer Lloyd trainer shared by ``kmeans_assign`` and
    ``knn_ivf``: seeds on the ``k`` SMALLEST ids in the dataset (a
    per-batch min-k partial then a tiny driver merge — NOT ``id < k``,
    which silently under-seeds when the train set is a sample with
    non-contiguous ids), then ``iters`` one-pass centroid updates with
    (cid, pos, sum_q, n) int64 partials. Returns (cids, cents); clusters
    that lose all members are dropped (SQL inner-join semantics). Every
    step is int64, so the result is bit-identical at any parallelism and
    to the unrolled SQL mirror."""
    from .relational import grouped_agg
    from .util import list_to_matrix

    def qmat(t: pa.Table) -> np.ndarray:
        return list_to_matrix(t["__q"], dtype=np.int64)

    def _seed_part(t: pa.Table) -> pa.Table:
        ids = _chunk1(t[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) > k:
            t = t.take(pa.array(np.argsort(ids, kind="stable")[:k]))
        return t

    seed_tbl = pa.concat_tables(
        qds.map_batches(_seed_part, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    seed_ids = (
        _chunk1(seed_tbl[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    order = np.argsort(seed_ids, kind="stable")[:k]
    cents = qmat(seed_tbl)[order]           # (k, d), cid = row index
    cids = np.arange(len(cents), dtype=np.int64)

    for _ in range(iters):
        def part(t: pa.Table, _c=cents, _ids=cids) -> pa.Table:
            q = qmat(t)
            assign = _ids[np.argmin(_int_sq_dists(q, _c), axis=1)]
            uniq, codes = np.unique(assign, return_inverse=True)
            kk, d = len(uniq), q.shape[1]
            sums = np.zeros((kk, d), dtype=np.int64)
            np.add.at(sums, codes, q)
            cnt = np.bincount(codes, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.repeat(uniq, d), type=pa.int64()),
                    "pos": pa.array(np.tile(np.arange(d, dtype=np.int64), kk)),
                    "sum_q": pa.array(sums.reshape(-1), type=pa.int64()),
                    "n": pa.array(np.repeat(cnt, d), type=pa.int64()),
                }
            )

        stats = grouped_agg(
            qds.map_batches(part, batch_format="pyarrow"),
            keys=["cid", "pos"], sums={"sum_q": "sum_q", "n": "n"},
        ).to_pandas().sort_values(["cid", "pos"])
        d = stats["pos"].max() + 1
        cids = stats["cid"].to_numpy(dtype=np.int64)[::d].copy()
        cents = (
            stats["sum_q"].to_numpy(dtype=np.int64)
            // stats["n"].to_numpy(dtype=np.int64)
        ).reshape(len(cids), d)

    return cids, cents
