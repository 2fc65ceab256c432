"""Sequence packing — assign documents to fixed token-budget context
windows ("packs") for LLM training.

Training dataloaders want documents concatenated into windows of at most
``budget`` tokens with minimal padding. Globally-greedy packing is
inherently sequential, so kgray uses the standard distributed compromise:

  1. route each doc to one of ``num_groups`` groups by Knuth hash of its id
     (deterministic, partition-independent);
  2. NEXT-FIT pack within each group in doc-id order (a running-capacity
     scan — O(group) integer work, bounded by corpus/num_groups);
  3. emit (doc_id, group, pack_id, pack_pos, offset) where ``offset`` is
     the token offset of the doc inside its pack.

Properties (tested):
  - every doc appears exactly once;
  - no pack exceeds ``budget`` unless a single doc alone does (an
    oversized doc gets a pack of its own rather than being dropped —
    no-silent-drop discipline; cap or split upstream if that matters);
  - the assignment is a pure function of (doc ids, token counts, budget,
    num_groups): re-runs and different partitionings give identical packs.

Scale: the only shuffle is the group-keyed bucketed one; each group's scan
is sequential BY NATURE (next-fit carries running state) but groups are
independent, so wall-time is corpus/num_groups — size ``num_groups`` to
~cluster cores like any other reduce. Pack ids are globally unique without
coordination: pack_id = group * 2^40 + local index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .sampling import knuth_hash32

_GROUP_SHIFT = 1 << 40


def _next_fit(tokens: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Sequential next-fit scan -> (local_pack_idx, offset_in_pack).

    A plain Python loop over the group's docs: next-fit is a running-state
    recurrence (pack boundary depends on every prior doc), so there is no
    exact vectorization; the loop is integer-only and bounded by the group
    size, same discipline as the bounded within-bucket verify loops in
    dedup.py.
    """
    n = len(tokens)
    packs = np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    pack, used = 0, 0
    for i in range(n):
        t = int(tokens[i])
        if used > 0 and used + t > budget:
            pack += 1
            used = 0
        packs[i] = pack
        offsets[i] = used
        used += t
    return packs, offsets


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_groups: int = 64,
) -> ray.data.Dataset:
    """-> Dataset(doc_id, n_tokens, group, pack_id, pack_pos, offset)."""
    from .relational import hash_bucketed_groupby

    def route(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, tokens_col]].copy(deep=False)
        out["group"] = (
            knuth_hash32(df[id_col].to_numpy(np.int64)) % np.int64(num_groups)
        ).astype(np.int64)
        return out

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket may hold several groups — pack each independently
        outs = []
        for g, sub in df.groupby("group", sort=True):
            sub = sub.sort_values(id_col, kind="mergesort").reset_index(drop=True)
            packs, offsets = _next_fit(sub[tokens_col].to_numpy(np.int64), budget)
            sub["pack_id"] = int(g) * _GROUP_SHIFT + packs
            sub["pack_pos"] = sub.groupby(packs).cumcount().astype(np.int64)
            sub["offset"] = offsets
            outs.append(sub)
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else df.assign(pack_id=[], pack_pos=[], offset=[])
        )

    routed = ds.map_batches(route, batch_format="pandas")
    return hash_bucketed_groupby(routed, ["group"], pack_group, num_groups)
