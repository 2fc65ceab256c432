"""Sequence packing invariants: exactly-once, budget respected,
deterministic across partitionings, oversized docs isolated not dropped."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgray import packing


def _docs(tokens, nblocks=4):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(tokens), dtype=np.int64)),
            "n_tokens": pa.array(np.asarray(tokens, dtype=np.int64)),
        }
    )
    return rd.from_arrow(t).repartition(nblocks)


def _collect(ds) -> pd.DataFrame:
    parts = list(ds.iter_batches(batch_format="pandas", batch_size=1 << 16))
    return (
        pd.concat(parts, ignore_index=True).sort_values("doc_id").reset_index(drop=True)
    )


def test_invariants():
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 300, size=400)
    out = _collect(packing.pack_sequences(_docs(tokens), budget=512, num_groups=8))

    # exactly once
    assert sorted(out["doc_id"]) == list(range(400))

    # no pack over budget (no doc exceeds it here)
    per_pack = out.groupby("pack_id")["n_tokens"].sum()
    assert (per_pack <= 512).all()

    # offsets are the running prefix sum within each pack in pack_pos order
    for _, g in out.groupby("pack_id"):
        g = g.sort_values("pack_pos")
        assert list(g["offset"]) == list(np.cumsum(g["n_tokens"]) - g["n_tokens"])

    # next-fit within a group cannot leave a doc that FITS the remaining
    # space of the pack it closed... but it CAN waste space; sanity-check
    # overall utilization is reasonable for uniform sizes
    assert per_pack.mean() > 512 * 0.5


def test_deterministic_across_partitionings():
    tokens = np.arange(1, 201) % 97 + 1
    a = _collect(packing.pack_sequences(_docs(tokens, 2), budget=256, num_groups=4))
    b = _collect(packing.pack_sequences(_docs(tokens, 9), budget=256, num_groups=4))
    pd.testing.assert_frame_equal(a, b)


def test_oversized_doc_gets_own_pack():
    out = _collect(packing.pack_sequences(_docs([10, 9999, 10]), budget=100, num_groups=1))
    big = out[out["n_tokens"] == 9999].iloc[0]
    same_pack = out[out["pack_id"] == big["pack_id"]]
    assert len(same_pack) == 1  # isolated, not dropped
    assert len(out) == 3
