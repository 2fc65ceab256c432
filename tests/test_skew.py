"""Hot-key skew: a dominant triple / entity must not break correctness,
and the partial-combine discipline must bound what the shuffle moves."""

import numpy as np
import pyarrow as pa

import ray.data

from kgray.materialize import _partial_dedup, build_edges


def _skewed_triples(n=20000, n_blocks=8):
    """50% of all mentions are ONE hot triple; the rest spread over 1000."""
    rng = np.random.RandomState(42)
    hot = rng.random(n) < 0.5
    s = np.where(hot, 0, rng.randint(1, 1000, n))
    o = np.where(hot, 1, rng.randint(1, 1000, n))
    p = np.where(hot, 0, rng.randint(0, 6, n))
    t = pa.table(
        {
            "conv_id": pa.array([f"conv-{i % 97}" for i in range(n)]),
            "turn_idx": pa.array((np.arange(n) % 7).astype(np.int32)),
            "subject_id": pa.array([f"RAW:{x}" for x in s]),
            "predicate": pa.array([f"biolink:p{x}" for x in p]),
            "object_id": pa.array([f"RAW:{x}" for x in o]),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks), t


def test_partial_combine_bounds_shuffle_volume():
    # within ONE block, the hot key collapses to a single row
    _, t = _skewed_triples()
    partial = _partial_dedup(t)
    # 1 hot row + at most one row per cold mention (~half the input)
    assert partial.num_rows <= 1 + 10100
    hot = partial.filter(
        pa.compute.and_(
            pa.compute.equal(partial["subject"], "RAW:0"),
            pa.compute.equal(partial["predicate"], "biolink:p0"),
        )
    )
    assert hot.num_rows == 1
    assert hot["n_mentions"][0].as_py() > 9000


def test_skewed_edges_correct(ray_session):
    ds, t = _skewed_triples()
    edges = build_edges(ds).take_all()
    by_key = {(r["subject"], r["predicate"], r["object"]): r for r in edges}
    # exact dedup: hot triple appears once with the full mention count
    hot = by_key[("RAW:0", "biolink:p0", "RAW:1")]
    n = t.num_rows
    expect_hot = sum(
        1 for s, o in zip(t["subject_id"].to_pylist(), t["object_id"].to_pylist())
        if s == "RAW:0" and o == "RAW:1"
    )
    assert hot["n_mentions"] == expect_hot
    assert sum(r["n_mentions"] for r in edges) == n
    # provenance is the minimum (conv, turn) key, deterministic under skew
    assert hot["first_conv_id"] == "conv-0"
