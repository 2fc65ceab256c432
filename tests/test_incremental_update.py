"""Incremental graph update: flagship(full) == flagship(half) + update(rest);
re-applying the same delta is a no-op (exact idempotent union)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from kgray.pipeline import KGPipeline, update_graph
from kgray.transcripts import transcripts_dataset

SF = "/root/testdata/sf0.001"


def _split(ds, keep_even: bool):
    def f(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.replace_substring(t["conv_id"].combine_chunks(), "conv-", ""),
            pa.int64(),
        )
        mask = pc.equal(pc.bit_wise_and(c, 1), 0 if keep_even else 1)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def _edge_uids(path: str) -> set:
    return set(pq.ParquetDataset(path).read(columns=["edge_uid"])["edge_uid"].to_pylist())


def _node_ids(path: str) -> set:
    return set(pq.ParquetDataset(path).read(columns=["id"])["id"].to_pylist())


def test_update_graph_matches_oneshot(ray_session, tmp_path):
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")

    base = _split(transcripts_dataset(SF), keep_even=True)
    KGPipeline(out_dir=inc_dir).run(base, fingerprint="base")

    delta = _split(transcripts_dataset(SF), keep_even=False)
    res = update_graph(inc_dir, delta)
    assert res["new_edges"] > 0 and res["new_nodes"] >= 0

    KGPipeline(out_dir=full_dir).run(transcripts_dataset(SF), fingerprint="full")

    assert _edge_uids(f"{inc_dir}/edges") == _edge_uids(f"{full_dir}/edges")
    assert _node_ids(f"{inc_dir}/nodes") == _node_ids(f"{full_dir}/nodes")

    # idempotence: the same delta again adds nothing
    res2 = update_graph(inc_dir, _split(transcripts_dataset(SF), keep_even=False))
    assert res2["new_edges"] == 0 and res2["new_nodes"] == 0
    assert res2["duplicate_edges_skipped"] == res2["metrics"]["stages"]["update"][
        "candidate_edges"
    ]
    assert _edge_uids(f"{inc_dir}/edges") == _edge_uids(f"{full_dir}/edges")

    # snapshot diff between the incremental and one-shot outputs is empty
    from kgray.pipeline import snapshot_diff

    assert snapshot_diff(full_dir, inc_dir) == {
        "added_edges": 0, "removed_edges": 0,
    }
