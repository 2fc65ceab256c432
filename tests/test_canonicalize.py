"""Union-find canonicalization: the local (broadcast) and distributed
(label-propagation) paths must produce identical canonical maps."""

import pyarrow as pa

import ray.data

from kgray.canonicalize import (
    canonical_map_distributed, canonical_map_local, rewrite_ids,
)


def _nodes():
    # components: {A,B,C} via shared keys, {D} alone, {E,F} via chain
    rows = [
        {"id": "B", "equivalent_identifiers": ["B", "k1"]},
        {"id": "A", "equivalent_identifiers": ["A", "k1", "k2"]},
        {"id": "C", "equivalent_identifiers": ["C", "k2"]},
        {"id": "D", "equivalent_identifiers": ["D"]},
        {"id": "F", "equivalent_identifiers": ["F", "k3"]},
        {"id": "E", "equivalent_identifiers": ["E", "k3"]},
    ]
    return ray.data.from_items(rows)


EXPECTED = {"A": "A", "B": "A", "C": "A", "D": "D", "E": "E", "F": "E"}


def test_local_union_find(ray_session):
    assert canonical_map_local(_nodes()) == EXPECTED


def test_distributed_label_propagation_matches_local(ray_session):
    got = canonical_map_distributed(_nodes(), num_partitions=2)
    as_dict = {r["id"]: r["canonical_id"] for r in got.take_all()}
    assert as_dict == EXPECTED


def test_rewrite_ids_broadcast(ray_session):
    edges = ray.data.from_items(
        [
            {"subject_id": "B", "object_id": "F", "predicate": "p"},
            {"subject_id": "D", "object_id": "X", "predicate": "p"},  # X unknown
        ]
    )
    out = rewrite_ids(edges, EXPECTED).take_all()
    by_subj = {r["subject_id"]: r for r in out}
    assert by_subj["A"]["object_id"] == "E"  # both endpoints rewritten
    assert by_subj["D"]["object_id"] == "X"  # unknown ids pass through
