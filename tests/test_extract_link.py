import numpy as np
import pyarrow as pa

from kgray.extract import MentionDetector, TripleExtractor
from kgray.link import EntityLinker, build_alias_index
from kgray.transcripts import (
    entity_catalog,
    generate_turns_batch,
    transcripts_dataset,
    turn_arithmetic,
)
from tests.oracle import oracle_triples, oracle_turns


def _turns_table(doc_ids):
    return generate_turns_batch(pa.table({"doc_id": pa.array(doc_ids, pa.int64())}))


def test_generator_matches_pure_python_oracle():
    doc_ids = list(range(60))
    got = _turns_table(doc_ids).to_pylist()
    expected = oracle_turns(doc_ids)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g["conv_id"] == e["conv_id"]
        assert g["turn_idx"] == e["turn_idx"]
        assert g["role"] == e["role"]
        assert g["text"] == e["text"]
        assert g["tool"] == e["tool"]


def test_extractor_matches_oracle():
    doc_ids = list(range(80))
    batch = _turns_table(doc_ids)
    got = TripleExtractor()(batch).to_pylist()
    expected = oracle_triples(oracle_turns(doc_ids))
    assert [tuple(sorted(r.items())) for r in got] == [
        tuple(sorted(r.items())) for r in expected
    ]


def test_extractor_multiword_verbs_and_multiple_matches():
    batch = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "text": ["note Ent1 is expressed in Ent2 and Ent3 treats Ent4 ok."],
        }
    )
    out = TripleExtractor()(batch).to_pylist()
    assert len(out) == 2
    assert out[0]["predicate"] == "biolink:expressed_in"
    assert out[1]["predicate"] == "biolink:treats"


def test_extractor_empty_and_no_match():
    batch = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "text": ["nothing here.", ""],
        }
    )
    assert TripleExtractor()(batch).num_rows == 0


def test_mention_detector():
    batch = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "text": ["we saw Ent5 near Ent6."],
        }
    )
    out = MentionDetector()(batch)
    assert out["mention"].to_pylist() == ["Ent5", "Ent6"]


def test_linker_names_aliases_and_misses():
    index = build_alias_index(entity_catalog())
    linker = EntityLinker(index)
    batch = pa.table(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "subject_mention": ["Ent7", "ENT8", "Ent1500", "Ent3"],
            "predicate": ["biolink:treats"] * 4,
            "object_mention": ["Ent9", "entity 10", "Ent1", "Ent2000"],
        }
    )
    out = linker(batch).to_pylist()
    assert out[0]["subject_id"] == "RAW:7" and out[0]["object_id"] == "RAW:9"
    assert out[0]["linked"] is True
    # alias forms resolve
    assert out[1]["subject_id"] == "RAW:8" and out[1]["object_id"] == "RAW:10"
    # out-of-vocabulary mentions -> null + linked=false (J2 semantics)
    assert out[2]["subject_id"] is None and out[2]["linked"] is False
    assert out[3]["object_id"] is None and out[3]["linked"] is False


def test_transcripts_dataset_row_count(sf_dir):
    ds = transcripts_dataset(sf_dir)
    doc_ids = np.arange(500)  # sf0.001 documents rows
    expected = int((1 + doc_ids % 7).sum())
    assert ds.count() == expected
    assert set(ds.schema().names) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_unlink_plant_rate():
    a = turn_arithmetic(np.arange(0, 1000), np.zeros(1000, dtype=np.int64))
    assert a["unlink1"].sum() > 0


def test_join_linking_matches_broadcast_path(ray_session, sf_dir):
    """The distributed join path and the broadcast-dict path must agree."""
    import pyarrow as pa

    import ray.data as rd

    from kgray import extract, link, lookups
    from kgray.link import alias_forms_table, build_alias_index, link_entities_join
    from kgray.transcripts import entity_catalog, transcripts_dataset

    catalog = entity_catalog()
    triples = extract.extract_triples(transcripts_dataset(sf_dir))

    bc = link.link_entities(triples, lookups.broadcast(build_alias_index(catalog)))
    jn = link_entities_join(triples, alias_forms_table(catalog), num_partitions=4)

    key = lambda r: (r["conv_id"], r["turn_idx"], r["subject_mention"],
                     r["predicate"], r["object_mention"])
    a = sorted(bc.take_all(), key=key)
    b = sorted(
        (
            {k: r[k] for k in ("conv_id", "turn_idx", "subject_mention", "predicate",
                               "object_mention", "subject_id", "object_id", "linked")}
            for r in jn.take_all()
        ),
        key=key,
    )
    a = [
        {k: r[k] for k in ("conv_id", "turn_idx", "subject_mention", "predicate",
                           "object_mention", "subject_id", "object_id", "linked")}
        for r in a
    ]
    assert a == b


def test_join_linking_parity_case_variants_and_duplicate_names(ray_session):
    """Adversarial catalog: case-variant mentions (resolved by the broadcast
    path's lowered-mention fallback) and duplicate names (broadcast: last
    catalog row wins) must link IDENTICALLY through the join path."""
    import ray.data as rd

    from kgray import link as lk
    from kgray.link import alias_forms_table, build_alias_index, link_entities_join

    catalog = pa.table(
        {
            "id": ["E:1", "E:2", "E:3", "E:4"],
            "name": ["Aspirin", "Tylenol", "Aspirin", "ibuprofen"],
            "aliases": pa.array(
                [["ASA"], ["Paracetamol"], [], ["Advil"]],
                type=pa.list_(pa.string()),
            ),
        }
    )
    mentions = [
        "Aspirin",      # duplicate name -> LAST row (E:3) wins in both paths
        "ASPIRIN",      # case variant of a name: exact miss, lowered miss (no
                        # lowered name forms) -> unlinked in BOTH paths
        "asa",          # lowered alias form -> E:1
        "ASA",          # exact alias -> E:1
        "PARACETAMOL",  # case variant: lowered matches pre-lowered alias -> E:2
        "Ibuprofen",    # case variant of a lowercase NAME: lowered hits -> E:4
        "advil",        # lowered alias -> E:4
        "nope",         # out of vocabulary
    ]
    # distinct per-row object mentions: Ray's hash join needs >= 1 left row
    # per partition (documented caveat in link_entities_join)
    objects = ["Tylenol", "Aspirin", "ASA", "asa", "Advil", "ibuprofen",
               "PARACETAMOL", "miss-1"]
    triples = rd.from_arrow(
        pa.table(
            {
                "conv_id": ["c"] * len(mentions),
                "turn_idx": pa.array(range(len(mentions)), pa.int32()),
                "subject_mention": mentions,
                "predicate": ["p"] * len(mentions),
                "object_mention": objects,
            }
        )
    )
    bc = lk.link_entities(triples, build_alias_index(catalog)).take_all()
    jn = link_entities_join(triples, alias_forms_table(catalog), num_partitions=2).take_all()
    key = lambda r: r["turn_idx"]
    cols = ("subject_mention", "subject_id", "object_id", "linked")
    a = [{k: r[k] for k in cols} for r in sorted(bc, key=key)]
    b = [{k: r[k] for k in cols} for r in sorted(jn, key=key)]
    assert a == b
    by_mention = {r["subject_mention"]: r["subject_id"] for r in a}
    assert by_mention["Aspirin"] == "E:3"       # last duplicate name wins
    assert by_mention["ASPIRIN"] is None        # no lowered-name forms
    assert by_mention["asa"] == "E:1"
    assert by_mention["PARACETAMOL"] == "E:2"
    assert by_mention["Ibuprofen"] == "E:4"
    assert by_mention["nope"] is None
    by_obj = {r["subject_mention"]: r["object_id"] for r in a}
    assert by_obj["ASPIRIN"] == "E:3"  # object "Aspirin" -> last dup name


def test_fuzzy_name_pairs_hand_checked(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from kgray.link import fuzzy_name_pairs

    tbl = pa.table(
        {
            "id": ["n1", "n2", "n3", "n4", "n5"],
            "name": ["Aspirin", "aspirin!", "Aspirine", "Ibuprofen", "x"],
        }
    )
    out = fuzzy_name_pairs(
        rd.from_arrow(tbl).repartition(2), threshold=0.7
    ).take_all()
    got = {(r["id_a"], r["id_b"]): r["jaccard_ppm"] for r in out}
    # n1/n2 normalize identically -> jaccard 1
    assert got[("n1", "n2")] == 1_000_000
    # aspirin vs aspirine: bigrams {as,sp,pi,ir,ri,in} vs +{ne}: 6/7
    assert got[("n1", "n3")] == (1_000_000 * 6) // 7
    assert got[("n2", "n3")] == got[("n1", "n3")]
    assert set(got) == {("n1", "n2"), ("n1", "n3"), ("n2", "n3")}


def test_fuzzy_name_pairs_short_and_empty_names(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from kgray.link import fuzzy_name_pairs

    tbl = pa.table(
        {
            "id": ["a", "b", "c", "d"],
            "name": ["X", "x", "", None],  # single-char gram fallback
        }
    )
    out = fuzzy_name_pairs(rd.from_arrow(tbl), threshold=0.5).take_all()
    got = {(r["id_a"], r["id_b"]): r["jaccard_ppm"] for r in out}
    assert got == {("a", "b"): 1_000_000}  # empty/null contribute no grams
