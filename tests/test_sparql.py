"""SPARQL text front-end: every query form must produce bit-identical
results to the equivalent JSON-grammar (bgp_*) call — the parser is a
pure compiler onto those structures, never a second engine."""

import pyarrow as pa
import pytest

import ray.data as rd

from kgray.bgp import bgp_agg, bgp_ask, bgp_describe, bgp_select, construct
from kgray.sparql import SparqlError, parse_sparql, run_sparql

TRIPLES = [
    ("a", "p", "b"), ("b", "q", "c"), ("c", "p", "d"), ("d", "p", "a"),
    ("a", "q", "d"), ("b", "p", "c"), ("e", "p", "e"), ("x", "q", "a"),
    ("c", "q", "a"), ("d", "q", "b"),
]


def _ds(triples=TRIPLES):
    return rd.from_arrow(
        pa.table(
            {
                "subject": [s for s, _, _ in triples],
                "predicate": [p for _, p, _ in triples],
                "object": [o for _, _, o in triples],
            }
        )
    ).repartition(2)


def _rows(ds):
    names = list(ds.schema().names)
    return names, sorted(
        tuple(r[v] for v in names) for r in ds.take_all()
    )


def test_select_roundtrip(ray_session):
    ds = _ds()
    got = run_sparql(ds, "SELECT ?x ?z WHERE { ?x p ?y . ?y q ?z }")
    want = bgp_select(
        ds, [("?x", "p", "?y"), ("?y", "q", "?z")], project=["?x", "?z"],
        reorder=True,
    )
    assert _rows(got) == _rows(want)


def test_select_modifiers_roundtrip(ray_session):
    ds = _ds()
    text = """
      SELECT DISTINCT ?x ?z WHERE {
        ?x p ?y . ?y q ?z .
        OPTIONAL { ?z p ?w }
        FILTER(?x != ?z)
      } ORDER BY ?x DESC(?z) LIMIT 4
    """
    got = run_sparql(ds, text)
    want = bgp_select(
        ds, [("?x", "p", "?y"), ("?y", "q", "?z")],
        optional=[("?z", "p", "?w")], filters=[("!=", "?x", "?z")],
        project=["?x", "?z"], distinct=True,
        order_by=[("?x", "asc"), ("?z", "desc")], limit=4, reorder=True,
    )
    assert _rows(got) == _rows(want)


def test_values_and_str_filters_roundtrip(ray_session):
    ds = _ds()
    got = run_sparql(
        ds,
        'SELECT ?x ?y WHERE { ?x p ?y . VALUES ?x { "a" "b" } '
        'FILTER STRSTARTS(?y, "b") }',
    )
    want = bgp_select(
        ds, [("?x", "p", "?y")], values=(("?x",), [("a",), ("b",)]),
        filters=[("prefix", "?y", "b")], project=["?x", "?y"],
    )
    assert _rows(got) == _rows(want)


def test_property_path_and_semicolon_sugar(ray_session):
    ds = _ds()
    got = run_sparql(
        ds, "SELECT ?x ?z WHERE { ?x p+ ?y ; q ?z }"
    )
    want = bgp_select(
        ds, [("?x", "p+", "?y"), ("?x", "q", "?z")],
        project=["?x", "?z"], reorder=True,
    )
    assert _rows(got) == _rows(want)


def test_not_exists_is_minus_and_exists(ray_session):
    ds = _ds()
    got = run_sparql(
        ds, "SELECT ?x ?y WHERE { ?x p ?y . FILTER NOT EXISTS "
            "{ ?y q ?z } }"
    )
    want = bgp_select(
        ds, [("?x", "p", "?y")], minus=[[("?y", "q", "?z")]],
        project=["?x", "?y"],
    )
    assert _rows(got) == _rows(want)
    got2 = run_sparql(
        ds, "SELECT ?x WHERE { ?x p ?y . FILTER EXISTS { ?y q ?z } }"
    )
    want2 = bgp_select(
        ds, [("?x", "p", "?y")], exists=[[("?y", "q", "?z")]],
        project=["?x"],
    )
    assert _rows(got2) == _rows(want2)


def test_bind_roundtrip(ray_session):
    ds = _ds()
    got = run_sparql(
        ds,
        'SELECT ?x (CONCAT(?x, "-", ?y) AS ?xy) WHERE { ?x p ?y }',
    )
    want = bgp_select(
        ds, [("?x", "p", "?y")],
        bind=[("?xy", ("concat", "?x", "-", "?y"))],
        project=["?x", "?xy"],
    )
    assert _rows(got) == _rows(want)


def test_aggregates_roundtrip(ray_session):
    ds = _ds()
    text = """
      SELECT ?x (COUNT(*) AS ?n) (GROUP_CONCAT(DISTINCT ?y) AS ?ys)
             (MIN(?y) AS ?lo)
      WHERE { ?x p ?y } GROUP BY ?x HAVING(?n >= 1)
      ORDER BY DESC(?n) ?x LIMIT 3
    """
    got = run_sparql(ds, text)
    want = bgp_agg(
        ds, [("?x", "p", "?y")], group_by=["?x"],
        aggs={"n": ("count", None), "ys": ("group_concat", "?y"),
              "lo": ("min", "?y")},
        having=[(">=", "n", "1")],
    ).sort(key=["n", "x"], descending=[True, False]).limit(3)
    assert _rows(got) == _rows(want)


def test_ask_construct_describe_roundtrip(ray_session):
    ds = _ds()
    assert run_sparql(ds, "ASK { ?x p ?y . ?y q ?z }") is bgp_ask(
        ds, [("?x", "p", "?y"), ("?y", "q", "?z")]
    )
    assert run_sparql(ds, "ASK { ?x zz ?y }") is False
    got = run_sparql(
        ds, "CONSTRUCT { ?x r ?z } WHERE { ?x p ?y . ?y q ?z }"
    )
    want = construct(
        ds, [("?x", "p", "?y"), ("?y", "q", "?z")], ("?x", "r", "?z"),
        only_new=False,
    )
    assert _rows(got) == _rows(want)
    got_d = run_sparql(ds, "DESCRIBE a")
    want_d = bgp_describe(ds, "a")
    assert _rows(got_d) == _rows(want_d)


def test_union_roundtrip(ray_session):
    """{ } UNION { } compiles to bgp_union with per-branch kwargs;
    SELECT modifiers (projection, DISTINCT, ORDER BY, LIMIT) apply on
    the union result; ASK works; aggregates over UNION refuse."""
    from kgray.bgp import bgp_union

    ds = _ds()
    text = """
      SELECT ?x ?y WHERE {
        { ?x p ?y . FILTER(?x != ?y) }
        UNION
        { ?x q ?y . ?y p ?z }
      } ORDER BY ?x ?y
    """
    got = run_sparql(ds, text)
    want = bgp_union(
        ds,
        [
            {"patterns": [("?x", "p", "?y")],
             "filters": [("!=", "?x", "?y")]},
            {"patterns": [("?x", "q", "?y"), ("?y", "p", "?z")]},
        ],
    )
    names = ["x", "y"]
    got_rows = sorted(tuple(r[v] for v in names) for r in got.take_all())
    want_rows = sorted(
        tuple(r[v] for v in names)
        for r in want.select_columns(names).take_all()
    )
    # identical multisets: same union, same (x, y) projection (branch 2
    # binds ?z too, so duplicates per z survive without DISTINCT)
    assert got_rows == want_rows and got_rows
    # DISTINCT narrows exactly
    got_d = run_sparql(
        ds,
        "SELECT DISTINCT ?x WHERE { { ?x p ?y } UNION { ?x q ?y } }",
    )
    want_d = {
        (r["x"],)
        for r in bgp_union(
            ds, [{"patterns": [("?x", "p", "?y")]},
                 {"patterns": [("?x", "q", "?y")]}]
        ).take_all()
    }
    assert {(r["x"],) for r in got_d.take_all()} == want_d
    assert got_d.count() == len(want_d)
    # ASK over union
    assert run_sparql(
        ds, "ASK { { ?x zz ?y } UNION { ?x p ?y } }"
    ) is True
    assert run_sparql(
        ds, "ASK { { ?x zz ?y } UNION { ?x yy ?y } }"
    ) is False
    with pytest.raises(SparqlError, match="UNION"):
        run_sparql(
            ds,
            "SELECT (COUNT(*) AS ?n) WHERE { { ?x p ?y } UNION "
            "{ ?x q ?y } } GROUP BY ?x",
        )


def test_subselect_roundtrip(ray_session):
    """SPARQL 1.1 subselects: the inner SELECT (here an aggregate with
    HAVING) evaluates independently and joins into the outer group as
    a driver-literal VALUES block — equivalent to the hand-built
    bgp_select with the same values relation. Aggregate outputs ride
    as decimal strings (the binding relation's only type)."""
    ds = _ds()
    text = """
      SELECT ?x ?n ?z WHERE {
        { SELECT ?x (COUNT(*) AS ?n) WHERE { ?x p ?y }
          GROUP BY ?x HAVING(?n >= 1) }
        ?x q ?z .
      } ORDER BY ?x ?z
    """
    got = run_sparql(ds, text)
    # hand-derived: every subject has exactly one p-edge; q-successors
    want = {("a", "1", "d"), ("b", "1", "c"), ("c", "1", "a"),
            ("d", "1", "b")}
    assert {(r["x"], r["n"], r["z"]) for r in got.take_all()} == want
    assert got.schema().names == ["x", "n", "z"]
    # parity with an explicit VALUES formulation
    explicit = bgp_select(
        ds, [("?x", "q", "?z")],
        values=(("?x", "?n"),
                [(s, "1") for s in ("a", "b", "c", "d", "e")]),
        project=["?x", "?n", "?z"], order_by=[("?x", "asc"), ("?z", "asc")],
    )
    assert _rows(got) == _rows(explicit)
    # contracts: one subselect per group; cap enforced; not in OPTIONAL
    import kgray.sparql as sq

    with pytest.raises(SparqlError, match="one subselect"):
        run_sparql(ds, "SELECT ?x WHERE { { SELECT ?x WHERE { ?x p ?y } }"
                       " { SELECT ?x WHERE { ?x q ?y } } ?x p ?w }")
    with pytest.raises(SparqlError, match="plain triples only"):
        parse_sparql("SELECT ?x WHERE { ?x p ?y . OPTIONAL "
                     "{ { SELECT ?z WHERE { ?z q ?w } } ?y p ?z } }")
    old = sq.SUBQUERY_ROW_CAP
    sq.SUBQUERY_ROW_CAP = 2
    try:
        with pytest.raises(SparqlError, match="SUBQUERY_ROW_CAP"):
            run_sparql(ds, text)
    finally:
        sq.SUBQUERY_ROW_CAP = old


def test_prefix_accepted_and_curies_verbatim(ray_session):
    q = parse_sparql(
        "PREFIX biolink: <https://w3id.org/biolink/vocab/>\n"
        "SELECT ?a WHERE { ?a biolink:treats ?b }"
    )
    assert q["prefixes"] == {"biolink": "https://w3id.org/biolink/vocab/"}
    assert q["patterns"] == [("?a", "biolink:treats", "?b")]
    # 'a' predicate sugar and <iri> predicates keep the engine escape
    q2 = parse_sparql("SELECT ?s WHERE { ?s a ?t . ?s <http://x/p> ?o }")
    assert q2["patterns"] == [
        ("?s", "rdf:type", "?t"), ("?s", "<http://x/p>", "?o")
    ]


def test_parse_errors():
    for bad, msg in [
        ("FROB ?x { }", "expected SELECT"),
        ("SELECT WHERE { ?x p ?y }", "SELECT needs"),
        ("SELECT ?x WHERE { ?x p ?y } trailing", "trailing"),
        ("SELECT (COUNT(?v) AS ?n) WHERE { ?x p ?v } GROUP BY ?x",
         "COUNT supports"),
        ("SELECT ?x WHERE { ?x p ?y . VALUES ?v { UNDEF } }", "UNDEF"),
        ("SELECT ?x WHERE { ?x p ?y . OPTIONAL { ?y q ?z . "
         "FILTER(?z = ?x) } }", "plain triples only"),
        ("SELECT (COUNT(*) AS ?n) WHERE { ?x p ?y }", None),
    ]:
        if msg is None:  # parses, but run_sparql needs GROUP BY
            with pytest.raises(SparqlError, match="GROUP BY"):
                run_sparql(_ds([("a", "p", "b")]), bad)
        else:
            with pytest.raises(SparqlError, match=msg):
                parse_sparql(bad)


def test_offset_on_aggregate_and_union(ray_session):
    """ADVICE r4: OFFSET parsed on every SELECT form must be APPLIED on
    every form — aggregate and UNION queries used to silently ignore
    it — and LIMIT 0 is a real empty result, not 'no limit'."""
    triples = [("s%d" % i, "p", "o%d" % (i % 3)) for i in range(10)]
    ds = _ds(triples)
    # aggregate: groups are o0 (4), o1 (3), o2 (3); ordered by ?o the
    # OFFSET 1 LIMIT 2 window is [o1, o2]
    out = run_sparql(
        ds,
        "SELECT ?o (COUNT(*) AS ?n) WHERE { ?s p ?o } "
        "GROUP BY ?o ORDER BY ?o LIMIT 2 OFFSET 1",
    )
    assert [(r["o"], r["n"]) for r in out.take_all()] == [
        ("o1", 3), ("o2", 3)
    ]
    # LIMIT 0 on the aggregate path -> zero rows
    empty = run_sparql(
        ds,
        "SELECT ?o (COUNT(*) AS ?n) WHERE { ?s p ?o } "
        "GROUP BY ?o ORDER BY ?o LIMIT 0",
    )
    assert empty.take_all() == []
    # union: subjects with o0 = s0 s3 s6 s9, with o1 = s1 s4 s7;
    # sorted union offset 2 limit 3 -> s3 s4 s6
    out2 = run_sparql(
        ds,
        "SELECT ?s WHERE { { ?s p o0 } UNION { ?s p o1 } } "
        "ORDER BY ?s LIMIT 3 OFFSET 2",
    )
    assert [r["s"] for r in out2.take_all()] == ["s3", "s4", "s6"]
    # OFFSET without LIMIT / without ORDER BY refused on these paths
    with pytest.raises(SparqlError, match="OFFSET needs LIMIT"):
        run_sparql(
            ds,
            "SELECT ?o (COUNT(*) AS ?n) WHERE { ?s p ?o } "
            "GROUP BY ?o ORDER BY ?o OFFSET 1",
        )
    with pytest.raises(SparqlError, match="ORDER BY"):
        run_sparql(
            ds,
            "SELECT ?o (COUNT(*) AS ?n) WHERE { ?s p ?o } "
            "GROUP BY ?o LIMIT 2 OFFSET 1",
        )


def test_bracketed_iri_property_paths(ray_session):
    """ADVICE r4: a path of two bracketed IRIs must parse as a
    two-step SEQUENCE, not be glued into one bogus constant."""
    triples = [
        ("a", "http://x/p", "b"), ("b", "http://y/q", "c"),
        ("c", "http://x/p", "d"),
    ]
    ds = _ds(triples)
    out = run_sparql(
        ds, "SELECT ?s ?o WHERE { ?s <http://x/p>/<http://y/q> ?o }"
    )
    assert [(r["s"], r["o"]) for r in out.take_all()] == [("a", "c")]
    # inverse and closure over bracketed IRIs
    inv = run_sparql(ds, "SELECT ?s ?o WHERE { ?s ^<http://y/q> ?o }")
    assert [(r["s"], r["o"]) for r in inv.take_all()] == [("c", "b")]
    plus = run_sparql(ds, "SELECT ?o WHERE { a <http://x/p>+ ?o }")
    assert sorted(r["o"] for r in plus.take_all()) == ["b"]
    # negated set with a bracketed member
    neg = run_sparql(ds, "SELECT ?s ?o WHERE { ?s !<http://x/p> ?o }")
    assert [(r["s"], r["o"]) for r in neg.take_all()] == [("b", "c")]
    # a single bracketed IRI stays a CONSTANT predicate (never a path)
    from kgray.bgp import _pattern_spec
    assert _pattern_spec(("?s", "<http://x/p>", "?o"))[0] is None
    # malformed bracket mixes raise loudly instead of matching nothing
    from kgray.bgp import _parse_path
    for bad in ("<http://x/p", "a<b", "<a><b>", "<>"):
        with pytest.raises(ValueError):
            _parse_path(bad)
