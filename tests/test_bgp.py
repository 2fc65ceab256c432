"""bgp_match vs a brute-force nested-loop binder on small random triple
sets, plus the structural error/empty contracts."""

import itertools

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from kgray.bgp import bgp_match

triples_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.sampled_from(["p", "q"]),
        st.sampled_from(["a", "b", "c", "d", "e"]),
    ),
    min_size=0,
    max_size=25,
    unique=True,  # bgp_match's set semantics assume distinct triples
)


def _ref_bgp(triples, patterns):
    """Nested-loop join: enumerate all pattern-to-triple assignments
    whose variable bindings agree."""
    var_order = []
    for pat in patterns:
        for t in pat:
            if t.startswith("?") and t[1:] not in var_order:
                var_order.append(t[1:])
    out = set()
    for combo in itertools.product(triples, repeat=len(patterns)):
        bind = {}
        ok = True
        for pat, trip in zip(patterns, combo):
            for term, val in zip(pat, trip):
                if term.startswith("?"):
                    v = term[1:]
                    if bind.setdefault(v, val) != val:
                        ok = False
                elif term != val:
                    ok = False
            if not ok:
                break
        if ok:
            out.add(tuple(bind[v] for v in var_order))
    return out, var_order


def _ds(triples):
    return rd.from_arrow(
        pa.table(
            {
                "subject": [s for s, _, _ in triples],
                "predicate": [p for _, p, _ in triples],
                "object": [o for _, _, o in triples],
            },
            schema=pa.schema(
                [("subject", pa.string()), ("predicate", pa.string()),
                 ("object", pa.string())]
            ),
        )
    ).repartition(2)


PATTERN_SETS = [
    [("?x", "p", "?y")],
    [("?x", "p", "?y"), ("?y", "q", "?z")],
    [("?x", "p", "?y"), ("?y", "q", "?z"), ("?x", "p", "?z")],
    [("?x", "?r", "?x")],                      # repeated variable in-pattern
    [("?x", "p", "a"), ("?x", "q", "?y")],     # constant object
]


@settings(max_examples=10, deadline=None)
@given(triples_strategy)
def test_bgp_matches_bruteforce(ray_session, triples):
    for patterns in PATTERN_SETS:
        want, var_order = _ref_bgp(triples, patterns)
        out = bgp_match(_ds(triples), patterns).take_all()
        got = {tuple(r[v] for v in var_order) for r in out}
        assert got == want, patterns
        assert len(out) == len(want), patterns  # set semantics: no dups


def _ref_optional(triples, patterns, optional):
    """Required bindings x per-optional match lists (or a null row)."""
    want, var_order = _ref_bgp(triples, patterns)
    out = set()
    for req in want:
        bind = dict(zip(var_order, req))
        per_opt = []
        for pat in optional:
            matches = []
            fresh = [t[1:] for t in pat if t.startswith("?") and t[1:] not in bind]
            for trip in triples:
                b = dict(bind)
                ok = True
                for term, val in zip(pat, trip):
                    if term.startswith("?"):
                        if b.setdefault(term[1:], val) != val:
                            ok = False
                    elif term != val:
                        ok = False
                if ok:
                    matches.append(tuple(b[v] for v in fresh))
            per_opt.append((fresh, matches or [tuple(None for _ in fresh)]))
        for combo in itertools.product(*(m for _, m in per_opt)):
            row = dict(bind)
            for (fresh, _), vals in zip(per_opt, combo):
                row.update(dict(zip(fresh, vals)))
            out.add(tuple(row[v] for v in var_order + [v for f, _ in per_opt for v in f]))
    all_vars = var_order + [v for pat in optional for v in
                            [t[1:] for t in pat if t.startswith("?")]
                            if v not in var_order]
    return out, all_vars


@settings(max_examples=10, deadline=None)
@given(triples_strategy)
def test_bgp_optional_matches_bruteforce(ray_session, triples):
    cases = [
        ([("?x", "p", "?y")], [(("?y", "q", "?z"))]),
        ([("?x", "p", "?y")], [("?y", "q", "?z"), ("?x", "q", "?w")]),
        ([("?x", "p", "?y"), ("?y", "q", "?z")], [("?z", "p", "?w")]),
    ]
    for patterns, optional in cases:
        want, all_vars = _ref_optional(triples, patterns, optional)
        res = bgp_match(_ds(triples), patterns, optional=optional)
        out = res.take_all()
        got = {tuple(r[v] for v in all_vars) for r in out}
        assert got == want, (patterns, optional)
        assert len(out) == len(want), (patterns, optional)
        assert list(res.schema().names) == all_vars, (patterns, optional)


def test_bgp_optional_contracts(ray_session):
    ds = _ds([("a", "p", "b")])
    with pytest.raises(ValueError, match="shares no variable with the"):
        bgp_match(ds, [("?x", "p", "?y")], optional=[("?u", "q", "?v")])
    with pytest.raises(ValueError, match="re-binds"):
        bgp_match(
            ds, [("?x", "p", "?y")],
            optional=[("?x", "q", "?z"), ("?y", "q", "?z")],
        )
    with pytest.raises(ValueError, match="binds no fresh"):
        bgp_match(ds, [("?x", "p", "?y")], optional=[("?x", "q", "?y")])
    # empty required side still pins required + optional columns
    out = bgp_match(
        ds, [("?x", "q", "?y")], optional=[("?y", "p", "?z")]
    )
    assert out.take_all() == []
    assert set(out.schema().names) == {"x", "y", "z"}


def test_bgp_refuses_cartesian_and_groundings(ray_session):
    ds = _ds([("a", "p", "b")])
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(ds, [("?x", "p", "?y"), ("?u", "q", "?v")])
    with pytest.raises(ValueError, match="no variables"):
        bgp_match(ds, [("a", "p", "b")])
    with pytest.raises(ValueError, match="need at least one"):
        bgp_match(ds, [])


def test_bgp_empty_join_short_circuits(ray_session):
    ds = _ds([("a", "p", "b"), ("c", "q", "d")])
    out = bgp_match(ds, [("?x", "p", "?y"), ("?y", "q", "?z")])
    tbl = out.take_all()
    assert tbl == []
    assert set(out.schema().names) == {"x", "y", "z"}


def test_construct_rule_materialization(ray_session):
    from kgray.bgp import construct

    triples = [
        ("a", "treats", "b"), ("b", "part_of", "c"), ("c", "part_of", "d"),
        ("a", "treats", "x"),            # no part_of successor -> no inference
        ("e", "treats", "f"), ("f", "part_of", "g"),
        ("e", "treats", "g"),            # inference already asserted
    ]
    ds = _ds(triples)
    rule = dict(
        patterns=[("?a", "treats", "?b"), ("?b", "part_of", "?c")],
        emit=("?a", "treats", "?c"),
    )
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in construct(ds, **rule).take_all()
    }
    assert got == {("a", "treats", "c")}  # e->g already asserted
    got_all = {
        (r["subject"], r["predicate"], r["object"])
        for r in construct(ds, only_new=False, **rule).take_all()
    }
    assert got_all == {("a", "treats", "c"), ("e", "treats", "g")}


def test_construct_contracts_and_null_skip(ray_session):
    from kgray.bgp import construct

    ds = _ds([("a", "p", "b"), ("b", "q", "c"), ("x", "p", "y")])
    with pytest.raises(ValueError, match="unbound variables"):
        construct(ds, [("?a", "p", "?b")], emit=("?a", "p", "?zzz"))
    with pytest.raises(ValueError, match="emit must be"):
        construct(ds, [("?a", "p", "?b")], emit=("?a", "?b"))
    # optional-bound null terms are skipped (SPARQL CONSTRUCT rule)
    out = construct(
        ds, [("?a", "p", "?b")], optional=[("?b", "q", "?c")],
        emit=("?a", "derived", "?c"), only_new=False,
    ).take_all()
    assert {(r["subject"], r["predicate"], r["object"]) for r in out} == {
        ("a", "derived", "c")
    }


@settings(max_examples=8, deadline=None)
@given(triples_strategy)
def test_bgp_property_path_matches_closure_bruteforce(ray_session, triples):
    # closure of the 'p' relation, brute-force
    p_edges = {(s, o) for s, p, o in triples if p == "p"}
    closure = set(p_edges)
    while True:
        new = {(a, d) for a, b in closure for c, d in p_edges if b == c}
        if new <= closure:
            break
        closure |= new
    out = bgp_match(_ds(triples), [("?x", "p+", "?y")]).take_all()
    assert {(r["x"], r["y"]) for r in out} == closure
    assert len(out) == len(closure)
    # composed with a plain pattern: q then p+ chain
    want = {
        (s, o, b) for s, p, o in triples if p == "q"
        for a, b in closure if a == o
    }
    out2 = bgp_match(
        _ds(triples), [("?x", "q", "?y"), ("?y", "p+", "?z")]
    ).take_all()
    assert {(r["x"], r["y"], r["z"]) for r in out2} == want


def test_bgp_property_path_constants_and_self(ray_session):
    ds = _ds([("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"),
              ("x", "p", "y")])
    # constant subject over the closure
    out = bgp_match(ds, [("a", "p+", "?r")]).take_all()
    assert {r["r"] for r in out} == {"a", "b", "c"}  # cycle: a reaches itself
    # repeated variable: nodes on a cycle
    out2 = bgp_match(ds, [("?n", "p+", "?n")]).take_all()
    assert {r["n"] for r in out2} == {"a", "b", "c"}


@settings(max_examples=8, deadline=None)
@given(triples_strategy)
def test_bgp_minus_matches_bruteforce(ray_session, triples):
    patterns = [("?x", "p", "?y")]
    cases = [
        [[("?y", "q", "?z")]],                      # one single-pattern group
        [[("?x", "q", "?w")], [("?y", "q", "?z")]], # two groups
        [[("?y", "q", "?z"), ("?z", "p", "?x")]],   # conjunctive group
    ]
    for minus in cases:
        want, var_order = _ref_bgp(triples, patterns)
        survivors = set()
        for binding in want:
            bind = dict(zip(var_order, binding))
            removed = False
            for group in minus:
                g_want, g_vars = _ref_bgp(triples, group)
                shared = [v for v in var_order if v in g_vars]
                g_proj = {tuple(dict(zip(g_vars, g))[v] for v in shared)
                          for g in g_want}
                if tuple(bind[v] for v in shared) in g_proj:
                    removed = True
                    break
            if not removed:
                survivors.add(binding)
        out = bgp_match(_ds(triples), patterns, minus=minus).take_all()
        got = {tuple(r[v] for v in var_order) for r in out}
        assert got == survivors, minus
        assert len(out) == len(survivors), minus


def test_bgp_minus_contract(ray_session):
    ds = _ds([("a", "p", "b")])
    with pytest.raises(ValueError, match="minus group"):
        bgp_match(ds, [("?x", "p", "?y")], minus=[[("?u", "q", "?v")]])


def _path_pairs(triples, expr):
    """Brute-force property-path relation."""
    if expr.startswith("!"):
        excl = set(expr[1:].split("|"))
        return {(s, o) for s, p, o in triples if p not in excl}
    mod = expr[-1] if expr and expr[-1] in "+*?" else None
    body = expr[:-1] if mod else expr
    pairs = set()
    for alt in body.split("|"):
        inv = alt.startswith("^")
        pred = alt[1:] if inv else alt
        for s, p, o in triples:
            if p == pred:
                pairs.add((o, s) if inv else (s, o))
    if mod in ("+", "*"):
        while True:
            new = {(a, d) for a, b in pairs for c, d in pairs if b == c}
            if new <= pairs:
                break
            pairs |= new
    if mod in ("*", "?"):
        terms = {s for s, _, _ in triples} | {o for _, _, o in triples}
        pairs |= {(t, t) for t in terms}
    return pairs


@settings(max_examples=8, deadline=None)
@given(triples_strategy)
def test_bgp_path_grammar_matches_bruteforce(ray_session, triples):
    for expr in ("^p", "p|q", "^p|q", "(never)|p".replace("(never)", "zz"),
                 "p|^p", "p|^p+", "p*", "p?", "^p*", "p|q?", "zz*",
                 "!p", "!q", "!p|q", "!zz"):
        # note: 'p|^p+' parses as closure OVER the union (grammar: one
        # trailing +), i.e. undirected reachability for p
        want = _path_pairs(triples, expr)
        out = bgp_match(_ds(triples), [("?x", expr, "?y")]).take_all()
        got = {(r["x"], r["y"]) for r in out}
        assert got == want, expr
        assert len(out) == len(want), expr


def test_bgp_path_grammar_errors(ray_session):
    ds = _ds([("a", "p", "b")])
    for bad in ("p++", "p|", "^", "|p", "p|^", "p*?", "p+*", "*", "p?|q",
                "!", "!p+", "!^p", "!p|", "p|!q"):
        with pytest.raises(ValueError, match="unsupported (property path|negated property set)"):
            bgp_match(ds, [("?x", bad, "?y")])


def test_infer_fixpoint_ancestor_program_matches_closure(ray_session):
    from kgray.bgp import infer_fixpoint
    from kgray import graphalgo

    triples = [("a", "part_of", "b"), ("b", "part_of", "c"),
               ("c", "part_of", "d"), ("x", "part_of", "y"),
               ("a", "anc", "b")]  # one ancestor fact pre-asserted
    ds = _ds(triples)
    rules = [
        {"patterns": [("?x", "part_of", "?y")], "emit": ("?x", "anc", "?y")},
        {"patterns": [("?x", "anc", "?y"), ("?y", "anc", "?z")],
         "emit": ("?x", "anc", "?z")},
    ]
    out = infer_fixpoint(ds, rules).take_all()
    got = {(r["subject"], r["object"]) for r in out}
    assert all(r["predicate"] == "anc" for r in out)
    closure = {
        (r["src"], r["dst"])
        for r in graphalgo.transitive_closure(
            _ds([t for t in triples if t[1] == "part_of"]).map_batches(
                lambda t: t.rename_columns(["src", "predicate", "dst"]),
                batch_format="pyarrow",
            )
        ).take_all()
    }
    assert got == closure - {("a", "b")}  # pre-asserted fact not re-emitted


def test_infer_fixpoint_empty_and_contract(ray_session):
    from kgray.bgp import infer_fixpoint

    ds = _ds([("a", "p", "b")])
    with pytest.raises(ValueError, match="at least one rule"):
        infer_fixpoint(ds, [])
    out = infer_fixpoint(
        ds, [{"patterns": [("?x", "q", "?y")], "emit": ("?x", "r", "?y")}]
    )
    assert out.take_all() == []
    assert set(out.schema().names) == {"subject", "predicate", "object"}


# ---- dual-path parity: local Arrow fold vs distributed join fold ----
# broadcast_limit=0 forces every stage onto the distributed plan; the
# default routes everything driver-local. Same inputs, bit-identical
# binding sets and schemas (the transitive_closure parity discipline).

_PARITY_TRIPLES = [
    ("a", "p", "b"), ("b", "q", "c"), ("c", "p", "d"), ("d", "p", "a"),
    ("a", "q", "d"), ("b", "p", "c"), ("e", "p", "e"), ("x", "q", "a"),
    ("c", "q", "a"), ("d", "q", "b"),
]


def _rows(ds, names):
    return sorted(tuple(r[v] for v in names) for r in ds.take_all())


def test_bgp_dual_path_parity(ray_session):
    cases = [
        dict(patterns=[("?x", "p", "?y"), ("?y", "q", "?z")]),
        dict(patterns=[("?x", "p", "?y")],
             optional=[("?y", "q", "?z"), ("?x", "q", "?w")]),
        dict(patterns=[("?x", "p", "?y")],
             minus=[[("?y", "q", "?z")], [("?x", "q", "?w"), ("?w", "p", "?v")]]),
        dict(patterns=[("?x", "p+", "?y"), ("?y", "q", "?z")]),
        dict(patterns=[("?x", "p*", "?y"), ("?y", "q", "?z")]),
        dict(patterns=[("?x", "q?", "?y")]),
        dict(patterns=[("?x", "!q", "?y")]),
        dict(patterns=[("?x", "p|^q", "?y")]),
        dict(patterns=[("?n", "p|^p+", "?n")]),
        dict(patterns=[("?x", "zz", "?y")],            # empty required side
             optional=[("?y", "p", "?z")]),
    ]
    ds = _ds(_PARITY_TRIPLES)
    for case in cases:
        local = bgp_match(ds, **case)
        dist = bgp_match(ds, broadcast_limit=0, **case)
        names = list(local.schema().names)
        assert list(dist.schema().names) == names, case
        assert _rows(local, names) == _rows(dist, names), case


def test_bgp_dual_path_contract_parity(ray_session):
    ds = _ds(_PARITY_TRIPLES)
    failing = [
        dict(patterns=[("?x", "p", "?y"), ("?u", "q", "?v")]),
        dict(patterns=[("?x", "p", "?y")], optional=[("?u", "q", "?v")]),
        dict(patterns=[("?x", "p", "?y")],
             optional=[("?x", "q", "?z"), ("?y", "q", "?z")]),
        dict(patterns=[("?x", "p", "?y")], optional=[("?x", "q", "?y")]),
        dict(patterns=[("?x", "p", "?y")], minus=[[("?u", "q", "?v")]]),
        dict(patterns=[("?x", "p++", "?y")]),
    ]
    for case in failing:
        with pytest.raises(ValueError):
            bgp_match(ds, **case)
        with pytest.raises(ValueError):
            bgp_match(ds, broadcast_limit=0, **case)


def test_bgp_filters_match_bruteforce(ray_session):
    patterns = [("?x", "p", "?y"), ("?y", "q", "?z")]
    ref, var_order = _ref_bgp(_PARITY_TRIPLES, patterns)
    cases = [
        ([("!=", "?x", "?z")], lambda x, y, z: x != z),
        ([("<", "?x", "?y")], lambda x, y, z: x < y),
        ([("==", "?z", "a")], lambda x, y, z: z == "a"),
        ([(">=", "?y", "b"), ("!=", "?x", "?z")],
         lambda x, y, z: y >= "b" and x != z),
        ([("prefix", "?x", "a")], lambda x, y, z: x.startswith("a")),
        ([("contains", "?y", "c")], lambda x, y, z: "c" in y),
        ([("regex", "?z", "^[ab]$")], lambda x, y, z: z in ("a", "b")),
    ]
    ds = _ds(_PARITY_TRIPLES)
    for filters, pred in cases:
        want = sorted(r for r in ref if pred(*r))
        for limit in (2_000_000, 0):
            got = bgp_match(
                ds, patterns, filters=filters, broadcast_limit=limit
            )
            assert _rows(got, var_order) == want, (filters, limit)


def test_bgp_filter_null_optional_semantics(ray_session):
    # SPARQL error-is-false: a filter over an unmatched OPTIONAL
    # variable drops the row on both plan arms
    triples = [("a", "p", "b"), ("b", "q", "c"), ("d", "p", "e")]
    ds = _ds(triples)
    spec = dict(
        patterns=[("?x", "p", "?y")], optional=[("?y", "q", "?z")],
    )
    for limit in (2_000_000, 0):
        keep = bgp_match(
            ds, filters=[("==", "?z", "c")], broadcast_limit=limit, **spec
        )
        assert _rows(keep, ["x", "y", "z"]) == [("a", "b", "c")], limit
        none = bgp_match(
            ds, filters=[("!=", "?z", "c")], broadcast_limit=limit, **spec
        )
        assert _rows(none, ["x", "y", "z"]) == [], limit


def test_bgp_values_matches_bruteforce(ray_session):
    patterns = [("?x", "p", "?y")]
    ref, var_order = _ref_bgp(_PARITY_TRIPLES, patterns)
    ds = _ds(_PARITY_TRIPLES)
    # seed restriction (shared var only), incl. a seed matching nothing
    seeds = (("?x",), [("a",), ("d",), ("zz",)])
    want = sorted(r for r in ref if r[0] in ("a", "d", "zz"))
    for limit in (2_000_000, 0):
        got = bgp_match(ds, patterns, values=seeds, broadcast_limit=limit)
        assert _rows(got, var_order) == want, limit
    # fresh variable rides along as an extra column; duplicate rows in
    # the block collapse (set semantics)
    tagged = (("?x", "?tag"), [("a", "t1"), ("b", "t2"), ("a", "t1")])
    want_tagged = sorted(
        r + ("t1" if r[0] == "a" else "t2",)
        for r in ref if r[0] in ("a", "b")
    )
    for limit in (2_000_000, 0):
        got = bgp_match(ds, patterns, values=tagged, broadcast_limit=limit)
        assert _rows(got, var_order + ["tag"]) == want_tagged, limit


def test_bgp_filter_values_contracts(ray_session):
    ds = _ds(_PARITY_TRIPLES)
    failing = [
        dict(patterns=[("?x", "p", "?y")], filters=[("!=", "?x", "?u")]),
        dict(patterns=[("?x", "p", "?y")], filters=[("!=", "?u", "a")]),
        dict(patterns=[("?x", "p", "?y")], filters=[("!=", "x", "a")]),
        dict(patterns=[("?x", "p", "?y")], filters=[("between", "?x", "a")]),
        dict(patterns=[("?x", "p", "?y")], filters=[("contains", "?x", "?y")]),
        dict(patterns=[("?x", "p", "?y")], values=(("?u",), [("a",)])),
        dict(patterns=[("?x", "p", "?y")], values=(("x",), [("a",)])),
        dict(patterns=[("?x", "p", "?y")], values=(("?x", "?x"), [("a", "b")])),
        dict(patterns=[("?x", "p", "?y")], values=(("?x",), [("a", "b")])),
        dict(patterns=[("?x", "p", "?y")], values=(("?x",), [(None,)])),
    ]
    for case in failing:
        for limit in (2_000_000, 0):
            with pytest.raises(ValueError):
                bgp_match(ds, broadcast_limit=limit, **case)


def test_bgp_exists_matches_bruteforce(ray_session):
    patterns = [("?x", "p", "?y")]
    ref, var_order = _ref_bgp(_PARITY_TRIPLES, patterns)
    witnesses = {s for s, p, o in _PARITY_TRIPLES if p == "q"}
    want = sorted(r for r in ref if r[1] in witnesses)
    ds = _ds(_PARITY_TRIPLES)
    for limit in (2_000_000, 0):
        out = bgp_match(
            ds, patterns, exists=[[("?y", "q", "?z")]],
            broadcast_limit=limit,
        )
        assert _rows(out, var_order) == want, limit
        # uncorrelated exists group refused
        with pytest.raises(ValueError, match="exists group"):
            bgp_match(
                ds, patterns, exists=[[("?u", "q", "?v")]],
                broadcast_limit=limit,
            )
        # exists group matching nothing empties the result
        none = bgp_match(
            ds, patterns, exists=[[("?y", "zz", "?z")]],
            broadcast_limit=limit,
        )
        assert _rows(none, var_order) == [], limit


def test_fixpoint_exists_sees_derived_witnesses(ray_session):
    from kgray.bgp import infer_fixpoint

    # rule 2's EXISTS witness is only derived by rule 1 — the
    # conservative (non-semi-naive) re-match must still find it
    triples = [("a", "p", "b"), ("b", "r", "c")]
    rules = [
        {"patterns": [("?x", "r", "?y")], "emit": ("?x", "q", "?y")},
        {"patterns": [("?x", "p", "?y")],
         "exists": [[("?y", "q", "?z")]],
         "emit": ("?x", "s", "?y")},
    ]
    names = ["subject", "predicate", "object"]
    for limit in (2_000_000, 0):
        out = infer_fixpoint(_ds(triples), rules, broadcast_limit=limit)
        got = set(_rows(out, names))
        assert ("a", "s", "b") in got, limit
        assert got == {("b", "q", "c"), ("a", "s", "b")}, limit
    # negation inside the loop is refused
    with pytest.raises(ValueError, match="non-monotone"):
        infer_fixpoint(
            _ds(triples),
            [{"patterns": [("?x", "p", "?y")],
              "minus": [[("?y", "r", "?z")]],
              "emit": ("?x", "s", "?y")}],
        )


def test_infer_fixpoint_mixed_rule_delta_restricted(ray_session, monkeypatch):
    """Mixed rules (plain atoms alongside EXISTS / path atoms) whose
    non-plain predicate footprint a round's delta cannot touch run
    DELTA-RESTRICTED after round 1: the full re-match (construct) fires
    exactly once per rule, later rounds ride the sources hook, a
    footprint-free pure-path rule is skipped outright — and the result
    is bit-identical to the conservative always-re-match arm."""
    import kgray.bgp as bgp

    triples = [("a", "part_of", "b"), ("b", "part_of", "c"),
               ("c", "part_of", "d"), ("d", "part_of", "e"),
               ("a", "flag", "ok")]
    rules = [
        # plain closure program (feeds itself -> several rounds)
        {"patterns": [("?x", "part_of", "?y")], "emit": ("?x", "anc", "?y")},
        {"patterns": [("?x", "anc", "?y"), ("?y", "anc", "?z")],
         "emit": ("?x", "anc", "?z")},
        # MIXED: plain atom + EXISTS over the never-derived 'flag'
        {"patterns": [("?x", "anc", "?y")],
         "exists": [[("?x", "flag", "?f")]],
         "emit": ("?x", "reaches", "?y")},
        # pure-path rule over the never-derived 'part_of' -> after
        # round 1 it can derive nothing and is skipped entirely
        {"patterns": [("?x", "part_of/part_of", "?y")],
         "emit": ("?x", "grand", "?y")},
    ]
    chain = ["a", "b", "c", "d", "e"]
    anc = {(chain[i], chain[j]) for i in range(5) for j in range(i + 1, 5)}
    want = {("anc", s, o) for s, o in anc}
    want |= {("reaches", "a", o) for o in chain[1:]}
    want |= {("grand", chain[i], chain[i + 2]) for i in range(3)}

    calls = []
    orig_construct = bgp.construct

    def spy(graph, patterns, emit, **kw):
        calls.append(tuple(emit))
        return orig_construct(graph, patterns, emit, **kw)

    monkeypatch.setattr(bgp, "construct", spy)
    out = bgp.infer_fixpoint(_ds(triples), rules, broadcast_limit=0)
    got = {(r["predicate"], r["subject"], r["object"])
           for r in out.take_all()}
    assert got == want
    # every rule full-matched exactly ONCE (round 1); all later rounds
    # were delta-restricted or skipped — the cost-proportionality claim
    assert sorted(calls) == sorted(
        [tuple(r["emit"]) for r in rules]
    ), calls

    # parity vs the conservative arm (force every round to re-match)
    monkeypatch.setattr(bgp, "_delta_touches", lambda *_a, **_k: True)
    conservative = bgp.infer_fixpoint(_ds(triples), rules, broadcast_limit=0)
    got_c = {(r["predicate"], r["subject"], r["object"])
             for r in conservative.take_all()}
    assert got_c == want


def test_bgp_ask(ray_session):
    from kgray.bgp import bgp_ask

    ds = _ds(_PARITY_TRIPLES)
    for limit in (2_000_000, 0):
        assert bgp_ask(
            ds, [("?x", "p", "?y"), ("?y", "q", "?z")],
            broadcast_limit=limit,
        ) is True
        assert bgp_ask(
            ds, [("?x", "zz", "?y")], broadcast_limit=limit
        ) is False
        # kwargs pass through: a filter can flip the answer
        assert bgp_ask(
            ds, [("?x", "p", "?y")], filters=[("==", "?x", "nope")],
            broadcast_limit=limit,
        ) is False


def test_bgp_describe(ray_session):
    from kgray.bgp import bgp_describe

    ds = _ds(_PARITY_TRIPLES)
    out = bgp_describe(ds, "a")
    got = {
        (r["subject"], r["predicate"], r["object"]) for r in out.take_all()
    }
    want = {t for t in _PARITY_TRIPLES if t[0] == "a" or t[2] == "a"}
    assert got == want
    assert bgp_describe(ds, "nope").take_all() == []


def test_bgp_count_matches_bruteforce(ray_session):
    from collections import Counter

    from kgray.bgp import bgp_count

    patterns = [("?x", "p", "?y")]
    ref, _ = _ref_bgp(_PARITY_TRIPLES, patterns)
    cnt = Counter(x for x, y in ref)
    ds = _ds(_PARITY_TRIPLES)
    for limit in (2_000_000, 0):
        out = bgp_count(
            ds, patterns, group_by=["?x"], broadcast_limit=limit
        )
        assert {r["x"]: r["n"] for r in out.take_all()} == dict(cnt), limit
        having = bgp_count(
            ds, patterns, group_by=["?x"], min_count=2,
            broadcast_limit=limit,
        )
        assert {r["x"]: r["n"] for r in having.take_all()} == {
            k: v for k, v in cnt.items() if v >= 2
        }, limit
    # match kwargs pass through (filters here)
    flt = bgp_count(
        ds, patterns, group_by=["?x"], filters=[("!=", "?x", "?y")]
    )
    want = Counter(x for x, y in ref if x != y)
    assert {r["x"]: r["n"] for r in flt.take_all()} == dict(want)
    with pytest.raises(ValueError, match="unbound"):
        bgp_count(ds, patterns, group_by=["?z"])
    with pytest.raises(ValueError, match="group_by"):
        bgp_count(ds, patterns, group_by=[])


def test_bgp_union_matches_bruteforce(ray_session):
    from kgray.bgp import bgp_union

    branches = [
        dict(patterns=[("?x", "p", "?y"), ("?y", "q", "?z")]),
        dict(patterns=[("?x", "q", "?y")],
             filters=[("!=", "?x", "?y")]),
    ]
    ref1, vars1 = _ref_bgp(_PARITY_TRIPLES, branches[0]["patterns"])
    ref2, vars2 = _ref_bgp(_PARITY_TRIPLES, branches[1]["patterns"])
    all_vars = vars1 + [v for v in vars2 if v not in vars1]
    want = set(ref1) | {(x, y, None) for x, y in ref2 if x != y}
    ds = _ds(_PARITY_TRIPLES)
    for limit in (2_000_000, 0):
        out = bgp_union(ds, branches, broadcast_limit=limit)
        assert list(out.schema().names) == all_vars, limit
        got = [tuple(r[v] for v in all_vars) for r in out.take_all()]
        assert set(got) == want and len(got) == len(want), limit

    # overlapping branches dedup to the alternation relation
    overlap = [
        dict(patterns=[("?x", "p", "?y")]),
        dict(patterns=[("?x", "p|q", "?y")]),
    ]
    want_overlap = _path_pairs(_PARITY_TRIPLES, "p|q")
    for limit in (2_000_000, 0):
        out = bgp_union(ds, overlap, broadcast_limit=limit)
        got = _rows(out, ["x", "y"])
        assert set(got) == want_overlap and len(got) == len(want_overlap)

    # single branch passes through; empty branch list refused
    single = bgp_union(ds, [dict(patterns=[("?x", "p", "?y")])])
    assert set(_rows(single, ["x", "y"])) == _path_pairs(_PARITY_TRIPLES, "p")
    with pytest.raises(ValueError):
        bgp_union(ds, [])


def test_construct_and_fixpoint_filters_values(ray_session):
    from kgray.bgp import construct, infer_fixpoint

    ds = _ds(_PARITY_TRIPLES)
    spec = dict(
        patterns=[("?a", "p", "?b"), ("?b", "q", "?c")],
        emit=("?a", "r", "?c"),
        filters=[("!=", "?a", "?c")],
        values=(("?a",), [("a",), ("b",), ("c",), ("d",)]),
        only_new=False,
    )
    names = ["subject", "predicate", "object"]
    local = construct(ds, **spec)
    dist = construct(ds, broadcast_limit=0, **spec)
    rows = _rows(local, names)
    assert rows == _rows(dist, names)
    assert rows and all(s != o and p == "r" for s, p, o in rows)

    # a filtered recursive rule stays sound under semi-naive evaluation:
    # the irreflexive ancestor program on both arms
    rules = [
        {"patterns": [("?x", "p", "?y")], "emit": ("?x", "anc", "?y"),
         "filters": [("!=", "?x", "?y")]},
        {"patterns": [("?x", "p", "?y"), ("?y", "anc", "?z")],
         "emit": ("?x", "anc", "?z"), "filters": [("!=", "?x", "?z")]},
    ]
    local = infer_fixpoint(ds, rules)
    dist = infer_fixpoint(ds, rules, broadcast_limit=0)
    rows = _rows(local, names)
    assert rows == _rows(dist, names)
    assert rows and all(s != o for s, _, o in rows)


def test_construct_delta_matches_full_eval(ray_session):
    from kgray.bgp import construct, construct_delta

    old = [("a", "p", "b"), ("b", "q", "c"), ("c", "p", "d")]
    delta = [("d", "q", "e"), ("x", "p", "y")]
    patterns = [("?u", "p", "?v"), ("?v", "q", "?w")]
    emit = ("?u", "r", "?w")
    names = ["subject", "predicate", "object"]
    for limit in (2_000_000, 0):
        full = construct(
            _ds(old + delta), patterns, emit, only_new=False,
            broadcast_limit=limit,
        )
        old_only = construct(
            _ds(old), patterns, emit, only_new=False, broadcast_limit=limit
        )
        inc = construct_delta(
            _ds(old), _ds(delta), patterns, emit, only_new=False,
            broadcast_limit=limit,
        )
        inc_rows = set(_rows(inc, names))
        # maintenance identity: full = old-only ∪ delta-enabled
        assert set(_rows(full, names)) == set(
            _rows(old_only, names)
        ) | inc_rows, limit
        # the delta enables (c, r, e) via p(c,d) ⋈ q(d,e)
        assert ("c", "r", "e") in inc_rows, limit
        # a purely-old derivation is NOT re-derived
        assert ("a", "r", "c") not in inc_rows, limit
    # property-path atoms can't be delta-restricted
    with pytest.raises(ValueError, match="property path"):
        construct_delta(
            _ds(old), _ds(delta), [("?u", "p+", "?v")], ("?u", "r", "?v")
        )
    # sources arity contract on bgp_match
    with pytest.raises(ValueError, match="sources"):
        bgp_match(_ds(old), patterns, sources=[None])


def test_construct_and_fixpoint_dual_path_parity(ray_session):
    from kgray.bgp import construct, infer_fixpoint

    ds = _ds(_PARITY_TRIPLES)
    spec = dict(
        patterns=[("?a", "p", "?b"), ("?b", "q", "?c")],
        emit=("?a", "p", "?c"),
    )
    for only_new in (True, False):
        names = ["subject", "predicate", "object"]
        local = construct(ds, only_new=only_new, **spec)
        dist = construct(ds, only_new=only_new, broadcast_limit=0, **spec)
        assert _rows(local, names) == _rows(dist, names), only_new

    rules = [
        {"patterns": [("?x", "p", "?y")], "emit": ("?x", "anc", "?y")},
        {"patterns": [("?x", "anc", "?y"), ("?y", "anc", "?z")],
         "emit": ("?x", "anc", "?z")},
    ]
    names = ["subject", "predicate", "object"]
    local = infer_fixpoint(ds, rules)
    dist = infer_fixpoint(ds, rules, broadcast_limit=0)
    assert _rows(local, names) == _rows(dist, names)


# ---------------------------------------------------------------------------
# reorder (selectivity-greedy join order) + bgp_select solution modifiers
# ---------------------------------------------------------------------------

def test_bgp_reorder_parity(ray_session):
    """Inner joins commute: reorder=True must return the identical
    binding SET, in the identical column order, on BOTH plan arms —
    including with values/optional/minus/exists riding along."""
    cases = [
        dict(patterns=[("?x", "p", "?y"), ("?y", "q", "?z")]),
        # constant-predicate pattern last: greedy should pull it first
        dict(patterns=[("?x", "?r", "?y"), ("?y", "q", "c")]),
        dict(patterns=[("?x", "p", "?y"), ("?y", "q", "?z"),
                       ("?z", "p", "?w")]),
        dict(patterns=[("?x", "p+", "?y"), ("?y", "q", "?z")]),
        dict(patterns=[("?x", "p", "?y"), ("?y", "q", "?z")],
             optional=[("?z", "p", "?w")],
             minus=[[("?x", "q", "?u")]],
             filters=[("!=", "?x", "?z")]),
        dict(patterns=[("?x", "p", "?y"), ("?y", "q", "?z")],
             values=(("?x",), [("a",), ("b",), ("zz",)])),
    ]
    ds = _ds(_PARITY_TRIPLES)
    for case in cases:
        base = bgp_match(ds, **case)
        names = list(base.schema().names)
        for kwargs in (dict(), dict(broadcast_limit=0)):
            re = bgp_match(ds, reorder=True, **kwargs, **case)
            assert list(re.schema().names) == names, (case, kwargs)
            assert _rows(re, names) == _rows(base, names), (case, kwargs)


def test_bgp_reorder_disconnected_still_raises(ray_session):
    ds = _ds(_PARITY_TRIPLES)
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(
            ds, [("?x", "p", "?y"), ("?u", "q", "?v")], reorder=True
        )


def test_greedy_order_prefers_selective_pattern(ray_session):
    from kgray.bgp import _greedy_pattern_order

    ds = _ds(_PARITY_TRIPLES)
    # ?y q c matches exactly 1 triple; the open scan matches all 10:
    # greedy must start from the constant pattern (index 1)
    patterns = [("?x", "?r", "?y"), ("?y", "q", "c")]
    order = _greedy_pattern_order(ds.materialize(), patterns, [None, None])
    assert order == [1, 0]
    # already-optimal user order is a no-op
    assert _greedy_pattern_order(
        ds.materialize(), list(reversed(patterns)), [None, None]
    ) is None


def test_bgp_select_matches_duckdb(ray_session):
    import duckdb

    from kgray.bgp import bgp_select

    tbl = pa.table(
        {
            "subject": [s for s, _, _ in _PARITY_TRIPLES],
            "predicate": [p for _, p, _ in _PARITY_TRIPLES],
            "object": [o for _, _, o in _PARITY_TRIPLES],
        }
    )
    ds = _ds(_PARITY_TRIPLES)
    out = bgp_select(
        ds,
        [("?x", "p", "?y"), ("?y", "q", "?z")],
        bind=[("?tag", ("concat", "?x", "-", ("upper", "?z"))),
              ("?ln", ("strlen", ("concat", "?x", "?y")))],
        project=["?tag", "?ln"],
        distinct=True,
        order_by=[("?tag", "desc"), ("?ln", "asc")],
        limit=4,
        offset=1,
        reorder=True,
    )
    got = [(r["tag"], r["ln"]) for r in out.take_all()]
    con = duckdb.connect()
    con.register("e", tbl)
    want = con.execute(
        """
        SELECT DISTINCT e1.subject || '-' || UPPER(e2.object) AS tag,
               CAST(LENGTH(e1.subject || e1.object) AS VARCHAR) AS ln
        FROM e e1 JOIN e e2 ON e2.subject = e1.object
        WHERE e1.predicate = 'p' AND e2.predicate = 'q'
        ORDER BY tag DESC, ln ASC LIMIT 4 OFFSET 1
        """
    ).fetchall()
    assert got == want
    con.close()


def test_bgp_select_topk_matches_full_sort(ray_session):
    """The distributed per-block top-k must equal sort-everything-then-
    slice for every (limit, offset) cut, including past-the-end."""
    from kgray.bgp import bgp_select

    ds = _ds(_PARITY_TRIPLES)
    full = bgp_select(
        ds, [("?x", "?r", "?y")], order_by=[("?x", "asc"), ("?y", "desc"),
                                            ("?r", "asc")],
    ).take_all()
    rows = [(r["x"], r["r"], r["y"]) for r in full]
    for limit, offset in [(3, 0), (5, 2), (100, 0), (2, 9), (4, 100), (0, 0)]:
        out = bgp_select(
            ds, [("?x", "?r", "?y")],
            order_by=[("?x", "asc"), ("?y", "desc"), ("?r", "asc")],
            limit=limit, offset=offset,
        ).take_all()
        assert [(r["x"], r["r"], r["y"]) for r in out] == rows[
            offset:offset + limit
        ], (limit, offset)


def test_bgp_select_bind_null_semantics(ray_session):
    """concat over an unmatched OPTIONAL variable nulls the row's value
    (SQL || semantics); coalesce patches it — both per SPARQL/DuckDB."""
    from kgray.bgp import bgp_select

    ds = _ds(_PARITY_TRIPLES)
    out = bgp_select(
        ds,
        [("?x", "p", "?y")],
        optional=[("?y", "q", "?z")],
        bind=[("?joined", ("concat", "?x", "/", "?z")),
              ("?safe", ("coalesce", "?z", "none"))],
    )
    rows = {(r["x"], r["y"]): (r["joined"], r["safe"]) for r in out.take_all()}
    assert rows[("a", "b")] == ("a/c", "c")      # b -q-> c exists
    assert rows[("c", "d")] == ("c/b", "b")      # d -q-> b exists
    assert rows[("e", "e")] == (None, "none")    # no e -q-> ? triple


def test_bgp_select_contracts(ray_session):
    from kgray.bgp import bgp_select

    ds = _ds(_PARITY_TRIPLES)
    pats = [("?x", "p", "?y")]
    for bad in [
        dict(bind=[("?x", ("upper", "?y"))]),            # rebind
        dict(bind=[("?n", ("nope", "?x"))]),             # unknown op
        dict(bind=[("?n", ("upper", "?zz"))]),           # unbound var
        dict(bind=[("?n", ("substr", "?x", 0))]),        # 0-based start
        dict(bind=[("?n", ("substr", "?x", 1, -1))]),    # negative length
        dict(bind=[("?n", ("concat", "?x"))]),           # arity
        dict(bind=[("?n", ("replace", "?x", 1, "y"))]),  # non-str pattern
        dict(project=["?zz"]),                           # unknown project
        dict(project=["?x", "?x"]),                      # repeated project
        dict(order_by=[("?zz", "asc")]),                 # unknown order key
        dict(order_by=[("?x", "up")]),                   # bad direction
        dict(limit=-1),                                  # negative limit
        dict(offset=3),                                  # offset sans limit
    ]:
        with pytest.raises(ValueError):
            bgp_select(ds, pats, **bad)


# ---------------------------------------------------------------------------
# sequence property paths (p1/p2)
# ---------------------------------------------------------------------------

def _brute_seq(triples, seqs):
    """Alternation-of-sequences reference: compose each sequence left to
    right over the triple set, union the alternatives."""
    out = set()
    for seq in seqs:
        rel = None
        for pred, inv in seq:
            step = {
                (o, s) if inv else (s, o)
                for s, p, o in triples if p == pred
            }
            rel = step if rel is None else {
                (s, o2) for s, m in rel for m2, o2 in step if m == m2
            }
        out |= rel
    return out


def test_bgp_sequence_paths_match_bruteforce(ray_session):
    cases = {
        "p/q": [[("p", False), ("q", False)]],
        "p/q/p": [[("p", False), ("q", False), ("p", False)]],
        "^p/q": [[("p", True), ("q", False)]],
        # SPARQL precedence: alternation OUTERMOST -> p | (q/p)
        "p|q/p": [[("p", False)], [("q", False), ("p", False)]],
        "p/q|q/p": [[("p", False), ("q", False)],
                    [("q", False), ("p", False)]],
    }
    ds = _ds(_PARITY_TRIPLES)
    for expr, seqs in cases.items():
        want = sorted(_brute_seq(_PARITY_TRIPLES, seqs))
        for bl in (2_000_000, 0):
            got = sorted(
                (r["x"], r["y"])
                for r in bgp_match(
                    ds, [("?x", expr, "?y")], broadcast_limit=bl
                ).take_all()
            )
            assert got == want, (expr, bl)


def test_bgp_sequence_closure_and_empty_step(ray_session):
    def closure(pairs):
        out, changed = set(pairs), True
        while changed:
            new = {(a, d) for a, b in out for c, d in pairs if b == c} - out
            changed = bool(new)
            out |= new
        return out

    ds = _ds(_PARITY_TRIPLES)
    want = sorted(
        closure(_brute_seq(_PARITY_TRIPLES, [[("p", False), ("q", False)]]))
    )
    for bl in (2_000_000, 0):
        got = sorted(
            (r["x"], r["y"])
            for r in bgp_match(
                ds, [("?x", "p/q+", "?y")], broadcast_limit=bl
            ).take_all()
        )
        assert got == want, bl
        # a dead middle step empties the whole sequence, not just a join
        assert bgp_match(
            ds, [("?x", "p/zz/q", "?y")], broadcast_limit=bl
        ).take_all() == []


def test_bgp_sequence_grammar_errors(ray_session):
    ds = _ds(_PARITY_TRIPLES)
    for bad in ("p//q", "p/", "/p", "!p/q"):
        with pytest.raises(ValueError):
            bgp_match(ds, [("?x", bad, "?y")])


def test_bgp_agg_matches_bruteforce(ray_session):
    from collections import defaultdict

    from kgray.bgp import bgp_agg

    patterns = [("?x", "p", "?y"), ("?y", "q", "?z")]
    ref, _ = _ref_bgp(_PARITY_TRIPLES, patterns)
    by_x = defaultdict(list)
    for x, y, z in ref:
        by_x[x].append((y, z))
    want = {
        x: (
            len(rows),
            len({z for _, z in rows}),
            min(y for y, _ in rows),
            max(y for y, _ in rows),
            ",".join(sorted({z for _, z in rows})),
        )
        for x, rows in by_x.items()
    }
    ds = _ds(_PARITY_TRIPLES)
    aggs = {
        "n": ("count", None),
        "nz": ("count_distinct", "?z"),
        "ymin": ("min", "?y"),
        "ymax": ("max", "?y"),
        "zs": ("group_concat", "?z"),
    }
    for limit in (2_000_000, 0):
        out = bgp_agg(
            ds, patterns, group_by=["?x"], aggs=aggs,
            broadcast_limit=limit,
        )
        got = {
            r["x"]: (r["n"], r["nz"], r["ymin"], r["ymax"], r["zs"])
            for r in out.take_all()
        }
        assert got == want, limit
        # column order is group keys then agg-declaration order
        assert out.schema().names == ["x", "n", "nz", "ymin", "ymax", "zs"]
    # HAVING over a count column (int compare) and a string column
    hav = bgp_agg(
        ds, patterns, group_by=["?x"], aggs=aggs,
        having=[(">=", "n", 2), ("<=", "ymin", "c")],
    )
    got = {r["x"] for r in hav.take_all()}
    assert got == {
        x for x, v in want.items() if v[0] >= 2 and v[2] <= "c"
    }
    # per-var-only aggregate set (no fused grouped_agg piece)
    only_cd = bgp_agg(
        ds, patterns, group_by=["?x"], aggs={"nz": ("count_distinct", "?z")}
    )
    assert {r["x"]: r["nz"] for r in only_cd.take_all()} == {
        x: v[1] for x, v in want.items()
    }
    # empty result keeps the declared schema
    empty = bgp_agg(
        ds, [("?x", "nope", "?y")], group_by=["?x"],
        aggs={"n": ("count", None), "ys": ("group_concat", "?y")},
    )
    assert empty.take_all() == []
    assert empty.schema().names == ["x", "n", "ys"]
    # contract errors
    with pytest.raises(ValueError, match="unbound"):
        bgp_agg(ds, patterns, group_by=["?w"], aggs={"n": ("count", None)})
    with pytest.raises(ValueError, match="group_by"):
        bgp_agg(ds, patterns, group_by=[], aggs={"n": ("count", None)})
    with pytest.raises(ValueError, match="aggregate"):
        bgp_agg(ds, patterns, group_by=["?x"], aggs={})
    with pytest.raises(ValueError, match="constant"):
        bgp_agg(
            ds, patterns, group_by=["?x"],
            aggs={"bad": ("count_distinct", "?x")},
        )
    with pytest.raises(ValueError, match="having"):
        bgp_agg(
            ds, patterns, group_by=["?x"],
            aggs={"n": ("count", None)}, having=[(">=", "nope", 1)],
        )


@settings(max_examples=12, deadline=None)
@given(triples=triples_strategy)
def test_bgp_agg_property(ray_session, triples):
    """bgp_agg vs a brute-force aggregator on random triple sets: the
    fused count/min/max piece and both per-variable DISTINCT exchanges
    must agree with the nested-loop reference on every group."""
    from collections import defaultdict

    from kgray.bgp import bgp_agg

    patterns = [("?x", "p", "?y")]
    ref, _ = _ref_bgp(triples, patterns)
    by_x = defaultdict(list)
    for x, y in ref:
        by_x[x].append(y)
    want = {
        x: (len(ys), len(set(ys)), min(ys), max(ys),
            ",".join(sorted(set(ys))))
        for x, ys in by_x.items()
    }
    out = bgp_agg(
        _ds(triples), patterns, group_by=["?x"],
        aggs={
            "n": ("count", None),
            "ny": ("count_distinct", "?y"),
            "ymin": ("min", "?y"),
            "ymax": ("max", "?y"),
            "ys": ("group_concat", "?y"),
        },
    )
    got = {
        r["x"]: (r["n"], r["ny"], r["ymin"], r["ymax"], r["ys"])
        for r in out.take_all()
    }
    assert got == want


def test_bgp_agg_distinct_null_semantics(ray_session):
    """DISTINCT aggregates over an OPTIONAL-bound variable follow SQL
    NULL rules: COUNT(DISTINCT) ignores NULLs (0 for all-NULL groups,
    group kept), string_agg joins only non-null values ('' for
    all-NULL groups) — matching the DuckDB oracle mirror."""
    from kgray.bgp import bgp_agg

    triples = [
        ("a", "p", "b"), ("a", "p", "c"),
        ("b", "q", "x"), ("b", "q", "y"),
        ("d", "p", "e"),  # e has no q edge -> ?z NULL for group d
    ]
    for limit in (2_000_000, 0):
        out = bgp_agg(
            _ds(triples), [("?s", "p", "?o")],
            optional=[("?o", "q", "?z")],
            group_by=["?s"],
            aggs={
                "n": ("count", None),
                "nz": ("count_distinct", "?z"),
                "zs": ("group_concat", "?z"),
            },
            broadcast_limit=limit,
        )
        got = {r["s"]: (r["n"], r["nz"], r["zs"]) for r in out.take_all()}
        # group a: (a,b,x),(a,b,y),(a,c,NULL) -> 3 rows, 2 distinct z
        # group d: (d,e,NULL) -> kept with 0 / ''
        assert got == {"a": (3, 2, "x,y"), "d": (1, 0, "")}, limit


def test_bgp_agg_having_validated_on_empty(ray_session):
    """A malformed HAVING raises even when the group set is empty —
    contract errors must not depend on the data."""
    from kgray.bgp import bgp_agg

    ds = _ds([("a", "p", "b")])
    with pytest.raises(ValueError, match="having"):
        bgp_agg(
            ds, [("?x", "nope", "?y")], group_by=["?x"],
            aggs={"n": ("count", None)}, having=[(">=", "bogus", 1)],
        )
    with pytest.raises(ValueError, match="having op"):
        bgp_agg(
            ds, [("?x", "nope", "?y")], group_by=["?x"],
            aggs={"n": ("count", None)}, having=[("~=", "n", 1)],
        )


def test_bgp_iri_predicate_escape(ray_session):
    """<...>-wrapped predicates are constants (never path-parsed), and
    a bare IRI mixing :// with path separators raises with advice
    instead of silently mis-parsing as a sequence path."""
    triples = [
        ("a", "http://ex.org/vocab/p", "b"),
        ("b", "http://ex.org/vocab/p", "c"),
        ("a", "q", "c"),
    ]
    ds = _ds(triples)
    out = bgp_match(ds, [("?x", "<http://ex.org/vocab/p>", "?y")])
    got = {(r["x"], r["y"]) for r in out.take_all()}
    assert got == {("a", "b"), ("b", "c")}
    # joins across an escaped-IRI pattern and a CURIE pattern
    out2 = bgp_match(
        ds,
        [("?x", "<http://ex.org/vocab/p>", "?y"), ("?x", "q", "?z")],
    )
    assert {(r["x"], r["y"], r["z"]) for r in out2.take_all()} == {
        ("a", "b", "c")
    }
    with pytest.raises(ValueError, match="wrap it in"):
        bgp_match(ds, [("?x", "http://ex.org/vocab/p", "?y")])
