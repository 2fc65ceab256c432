"""SPARQL-style basic-graph-pattern (BGP) matching over the canonical
triple table — the query surface that pairs with the N-Triples
interchange (`graph_io.write_ntriples`): a user who exports the KG as
RDF can ask the same conjunctive queries here without a triple store.

The reference's docs express these as Cypher MATCH chains
(`docs/cypher-cmds.txt:91`, `docs/cypher-cmds-1.txt:72-73` — the 1- and
2-hop neighborhood runbook queries); ``bgp_match`` generalizes them to
any conjunction of triple patterns with shared variables.

Semantics: the edge Dataset holds DISTINCT (subject, predicate, object)
triples (materialize.build_edges guarantees this). Each pattern is a
3-tuple of terms; a term starting with ``?`` is a variable, anything
else a constant. The result has one column per distinct variable and
one row per binding. Because every input relation is a set and every
join keeps the full variable set on both sides, bindings are a set too
— no DISTINCT pass is needed (mirrors SPARQL set semantics over a
distinct-triple store, and makes the SQL oracle a plain join chain).

OPTIONAL patterns (SPARQL left-join semantics, well-designed subset)
attach nullable bindings after the required fold: each optional pattern
correlates with the required variables only, so the left joins are
independent and order-insensitive, and the SQL mirror is a plain LEFT
JOIN chain.

Dual-path plan (the SURVEY §7 discipline shared with
``graphalgo.transitive_closure``): up to ``broadcast_limit`` distinct
triples the whole fold runs DRIVER-LOCAL as Arrow compute — filtered
projections + acero hash joins on a collected table — because each
distributed join is an all-to-all pipeline breaker whose fixed overhead
dwarfs the work for dimension-sized graphs, and saturation loops
(``infer_fixpoint``) pay that overhead once per rule per round. Past
the limit each pattern becomes one filtered projection of the edge
STREAM (constant slots pruned batch-side, repeated variables enforced
as vectorized equality masks); patterns then fold left-to-right through
Ray's native hash-shuffle join on the shared variables. Each
intermediate is materialized — a join is an all-to-all pipeline breaker
anyway, and the count unlocks (a) empty-side short-circuiting (acero
joins break on schema-less empty blocks) and (b) fan-out sizing via
``join_partitions``. Patterns that share no variable with the
accumulated prefix are rejected on BOTH paths: a cartesian product is
never what you want at 100 TB — reorder the patterns or add a linking
pattern.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .util import join_partitions

logger = logging.getLogger(__name__)

_SLOTS = ("subject", "predicate", "object")

#: triple count up to which the whole BGP fold runs driver-local
#: (matches graphalgo.transitive_closure's broadcast_limit)
BROADCAST_LIMIT = 2_000_000

#: default for ``bgp_match(reorder=None)`` — the selectivity-greedy
#: join-order pre-pass. MEASURED across all 23 BGP-routed queries at
#: sf0.1 (BENCH/reorder_compare_r04.json, best-of-2 interleaved): the
#: pre-pass pays a fixed ~0.13 s estimation scan, so 7 of 23 queries
#: lose >5% (worst 2.0x on 0.15 s queries) while the best win is ~18%
#: — hand-ordered committed queries have nothing for the greedy order
#: to fix. Default stays OFF; callers with machine-generated or
#: unknown pattern orders (the CLI, run_sparql multi-pattern policy)
#: opt in per call.
REORDER_DEFAULT = False


class _LocalOverflow(Exception):
    """A local-path kernel outgrew its cap — fall back to the
    distributed plan (transitive_closure's local_pair_cap discipline)."""


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_spec(pattern):
    """One triple pattern -> (path_expr | None, slots, terms).

    A constant predicate containing ``+``/``|``/``^``/``*``/``?``/``/``
    or starting with ``!`` is a SPARQL property path: the pattern
    matches over the 2-column path relation (see ``_path_relation``)
    instead of the raw 3-slot triple stream. ``/`` marking a sequence
    would otherwise swallow raw http IRIs, so SPARQL's angle-bracket
    escape is honored: ``<http://...>`` is always a constant predicate
    (brackets stripped, never path-parsed), and a bare term that mixes
    ``://`` with path separators raises with that advice instead of
    silently mis-parsing. This store keys predicates by CURIE
    (`Kuzu:29-34` vocabulary), so bracket escapes are only needed for
    full-IRI predicates."""
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (s, p, o), got {pattern!r}")
    p_term = pattern[1]
    if not _is_var(p_term) and isinstance(p_term, str):
        if (
            len(p_term) > 1 and p_term[0] == "<" and p_term[-1] == ">"
            and ">" not in p_term[1:-1]
        ):
            # SPARQL IRI escape: exactly ONE <...> wrap is a constant
            # predicate, never a path. A multi-IRI expression like
            # '<http://x/p>/<http://y/q>' also starts with '<' and ends
            # with '>' but has an inner '>', so it falls through to the
            # path branch below instead of being silently glued into
            # one bogus constant.
            return None, _SLOTS, (pattern[0], p_term[1:-1], pattern[2])
        if "<" in p_term or ">" in p_term:
            # bracketed IRI(s) inside a path expression — '<a>/<b>',
            # '^<a>', '<a>+', '!<a>|<b>' ... Parse eagerly so a
            # malformed bracket mix raises HERE with the grammar error
            # rather than matching nothing downstream.
            _parse_path(p_term)
            return p_term, ("subject", "object"), (pattern[0], pattern[2])
        if p_term.startswith("!") or any(c in p_term for c in "+|^*?/"):
            if "://" in p_term:
                raise ValueError(
                    f"predicate {p_term!r} looks like a full IRI but "
                    "contains property-path separators — wrap it in "
                    "<...> to use it as a constant predicate"
                )
            return p_term, ("subject", "object"), (pattern[0], pattern[2])
    return None, _SLOTS, pattern


def _make_project(slots, terms, pattern):
    """Shared pattern kernel -> (pa.Table -> pa.Table binding relation,
    variable names). Constants filter; repeated variables add
    slot-equality masks; the projection keeps each variable once, named
    without the ``?``. The SAME function is the per-batch stage on the
    distributed path and the one-shot kernel on the local path."""
    consts = [(slot, t) for slot, t in zip(slots, terms) if not _is_var(t)]
    var_slots: dict[str, list[str]] = {}
    for slot, t in zip(slots, terms):
        if _is_var(t):
            var_slots.setdefault(t[1:], []).append(slot)
    if not var_slots:
        raise ValueError(f"pattern {pattern!r} has no variables")

    def project(t: pa.Table) -> pa.Table:
        mask = None
        for slot, value in consts:
            m = pc.equal(t[slot], pa.scalar(value, pa.string()))
            mask = m if mask is None else pc.and_(mask, m)
        for vslots in var_slots.values():
            for extra in vslots[1:]:  # repeated variable: slots must agree
                m = pc.equal(t[vslots[0]], t[extra])
                mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            t = t.filter(pc.fill_null(mask, False))
        return pa.table({v: t[vslots[0]] for v, vslots in var_slots.items()})

    return project, list(var_slots)


_FILTER_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}
_FILTER_STR_OPS = ("contains", "prefix", "regex")


def _make_filters(filters, bound):
    """SPARQL FILTER subset -> one vectorized (pa.Table -> pa.Table).

    Each filter is ``(op, "?var", rhs)``; ``op`` is a comparison from
    ``_FILTER_OPS`` (rhs a constant string or a second ``?var``) or one
    of ``contains`` / ``prefix`` / ``regex`` (rhs a constant pattern).
    Bindings are strings, so comparisons are LEXICOGRAPHIC — the SQL
    mirror is a plain VARCHAR comparison (DuckDB's default binary
    collation agrees with Arrow's byte-wise compare). A filter over a
    null binding (an unmatched OPTIONAL variable) drops the row — the
    SPARQL error-is-false rule, which is also SQL WHERE semantics.
    Validation is eager so both plan arms reject bad specs identically."""
    specs = []
    for f in filters:
        if len(f) != 3:
            raise ValueError(f"filter must be (op, ?var, rhs), got {f!r}")
        op, lhs, rhs = f
        if not _is_var(lhs):
            raise ValueError(f"filter lhs must be a ?variable, got {lhs!r}")
        if lhs[1:] not in bound:
            raise ValueError(f"filter {f!r} uses unbound variable {lhs!r}")
        if op in _FILTER_OPS:
            if _is_var(rhs) and rhs[1:] not in bound:
                raise ValueError(f"filter {f!r} uses unbound variable {rhs!r}")
        elif op in _FILTER_STR_OPS:
            if _is_var(rhs):
                raise ValueError(
                    f"filter op {op!r} needs a constant pattern, got {rhs!r}"
                )
        else:
            raise ValueError(
                f"unsupported filter op {op!r} — use one of "
                f"{sorted(_FILTER_OPS)} or {list(_FILTER_STR_OPS)}"
            )
        specs.append((op, lhs[1:], rhs))

    def apply(t: pa.Table) -> pa.Table:
        mask = None
        for op, l, r in specs:
            lcol = pc.cast(_chunked_str(t[l]), pa.string())
            if op in _FILTER_OPS:
                rv = (
                    pc.cast(_chunked_str(t[r[1:]]), pa.string())
                    if _is_var(r) else pa.scalar(r, pa.string())
                )
                m = _FILTER_OPS[op](lcol, rv)
            elif op == "contains":
                m = pc.match_substring(lcol, r)
            elif op == "prefix":
                m = pc.starts_with(lcol, r)
            else:
                m = pc.match_substring_regex(lcol, r)
            mask = m if mask is None else pc.and_kleene(mask, m)
        if mask is None:
            return t
        return t.filter(pc.fill_null(mask, False))

    return apply


def _values_table(values) -> "tuple[pa.Table, list[str]]":
    """SPARQL VALUES block ``(("?a", ...), [(const, ...), ...])`` ->
    (distinct binding pa.Table, variable names). UNDEF (None) is
    refused — a wildcard row silently changes join semantics; split the
    query instead."""
    terms, rows = values
    if not terms or not all(_is_var(t) for t in terms):
        raise ValueError(f"values terms must all be ?variables, got {terms!r}")
    names = [t[1:] for t in terms]
    if len(set(names)) != len(names):
        raise ValueError(f"values terms repeat a variable: {terms!r}")
    cols: dict[str, list] = {n: [] for n in names}
    for row in rows:
        if len(row) != len(names):
            raise ValueError(
                f"values row {row!r} has {len(row)} terms, expected {len(names)}"
            )
        for n, v in zip(names, row):
            if v is None or not isinstance(v, str):
                raise ValueError(
                    f"values row {row!r}: UNDEF/non-string terms are unsupported"
                )
            cols[n].append(v)
    tbl = pa.table({n: pa.array(cols[n], pa.string()) for n in names})
    return tbl.group_by(names).aggregate([]).select(names), names


def _values_join(t: pa.Table, vtbl: pa.Table, shared, out_cols) -> pa.Table:
    """Inner-join one binding batch against the (tiny, driver-literal)
    VALUES table. Per-batch is safe: acc rows are a set, so no batch
    boundary can duplicate a joined row."""
    if t.num_rows == 0:
        return pa.table({c: pa.array([], pa.string()) for c in out_cols})
    return t.join(vtbl, keys=list(shared), join_type="inner").select(
        list(out_cols)
    )


def _parse_path(expr: str):
    """Property-path grammar (SPARQL subset, '|' outermost like the
    SPARQL PathAlternative production)::

        expr ::= seq ('|' seq)* [mod]     mod in '+' '*' '?'
        seq  ::= step ('/' step)*         SPARQL PathSequence
        step ::= pred | ^pred

    -> ``(modifier | None, [[(pred, s_col, o_col), ...], ...])`` — a
    list of ALTERNATIVES, each a list of SEQUENCE STEPS (one step for
    the plain-alternation queries). So ``a|b/c`` is a | (b/c), matching
    SPARQL precedence. ``mod``: ``+`` one-or-more (transitive closure),
    ``*`` zero-or-more (closure plus the zero-length path), ``?``
    zero-or-one; it scopes over the WHOLE alternation — the one
    documented deviation from SPARQL, which would need parentheses to
    say that. The zero-length path pairs every TERM OF THE GRAPH (any
    subject or object, regardless of predicate) with itself — the
    SPARQL ZeroLengthPath relation.

    A leading ``!`` is a SPARQL negated property set over the WHOLE
    alternation: ``!p1|p2`` matches any triple whose predicate is in
    NEITHER set member (forward direction only; no inverse members, no
    sequences, no trailing modifier) ->
    ``('!', [[(pred, 'subject', 'object')], ...])``.

    Any atom may be a ``<...>``-bracketed full IRI (SPARQL's iri
    production): ``<http://x/p>/<http://y/q>``, ``^<http://x/p>``,
    ``!<http://x/p>|q``. Separators inside brackets are literal IRI
    characters; splitting happens only at bracket depth 0, and the
    brackets are stripped from the emitted predicate."""
    if expr.startswith("!"):
        preds = _split_depth0(expr[1:], "|")
        members = []
        for p in preds:
            pred, bracketed = _iri_unwrap(p, expr)
            if not pred or (
                not bracketed and any(c in pred for c in "+|^*?!/")
            ):
                raise ValueError(
                    f"unsupported negated property set {expr!r} — "
                    "grammar is !pred or !p1|p2 (forward only, no "
                    "modifiers, no sequences; wrap full IRIs in <...>)"
                )
            members.append(pred)
        return "!", [[(p, "subject", "object")] for p in members]
    modifier = expr[-1] if expr and expr[-1] in "+*?" else None
    body = expr[:-1] if modifier else expr
    alts = []
    for alt in _split_depth0(body, "|"):
        steps = []
        for step in _split_depth0(alt, "/"):
            inverse = step.startswith("^")
            pred = step[1:] if inverse else step
            pred, bracketed = _iri_unwrap(pred, expr)
            if not pred or (
                not bracketed and any(c in pred for c in "+|^*?!/")
            ):
                raise ValueError(
                    f"unsupported property path {expr!r} — grammar is "
                    "step ::= pred | ^pred, '/'-sequences, "
                    "'|'-alternation over sequences, one trailing "
                    "'+'/'*'/'?', or a leading '!' negated set "
                    "(wrap full IRIs in <...>)"
                )
            s_col, o_col = (
                ("object", "subject") if inverse else ("subject", "object")
            )
            steps.append((pred, s_col, o_col))
        alts.append(steps)
    return modifier, alts


def _split_depth0(s: str, sep: str) -> list:
    """Split ``s`` on ``sep`` only OUTSIDE ``<...>`` brackets, so IRI
    bodies keep their '/' and '|' characters."""
    parts, cur, depth = [], [], 0
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
            if depth < 0:
                raise ValueError(
                    f"unbalanced '>' in property path segment {s!r}"
                )
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if depth != 0:
        raise ValueError(f"unbalanced '<' in property path segment {s!r}")
    parts.append("".join(cur))
    return parts


def _iri_unwrap(pred: str, expr: str) -> "tuple[str, bool]":
    """Strip one ``<...>`` wrap from a path atom -> (predicate,
    was_bracketed). A stray bracket anywhere else is malformed."""
    if pred.startswith("<"):
        if (
            not pred.endswith(">") or len(pred) < 3
            or "<" in pred[1:-1] or ">" in pred[1:-1]
        ):
            raise ValueError(
                f"malformed bracketed IRI {pred!r} in property path "
                f"{expr!r} — each atom must be exactly one <...> wrap"
            )
        return pred[1:-1], True
    if "<" in pred or ">" in pred:
        raise ValueError(
            f"stray bracket in property-path atom {pred!r} of {expr!r} "
            "— full IRIs must be wrapped as <iri> whole-atom"
        )
    return pred, False


def _pattern_relation(
    edges: ray.data.Dataset, pattern, num_partitions: int = 32
) -> "tuple[ray.data.Dataset, list[str]]":
    """Distributed arm: one triple pattern -> (relation Dataset,
    variable column names)."""
    path_expr, slots, terms = _pattern_spec(pattern)
    if path_expr is not None:
        base = _path_relation(edges, path_expr, num_partitions)
    else:
        base = edges.select_columns(list(_SLOTS))
    project, var_names = _make_project(slots, terms, pattern)
    return base.map_batches(project, batch_format="pyarrow"), var_names


def _path_relation(
    edges: ray.data.Dataset, expr: str, num_partitions: int
) -> ray.data.Dataset:
    """SPARQL property-path subset -> (subject, object) relation
    (distributed arm). Inverse swaps the endpoints; a trailing ``+``
    takes the transitive closure of the UNION relation (so ``(p|^p)+``
    is undirected reachability); ``*``/``?`` add the zero-length path
    (one identity pair per distinct graph term — a per-batch unique
    projection of the edge stream, deduped by the closing distinct).
    Each alternative is one filtered projection of the edge stream;
    closure rides ``graphalgo.transitive_closure``'s dual-path plan."""
    modifier, alts = _parse_path(expr)
    if modifier == "!":
        from .graphalgo import _distinct_pairs

        preds = tuple(p for [(p, _, _)] in alts)
        kept = edges.select_columns(list(_SLOTS)).map_batches(
            lambda t, _p=preds: pa.table(
                {"subject": t["subject"], "object": t["object"]}
            ).filter(_not_in_mask(t["predicate"], _p)),
            batch_format="pyarrow",
        )
        # different surviving predicates can repeat an (s, o) pair —
        # negated sets stay a SET like alternation
        return _distinct_pairs(kept, "subject", "object", num_partitions)

    def step_rel(pred, s_col, o_col):
        return edges.select_columns(list(_SLOTS)).map_batches(
            lambda t, _p=pred, _s=s_col, _o=o_col: pa.table(
                {"subject": t[_s], "object": t[_o]}
            ).filter(pc.fill_null(pc.equal(t["predicate"], _p), False)),
            batch_format="pyarrow",
        )

    parts = []
    for steps in alts:
        rel = step_rel(*steps[0])
        for nxt in steps[1:]:
            # sequence composition: rel(s, m) x step(m, o) -> (s, o) —
            # one hash join on the midpoint; multiple midpoints repeat
            # a pair, so the result re-distincts to stay a SET. Both
            # sides materialize first: a join is an all-to-all breaker
            # anyway, and the counts short-circuit the empty case
            # (acero breaks on schema-less empty blocks).
            from .graphalgo import _distinct_pairs

            left = rel.map_batches(
                lambda t: pa.table(
                    {"subject": t["subject"], "__mid": t["object"]}
                ),
                batch_format="pyarrow",
            ).materialize()
            right = step_rel(*nxt).map_batches(
                lambda t: pa.table(
                    {"__mid": t["subject"], "object": t["object"]}
                ),
                batch_format="pyarrow",
            ).materialize()
            if left.count() == 0 or right.count() == 0:
                rel = _empty_result(["subject", "object"])
                break
            rel = _distinct_pairs(
                left.join(
                    right, join_type="inner",
                    num_partitions=join_partitions(
                        num_partitions, max(left.count(), right.count())
                    ),
                    on=("__mid",),
                ).map_batches(
                    lambda t: t.select(["subject", "object"]),
                    batch_format="pyarrow",
                ),
                "subject", "object", num_partitions,
            )
        parts.append(rel)
    base = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    if modifier in ("+", "*"):
        from .graphalgo import transitive_closure

        base = transitive_closure(
            base, src="subject", dst="object", num_partitions=num_partitions
        )
    if modifier in ("*", "?"):
        from .graphalgo import _distinct_pairs

        ident = edges.select_columns(list(_SLOTS)).map_batches(
            _identity_pairs, batch_format="pyarrow"
        )
        return _distinct_pairs(
            base.union(ident), "subject", "object", num_partitions
        )
    if modifier == "+":
        return base
    if len(parts) > 1:
        # (s,p1,o) and (s,p2,o) both existing would double the (s,o)
        # binding — alternation must stay a SET like every other relation
        from .graphalgo import _distinct_pairs

        return _distinct_pairs(base, "subject", "object", num_partitions)
    return base


def _not_in_mask(pred_col, preds) -> pa.Array:
    """predicate NOT IN ``preds`` (nulls dropped), for negated sets."""
    m = pc.invert(
        pc.is_in(
            _chunked_str(pred_col),
            value_set=pa.array(list(preds), pa.string()),
        )
    )
    return pc.fill_null(m, False)


def _identity_pairs(t: pa.Table) -> pa.Table:
    """One (n, n) zero-length-path pair per distinct term in the batch."""
    def col(name):
        arr = pc.cast(_chunked_str(t[name]), pa.string())
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

    terms = pc.unique(pa.concat_arrays([col("subject"), col("object")]))
    return pa.table({"subject": terms, "object": terms})


def _local_path_relation(tbl: pa.Table, expr: str) -> pa.Table:
    """Local arm of ``_path_relation``: same grammar, Arrow kernels on
    the collected triple table; closure rides
    ``graphalgo._closure_local`` (numpy semi-naive)."""
    modifier, alts = _parse_path(expr)
    if modifier == "!":
        kept = pa.table(
            {"subject": tbl["subject"], "object": tbl["object"]}
        ).filter(_not_in_mask(tbl["predicate"], [p for [(p, _, _)] in alts]))
        return kept.group_by(["subject", "object"]).aggregate([])

    def step_tbl(pred, s_col, o_col) -> pa.Table:
        flt = tbl.filter(
            pc.fill_null(pc.equal(tbl["predicate"], pred), False)
        )
        return pa.table({"subject": flt[s_col], "object": flt[o_col]})

    parts = []
    for steps in alts:
        rel = step_tbl(*steps[0])
        for nxt in steps[1:]:
            # midpoint hash join + distinct (sequence composition)
            rel = (
                rel.rename_columns(["subject", "__mid"])
                .join(
                    step_tbl(*nxt).rename_columns(["__mid", "object"]),
                    keys=["__mid"], join_type="inner",
                )
                .select(["subject", "object"])
                .group_by(["subject", "object"])
                .aggregate([])
            )
        parts.append(rel)
    base = pa.concat_tables(parts).combine_chunks()
    if modifier in ("+", "*"):
        from .graphalgo import _closure_local

        out = _closure_local(
            base, "subject", "object", max_iters=64, pair_cap=50_000_000
        )
        if out is None:
            raise _LocalOverflow(f"property path {expr!r} closure")
        base = out
    if modifier in ("*", "?"):
        ident = _identity_pairs(
            pa.table({"subject": tbl["subject"], "object": tbl["object"]})
        )
        return (
            pa.concat_tables([base.select(["subject", "object"]), ident])
            .group_by(["subject", "object"])
            .aggregate([])
        )
    if modifier == "+":
        return base
    if len(alts) > 1:
        base = base.group_by(["subject", "object"]).aggregate([])
    return base


def _local_pattern_table(tbl: pa.Table, pattern):
    """Local arm of ``_pattern_relation``: (binding pa.Table, vars)."""
    path_expr, slots, terms = _pattern_spec(pattern)
    base = _local_path_relation(tbl, path_expr) if path_expr is not None else tbl
    project, var_names = _make_project(slots, terms, pattern)
    return project(base), var_names


def _collect_triples(edges: ray.data.Dataset) -> pa.Table:
    """Pull the (already materialized, under-limit) distinct triple set
    to the driver as one combined Arrow table."""
    batches = list(
        edges.select_columns(list(_SLOTS)).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
    )
    if not batches:
        return pa.table({s: pa.array([], pa.string()) for s in _SLOTS})
    return pa.concat_tables(batches).combine_chunks()


def _local_bgp(
    tbl: pa.Table, patterns, optional=(), minus=(), exists=(), sources=None,
    values=None, filters=(),
):
    """Driver-local BGP fold: acero hash joins over pattern relations.
    Mirrors the distributed fold exactly — same validation, same errors,
    same variable order — so the two paths are interchangeable (and
    parity-tested, tests/test_bgp.py). ``sources`` optionally overrides
    the triple table per REQUIRED pattern (the semi-naive fixpoint hook:
    one atom reads the delta, the rest the full graph)."""
    src = lambda i: tbl if sources is None or sources[i] is None else sources[i]  # noqa: E731
    acc, acc_vars = _local_pattern_table(src(0), patterns[0])
    for idx, pat in enumerate(patterns[1:], start=1):
        rel, rel_vars = _local_pattern_table(src(idx), pat)
        shared = [v for v in acc_vars if v in rel_vars]
        if not shared:
            raise ValueError(
                f"pattern {pat!r} shares no variable with {acc_vars} — "
                "reorder patterns or add a linking pattern (cartesian "
                "products are refused)"
            )
        acc = acc.join(rel, keys=shared, join_type="inner")
        acc_vars = acc_vars + [v for v in rel_vars if v not in acc_vars]

    if values is not None:
        vtbl, v_names = _values_table(values)
        shared = [v for v in acc_vars if v in v_names]
        if not shared:
            raise ValueError(
                f"values block binds {v_names} but shares no variable "
                f"with the patterns' {acc_vars}"
            )
        acc_vars = acc_vars + [v for v in v_names if v not in acc_vars]
        acc = _values_join(acc, vtbl, shared, acc_vars)

    required_vars = list(acc_vars)
    for group in exists:
        sub, sub_vars = _local_bgp(tbl, group)
        shared = [v for v in required_vars if v in sub_vars]
        if not shared:
            raise ValueError(
                f"exists group {group!r} shares no variable with the "
                f"required bindings {required_vars} — an uncorrelated "
                "EXISTS is a constant; test it separately"
            )
        acc = acc.join(sub.select(shared), keys=shared, join_type="left semi")
    for group in minus:
        sub, sub_vars = _local_bgp(tbl, group)
        shared = [v for v in required_vars if v in sub_vars]
        if not shared:
            raise ValueError(
                f"minus group {group!r} shares no variable with the "
                f"required bindings {required_vars} — under SPARQL MINUS "
                "it would remove nothing"
            )
        acc = acc.join(sub.select(shared), keys=shared, join_type="left anti")

    seen_opt_vars: set[str] = set()
    opt_relations = []
    for pat in optional:
        rel, rel_vars = _local_pattern_table(tbl, pat)
        shared = [v for v in rel_vars if v in required_vars]
        fresh = [v for v in rel_vars if v not in required_vars]
        if not shared:
            raise ValueError(
                f"optional pattern {pat!r} shares no variable with the "
                f"required bindings {required_vars}"
            )
        clash = [v for v in fresh if v in seen_opt_vars]
        if clash:
            raise ValueError(
                f"optional pattern {pat!r} re-binds {clash} from another "
                "optional pattern — cross-optional correlation is refused"
            )
        if not fresh:
            raise ValueError(
                f"optional pattern {pat!r} binds no fresh variable — "
                "make it a required pattern"
            )
        seen_opt_vars.update(fresh)
        opt_relations.append((rel, shared))
        acc_vars = acc_vars + fresh

    for rel, shared in opt_relations:
        acc = acc.join(rel, keys=shared, join_type="left outer")
    if filters:
        acc = _make_filters(filters, set(acc_vars))(acc)
    return acc.select(acc_vars), acc_vars


def _empty_result(var_names) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({v: pa.array([], pa.string()) for v in var_names})
    )


def _pattern_var_names(pattern) -> list:
    """Variables one pattern binds, first-appearance order, no ``?``."""
    _, slots, terms = _pattern_spec(pattern)
    out: list[str] = []
    for t in terms:
        if _is_var(t) and t[1:] not in out:
            out.append(t[1:])
    return out


def _estimate_pattern_counts(edges, patterns, src_ds) -> list:
    """Per-pattern selectivity estimates for the join-order pre-pass —
    ONE streaming scan of the (already materialized) triple blocks
    evaluates every plain pattern's constant/repeated-variable mask at
    once, so the cost is a single map stage emitting one tiny count
    vector per block, never a per-pattern relation materialization.

    Estimates, not truths: a plain pattern's relation row count IS its
    mask count (projection preserves rows), a source-overridden pattern
    is bounded by its override's count, and a property path is charged
    the full edge count (closure modifiers ``+``/``*``/``?`` x4 — their
    relation EXPANDS the edge set, so they should fold late unless the
    alternatives are provably tiny, which a scan cannot see)."""
    n_edges = edges.count()
    est: list[float] = [0.0] * len(patterns)
    specs = []  # (pattern index, const slots, repeated-var slot pairs)
    for i, pat in enumerate(patterns):
        path_expr, slots, terms = _pattern_spec(pat)
        if src_ds[i] is not None:
            est[i] = float(src_ds[i].count())
        elif path_expr is not None:
            modifier, _ = _parse_path(path_expr)
            est[i] = (
                float(n_edges) * (4.0 if modifier in ("+", "*", "?") else 1.0)
                + 1.0
            )
        else:
            consts = [
                (slot, t) for slot, t in zip(slots, terms) if not _is_var(t)
            ]
            var_slots: dict[str, list] = {}
            for slot, t in zip(slots, terms):
                if _is_var(t):
                    var_slots.setdefault(t[1:], []).append(slot)
            rep = [
                (vs[0], extra)
                for vs in var_slots.values() for extra in vs[1:]
            ]
            specs.append((i, consts, rep))
    if not specs:
        return est

    def count_block(t: pa.Table) -> pa.Table:
        idxs, ns = [], []
        for i, consts, rep in specs:
            mask = None
            for slot, value in consts:
                m = pc.equal(t[slot], pa.scalar(value, pa.string()))
                mask = m if mask is None else pc.and_(mask, m)
            for a, b in rep:
                m = pc.equal(t[a], t[b])
                mask = m if mask is None else pc.and_(mask, m)
            idxs.append(i)
            if mask is None:
                ns.append(t.num_rows)
            else:
                ns.append(pc.sum(pc.fill_null(mask, False)).as_py() or 0)
        return pa.table(
            {"i": pa.array(idxs, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    # driver fold is bounded: num_blocks x num_patterns small ints
    for row in edges.select_columns(list(_SLOTS)).map_batches(
        count_block, batch_format="pyarrow"
    ).take_all():
        est[row["i"]] += row["n"]
    return est


def _greedy_pattern_order(edges, patterns, src_ds):
    """Selectivity-greedy join order: start from the smallest estimated
    pattern relation, then repeatedly fold in the smallest remaining
    pattern that shares a variable with the bound set (ties break on
    original position, so the choice is deterministic). Returns the
    permutation as a list of original indices, or None when the greedy
    order is the original order (no-op) or the pattern graph is
    disconnected (keep the user's order; the fold raises its usual
    cartesian-product error)."""
    n = len(patterns)
    pvars = [set(_pattern_var_names(p)) for p in patterns]
    est = _estimate_pattern_counts(edges, patterns, src_ds)
    start = min(range(n), key=lambda i: (est[i], i))
    chosen = [start]
    bound = set(pvars[start])
    remaining = set(range(n)) - {start}
    while remaining:
        cands = [i for i in remaining if pvars[i] & bound]
        if not cands:
            return None
        nxt = min(cands, key=lambda i: (est[i], i))
        chosen.append(nxt)
        bound |= pvars[nxt]
        remaining.discard(nxt)
    if chosen == list(range(n)):
        return None
    return chosen


def bgp_match(
    edges: ray.data.Dataset,
    patterns,
    optional=(),
    minus=(),
    exists=(),
    values=None,
    filters=(),
    sources=None,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
    reorder: "bool | None" = None,
) -> ray.data.Dataset:
    """Match a conjunction of triple ``patterns`` against a distinct
    (subject, predicate, object) Dataset; returns one row per variable
    binding (columns = variables in first-appearance order).

    ``reorder=True`` turns on the selectivity-greedy join-order
    pre-pass (``_greedy_pattern_order``): one extra streaming scan
    estimates every plain pattern's match count, and the fold starts
    from the smallest relation, always joining in the smallest
    connected remainder — the classic conjunctive-query heuristic that
    keeps intermediates near the final result size instead of near the
    largest pattern. Inner joins commute, so the binding SET is
    identical either way (parity-tested), and the output keeps the
    ORIGINAL first-appearance column order regardless of the fold
    order. Off by default: plans stay byte-stable for callers that
    hand-ordered their patterns, and the semi-naive ``sources`` loop
    already puts the delta atom first on purpose.

    ``optional`` patterns follow SPARQL OPTIONAL semantics restricted to
    the well-designed case: each left-joins onto the required bindings
    (unmatched rows keep nulls for its fresh variables). Every optional
    pattern must share >=1 variable with the REQUIRED set and bind >=1
    fresh variable not seen anywhere else — cross-optional correlation
    is refused rather than silently mis-scoped.

    ``minus`` is a sequence of pattern GROUPS (each a conjunction,
    evaluated like ``patterns``): required bindings compatible with any
    group binding on their shared variables are REMOVED (SPARQL MINUS as
    an anti-join on the shared variables). A group sharing no variable
    with the required set is refused — under SPARQL semantics it would
    remove nothing, which is never what the query meant.

    ``exists`` is the positive counterpart (SPARQL FILTER EXISTS,
    restricted to required-variable correlation): required bindings
    compatible with >=1 group binding on their shared variables are
    KEPT (a semi-join). An uncorrelated group is refused the same way.

    ``values`` is a SPARQL VALUES block ``((?vars...), [rows...])``: an
    inline binding relation inner-joined into the group right after the
    required fold (so MINUS and OPTIONAL see the restricted set) — the
    parameterized-query hook (seed lists, id batches). It must share
    >=1 variable with the required patterns; fresh variables are
    carried as extra columns. The table is a driver literal, so the
    distributed arm joins it per batch — never a shuffle.

    ``filters`` is a SPARQL FILTER conjunction applied to the final
    bindings (group-level semantics — after OPTIONAL, so a filter can
    null-test an optional variable out of the result); see
    ``_make_filters`` for the spec grammar and null semantics.

    ``sources`` (the incremental-evaluation hook, see
    ``construct_delta``) optionally overrides the triple Dataset per
    REQUIRED pattern: a sequence as long as ``patterns`` of None (read
    ``edges``) or a Dataset. Only plain patterns may be overridden — a
    property path's closure must see one coherent graph. OPTIONAL /
    MINUS / EXISTS groups always read ``edges``.

    Dual-path: up to ``broadcast_limit`` distinct triples the fold runs
    driver-local (module docstring); beyond, the distributed join fold."""
    if not patterns:
        raise ValueError("need at least one pattern")
    if reorder is None:
        reorder = REORDER_DEFAULT
    if sources is not None:
        if len(sources) != len(patterns):
            raise ValueError(
                f"sources has {len(sources)} entries for "
                f"{len(patterns)} patterns"
            )
        for pat, src_ds in zip(patterns, sources):
            if src_ds is not None and _pattern_spec(pat)[0] is not None:
                raise ValueError(
                    f"pattern {pat!r} is a property path — a source "
                    "override would evaluate its closure over a partial "
                    "graph; restructure the query"
                )

    # every pattern (and every MINUS group) scans `edges`; pin the blocks
    # once so an upstream compute chain (extract -> link -> canonicalize)
    # executes once, not once per pattern
    edges = edges.materialize()
    src_ds = list(sources) if sources is not None else [None] * len(patterns)
    src_ds = [s.materialize() if s is not None else None for s in src_ds]

    col_order = None  # original first-appearance order, pinned pre-reorder
    if reorder and len(patterns) > 1:
        perm = _greedy_pattern_order(edges, patterns, src_ds)
        if perm is not None:
            orig: list[str] = []
            for pat in patterns:
                for v in _pattern_var_names(pat):
                    if v not in orig:
                        orig.append(v)
            patterns = [patterns[i] for i in perm]
            src_ds = [src_ds[i] for i in perm]
            col_order = orig

    def _pin_order(var_list):
        if col_order is None:
            return list(var_list)
        return col_order + [v for v in var_list if v not in col_order]

    total = edges.count() + sum(s.count() for s in src_ds if s is not None)
    if total <= broadcast_limit:
        try:
            acc, _ = _local_bgp(
                _collect_triples(edges), patterns,
                optional=optional, minus=minus, exists=exists,
                values=values, filters=filters,
                sources=(
                    None if sources is None else [
                        _collect_triples(s) if s is not None else None
                        for s in src_ds
                    ]
                ),
            )
            if col_order is not None:
                acc = acc.select(_pin_order(acc.column_names))
            return ray.data.from_arrow(acc)
        except _LocalOverflow as exc:
            logger.warning(
                "bgp_match: %s outgrew the local cap; "
                "falling back to the distributed fold", exc,
            )

    acc, acc_vars = _pattern_relation(
        src_ds[0] if src_ds[0] is not None else edges,
        patterns[0], num_partitions,
    )
    acc = acc.materialize()
    n_acc = acc.count()
    for idx, pat in enumerate(patterns[1:], start=1):
        rel, rel_vars = _pattern_relation(
            src_ds[idx] if src_ds[idx] is not None else edges,
            pat, num_partitions,
        )
        shared = [v for v in acc_vars if v in rel_vars]
        if not shared:
            raise ValueError(
                f"pattern {pat!r} shares no variable with {acc_vars} — "
                "reorder patterns or add a linking pattern (cartesian "
                "products are refused)"
            )
        new_vars = [v for v in rel_vars if v not in acc_vars]
        if n_acc == 0:
            # keep accumulating variables so the empty-result schema (and
            # the optional-pattern validation below) see every pattern
            acc_vars = acc_vars + new_vars
            continue
        rel = rel.materialize()
        if rel.count() == 0:
            n_acc = 0
            acc_vars = acc_vars + new_vars
            continue
        acc = acc.join(
            rel,
            join_type="inner",
            num_partitions=join_partitions(
                num_partitions, max(n_acc, rel.count())
            ),
            on=tuple(shared),
        ).materialize()
        n_acc = acc.count()
        acc_vars = acc_vars + new_vars

    if values is not None:
        vtbl, v_names = _values_table(values)
        shared = [v for v in acc_vars if v in v_names]
        if not shared:
            raise ValueError(
                f"values block binds {v_names} but shares no variable "
                f"with the patterns' {acc_vars}"
            )
        out_cols = acc_vars + [v for v in v_names if v not in acc_vars]
        if n_acc:
            acc = acc.map_batches(
                lambda t, _v=vtbl, _s=tuple(shared), _o=tuple(out_cols):
                    _values_join(t, _v, list(_s), list(_o)),
                batch_format="pyarrow",
            ).materialize()
            n_acc = acc.count()
        acc_vars = out_cols

    required_vars = list(acc_vars)

    def _pack_vars(t: pa.Table, cols, out_col: str) -> pa.Table:
        key = pc.binary_join_element_wise(
            *[pc.cast(t[c], pa.string()) for c in cols], "\x1f"
        ) if len(cols) > 1 else pc.cast(t[cols[0]], pa.string())
        return t.append_column(out_col, key)

    for group in exists:
        sub = bgp_match(
            edges, group,
            num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        )
        shared = [v for v in required_vars if v in sub.schema().names]
        if not shared:
            raise ValueError(
                f"exists group {group!r} shares no variable with the "
                f"required bindings {required_vars} — an uncorrelated "
                "EXISTS is a constant; test it separately"
            )
        if n_acc == 0:
            continue
        sub = sub.materialize()
        if sub.count() == 0:
            n_acc = 0
            continue
        from .relational import semi_join

        # reserved right-key name (see the MINUS arm note)
        sub_keys = sub.map_batches(
            lambda t, _s=tuple(shared): _pack_vars(
                t, list(_s), "__exists_key"
            ).select(["__exists_key"]),
            batch_format="pyarrow",
        )
        keyed = acc.map_batches(
            lambda t, _s=tuple(shared): _pack_vars(t, list(_s), "bind_key"),
            batch_format="pyarrow",
        )
        acc = semi_join(
            keyed, sub_keys, "bind_key", "__exists_key",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.drop_columns(["bind_key"]), batch_format="pyarrow"
        ).materialize()
        n_acc = acc.count()

    for group in minus:
        sub = bgp_match(
            edges, group,
            num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        )
        shared = [v for v in required_vars if v in sub.schema().names]
        if not shared:
            raise ValueError(
                f"minus group {group!r} shares no variable with the "
                f"required bindings {required_vars} — under SPARQL MINUS "
                "it would remove nothing"
            )
        if n_acc == 0:
            continue
        sub = sub.materialize()
        if sub.count() == 0:
            continue
        from .relational import anti_join

        # reserved right-key name: a colliding right_on breaks the
        # marker-join arm of anti_join past its broadcast limit
        sub_keys = sub.map_batches(
            lambda t, _s=tuple(shared): _pack_vars(
                t, list(_s), "__minus_key"
            ).select(["__minus_key"]),
            batch_format="pyarrow",
        )
        keyed = acc.map_batches(
            lambda t, _s=tuple(shared): _pack_vars(t, list(_s), "bind_key"),
            batch_format="pyarrow",
        )
        acc = anti_join(
            keyed, sub_keys, "bind_key", "__minus_key",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.drop_columns(["bind_key"]), batch_format="pyarrow"
        ).materialize()
        n_acc = acc.count()

    opt_relations = []  # validated before any short-circuit return
    seen_opt_vars: set[str] = set()
    for pat in optional:
        rel, rel_vars = _pattern_relation(edges, pat, num_partitions)
        shared = [v for v in rel_vars if v in required_vars]
        fresh = [v for v in rel_vars if v not in required_vars]
        if not shared:
            raise ValueError(
                f"optional pattern {pat!r} shares no variable with the "
                f"required bindings {required_vars}"
            )
        clash = [v for v in fresh if v in seen_opt_vars]
        if clash:
            raise ValueError(
                f"optional pattern {pat!r} re-binds {clash} from another "
                "optional pattern — cross-optional correlation is refused"
            )
        if not fresh:
            raise ValueError(
                f"optional pattern {pat!r} binds no fresh variable — "
                "make it a required pattern"
            )
        seen_opt_vars.update(fresh)
        opt_relations.append((pat, rel, shared, fresh))
        acc_vars = acc_vars + fresh

    # validate filters eagerly (parity with the local arm's errors),
    # even when the binding set is already empty
    apply_filters = _make_filters(filters, set(acc_vars)) if filters else None

    if n_acc == 0:
        # an empty join result carries no schema; pin the contract columns
        return _empty_result(_pin_order(acc_vars))

    for pat, rel, shared, fresh in opt_relations:
        rel = rel.materialize()
        if rel.count() == 0:
            acc = acc.map_batches(
                lambda t, _f=tuple(fresh): pa.table(
                    {
                        **{c: t[c] for c in t.column_names},
                        **{v: pa.nulls(t.num_rows, pa.string()) for v in _f},
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
            continue
        acc = acc.join(
            rel,
            join_type="left_outer",
            num_partitions=join_partitions(
                num_partitions, max(n_acc, rel.count())
            ),
            on=tuple(shared),
        ).materialize()
    # joins can reorder columns; pin first-appearance variable order
    # (group-level FILTER rides the same final pass — one vectorized
    # mask per batch, never a shuffle)
    def _finish(t: pa.Table, _cols=tuple(_pin_order(acc_vars))) -> pa.Table:
        t = t.select(list(_cols))
        return apply_filters(t) if apply_filters is not None else t

    return acc.map_batches(_finish, batch_format="pyarrow")


def bgp_ask(
    edges: ray.data.Dataset,
    patterns,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
    **match_kwargs,
) -> bool:
    """SPARQL ASK: does at least one binding satisfy the group?
    Evaluates ``bgp_match`` (all kwargs pass through) and tests
    non-emptiness via ``limit(1)`` — only one block of the final
    relation is ever pulled. The join fold itself still materializes
    intermediates (every join is a pipeline breaker regardless), so ASK
    costs one fold, never a full-result collection."""
    out = bgp_match(
        edges, patterns, num_partitions=num_partitions,
        broadcast_limit=broadcast_limit, **match_kwargs,
    )
    return out.limit(1).count() > 0


def bgp_describe(
    edges: ray.data.Dataset, iri: str,
) -> ray.data.Dataset:
    """SPARQL DESCRIBE (concise-bounded subset): every triple the
    resource participates in, as subject or object — one vectorized
    filter pass over the edge stream, no shuffle, no materialization."""
    return edges.select_columns(list(_SLOTS)).map_batches(
        lambda t, _i=iri: t.filter(
            pc.or_(
                pc.fill_null(pc.equal(t["subject"], _i), False),
                pc.fill_null(pc.equal(t["object"], _i), False),
            )
        ),
        batch_format="pyarrow",
    )


def bgp_union(
    edges: ray.data.Dataset,
    branches,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
) -> ray.data.Dataset:
    """SPARQL UNION: evaluate each branch (a dict of ``bgp_match``
    kwargs — patterns / optional / minus / values / filters) against the
    same triple set and set-union the binding relations. Branches may
    bind DIFFERENT variable sets (the common 'union of shapes' query);
    missing variables are null-filled, and the result schema is the
    first-appearance order across branches. Distinct-set semantics with
    nulls grouping as equal — exactly SQL UNION, so the mirror is a
    plain UNION of SELECTs with NULL placeholders.

    Each branch rides ``bgp_match``'s own dual-path plan; the only
    union-level exchange is the closing distinct, which is skipped when
    there is a single branch (already a set)."""
    if not branches:
        raise ValueError("need at least one branch")
    edges = edges.materialize()  # scanned by every branch
    outs = []
    all_vars: list[str] = []
    for branch in branches:
        out = bgp_match(
            edges, num_partitions=num_partitions,
            broadcast_limit=broadcast_limit, **branch,
        )
        names = list(out.schema().names)
        outs.append((out, names))
        all_vars.extend(v for v in names if v not in all_vars)
    if len(outs) == 1:
        return outs[0][0]

    def widen(t: pa.Table, have, cols) -> pa.Table:
        return pa.table(
            {
                v: (
                    pc.cast(_chunked_str(t[v]), pa.string())
                    if v in have else pa.nulls(t.num_rows, pa.string())
                )
                for v in cols
            }
        )

    widened = [
        out.map_batches(
            lambda t, _h=tuple(names), _c=tuple(all_vars): widen(
                t, set(_h), list(_c)
            ),
            batch_format="pyarrow",
        )
        for out, names in outs
    ]
    merged = widened[0].union(*widened[1:])
    from .relational import hash_bucketed_groupby

    return hash_bucketed_groupby(
        merged, list(all_vars), lambda df: df.drop_duplicates(),
        num_buckets=num_partitions,
    ).map_batches(
        lambda t, _c=tuple(all_vars): t.select(list(_c)),
        batch_format="pyarrow",
    )


_BIND_OPS = ("concat", "upper", "lower", "strlen", "substr", "replace",
             "coalesce")


def _compile_bind_expr(expr, bound):
    """One BIND expression -> (pa.Table -> string Array). Grammar
    (recursive — any term below may itself be an expression tuple):

    - ``"?var"``                      a bound variable (string column)
    - any other str                   a constant literal
    - ``("concat", t, t, ...)``       SPARQL CONCAT / SQL ``||`` — null
                                      if ANY argument is null
    - ``("upper", t)`` ``("lower", t)``
    - ``("strlen", t)``               decimal string (mirror:
                                      ``CAST(LENGTH(x) AS VARCHAR)``)
    - ``("substr", t, start[, len])`` SPARQL SUBSTR, 1-based start
    - ``("replace", t, pat, rep)``    regex replace (RE2 subset)
    - ``("coalesce", t, t, ...)``     first non-null

    Everything is a string in and a string out — the binding relation's
    only type — so the SQL mirror is mechanical. Validation is eager."""
    if isinstance(expr, str):
        if _is_var(expr):
            if expr[1:] not in bound:
                raise ValueError(f"bind expression uses unbound {expr!r}")
            name = expr[1:]
            return lambda t, _n=name: pc.cast(_chunked_str(t[_n]), pa.string())
        return lambda t, _c=expr: pa.array([_c] * t.num_rows, pa.string())
    if not isinstance(expr, tuple) or not expr:
        raise ValueError(f"bind expression must be a ?var, str or tuple, "
                         f"got {expr!r}")
    op, *args = expr
    if op not in _BIND_OPS:
        raise ValueError(f"unsupported bind op {op!r} — one of {_BIND_OPS}")
    if op in ("concat", "coalesce"):
        if len(args) < 2:
            raise ValueError(f"{op} needs >=2 arguments, got {expr!r}")
        subs = [_compile_bind_expr(a, bound) for a in args]
        if op == "concat":
            return lambda t, _s=tuple(subs): pc.binary_join_element_wise(
                *[f(t) for f in _s], ""
            )
        return lambda t, _s=tuple(subs): pc.coalesce(*[f(t) for f in _s])
    if op in ("upper", "lower"):
        if len(args) != 1:
            raise ValueError(f"{op} takes exactly 1 argument, got {expr!r}")
        sub = _compile_bind_expr(args[0], bound)
        fn = pc.utf8_upper if op == "upper" else pc.utf8_lower
        return lambda t, _f=fn, _s=sub: _f(_s(t))
    if op == "strlen":
        if len(args) != 1:
            raise ValueError(f"strlen takes exactly 1 argument, got {expr!r}")
        sub = _compile_bind_expr(args[0], bound)
        return lambda t, _s=sub: pc.cast(pc.utf8_length(_s(t)), pa.string())
    if op == "substr":
        if len(args) not in (2, 3) or not isinstance(args[1], int):
            raise ValueError(
                f"substr is (expr, start[, length]) with int bounds, "
                f"got {expr!r}"
            )
        start = args[1]
        if start < 1:
            raise ValueError(f"substr start is 1-based (SPARQL), got {start}")
        length = args[2] if len(args) == 3 else None
        if length is not None and (not isinstance(length, int) or length < 0):
            raise ValueError(f"substr length must be a non-negative int, "
                             f"got {expr!r}")
        sub = _compile_bind_expr(args[0], bound)
        stop = None if length is None else start - 1 + length
        return lambda t, _s=sub, _a=start - 1, _b=stop: (
            pc.utf8_slice_codeunits(_s(t), _a)
            if _b is None else pc.utf8_slice_codeunits(_s(t), _a, _b)
        )
    # replace
    if len(args) != 3 or not isinstance(args[1], str) or not isinstance(
        args[2], str
    ):
        raise ValueError(
            f"replace is (expr, pattern, replacement) with constant "
            f"strings, got {expr!r}"
        )
    sub = _compile_bind_expr(args[0], bound)
    return lambda t, _s=sub, _p=args[1], _r=args[2]: pc.replace_substring_regex(
        _s(t), pattern=_p, replacement=_r
    )


def _make_bind(bind, bound):
    """``bind`` = sequence of ``("?new", expr)`` -> one vectorized
    (pa.Table -> pa.Table) appending every computed column. Sequential
    SPARQL BIND scope: each target must be FRESH, and later expressions
    may reference earlier targets. Returns (apply, new names)."""
    names = list(bound)
    compiled = []
    for item in bind:
        if len(item) != 2 or not _is_var(item[0]):
            raise ValueError(f"bind entry must be ('?new', expr), got {item!r}")
        target = item[0][1:]
        if target in names:
            raise ValueError(
                f"bind target {item[0]!r} is already bound — BIND never "
                "rebinds (project it away first)"
            )
        compiled.append((target, _compile_bind_expr(item[1], set(names))))
        names.append(target)

    def apply(t: pa.Table) -> pa.Table:
        for target, fn in compiled:
            t = t.append_column(target, fn(t))
        return t

    return apply, [n for n in names if n not in bound]


def bgp_select(
    edges: ray.data.Dataset,
    patterns,
    project=None,
    bind=(),
    distinct: bool = False,
    order_by=(),
    limit=None,
    offset: int = 0,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
    **match_kwargs,
) -> ray.data.Dataset:
    """SPARQL SELECT over a BGP group: ``bgp_match`` (all kwargs pass
    through — optional / minus / exists / values / filters / reorder)
    followed by the solution modifiers, applied in SPARQL's order:

    1. ``bind``    — sequence of ``("?new", expr)`` computed columns
       (grammar in ``_compile_bind_expr``), evaluated per batch, never
       a shuffle; later modifiers may reference the computed names.
    2. ``project`` — ``["?a", "?new", ...]``; default every column.
    3. ``distinct``— set semantics AFTER projection (bgp_match bindings
       are already a set, but a narrowing projection can collapse rows);
       one bucketed-shuffle distinct, skipped when projection provably
       can't duplicate (all variables kept, no distinct requested).
    4. ``order_by``— ``[("?v", "asc"|"desc"), ...]`` lexicographic
       (string bindings; DuckDB VARCHAR collation agrees), nulls LAST
       in both directions (Arrow ``at_end`` = DuckDB default).
    5. ``limit`` / ``offset`` — with ``order_by``, a DISTRIBUTED top-k:
       every block keeps its local first ``limit+offset`` rows (one
       vectorized sort per block), and only ``num_blocks x k`` survivors
       reach the driver for the final merge — the global sort is never
       run. Without ``order_by``, ``limit`` is Ray's streaming
       ``Dataset.limit`` (any k rows — SPARQL allows it; the mirror
       must pin an order) and ``offset`` is refused as meaningless.

    Determinism contract for oracle mirrors: make ``order_by`` a total
    order over the projected row set (e.g. order by every projected
    column) — otherwise the kept slice is tie-arbitrary on both sides."""
    out = bgp_match(
        edges, patterns, num_partitions=num_partitions,
        broadcast_limit=broadcast_limit, **match_kwargs,
    )
    cols = list(out.schema().names)
    if bind:
        apply_bind, fresh = _make_bind(bind, cols)
        out = out.map_batches(apply_bind, batch_format="pyarrow")
        cols = cols + fresh
    if project is not None:
        keep = []
        for term in project:
            name = term[1:] if _is_var(term) else term
            if name not in cols:
                raise ValueError(
                    f"project term {term!r} is not bound — have {cols}"
                )
            if name in keep:
                raise ValueError(f"project repeats {term!r}")
            keep.append(name)
        out = out.map_batches(
            lambda t, _k=tuple(keep): t.select(list(_k)),
            batch_format="pyarrow",
        )
        cols = keep
    if distinct:
        from .relational import hash_bucketed_groupby

        out = hash_bucketed_groupby(
            out, list(cols), lambda df: df.drop_duplicates(),
            num_buckets=num_partitions,
        ).map_batches(
            lambda t, _c=tuple(cols): t.select(list(_c)),
            batch_format="pyarrow",
        )

    sort_keys = []
    for term, direction in order_by:
        name = term[1:] if _is_var(term) else term
        if name not in cols:
            raise ValueError(
                f"order_by term {term!r} is not bound — have {cols}"
            )
        if direction not in ("asc", "desc"):
            raise ValueError(
                f"order_by direction must be 'asc'|'desc', got {direction!r}"
            )
        sort_keys.append(
            (name, "ascending" if direction == "asc" else "descending")
        )
    if limit is not None and (not isinstance(limit, int) or limit < 0):
        raise ValueError(f"limit must be a non-negative int, got {limit!r}")
    if offset and limit is None:
        raise ValueError("offset needs limit (an unbounded OFFSET would "
                         "still sort and ship everything)")
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")

    if not sort_keys:
        if offset:
            # the docstring's contract, enforced: an OFFSET into an
            # UNORDERED solution stream skips an arbitrary slice
            raise ValueError(
                "offset without order_by skips an arbitrary slice — "
                "add an order_by that totally orders the projection"
            )
        return out.limit(limit) if limit is not None else out
    if limit is None:
        return out.sort(
            [k for k, _ in sort_keys],
            descending=[d == "descending" for _, d in sort_keys],
        )

    k = limit + offset

    def block_topk(t: pa.Table, _keys=tuple(sort_keys), _k=k) -> pa.Table:
        if t.num_rows <= _k:
            return t
        idx = pc.sort_indices(
            t, sort_keys=list(_keys), null_placement="at_end"
        )
        return t.take(idx.slice(0, _k))

    # survivors are bounded by num_blocks x k — a driver fold by design
    rows = out.map_batches(block_topk, batch_format="pyarrow").take_all()
    tbl = pa.table(
        {c: pa.array([r[c] for r in rows], pa.string()) for c in cols}
    )
    idx = pc.sort_indices(tbl, sort_keys=sort_keys, null_placement="at_end")
    return ray.data.from_arrow(tbl.take(idx.slice(offset, limit)))


def bgp_count(
    edges: ray.data.Dataset,
    patterns,
    group_by,
    alias: str = "n",
    min_count: int = 1,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
    **match_kwargs,
) -> ray.data.Dataset:
    """SPARQL ``SELECT ?g (COUNT(*) AS ?n) ... GROUP BY ?g HAVING
    (?n >= k)``: match the group (full ``bgp_match`` kwargs — optional /
    minus / exists / values / filters), then count bindings per
    ``group_by`` variable tuple, keeping groups with at least
    ``min_count``. Counting rides ``relational.grouped_agg`` (per-batch
    partials, ONE bucketed shuffle); HAVING is a vectorized mask on the
    group-bounded result. COUNT(*) over set-semantic bindings equals
    SPARQL's COUNT(DISTINCT full binding) — the SQL mirror is a plain
    GROUP BY over the same join chain."""
    group_by = [g[1:] if _is_var(g) else g for g in group_by]
    if not group_by:
        raise ValueError("need at least one group_by variable")
    bindings = bgp_match(
        edges, patterns, num_partitions=num_partitions,
        broadcast_limit=broadcast_limit, **match_kwargs,
    )
    missing = [g for g in group_by if g not in bindings.schema().names]
    if missing:
        raise ValueError(
            f"group_by uses unbound variables {missing} — "
            f"bound: {bindings.schema().names}"
        )
    from .relational import grouped_agg

    counted = grouped_agg(bindings, keys=list(group_by), count_alias=alias)
    if min_count <= 1:
        return counted
    return counted.map_batches(
        lambda t, _a=alias, _k=min_count: t.filter(
            pc.greater_equal(
                pc.cast(_chunked_str(t[_a]), pa.int64()),
                pa.scalar(_k, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )


_BGP_AGG_OPS = ("count", "count_distinct", "min", "max", "group_concat")


def bgp_agg(
    edges: ray.data.Dataset,
    patterns,
    group_by,
    aggs,
    having=(),
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
    **match_kwargs,
) -> ray.data.Dataset:
    """SPARQL GROUP BY with the full aggregate set over string bindings:
    ``aggs`` maps output name -> ``(op, "?var")`` with ``op`` one of

    - ``count``          COUNT(*) (var ignored, pass ``None``)
    - ``count_distinct`` COUNT(DISTINCT ?v)
    - ``min`` / ``max``  lexicographic (bindings are strings; DuckDB
                         VARCHAR collation agrees)
    - ``group_concat``   GROUP_CONCAT(DISTINCT ?v ORDER BY ?v) with a
                         ``,`` separator — DISTINCT + sorted is forced
                         so the result is deterministic under any
                         partitioning (mirror: ``string_agg(DISTINCT v,
                         ',' ORDER BY v)``)

    Plan: count/min/max fuse into ONE pre-aggregated shuffle
    (``relational.grouped_agg`` partials); each ``count_distinct`` /
    ``group_concat`` variable adds one distinct-pair exchange (the
    (group, v) projection de-duplicates per batch before it moves).
    The group-bounded pieces then hash-join on the group keys.

    ``having`` is a conjunction of ``(op, name, value)`` over the
    AGGREGATED columns (count columns compare as int64, the rest as
    strings), applied as a vectorized mask — SQL HAVING semantics.

    Scale note: GROUP_CONCAT's output row is proportional to the
    group's distinct-value count — that is the operator's semantics,
    not a plan artifact. One giant group lands in one bucket task;
    pre-filter or cap the value domain upstream if a group's distinct
    set can outgrow a worker heap (the count/min/max/count_distinct
    aggregates have no such row-size hazard — their partials and
    outputs are O(1) per group)."""
    group_by = [g[1:] if _is_var(g) else g for g in group_by]
    if not group_by:
        raise ValueError("need at least one group_by variable")
    if not aggs:
        raise ValueError("need at least one aggregate")
    bindings = bgp_match(
        edges, patterns, num_partitions=num_partitions,
        broadcast_limit=broadcast_limit, **match_kwargs,
    )
    bound = list(bindings.schema().names)
    missing = [g for g in group_by if g not in bound]
    if missing:
        raise ValueError(
            f"group_by uses unbound variables {missing} — bound: {bound}"
        )
    plain: dict[str, tuple] = {}
    per_var: list[tuple] = []
    out_names = list(group_by)
    for out, spec in aggs.items():
        if out in out_names:
            raise ValueError(f"aggregate output {out!r} collides")
        if len(spec) != 2 or spec[0] not in _BGP_AGG_OPS:
            raise ValueError(
                f"aggregate {out!r} must be (op, '?var') with op in "
                f"{_BGP_AGG_OPS}, got {spec!r}"
            )
        op, var = spec
        if op == "count":
            plain[out] = (op, None)
        else:
            if not _is_var(var) or var[1:] not in bound:
                raise ValueError(f"aggregate {out!r} uses unbound {var!r}")
            if var[1:] in group_by and op in ("count_distinct", "group_concat"):
                raise ValueError(
                    f"aggregate {out!r} over a group key is constant — "
                    "drop it"
                )
            if op in ("min", "max"):
                plain[out] = (op, var[1:])
            else:
                per_var.append((out, op, var[1:]))
        out_names.append(out)

    # validate HAVING up front — a malformed spec is a contract error
    # and must raise whether or not the group set turns out empty
    for h in having:
        if len(h) != 3 or h[1] not in out_names:
            raise ValueError(
                f"having must be (op, name, value) over {out_names}, "
                f"got {h!r}"
            )
        if h[0] not in _FILTER_OPS:
            raise ValueError(
                f"unsupported having op {h[0]!r} — one of "
                f"{sorted(_FILTER_OPS)}"
            )

    from .relational import grouped_agg, hash_bucketed_groupby

    # each aggregate piece is an independent consumer of the bindings —
    # materialize once so the BGP join doesn't re-execute per piece
    if (1 if plain else 0) + len(per_var) > 1:
        bindings = bindings.materialize()
    pieces = []
    if plain:
        mins = {o: v for o, (op, v) in plain.items() if op == "min"}
        maxs = {o: v for o, (op, v) in plain.items() if op == "max"}
        count_alias = next(
            (o for o, (op, _) in plain.items() if op == "count"), None
        )
        pieces.append(
            grouped_agg(
                bindings, keys=list(group_by), mins=mins, maxs=maxs,
                count_alias=count_alias,
            )
        )
    for out, op, var in per_var:
        proj = bindings.map_batches(
            lambda t, _k=tuple(group_by), _v=var: pa.table(
                {**{k: t[k] for k in _k}, _v: t[_v]}
            ).group_by(list(_k) + [_v]).aggregate([]),
            batch_format="pyarrow",
        )
        if op == "count_distinct":
            def cd_bucket(df, _k=list(group_by), _v=var, _o=out):
                # SQL COUNT(DISTINCT x) ignores NULLs: count only the
                # non-null distinct values but KEEP the group (a group
                # whose values are all NULL yields 0, not a dropped row)
                dd = df.drop_duplicates(_k + [_v])
                g = dd.groupby(_k, sort=False, as_index=False).agg(
                    **{_o: (_v, lambda s: int(s.notna().sum()))}
                )
                return g
            pieces.append(
                hash_bucketed_groupby(
                    proj, list(group_by), cd_bucket,
                    num_buckets=num_partitions,
                )
            )
        else:  # group_concat
            def gc_bucket(df, _k=list(group_by), _v=var, _o=out):
                # SQL string_agg ignores NULLs: join only non-null
                # values; a group whose values are all NULL yields ''
                # (kept, not dropped — GROUP BY groups exist whenever
                # the group has rows, whatever the aggregated value)
                dd = df.drop_duplicates(_k + [_v]).sort_values(
                    _k + [_v], kind="mergesort"
                )
                g = dd.groupby(_k, sort=False, as_index=False).agg(
                    **{_o: (_v, lambda s: ",".join(s.dropna()))}
                )
                return g
            pieces.append(
                hash_bucketed_groupby(
                    proj, list(group_by), gc_bucket,
                    num_buckets=num_partitions,
                )
            )

    acc = pieces[0].materialize()
    for piece in pieces[1:]:
        if acc.count() == 0:
            break
        acc = acc.join(
            piece.materialize(), join_type="inner",
            num_partitions=join_partitions(num_partitions, acc.count()),
            on=tuple(group_by),
        ).materialize()

    if acc.count() == 0:
        empty = {
            g: pa.array([], pa.string()) for g in group_by
        }
        for out, spec in aggs.items():
            empty[out] = pa.array(
                [], pa.int64() if spec[0] in ("count", "count_distinct")
                else pa.string()
            )
        return ray.data.from_arrow(pa.table(empty))

    def finish(t: pa.Table, _cols=tuple(out_names), _hav=tuple(having)):
        t = t.select(list(_cols))
        mask = None
        for op, name, value in _hav:
            col = t[name]
            if pa.types.is_integer(col.type):
                m = _FILTER_OPS[op](
                    pc.cast(_chunked_str(col), pa.int64()),
                    pa.scalar(int(value), pa.int64()),
                )
            else:
                m = _FILTER_OPS[op](
                    pc.cast(_chunked_str(col), pa.string()),
                    pa.scalar(str(value), pa.string()),
                )
            mask = m if mask is None else pc.and_(mask, m)
        return t if mask is None else t.filter(pc.fill_null(mask, False))

    return acc.map_batches(finish, batch_format="pyarrow")


def _check_emit(emit, bound) -> None:
    missing = [t[1:] for t in emit if _is_var(t) and t[1:] not in bound]
    if missing:
        raise ValueError(f"emit uses unbound variables {missing}")


def _emit_project(t: pa.Table, emit) -> pa.Table:
    """Bindings -> distinct emitted triples (null-emitting rows skipped,
    the SPARQL CONSTRUCT rule for incomplete triples). Per-batch
    combiner on the distributed path; the whole projection locally."""
    cols = {}
    for slot, term in zip(_SLOTS, emit):
        if _is_var(term):
            cols[slot] = pc.cast(t[term[1:]], pa.string())
        else:
            cols[slot] = pa.array([term] * t.num_rows, pa.string())
    out = pa.table(cols)
    return out.drop_null().group_by(list(_SLOTS)).aggregate([])


def construct(
    edges: ray.data.Dataset,
    patterns,
    emit,
    optional=(),
    minus=(),
    exists=(),
    values=None,
    filters=(),
    sources=None,
    only_new: bool = True,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
) -> ray.data.Dataset:
    """SPARQL CONSTRUCT / Datalog rule head: match ``patterns`` (and
    ``optional``), then emit one (subject, predicate, object) triple per
    binding from the ``emit`` template — each slot a ``?var`` or a
    constant. ``values`` / ``filters`` restrict the match exactly as in
    ``bgp_match``. Bindings with a null emitted term are skipped (the
    SPARQL CONSTRUCT rule for incomplete triples). Output triples are distinct;
    with ``only_new`` the existing edge set is anti-joined away so the
    result is the INFERENCE DELTA, ready to union into the graph.

    The rule-materialization primitive: e.g. emit=("?a",
    "biolink:treats", "?c") over patterns [(?a treats ?b), (?b part_of
    ?c)] propagates treats up the part-of hierarchy. Dual-path like
    ``bgp_match`` — under ``broadcast_limit`` the match, projection and
    anti-join all run driver-local."""
    if len(emit) != 3:
        raise ValueError(f"emit must be (s, p, o), got {emit!r}")
    edges = edges.materialize()  # scanned by the match AND the anti-join
    no_src = sources is None or all(s is None for s in sources)
    if no_src and edges.count() <= broadcast_limit:
        try:
            tbl = _collect_triples(edges)
            bindings, bound_vars = _local_bgp(
                tbl, patterns, optional=optional, minus=minus, exists=exists,
                values=values, filters=filters,
            )
            _check_emit(emit, set(bound_vars))
            out = _emit_project(bindings, emit)
            if only_new:
                out = out.join(tbl, keys=list(_SLOTS), join_type="left anti")
            return ray.data.from_arrow(out.select(list(_SLOTS)))
        except _LocalOverflow as exc:
            logger.warning(
                "construct: %s outgrew the local cap; "
                "falling back to the distributed plan", exc,
            )
            # the overflow is deterministic — don't retry the local arm
            broadcast_limit = 0

    bindings = bgp_match(
        edges, patterns, optional=optional, minus=minus, exists=exists,
        values=values, filters=filters, sources=sources,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )
    _check_emit(emit, set(bindings.schema().names))

    triples = bindings.map_batches(
        lambda t: _emit_project(t, emit), batch_format="pyarrow"
    )
    return _distinct_then_new(triples, edges, only_new, num_partitions)


def _pack_triple_key(t: pa.Table, out_col: str) -> pa.Table:
    key = pc.binary_join_element_wise(
        pc.cast(_chunked_str(t["subject"]), pa.string()),
        pc.cast(_chunked_str(t["predicate"]), pa.string()),
        pc.cast(_chunked_str(t["object"]), pa.string()),
        "\x1f",
    )
    return t.append_column(out_col, key)


def _distinct_then_new(
    triples: ray.data.Dataset, edges: ray.data.Dataset,
    only_new: bool, num_partitions: int,
) -> ray.data.Dataset:
    """construct's closing stages: distinct the emitted triple stream
    (ONE bucketed shuffle) and, with ``only_new``, anti-join away the
    asserted edge set."""
    from .relational import anti_join, hash_bucketed_groupby

    distinct = hash_bucketed_groupby(
        triples, list(_SLOTS), lambda df: df.drop_duplicates(),
        num_buckets=num_partitions,
    ).map_batches(lambda t: t.select(list(_SLOTS)), batch_format="pyarrow")
    if not only_new:
        return distinct

    keyed = distinct.map_batches(
        lambda t: _pack_triple_key(t, "triple_key"), batch_format="pyarrow"
    )
    # reserved right-key name: a colliding right_on breaks the
    # marker-join arm of anti_join past its broadcast limit
    existing = edges.select_columns(list(_SLOTS)).map_batches(
        lambda t: _pack_triple_key(t, "__existing_key").select(
            ["__existing_key"]
        ),
        batch_format="pyarrow",
    )
    fresh = anti_join(
        keyed, existing, "triple_key", "__existing_key",
        num_partitions=num_partitions,
    )
    return fresh.map_batches(
        lambda t: t.select(list(_SLOTS)), batch_format="pyarrow"
    )


def construct_delta(
    edges: ray.data.Dataset,
    delta: ray.data.Dataset,
    patterns,
    emit,
    only_new: bool = True,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
) -> ray.data.Dataset:
    """Incremental CONSTRUCT (materialized-view maintenance): the
    triples derivable from ``edges`` ∪ ``delta`` using >= 1 delta atom —
    exactly the inferences a newly-arrived triple batch enables, without
    re-deriving anything the old graph already supported. The k-atom
    rule runs as k variants, variant i reading the delta at atom i and
    the FULL (old ∪ delta) graph elsewhere — the semi-naive
    delta-restriction as a public operator (cost scales with
    |delta| x k folds, not with the old graph re-derivation).
    Multi-delta derivations appear in several variants and collapse in
    the closing distinct; with ``only_new`` the result is anti-joined
    against old ∪ delta. ``delta`` must be distinct triples NOT present
    in ``edges`` (the ``update_graph`` CDC contract). Callers
    maintaining an inference store should additionally anti-join
    against it: a delta-enabled derivation can coincide with an
    inference the old graph also supported.

    Identity: bindings(old ∪ delta) = bindings(old) ∪ (the k variant
    binding sets) — tested in tests/test_bgp.py. Plain patterns only
    (a property path's closure can't be delta-restricted; bgp_match
    raises)."""
    if not patterns:
        raise ValueError("need at least one pattern")
    delta = delta.select_columns(list(_SLOTS)).materialize()
    graph = (
        edges.select_columns(list(_SLOTS)).union(delta).materialize()
    )
    variants = []
    for i in range(len(patterns)):
        srcs = [delta if j == i else None for j in range(len(patterns))]
        bindings = bgp_match(
            graph, patterns, sources=srcs,
            num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        )
        _check_emit(emit, set(bindings.schema().names))
        variants.append(
            bindings.map_batches(
                lambda t: _emit_project(t, emit), batch_format="pyarrow"
            )
        )
    out = variants[0] if len(variants) == 1 else variants[0].union(*variants[1:])
    return _distinct_then_new(out, graph, only_new, num_partitions)


def _chunked_str(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _local_fixpoint(
    tbl: pa.Table, rules, max_rounds: int, triple_cap: int
) -> "pa.Table | None":
    """Driver-local saturation loop: pure Arrow joins, no per-round Ray
    barriers. Returns the inferred delta, or None if the graph outgrows
    ``triple_cap`` (caller falls back to the distributed loop).

    Evaluation is SEMI-NAIVE for plain rules (no property paths, no
    optional): past round 1 a fresh derivation must use >=1 triple added
    since the rule's last evaluation, so each k-atom rule runs as k
    variants with one atom restricted to the round delta — the standard
    Datalog optimization that keeps the quadratic ancestor rule from
    re-deriving the whole closure every round. The delta is a provable
    SUPERSET of "added since this rule last ran" (previous round's fresh
    plus the current round's so far), so no derivation is missed;
    over-derivation is absorbed by the distinct + anti-join. Rules with
    a path atom (the closure must see the FULL graph) or an optional
    block (a null branch can flip as the graph grows) conservatively
    re-match the whole graph each round."""
    graph = tbl
    delta = tbl  # triples added since the previous round; round 1: all
    inferred: "pa.Table | None" = None
    for _ in range(max_rounds):
        round_fresh: list[pa.Table] = []
        for rule in rules:
            emit = rule["emit"]
            if len(emit) != 3:
                raise ValueError(f"emit must be (s, p, o), got {emit!r}")
            patterns = rule["patterns"]
            optional = rule.get("optional", ())
            exists_g = rule.get("exists", ())
            values = rule.get("values")
            filters = rule.get("filters", ())
            # filters and values keep rules monotone (they select a fixed
            # subset of each binding set), so semi-naive stays sound.
            # EXISTS is monotone too, but a GROWING graph can newly
            # witness an OLD binding with no fresh required atom — so an
            # exists rule (like optional) must re-match the whole graph
            plain = not optional and not exists_g and all(
                _pattern_spec(p)[0] is None for p in patterns
            )
            if plain and delta is not graph:
                cur_delta = (
                    delta if not round_fresh
                    else pa.concat_tables([delta] + round_fresh)
                )
                parts = []
                for i in range(len(patterns)):
                    srcs = [
                        cur_delta if j == i else graph
                        for j in range(len(patterns))
                    ]
                    bindings, bound_vars = _local_bgp(
                        graph, patterns, sources=srcs,
                        values=values, filters=filters,
                    )
                    _check_emit(emit, set(bound_vars))
                    parts.append(_emit_project(bindings, emit))
                out = pa.concat_tables(parts)
                if len(parts) > 1:  # a 2-delta derivation appears twice
                    out = out.group_by(list(_SLOTS)).aggregate([])
            else:
                bindings, bound_vars = _local_bgp(
                    graph, patterns, optional=optional, exists=exists_g,
                    values=values, filters=filters,
                )
                _check_emit(emit, set(bound_vars))
                out = _emit_project(bindings, emit)
            fresh = out.join(graph, keys=list(_SLOTS), join_type="left anti")
            if fresh.num_rows:
                fresh = fresh.select(list(_SLOTS))
                round_fresh.append(fresh)
                graph = pa.concat_tables([graph, fresh]).combine_chunks()
                if graph.num_rows > triple_cap:
                    return None
                inferred = (
                    fresh if inferred is None
                    else pa.concat_tables([inferred, fresh])
                )
        if not round_fresh:
            if inferred is None:
                return pa.table({s: pa.array([], pa.string()) for s in _SLOTS})
            return inferred.select(list(_SLOTS)).combine_chunks()
        delta = (
            round_fresh[0] if len(round_fresh) == 1
            else pa.concat_tables(round_fresh).combine_chunks()
        )
    raise RuntimeError(f"infer_fixpoint: no fixpoint in {max_rounds} rounds")


def _nonplain_pred_footprint(rule) -> "set | None":
    """The set of constant predicates a rule's NON-PLAIN parts read
    (path-atom steps, OPTIONAL patterns, EXISTS group patterns), or
    ``None`` when un-analyzable — a variable predicate, a negated
    property set (reads the complement) or a ``*``/``?`` modifier
    (its zero-length path pairs every graph TERM, so ANY new triple
    can extend it). ``infer_fixpoint`` uses this for delta-restricted
    rounds on mixed rules: if a round's delta contains no triple with
    a footprint predicate, the non-plain relations are provably
    unchanged and new derivations can only enter through the plain
    atoms."""
    preds: set = set()

    def add_path(expr: str) -> bool:
        try:
            modifier, alts = _parse_path(expr)
        except ValueError:
            return False
        if modifier in ("!", "*", "?"):
            return False
        for steps in alts:
            for p, _s, _o in steps:
                if _is_var(p):
                    return False
                preds.add(p)
        return True

    def add_pattern(p) -> bool:
        path, _slots, terms = _pattern_spec(p)
        if path is not None:
            return add_path(path)
        term = terms[1]
        if _is_var(term):
            return False
        preds.add(term)
        return True

    for p in rule["patterns"]:
        path, _, _ = _pattern_spec(p)
        if path is not None and not add_path(path):
            return None
    for p in rule.get("optional", ()) or ():
        if not add_pattern(p):
            return None
    for grp in rule.get("exists", ()) or ():
        for p in grp:
            if not add_pattern(p):
                return None
    return preds


def _delta_touches(delta: ray.data.Dataset, preds: set) -> bool:
    """True when the round delta holds >=1 triple whose predicate is in
    ``preds`` — a delta-bounded filtered count, never a full-graph
    pass."""
    if not preds:
        return False
    vals = pa.array(sorted(preds), pa.string())
    return (
        delta.map_batches(
            lambda t, _p=vals: t.filter(
                pc.fill_null(pc.is_in(t["predicate"], value_set=_p), False)
            ),
            batch_format="pyarrow",
        ).count()
        > 0
    )


def infer_fixpoint(
    edges: ray.data.Dataset,
    rules,
    max_rounds: int = 32,
    num_partitions: int = 32,
    broadcast_limit: int = BROADCAST_LIMIT,
    local_triple_cap: int = 8_000_000,
) -> ray.data.Dataset:
    """Datalog-style saturation: apply every rule (a ``construct``
    spec: {'patterns': [...], 'emit': (s, p, o), 'optional': [...],
    'exists': [...], 'values': ..., 'filters': [...]}; 'minus' is
    refused — negation is non-monotone, stratify it outside the loop)
    against the CURRENT graph — asserted plus everything inferred so
    far — until a full round adds no fresh triple. Returns the distinct
    INFERRED delta (input triples are never re-emitted).

    Dual-path: an asserted graph under ``broadcast_limit`` triples runs
    the WHOLE saturation driver-local (pure Arrow joins — a distributed
    round costs ~10 all-to-all barriers per rule, ruinous when the graph
    is dimension-sized); if the local graph outgrows ``local_triple_cap``
    the local attempt is abandoned (loudly) for the distributed loop,
    the ``transitive_closure`` discipline.

    The distributed loop is SEMI-NAIVE for plain rules (no property
    paths, no optional, no exists): past round 1 each k-atom rule runs
    as k delta-restricted ``bgp_match`` variants (the ``sources`` hook
    ``construct_delta`` also uses), so a round's cost scales with the
    round delta, not a whole-graph re-derivation. MIXED rules (plain
    atoms alongside paths/OPTIONAL/EXISTS) are delta-restricted too
    whenever it is provably complete: ``_nonplain_pred_footprint``
    extracts the constant predicates the non-plain parts read, and a
    round whose delta contains none of them (``_delta_touches``, a
    delta-bounded check) can only derive new triples THROUGH the plain
    atoms — so only those run, delta-restricted (a footprint-free
    pure-path rule is skipped outright such rounds). Rules whose
    non-plain parts are un-analyzable (variable predicate, negated
    property set, ``*``/``?`` zero-length paths — the graph's term set
    itself is the input) or whose footprint the delta touches
    conservatively re-match the full graph (a growing graph can newly
    witness an old binding). For single linear rules
    (ancestor/reachability shapes) a ``pred+`` property path or
    ``transitive_closure`` is still cheaper — their doubling plans
    collapse the round count. ``infer_fixpoint`` is the general form
    for MULTI-rule programs whose rules feed each other."""
    if not rules:
        raise ValueError("need at least one rule")
    for rule in rules:
        if rule.get("minus"):
            raise ValueError(
                "infer_fixpoint: a MINUS group makes the program "
                "non-monotone (a later round could invalidate an earlier "
                "derivation) — stratify the negation OUTSIDE the fixpoint "
                "(run infer_fixpoint, then construct with minus)"
            )
    graph = edges.select_columns(list(_SLOTS)).materialize()
    per_rule_limit = broadcast_limit
    if graph.count() <= broadcast_limit:
        try:
            local = _local_fixpoint(
                _collect_triples(graph), rules, max_rounds, local_triple_cap
            )
        except _LocalOverflow:
            local = None
        if local is not None:
            return ray.data.from_arrow(local)
        logger.warning(
            "infer_fixpoint: local saturation exceeded local_triple_cap=%d; "
            "falling back to the distributed loop", local_triple_cap,
        )
        # the saturated graph provably outgrows the driver — keep every
        # per-round construct on the distributed plan too
        per_rule_limit = 0
    # per-rule static analysis: plain-atom positions, pure-plain flag,
    # and the non-plain predicate footprint (None = un-analyzable ->
    # conservative full re-match every round)
    rule_meta = []
    for rule in rules:
        plain_idx = [
            i for i, p in enumerate(rule["patterns"])
            if _pattern_spec(p)[0] is None
        ]
        is_plain = (
            not rule.get("optional")
            and not rule.get("exists")
            and len(plain_idx) == len(rule["patterns"])
        )
        rule_meta.append((
            plain_idx, is_plain,
            None if is_plain else _nonplain_pred_footprint(rule),
        ))

    inferred: "ray.data.Dataset | None" = None
    delta: "ray.data.Dataset | None" = None  # None = round 1 (all new)
    for _ in range(max_rounds):
        round_fresh: list[ray.data.Dataset] = []
        for rule, (plain_idx, plain, footprint) in zip(rules, rule_meta):
            patterns = rule["patterns"]
            emit = rule["emit"]
            cur = None
            if delta is not None:
                cur = (
                    delta if not round_fresh
                    else delta.union(*round_fresh).materialize()
                )

            def _delta_variants(idx_list):
                # SEMI-NAIVE round (the _local_fixpoint plan,
                # distributed): one variant per delta-restrictable atom
                # reads the round delta — a provable superset of "added
                # since this rule last ran" — the rest the full graph;
                # over-derivation collapses in the distinct + anti-join
                variants = []
                for i in idx_list:
                    srcs = [
                        cur if j == i else None
                        for j in range(len(patterns))
                    ]
                    bindings = bgp_match(
                        graph, patterns,
                        optional=rule.get("optional", ()),
                        exists=rule.get("exists", ()),
                        values=rule.get("values"),
                        filters=rule.get("filters", ()),
                        sources=srcs,
                        num_partitions=num_partitions,
                        broadcast_limit=per_rule_limit,
                    )
                    _check_emit(emit, set(bindings.schema().names))
                    variants.append(
                        bindings.map_batches(
                            lambda t, _e=emit: _emit_project(t, _e),
                            batch_format="pyarrow",
                        )
                    )
                out = (
                    variants[0] if len(variants) == 1
                    else variants[0].union(*variants[1:])
                )
                return _distinct_then_new(
                    out, graph, True, num_partitions
                ).materialize()

            if plain and delta is not None:
                fresh = _delta_variants(range(len(patterns)))
            elif (
                not plain and delta is not None and footprint is not None
                and not _delta_touches(cur, footprint)
            ):
                # the rule's non-plain relations (path steps / OPTIONAL
                # / EXISTS predicates) are provably untouched by this
                # round's delta, so new derivations can only enter
                # through the plain atoms: delta-restrict those (cost
                # scales with the delta); with NO plain atom the rule
                # cannot derive anything new at all this round
                fresh = _delta_variants(plain_idx) if plain_idx else None
            else:
                fresh = construct(
                    graph,
                    patterns,
                    emit,
                    optional=rule.get("optional", ()),
                    exists=rule.get("exists", ()),
                    values=rule.get("values"),
                    filters=rule.get("filters", ()),
                    only_new=True,
                    num_partitions=num_partitions,
                    broadcast_limit=per_rule_limit,
                ).materialize()
            if fresh is not None and fresh.count():
                round_fresh.append(fresh)
                graph = graph.union(fresh).materialize()
                inferred = (
                    fresh if inferred is None
                    else inferred.union(fresh).materialize()
                )
        if not round_fresh:
            if inferred is None:
                return ray.data.from_arrow(
                    pa.table(
                        {s: pa.array([], pa.string()) for s in _SLOTS}
                    )
                )
            return inferred
        delta = (
            round_fresh[0] if len(round_fresh) == 1
            else round_fresh[0].union(*round_fresh[1:]).materialize()
        )
    raise RuntimeError(f"infer_fixpoint: no fixpoint in {max_rounds} rounds")
