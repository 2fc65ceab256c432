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

Scale plan: each pattern becomes one filtered projection of the edge
stream (constant slots pruned batch-side, repeated variables enforced
as vectorized equality masks); patterns then fold left-to-right through
Ray's native hash-shuffle join on the shared variables. Each
intermediate is materialized — a join is an all-to-all pipeline breaker
anyway, and the count unlocks (a) empty-side short-circuiting (acero
joins break on schema-less empty blocks) and (b) fan-out sizing via
``join_partitions``. Patterns that share no variable with the
accumulated prefix are rejected: a cartesian product is never what you
want at 100 TB — reorder the patterns or add a linking pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .util import join_partitions

_SLOTS = ("subject", "predicate", "object")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_relation(
    edges: ray.data.Dataset, pattern, num_partitions: int = 32
) -> "tuple[ray.data.Dataset, list[str]]":
    """One triple pattern -> (relation Dataset, variable column names).
    Constants filter; repeated variables add slot-equality masks; the
    projection keeps each variable once, named without the ``?``.

    A constant predicate ending in ``+`` is a SPARQL property path: the
    pattern matches the TRANSITIVE CLOSURE of that predicate's edge set
    (``graphalgo.transitive_closure`` — one closure compute feeding the
    same constant/variable handling on its two endpoint slots)."""
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (s, p, o), got {pattern!r}")
    p_term = pattern[1]
    if (
        not _is_var(p_term)
        and isinstance(p_term, str)
        and any(c in p_term for c in "+|^")
    ):
        base = _path_relation(edges, p_term, num_partitions)
        slots: tuple = ("subject", "object")
        terms = (pattern[0], pattern[2])
    else:
        base = edges.select_columns(list(_SLOTS))
        slots = _SLOTS
        terms = pattern

    consts = [(slot, t) for slot, t in zip(slots, terms) if not _is_var(t)]
    var_slots: dict[str, list[str]] = {}
    for slot, t in zip(slots, terms):
        if _is_var(t):
            var_slots.setdefault(t[1:], []).append(slot)
    if not var_slots:
        raise ValueError(f"pattern {pattern!r} has no variables")
    var_names = list(var_slots)

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

    return base.map_batches(project, batch_format="pyarrow"), var_names


def _path_relation(
    edges: ray.data.Dataset, expr: str, num_partitions: int
) -> ray.data.Dataset:
    """SPARQL property-path subset -> (subject, object) relation.

    Grammar: ``alt ::= pred | ^pred`` (inverse swaps the endpoints),
    ``expr ::= alt ('|' alt)* ['+']`` — a trailing ``+`` takes the
    transitive closure of the UNION relation (so ``(p|^p)+`` is
    undirected reachability). Each alternative is one filtered
    projection of the edge stream; closure rides
    ``graphalgo.transitive_closure``'s dual-path plan."""
    closure = expr.endswith("+")
    body = expr[:-1] if closure else expr
    parts = []
    for alt in body.split("|"):
        inverse = alt.startswith("^")
        pred = alt[1:] if inverse else alt
        if not pred or any(c in pred for c in "+|^"):
            raise ValueError(
                f"unsupported property path {expr!r} — grammar is "
                "pred | ^pred, '|'-alternation, one trailing '+'"
            )
        s_col, o_col = ("object", "subject") if inverse else ("subject", "object")
        parts.append(
            edges.select_columns(list(_SLOTS)).map_batches(
                lambda t, _p=pred, _s=s_col, _o=o_col: pa.table(
                    {"subject": t[_s], "object": t[_o]}
                ).filter(pc.fill_null(pc.equal(t["predicate"], _p), False)),
                batch_format="pyarrow",
            )
        )
    base = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    if closure:
        from .graphalgo import transitive_closure

        return transitive_closure(
            base, src="subject", dst="object", num_partitions=num_partitions
        )
    if len(parts) > 1:
        # (s,p1,o) and (s,p2,o) both existing would double the (s,o)
        # binding — alternation must stay a SET like every other relation
        from .graphalgo import _distinct_pairs

        return _distinct_pairs(base, "subject", "object", num_partitions)
    return base


def _empty_result(var_names) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({v: pa.array([], pa.string()) for v in var_names})
    )


def bgp_match(
    edges: ray.data.Dataset,
    patterns,
    optional=(),
    minus=(),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Match a conjunction of triple ``patterns`` against a distinct
    (subject, predicate, object) Dataset; returns one row per variable
    binding (columns = variables in first-appearance order).

    ``optional`` patterns follow SPARQL OPTIONAL semantics restricted to
    the well-designed case: each left-joins onto the required bindings
    (unmatched rows keep nulls for its fresh variables). Every optional
    pattern must share >=1 variable with the REQUIRED set and bind >=1
    fresh variable not seen anywhere else — cross-optional correlation
    is refused rather than silently mis-scoped.

    ``minus`` is a sequence of pattern GROUPS (each a conjunction,
    evaluated like ``patterns``): required bindings compatible with any
    group binding on their shared variables are REMOVED (SPARQL MINUS as
    an anti-join on a packed shared-variable key). A group sharing no
    variable with the required set is refused — under SPARQL semantics
    it would remove nothing, which is never what the query meant."""
    if not patterns:
        raise ValueError("need at least one pattern")

    acc, acc_vars = _pattern_relation(edges, patterns[0], num_partitions)
    acc = acc.materialize()
    n_acc = acc.count()
    for pat in patterns[1:]:
        rel, rel_vars = _pattern_relation(edges, pat, num_partitions)
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

    required_vars = list(acc_vars)

    def _pack_vars(t: pa.Table, cols, out_col: str) -> pa.Table:
        key = pc.binary_join_element_wise(
            *[pc.cast(t[c], pa.string()) for c in cols], "\x1f"
        ) if len(cols) > 1 else pc.cast(t[cols[0]], pa.string())
        return t.append_column(out_col, key)

    for group in minus:
        sub = bgp_match(edges, group, num_partitions=num_partitions)
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

    if n_acc == 0:
        # an empty join result carries no schema; pin the contract columns
        return _empty_result(acc_vars)

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
    return acc.map_batches(
        lambda t, _cols=tuple(acc_vars): t.select(list(_cols)),
        batch_format="pyarrow",
    )


def construct(
    edges: ray.data.Dataset,
    patterns,
    emit,
    optional=(),
    only_new: bool = True,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """SPARQL CONSTRUCT / Datalog rule head: match ``patterns`` (and
    ``optional``), then emit one (subject, predicate, object) triple per
    binding from the ``emit`` template — each slot a ``?var`` or a
    constant. Bindings with a null emitted term are skipped (the SPARQL
    CONSTRUCT rule for incomplete triples). Output triples are distinct;
    with ``only_new`` the existing edge set is anti-joined away so the
    result is the INFERENCE DELTA, ready to union into the graph.

    The rule-materialization primitive: e.g. emit=("?a",
    "biolink:treats", "?c") over patterns [(?a treats ?b), (?b part_of
    ?c)] propagates treats up the part-of hierarchy."""
    if len(emit) != 3:
        raise ValueError(f"emit must be (s, p, o), got {emit!r}")
    bindings = bgp_match(
        edges, patterns, optional=optional, num_partitions=num_partitions
    )
    bound = set(bindings.schema().names)
    missing = [t[1:] for t in emit if _is_var(t) and t[1:] not in bound]
    if missing:
        raise ValueError(f"emit uses unbound variables {missing}")

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for slot, term in zip(_SLOTS, emit):
            if _is_var(term):
                cols[slot] = pc.cast(t[term[1:]], pa.string())
            else:
                cols[slot] = pa.array([term] * t.num_rows, pa.string())
        out = pa.table(cols)
        return out.drop_null().group_by(list(_SLOTS)).aggregate([])

    triples = bindings.map_batches(project, batch_format="pyarrow")
    from .relational import anti_join, hash_bucketed_groupby

    distinct = hash_bucketed_groupby(
        triples, list(_SLOTS), lambda df: df.drop_duplicates(),
        num_buckets=num_partitions,
    ).map_batches(lambda t: t.select(list(_SLOTS)), batch_format="pyarrow")
    if not only_new:
        return distinct

    def pack(t: pa.Table, out_col: str) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(_chunked_str(t["subject"]), pa.string()),
            pc.cast(_chunked_str(t["predicate"]), pa.string()),
            pc.cast(_chunked_str(t["object"]), pa.string()),
            "\x1f",
        )
        return t.append_column(out_col, key)

    keyed = distinct.map_batches(
        lambda t: pack(t, "triple_key"), batch_format="pyarrow"
    )
    # reserved right-key name: a colliding right_on breaks the
    # marker-join arm of anti_join past its broadcast limit
    existing = edges.select_columns(list(_SLOTS)).map_batches(
        lambda t: pack(t, "__existing_key").select(["__existing_key"]),
        batch_format="pyarrow",
    )
    fresh = anti_join(
        keyed, existing, "triple_key", "__existing_key",
        num_partitions=num_partitions,
    )
    return fresh.map_batches(
        lambda t: t.select(list(_SLOTS)), batch_format="pyarrow"
    )


def _chunked_str(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def infer_fixpoint(
    edges: ray.data.Dataset,
    rules,
    max_rounds: int = 32,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Datalog-style saturation: apply every rule (a ``construct``
    spec: {'patterns': [...], 'emit': (s, p, o), 'optional': [...]})
    against the CURRENT graph — asserted plus everything inferred so
    far — until a full round adds no fresh triple. Returns the distinct
    INFERRED delta (input triples are never re-emitted).

    This is the NAIVE evaluation strategy: each round re-matches every
    rule against the whole graph, so rounds cost full BGP folds and the
    round count is the derivation depth. For single linear rules
    (ancestor/reachability shapes) prefer a ``pred+`` property path or
    ``transitive_closure`` — their semi-naive/doubling plans do the same
    work without re-derivation. ``infer_fixpoint`` is the general
    fallback for MULTI-rule programs whose rules feed each other."""
    if not rules:
        raise ValueError("need at least one rule")
    graph = edges.select_columns(list(_SLOTS)).materialize()
    inferred: "ray.data.Dataset | None" = None
    for _ in range(max_rounds):
        fresh_any = False
        for rule in rules:
            fresh = construct(
                graph,
                rule["patterns"],
                rule["emit"],
                optional=rule.get("optional", ()),
                only_new=True,
                num_partitions=num_partitions,
            ).materialize()
            if fresh.count():
                fresh_any = True
                graph = graph.union(fresh).materialize()
                inferred = (
                    fresh if inferred is None
                    else inferred.union(fresh).materialize()
                )
        if not fresh_any:
            if inferred is None:
                return ray.data.from_arrow(
                    pa.table(
                        {s: pa.array([], pa.string()) for s in _SLOTS}
                    )
                )
            return inferred
    raise RuntimeError(f"infer_fixpoint: no fixpoint in {max_rounds} rounds")
