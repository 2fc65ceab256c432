"""SPARQL text front-end for the BGP query layer.

A small recursive-descent parser for the SPARQL subset the engine's
``bgp`` module implements, compiling query TEXT to the exact same
pattern structures the JSON grammar uses (``kgray/__main__.py``) — so
``SELECT ?a WHERE { ?a biolink:treats ?b }`` and
``--bgp '[["?a","biolink:treats","?b"]]'`` run the identical plan.
Reference anchor: the reference's users type Cypher strings at a live
DB (``docs/cypher-cmds-1.txt:54-97``); kgray users type SPARQL at the
CLI (``--sparql``) or call :func:`run_sparql`.

Supported grammar (keywords case-insensitive)::

    query     := prologue (select | ask | construct | describe | update)
    update    := INSERT DATA '{' ground-triples '}'
               | DELETE DATA '{' ground-triples '}'
               | DELETE WHERE group          # plain triples, constant
                                             # predicates, >=1 variable
               | INSERT '{' template '}' WHERE '{' triples '}'
               | DELETE '{' template '}' WHERE '{' triples '}'
                                             # SPARQL 1.1 templated
                                             # forms: template preds
                                             # constant, WHERE may use
                                             # vars + property paths
                                             # (run via run_sparql_update /
                                             #  CLI --type=update)
    prologue  := (PREFIX name: <iri>)*          # accepted; CURIEs are
                                                # the store's key form,
                                                # so names stay verbatim
    select    := SELECT [DISTINCT] (vars | '*' | items) WHERE group
                 [GROUP BY var+] [HAVING (expr)+]
                 [ORDER BY orditem+] [LIMIT n] [OFFSET n]
    items     := (var | '(' agg AS var ')' | '(' bindexpr AS var ')')+
    agg       := COUNT(*) | COUNT(DISTINCT var) | MIN(var) | MAX(var)
               | GROUP_CONCAT([DISTINCT] var)
    ask       := ASK group
    construct := CONSTRUCT '{' triple '}' WHERE group
    describe  := DESCRIBE term
    group     := '{' (triples | OPTIONAL group | MINUS group
                 | FILTER '(' expr ')' | FILTER [NOT] EXISTS group
                 | VALUES valblock | BIND '(' bindexpr AS var ')'
                 | '{' SELECT ... '}')* '}'       # SPARQL 1.1 subselect
               | '{' group (UNION group)+ '}'     # union of shapes
    triples   := term path term (',' term)* (';' path term (',' term)*)* ['.']
    path      := ['!'] step ('|' step | '/' step)* ['+'|'*'|'?'] | var
    step      := ['^'] (word | <iri>)
    expr      := operand ('='|'!='|'<'|'<='|'>'|'>=') operand
               | CONTAINS(var, str) | STRSTARTS(var, str)
               | REGEX(var, str)
    bindexpr  := term | CONCAT(e, ...) | UCASE(e) | LCASE(e)
               | STRLEN(e) | SUBSTR(e, n[, n]) | REPLACE(e, s, s)
               | COALESCE(e, ...)
    valblock  := '(' var+ ')' '{' ('(' term+ ')')* '}' | var '{' term* '}'

Deliberate subset decisions, all loud: ``a`` in predicate position is
rdf:type sugar; FILTER NOT EXISTS compiles to the engine's MINUS group
(identical semantics under the engine's required-variable correlation
rule); aggregate COUNT(?v) is refused with a pointer to COUNT(*) /
COUNT(DISTINCT ?v) (the engine's aggregate set); UNDEF in VALUES is
refused (bindings are total rows here). Property paths reuse the
engine's path grammar verbatim — including the documented deviation
that a trailing modifier scopes over the whole alternation.
"""

from __future__ import annotations

import re

__all__ = ["parse_sparql", "run_sparql"]

_TOKEN_RE = re.compile(
    r"""\s+|\#[^\n]*
      | (?P<iri><[^<>\s]+>)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<word>[A-Za-z_][A-Za-z0-9_\-]*(?::[A-Za-z0-9_.\-]+)?)
      | (?P<sym><=|>=|!=|[{}().,;:|/^+*?!=<>])
    """,
    re.X,
)

_KEYWORDS = {
    "select", "distinct", "where", "optional", "minus", "filter", "exists",
    "not", "values", "bind", "as", "group", "by", "having", "order", "asc",
    "desc", "limit", "offset", "ask", "construct", "describe", "prefix",
    "undef",
}
_AGG_FUNCS = {"count", "min", "max", "group_concat"}
_BIND_FUNCS = {
    "concat": "concat", "ucase": "upper", "lcase": "lower",
    "strlen": "strlen", "substr": "substr", "replace": "replace",
    "coalesce": "coalesce",
}
_STR_FILTERS = {"contains": "contains", "strstarts": "prefix",
                "regex": "regex"}
_CMP = {"=": "==", "==": "==", "!=": "!=", "<": "<", "<=": "<=",
        ">": ">", ">=": ">="}


class SparqlError(ValueError):
    """Parse error with position context."""


def _tokenize(text: str):
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SparqlError(
                f"cannot tokenize at offset {pos}: {text[pos:pos + 20]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind is None:
            continue  # whitespace / comment
        val = m.group()
        if kind == "str":
            val = re.sub(r"\\(.)", r"\1", val[1:-1])
        toks.append((kind, val))
    toks.append(("eof", ""))
    return toks


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    # -- token plumbing ---------------------------------------------------
    def peek(self, ahead: int = 0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, word: str) -> bool:
        k, v = self.peek()
        if k == "word" and v.lower() == word:
            self.i += 1
            return True
        return False

    def expect_kw(self, word: str):
        if not self.kw(word):
            raise SparqlError(f"expected {word.upper()}, got {self.peek()[1]!r}")

    def sym(self, s: str) -> bool:
        k, v = self.peek()
        if k == "sym" and v == s:
            self.i += 1
            return True
        return False

    def expect_sym(self, s: str):
        if not self.sym(s):
            raise SparqlError(f"expected {s!r}, got {self.peek()[1]!r}")

    def at_kw(self, *words) -> bool:
        k, v = self.peek()
        return k == "word" and v.lower() in words

    # -- terms & paths ----------------------------------------------------
    def term(self) -> str:
        k, v = self.next()
        if k == "var":
            return v
        if k == "iri":
            return v[1:-1]  # subjects/objects store bare IRIs
        if k in ("str", "num"):
            return v
        if k == "word":
            if v.lower() in _KEYWORDS:
                raise SparqlError(f"unexpected keyword {v!r} in term position")
            return v
        raise SparqlError(f"expected a term, got {v!r}")

    def _path_step(self) -> str:
        out = "^" if self.sym("^") else ""
        k, v = self.peek()
        if k == "iri":
            self.i += 1
            return out + v  # keep <...> — the engine's IRI escape
        if k == "word" and v.lower() not in _KEYWORDS:
            self.i += 1
            return out + ("rdf:type" if v == "a" else v)
        raise SparqlError(f"expected a path step, got {v!r}")

    def path(self) -> str:
        k, v = self.peek()
        if k == "var":
            self.i += 1
            return v
        neg = "!" if self.sym("!") else ""
        expr = self._path_step()
        while True:
            if self.sym("|"):
                expr += "|" + self._path_step()
            elif self.sym("/"):
                expr += "/" + self._path_step()
            else:
                break
        for mod in ("+", "*", "?"):
            if self.sym(mod):
                expr += mod
                break
        if neg:
            expr = neg + expr
        # a single <iri> step with no operators: strip the escape need
        # detection — _pattern_spec handles the <...> form directly
        return expr

    # -- group ------------------------------------------------------------
    def group(self) -> dict:
        spec = {"patterns": [], "optional": [], "minus": [], "exists": [],
                "filters": [], "values": None, "bind": []}
        self.expect_sym("{")
        # UNION form: '{' subgroup ('UNION' subgroup)+ '}' — branches
        # are whole groups (each may carry OPTIONAL/FILTER/VALUES of
        # its own); mixing UNION with sibling triples is refused.
        # '{ SELECT ...' is a SPARQL 1.1 subselect instead (handled in
        # the element loop below).
        if self.peek() == ("sym", "{") and not (
            self.peek(1)[0] == "word"
            and self.peek(1)[1].lower() == "select"
        ):
            branches = [self.group()]
            while self.kw("union"):
                branches.append(self.group())
            self.expect_sym("}")
            if len(branches) == 1:
                return branches[0]
            for b in branches:
                if b.get("union") or b["bind"] or b.get("subqueries"):
                    raise SparqlError(
                        "nested UNION / BIND / subselect inside a UNION "
                        "branch is unsupported"
                    )
            spec["union"] = [
                {
                    k: v for k, v in (
                        ("patterns", b["patterns"]),
                        ("optional", b["optional"]),
                        ("minus", b["minus"]),
                        ("exists", b["exists"]),
                        ("values", b["values"]),
                        ("filters", b["filters"]),
                    ) if v
                }
                for b in branches
            ]
            return spec
        while not self.sym("}"):
            if self.kw("optional"):
                sub = self.group()
                self._only_patterns(sub, "OPTIONAL")
                spec["optional"].extend(sub["patterns"])
            elif self.kw("minus"):
                sub = self.group()
                self._only_patterns(sub, "MINUS")
                spec["minus"].append(sub["patterns"])
            elif self.kw("filter"):
                if self.kw("not"):
                    self.expect_kw("exists")
                    sub = self.group()
                    self._only_patterns(sub, "FILTER NOT EXISTS")
                    spec["minus"].append(sub["patterns"])
                elif self.kw("exists"):
                    sub = self.group()
                    self._only_patterns(sub, "FILTER EXISTS")
                    spec["exists"].append(sub["patterns"])
                elif self.peek()[0] == "word" \
                        and self.peek()[1].lower() in _STR_FILTERS:
                    spec["filters"].append(self.filter_expr())
                else:
                    self.expect_sym("(")
                    spec["filters"].append(self.filter_expr())
                    self.expect_sym(")")
            elif self.kw("values"):
                if spec["values"] is not None:
                    raise SparqlError("one VALUES block per group")
                spec["values"] = self.values_block()
            elif self.kw("bind"):
                self.expect_sym("(")
                expr = self.bind_expr()
                self.expect_kw("as")
                k, v = self.next()
                if k != "var":
                    raise SparqlError("BIND needs 'AS ?var'")
                self.expect_sym(")")
                spec["bind"].append((v, expr))
            elif self.peek() == ("sym", "{"):
                # SPARQL 1.1 subselect: '{ SELECT ... }' — evaluated
                # independently (uncorrelated by spec) and joined in
                self.expect_sym("{")
                self.expect_kw("select")
                sub = self.select()
                self.expect_sym("}")
                spec.setdefault("subqueries", []).append(sub)
            else:
                self.triples_into(spec["patterns"])
        return spec

    @staticmethod
    def _only_patterns(sub: dict, ctx: str):
        extras = [k for k in ("optional", "minus", "exists", "bind")
                  if sub[k]] + (["values"] if sub["values"] else []) \
            + (["filters"] if sub["filters"] else []) \
            + (["union"] if sub.get("union") else []) \
            + (["subquery"] if sub.get("subqueries") else [])
        if extras:
            raise SparqlError(
                f"{ctx} group supports plain triples only here "
                f"(found {extras})"
            )

    def triples_into(self, patterns: list):
        s = self.term()
        while True:
            p = self.path()
            while True:
                o = self.term()
                patterns.append((s, p, o))
                if not self.sym(","):
                    break
            if not self.sym(";"):
                break
            if self.peek()[0] == "sym" and self.peek()[1] in ".}":
                break  # trailing ';'
        self.sym(".")

    # -- filters / values / bind -----------------------------------------
    def filter_expr(self):
        k, v = self.peek()
        if k == "word" and v.lower() in _STR_FILTERS:
            fn = _STR_FILTERS[v.lower()]
            self.i += 1
            self.expect_sym("(")
            var = self.term()
            if not var.startswith("?"):
                raise SparqlError(f"{v.upper()} needs a ?var first arg")
            self.expect_sym(",")
            pat = self.term()
            self.expect_sym(")")
            return (fn, var, pat)
        lhs = self.term()
        k, op = self.next()
        if k != "sym" or op not in _CMP:
            raise SparqlError(f"expected a comparison operator, got {op!r}")
        rhs = self.term()
        return (_CMP[op], lhs, rhs)

    def values_block(self):
        if self.sym("("):
            vars_ = []
            while not self.sym(")"):
                k, v = self.next()
                if k != "var":
                    raise SparqlError("VALUES (...) lists ?vars")
                vars_.append(v)
            rows = []
            self.expect_sym("{")
            while not self.sym("}"):
                self.expect_sym("(")
                row = []
                while not self.sym(")"):
                    if self.at_kw("undef"):
                        raise SparqlError(
                            "UNDEF is unsupported — bindings are total rows"
                        )
                    row.append(self.term())
                if len(row) != len(vars_):
                    raise SparqlError("VALUES row arity mismatch")
                rows.append(tuple(row))
            return (tuple(vars_), rows)
        k, v = self.next()
        if k != "var":
            raise SparqlError("VALUES needs ?vars")
        rows = []
        self.expect_sym("{")
        while not self.sym("}"):
            if self.at_kw("undef"):
                raise SparqlError(
                    "UNDEF is unsupported — bindings are total rows"
                )
            rows.append((self.term(),))
        return ((v,), rows)

    def bind_expr(self):
        k, v = self.peek()
        if k == "word" and v.lower() in _BIND_FUNCS:
            fn = _BIND_FUNCS[v.lower()]
            self.i += 1
            self.expect_sym("(")
            args = []
            while not self.sym(")"):
                if args:
                    self.expect_sym(",")
                if fn == "substr" and len(args) >= 1 \
                        and self.peek()[0] == "num":
                    args.append(int(self.next()[1]))
                else:
                    args.append(self.bind_expr())
            return tuple([fn] + args)
        return self.term()

    # -- query forms ------------------------------------------------------
    def parse(self) -> dict:
        prefixes = {}
        while self.kw("prefix"):
            k, name = self.next()
            if k != "word":
                raise SparqlError("PREFIX needs a name")
            self.sym(":")  # 'name :' — the colon tokenizes separately
            k2, v2 = self.next()
            if k2 != "iri":
                raise SparqlError("PREFIX needs name: <iri>")
            prefixes[name.rstrip(":")] = v2[1:-1]
        if self.kw("select"):
            out = self.select()
        elif self.kw("ask"):
            out = {"form": "ask", **self.group()}
        elif self.kw("construct"):
            self.expect_sym("{")
            emit_pats: list = []
            self.triples_into(emit_pats)
            if len(emit_pats) != 1:
                raise SparqlError(
                    "CONSTRUCT emits exactly one triple template per "
                    "query here — run one query per template"
                )
            self.expect_sym("}")
            self.expect_kw("where")
            out = {"form": "construct", "emit": emit_pats[0], **self.group()}
        elif self.kw("describe"):
            out = {"form": "describe", "iri": self.term()}
        elif self.kw("insert"):
            if self.kw("data"):
                out = {"form": "insert_data",
                       "triples": self._ground_triples()}
            elif self.peek() == ("sym", "{"):
                # SPARQL 1.1 templated INSERT { tmpl } WHERE { pats }
                tmpl = self._template_triples("INSERT")
                self.expect_kw("where")
                out = {"form": "insert_where", "template": tmpl,
                       "patterns": self._where_patterns()}
            else:
                raise SparqlError(
                    "INSERT supports DATA { ground triples } and "
                    "{ template } WHERE { patterns } here"
                )
        elif self.kw("delete"):
            if self.kw("data"):
                out = {"form": "delete_data",
                       "triples": self._ground_triples()}
            elif self.peek() == ("sym", "{"):
                # SPARQL 1.1 templated DELETE { tmpl } WHERE { pats }
                tmpl = self._template_triples("DELETE")
                self.expect_kw("where")
                out = {"form": "delete_tmpl_where", "template": tmpl,
                       "patterns": self._where_patterns()}
            elif self.kw("where"):
                pats: list = []
                self.expect_sym("{")
                while not self.sym("}"):
                    self.triples_into(pats)
                norm = []
                for s, p, o in pats:
                    if p.startswith("?"):
                        raise SparqlError(
                            "DELETE WHERE needs a constant predicate "
                            "per pattern (a variable predicate would "
                            "retract the whole store — say so "
                            "explicitly with one pattern per predicate)"
                        )
                    if p.startswith("<") and p.endswith(">") \
                            and ">" not in p[1:-1]:
                        p = p[1:-1]
                    elif any(c in p for c in "+|^*?/"):
                        raise SparqlError(
                            f"DELETE WHERE takes plain predicates, not "
                            f"property paths ({p!r}) — a path match "
                            "does not name which EDGE to retract"
                        )
                    if not any(
                        str(t).startswith("?") for t in (s, p, o)
                    ):
                        raise SparqlError(
                            f"DELETE WHERE pattern {s} {p} {o} is "
                            "ground — use DELETE DATA for ground "
                            "triples (existence-gated conjunctions of "
                            "ground triples are unsupported here)"
                        )
                    norm.append((s, p, o))
                out = {"form": "delete_where", "patterns": norm}
            else:
                raise SparqlError(
                    "DELETE supports DATA { ground triples }, "
                    "WHERE { patterns }, and { template } WHERE "
                    "{ patterns } here"
                )
        else:
            raise SparqlError(
                f"expected SELECT/ASK/CONSTRUCT/DESCRIBE or the update "
                f"forms INSERT DATA / DELETE DATA / DELETE WHERE, got "
                f"{self.peek()[1]!r}"
            )
        out["prefixes"] = prefixes
        if self.peek()[0] != "eof":
            raise SparqlError(f"trailing input at {self.peek()[1]!r}")
        return out

    def _ground_triples(self) -> list:
        """``{ s p o . ... }`` with every term CONSTANT — the INSERT
        DATA / DELETE DATA payload. Variables and property paths are
        refused (DATA blocks are ground by spec)."""
        pats: list = []
        self.expect_sym("{")
        while not self.sym("}"):
            self.triples_into(pats)
        if not pats:
            raise SparqlError("empty DATA block")
        for s, p, o in pats:
            if any(str(t).startswith("?") for t in (s, p, o)):
                raise SparqlError(
                    f"DATA blocks must be ground — {s} {p} {o} has a "
                    "variable (use DELETE WHERE for patterns)"
                )
            if any(c in p for c in "+|^*?/") and not (
                p.startswith("<") and p.endswith(">")
                and ">" not in p[1:-1]
            ):
                raise SparqlError(
                    f"DATA blocks take plain predicates, not property "
                    f"paths: {p!r}"
                )
        # store convention: constant predicates are kept bare (the
        # <...> escape is only the parser-level path guard)
        return [
            (s, p[1:-1] if p.startswith("<") and p.endswith(">") else p, o)
            for s, p, o in pats
        ]

    def _template_triples(self, verb: str) -> list:
        """``{ s p o . ... }`` template for the templated update forms:
        variables allowed in subject/object position (bound by the
        WHERE patterns at execution), predicate CONSTANT (brackets
        stripped, property paths refused — a path does not name the
        edge to assert/retract)."""
        pats: list = []
        self.expect_sym("{")
        while not self.sym("}"):
            self.triples_into(pats)
        if not pats:
            raise SparqlError(f"empty {verb} template")
        norm = []
        for s, p, o in pats:
            if p.startswith("?"):
                raise SparqlError(
                    f"{verb} template needs a constant predicate per "
                    "triple (one template per predicate)"
                )
            if p.startswith("<") and p.endswith(">") \
                    and ">" not in p[1:-1]:
                p = p[1:-1]
            elif any(c in p for c in "+|^*?/"):
                raise SparqlError(
                    f"{verb} template takes plain predicates, not "
                    f"property paths: {p!r}"
                )
            norm.append((s, p, o))
        return norm

    def _where_patterns(self) -> list:
        """Plain-triple WHERE block for the templated update forms —
        the patterns run through bgp_match, so variables anywhere and
        property paths in the predicate slot are fine here."""
        pats: list = []
        self.expect_sym("{")
        while not self.sym("}"):
            self.triples_into(pats)
        if not pats:
            raise SparqlError("empty WHERE block in update")
        return pats

    def select(self) -> dict:
        distinct = self.kw("distinct")
        project: "list | None" = []
        aggs: dict = {}
        bind: list = []
        if self.sym("*"):
            project = None
        else:
            while True:
                k, v = self.peek()
                if k == "var":
                    self.i += 1
                    project.append(v)
                elif k == "sym" and v == "(":
                    self.i += 1
                    k2, v2 = self.peek()
                    if k2 == "word" and v2.lower() in _AGG_FUNCS:
                        name, spec = self.agg_alias()
                        aggs[name] = spec
                        project.append("?" + name)
                    else:
                        expr = self.bind_expr()
                        self.expect_kw("as")
                        k3, v3 = self.next()
                        if k3 != "var":
                            raise SparqlError("(expr AS ?var) needed")
                        self.expect_sym(")")
                        bind.append((v3, expr))
                        project.append(v3)
                else:
                    break
            if not project:
                raise SparqlError("SELECT needs ?vars, aliases or *")
        self.kw("where")  # WHERE is optional sugar before the group
        spec = self.group()
        group_by: list = []
        having: list = []
        order_by: list = []
        limit = offset = None
        if self.kw("group"):
            self.expect_kw("by")
            while self.peek()[0] == "var":
                group_by.append(self.next()[1])
        if self.kw("having"):
            while self.sym("("):
                op, lhs, rhs = self.filter_expr()
                self.expect_sym(")")
                having.append((op, lhs.lstrip("?"), rhs))
        if self.kw("order"):
            self.expect_kw("by")
            while True:
                if self.at_kw("asc", "desc"):
                    d = self.next()[1].lower()
                    self.expect_sym("(")
                    order_by.append((self.next()[1], d))
                    self.expect_sym(")")
                elif self.peek()[0] == "var":
                    order_by.append((self.next()[1], "asc"))
                else:
                    break
        if self.kw("limit"):
            limit = int(self.next()[1])
        if self.kw("offset"):
            offset = int(self.next()[1])
        spec.update(
            form="select", distinct=distinct, project=project, aggs=aggs,
            group_by=group_by, having=having, order_by=order_by,
            limit=limit, offset=offset,
        )
        spec["bind"] = spec["bind"] + bind
        return spec

    def agg_alias(self):
        fn = self.next()[1].lower()
        self.expect_sym("(")
        distinct = self.kw("distinct")
        if self.sym("*"):
            arg = None
        else:
            k, arg = self.next()
            if k != "var":
                raise SparqlError(f"{fn.upper()} needs ?var or *")
        self.expect_sym(")")
        self.expect_kw("as")
        k, alias = self.next()
        if k != "var":
            raise SparqlError("aggregate needs 'AS ?name'")
        self.expect_sym(")")
        if fn == "count":
            if arg is None and not distinct:
                return alias[1:], ("count", None)
            if distinct and arg is not None:
                return alias[1:], ("count_distinct", arg)
            raise SparqlError(
                "COUNT supports COUNT(*) and COUNT(DISTINCT ?v) here — "
                "plain COUNT(?v) differs only on OPTIONAL nulls; use "
                "COUNT(*) over a group that binds ?v"
            )
        if fn in ("min", "max"):
            if arg is None or distinct:
                raise SparqlError(f"{fn.upper()} needs a plain ?var")
            return alias[1:], (fn, arg)
        # group_concat: the engine's operator is DISTINCT + sorted by
        # construction; both spellings accepted
        if arg is None:
            raise SparqlError("GROUP_CONCAT needs a ?var")
        return alias[1:], ("group_concat", arg)


def parse_sparql(text: str) -> dict:
    """Parse a SPARQL string into the engine's pattern structures (see
    module docstring for the grammar). Raises :class:`SparqlError` on
    anything outside the subset."""
    return _Parser(text).parse()


#: a SPARQL 1.1 subselect compiles to a driver-literal VALUES block
#: (it is UNCORRELATED by spec, so bottom-up evaluation is exact); the
#: inner solution must therefore fit the driver — this cap keeps that
#: contract loud instead of letting a huge subquery masquerade as a
#: broadcastable literal. Rewrite over-cap subselects as joins.
SUBQUERY_ROW_CAP = 100_000


def run_sparql(
    edges,
    text: str,
    num_partitions: int = 32,
    broadcast_limit: "int | None" = None,
    reorder: "bool | None" = None,
):
    """Parse ``text`` and run it against the (subject, predicate,
    object) Dataset — SELECT/DESCRIBE/CONSTRUCT return a Dataset, ASK
    a bool. ``reorder`` defaults to on for multi-pattern groups (the
    CLI's policy)."""
    return _run_spec(
        parse_sparql(text), edges, num_partitions, broadcast_limit, reorder
    )


def _slice_solution(out, limit, offset, has_order=True):
    """Apply SPARQL LIMIT/OFFSET to an already-ORDERed Dataset.

    Plain LIMIT is Ray's streaming ``Dataset.limit``. OFFSET skips the
    first ``offset`` solutions of the sorted stream — it needs LIMIT
    (an unbounded OFFSET would still ship everything, same rule as
    ``bgp_select``) and materializes only ``offset + limit`` rows on
    the driver, a bound the caller's LIMIT itself declared acceptable.
    ``LIMIT 0`` is a real empty result, not "no limit"."""
    if not offset:
        return out.limit(limit) if limit is not None else out
    if limit is None:
        raise SparqlError(
            "OFFSET needs LIMIT on aggregate/UNION queries (an "
            "unbounded OFFSET would still sort and ship everything)"
        )
    if not has_order:
        raise SparqlError(
            "OFFSET without ORDER BY skips an arbitrary slice — add an "
            "ORDER BY that totally orders the projection (same rule as "
            "bgp_select)"
        )
    import pyarrow as pa
    import ray.data

    k = offset + limit
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.limit(k).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    schema = out.schema().base_schema
    tbl = (
        pa.concat_tables(parts, promote_options="permissive")
        if parts else schema.empty_table()
    )
    return ray.data.from_arrow(tbl.slice(offset, limit))


def _run_spec(
    q: dict,
    edges,
    num_partitions: int = 32,
    broadcast_limit: "int | None" = None,
    reorder: "bool | None" = None,
):
    from . import bgp

    if q["form"] in ("insert_data", "delete_data", "delete_where",
                     "insert_where", "delete_tmpl_where"):
        raise SparqlError(
            f"{q['form']} mutates the graph layout — run it through "
            "run_sparql_update(out_dir, text) (CLI: --type=update "
            "--sparql '...'), not against a read-only edge stream"
        )
    subs = q.get("subqueries") or []
    if subs:
        if len(subs) > 1:
            raise SparqlError("one subselect per group")
        if q.get("values") is not None:
            raise SparqlError(
                "a subselect and a VALUES block both bind inline rows — "
                "use one"
            )
        inner_q = dict(subs[0])
        inner_q["form"] = "select"
        inner = _run_spec(
            inner_q, edges, num_partitions, broadcast_limit, reorder
        )
        rows = inner.take(SUBQUERY_ROW_CAP + 1)
        if len(rows) > SUBQUERY_ROW_CAP:
            raise SparqlError(
                f"subselect exceeds SUBQUERY_ROW_CAP={SUBQUERY_ROW_CAP} "
                "rows — its solution is a driver-literal VALUES block; "
                "rewrite the query as a join"
            )
        names = list(inner.schema().names)
        vrows = []
        for r in rows:
            vals = tuple(r[n] for n in names)
            if any(v is None for v in vals):
                raise SparqlError(
                    "subselect produced NULL bindings (OPTIONAL inside "
                    "the subselect?) — VALUES rows must be total"
                )
            # the binding relation is string-typed; aggregate outputs
            # (int64) are carried as their decimal strings
            vrows.append(tuple(str(v) for v in vals))
        q = dict(q)
        q["values"] = (tuple("?" + n for n in names), vrows)
    kw: dict = {"num_partitions": num_partitions}
    if broadcast_limit is not None:
        kw["broadcast_limit"] = broadcast_limit
    match_kw = dict(
        optional=q.get("optional", ()), minus=q.get("minus", ()),
        exists=q.get("exists", ()), values=q.get("values"),
        filters=q.get("filters", ()),
    )
    if q["form"] == "describe":
        return bgp.bgp_describe(edges, q["iri"])
    if q.get("union"):
        out = bgp.bgp_union(edges, q["union"], **kw)
        if q["form"] == "ask":
            return out.limit(1).count() > 0
        if q["form"] == "construct" or q.get("aggs") or q.get("bind"):
            raise SparqlError(
                "UNION groups support SELECT/ASK here — aggregate,"
                " CONSTRUCT and BIND over UNION are unsupported"
            )
        if q["project"] is not None:
            cols = set(out.schema().names)
            keep = [p.lstrip("?") for p in q["project"]]
            missing = [c for c in keep if c not in cols]
            if missing:
                raise SparqlError(
                    f"projection {missing} unbound in UNION result "
                    f"{sorted(cols)}"
                )
            out = out.select_columns(keep)
            if q["distinct"] and len(keep) < len(cols):
                from .relational import hash_bucketed_groupby

                out = hash_bucketed_groupby(
                    out, keep, lambda df: df.drop_duplicates(),
                    num_buckets=num_partitions,
                ).map_batches(
                    lambda t, _k=tuple(keep): t.select(list(_k)),
                    batch_format="pyarrow",
                )
        if q["order_by"]:
            out = out.sort(
                key=[c.lstrip("?") for c, _ in q["order_by"]],
                descending=[d == "desc" for _, d in q["order_by"]],
            )
        return _slice_solution(
            out, q["limit"], q["offset"], has_order=bool(q["order_by"])
        )
    if q["form"] == "ask":
        return bgp.bgp_ask(edges, q["patterns"], **match_kw, **kw)
    use_reorder = (
        reorder if reorder is not None else len(q["patterns"]) > 1
    )
    if q["form"] == "construct":
        return bgp.construct(
            edges, q["patterns"], q["emit"], only_new=False,
            **match_kw, **kw,
        )
    if q["aggs"]:
        if not q["group_by"]:
            raise SparqlError(
                "aggregates need GROUP BY (ungrouped aggregates are "
                "unsupported here)"
            )
        bad = [p for p in q["project"] or []
               if p.startswith("?") and p[1:] not in q["aggs"]
               and p not in q["group_by"]]
        if bad:
            raise SparqlError(
                f"non-aggregate SELECT items {bad} must appear in "
                "GROUP BY"
            )
        if q["bind"]:
            raise SparqlError("BIND with GROUP BY is unsupported here")
        out = bgp.bgp_agg(
            edges, q["patterns"], group_by=q["group_by"], aggs=q["aggs"],
            having=q["having"], reorder=use_reorder, **match_kw, **kw,
        )
        if q["order_by"]:
            cols = set(out.schema().names)
            keys, desc = [], []
            for col, d in q["order_by"]:
                col = col.lstrip("?")
                if col not in cols:
                    raise SparqlError(
                        f"ORDER BY {col!r} not in aggregate output "
                        f"{sorted(cols)}"
                    )
                keys.append(col)
                desc.append(d == "desc")
            out = out.sort(key=keys, descending=desc)
        return _slice_solution(
            out, q["limit"], q["offset"], has_order=bool(q["order_by"])
        )
    return bgp.bgp_select(
        edges, q["patterns"], project=q["project"], bind=q["bind"],
        distinct=q["distinct"], order_by=q["order_by"], limit=q["limit"],
        offset=q["offset"] or 0, reorder=use_reorder, **match_kw, **kw,
    )
