"""Pure-Python single-process oracle for the KG pipeline.

Implements the reference rules verbatim (per-row loops, no Ray, no Arrow)
so the distributed pipeline's output can be compared triple-for-triple
(FIXTURES.md F5: P/R >= 0.95, target 1.0 at fixture scale).
"""

from __future__ import annotations

import re

from kgray.schema import ORDERED_CATEGORIES
from kgray.transcripts import (
    FILL_A, FILL_B, MAX_TURNS, NE, NP, PREDICATES, ROLES, VERBS,
)


def reorder_node_classes_reference(node_classes: str) -> list[str]:
    """Near-verbatim port of the reference reorder (Kuzu:159-182) with the
    one deliberate delta: dedup keeps first-seen order (deterministic) so the
    tail is well-defined. Element 0 is identical to the reference for any
    input."""
    seen = []
    for c in node_classes.split(";"):
        if c not in seen:
            seen.append(c)
    for oc in ORDERED_CATEGORIES:
        if oc in seen:
            if seen.index(oc) != 0:
                seen.insert(0, seen.pop(seen.index(oc)))
            break
    return seen


def oracle_turns(doc_ids) -> list[dict]:
    """Generate the corpus with plain Python loops (independent of the
    vectorized generator)."""
    turns = []
    for c in doc_ids:
        for t in range(1 + c % MAX_TURNS):
            has1 = (5 * c + t) % 11 != 0
            has2 = (c + 2 * t) % 9 == 0
            unlink1 = (c + t) % 13 == 0
            s1, o1, p1 = (31 * c + 7 * t) % NE, (17 * c + 11 * t + 1) % NE, (c + t) % NP
            s2, o2, p2 = (13 * c + 5 * t) % NE, (7 * c + 3 * t + 2) % NE, (2 * c + t) % NP
            text = FILL_A[(c + t) % 4]
            if has1:
                o1n = o1 + (NE if unlink1 else 0)
                text += f" Ent{s1} {VERBS[p1]} Ent{o1n}"
            if has2:
                text += f" Ent{s2} {VERBS[p2]} Ent{o2}"
            text += " " + FILL_B[(3 * c + t) % 4] + "."
            role = ROLES[t % 3]
            turns.append(
                {
                    "conv_id": f"conv-{c}",
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": "search" if role == "tool" else "",
                    "_c": c,
                    "_t": t,
                }
            )
    return turns


_RX = re.compile(
    r"\b([A-Z][A-Za-z0-9_-]*) ("
    + "|".join(sorted((re.escape(v) for v in VERBS), key=len, reverse=True))
    + r") ([A-Z][A-Za-z0-9_-]*)\b"
)
_PRED = dict(zip(VERBS, PREDICATES))


def oracle_triples(turns: list[dict]) -> list[dict]:
    """Regex extraction + linking + canonicalization, row at a time."""
    out = []
    for turn in turns:
        for s, v, o in _RX.findall(turn["text"]):
            out.append(
                {
                    "conv_id": turn["conv_id"],
                    "turn_idx": turn["turn_idx"],
                    "subject_mention": s,
                    "predicate": _PRED[v],
                    "object_mention": o,
                }
            )
    return out


def oracle_link(mention: str) -> str | None:
    if mention.startswith("Ent"):
        i = int(mention[3:])
        if i < NE:
            return f"RAW:{i}"
    return None


def oracle_canonical(raw_id: str) -> str:
    i = int(raw_id.split(":")[1])
    return f"RAW:{(i // 2) * 2}"


def oracle_edges(turns: list[dict]) -> set[tuple[str, str, str]]:
    """The expected deduplicated canonical (subject, predicate, object) set."""
    edges = set()
    for tr in oracle_triples(turns):
        s = oracle_link(tr["subject_mention"])
        o = oracle_link(tr["object_mention"])
        if s is None or o is None:
            continue
        edges.add((oracle_canonical(s), tr["predicate"], oracle_canonical(o)))
    return edges


def oracle_nodes(edges: set[tuple[str, str, str]]) -> dict[str, dict]:
    """Expected node table keyed by canonical id."""
    nodes = {}
    for s, _, o in edges:
        for nid in (s, o):
            if nid in nodes:
                continue
            i = int(nid.split(":")[1])
            cats = ["biolink:NamedThing", ORDERED_CATEGORIES[i % 25]]
            labels = reorder_node_classes_reference(";".join(cats))
            nodes[nid] = {
                "name": f"Ent{i}",
                "labels": labels,
                "primary_class": labels[0].split(":")[-1],
            }
    return nodes
