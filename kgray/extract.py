"""Rule/pattern triple extraction over transcript turns.

The per-turn analog of the reference's record parsers: where
`MemGraph/mg_build_individual_json.py:310-322` turns one JSONL line into one
edge record, this stage turns one transcript turn into zero-or-more
``(subject_mention, predicate, object_mention)`` triples via a configurable
pattern ruleset.

Designed as a callable class for ``map_batches`` actor pools: the combined
regex and the verb->predicate map are compiled ONCE per actor in
``__init__``; ``__call__`` processes an Arrow batch. The regex engine is
per-row by nature, but everything around it (column assembly, repetition,
predicate mapping) is vectorized Arrow/numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import TRIPLE_SCHEMA
from .transcripts import PREDICATES, VERBS
from .util import pool_concurrency

# entity mention grammar: a capitalized token (the corpus's surface form)
ENTITY_PATTERN = r"[A-Z][A-Za-z0-9_-]*"

DEFAULT_RULES: list[tuple[str, str]] = list(zip(VERBS, PREDICATES))


class TripleExtractor:
    """Stateful map_batches stage: pattern-based triple extraction.

    ``rules`` is a list of ``(verb_phrase, predicate_curie)``. All verb
    phrases are compiled into ONE alternation regex
    ``\\b(ENTITY) (verb1|verb2|...) (ENTITY)\\b`` so each text is scanned
    once. Matches are non-overlapping left-to-right (``re.finditer``
    semantics) — chained mentions share no entity token.
    """

    def __init__(self, rules: list[tuple[str, str]] | None = None,
                 entity_pattern: str = ENTITY_PATTERN):
        rules = rules if rules is not None else DEFAULT_RULES
        # longest-first so 'is expressed in' wins over a prefix verb
        ordered = sorted(rules, key=lambda r: -len(r[0]))
        verb_alt = "|".join(re.escape(v) for v, _ in ordered)
        self._rx = re.compile(rf"\b({entity_pattern}) ({verb_alt}) ({entity_pattern})\b")
        self._pred_of = {v: p for v, p in rules}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        findall = self._rx.findall
        matches_per_row = [findall(t) if t else [] for t in texts]
        counts = np.fromiter((len(m) for m in matches_per_row), dtype=np.int64,
                             count=len(matches_per_row))
        total = int(counts.sum())
        if total == 0:
            return TRIPLE_SCHEMA.empty_table()

        subjects = np.empty(total, dtype=object)
        verbs = np.empty(total, dtype=object)
        objects = np.empty(total, dtype=object)
        pos = 0
        for matches in matches_per_row:
            for s, v, o in matches:
                subjects[pos] = s
                verbs[pos] = v
                objects[pos] = o
                pos += 1

        idx = pa.array(np.repeat(np.arange(len(texts), dtype=np.int64), counts))
        verb_arr = pa.array(verbs, type=pa.string())
        # verb -> predicate via dictionary encoding (map only the uniques)
        enc = pc.dictionary_encode(verb_arr)
        pred_dict = pa.array(
            [self._pred_of[v] for v in enc.dictionary.to_pylist()], type=pa.string()
        )
        predicate = pred_dict.take(enc.indices)

        return pa.table(
            {
                "conv_id": batch["conv_id"].take(idx),
                "turn_idx": batch["turn_idx"].take(idx),
                "subject_mention": pa.array(subjects, type=pa.string()),
                "predicate": predicate,
                "object_mention": pa.array(objects, type=pa.string()),
            }
        )


class MentionDetector:
    """Stateful map_batches stage: bare entity-mention detection.

    Emits one ``(conv_id, turn_idx, mention)`` row per entity occurrence.
    """

    def __init__(self, entity_pattern: str = ENTITY_PATTERN):
        self._rx = re.compile(rf"\b({entity_pattern})\b")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        findall = self._rx.findall
        per_row = [findall(t) if t else [] for t in texts]
        counts = np.fromiter((len(m) for m in per_row), dtype=np.int64, count=len(per_row))
        flat = [m for row in per_row for m in row]
        idx = pa.array(np.repeat(np.arange(len(texts), dtype=np.int64), counts))
        return pa.table(
            {
                "conv_id": batch["conv_id"].take(idx),
                "turn_idx": batch["turn_idx"].take(idx),
                "mention": pa.array(flat, type=pa.string()),
            }
        )


# per-worker-process extractor cache for the task-based path: compiled once
# per (rules) per worker, reused across tasks — same amortization as an
# actor pool without pool spin-up, and task stages FUSE with neighbors
_EXTRACTOR_CACHE: dict = {}


def _extract_batch(batch: pa.Table, rules_key=None) -> pa.Table:
    ex = _EXTRACTOR_CACHE.get(rules_key)
    if ex is None:
        ex = TripleExtractor(list(rules_key) if rules_key else None)
        _EXTRACTOR_CACHE[rules_key] = ex
    return ex(batch)


def extract_triples(
    transcripts,
    rules=None,
    batch_size: int | None = None,
    concurrency=None,
    use_actors: bool = False,
):
    """Wire the extractor into a Dataset pipeline.

    Default is STATELESS TASKS with a per-worker compiled-regex cache:
    elastic across the whole cluster, fuses with adjacent map stages, no
    actor-pool spin-up. Set ``use_actors=True`` for the actor-pool form —
    the right choice when per-actor state is heavy (big models/tries) and
    its memory footprint must be bounded by an explicit pool size.
    """
    if use_actors:
        kwargs = dict(
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None else pool_concurrency(),
        )
        if rules is not None:
            kwargs["fn_constructor_kwargs"] = {"rules": rules}
        return transcripts.map_batches(TripleExtractor, **kwargs)
    rules_key = tuple(tuple(r) for r in rules) if rules is not None else None
    # batch_size=None -> one batch per block: keeps task granularity =
    # input blocks (a row-count batch_size would coalesce fan-out stages
    # into too-few tasks, since bundling counts INPUT rows)
    return transcripts.map_batches(
        _extract_batch,
        fn_kwargs={"rules_key": rules_key},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
