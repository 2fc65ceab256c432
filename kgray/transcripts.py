"""Deterministic synthetic transcript corpus + entity catalog.

The engine's primary input (BASELINE.json input_hint) is a Parquet table of
multi-turn conversation transcripts ``(conv_id, turn_idx, role, text, tool,
ts)``. No such table ships with the test data, so this module synthesises one
*deterministically* from the ``documents`` table's ``doc_id`` column: every
field is a closed-form arithmetic function of ``(doc_id, turn_idx)``. That
makes the whole KG pipeline verifiable by a DuckDB oracle (the SQL reproduces
the same arithmetic) while the Ray pipeline does the real work — regex
extraction over the text, alias-dict linking, union-find canonicalization.

Corpus grammar (all indices are int64, NE=1000 entities, NP=6 predicates):

- conversation c (one per ``doc_id``) has ``1 + c % 7`` turns
- turn t text = FILL_A[(c+t)%4]  [+ sentence1]  [+ sentence2]  + FILL_B[(3c+t)%4] + '.'
- sentence1 (present unless ``(5c+t) % 11 == 0``):
    ``Ent{s1} {VERB[p1]} Ent{o1'}`` with s1=(31c+7t)%NE, o1=(17c+11t+1)%NE,
    p1=(c+t)%NP; o1' = o1 + NE when ``(c+t) % 13 == 0`` (an unlinkable mention
    — exercises the drop-unmatched join semantics, `Kuzu:342-347`)
- sentence2 (present when ``(c+2t) % 9 == 0``):
    ``Ent{s2} {VERB[p2]} Ent{o2}`` with s2=(13c+5t)%NE, o2=(7c+3t+2)%NE,
    p2=(2c+t)%NP
- role = ['user','assistant','tool'][t%3]; tool = 'search' iff role='tool'
- ts = 2025-01-01T00:00:00 + (3600c + 60t) seconds

Entity catalog (i in [0, NE)): name ``Ent{i}``, raw id ``RAW:{i}``,
equivalent_identifiers [``RAW:{i}``, ``EQ:{i//2}``] (pairs {2k, 2k+1} are
coreferent -> canonical id ``RAW:{2k}``), categories
[``biolink:NamedThing``, ORDERED_CATEGORIES[i%25]].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import ORDERED_CATEGORIES

NE = 1000          # entity vocabulary size
NP = 6             # number of predicates
MAX_TURNS = 7      # turns per conversation in [1, MAX_TURNS]

VERBS = ["treats", "affects", "causes", "interacts with", "is part of", "is expressed in"]
PREDICATES = [
    "biolink:treats", "biolink:affects", "biolink:causes",
    "biolink:interacts_with", "biolink:part_of", "biolink:expressed_in",
]
FILL_A = ["please note", "we observed", "records show", "analysis indicates"]
FILL_B = ["in the study", "during review", "per the report", "at followup"]
ROLES = ["user", "assistant", "tool"]
KNOWLEDGE_SOURCE = "infores:kgray"

_TS_BASE_US = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)


def _concat(*arrs) -> pa.Array:
    """Element-wise string concatenation (C kernels, no Python loop)."""
    return pc.binary_join_element_wise(*arrs, "")


def _s(ints: np.ndarray) -> pa.Array:
    return pc.cast(pa.array(ints, type=pa.int64()), pa.string())


def _take(options: list[str], idx: np.ndarray) -> pa.Array:
    return pa.array(options, type=pa.string()).take(pa.array(idx, type=pa.int64()))


def turn_arithmetic(c: np.ndarray, t: np.ndarray) -> dict[str, np.ndarray]:
    """The closed-form per-turn quantities; shared by generator, tests and
    the pure-Python oracle. ``c``/``t`` are int64 arrays of equal length."""
    return {
        "has1": (5 * c + t) % 11 != 0,
        "has2": (c + 2 * t) % 9 == 0,
        "unlink1": (c + t) % 13 == 0,
        "s1": (31 * c + 7 * t) % NE,
        "o1": (17 * c + 11 * t + 1) % NE,
        "p1": (c + t) % NP,
        "s2": (13 * c + 5 * t) % NE,
        "o2": (7 * c + 3 * t + 2) % NE,
        "p2": (2 * c + t) % NP,
    }


def generate_turns_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: table with ``doc_id`` -> transcript turns table.

    Fan-out is 1 + doc_id % MAX_TURNS rows per input row; all columns are
    built with vectorized Arrow/numpy kernels.
    """
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_turns = 1 + doc_id % MAX_TURNS
    c = np.repeat(doc_id, n_turns)
    # t = 0..n_turns-1 within each conversation
    ends = np.cumsum(n_turns)
    t = np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - n_turns, n_turns)

    a = turn_arithmetic(c, t)
    o1_name_idx = a["o1"] + np.where(a["unlink1"], NE, 0)

    s1txt = _concat("Ent", _s(a["s1"]), " ", _take(VERBS, a["p1"]), " Ent", _s(o1_name_idx))
    s2txt = _concat("Ent", _s(a["s2"]), " ", _take(VERBS, a["p2"]), " Ent", _s(a["o2"]))
    empty = pa.scalar("", pa.string())
    seg1 = pc.if_else(pa.array(a["has1"]), _concat(" ", s1txt), empty)
    seg2 = pc.if_else(pa.array(a["has2"]), _concat(" ", s2txt), empty)
    text = _concat(_take(FILL_A, (c + t) % 4), seg1, seg2, " ", _take(FILL_B, (3 * c + t) % 4), ".")

    role = _take(ROLES, t % 3)
    tool = pc.if_else(pc.equal(role, "tool"), pa.scalar("search", pa.string()), empty)
    ts = pa.array((_TS_BASE_US + (3600 * c + 60 * t) * 1_000_000).view("datetime64[us]"))

    return pa.table(
        {
            "conv_id": _concat("conv-", _s(c)),
            "turn_idx": pa.array(t, type=pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def transcripts_dataset(sf_dir: str, repeat: int = 1, num_blocks: int | None = None):
    """Transcript corpus as a lazy Ray Dataset derived from ``documents``.

    Reads only the ``doc_id`` column (prune at the read), then fans out to
    turns inside map_batches. ``repeat`` > 1 replicates the corpus with
    distinct conv_id suffixes (bench scaling only; not used by oracles).

    ``num_blocks``: the seed file is tiny (one parquet row group), which
    would pin the whole fused generate->extract chain to ONE task; split
    the read so downstream map stages parallelize across the cluster.
    """
    import pyarrow.parquet as pq

    import ray.data

    if num_blocks is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        num_blocks = max(16, 2 * cpus)
    # The seed is ONE tiny parquet (a single row group): `read_parquet` would
    # funnel it through a single SplitBlocks producer task whose streaming
    # generator hands blocks to the executor one driver round-trip at a time
    # (~50ms/block — measured 3.5s to emit 64 sub-KB blocks, serializing the
    # whole downstream chain). Read the id column driver-side instead and
    # seed `from_arrow` with pre-split slices: all blocks hit the object
    # store at once and every downstream task dispatches immediately. A real
    # transcript corpus (many files, many row groups) reads via
    # `ray.data.read_parquet` as usual — parallel producers don't trickle.
    seed = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = seed.num_rows
    # bound per-task memory: ~4 turns/doc x repeat rows per seed doc; cap
    # blocks at ~600k generated turns each (~200MB heap) so heap stays flat
    # as the replication factor grows, without over-splitting mid-size runs
    # (every extra block costs dispatch + object-store round trips)
    est_turns = n * 4 * max(1, repeat)
    num_blocks = min(n, max(num_blocks, est_turns // 600_000))
    bounds = np.linspace(0, n, num_blocks + 1).astype(np.int64)
    slices = [
        seed.slice(int(a), int(b - a)) for a, b in zip(bounds[:-1], bounds[1:])
        if b > a
    ]
    ds = ray.data.from_arrow(slices)
    if repeat > 1:
        def replicate(batch: pa.Table, *, k=repeat) -> pa.Table:
            # vectorized k-fold replication: ONE take per column + ONE join
            # for the conv_id suffix (a per-copy loop would pay k kernel
            # dispatches per task — measured ~50ms/task of pure overhead)
            turns = generate_turns_batch(batch)
            n = turns.num_rows
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
            rep = turns.take(idx)
            suffix = pa.array(
                ["" if r == 0 else f"-r{r}" for r in range(k)], type=pa.string()
            ).take(pa.array(np.repeat(np.arange(k, dtype=np.int64), n)))
            conv = _concat(rep["conv_id"].combine_chunks(), suffix)
            return rep.set_column(0, "conv_id", conv)
        return ds.map_batches(replicate, batch_format="pyarrow")
    return ds.map_batches(generate_turns_batch, batch_format="pyarrow")


def entity_catalog() -> pa.Table:
    """The deterministic entity catalog (built once, broadcast to linkers)."""
    i = np.arange(NE, dtype=np.int64)
    name = _concat("Ent", _s(i))
    raw_id = _concat("RAW:", _s(i))
    eq_id = _concat("EQ:", _s(i // 2))
    canonical_id = _concat("RAW:", _s((i // 2) * 2))
    canonical_name = _concat("Ent", _s((i // 2) * 2))

    equiv = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * NE + 1, 2, dtype=np.int32)),
        _concat(
            pc.if_else(pa.array(np.tile([True, False], NE)), "RAW:", "EQ:"),
            _s(np.stack([i, i // 2], axis=1).reshape(-1)),
        ),
    )
    cats = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * NE + 1, 2, dtype=np.int32)),
        _take(
            ["biolink:NamedThing"] + ORDERED_CATEGORIES,
            np.stack([np.zeros(NE, dtype=np.int64), i % 25 + 1], axis=1).reshape(-1),
        ),
    )
    # alias forms the linker resolves beyond the exact surface name:
    # 'ENT{i}' (uppercase) and 'entity {i}'
    rep = pa.array(np.repeat(np.arange(NE, dtype=np.int64), 2))
    alternate = pa.array(np.tile([True, False], NE))
    aliases = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * NE + 1, 2, dtype=np.int32)),
        pc.if_else(
            alternate,
            pc.utf8_upper(name).take(rep),
            _concat("entity ", _s(i)).take(rep),
        ),
    )

    return pa.table(
        {
            "id": raw_id,
            "name": name,
            "aliases": aliases,
            "categories": cats,
            "equivalent_identifiers": equiv,
            "canonical_id": canonical_id,
            "canonical_name": canonical_name,
        }
    )


def context_pairs(ds, k: int = 2):
    """Training-example construction over the transcript stream: for each
    assistant turn, a (context, target) pair where context is the previous
    up-to-``k`` turns newline-joined in order — the window that a
    supervised fine-tuning pipeline feeds the model.

    One conv-keyed shuffle co-locates each conversation; the per-bucket
    reducer mergesorts and builds contexts with vectorized group-wise
    shifts (no per-row Python). Turns near the conversation start keep
    whatever context exists (leading separators trimmed), matching SQL's
    NULL-LAG + ltrim semantics.
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        parts = [g["text"].shift(i).fillna("") for i in range(k, 0, -1)]
        ctx = parts[0]
        for p in parts[1:]:
            ctx = ctx + "\n" + p
        ctx = ctx.str.lstrip("\n")
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "turn_idx": df["turn_idx"].astype("int64"),
                "context": ctx,
                "target": df["text"],
            }
        )
        return out[(df["role"] == "assistant").to_numpy()]

    cols = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    return hash_bucketed_groupby(cols, ["conv_id"], fn)


def _chunk(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


_KNUTH = 2654435761  # Knuth multiplicative hash (public domain)


def preference_pairs(
    ds,
    key_col: str = "conv_key",
    num_buckets: int = 8,
):
    """DPO/RLHF preference-pair construction by deterministic in-bucket
    negative mining: each assistant turn's (context-free) chosen response
    is paired with the SAME-position response from the next conversation
    in its hash bucket (wrapping), a plausible-but-wrong negative — the
    standard in-batch-negative trick, made reproducible.

    Partitioning: turn_idx alone has tiny cardinality (<= max turns), so
    a (turn_idx)-keyed shuffle would funnel the corpus into a handful of
    tasks. Instead the shuffle key is (turn_idx, bucket) where bucket =
    Knuth-hash(conv key) % num_buckets — cardinality scales with
    ``num_buckets`` (raise it with the cluster), negatives stay valid
    (any other conversation's same-position response), and the SQL
    mirror reproduces the exact pairing. Single-row sub-buckets would
    self-pair and are dropped.

    ``ds`` needs (conv_id, turn_idx, role, text, ``key_col``) where
    ``key_col`` is an int64 conversation key. Emits (conv_id, turn_idx,
    chosen, rejected, neg_conv_id).
    """
    import pandas as pd

    from .relational import hash_bucketed_groupby

    def add_bucket(t: pa.Table) -> pa.Table:
        key = _chunk(t[key_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (key * _KNUTH) % (1 << 32) % num_buckets
        keep = pc.equal(_chunk(t["role"]), "assistant")
        return (
            t.select(["conv_id", "turn_idx", "text"])
            .append_column("bucket", pa.array(b, type=pa.int64()))
            .filter(keep)
        )

    def pair(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["turn_idx", "bucket", "conv_id"], kind="mergesort")
        g = df.groupby(["turn_idx", "bucket"], sort=False)
        nxt_text = g["text"].shift(-1)
        nxt_conv = g["conv_id"].shift(-1)
        first_text = g["text"].transform("first")
        first_conv = g["conv_id"].transform("first")
        rejected = nxt_text.fillna(first_text)
        neg_conv = nxt_conv.fillna(first_conv)
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "turn_idx": df["turn_idx"].astype("int64"),
                "chosen": df["text"],
                "rejected": rejected,
                "neg_conv_id": neg_conv,
            }
        )
        return out[(neg_conv != df["conv_id"]).to_numpy()]

    staged = ds.map_batches(add_bucket, batch_format="pyarrow")
    return hash_bucketed_groupby(staged, ["turn_idx", "bucket"], pair)


def speaker_token_share(ds, scale: int = 1_000_000):
    """Per-conversation role token budget — the balance gate an SFT
    curation pass applies (a conversation that is nearly all user text,
    or nearly all assistant text, trains poorly). Per batch ONE Arrow
    whitespace tokenize + list-length gives per-turn token counts; the
    role splits them into masked per-role partials (int multiply, no
    branching), so the conv-keyed reduce moves four int64 columns per
    turn and nothing else. Exact integers end to end.

    Returns Dataset(conv_id, n_turns, tok_user, tok_assistant, tok_tool,
    assistant_share_ppm) with share = floor(scale * tok_assistant /
    total_tokens).
    """
    from .relational import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        tok = pc.list_value_length(
            pc.utf8_split_whitespace(_chunk(t["text"]))
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        role = _chunk(t["role"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": _chunk(t["conv_id"]),
                "n_turns": pa.array(np.ones(len(tok), dtype=np.int64)),
                "tok_user": pa.array(tok * (role == "user")),
                "tok_assistant": pa.array(tok * (role == "assistant")),
                "tok_tool": pa.array(tok * (role == "tool")),
            }
        )

    per = grouped_agg(
        ds.select_columns(["conv_id", "role", "text"]).map_batches(
            part, batch_format="pyarrow"
        ),
        keys=["conv_id"],
        sums={
            "n_turns": "n_turns", "tok_user": "tok_user",
            "tok_assistant": "tok_assistant", "tok_tool": "tok_tool",
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        u = _chunk(t["tok_user"]).to_numpy(zero_copy_only=False).astype(np.int64)
        a = _chunk(t["tok_assistant"]).to_numpy(zero_copy_only=False).astype(np.int64)
        o = _chunk(t["tok_tool"]).to_numpy(zero_copy_only=False).astype(np.int64)
        total = np.maximum(u + a + o, 1)
        return t.append_column(
            "assistant_share_ppm", pa.array((scale * a) // total)
        )

    return per.map_batches(finish, batch_format="pyarrow")


def mention_density(ds, scale: int = 1_000_000):
    """Per-conversation entity-mention density — the KG-signal gate a
    transcript-curation pass uses to rank conversations by how much
    linkable structure they carry. Mentions are counted with RE2 kernels
    over the REAL text (``Ent[0-9]+``; the unlinkable planted ids
    1000-1999 match ``Ent1[0-9]{3}``), so the Ray side exercises the
    extraction surface while the SQL mirror re-derives the same counts
    from the corpus arithmetic. Embarrassingly parallel per batch, one
    conv-keyed int reduce.

    Returns Dataset(conv_id, n_turns, n_mentions, n_unlinkable,
    mention_density_ppm) with density = floor(scale * n_mentions /
    n_turns).
    """
    from .relational import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        text = _chunk(t["text"])
        total = pc.count_substring_regex(text, "Ent[0-9]+").cast(pa.int64())
        unlink = pc.count_substring_regex(text, "Ent1[0-9]{3}").cast(pa.int64())
        return pa.table(
            {
                "conv_id": _chunk(t["conv_id"]),
                "n_turns": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_mentions": total,
                "n_unlinkable": unlink,
            }
        )

    per = grouped_agg(
        ds.select_columns(["conv_id", "text"]).map_batches(
            part, batch_format="pyarrow"
        ),
        keys=["conv_id"],
        sums={
            "n_turns": "n_turns", "n_mentions": "n_mentions",
            "n_unlinkable": "n_unlinkable",
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        m = _chunk(t["n_mentions"]).to_numpy(zero_copy_only=False).astype(np.int64)
        nt = _chunk(t["n_turns"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "mention_density_ppm", pa.array((scale * m) // nt)
        )

    return per.map_batches(finish, batch_format="pyarrow")
