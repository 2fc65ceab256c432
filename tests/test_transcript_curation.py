"""Per-conversation curation operators over the transcript stream:
role token budgets, mention density, and the composite SFT gate."""

import numpy as np
import pyarrow as pa
import ray

from kgray.transcripts import mention_density, speaker_token_share


def _ds(rows, nblocks=2):
    return ray.data.from_items(rows, override_num_blocks=nblocks)


TURNS = [
    # conv a: user 3 tokens, assistant 5, tool 2  -> share 5/10
    {"conv_id": "a", "role": "user", "text": "how does it"},
    {"conv_id": "a", "role": "assistant", "text": "Ent1 treats Ent2 per report"},
    {"conv_id": "a", "role": "tool", "text": "search done"},
    # conv b: single user turn with an unlinkable planted mention
    {"conv_id": "b", "role": "user", "text": "we saw Ent1234 and Ent7"},
]


def test_speaker_token_share_exact(ray_session):
    out = {r["conv_id"]: r for r in speaker_token_share(_ds(TURNS)).take_all()}
    a = out["a"]
    assert (a["n_turns"], a["tok_user"], a["tok_assistant"], a["tok_tool"]) == (
        3, 3, 5, 2,
    )
    assert a["assistant_share_ppm"] == (1_000_000 * 5) // 10
    b = out["b"]
    assert (b["n_turns"], b["tok_user"], b["tok_assistant"]) == (1, 5, 0)
    assert b["assistant_share_ppm"] == 0


def test_mention_density_counts_and_unlinkables(ray_session):
    out = {r["conv_id"]: r for r in mention_density(_ds(TURNS)).take_all()}
    a = out["a"]
    # conv a has 2 mentions in one of 3 turns, none unlinkable
    assert (a["n_mentions"], a["n_unlinkable"]) == (2, 0)
    assert a["mention_density_ppm"] == (1_000_000 * 2) // 3
    # conv b: Ent1234 is in the planted-unlinkable id range 1000-1999
    b = out["b"]
    assert (b["n_mentions"], b["n_unlinkable"]) == (2, 1)


def test_preference_pairs_wrap_and_singleton_drop(ray_session):
    """In-bucket negative mining: within a (turn_idx, bucket) group the
    rejected response is the NEXT conversation's same-position text in
    conv_id order, the last wraps to the first, and single-row groups
    (which would self-pair) are dropped."""
    from kgray.transcripts import preference_pairs

    # one bucket (num_buckets=1): conv keys irrelevant to grouping
    rows = [
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "r1", "conv_key": 1},
        {"conv_id": "c2", "turn_idx": 1, "role": "assistant",
         "text": "r2", "conv_key": 2},
        {"conv_id": "c3", "turn_idx": 1, "role": "assistant",
         "text": "r3", "conv_key": 3},
        # a user turn is ignored
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "q", "conv_key": 1},
        # singleton at turn_idx 4 -> dropped
        {"conv_id": "c9", "turn_idx": 4, "role": "assistant",
         "text": "solo", "conv_key": 9},
    ]
    for nblocks in (1, 3):
        ds = _ds(rows, nblocks)
        got = sorted(
            preference_pairs(ds, num_buckets=1).take_all(),
            key=lambda r: r["conv_id"],
        )
        assert [(r["conv_id"], r["rejected"], r["neg_conv_id"]) for r in got] == [
            ("c1", "r2", "c2"), ("c2", "r3", "c3"), ("c3", "r1", "c1"),
        ]


def test_parallelism_invariance(ray_session):
    """Both reducers are integer partial sums — identical at any block
    count."""
    rows = []
    rng = np.random.default_rng(3)
    for c in range(30):
        for t in range(1 + c % 5):
            words = ["w%d" % w for w in rng.integers(0, 50, size=2 + (c + t) % 6)]
            if (c + t) % 3 == 0:
                words.append("Ent%d" % ((c * 7 + t) % 1500))
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "role": ["user", "assistant", "tool"][t % 3],
                    "text": " ".join(words),
                }
            )
    one = sorted(
        speaker_token_share(_ds(rows, 1)).take_all(), key=lambda r: r["conv_id"]
    )
    four = sorted(
        speaker_token_share(_ds(rows, 4)).take_all(), key=lambda r: r["conv_id"]
    )
    assert one == four
    d1 = sorted(mention_density(_ds(rows, 1)).take_all(), key=lambda r: r["conv_id"])
    d4 = sorted(mention_density(_ds(rows, 4)).take_all(), key=lambda r: r["conv_id"])
    assert d1 == d4
