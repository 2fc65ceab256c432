"""Property tests: sssp_khop and funnel_counts vs straightforward
scalar references on random inputs (the dual-path parity tests in
test_graphalgo.py cover broadcast vs joined; here the BROADCAST path is
checked against semantics-by-definition brute force)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from kgray.graphalgo import sssp_khop
from kgray.streaming import funnel_counts

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # src
        st.integers(min_value=0, max_value=12),   # dst
        st.integers(min_value=1, max_value=9),    # weight
    ),
    min_size=0,
    max_size=40,
)


def _ref_sssp(edges, source, k):
    dist = {source: 0}
    for _ in range(k):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, dist[s] + w + 1):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


@settings(max_examples=12, deadline=None)
@given(edges_strategy, st.integers(min_value=0, max_value=12))
def test_sssp_matches_bruteforce(ray_session, edges, source):
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], type=pa.int64()),
            "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            "w": pa.array([e[2] for e in edges], type=pa.int64()),
        }
    )
    out = sssp_khop(rd.from_arrow(t).repartition(2), source=source, max_hops=3)
    got = dict(zip(out["node_id"].to_pylist(), out["dist"].to_pylist()))
    assert got == _ref_sssp(edges, source, 3)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),    # user
        st.sampled_from(["a", "b", "c", "x"]),    # type (x = noise)
        st.integers(min_value=0, max_value=20),   # ts
    ),
    min_size=0,
    max_size=40,
)


def _ref_funnel(events, steps):
    users = {u for u, _, _ in events}
    counts = []
    cur = {}
    for i, step in enumerate(steps):
        nxt = {}
        for u in users:
            if i > 0 and u not in cur:
                continue
            ts = [
                t for uu, s, t in events
                if uu == u and s == step and (i == 0 or t > cur[u])
            ]
            if ts:
                nxt[u] = min(ts)
        cur = nxt
        counts.append(len(cur))
    return counts


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_funnel_matches_bruteforce(ray_session, events):
    t = pa.table(
        {
            "user_id": pa.array([e[0] for e in events], type=pa.int64()),
            "event_type": pa.array([e[1] for e in events]),
            "ts_us": pa.array([e[2] for e in events], type=pa.int64()),
        }
    )
    for steps in (["a", "b"], ["a", "b", "b"], ["a", "b", "c"]):
        out = funnel_counts(
            rd.from_arrow(t).repartition(2), steps=steps, num_buckets=4
        )
        assert out["n_users"].to_pylist() == _ref_funnel(events, steps), steps
