"""Graph analytics: connected components / dedup clusters, integer
PageRank (broadcast vs distributed-join parity), degrees, triangles."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from kgray import graphalgo


def _pairs_ds(pairs, nblocks=4):
    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], type=pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(nblocks)


def _edges_ds(edges, nblocks=4):
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], type=pa.int64()),
            "dst": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(nblocks)


PAIRS = [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (12, 13), (3, 1)]
# components: {1,2,3} -> 1, {7,8} -> 7, {10..13} -> 10


class TestConnectedComponents:
    def test_local(self):
        out = graphalgo.connected_components_local(_pairs_ds(PAIRS))
        got = dict(zip(out["id"].to_pylist(), out["component_id"].to_pylist()))
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10, 12: 10, 13: 10}

    def test_distributed_matches_local(self):
        dist = graphalgo.connected_components_distributed(_pairs_ds(PAIRS))
        got = {
            r["id"]: r["component_id"]
            for b in dist.iter_batches(batch_format="pandas")
            for r in b.to_dict("records")
        }
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10, 12: 10, 13: 10}

    def test_chain_diameter(self):
        # a 30-node path graph exercises multi-round label propagation
        chain = [(i, i + 1) for i in range(30)]
        dist = graphalgo.connected_components_distributed(_pairs_ds(chain, 8))
        rows = pa.concat_tables(
            list(dist.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        )
        assert set(rows["component_id"].to_pylist()) == {0}
        assert rows.num_rows == 31

    def test_dedup_clusters_with_singletons(self):
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(list(range(15)), type=pa.int64())})
        )
        out = graphalgo.dedup_clusters(docs, _pairs_ds(PAIRS))
        t = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        )
        m = dict(zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()))
        canon = dict(zip(t["doc_id"].to_pylist(), t["is_canonical"].to_pylist()))
        assert m[1] == m[2] == m[3] == 1 and m[7] == m[8] == 7
        assert m[10] == m[11] == m[12] == m[13] == 10
        # singletons are their own cluster and survive
        assert m[0] == 0 and m[5] == 5 and canon[5] == 1
        # exactly one survivor per cluster, and it's the min id
        assert canon[1] == 1 and canon[2] == 0 and canon[3] == 0
        assert t.num_rows == 15

    def test_dedup_clusters_join_path_matches(self):
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(list(range(15)), type=pa.int64())})
        )
        broadcast = graphalgo.dedup_clusters(docs, _pairs_ds(PAIRS))
        joined = graphalgo.dedup_clusters(docs, _pairs_ds(PAIRS), local_limit=0)

        def collect(ds):
            t = pa.concat_tables(
                list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
            )
            return sorted(
                zip(
                    t["doc_id"].to_pylist(),
                    t["cluster_id"].to_pylist(),
                    t["is_canonical"].to_pylist(),
                )
            )

        assert collect(broadcast) == collect(joined)


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 0), (3, 2), (4, 4)]


class TestPageRank:
    def test_hand_checked_first_iteration(self):
        # single directed edge 0 -> 1, iters=1, tiny scale for hand math
        ds = _edges_ds([(0, 1)], 1)
        out = graphalgo.pagerank(ds, iters=1, scale=1000)
        got = dict(zip(out["node_id"].to_pylist(), out["rank_fp"].to_pylist()))
        # N=2, r0 = 500; base = 150*1000 // 2000 = 75
        # contrib(0->1) = (500*850) // (1000*1) = 425
        assert got == {0: 75, 1: 75 + 425}

    def test_mass_bound_and_determinism(self):
        out1 = graphalgo.pagerank(_edges_ds(EDGES, 2), iters=5)
        out2 = graphalgo.pagerank(_edges_ds(EDGES, 5), iters=5)
        assert out1.to_pydict() == out2.to_pydict()  # partition-invariant
        total = sum(out1["rank_fp"].to_pylist())
        assert 0 < total <= 10**12  # floor division only loses mass

    def test_join_path_matches_broadcast(self):
        broadcast = graphalgo.pagerank(_edges_ds(EDGES, 3), iters=3)
        joined_ds = graphalgo.pagerank(_edges_ds(EDGES, 3), iters=3, node_limit=0)
        t = pa.concat_tables(
            list(joined_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        )
        b = sorted(zip(broadcast["node_id"].to_pylist(), broadcast["rank_fp"].to_pylist()))
        j = sorted(zip(t["node_id"].to_pylist(), t["rank_fp"].to_pylist()))
        assert b == j

    def test_multi_edges_carry_weight(self):
        # duplicate edge doubles the contribution
        single = graphalgo.pagerank(_edges_ds([(0, 1), (0, 2)], 1), iters=1, scale=10**6)
        double = graphalgo.pagerank(
            _edges_ds([(0, 1), (0, 1), (0, 2), (0, 2)], 1), iters=1, scale=10**6
        )
        s = dict(zip(single["node_id"].to_pylist(), single["rank_fp"].to_pylist()))
        d = dict(zip(double["node_id"].to_pylist(), double["rank_fp"].to_pylist()))
        # outdeg doubles with the multiplicity, so per-node inflow is equal
        # here — but each edge contributed separately (same floor rounding)
        assert s[1] == d[1] and s[2] == d[2]


class TestDegreesTriangles:
    def test_node_degrees(self):
        out = graphalgo.node_degrees(_edges_ds(EDGES, 3))
        t = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        )
        got = {
            r["node_id"]: (r["out_deg"], r["in_deg"])
            for r in t.to_pylist()
        }
        assert got == {
            0: (2, 2),
            1: (1, 1),
            2: (2, 3),
            3: (1, 0),
            4: (1, 1),
        }

    def test_triangle_count(self):
        # triangle 0-1-2 (with reverse + duplicate edges and a self-loop),
        # plus a pendant 3-2 edge that closes nothing
        out = graphalgo.triangle_count(_edges_ds(EDGES, 3))
        assert out["n_triangles"].to_pylist() == [1]

    def test_two_triangles_sharing_edge(self):
        edges = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)]
        out = graphalgo.triangle_count(_edges_ds(edges, 2))
        assert out["n_triangles"].to_pylist() == [2]

    def test_clustering_coefficients_known_graph(self):
        # triangle 1-2-3 plus pendant 3-4: coeff(1)=coeff(2)=1,
        # coeff(3)=1/3; node 4 (degree 1) excluded
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1)]  # dup direction
        out = graphalgo.clustering_coefficients(_edges_ds(edges, 2))
        rows = {r["node"]: r for r in out.take_all()}
        assert set(rows) == {1, 2, 3}
        assert rows[1]["coeff_ppm"] == 1_000_000 and rows[1]["n_tri"] == 1
        assert rows[2]["coeff_ppm"] == 1_000_000 and rows[2]["degree"] == 2
        assert rows[3]["coeff_ppm"] == 333_333 and rows[3]["degree"] == 3

    def test_clustering_coefficients_matches_bruteforce(self):
        rng = np.random.RandomState(7)
        edges = list({(int(a), int(b))
                      for a, b in zip(rng.randint(0, 25, 140),
                                      rng.randint(0, 25, 140))})
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for v, nbrs in adj.items():
            d = len(nbrs)
            if d < 2:
                continue
            t = sum(
                1 for x in nbrs for y in nbrs
                if x < y and (min(x, y), max(x, y)) in und
            )
            want[v] = (d, t, (2 * t * 1_000_000) // (d * (d - 1)))
        # both plan arms must match the brute force (and each other)
        for limit in (5_000_000, 0):
            out = graphalgo.clustering_coefficients(
                _edges_ds(edges, 3), broadcast_limit=limit
            )
            got = {
                r["node"]: (r["degree"], r["n_tri"], r["coeff_ppm"])
                for r in out.take_all()
            }
            assert got == want, limit

    def test_clustering_coefficients_triangle_free(self):
        # star graph: plenty of degree->=2 nodes, zero triangles
        edges = [(0, i) for i in range(1, 6)]
        out = graphalgo.clustering_coefficients(_edges_ds(edges, 2))
        rows = out.take_all()
        assert {r["node"] for r in rows} == {0}
        assert rows[0]["n_tri"] == 0 and rows[0]["coeff_ppm"] == 0


def test_pagerank_counts_path_bit_identical_to_stream(ray_session):
    """The single-pass multiplicity fast path must reproduce the
    per-edge streaming loop BIT-identically on random multigraphs
    (identical edges contribute identical floored values)."""
    rng = np.random.RandomState(23)
    n_edges = 4000
    src = rng.randint(0, 60, n_edges)
    dst = rng.randint(0, 60, n_edges)
    t = pa.table(
        {"src": pa.array(src, type=pa.int64()), "dst": pa.array(dst, type=pa.int64())}
    )

    fast = graphalgo._pagerank_counts(
        rd.from_arrow(t).repartition(8).materialize(), "src", "dst", 4, 10**12
    )
    slow = graphalgo._pagerank_broadcast(
        rd.from_arrow(t).repartition(8).materialize(), "src", "dst", 4, 10**12
    )
    f = fast.to_pandas().sort_values("node_id").reset_index(drop=True)
    s = slow.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert (f["node_id"] == s["node_id"]).all()
    assert (f["rank_fp"] == s["rank_fp"]).all()


def test_bfs_distances_hand_checked(ray_session):
    """0->1->2->3->4 chain plus a shortcut 0->3 and an unreachable node:
    dist must be the MIN hop count, bounded by max_hops."""
    t = pa.table(
        {
            "src": pa.array([0, 1, 2, 3, 0, 9], type=pa.int64()),
            "dst": pa.array([1, 2, 3, 4, 3, 9], type=pa.int64()),
        }
    )
    out = graphalgo.bfs_distances(rd.from_arrow(t), source=0, max_hops=3)
    got = dict(zip(out["node_id"].to_pylist(), out["dist"].to_pylist()))
    # 4 is reachable at hop 2 via the 0->3 shortcut; 9 is unreachable
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}

    out1 = graphalgo.bfs_distances(rd.from_arrow(t), source=0, max_hops=1)
    got1 = dict(zip(out1["node_id"].to_pylist(), out1["dist"].to_pylist()))
    assert got1 == {0: 0, 1: 1, 3: 1}


def test_random_walks_joined_matches_broadcast(ray_session):
    """The beyond-broadcast walk plan (per-step transition-table filter +
    node-keyed hash join, forced via adjacency_broadcast_limit=0) must
    reproduce the broadcast-CSR walk corpus bit-for-bit — including dead
    ends (walks that stop early), duplicate input edges (de-duplicated
    before ranking), and skewed out-degrees."""
    rng = np.random.RandomState(17)
    n_edges = 600
    src = rng.randint(0, 50, n_edges)
    dst = rng.randint(0, 80, n_edges)  # ids 50..79 are dead ends
    # plant duplicates: repeat a third of the edges verbatim
    src = np.concatenate([src, src[:200]])
    dst = np.concatenate([dst, dst[:200]])
    t = pa.table(
        {"src": pa.array(src, type=pa.int64()),
         "dst": pa.array(dst, type=pa.int64())}
    )
    ds = rd.from_arrow(t).repartition(6)

    key = lambda r: (r["walk_id"], r["step"])
    base = sorted(graphalgo.random_walks(ds, walk_len=4).take_all(), key=key)
    joined = sorted(
        graphalgo.random_walks(
            ds, walk_len=4, adjacency_broadcast_limit=0
        ).take_all(),
        key=key,
    )
    assert base == joined
    assert len(base) > 50  # non-trivial corpus
    # every start node (distinct src) opens a step-0 row
    assert {r["walk_id"] for r in base if r["step"] == 0} == set(
        np.unique(src).tolist()
    )


def test_bfs_joined_matches_broadcast(ray_session):
    """The join-based BFS frontier (forced via frontier_limit=0) must
    reproduce the broadcast path bit-for-bit: same hand-checked chain,
    and identical tables on a random multigraph at several max_hops."""
    t = pa.table(
        {
            "src": pa.array([0, 1, 2, 3, 0, 9], type=pa.int64()),
            "dst": pa.array([1, 2, 3, 4, 3, 9], type=pa.int64()),
        }
    )
    out = graphalgo.bfs_distances(
        rd.from_arrow(t), source=0, max_hops=3, frontier_limit=0
    )
    got = dict(zip(out["node_id"].to_pylist(), out["dist"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}

    rng = np.random.RandomState(31)
    big = pa.table(
        {
            "src": pa.array(rng.randint(0, 70, 500), type=pa.int64()),
            "dst": pa.array(rng.randint(0, 90, 500), type=pa.int64()),
        }
    )
    ds = rd.from_arrow(big).repartition(5)
    for hops in (1, 2, 4):
        base = graphalgo.bfs_distances(ds, source=3, max_hops=hops)
        joined = graphalgo.bfs_distances(
            ds, source=3, max_hops=hops, frontier_limit=0
        )
        assert base.equals(joined), hops

    # unreachable source still emits its dist-0 row on the joined path
    lonely = graphalgo.bfs_distances(
        rd.from_arrow(t), source=77, max_hops=2, frontier_limit=0
    )
    assert lonely["node_id"].to_pylist() == [77]
    assert lonely["dist"].to_pylist() == [0]


def test_k_core_hand_checked_and_join_parity(ray_session):
    """A 4-clique with two pendant paths: the 3-core is exactly the
    clique (peel takes 2 rounds — removing the outer pendant drops the
    inner one's degree below 3 only indirectly via the chain); the
    beyond-broadcast join path (forced limit 0) matches the driver path
    bit-for-bit."""
    from kgray.graphalgo import k_core

    clique = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pendants = [(3, 4), (4, 5)]  # chain off the clique
    edges = clique + pendants
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], type=pa.int64()),
            "dst": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    for nblocks in (1, 3):
        ds = rd.from_arrow(t).repartition(nblocks)
        got = sorted(
            (r["node_id"], r["core_deg"]) for r in k_core(ds, k=3).take_all()
        )
        assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]

    ds = rd.from_arrow(t).repartition(3)
    joined = sorted(
        (r["node_id"], r["core_deg"])
        for r in k_core(ds, k=3, edge_broadcast_limit=0).take_all()
    )
    assert joined == [(0, 3), (1, 3), (2, 3), (3, 3)]

    # k above the max degree: empty core on both paths
    assert k_core(ds, k=10).count() == 0
    assert k_core(ds, k=10, edge_broadcast_limit=0).count() == 0


class TestNeighborFanoutSample:
    # 0 -> {1..5} (dup edge 0->1 planted to exercise the distinct), 1 -> {2,3}
    EDGES = [(0, 1), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (1, 3)]

    def _expected(self):
        # rank hash h = (31*src + 17*dst) % 997; ascending (h, dst)
        # src 0: h(dst)=17*dst -> order 1,2,3,4,5; top-2 = [1, 2]
        # layer 2 frontier {1, 2}: src 1 -> h: dst2=65, dst3=82 -> top-1 = [2]
        #                          src 2 has no out-edges
        return {
            (1, 0, 1, 1), (1, 0, 2, 2),
            (2, 1, 2, 1),
        }

    def _got(self, **kw):
        out = graphalgo.neighbor_fanout_sample(
            _edges_ds(self.EDGES), seeds=[0], fanouts=[2, 1], **kw
        )
        return {
            tuple(r)
            for b in out.iter_batches(batch_format="pyarrow")
            for r in zip(
                b["layer"].to_pylist(), b["src"].to_pylist(),
                b["dst"].to_pylist(), b["rk"].to_pylist(),
            )
        }

    def test_deterministic_sample(self):
        assert self._got() == self._expected()

    def test_shuffle_semi_join_parity(self):
        # force the bloom-prefiltered shuffle arm of the frontier semi-join
        assert self._got(semi_broadcast_limit=0) == self._expected()

    def test_exhausted_frontier(self):
        out = graphalgo.neighbor_fanout_sample(
            _edges_ds([(7, 8)]), seeds=[8], fanouts=[2, 2]
        )
        assert out.count() == 0


class TestMetapathCounts:
    def test_counts_on_distinct_edges(self):
        # 0 -p0-> 1, 4 -p0-> 1, 1 -p1-> 2, 1 -p1-> 3 (plus a planted dup):
        # via middle 1: in_p0=2, out_p1=2 -> n(p0,p1)=4; plus every edge's
        # own (p_in, p_out) contributions through other middles (none here
        # except 1; middle 2/3 have no out-edges, middle 0/4 no in-edges)
        rows = [(0, 0, 1), (0, 0, 1), (4, 0, 1), (1, 1, 2), (1, 1, 3)]
        t = pa.table(
            {
                "src": pa.array([r[0] for r in rows], type=pa.int64()),
                "p": pa.array([r[1] for r in rows], type=pa.int64()),
                "dst": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        out = graphalgo.metapath_counts(rd.from_arrow(t).repartition(3))
        got = {
            (a, b): n
            for a, b, n in zip(
                out["p1"].to_pylist(), out["p2"].to_pylist(),
                out["n_paths"].to_pylist(),
            )
        }
        assert got == {(0, 1): 4}


class TestLinkPredFeatures:
    def test_square_graph(self):
        # square 0-1-2-3-0: N(0)={1,3}=N(2), N(1)={0,2}=N(3); the only
        # common-neighbor pairs are (0,2) and (1,3), each cn=2, deg 2*2,
        # jaccard = 2/(2+2-2) = 1.0 -> 1_000_000 ppm; RA = 2 middles of
        # degree 2 -> 2 * (1e6 // 2) = 1_000_000 ppm
        out = graphalgo.link_pred_features(
            _edges_ds([(0, 1), (1, 2), (2, 3), (3, 0)])
        )
        got = {
            (r["u"], r["v"]): (
                r["cn"], r["pref_attach"], r["jaccard_ppm"], r["ra_ppm"]
            )
            for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        assert got == {
            (0, 2): (2, 4, 1_000_000, 1_000_000),
            (1, 3): (2, 4, 1_000_000, 1_000_000),
        }

    @staticmethod
    def _ref(edges, cap=None):
        """Brute-force CN/PA/Jaccard/RA; ``cap`` mirrors
        max_middle_degree by skipping middles with degree > cap."""
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        deg = {v: len(ws) for v, ws in adj.items()}
        cn, ra = defaultdict(int), defaultdict(int)
        for m, ws in adj.items():
            if cap is not None and deg[m] > cap:
                continue
            ws = sorted(ws)
            for i in range(len(ws)):
                for j in range(i + 1, len(ws)):
                    p = (ws[i], ws[j])
                    cn[p] += 1
                    ra[p] += 1_000_000 // deg[m]
        return {
            p: (
                c, deg[p[0]] * deg[p[1]],
                1_000_000 * c // (deg[p[0]] + deg[p[1]] - c), ra[p],
            )
            for p, c in cn.items()
        }

    @staticmethod
    def _got(out):
        return {
            (r["u"], r["v"]): (
                r["cn"], r["pref_attach"], r["jaccard_ppm"], r["ra_ppm"]
            )
            for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }

    def _hub_graph(self):
        # hub 1000 wired to 0..99 (degree 100) + a chord mesh over 0..29
        # so pairs draw contributions from BOTH the hub and cold middles
        edges = [(1000, i) for i in range(100)]
        edges += [(i, (i + 1) % 30) for i in range(30)]
        edges += [(i, (i + 7) % 30) for i in range(0, 30, 3)]
        return edges

    def test_hot_middle_chunked_parity(self):
        """A hub over hot_middle_degree leaves the hash join for the
        block-chunked path — bit-identical features, per-task output
        bounded by hot_chunk^2, block count matches the upper-triangle
        arithmetic."""
        edges = self._hub_graph()
        want = self._ref(edges)
        cold = graphalgo.link_pred_features(_edges_ds(edges))
        assert self._got(cold) == want
        hot, audit = graphalgo.link_pred_features(
            _edges_ds(edges), hot_middle_degree=16, hot_chunk=8,
            return_audit=True,
        )
        assert self._got(hot) == want
        assert audit["capped_middles"] == 0
        assert audit["hot_chunked_middles"] == 1
        b = -(-100 // 8)  # ceil(deg/chunk) blocks per side
        assert audit["hot_chunk_tasks"] == b * (b + 1) // 2

    def test_max_middle_degree_cap_audited(self):
        """Middles over the cap are skipped exactly like the mirrored
        deg(middle) <= cap oracle filter, with the skipped wedge count
        audited; endpoint degrees stay TRUE degrees."""
        edges = self._hub_graph()
        out, audit = graphalgo.link_pred_features(
            _edges_ds(edges), max_middle_degree=50, return_audit=True,
        )
        assert self._got(out) == self._ref(edges, cap=50)
        assert audit["capped_middles"] == 1
        assert audit["capped_wedges"] == 100 * 99 // 2
        assert audit["hot_chunked_middles"] == 0

    def test_all_middles_capped_yields_empty(self):
        """A cap below EVERY node's degree (a dense graph) excludes all
        middles: the wedge join is skipped outright (no fragile
        all-empty join) and the result is an empty, well-schemaed
        dataset with the full wedge count audited."""
        # K5: every node has degree 4
        edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        out, audit = graphalgo.link_pred_features(
            _edges_ds(edges), max_middle_degree=3, return_audit=True,
        )
        assert out.count() == 0
        assert audit["capped_middles"] == 5
        assert audit["capped_wedges"] == 5 * (4 * 3 // 2)
        assert self._ref(edges, cap=3) == {}

    def test_planted_10k_hub_completes_bounded(self):
        """A 10k-degree celebrity middle: with a cap the quadratic
        wedge set (~5e7 pairs) is never materialized anywhere — the
        run completes immediately and reports exactly what it skipped."""
        edges = [(99_999, i) for i in range(10_000)]
        edges += [(0, 1), (1, 2), (2, 0)]  # a cold triangle survives
        out, audit = graphalgo.link_pred_features(
            _edges_ds(edges), max_middle_degree=1000, return_audit=True,
        )
        got = self._got(out)
        assert got == self._ref(edges, cap=1000)
        assert audit["capped_middles"] == 1
        assert audit["capped_wedges"] == 10_000 * 9_999 // 2


def test_sssp_khop_hand_checked_and_join_parity(ray_session):
    """Bounded Bellman-Ford: a heavy direct edge must lose to a lighter
    two-hop path once max_hops allows it; the join-based relaxation
    (forced via frontier_limit=0) reproduces the broadcast path
    bit-for-bit, including on a random weighted multigraph."""
    # 0 -(10)-> 3 ; 0 -(1)-> 1 -(2)-> 3 ; 3 -(1)-> 4 ; parallel heavier
    # 0->1 edge that MIN must absorb; 9->9 self-loop never reached
    t = pa.table(
        {
            "src": pa.array([0, 0, 1, 3, 0, 9], type=pa.int64()),
            "dst": pa.array([3, 1, 3, 4, 1, 9], type=pa.int64()),
            "w": pa.array([10, 1, 2, 1, 5, 7], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    one = graphalgo.sssp_khop(ds, source=0, max_hops=1)
    got1 = dict(zip(one["node_id"].to_pylist(), one["dist"].to_pylist()))
    assert got1 == {0: 0, 1: 1, 3: 10}
    two = graphalgo.sssp_khop(ds, source=0, max_hops=2)
    got2 = dict(zip(two["node_id"].to_pylist(), two["dist"].to_pylist()))
    assert got2 == {0: 0, 1: 1, 3: 3, 4: 11}
    three = graphalgo.sssp_khop(ds, source=0, max_hops=3)
    got3 = dict(zip(three["node_id"].to_pylist(), three["dist"].to_pylist()))
    assert got3 == {0: 0, 1: 1, 3: 3, 4: 4}

    rng = np.random.RandomState(47)
    big = pa.table(
        {
            "src": pa.array(rng.randint(0, 60, 400), type=pa.int64()),
            "dst": pa.array(rng.randint(0, 80, 400), type=pa.int64()),
            "w": pa.array(rng.randint(1, 50, 400), type=pa.int64()),
        }
    )
    bds = rd.from_arrow(big).repartition(5)
    for hops in (1, 2, 4):
        base = graphalgo.sssp_khop(bds, source=3, max_hops=hops)
        joined = graphalgo.sssp_khop(
            bds, source=3, max_hops=hops, frontier_limit=0
        )
        assert base.equals(joined), hops

    # unreachable source still emits its dist-0 row on both paths
    for lim in (50_000_000, 0):
        lonely = graphalgo.sssp_khop(
            rd.from_arrow(t), source=77, max_hops=2, frontier_limit=lim
        )
        assert lonely["node_id"].to_pylist() == [77]
        assert lonely["dist"].to_pylist() == [0]

    # dists beyond 2^53 (float64's exact-integer ceiling) must stay
    # bit-exact on BOTH paths — the joined merge is int64 end to end
    w0, w1 = (1 << 52) + 1, (1 << 52) + 3
    huge = pa.table(
        {
            "src": pa.array([0, 1], type=pa.int64()),
            "dst": pa.array([1, 2], type=pa.int64()),
            "w": pa.array([w0, w1], type=pa.int64()),
        }
    )
    hds = rd.from_arrow(huge)
    for lim in (50_000_000, 0):
        got = graphalgo.sssp_khop(hds, source=0, max_hops=2, frontier_limit=lim)
        assert dict(
            zip(got["node_id"].to_pylist(), got["dist"].to_pylist())
        ) == {0: 0, 1: w0, 2: w0 + w1}, lim


def _closure_bruteforce(edges):
    """Reachability set via iterated relational composition on dicts."""
    closure = set(edges)
    while True:
        new = {(a, d) for a, b in closure for c, d in edges if b == c}
        grown = closure | new
        if grown == closure:
            return closure
        closure = grown


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=0, max_size=20, unique=True,
    )
)
def test_transitive_closure_both_methods_match_bruteforce(ray_session, edges):
    want = _closure_bruteforce(edges)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([str(a) for a, _ in edges], pa.string()),
                "dst": pa.array([str(b) for _, b in edges], pa.string()),
            }
        )
    ).repartition(2)
    configs = [
        {"method": "seminaive"},  # local numpy path (under broadcast_limit)
        {"method": "seminaive", "broadcast_limit": 0},
        {"method": "doubling", "broadcast_limit": 0},
    ]
    for cfg in configs:
        out = graphalgo.transitive_closure(ds, **cfg).take_all()
        got = {(int(r["src"]), int(r["dst"])) for r in out}
        assert got == want, cfg
        assert len(out) == len(want), cfg  # distinct pairs


def test_transitive_closure_cycle_and_chain(ray_session):
    # chain 0->1->2->3 plus cycle 4->5->4: cycle nodes reach themselves
    edges = [("0", "1"), ("1", "2"), ("2", "3"), ("4", "5"), ("5", "4")]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.string()),
                "dst": pa.array([b for _, b in edges], pa.string()),
            }
        )
    )
    want = {
        ("0", "1"), ("0", "2"), ("0", "3"), ("1", "2"), ("1", "3"),
        ("2", "3"), ("4", "5"), ("5", "4"), ("4", "4"), ("5", "5"),
    }
    for cfg in (
        {},
        {"broadcast_limit": 0},
        {"method": "doubling", "broadcast_limit": 0},
    ):
        got = {
            (r["src"], r["dst"])
            for r in graphalgo.transitive_closure(ds, **cfg).take_all()
        }
        assert got == want, cfg
    with pytest.raises(ValueError, match="unknown method"):
        graphalgo.transitive_closure(ds, method="magic")
    # cap overrun abandons the local path for the distributed plan
    got = {
        (r["src"], r["dst"])
        for r in graphalgo.transitive_closure(ds, local_pair_cap=3).take_all()
    }
    assert got == want


def _ref_node2vec(edge_list, walk_len, bw, cw, fw):
    """Pure-Python second-order reference: sorted distinct adjacency,
    hash-resolved cumulative-weight ladder."""
    from kgray.graphalgo import _STEP_MIX, _PREV_MIX
    from kgray.sampling import KNUTH, MOD32

    eset = set(edge_list)
    adj = {}
    for s, d in eset:
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds_) for s, ds_ in adj.items()}
    walks = []
    for start in sorted(adj):
        walks.append((start, 0, start))
        nbrs = adj[start]
        cur = nbrs[((start * KNUTH + 1 * _STEP_MIX) % MOD32) % len(nbrs)]
        prev = start
        walks.append((start, 1, cur))
        for step in range(2, walk_len + 1):
            if cur not in adj:
                break
            nbrs = adj[cur]
            wts = [
                bw if n == prev else (cw if (prev, n) in eset else fw)
                for n in nbrs
            ]
            r = (
                (prev * _PREV_MIX + cur * KNUTH + step * _STEP_MIX) % MOD32
            ) % sum(wts)
            acc = 0
            for n, w in zip(nbrs, wts):
                acc += w
                if acc > r:
                    nxt = n
                    break
            prev, cur = cur, nxt
            walks.append((start, step, cur))
    return sorted(walks)


def test_node2vec_walks_match_reference(ray_session):
    """Broadcast-CSR node2vec vs the pure-Python ladder on a random
    multigraph with dead ends and duplicate edges; the joined path
    (forced via adjacency_broadcast_limit=0) must match bit-for-bit."""
    rng = np.random.RandomState(23)
    n_edges = 500
    src = rng.randint(0, 40, n_edges)
    dst = rng.randint(0, 70, n_edges)  # ids 40..69 are dead ends
    src = np.concatenate([src, src[:150]])  # planted duplicates
    dst = np.concatenate([dst, dst[:150]])
    t = pa.table(
        {"src": pa.array(src, type=pa.int64()),
         "dst": pa.array(dst, type=pa.int64())}
    )
    ds = rd.from_arrow(t).repartition(6)
    edge_list = list(zip(src.tolist(), dst.tolist()))

    for bw, cw, fw in ((1, 4, 2), (3, 1, 1), (1, 1, 1)):
        want = _ref_node2vec(edge_list, 4, bw, cw, fw)
        got = sorted(
            (r["walk_id"], r["step"], r["node"])
            for r in graphalgo.node2vec_walks(
                ds, walk_len=4, back_w=bw, common_w=cw, far_w=fw
            ).take_all()
        )
        assert got == want, (bw, cw, fw)

    joined = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in graphalgo.node2vec_walks(
            ds, walk_len=4, back_w=1, common_w=4, far_w=2,
            adjacency_broadcast_limit=0,
        ).take_all()
    )
    assert joined == _ref_node2vec(edge_list, 4, 1, 4, 2)
    # the bias is real: a different weight profile changes the corpus
    assert _ref_node2vec(edge_list, 4, 1, 4, 2) != _ref_node2vec(
        edge_list, 4, 3, 1, 1
    )
    with pytest.raises(ValueError, match="back_w"):
        graphalgo.node2vec_walks(ds, back_w=0)


def test_degree_percentile_exact_rule(ray_session):
    """degree_percentile returns the smallest degree d with
    100 * #{v: deg(v) <= d} >= pct * n — the all-integer rule the
    link_pred_capped SQL mirror recomputes as a cumulative SUM over
    the degree histogram — and a median cap prunes a STRICT, NON-EMPTY
    middle subset on any non-regular graph (the scale-invariance the
    constant cap lacked)."""
    # a 100-cycle (degree 2) + hub 1000 wired to every fifth cycle
    # node (hub degree 20, those nodes degree 3): median degree is 2,
    # so the median cap keeps the 80 plain cycle middles and excludes
    # the hub and the degree-3 nodes
    edges = [(i, (i + 1) % 100) for i in range(100)]
    edges += [(1000, i) for i in range(0, 100, 5)]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n = len(deg)

    def expect(pct):
        cum = 0
        for d in sorted(set(deg.values())):
            cum += sum(1 for v in deg.values() if v == d)
            if 100 * cum >= pct * n:
                return d
        return max(deg.values())

    ds = _edges_ds(edges)
    for pct in (25, 50, 75, 100):
        assert graphalgo.degree_percentile(ds, pct=pct) == expect(pct)

    # the median cap excludes the hub but keeps the cycle middles:
    # capped output is non-empty AND a strict subset of the uncapped
    cap = graphalgo.degree_percentile(ds, pct=50)
    assert cap < 100
    full = graphalgo.link_pred_features(_edges_ds(edges))
    capped, audit = graphalgo.link_pred_features(
        _edges_ds(edges), max_middle_degree=cap, return_audit=True,
    )
    nf, nc = full.count(), capped.count()
    assert 0 < nc < nf
    assert audit["capped_middles"] >= 1


def test_many_hot_hubs_task_side_staging(ray_session):
    """r4 caveat #1 fix: hot-hub neighbor arrays are staged by TASKS
    into a holder actor — the driver sees only (hub, degree) rows, so
    many simultaneous hot hubs no longer transit driver memory. Parity
    must hold bit-for-bit with the cold (hash-join) path across
    several hubs with differing degrees, and the block arithmetic must
    match sum over hubs of T(ceil(deg/chunk)) upper-triangle tasks."""
    edges = []
    hub_degrees = [40, 33, 25, 21, 18, 17]
    base = 0
    for hi, d in enumerate(hub_degrees):
        hub = 10_000 + hi
        edges += [(hub, base + k) for k in range(d)]
        # chord the leaves so cold middles contribute too
        edges += [(base + k, base + (k + 1) % d) for k in range(0, d, 4)]
        base += d
    want = TestLinkPredFeatures._ref(edges)
    cold = graphalgo.link_pred_features(_edges_ds(edges))
    assert TestLinkPredFeatures._got(cold) == want
    hot, audit = graphalgo.link_pred_features(
        _edges_ds(edges), hot_middle_degree=16, hot_chunk=8,
        return_audit=True,
    )
    assert TestLinkPredFeatures._got(hot) == want
    assert audit["capped_middles"] == 0
    assert audit["hot_chunked_middles"] == len(hub_degrees)
    expect_tasks = 0
    for d in hub_degrees:
        b = -(-d // 8)
        expect_tasks += b * (b + 1) // 2
    assert audit["hot_chunk_tasks"] == expect_tasks
