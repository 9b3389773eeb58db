"""Connected components: distributed min-label propagation vs a
union-find reference on structured and random graphs."""

from __future__ import annotations

import random

import pytest
import ray.data as rd

from quickner_ray.stages.graph_cc import connected_components


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component
    root_min: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        root_min[r] = min(root_min.get(r, v), v)
    return {v: root_min[find(v)] for v in range(n_nodes)}


def _run(
    edges: list[tuple[int, int]], n_nodes: int, driver_cap: int
) -> dict[int, int]:
    edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    node_ds = rd.from_items([{"node": v} for v in range(n_nodes)])
    out = connected_components(
        edge_ds, nodes=node_ds, driver_cap=driver_cap
    ).take_all()
    assert len(out) == n_nodes
    return {r["node"]: r["component"] for r in out}


# driver_cap=0 forces the distributed label-propagation path; the default
# exercises the size-gated driver-side union-find + broadcast relabel path
@pytest.mark.parametrize("cap", [0, 200_000], ids=["distributed", "broadcast"])
@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_path_triangle_singleton(self, cap):
        # path 0-1-2-3, triangle 4-5-6, singleton 7
        edges = [(1, 0), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)]
        got = _run(edges, 8, cap)
        assert got == _uf_components(8, edges)
        assert got[3] == 0 and got[6] == 4 and got[7] == 7

    def test_long_chain_converges(self, cap):
        # a 40-node chain needs pointer jumping to finish in few rounds
        edges = [(i, i + 1) for i in range(39)]
        assert _run(edges, 40, cap) == {v: 0 for v in range(40)}

    def test_no_edges(self, cap):
        assert _run([], 5, cap) == {v: v for v in range(5)}

    def test_random_graphs_match_union_find(self, cap):
        rng = random.Random(7)
        for trial in range(2):
            n = 30 + 10 * trial
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            assert _run(edges, n, cap) == _uf_components(n, edges)

    def test_endpoints_only_without_node_universe(self, cap):
        edge_ds = rd.from_items([{"src": 3, "dst": 9}])
        out = connected_components(edge_ds, driver_cap=cap).take_all()
        assert {r["node"]: r["component"] for r in out} == {3: 3, 9: 3}


@pytest.mark.usefixtures("ray_session")
class TestCooccurrence:
    @staticmethod
    def _mentions(rows):
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "surface_norm": [r[1] for r in rows],
                    "label": [r[2] for r in rows],
                }
            )
        )

    def test_counts_distinct_pairs_per_doc(self):
        from itertools import combinations

        from quickner_ray.stages.canonicalize import entity_id
        from quickner_ray.stages.graph_cc import cooccurrence_pairs

        # d1 mentions a,b (b twice: still ONE co-occurrence); d2 mentions a,b,c
        rows = [
            ("d1", "apple", "ORG"),
            ("d1", "bolt", "PART"),
            ("d1", "bolt", "PART"),
            ("d2", "apple", "ORG"),
            ("d2", "bolt", "PART"),
            ("d2", "coil", "PART"),
        ]
        got = {
            (r["entity_a"], r["entity_b"]): r["n_docs"]
            for r in cooccurrence_pairs(self._mentions(rows)).take_all()
        }
        ea = entity_id("apple", "ORG")
        eb = entity_id("bolt", "PART")
        ec = entity_id("coil", "PART")
        want = {}
        for doc_ents in (
            [ea, eb],
            [ea, eb, ec],
        ):
            for x, y in combinations(sorted(doc_ents), 2):
                want[(x, y)] = want.get((x, y), 0) + 1
        assert got == want

    def test_cap_bounds_quadratic_blowup(self):
        from quickner_ray.stages.graph_cc import cooccurrence_pairs

        rows = [("d1", f"e{i:03d}", "L") for i in range(10)]
        out = cooccurrence_pairs(self._mentions(rows), cap=4).take_all()
        # 4 lowest eids -> C(4,2)=6 pairs, not C(10,2)=45
        assert len(out) == 6

    def test_single_entity_docs_emit_nothing(self):
        from quickner_ray.stages.graph_cc import cooccurrence_pairs

        rows = [("d1", "apple", "ORG"), ("d2", "bolt", "PART")]
        assert cooccurrence_pairs(self._mentions(rows)).take_all() == []


def _ref_pagerank(
    nodes: list, edges: list[tuple], n_iters: int = 3
) -> dict:
    """Driver-side integer-PageRank reference: same ops as the distributed
    implementation (floor-division contributions, (85*x)//100 damping)."""
    from quickner_ray.stages.graph_cc import PR_SCALE

    und: list[tuple] = []
    for a, b in edges:
        und.append((a, b))
        und.append((b, a))
    deg: dict = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    score = {n: PR_SCALE for n in nodes}
    base = (15 * PR_SCALE) // 100
    for _ in range(n_iters):
        inc = {n: 0 for n in nodes}
        for s, d in und:
            inc[d] += score[s] // deg[s]
        score = {n: base + (85 * inc[n]) // 100 for n in nodes}
    return score


@pytest.mark.parametrize("cap", [0, None], ids=["distributed", "broadcast"])
@pytest.mark.usefixtures("ray_session")
class TestPagerank:
    def test_matches_reference_int_nodes(self, cap):
        from quickner_ray.stages.graph_cc import pagerank

        # path 0-1-2, triangle 3-4-5, hub 6 to {0,3}, singleton 7
        edges = [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3), (6, 0), (6, 3)]
        nodes = list(range(8))
        pr = pagerank(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            nodes=rd.from_items([{"node": v} for v in nodes]),
            driver_cap=cap,
        ).take_all()
        got = {r["node"]: r["pr_score"] for r in pr}
        assert got == _ref_pagerank(nodes, edges)
        # a singleton stays at the damping base
        from quickner_ray.stages.graph_cc import PR_SCALE

        assert got[7] == (15 * PR_SCALE) // 100

    def test_matches_reference_string_nodes(self, cap):
        import pyarrow as pa

        from quickner_ray.stages.graph_cc import pagerank

        edges = [("aa", "bb"), ("bb", "cc"), ("cc", "aa"), ("dd", "aa")]
        nodes = ["aa", "bb", "cc", "dd", "ee"]
        pr = pagerank(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            nodes=rd.from_items([{"node": v} for v in nodes]),
            node_type=pa.string(),
            n_iters=4,
            driver_cap=cap,
        ).take_all()
        got = {r["node"]: r["pr_score"] for r in pr}
        assert got == _ref_pagerank(nodes, edges, n_iters=4)

    def test_mass_conservation_on_regular_graph(self, cap):
        # on a cycle every node keeps exactly PR_SCALE (deg 2, symmetric)
        from quickner_ray.stages.graph_cc import PR_SCALE, pagerank

        n = 6
        edges = [(i, (i + 1) % n) for i in range(n)]
        pr = pagerank(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            nodes=rd.from_items([{"node": v} for v in range(n)]),
            driver_cap=cap,
        ).take_all()
        assert {r["pr_score"] for r in pr} == {PR_SCALE}


def _ref_triangles(nodes: list, edges: list[tuple]) -> dict:
    """Brute-force per-node triangle counts + degree (no caps)."""
    from itertools import combinations

    es = {tuple(sorted(e)) for e in edges}
    deg: dict = {n: 0 for n in nodes}
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for v in (a, b, c):
                tri[v] += 1
    return {n: (deg[n], tri[n]) for n in nodes}


@pytest.mark.parametrize("dcap", [0, None], ids=["distributed", "broadcast"])
@pytest.mark.usefixtures("ray_session")
class TestTriangles:
    @staticmethod
    def _run(edges, nodes, dcap, **kw):
        from quickner_ray.stages.graph_cc import triangle_counts

        out = triangle_counts(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            nodes=rd.from_items([{"node": v} for v in nodes]),
            driver_cap=dcap,
            **kw,
        ).take_all()
        return {r["node"]: (r["degree"], r["n_triangles"]) for r in out}

    def test_matches_brute_force(self, dcap):
        # K4 on 0-3 (4 triangles, 3 per node), pendant 4, singleton 5
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
        nodes = list(range(6))
        assert self._run(edges, nodes, dcap) == _ref_triangles(nodes, edges)

    def test_random_graph(self, dcap):
        import random

        rng = random.Random(11)
        n = 25
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(60)
            }
        )
        edges = [e for e in edges if e[0] != e[1]]
        nodes = list(range(n))
        assert self._run(edges, nodes, dcap) == _ref_triangles(nodes, edges)

    def test_wedge_cap_bounds_apex(self, dcap):
        # star apex 0 with 6 leaves, all leaf pairs connected (wheel-ish):
        # cap=3 keeps only the 3 lowest leaves' wedges at apex 0
        leaves = list(range(1, 7))
        edges = [(0, v) for v in leaves]
        edges += [(a, b) for i, a in enumerate(leaves) for b in leaves[i + 1:]]
        got = self._run(edges, list(range(7)), dcap, wedge_cap=3)
        # apex 0: C(3,2)=3 closed wedges instead of C(6,2)=15
        assert got[0][1] == 3

    def test_string_nodes(self, dcap):
        import pyarrow as pa

        edges = [("aa", "bb"), ("aa", "cc"), ("bb", "cc"), ("bb", "dd")]
        nodes = ["aa", "bb", "cc", "dd", "ee"]
        got = self._run(edges, nodes, dcap, node_type=pa.string())
        assert got == _ref_triangles(nodes, edges)


def _ref_kcore(edges: list[tuple], k: int, rounds: int = 8) -> dict:
    """Brute-force R-round peel: {surviving node: final within-core degree}."""
    und = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    alive = {n for e in und for n in e}
    for _ in range(rounds):
        deg: dict = {}
        for s, d in und:
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        new_alive = {n for n, dg in deg.items() if dg >= k}
        if new_alive == alive:
            break
        alive = new_alive
    deg = {}
    for s, d in und:
        if s in alive and d in alive:
            deg[s] = deg.get(s, 0) + 1
    return deg


@pytest.mark.parametrize("dcap", [0, None], ids=["distributed", "broadcast"])
@pytest.mark.usefixtures("ray_session")
class TestKCore:
    @staticmethod
    def _run(edges, k, dcap, **kw):
        from quickner_ray.stages.graph_cc import kcore

        out = kcore(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            k=k,
            driver_cap=dcap,
            **kw,
        ).take_all()
        return {r["node"]: r["core_deg"] for r in out}

    def test_pendant_chain_peels_off(self, dcap):
        # triangle 0-1-2 with a pendant chain 2-3-4: 2-core = the triangle
        edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
        got = self._run(edges, 2, dcap)
        assert got == {0: 2, 1: 2, 2: 2}
        assert got == _ref_kcore(edges, 2)

    def test_no_core(self, dcap):
        # a tree has no 2-core
        edges = [(0, 1), (1, 2), (2, 3)]
        assert self._run(edges, 2, dcap) == {}

    def test_random_matches_reference(self, dcap):
        import random

        rng = random.Random(13)
        n = 24
        edges = sorted(
            {tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(50)}
        )
        edges = [e for e in edges if e[0] != e[1]]
        for k in (2, 3):
            assert self._run(edges, k, dcap) == _ref_kcore(edges, k)

    def test_string_nodes(self, dcap):
        import pyarrow as pa

        edges = [("aa", "bb"), ("bb", "cc"), ("aa", "cc"), ("cc", "dd")]
        got = self._run(edges, 2, dcap, node_type=pa.string())
        assert got == _ref_kcore(edges, 2)


@pytest.mark.usefixtures("ray_session")
class TestNeighborhoodJaccard:
    def _run(self, edges, nodes=None, **kw):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.graph_cc import neighborhood_jaccard

        tbl = pa.table(
            {
                "src": pa.array([a for a, _ in edges], type=pa.int64()),
                "dst": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
        out = neighborhood_jaccard(rd.from_arrow(tbl), **kw)
        got = out.to_pandas()
        return {
            (r.entity_a, r.entity_b): (r.n_common, r.n_union)
            for r in got.itertuples()
        }

    def test_matches_brute_force(self):
        import itertools
        import numpy as np

        rng = np.random.RandomState(3)
        nodes = list(range(12))
        edges = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.choice(nodes, 2, replace=False)) for _ in range(40)
                )
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expect = {}
        for x, y in itertools.combinations(sorted(adj), 2):
            inter = len(adj[x] & adj[y])
            if inter >= 2:
                expect[(x, y)] = (inter, len(adj[x] | adj[y]))
        got = self._run(edges, min_common=2)
        assert got == expect

    def test_nb_cap_limits_neighbors(self):
        # star: hub 0 with neighbors 1..6; with nb_cap=3 only {1,2,3}
        # pair through the hub, and capped degree of 0 is 3
        edges = [(0, i) for i in range(1, 7)]
        got = self._run(edges, min_common=1, nb_cap=3)
        # leaf pairs share exactly the hub; leaves have degree 1 each
        assert got[(1, 2)] == (1, 1)
        assert (1, 4) not in got


@pytest.mark.usefixtures("ray_session")
class TestResourceAllocation:
    def _run(self, edges, **kw):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.graph_cc import resource_allocation

        tbl = pa.table(
            {
                "src": pa.array([a for a, _ in edges], type=pa.int64()),
                "dst": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
        out = resource_allocation(rd.from_arrow(tbl), **kw)
        got = out.to_pandas()
        return {
            (r.entity_a, r.entity_b): (r.n_common, r.ra_score)
            for r in got.itertuples()
        }

    def test_matches_brute_force(self):
        import itertools
        import numpy as np

        from quickner_ray.stages.graph_cc import RA_SCALE

        rng = np.random.RandomState(7)
        nodes = list(range(12))
        edges = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.choice(nodes, 2, replace=False)) for _ in range(40)
                )
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expect = {}
        for x, y in itertools.combinations(sorted(adj), 2):
            common = adj[x] & adj[y]
            if len(common) >= 2:
                expect[(x, y)] = (
                    len(common),
                    sum(RA_SCALE // len(adj[z]) for z in common),
                )
        got = self._run(edges, min_common=2)
        assert got == expect and got

    def test_nb_cap_weights_by_capped_degree(self):
        from quickner_ray.stages.graph_cc import RA_SCALE

        # hub 0 with leaves 1..6; nb_cap=3 keeps {1,2,3} at the hub apex,
        # so capped deg(0) = 3 and only those leaves pair through it
        edges = [(0, i) for i in range(1, 7)]
        got = self._run(edges, min_common=1, nb_cap=3)
        assert got[(1, 2)] == (1, RA_SCALE // 3)
        assert (1, 4) not in got


@pytest.mark.usefixtures("ray_session")
class TestAnnotatedFusion:
    """The annotated=True fused explode must produce identical results to
    the raw-mentions path (which is only safe when the caller owns the
    block layout)."""

    def test_cooccurrence_parity(self):
        from quickner_ray.pipelines.queries import (
            _explode_ann,
            annotated_documents,
        )
        from quickner_ray.stages.graph_cc import cooccurrence_pairs

        ann = annotated_documents("/root/testdata/sf0.001").materialize()
        fused = {
            (r["entity_a"], r["entity_b"]): r["n_docs"]
            for r in cooccurrence_pairs(ann, annotated=True).take_all()
        }
        raw = {
            (r["entity_a"], r["entity_b"]): r["n_docs"]
            for r in cooccurrence_pairs(_explode_ann(ann)).take_all()
        }
        assert fused == raw and fused

    def test_relation_candidates_parity(self):
        from quickner_ray.pipelines.queries import (
            _explode_ann,
            annotated_documents,
        )
        from quickner_ray.stages.relations import relation_candidates

        ann = annotated_documents("/root/testdata/sf0.001").materialize()
        key = lambda r: (r["doc_id"], r["subj"], r["obj"], r["gap"])
        fused = sorted(
            key(r) for r in relation_candidates(ann, annotated=True).take_all()
        )
        raw = sorted(
            key(r) for r in relation_candidates(_explode_ann(ann)).take_all()
        )
        assert fused == raw and fused


def _ref_bfs(edges: list[tuple], seeds: list, k: int) -> dict:
    """Brute-force BFS: {node: min hop distance <= k} from the seed set."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for lvl in range(1, k + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = lvl
                    nxt.add(m)
        if not nxt:
            break
        frontier = nxt
    return dist


@pytest.mark.parametrize("dcap", [0, None], ids=["distributed", "broadcast"])
@pytest.mark.usefixtures("ray_session")
class TestBfsDistances:
    @staticmethod
    def _run(edges, k, dcap, seeds=None, **kw):
        from quickner_ray.stages.graph_cc import bfs_distances

        seeds_ds = (
            rd.from_items([{"node": s} for s in seeds]) if seeds is not None else None
        )
        out = bfs_distances(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            k=k,
            seeds=seeds_ds,
            driver_cap=dcap,
            **kw,
        ).take_all()
        got = {r["node"]: r["dist"] for r in out}
        assert len(got) == len(out), "duplicate nodes in BFS output"
        return got

    def test_path_graph_multi_round(self, dcap):
        # path 0-1-2-3-4-5: distances from min node 0 are the indices,
        # truncated at k
        edges = [(i, i + 1) for i in range(5)]
        assert self._run(edges, 3, dcap) == {0: 0, 1: 1, 2: 2, 3: 3}
        assert self._run(edges, 10, dcap) == {i: i for i in range(6)}

    def test_disconnected_component_unreached(self, dcap):
        edges = [(0, 1), (1, 2), (10, 11)]
        assert self._run(edges, 4, dcap) == {0: 0, 1: 1, 2: 2}

    def test_explicit_seed_set(self, dcap):
        # two seeds meet in the middle of a path
        edges = [(i, i + 1) for i in range(6)]
        got = self._run(edges, 6, dcap, seeds=[0, 6])
        assert got == _ref_bfs(edges, [0, 6], 6)
        assert got[3] == 3 and got[0] == 0 and got[6] == 0

    def test_seed_outside_graph(self, dcap):
        # a seed with no edges still appears at dist 0, expands nothing
        edges = [(0, 1)]
        got = self._run(edges, 2, dcap, seeds=[99])
        assert got == {99: 0}

    def test_random_matches_reference(self, dcap):
        rng = random.Random(17)
        n = 30
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(45)
                )
                if a != b
            }
        )
        seed = min(m for e in edges for m in e)
        for k in (1, 2, 4):
            assert self._run(edges, k, dcap) == _ref_bfs(edges, [seed], k)

    def test_string_nodes(self, dcap):
        import pyarrow as pa

        from quickner_ray.stages.graph_cc import bfs_distances

        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        out = bfs_distances(
            rd.from_items([{"src": a, "dst": b} for a, b in edges]),
            k=2,
            node_type=pa.string(),
            driver_cap=dcap,
        ).take_all()
        assert {r["node"]: r["dist"] for r in out} == {"a": 0, "b": 1, "c": 2}


class TestRandomWalks:
    """Deterministic hash-seeded walks: distributed path == driver path ==
    brute-force reference, dead ends stop early, steps advance by h64-argmin."""

    def _brute(self, edges, universe, walk_len):
        from quickner_ray.stages.dedup_approx import h64

        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        rows = set()
        for start in universe:
            cur = start
            rows.add((start, 0, cur))
            for lvl in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs, key=lambda v, c=cur, s=lvl: (h64(f"{c}|{s}|{v}"), v))
                rows.add((start, lvl, cur))
        return rows

    @pytest.mark.parametrize("cap", [0, 200_000], ids=["distributed", "broadcast"])
    @pytest.mark.usefixtures("ray_session")
    def test_matches_brute(self, cap):
        rng = random.Random(7)
        n = 30
        edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(60)})
        edges = [(a, b) for a, b in edges if a != b]
        edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
        node_ds = rd.from_items([{"node": v} for v in range(n)])

        from quickner_ray.stages.graph_cc import random_walks

        out = random_walks(
            edge_ds, nodes=node_ds, walk_len=3, driver_cap=cap
        ).take_all()
        got = {(r["start"], r["step"], r["node"]) for r in out}
        assert got == self._brute(edges, range(n), 3)
        # isolated nodes appear exactly once, at step 0
        deg = set()
        for a, b in edges:
            deg.add(a)
            deg.add(b)
        iso = set(range(n)) - deg
        for v in iso:
            assert (v, 0, v) in got
            assert not any(s == v and st > 0 for s, st, _ in got)


class TestLabelPropagation:
    """Synchronous LPA: distributed path == driver path == brute reference;
    two cliques joined by one bridge edge resolve to two communities."""

    def _brute(self, edges, universe, n_rounds):
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        lab = {v: v for v in universe}
        for v in adj:
            lab.setdefault(v, v)
        for _ in range(n_rounds):
            new = dict(lab)
            for v, nbrs in adj.items():
                counts: dict = {}
                for u in nbrs:
                    counts[lab[u]] = counts.get(lab[u], 0) + 1
                new[v] = min(counts, key=lambda x: (-counts[x], x))
            lab = new
        return {v: lab[v] for v in universe}

    @pytest.mark.parametrize("cap", [0, 200_000], ids=["distributed", "broadcast"])
    @pytest.mark.usefixtures("ray_session")
    def test_matches_brute_random(self, cap):
        from quickner_ray.stages.graph_cc import label_propagation

        rng = random.Random(11)
        n = 24
        edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(50)})
        edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
        node_ds = rd.from_items([{"node": v} for v in range(n)])
        out = label_propagation(
            edge_ds, nodes=node_ds, n_rounds=3, driver_cap=cap
        ).take_all()
        got = {r["node"]: r["community"] for r in out}
        assert got == self._brute(edges, range(n), 3)

    @pytest.mark.usefixtures("ray_session")
    def test_two_cliques_one_bridge(self):
        from quickner_ray.stages.graph_cc import label_propagation

        k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        edges = k1 + k2 + [(3, 10)]
        edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
        node_ds = rd.from_items([{"node": v} for v in list(range(4)) + list(range(10, 14))])
        out = label_propagation(edge_ds, nodes=node_ds, n_rounds=4).take_all()
        got = {r["node"]: r["community"] for r in out}
        # one label per clique (min-id wins inside a clique), despite the
        # bridge — the frequency vote keeps the cliques apart where
        # connected_components would merge them
        assert len({got[v] for v in range(4)}) == 1
        assert len({got[v] for v in range(10, 14)}) == 1
        assert got[0] != got[12]


class TestFastRP:
    @pytest.mark.usefixtures("ray_session")
    def test_matches_brute(self):
        from quickner_ray.stages.dedup_approx import h64
        from quickner_ray.stages.graph_cc import fastrp_embeddings

        rng = random.Random(3)
        n = 20
        edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(40)})
        edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
        out = fastrp_embeddings(edge_ds).take_all()

        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)

        def r(u, k):
            return int(h64(f"{u}|{k}") % 3) - 1

        h1 = {v: [sum(r(u, k) for u in ns) for k in range(4)] for v, ns in adj.items()}
        h2 = {v: [sum(h1[u][k] for u in ns) for k in range(4)] for v, ns in adj.items()}
        got = {
            row["node"]: (
                [row[f"h1_{k}"] for k in range(4)],
                [row[f"h2_{k}"] for k in range(4)],
            )
            for row in out
        }
        assert got == {v: (h1[v], h2[v]) for v in adj}
        # structural property: twins (same neighborhood) share embeddings


class TestWeightedPagerank:
    """Directed weighted PageRank: driver path == distributed path ==
    hand-computed fixed point; weights steer the mass."""

    def _brute(self, edges, universe, n_iters):
        PR = 10**12
        base = (15 * PR) // 100
        sw = {}
        for s, d, w in edges:
            sw[s] = sw.get(s, 0) + w
        sc = {v: PR for v in universe}
        for _ in range(n_iters):
            inc = {v: 0 for v in universe}
            for s, d, w in edges:
                inc[d] += (sc[s] * w) // sw[s]
            sc = {v: base + (85 * inc[v]) // 100 for v in universe}
        return sc

    @pytest.mark.parametrize("cap", [0, 200_000], ids=["distributed", "broadcast"])
    @pytest.mark.usefixtures("ray_session")
    def test_matches_brute(self, cap):
        from quickner_ray.stages.graph_cc import weighted_pagerank

        rng = random.Random(31)
        n = 12
        edges = []
        seen = set()
        for _ in range(30):
            s, d = rng.sample(range(n), 2)
            if (s, d) not in seen:
                seen.add((s, d))
                edges.append((s, d, rng.randint(1, 9)))
        edge_ds = rd.from_items([{"src": s, "dst": d, "w": w} for s, d, w in edges])
        node_ds = rd.from_items([{"node": v} for v in range(n)])
        out = weighted_pagerank(
            edge_ds, nodes=node_ds, n_iters=3, driver_cap=cap
        ).take_all()
        got = {r["node"]: r["pr_score"] for r in out}
        assert got == self._brute(edges, range(n), 3)
        # a heavier edge into a node must beat a lighter one from the
        # same source: two-node probe
        e2 = rd.from_items(
            [{"src": 0, "dst": 1, "w": 9}, {"src": 0, "dst": 2, "w": 1}]
        )
        n2 = rd.from_items([{"node": v} for v in range(3)])
        sc = {r["node"]: r["pr_score"]
              for r in weighted_pagerank(e2, nodes=n2, n_iters=2).take_all()}
        assert sc[1] > sc[2]


class TestHits:
    """Integer HITS: driver path == distributed path == hand fixed point;
    hubs and authorities separate on a directed star."""

    def _brute(self, edges, universe, n_iters):
        SC = 10**9
        h = {v: SC for v in universe}
        a = {v: 0 for v in universe}
        for _ in range(n_iters):
            araw = {v: 0 for v in universe}
            for s, d, w in edges:
                araw[d] += h[s] * w
            amax = max(araw.values()) if universe else 0
            a = {v: araw[v] // (amax // SC + 1) for v in universe}
            hraw = {v: 0 for v in universe}
            for s, d, w in edges:
                hraw[s] += a[d] * w
            hmax = max(hraw.values()) if universe else 0
            h = {v: hraw[v] // (hmax // SC + 1) for v in universe}
        return h, a

    @pytest.mark.parametrize("cap", [0, 200_000], ids=["distributed", "broadcast"])
    @pytest.mark.usefixtures("ray_session")
    def test_matches_brute(self, cap):
        from quickner_ray.stages.graph_cc import hits_scores

        rng = random.Random(17)
        n = 10
        edges = []
        seen = set()
        for _ in range(26):
            s, d = rng.sample(range(n), 2)
            if (s, d) not in seen:
                seen.add((s, d))
                edges.append((s, d, rng.randint(1, 9)))
        edge_ds = rd.from_items([{"src": s, "dst": d, "w": w} for s, d, w in edges])
        node_ds = rd.from_items([{"node": v} for v in range(n)])
        out = hits_scores(
            edge_ds, nodes=node_ds, n_iters=2, driver_cap=cap
        ).take_all()
        bh, ba = self._brute(edges, range(n), 2)
        assert {r["node"]: r["hub_score"] for r in out} == bh
        assert {r["node"]: r["auth_score"] for r in out} == ba

    @pytest.mark.usefixtures("ray_session")
    def test_hub_authority_separation(self):
        # star: 0 points at 1,2,3 -> 0 is the pure hub, 1-3 pure authorities
        from quickner_ray.stages.graph_cc import hits_scores

        e = rd.from_items(
            [{"src": 0, "dst": d, "w": 1} for d in (1, 2, 3)]
        )
        nds = rd.from_items([{"node": v} for v in range(4)])
        sc = {r["node"]: (r["hub_score"], r["auth_score"])
              for r in hits_scores(e, nodes=nds, n_iters=2).take_all()}
        assert sc[0][0] > 0 and sc[0][1] == 0
        for v in (1, 2, 3):
            assert sc[v][0] == 0 and sc[v][1] > 0


@pytest.mark.usefixtures("ray_session")
class TestSameasClosure:
    def test_multi_key_chain_merges_transitively(self):
        import pyarrow as pa

        from quickner_ray.pipelines.queries import sameas_components

        # chain: "u.s." -k1- "u s" -k2- "u s navy"; "table" isolated
        surfaces = ["u.s.", "u s", "u s navy", "table"]
        ds = rd.from_arrow(
            pa.table({"surface_norm": pa.array(surfaces, pa.string())})
        )
        got = {
            r["surface_norm"]: r["sameas_component"]
            for r in sameas_components(ds).take_all()
        }
        assert got["u.s."] == got["u s"] == got["u s navy"]
        assert got["table"] != got["u.s."]
        assert set(got) == set(surfaces)
