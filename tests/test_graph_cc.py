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


def _run(edges: list[tuple[int, int]], n_nodes: int) -> dict[int, int]:
    edge_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    node_ds = rd.from_items([{"node": v} for v in range(n_nodes)])
    out = connected_components(edge_ds, nodes=node_ds).take_all()
    assert len(out) == n_nodes
    return {r["node"]: r["component"] for r in out}


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_path_triangle_singleton(self):
        # path 0-1-2-3, triangle 4-5-6, singleton 7
        edges = [(1, 0), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)]
        got = _run(edges, 8)
        assert got == _uf_components(8, edges)
        assert got[3] == 0 and got[6] == 4 and got[7] == 7

    def test_long_chain_converges(self):
        # a 40-node chain needs pointer jumping to finish in few rounds
        edges = [(i, i + 1) for i in range(39)]
        assert _run(edges, 40) == {v: 0 for v in range(40)}

    def test_no_edges(self):
        assert _run([], 5) == {v: v for v in range(5)}

    def test_random_graphs_match_union_find(self):
        rng = random.Random(7)
        for trial in range(3):
            n = 30 + 10 * trial
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            assert _run(edges, n) == _uf_components(n, edges)

    def test_endpoints_only_without_node_universe(self):
        edge_ds = rd.from_items([{"src": 3, "dst": 9}])
        out = connected_components(edge_ds).take_all()
        assert {r["node"]: r["component"] for r in out} == {3: 3, 9: 3}
