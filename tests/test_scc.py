"""Strongly connected components (stages/scc.py): the distributed FW-BW
coloring path (driver_cap=0) must equal the driver Tarjan path on graphs
with known SCC structure, at any partitioning."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quickner_ray.stages.scc import strongly_connected_components, _tarjan


def _edges_ds(pairs, parts=3):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in pairs], type=pa.int64()),
                "dst": pa.array([d for _, d in pairs], type=pa.int64()),
            }
        )
    ).repartition(parts)


def _expected(pairs, node_ids=()):
    return sorted(_tarjan([{"src": s, "dst": d} for s, d in pairs], node_ids).items())


CASES = {
    # two 3-cycles joined by a one-way bridge (stay separate SCCs)
    "two_cycles_bridge": [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
    # pure chain: every node its own SCC
    "chain": [(i, i + 1) for i in range(8)],
    # big cycle + tail + back-edge making a nested core
    "nested": [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 4), (5, 6)],
    # self loops and parallel edges
    "selfloop": [(7, 7), (7, 8), (8, 9), (9, 8), (7, 8)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_distributed_scc_matches_tarjan(ray_session, name):
    pairs = CASES[name]
    out = strongly_connected_components(
        _edges_ds(pairs), driver_cap=0, num_partitions=4
    )
    got = sorted((r["node"], r["scc"]) for r in out.take_all())
    assert got == _expected(pairs)


def test_scc_partitioning_invariant(ray_session):
    pairs = CASES["two_cycles_bridge"]
    a = strongly_connected_components(_edges_ds(pairs, parts=1), driver_cap=0)
    b = strongly_connected_components(_edges_ds(pairs, parts=7), driver_cap=0)
    assert sorted(map(tuple, (r.values() for r in a.take_all()))) == sorted(
        map(tuple, (r.values() for r in b.take_all()))
    )


def test_scc_isolated_nodes_universe(ray_session):
    import ray.data as rd

    pairs = [(1, 2), (2, 1)]
    nodes = rd.from_arrow(
        pa.table({"node": pa.array([1, 2, 3, 4], type=pa.int64())})
    )
    out = strongly_connected_components(
        _edges_ds(pairs), nodes=nodes, driver_cap=10**9
    )
    got = sorted((r["node"], r["scc"]) for r in out.take_all())
    assert got == [(1, 1), (2, 1), (3, 3), (4, 4)]


def test_scc_sparse_edges_huge_node_universe_goes_distributed(ray_session):
    """Edge count under the cap but node universe over it: the Tarjan gate
    must NOT take_all the universe — the distributed FW-BW path runs and
    isolated nodes come back as streamed singletons (VERDICT r3)."""
    import ray.data as rd

    pairs = [(1, 2), (2, 1), (3, 4)]
    universe = list(range(1, 41))
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(universe, type=pa.int64())})
    ).repartition(4)
    out = strongly_connected_components(
        _edges_ds(pairs), nodes=nodes, driver_cap=10, num_partitions=4
    )
    got = sorted((r["node"], r["scc"]) for r in out.take_all())
    want = [(1, 1), (2, 1)] + [(n, n) for n in universe if n not in (1, 2)]
    assert got == sorted(want)
