"""Harmonic closeness centrality (stages/centrality.py) vs a driver-side
brute force on hand graphs, including hop bounding and disconnection."""

from __future__ import annotations

from collections import deque

import pyarrow as pa
import pytest

from quickner_ray.stages.centrality import CENT_SCALE, harmonic_centrality


def _ds(pairs, parts=3):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in pairs], type=pa.int64()),
                "dst": pa.array([d for _, d in pairs], type=pa.int64()),
            }
        )
    ).repartition(parts)


def _brute(pairs, seeds_k=4, max_hops=3):
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    seeds = sorted(adj)[:seeds_k]
    cent: dict[int, int] = {}
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_hops:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, d in dist.items():
            cent[v] = cent.get(v, 0) + (CENT_SCALE // d if d > 0 else 0)
    return sorted(cent.items())


CASES = {
    "path": [(i, i + 1) for i in range(8)],
    "star_plus_tail": [(0, i) for i in range(1, 6)] + [(5, 6), (6, 7)],
    "two_islands": [(0, 1), (1, 2), (10, 11)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_brute_force(ray_session, name):
    pairs = CASES[name]
    out = harmonic_centrality(_ds(pairs)).take_all()
    got = sorted((r["node"], r["centrality"]) for r in out)
    assert got == _brute(pairs)


def test_seed_collect_is_k_bounded(ray_session, monkeypatch):
    """The seed-panel driver collect must be <= seeds_k rows per input block
    (per-batch unique-min-k combiner), never the distinct node universe."""
    import ray.data

    pairs = [(i, i + 1) for i in range(200)]  # 201 distinct nodes
    parts = 4
    seeds_k = 3
    collected: list[int] = []
    orig = ray.data.Dataset.take_all

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(ray.data.Dataset, "take_all", spy)
    out = harmonic_centrality(_ds(pairs, parts=parts), seeds_k=seeds_k).take_all()
    # first spied take_all is the seed-partial collect; the union of the two
    # endpoint projections yields <= 2*parts blocks of <= seeds_k rows each
    assert collected, "seed collect not observed"
    assert collected[0] <= seeds_k * 2 * parts, collected
    got = sorted((r["node"], r["centrality"]) for r in out)
    assert got == _brute(pairs, seeds_k=seeds_k)
