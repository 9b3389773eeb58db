"""2-D skyline: dominance semantics pinned against brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.skyline import skyline_2d, skyline_mask_2d


def _brute(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (bx >= x and by >= y and (bx > x or by > y)) for bx, by in points
        )
        if not dominated:
            out.append(i)
    return set(out)


class TestSkylineMask:
    def _check(self, points):
        x = np.array([p[0] for p in points], dtype=np.int64)
        y = np.array([p[1] for p in points], dtype=np.int64)
        got = set(np.flatnonzero(skyline_mask_2d(x, y)))
        assert got == _brute(points)

    def test_simple_frontier(self):
        self._check([(1, 5), (2, 4), (3, 3), (2, 2), (0, 6)])

    def test_duplicate_frontier_points_all_survive(self):
        pts = [(5, 5), (5, 5), (1, 9)]
        x = np.array([p[0] for p in pts], dtype=np.int64)
        y = np.array([p[1] for p in pts], dtype=np.int64)
        assert list(skyline_mask_2d(x, y)) == [True, True, True]

    def test_same_x_lower_y_dominated(self):
        self._check([(5, 5), (5, 4), (5, 5)])

    def test_random_brute_force(self):
        rng = np.random.RandomState(3)
        pts = [(int(a), int(b)) for a, b in rng.randint(0, 30, size=(300, 2))]
        self._check(pts)

    def test_empty(self):
        assert len(skyline_mask_2d(np.array([], dtype=np.int64), np.array([], dtype=np.int64))) == 0


@pytest.mark.usefixtures("ray_session")
class TestSkylineDistributed:
    def test_parallelism_invariant(self):
        rng = np.random.RandomState(11)
        x = rng.randint(0, 50, 500).astype(np.int64)
        y = rng.randint(0, 50, 500).astype(np.int64)
        t = pa.table({"rid": pa.array(np.arange(500)), "x": pa.array(x), "y": pa.array(y)})
        expect = {
            (int(i), int(a), int(b))
            for i, a, b in zip(
                np.arange(500)[skyline_mask_2d(x, y)], x[skyline_mask_2d(x, y)], y[skyline_mask_2d(x, y)]
            )
        }
        for nblocks in (1, 7):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = {
                (r["rid"], r["x"], r["y"])
                for r in skyline_2d(ds, "x", "y").take_all()
            }
            assert got == expect
