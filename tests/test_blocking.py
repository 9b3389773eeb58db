"""Sorted-neighborhood blocking: window pairing pinned against brute force."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.blocking import sorted_neighborhood_pairs


@pytest.mark.usefixtures("ray_session")
class TestSortedNeighborhood:
    def test_brute_force_and_layout_invariance(self):
        keys = [
            "smith john", "smith jon", "smith johan", "smyth john",
            "adams amy", "adams ami", "zzz", "aaa", "mmm", "mmn",
            "mno", "abc", "abd", "acd",
        ]
        t = pa.table(
            {
                "rid": pa.array(list(range(len(keys))), pa.int64()),
                "key": pa.array(keys, pa.string()),
            }
        )
        order = sorted(range(len(keys)), key=lambda i: (keys[i], i))
        W = 3
        expect = set()
        for p in range(len(order)):
            for q in range(p + 1, min(p + W + 1, len(order))):
                expect.add((order[p], order[q], q - p))
        for nblocks in (1, 5):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = {
                (r["id_a"], r["id_b"], r["dist"])
                for r in sorted_neighborhood_pairs(
                    ds, ["key"], "rid", window=W, num_partitions=2
                ).take_all()
            }
            assert got == expect

    def test_window_one_is_adjacent_only(self):
        t = pa.table(
            {
                "rid": pa.array([10, 20, 30], pa.int64()),
                "key": pa.array(["a", "b", "c"], pa.string()),
            }
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                rd.from_arrow(t), ["key"], "rid", window=1
            ).take_all()
        }
        assert got == {(10, 20), (20, 30)}
