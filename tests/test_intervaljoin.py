"""Interval-overlap join: bucket decomposition pinned against brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.intervaljoin import (
    explode_interval_buckets,
    interval_overlap_join,
)

W = 100  # tiny bucket width so multi-bucket spans are exercised


def _ds(rows, id_col):
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                id_col: pa.array([r[1] for r in rows], pa.int64()),
                "start_us": pa.array([r[2] for r in rows], pa.int64()),
                "end_us": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


def _brute(left, right):
    out = set()
    for u1, lid, s1, e1 in left:
        for u2, rid, s2, e2 in right:
            if u1 != u2:
                continue
            ov = min(e1, e2) - max(s1, s2)
            if ov > 0:
                out.add((u1, lid, rid, ov))
    return out


def _run(left, right):
    got = interval_overlap_join(
        _ds(left, "lid"),
        _ds(right, "rid"),
        key_col="user_id",
        left_cols=("lid", "start_us", "end_us"),
        right_cols=("rid", "start_us", "end_us"),
        w_us=W,
        num_partitions=2,
    ).take_all()
    return {(r["user_id"], r["lid"], r["rid"], r["overlap_us"]) for r in got}


@pytest.mark.usefixtures("ray_session")
class TestIntervalOverlapJoin:
    def test_multi_bucket_pair_emitted_once(self):
        # both intervals span 5+ buckets and share 4 buckets -> exactly 1 row
        left = [(1, 10, 50, 550)]
        right = [(1, 20, 250, 900)]
        assert _run(left, right) == {(1, 10, 20, 300)}

    def test_touching_intervals_no_overlap(self):
        left = [(1, 10, 0, 100)]
        right = [(1, 20, 100, 200)]  # half-open: [0,100) and [100,200) disjoint
        assert _run(left, right) == set()

    def test_key_isolation(self):
        left = [(1, 10, 0, 1000)]
        right = [(2, 20, 0, 1000)]  # same times, different user -> no pair
        assert _run(left, right) == set()

    def test_brute_force_equivalence(self):
        rng = np.random.RandomState(7)
        left, right = [], []
        for i in range(60):
            u = int(rng.randint(0, 4))
            s = int(rng.randint(0, 2000))
            left.append((u, i, s, s + int(rng.randint(1, 700))))
        for i in range(60):
            u = int(rng.randint(0, 4))
            s = int(rng.randint(0, 2000))
            right.append((u, i, s, s + int(rng.randint(1, 700))))
        assert _run(left, right) == _brute(left, right)

    def test_explode_covers_exactly(self):
        t = pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "s": pa.array([0, 99, 250], pa.int64()),
                "e": pa.array([1, 201, 250], pa.int64()),  # 3rd is empty
            }
        )
        out = explode_interval_buckets(t, "s", "e", w_us=W, keep=["k"])
        got = list(zip(out.column("k").to_pylist(), out.column("bucket").to_pylist()))
        assert got == [(1, 0), (2, 0), (2, 1), (2, 2)]
