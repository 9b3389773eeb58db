"""Distributed anti-join (stages/antijoin.py): both the broadcast path and
the hash-partitioned left_anti shuffle path must drop exactly the drop-key
rows, preserving all columns."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quickner_ray.stages.antijoin import anti_join


def _ds(n=200):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "payload": pa.array([f"p{i}" for i in range(n)]),
            }
        )
    )


def _drops():
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_b": pa.array([3, 50, 51, 199], type=pa.int64())})
    )


@pytest.mark.parametrize("cap", [1_000_000, 0])  # broadcast vs shuffle path
def test_anti_join_paths_equal(ray_session, cap):
    out = anti_join(_ds(), "doc_id", _drops(), "doc_b", broadcast_cap=cap)
    rows = out.take_all()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [i for i in range(200) if i not in (3, 50, 51, 199)]
    # non-key columns survive intact
    by_id = {r["doc_id"]: r["payload"] for r in rows}
    assert by_id[0] == "p0" and by_id[198] == "p198"


def test_anti_join_empty_drop_side(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"doc_b": pa.array([], type=pa.int64())}))
    out = anti_join(_ds(50), "doc_id", empty, "doc_b")
    assert out.count() == 50


def test_bloom_kernels():
    import numpy as np

    from quickner_ray.stages.antijoin import bloom_build, bloom_contains, _mix64

    keys = _mix64(np.arange(10_000, dtype=np.int64))
    bits = bloom_build(keys, len(keys))
    assert bloom_contains(bits, keys).all()  # no false negatives, ever
    probe = _mix64(np.arange(100_000, 200_000, dtype=np.int64))
    fp = bloom_contains(bits, probe).mean()
    assert fp < 0.03  # ~1% design point at 10 bits/key


@pytest.mark.parametrize("bloom", [True, False])
def test_anti_join_shuffle_bloom_equivalent(ray_session, bloom):
    out = anti_join(
        _ds(), "doc_id", _drops(), "doc_b", broadcast_cap=0, bloom_prefilter=bloom
    )
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [i for i in range(200) if i not in (3, 50, 51, 199)]


def test_anti_join_bloom_string_keys(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"k": [f"key{i}" for i in range(100)], "v": list(range(100))})
    )
    drops = rd.from_arrow(pa.table({"k": ["key7", "key42", "missing"]}))
    out = anti_join(ds, "k", drops, broadcast_cap=0, bloom_prefilter=True)
    ks = sorted(r["k"] for r in out.take_all())
    assert len(ks) == 98 and "key7" not in ks and "key42" not in ks


@pytest.mark.parametrize("cap", [1_000_000, 0])
def test_semi_join_paths_equal(ray_session, cap):
    from quickner_ray.stages.antijoin import semi_join

    out = semi_join(_ds(), "doc_id", _drops(), "doc_b", broadcast_cap=cap)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [3, 50, 51, 199]


def test_semi_join_empty_keep_side(ray_session):
    import ray.data as rd

    from quickner_ray.stages.antijoin import semi_join

    empty = rd.from_arrow(pa.table({"doc_b": pa.array([], type=pa.int64())}))
    assert semi_join(_ds(50), "doc_id", empty, "doc_b").count() == 0


@pytest.mark.usefixtures("ray_session")
class TestLeftOuterCounts:
    def test_unmatched_left_rows_count_zero(self, tmp_path):
        import os

        import pyarrow.parquet as pq
        import pyarrow as pa

        from quickner_ray.pipelines.queries import q_customer_order_counts

        sf = str(tmp_path)
        pq.write_table(
            pa.table({"c_custkey": [1, 2, 3, 4]}),
            os.path.join(sf, "customer.parquet"),
        )
        pq.write_table(
            pa.table({"o_orderkey": [10, 11, 12], "o_custkey": [1, 1, 3]}),
            os.path.join(sf, "orders.parquet"),
        )
        out = {
            r["c_custkey"]: r["n_orders"]
            for r in q_customer_order_counts(sf).take_all()
        }
        assert out == {1: 2, 2: 0, 3: 1, 4: 0}


@pytest.mark.usefixtures("ray_session")
def test_snapshot_diff_statuses():
    """Every original id classifies; planted delta shows all four states."""
    from collections import Counter

    from quickner_ray.pipelines.queries import q_snapshot_diff

    rows = q_snapshot_diff("/root/testdata/sf0.001").take_all()
    got = {r["doc_id"]: r["status"] for r in rows}
    c = Counter(got.values())
    assert set(c) == {"added", "removed", "changed", "same"}
    for did, st in got.items():
        if did >= 1_000_000:
            assert st == "added"
        elif did % 10 == 7:
            assert st == "removed"
        elif did % 2 == 0:
            assert st == "changed"
        else:
            assert st == "same"
