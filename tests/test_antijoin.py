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
