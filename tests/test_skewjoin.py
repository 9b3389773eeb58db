"""Skew-aware hybrid join (stages/skewjoin.py): hot keys must take the
broadcast path, cold keys the bucketed-shuffle path, and the union must be
the exact inner join — multi-row right sides and string keys included."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from quickner_ray.stages.skewjoin import hot_keys, skew_join


def _left(ray_session):
    import ray.data as rd

    # keys 0 and 1 are hot (600 / 300 rows); keys 2..21 are cold (7 each)
    keys = [0] * 600 + [1] * 300 + [k for k in range(2, 22) for _ in range(7)]
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, type=pa.int64()),
                "ev": pa.array(range(len(keys)), type=pa.int64()),
            }
        )
    ).repartition(6)


def _right(ray_session, multi=True):
    import ray.data as rd

    # keys 0..18 present (19..21 unmatched on the left); key 0 and 5 have
    # TWO right rows each -> join must fan out
    ks, names = [], []
    for k in range(19):
        ks.append(k)
        names.append(f"n{k}")
        if multi and k in (0, 5):
            ks.append(k)
            names.append(f"n{k}b")
    return rd.from_arrow(
        pa.table(
            {"k": pa.array(ks, type=pa.int64()), "nm": pa.array(names)}
        )
    )


def _expected():
    rows = []
    keys = [0] * 600 + [1] * 300 + [k for k in range(2, 22) for _ in range(7)]
    right = {}
    for k in range(19):
        right.setdefault(k, []).append(f"n{k}")
        if k in (0, 5):
            right[k].append(f"n{k}b")
    for ev, k in enumerate(keys):
        for nm in right.get(k, []):
            rows.append((k, ev, nm))
    return sorted(rows)


def test_skew_join_exact(ray_session):
    out = skew_join(
        _left(ray_session), _right(ray_session), on="k", hot_threshold=100
    )
    got = sorted((r["k"], r["ev"], r["nm"]) for r in out.take_all())
    assert got == _expected()


def test_skew_join_no_hot_keys(ray_session):
    # threshold above every key count -> pure cold path, same exact join
    out = skew_join(
        _left(ray_session), _right(ray_session), on="k", hot_threshold=10_000
    )
    got = sorted((r["k"], r["ev"], r["nm"]) for r in out.take_all())
    assert got == _expected()


def test_hot_keys_exact_and_layout_invariant(ray_session):
    for parts in (1, 7):
        ds = _left(ray_session).repartition(parts)
        hot = sorted(hot_keys(ds, "k", 100).to_pylist())
        assert hot == [0, 1]
        assert sorted(hot_keys(ds, "k", 301).to_pylist()) == [0]


def test_hot_threshold_below_mg_bound_raises(ray_session):
    with pytest.raises(ValueError, match="completeness"):
        hot_keys(_left(ray_session), "k", 2, mg_k=4)


def test_mg_bound_checked_against_true_n(ray_session):
    """Uniform distinct keys: surviving-candidate mass is tiny, so a check
    against candidate mass passes silently — the bound must be validated
    against the true dataset size n (ADVICE r3)."""
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"k": pa.array(range(1000), type=pa.int64())})
    ).repartition(5)
    with pytest.raises(ValueError, match="completeness"):
        hot_keys(ds, "k", 3, mg_k=4)
    # a threshold satisfying the bound still works and finds nothing hot
    assert hot_keys(ds, "k", 500, mg_k=4).to_pylist() == []


def test_hot_right_cap_raises(ray_session):
    import ray.data as rd

    big_right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([0] * 50, type=pa.int64()),
                "nm": pa.array([f"x{i}" for i in range(50)]),
            }
        )
    )
    with pytest.raises(ValueError, match="hot_right_cap"):
        skew_join(
            _left(ray_session),
            big_right,
            on="k",
            hot_threshold=100,
            hot_right_cap=10,
        )


def test_skew_join_string_keys(ray_session):
    import ray.data as rd

    lk = ["hot"] * 200 + ["a", "b", "c"] * 4
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(lk),
                "ev": pa.array(range(len(lk)), type=pa.int64()),
            }
        )
    ).repartition(4)
    right = rd.from_arrow(
        pa.table({"k": pa.array(["hot", "a", "z"]), "nm": pa.array(["H", "A", "Z"])})
    )
    out = skew_join(left, right, on="k", hot_threshold=50)
    got = sorted((r["k"], r["ev"], r["nm"]) for r in out.take_all())
    exp = sorted(
        (k, ev, {"hot": "H", "a": "A"}[k])
        for ev, k in enumerate(lk)
        if k in ("hot", "a")
    )
    assert got == exp
