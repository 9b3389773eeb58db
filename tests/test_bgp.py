"""BGP matcher (stages/bgp.py): bucketed inner join vs pandas merge,
pattern compilation semantics (constants, repeated variables, distinct),
cross-product refusal, and bucket-vs-native engine equality."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from quickner_ray.stages.bgp import bgp_match, bucketed_inner_join


def _pdf(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def test_bucketed_join_matches_pandas(ray_session):
    import ray.data as rd

    left = pa.table(
        {
            "k": ["a", "a", "b", "c", "d"],
            "k2": ["1", "2", "1", "1", "1"],
            "x": [10, 11, 12, 13, 14],
        }
    )
    right = pa.table(
        {
            "k": ["a", "b", "b", "e"],
            "k2": ["2", "1", "1", "1"],
            "y": ["p", "q", "r", "s"],
        }
    )
    got = _pdf(
        bucketed_inner_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            on=("k", "k2"),
            n_buckets=4,
        )
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on=["k", "k2"], how="inner")
    )
    want = (
        want[sorted(want.columns)]
        .sort_values(sorted(want.columns), kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


from hypothesis import given, settings
from hypothesis import strategies as st

_k = st.sampled_from(["a", "b", "c", "d", "e"])


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(_k, st.integers(0, 9)), min_size=0, max_size=25),
    st.lists(st.tuples(_k, st.integers(0, 9)), min_size=0, max_size=25),
)
def test_bucketed_join_hypothesis(ray_session, lrows, rrows):
    import ray.data as rd

    left = pa.table(
        {
            "k": [r[0] for r in lrows],
            "x": pa.array([r[1] for r in lrows], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": [r[0] for r in rrows],
            "y": pa.array([r[1] for r in rrows], type=pa.int64()),
        }
    )
    got = _pdf(
        bucketed_inner_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(3),
            on=("k",),
            n_buckets=3,
        )
    )
    want = left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
    want = (
        want[sorted(want.columns)]
        .sort_values(sorted(want.columns), kind="mergesort")
        .reset_index(drop=True)
    )
    if len(want) == 0:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(got, want)


def test_bucketed_join_name_clash_raises(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"k": ["a"], "x": [1]}))
    b = rd.from_arrow(pa.table({"k": ["a"], "x": [2]}))
    with pytest.raises(ValueError, match="clash"):
        bucketed_inner_join(a, b, on=("k",), n_buckets=2)


@pytest.fixture(scope="module")
def tiny_triples():
    return pa.table(
        {
            "subj": ["d1", "d1", "d1", "d2", "d2", "d3", "d3", "d1"],
            "pred": ["SYS", "OP", "UNIT", "SYS", "OP", "OP", "SELF", "OP"],
            "obj": ["spark", "join", "row", "spark", "scan", "join", "d3", "join"],
        }
    )


def test_bgp_star_and_distinct(ray_session, tiny_triples):
    import ray.data as rd

    # duplicate (d1 OP join) rows must not duplicate bindings
    out = _pdf(
        bgp_match(
            rd.from_arrow(tiny_triples).repartition(3),
            [("?doc", "SYS", "spark"), ("?doc", "OP", "?op")],
            num_partitions=4,
        )
    )
    got = {(r.doc, r.op) for r in out.itertuples()}
    assert got == {("d1", "join"), ("d2", "scan")}
    assert len(out) == 2  # DISTINCT


def test_bgp_three_pattern_chain(ray_session, tiny_triples):
    import ray.data as rd

    out = _pdf(
        bgp_match(
            rd.from_arrow(tiny_triples),
            [
                ("?doc", "SYS", "spark"),
                ("?doc", "OP", "?op"),
                ("?other", "OP", "?op"),
            ],
            num_partitions=4,
        )
    )
    got = {(r.doc, r.op, r.other) for r in out.itertuples()}
    # d1 and d3 share OP join; d2's scan matches only itself
    assert got == {
        ("d1", "join", "d1"),
        ("d1", "join", "d3"),
        ("d2", "scan", "d2"),
    }


def test_bgp_repeated_variable(ray_session, tiny_triples):
    import ray.data as rd

    out = _pdf(
        bgp_match(
            rd.from_arrow(tiny_triples),
            [("?x", "SELF", "?x")],
            num_partitions=2,
        )
    )
    assert {r.x for r in out.itertuples()} == {"d3"}


def test_bgp_disconnected_raises(ray_session, tiny_triples):
    import ray.data as rd

    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(
            rd.from_arrow(tiny_triples),
            [("?a", "SYS", "spark"), ("?b", "OP", "scan")],
        )


def test_bgp_engines_agree(ray_session, tiny_triples):
    import ray.data as rd

    pats = [("?doc", "SYS", "spark"), ("?doc", "OP", "?op")]
    a = _pdf(bgp_match(rd.from_arrow(tiny_triples), pats, num_partitions=4))
    b = _pdf(
        bgp_match(
            rd.from_arrow(tiny_triples), pats, num_partitions=4, engine="native"
        )
    )
    pd.testing.assert_frame_equal(a, b)
