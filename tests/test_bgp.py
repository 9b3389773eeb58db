"""BGP matcher (stages/bgp.py): bucketed inner join vs pandas merge,
pattern compilation semantics (constants, repeated variables, distinct),
cross-product refusal, and bucket-vs-native engine equality."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from quickner_ray.stages.bgp import bgp_match
from quickner_ray.stages.hashjoin import bucketed_inner_join, bucketed_join


def _pdf(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    if not len(df.columns):  # schema-less empty result
        return df
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


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.tuples(_k, st.integers(0, 9)), min_size=0, max_size=20),
    st.lists(st.tuples(_k, st.integers(0, 9)), min_size=0, max_size=20),
    st.sampled_from(["left outer", "left semi", "left anti"]),
)
def test_bucketed_join_types_hypothesis(ray_session, lrows, rrows, jt):
    import numpy as np
    import ray.data as rd

    left = pa.table(
        {
            "k": pa.array([r[0] for r in lrows], type=pa.string()),
            "x": pa.array([r[1] for r in lrows], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([r[0] for r in rrows], type=pa.string()),
            "y": pa.array([r[1] for r in rrows], type=pa.int64()),
        }
    )
    got = _pdf(
        bucketed_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(3),
            on=("k",),
            n_buckets=3,
            join_type=jt,
            # explicit types so the verifiably-empty short-circuit does not
            # engage and the pad path is exercised even on empty sides
            left_types={"k": pa.string(), "x": pa.int64()},
            right_types={"k": pa.string(), "y": pa.int64()},
        )
    )
    ldf, rdf = left.to_pandas(), right.to_pandas()
    rkeys = set(rdf["k"])
    if jt == "left outer":
        want = ldf.merge(rdf, on="k", how="left")
        # pandas promotes y to float64 on unmatched rows; compare as nullable
        if len(want):
            want["y"] = want["y"].astype("Int64")
            got["y"] = got["y"].astype("Int64")
    elif jt == "left semi":
        want = ldf[ldf["k"].isin(rkeys)]
    else:  # left anti
        want = ldf[~ldf["k"].isin(rkeys)]
    want = (
        want[sorted(want.columns)]
        .sort_values(sorted(want.columns), kind="mergesort")
        .reset_index(drop=True)
    )
    if len(want) == 0:
        assert len(got) == 0
    else:
        got = got[sorted(want.columns)].sort_values(
            sorted(want.columns), kind="mergesort"
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


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


def test_bucketed_join_empty_side_degeneration(ray_session):
    """A side whose schema is unknowable (verifiably empty, no explicit
    types) short-circuits as documented instead of crashing."""
    import ray.data as rd

    full = rd.from_arrow(pa.table({"k": ["a", "b"], "x": [1, 2]}))
    empty = rd.from_arrow(pa.table({"k": ["z"], "y": [0]})).filter(
        lambda r: False
    ).materialize()
    assert empty.schema() is None or empty.count() == 0
    for jt, want_rows in (
        ("inner", 0),
        ("left semi", 0),
        ("left anti", 2),
        ("left outer", 2),
    ):
        out = bucketed_join(full, empty, on=("k",), n_buckets=2, join_type=jt)
        assert out.count() == want_rows, jt
    # empty LEFT side: every join type yields zero rows
    for jt in ("inner", "left semi", "left anti", "left outer"):
        out = bucketed_join(empty, full, on=("k",), n_buckets=2, join_type=jt)
        assert out.count() == 0, jt


def test_bgp_optional(ray_session, tiny_triples):
    import ray.data as rd

    out = _pdf(
        bgp_match(
            rd.from_arrow(tiny_triples).repartition(3),
            [("?doc", "SYS", "spark"), ("?doc", "OP", "?op")],
            optional=[("?doc", "UNIT", "?unit")],
            num_partitions=4,
        )
    )
    got = {(r.doc, r.op, r.unit) for r in out.itertuples()}
    # d1 has a UNIT mention (row); d2 has none -> unbound rendered as ''
    assert got == {("d1", "join", "row"), ("d2", "scan", "")}


def test_bgp_not_exists(ray_session, tiny_triples):
    import ray.data as rd

    out = _pdf(
        bgp_match(
            rd.from_arrow(tiny_triples).repartition(3),
            [("?doc", "SYS", "spark"), ("?doc", "OP", "?op")],
            not_exists=[("?doc", "UNIT", "?unit")],
            num_partitions=4,
        )
    )
    got = {(r.doc, r.op) for r in out.itertuples()}
    assert got == {("d2", "scan")}  # d1 is removed by its UNIT mention
    assert list(out.columns) == ["doc", "op"]  # ?unit never joins the output


def test_bgp_optional_disconnected_raises(ray_session, tiny_triples):
    import ray.data as rd

    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(
            rd.from_arrow(tiny_triples),
            [("?doc", "SYS", "spark")],
            optional=[("?a", "OP", "?b")],
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


class TestCardinalityPlanning:
    def _tri(self):
        import ray.data as rd

        # pred A: 12 rows (unselective), pred B: 4, constant-obj C: 1
        rows = (
            [("d%d" % i, "A", "a%d" % (i % 3)) for i in range(12)]
            + [("d%d" % i, "B", "b") for i in range(4)]
            + [("d0", "C", "target"), ("d1", "C", "other")]
        )
        return rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows]),
                    "pred": pa.array([r[1] for r in rows]),
                    "obj": pa.array([r[2] for r in rows]),
                }
            )
        )

    PATTERNS = [
        ("?d", "A", "?x"),          # count 12
        ("?d", "B", "?y"),          # count 4
        ("?d", "C", "target"),      # count 1 (constant obj)
    ]

    def test_plan_orders_smallest_first(self, ray_session):
        from quickner_ray.stages.bgp import plan_patterns

        got = plan_patterns(self._tri(), self.PATTERNS)
        assert got == [self.PATTERNS[2], self.PATTERNS[1], self.PATTERNS[0]]

    def test_planned_equals_given(self, ray_session):
        a = _pdf(bgp_match(self._tri(), self.PATTERNS))
        b = _pdf(bgp_match(self._tri(), self.PATTERNS, plan="cardinality"))
        assert a.equals(b)
        assert len(a) == 1  # only d0 satisfies all three

    def test_connectivity_respected_over_count(self, ray_session):
        import ray.data as rd

        from quickner_ray.stages.bgp import plan_patterns

        # after the count-1 seed binds {a, b}, the count-2 pattern only
        # connects through ?c — the planner must take the CONNECTED
        # count-5 pattern first, then the smaller one
        rows = (
            [("s", "P", "t")]
            + [("s", "R", "w%d" % i) for i in range(5)]
            + [("w0", "T", "y0"), ("w1", "T", "y1")]
        )
        tri = rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows]),
                    "pred": pa.array([r[1] for r in rows]),
                    "obj": pa.array([r[2] for r in rows]),
                }
            )
        )
        pats = [
            ("?a", "P", "?b"),  # count 1 — seed
            ("?c", "T", "?y"),  # count 2 but disconnected from {a, b}
            ("?a", "R", "?c"),  # count 5, connected
        ]
        got = plan_patterns(tri, pats)
        assert got == [pats[0], pats[2], pats[1]]
        # a truly disconnected pair must refuse, exactly like bgp_match
        import pytest as _pt

        with _pt.raises(ValueError):
            plan_patterns(tri, pats[:2])

    def test_plan_refuses_paths(self, ray_session):
        from quickner_ray.stages.bgp import plan_patterns

        with pytest.raises(ValueError):
            plan_patterns(
                self._tri(), [("?a", ("pred", "A"), "?b"), ("?a", "B", "?c")]
            )


class TestQuadPatterns:
    """4-term (graph-scoped) patterns over quad streams."""

    def _quads(self):
        import ray.data as rd

        rows = [
            ("d1", "SYS", "spark", "g1"),
            ("d1", "OP", "join", "g1"),
            ("d2", "SYS", "spark", "g2"),
            ("d2", "OP", "sort", "g2"),
            ("d3", "SYS", "flink", "g1"),
        ]
        return rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows]),
                    "pred": pa.array([r[1] for r in rows]),
                    "obj": pa.array([r[2] for r in rows]),
                    "graph": pa.array([r[3] for r in rows]),
                }
            )
        )

    def test_graph_constant_restricts(self, ray_session):
        out = bgp_match(
            self._quads(), [("?d", "SYS", "spark", "g1")]
        ).take_all()
        assert [r["d"] for r in out] == ["d1"]

    def test_graph_variable_binds(self, ray_session):
        out = bgp_match(self._quads(), [("?d", "SYS", "spark", "?g")])
        got = sorted((r["d"], r["g"]) for r in out.take_all())
        assert got == [("d1", "g1"), ("d2", "g2")]

    def test_mixed_triple_and_quad_patterns(self, ray_session):
        # 3-term pattern matches any graph; quad pattern scopes + binds
        out = bgp_match(
            self._quads(),
            [("?d", "SYS", "spark", "?g"), ("?d", "OP", "?o")],
        )
        got = sorted((r["d"], r["g"], r["o"]) for r in out.take_all())
        assert got == [("d1", "g1", "join"), ("d2", "g2", "sort")]

    def test_bad_pattern_lengths_raise(self, ray_session):
        with pytest.raises(ValueError, match="3 or 4"):
            bgp_match(self._quads(), [("?d", "SYS")])
        with pytest.raises(ValueError, match="graph-scoped"):
            bgp_match(
                self._quads(), [("?d", ("pred", "SYS"), "?x", "g1")]
            )
