"""EXPLAIN for the BGP planners (stages/explain.py)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.explain import explain_bgp, explain_select

STATS = {
    "preds": {"BIG": (1000, 100, 200), "SMALL": (10, 10, 5)},
    "total": (1010, 110, 205),
}
PATS = [
    ("?d", "BIG", "?x"),
    ("?d", "SMALL", "?y"),
    ("?d", "BIG", "konst"),
]


class TestExplainBgp:
    def test_stats_mode_orders_and_prices(self):
        t = explain_bgp(PATS, stats=STATS)
        rows = t.to_pylist()
        assert [r["pattern"] for r in rows] == [
            "?d BIG konst", "?d SMALL ?y", "?d BIG ?x",
        ]
        assert [r["figure"] for r in rows] == [5.0, 10.0, 1000.0]
        assert all(r["mode"] == "stats" for r in rows)
        assert [r["step"] for r in rows] == [1, 2, 3]

    def test_given_mode_preserves_order(self):
        t = explain_bgp(PATS)
        rows = t.to_pylist()
        assert [r["pattern"] for r in rows] == [
            "?d BIG ?x", "?d SMALL ?y", "?d BIG konst",
        ]
        assert all(math.isnan(r["figure"]) for r in rows)

    def test_cardinality_mode_counts_exactly(self, ray_session):
        tri = rd.from_arrow(
            pa.table(
                {
                    "subj": ["d1", "d2", "d3", "d1"],
                    "pred": ["A", "A", "A", "B"],
                    "obj": ["x", "y", "z", "w"],
                }
            )
        )
        t = explain_bgp(
            [("?d", "A", "?x"), ("?d", "B", "?y")], triples=tri
        )
        rows = t.to_pylist()
        assert rows[0]["pattern"] == "?d B ?y" and rows[0]["figure"] == 1.0
        assert rows[1]["pattern"] == "?d A ?x" and rows[1]["figure"] == 3.0
        assert all(r["mode"] == "cardinality" for r in rows)

    def test_disconnected_raises_like_bgp_match(self):
        with pytest.raises(ValueError, match="disconnected"):
            explain_bgp(
                [("?a", "BIG", "?b"), ("?c", "SMALL", "?d")], stats=STATS
            )


class TestExplainSelect:
    def test_select_text_with_post_fold_rows(self):
        t = explain_select(
            "SELECT ?d WHERE { ?d :BIG ?x . ?d :SMALL ?y . "
            "OPTIONAL { ?d :BIG ?z . } "
            "FILTER NOT EXISTS { ?d :SMALL ?w . } }",
            stats=STATS,
        )
        rows = t.to_pylist()
        assert [r["pattern"] for r in rows[:2]] == [
            "?d SMALL ?y", "?d BIG ?x",
        ]
        post = [r for r in rows if r["mode"] == "post-fold"]
        assert [r["pattern"] for r in post] == [
            "optional: ?d BIG ?z", "not_exists: ?d SMALL ?w",
        ]
        assert all(r["step"] == 0 for r in post)

    def test_union_refused(self):
        from quickner_ray.kernel.sparql import SparqlError

        with pytest.raises(SparqlError, match="UNION"):
            explain_select(
                "SELECT ?a WHERE { { ?a :X ?b . } UNION { ?a :Y ?b . } }",
                stats=STATS,
            )
