"""Entity-link candidate scoring: alias table, disambiguation, Ray stage."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quickner_ray.stages.canonicalize import entity_id
from quickner_ray.stages.entity_link import (
    EntityLinker,
    build_alias_table,
    link_mentions,
    score_candidates,
)

# "sort" is ambiguous: an OPERATOR reading (hot) and a CONCEPT reading (rare)
ENTITIES = [
    ("sort", "OPERATOR", 1000.0),
    ("sort", "CONCEPT", 10.0),
    ("merge", "OPERATOR", 500.0),
    ("quick sort algorithm", "CONCEPT", 50.0),
]

EID_SORT_OP = entity_id("sort", "OPERATOR")
EID_SORT_CONCEPT = entity_id("sort", "CONCEPT")


class TestKernel:
    def test_alias_table(self):
        table, ctx = build_alias_table(ENTITIES)
        assert [c[1] for c in table["sort"]] == ["OPERATOR", "CONCEPT"]  # prior order
        assert "algorithm" in ctx[entity_id("quick sort algorithm", "CONCEPT")]

    def test_prior_wins_without_context(self):
        table, ctx = build_alias_table(ENTITIES)
        ranked = score_candidates(table["sort"], frozenset(), ctx)
        assert ranked[0][1] == EID_SORT_OP

    def test_context_overrides_prior(self):
        """Context tokens overlapping the rare reading's profile flip the
        decision when weighted enough."""
        table, ctx = build_alias_table(ENTITIES)
        # give the CONCEPT reading a distinctive context profile
        ctx = dict(ctx)
        ctx[EID_SORT_CONCEPT] = frozenset({"sort", "algorithm", "complexity"})
        context = frozenset({"algorithm", "complexity", "analysis"})
        ranked = score_candidates(
            table["sort"], context, ctx, prior_weight=0.1, context_weight=10.0
        )
        assert ranked[0][1] == EID_SORT_CONCEPT

    def test_deterministic_tiebreak(self):
        table, ctx = build_alias_table(
            [("x", "B", 5.0), ("x", "A", 5.0)]
        )
        ranked = score_candidates(table["x"], frozenset(), ctx)
        assert ranked[0][2] == "A"  # label asc on equal score


class TestStage:
    def test_link_mentions_pipeline(self, ray_session):
        import ray.data as rd

        mentions = pa.Table.from_pydict(
            {
                "surface_norm": pa.array(["sort", "merge", "unknown"]),
                "start": pa.array([10, 0, 0], type=pa.int64()),
                "end": pa.array([14, 5, 7], type=pa.int64()),
                "doc_text": pa.array(
                    [
                        "the fast sort operator runs",
                        "merge joins rows",
                        "unknown surface here",
                    ]
                ),
            }
        )
        out = (
            link_mentions(rd.from_arrow(mentions), ENTITIES, concurrency=(1, 2))
            .to_pandas()
            .set_index("surface_norm")
        )
        assert out.loc["sort", "linked_entity_id"] == EID_SORT_OP
        assert out.loc["sort", "n_candidates"] == 2
        assert out.loc["merge", "n_candidates"] == 1
        assert out.loc["unknown", "n_candidates"] == 0
        assert out.loc["unknown", "linked_entity_id"] is None
