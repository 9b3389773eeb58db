"""OWL-lite property axioms: materialization + integrity reports."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.owl import (
    OwlSchema,
    functional_violations,
    ifp_merge_signals,
    ifp_sameas_pairs,
    materialize_property_axioms,
    transitive_triples,
)


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def _rows(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


@pytest.mark.usefixtures("ray_session")
class TestAxiomMaterialization:
    def test_inverse_and_symmetric(self):
        ds = _ds(
            [
                ("a", "parentOf", "b"),
                ("a", "marriedTo", "c"),
                ("x", "likes", "y"),
            ]
        )
        schema = OwlSchema(
            inverse_of=(("parentOf", "childOf"),), symmetric=("marriedTo",)
        )
        out = _rows(
            materialize_property_axioms(ds, schema), ("subj", "pred", "obj")
        )
        assert out == sorted(
            [
                ("a", "parentOf", "b"),
                ("b", "childOf", "a"),
                ("a", "marriedTo", "c"),
                ("c", "marriedTo", "a"),
                ("x", "likes", "y"),
            ]
        )

    def test_derived_only_and_distinct(self):
        # duplicate mentions collapse; include_input=False drops originals
        ds = _ds([("a", "p", "b"), ("a", "p", "b")])
        schema = OwlSchema(inverse_of=(("p", "q"),))
        out = _rows(
            materialize_property_axioms(ds, schema, include_input=False),
            ("subj", "pred", "obj"),
        )
        assert out == [("b", "q", "a")]

    def test_empty_schema_raises(self):
        with pytest.raises(ValueError):
            materialize_property_axioms(_ds([("a", "p", "b")]), OwlSchema())

    def test_transitive_closure(self):
        ds = _ds([("a", "in", "b"), ("b", "in", "c"), ("c", "in", "d")])
        out = _rows(transitive_triples(ds, "in", 2), ("subj", "pred", "obj"))
        assert out == sorted(
            [
                ("a", "in", "b"), ("b", "in", "c"), ("c", "in", "d"),
                ("a", "in", "c"), ("b", "in", "d"),
            ]
        )


@pytest.mark.usefixtures("ray_session")
class TestIntegrityReports:
    ROWS = [
        ("doc1", "ssn", "111"),
        ("doc2", "ssn", "111"),       # IFP shared -> merge signal
        ("doc3", "ssn", "222"),
        ("doc1", "birth", "1990"),
        ("doc1", "birth", "1991"),    # functional violation (2 values)
        ("doc1", "birth", "1991"),    # duplicate mention: still 2 distinct
        ("doc2", "birth", "1980"),
    ]

    def test_functional_violations(self):
        schema = OwlSchema(functional=("birth",))
        out = _rows(
            functional_violations(_ds(self.ROWS), schema),
            ("subj", "pred", "n_objects"),
        )
        assert out == [("doc1", "birth", 2)]

    def test_ifp_merge_signals(self):
        schema = OwlSchema(inverse_functional=("ssn",))
        out = _rows(
            ifp_merge_signals(_ds(self.ROWS), schema),
            ("obj", "pred", "n_subjects"),
        )
        assert out == [("111", "ssn", 2)]

    def test_ifp_sameas_pairs_and_cap(self):
        schema = OwlSchema(inverse_functional=("ssn",))
        out = _rows(
            ifp_sameas_pairs(_ds(self.ROWS), schema),
            ("pred", "obj", "subj_a", "subj_b"),
        )
        assert out == [("ssn", "111", "doc1", "doc2")]
        # a hub value above the cap emits nothing (skipped loudly via
        # ifp_merge_signals, pinned here)
        hub = [(f"d{i}", "ssn", "HUB") for i in range(5)]
        capped = ifp_sameas_pairs(_ds(hub), schema, pair_cap=4)
        assert capped.count() == 0
        full = ifp_sameas_pairs(_ds(hub), schema, pair_cap=5)
        assert full.count() == 10

    def test_empty_declarations_raise(self):
        for fn in (functional_violations, ifp_merge_signals, ifp_sameas_pairs):
            with pytest.raises(ValueError):
                fn(_ds(self.ROWS), OwlSchema())

    def test_parallelism_invariance(self):
        # same answers regardless of block layout
        schema = OwlSchema(
            inverse_of=(("ssn", "ssn_of"),), functional=("birth",)
        )
        a = _rows(
            materialize_property_axioms(_ds(self.ROWS), schema),
            ("subj", "pred", "obj"),
        )
        b = _rows(
            materialize_property_axioms(
                _ds(self.ROWS).repartition(7), schema
            ),
            ("subj", "pred", "obj"),
        )
        assert a == b
