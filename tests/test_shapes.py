"""SHACL-lite shape validation (stages/shapes.py) vs a brute-force
reference; per-kind checks and layout invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.shapes import ShapeConstraint, shape_violations


def _triples(rows, **kw):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows]),
                "pred": pa.array([r[1] for r in rows]),
                "obj": pa.array([r[2] for r in rows]),
            }
        ),
        **kw,
    )


def _ref(rows, constraints):
    subs = {s for s, _, _ in rows}
    edges = {}
    for s, p, o in rows:
        edges.setdefault((s, p), set()).add(o)
    out = set()
    for c in constraints:
        for s in subs:
            n = len(edges.get((s, c.pred), ()))
            if c.max_count is not None and n > c.max_count:
                out.add((c.constraint_id, s))
            if c.min_count > 0 and n < c.min_count:
                out.add((c.constraint_id, s))
        if c.allowed_objects is not None:
            for s, p, o in rows:
                if p == c.pred and o not in c.allowed_objects:
                    out.add((c.constraint_id, s))
    return out


ROWS = [
    ("d1", "P", "a"), ("d1", "P", "b"), ("d1", "P", "c"),
    ("d1", "P", "a"),  # duplicate mention: distinct-object counting
    ("d2", "P", "a"),
    ("d2", "Q", "x"), ("d2", "Q", "bad"),
    ("d3", "R", "z"),
]

CONSTRAINTS = [
    ShapeConstraint("p_max2", "P", max_count=2),
    ShapeConstraint("q_required", "Q", min_count=1),
    ShapeConstraint("q_closed", "Q", allowed_objects=("x", "y")),
    ShapeConstraint("p_two_plus", "P", min_count=2),
]


def _got(ds):
    return {(r["constraint_id"], r["subj"]) for r in ds.take_all()}


class TestShapeViolations:
    def test_matches_reference(self, ray_session):
        got = _got(shape_violations(_triples(ROWS), CONSTRAINTS))
        assert got == _ref(ROWS, CONSTRAINTS)
        # each kind fires: d1 has 3 distinct P objs (> 2); d1/d3 lack Q;
        # d2's Q hits 'bad'; d2/d3 have < 2 distinct P objs
        assert ("p_max2", "d1") in got
        assert ("q_required", "d1") in got and ("q_required", "d3") in got
        assert ("q_closed", "d2") in got
        assert ("p_two_plus", "d2") in got and ("p_two_plus", "d3") in got
        # duplicate mentions do not push d1 over max_count via multiplicity
        assert ("p_max2", "d2") not in got

    def test_layout_invariant(self, ray_session):
        many = ROWS * 9
        a = _got(shape_violations(_triples(many), CONSTRAINTS))
        b = _got(
            shape_violations(_triples(many, override_num_blocks=7), CONSTRAINTS)
        )
        assert a == b == _ref(ROWS, CONSTRAINTS)

    def test_no_violations(self, ray_session):
        rows = [("d1", "P", "a"), ("d1", "Q", "x")]
        cs = [ShapeConstraint("ok", "P", max_count=5)]
        assert _got(shape_violations(_triples(rows), cs)) == set()

    def test_rejects_bad_config(self, ray_session):
        with pytest.raises(ValueError):
            shape_violations(_triples(ROWS), [])
        with pytest.raises(ValueError):
            shape_violations(
                _triples(ROWS),
                [ShapeConstraint("a", "P", max_count=1),
                 ShapeConstraint("a", "Q", min_count=1)],
            )
        with pytest.raises(ValueError):  # no checkable component
            shape_violations(_triples(ROWS), [ShapeConstraint("x", "P")])
