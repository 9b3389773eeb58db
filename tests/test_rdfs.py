"""RDFS entailment (stages/rdfs.py): closure semantics, rule output vs a
brute-force reference, layout invariance."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from quickner_ray.stages.rdfs import (
    RdfsSchema,
    entailed_types,
    lift_predicates,
    transitive_closure,
)

SCHEMA = RdfsSchema(
    sub_class_of=(("A", "B"), ("B", "C"), ("D", "C")),
    sub_property_of=(("p", "q"), ("q", "r"), ("s", "r")),
    domain=(("p", "A"), ("s", "D")),
    range=(("p", "D"),),
)


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


def _ref_types(rows, schema):
    sup = transitive_closure(schema.sub_class_of)
    out = set()
    for s, p, o in rows:
        for pred, cls in schema.domain:
            if pred == p:
                for t in (cls, *sup.get(cls, ())):
                    out.add((s, t))
        for pred, cls in schema.range:
            if pred == p:
                for t in (cls, *sup.get(cls, ())):
                    out.add((o, t))
    return out


def _ref_lift(rows, schema):
    sup = transitive_closure(schema.sub_property_of)
    out = set()
    for s, p, o in rows:
        out.add((s, p, o))
        for q in sup.get(p, ()):
            out.add((s, q, o))
    return out


class TestClosure:
    def test_chain_and_diamond(self):
        c = transitive_closure([("a", "b"), ("b", "c"), ("b", "d"), ("d", "e")])
        assert c["a"] == ("b", "c", "d", "e")
        assert c["b"] == ("c", "d", "e")
        assert c["d"] == ("e",)

    def test_cycle_safe(self):
        c = transitive_closure([("a", "b"), ("b", "a")])
        assert set(c["a"]) == {"a", "b"} and set(c["b"]) == {"a", "b"}

    def test_empty(self):
        assert transitive_closure([]) == {}


ROWS = [
    ("d1", "p", "x"),
    ("d1", "p", "x"),  # duplicate mention: must not duplicate output
    ("d2", "s", "y"),
    ("d3", "t", "z"),  # pred unknown to the schema
]


class TestEntailedTypes:
    def test_matches_reference(self, ray_session):
        got = {
            (r["node"], r["rdf_type"])
            for r in entailed_types(_triples(ROWS), SCHEMA).take_all()
        }
        assert got == _ref_types(ROWS, SCHEMA)
        # spot-check transitivity: d1 typed A (domain) then B, C (rdfs9)
        assert {("d1", "A"), ("d1", "B"), ("d1", "C"), ("x", "D"), ("x", "C")} <= got
        # unknown predicate contributes nothing
        assert not any(n in ("d3", "z") for n, _ in got)

    def test_layout_invariant(self, ray_session):
        many = ROWS * 7
        a = entailed_types(_triples(many), SCHEMA).take_all()
        b = entailed_types(
            _triples(many, override_num_blocks=5), SCHEMA
        ).take_all()
        key = lambda r: (r["node"], r["rdf_type"])  # noqa: E731
        assert sorted(map(key, a)) == sorted(map(key, b))
        assert len(a) == len({key(r) for r in a})  # DISTINCT


class TestLiftPredicates:
    def test_matches_reference(self, ray_session):
        got = {
            (r["subj"], r["pred"], r["obj"])
            for r in lift_predicates(_triples(ROWS), SCHEMA).take_all()
        }
        assert got == _ref_lift(ROWS, SCHEMA)
        # p lifts through q to r (transitive), unknown pred t survives as-is
        assert {("d1", "p", "x"), ("d1", "q", "x"), ("d1", "r", "x"),
                ("d3", "t", "z")} <= got

    def test_distinct_after_lift(self, ray_session):
        # p and s both lift to r on the same (subj, obj): one output row
        rows = [("d", "p", "o"), ("d", "s", "o")]
        got = sorted(
            (r["subj"], r["pred"], r["obj"])
            for r in lift_predicates(_triples(rows), SCHEMA).take_all()
        )
        assert got.count(("d", "r", "o")) == 1
