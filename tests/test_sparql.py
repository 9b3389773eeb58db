"""Mini SPARQL SELECT front-end: parser conformance + end-to-end eval."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.kernel.sparql import SparqlError, parse_select, run_select


class TestParser:
    def test_basic_select(self):
        q = parse_select(
            'SELECT ?d ?o WHERE { ?d :SYSTEM :abc . ?d :OPERATOR ?o . }'
        )
        assert q["project"] == ["d", "o"]
        assert q["patterns"] == [("?d", "SYSTEM", "abc"), ("?d", "OPERATOR", "?o")]
        assert q["optional"] == [] and q["not_exists"] == []

    def test_star_distinct_and_comments(self):
        q = parse_select(
            "SELECT DISTINCT * WHERE {  # full projection\n"
            "  ?d :SYSTEM ?s .  # pattern one\n"
            "}"
        )
        assert q["project"] is None
        assert q["patterns"] == [("?d", "SYSTEM", "?s")]

    def test_optional_and_not_exists_groups(self):
        q = parse_select(
            "SELECT ?d WHERE { ?d :A ?x . "
            "OPTIONAL { ?d :B ?y . } "
            "FILTER NOT EXISTS { ?d :C ?z . } }"
        )
        assert q["optional"] == [("?d", "B", "?y")]
        assert q["not_exists"] == [("?d", "C", "?z")]

    def test_quoted_string_constant(self):
        q = parse_select('SELECT ?d WHERE { ?d :PRED "hello \\"w\\"" . }')
        assert q["patterns"] == [("?d", "PRED", 'hello "w"')]

    @pytest.mark.parametrize(
        "bad",
        [
            "ASK { ?a :B ?c . }",
            "SELECT WHERE { ?a :B ?c . }",
            "SELECT ?a WHERE { ?a :B ?c }",  # missing '.'
            "SELECT ?a WHERE { ?a :B ?c ?d . }",  # 4 terms
            "SELECT ?a WHERE { ?a bare ?c . }",  # unmarked constant
            "SELECT ?a WHERE { ?a :B ?c . ",  # unterminated
            "SELECT ?a WHERE { FILTER EXISTS { ?a :B ?c . } }",
            "SELECT ?a WHERE { }",
            "SELECT ?a WHERE { ?a :B ?c . } trailing",
        ],
    )
    def test_rejects_unsupported(self, bad):
        with pytest.raises(SparqlError):
            parse_select(bad)


T = pa.table(
    {
        "subj": ["d1", "d1", "d2", "d2", "d3", "d3"],
        "pred": ["SYS", "OP", "SYS", "UNIT", "SYS", "OP"],
        "obj": ["spark", "join", "spark", "row", "flink", "sort"],
    }
)


@pytest.mark.usefixtures("ray_session")
class TestRunSelect:
    def _ds(self):
        return rd.from_arrow(T)

    def test_join_and_projection(self):
        out = run_select(
            self._ds(),
            'SELECT ?d WHERE { ?d :SYS :spark . ?d :OP ?o . }',
        ).take_all()
        assert sorted(r["d"] for r in out) == ["d1"]

    def test_star_returns_all_vars(self):
        out = run_select(
            self._ds(), "SELECT * WHERE { ?d :SYS ?s . ?d :OP ?o . }"
        ).take_all()
        assert sorted((r["d"], r["o"], r["s"]) for r in out) == [
            ("d1", "join", "spark"),
            ("d3", "sort", "flink"),
        ]

    def test_optional_and_not_exists(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?u WHERE { ?d :SYS ?s . "
            "OPTIONAL { ?d :UNIT ?u . } "
            "FILTER NOT EXISTS { ?d :OP ?o . } }",
        ).take_all()
        assert [(r["d"], r["u"]) for r in out] == [("d2", "row")]

    def test_narrowing_projection_dedups(self):
        out = run_select(
            self._ds(), "SELECT ?s WHERE { ?d :SYS ?s . }"
        ).take_all()
        assert sorted(r["s"] for r in out) == ["flink", "spark"]

    def test_unbound_projection_raises(self):
        with pytest.raises(SparqlError, match="unbound"):
            run_select(
                self._ds(), "SELECT ?nope WHERE { ?d :SYS ?s . }"
            )
