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


class TestPathParsing:
    def test_seq_inv_alt(self):
        from quickner_ray.kernel.sparql import parse_path

        assert parse_path("^:A/:B") == ("seq", ("inv", ("pred", "A")), ("pred", "B"))
        assert parse_path(":A|:B/:C") == (
            "alt", ("pred", "A"), ("seq", ("pred", "B"), ("pred", "C"))
        )

    def test_plus_bounds(self):
        from quickner_ray.kernel.sparql import parse_path

        # bare '+' is the unbounded (to-fixpoint) closure, SPARQL 1.1
        assert parse_path(":A+") == ("plus", ("pred", "A"), None)
        assert parse_path(":A*") == ("star", ("pred", "A"), None)
        assert parse_path(":A+3") == ("plus", ("pred", "A"), 3)
        assert parse_path("^:A+2") == ("plus", ("inv", ("pred", "A")), 2)

    def test_pattern_with_path_pred(self):
        q = parse_select("SELECT ?s ?x WHERE { ?s ^:A/:B ?x . }")
        assert q["patterns"] == [
            ("?s", ("seq", ("inv", ("pred", "A")), ("pred", "B")), "?x")
        ]

    @pytest.mark.parametrize(
        "bad", [":A//:B", ":A|", "^:A/", ":A+0", ":+", ":A/^"]
    )
    def test_bad_paths_raise(self, bad):
        from quickner_ray.kernel.sparql import parse_path

        with pytest.raises(SparqlError):
            parse_path(bad)


@pytest.mark.usefixtures("ray_session")
class TestRunSelectPaths:
    # d1: SYS spark, OP join ; d2: SYS spark, UNIT row ; d3: SYS flink, OP sort
    def _ds(self):
        return rd.from_arrow(T)

    def test_path_pattern_end_to_end(self):
        out = run_select(
            self._ds(), "SELECT ?s ?x WHERE { ?s ^:SYS/:OP ?x . }"
        ).take_all()
        assert sorted((r["s"], r["x"]) for r in out) == [
            ("flink", "sort"),
            ("spark", "join"),
        ]

    def test_path_joins_with_simple_pattern(self):
        out = run_select(
            self._ds(),
            "SELECT ?s ?x ?d WHERE { ?s ^:SYS/:OP ?x . ?d :SYS ?s . }",
        ).take_all()
        # spark is mentioned by d1 AND d2; flink only by d3
        assert sorted((r["s"], r["x"], r["d"]) for r in out) == [
            ("flink", "sort", "d3"),
            ("spark", "join", "d1"),
            ("spark", "join", "d2"),
        ]

    def test_closure_in_query(self):
        edges = rd.from_arrow(
            pa.table(
                {
                    "subj": ["a", "b", "c"],
                    "pred": ["link", "link", "link"],
                    "obj": ["b", "c", "d"],
                }
            )
        )
        out = run_select(
            edges, "SELECT ?x ?y WHERE { ?x :link+2 ?y . }"
        ).take_all()
        assert sorted((r["x"], r["y"]) for r in out) == [
            ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
        ]

    def test_constant_endpoint_on_path_raises(self):
        with pytest.raises(ValueError, match="variable endpoints"):
            run_select(
                self._ds(), 'SELECT ?x WHERE { :spark ^:SYS/:OP ?x . }'
            ).take_all()


@pytest.mark.usefixtures("ray_session")
class TestAggregationAndModifiers:
    def _ds(self):
        return rd.from_arrow(T)

    def test_group_count_solutions_and_distinct(self):
        # per system: solutions (doc x op combos) and distinct docs
        t = pa.table(
            {
                "subj": ["d1", "d1", "d1", "d2", "d2", "d3", "d3"],
                "pred": ["SYS", "OP", "OP", "SYS", "OP", "SYS", "OP"],
                "obj": ["spark", "join", "sort", "spark", "join", "flink", "sort"],
            }
        )
        out = run_select(
            rd.from_arrow(t),
            "SELECT ?s (COUNT(?o) AS ?n) (COUNT(DISTINCT ?d) AS ?nd) "
            "WHERE { ?d :SYS ?s . ?d :OP ?o . } GROUP BY ?s",
        ).take_all()
        got = {r["s"]: (r["n"], r["nd"]) for r in out}
        assert got == {"spark": (3, 2), "flink": (1, 1)}

    def test_order_by_desc_and_limit(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?s WHERE { ?d :SYS ?s . } ORDER BY DESC(?d) LIMIT 2",
        ).take_all()
        assert [(r["d"], r["s"]) for r in out] == [
            ("d3", "flink"),
            ("d2", "spark"),
        ]

    def test_order_by_after_group(self):
        out = run_select(
            self._ds(),
            "SELECT ?s (COUNT(?d) AS ?n) WHERE { ?d :SYS ?s . } "
            "GROUP BY ?s ORDER BY ?s",
        ).take_all()
        assert [(r["s"], r["n"]) for r in out] == [("flink", 1), ("spark", 2)]

    @pytest.mark.parametrize(
        "bad",
        [
            # non-aggregate var mixed with an aggregate needs GROUP BY
            "SELECT ?s (COUNT(?d) AS ?n) WHERE { ?d :SYS ?s . }",
            "SELECT ?o (COUNT(?d) AS ?n) WHERE { ?d :SYS ?o . ?d :OP ?x . } GROUP BY ?x",  # non-grouped var
            "SELECT (MEDIAN(?d) AS ?n) WHERE { ?d :SYS ?s . } GROUP BY ?s",
            "SELECT ?s WHERE { ?d :SYS ?s . } LIMIT many",  # bad limit
            "SELECT ?s WHERE { ?d :SYS ?s . } ORDER BY",  # empty order
            "SELECT * WHERE { ?d :SYS ?s . } GROUP BY ?s",  # * grouped
        ],
    )
    def test_bad_aggregation_raises(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad)


@pytest.mark.usefixtures("ray_session")
class TestConstructAndAsk:
    def _ds(self):
        return rd.from_arrow(T)

    def test_construct_instantiates_templates(self):
        from quickner_ray.kernel.sparql import run_construct

        out = run_construct(
            self._ds(),
            "CONSTRUCT { ?s :CO ?x . ?x :CO_INV ?s . } "
            "WHERE { ?s ^:SYS/:OP ?x . }",
        ).take_all()
        got = sorted((r["subj"], r["pred"], r["obj"]) for r in out)
        assert got == [
            ("flink", "CO", "sort"),
            ("join", "CO_INV", "spark"),
            ("sort", "CO_INV", "flink"),
            ("spark", "CO", "join"),
        ]

    def test_construct_constant_terms_and_dedup(self):
        from quickner_ray.kernel.sparql import run_construct

        out = run_construct(
            self._ds(),
            'CONSTRUCT { ?d :TYPE "page" . } WHERE { ?d :SYS ?s . }',
        ).take_all()
        assert sorted(r["subj"] for r in out) == ["d1", "d2", "d3"]
        assert {r["pred"] for r in out} == {"TYPE"}
        assert {r["obj"] for r in out} == {"page"}

    def test_construct_unbound_template_var_raises(self):
        from quickner_ray.kernel.sparql import run_construct

        with pytest.raises(SparqlError, match="unbound variable"):
            run_construct(
                self._ds(), "CONSTRUCT { ?z :P ?d . } WHERE { ?d :SYS ?s . }"
            )

    def test_ask_true_and_false(self):
        from quickner_ray.kernel.sparql import run_ask

        yes = run_ask(self._ds(), "ASK { ?d :SYS :spark . ?d :OP ?o . }")
        no = run_ask(self._ds(), "ASK { ?d :SYS :spark . ?d :UNIT :nope . }")
        assert yes.take_all() == [{"ask": 1}]
        assert no.take_all() == [{"ask": 0}]

    def test_ask_with_not_exists(self):
        from quickner_ray.kernel.sparql import run_ask

        out = run_ask(
            self._ds(),
            "ASK { ?d :SYS ?s . FILTER NOT EXISTS { ?d :OP ?o . } }",
        )
        assert out.take_all() == [{"ask": 1}]  # d2 has SYS but no OP


@pytest.mark.usefixtures("ray_session")
class TestValuesAndDescribe:
    def _ds(self):
        return rd.from_arrow(T)

    def test_values_restricts_bindings(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?s WHERE { ?d :SYS ?s . VALUES ?s { :spark } }",
        ).take_all()
        assert sorted((r["d"], r["s"]) for r in out) == [
            ("d1", "spark"),
            ("d2", "spark"),
        ]

    def test_values_applies_to_ask_and_construct(self):
        from quickner_ray.kernel.sparql import run_ask, run_construct

        no = run_ask(
            self._ds(), "ASK { ?d :SYS ?s . VALUES ?s { :nope } }"
        ).take_all()
        assert no == [{"ask": 0}]
        tri = run_construct(
            self._ds(),
            "CONSTRUCT { ?d :HAS ?s . } WHERE { ?d :SYS ?s . "
            "VALUES ?s { :flink } }",
        ).take_all()
        assert [(r["subj"], r["obj"]) for r in tri] == [("d3", "flink")]

    def test_values_multiple_constants(self):
        out = run_select(
            self._ds(),
            'SELECT ?d WHERE { ?d :SYS ?s . VALUES ?s { :flink "spark" } }',
        ).take_all()
        assert sorted(r["d"] for r in out) == ["d1", "d2", "d3"]

    @pytest.mark.parametrize(
        "bad",
        [
            "SELECT ?d WHERE { ?d :SYS ?s . VALUES ?x { :a } }",  # unbound
            "SELECT ?d WHERE { ?d :SYS ?s . VALUES ?s { } }",  # empty
            "SELECT ?d WHERE { ?d :SYS ?s . VALUES ?s { ?v } }",  # var row
            "SELECT ?d WHERE { ?d :SYS ?s . VALUES { :a } }",  # no var
        ],
    )
    def test_bad_values_raise(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad).take_all()

    def test_describe_subject_and_object_sides(self):
        from quickner_ray.kernel.sparql import run_describe

        out = run_describe(self._ds(), "DESCRIBE :spark").take_all()
        assert sorted((r["subj"], r["pred"], r["obj"]) for r in out) == [
            ("d1", "SYS", "spark"),
            ("d2", "SYS", "spark"),
        ]
        docside = run_describe(self._ds(), "DESCRIBE :d1").take_all()
        assert sorted((r["pred"], r["obj"]) for r in docside) == [
            ("OP", "join"),
            ("SYS", "spark"),
        ]

    def test_describe_rejects_variables(self):
        from quickner_ray.kernel.sparql import run_describe

        with pytest.raises(SparqlError, match="constant"):
            run_describe(self._ds(), "DESCRIBE ?x")


@pytest.mark.usefixtures("ray_session")
class TestUnionAndMinus:
    def _ds(self):
        return rd.from_arrow(T)

    def test_union_of_two_groups(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?e WHERE { { ?d :OP ?e . } UNION { ?d :UNIT ?e . } }",
        ).take_all()
        assert sorted((r["d"], r["e"]) for r in out) == [
            ("d1", "join"),
            ("d2", "row"),
            ("d3", "sort"),
        ]

    def test_union_dedups_across_branches(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?e WHERE { { ?d :SYS ?e . } UNION { ?d :SYS ?e . } }",
        ).take_all()
        assert len(out) == 3

    def test_three_way_union_and_values(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?e WHERE { { ?d :OP ?e . } UNION { ?d :UNIT ?e . } "
            "UNION { ?d :SYS ?e . } VALUES ?d { :d2 } }",
        ).take_all()
        assert sorted((r["d"], r["e"]) for r in out) == [
            ("d2", "row"),
            ("d2", "spark"),
        ]

    def test_minus_is_anti_join(self):
        out = run_select(
            self._ds(),
            "SELECT ?d ?s WHERE { ?d :SYS ?s . MINUS { ?d :OP ?o . } }",
        ).take_all()
        assert [(r["d"], r["s"]) for r in out] == [("d2", "spark")]

    @pytest.mark.parametrize(
        "bad",
        [
            # branches bind different variables
            "SELECT ?d WHERE { { ?d :OP ?e . } UNION { ?d :UNIT ?u . } }",
            # bare group without UNION
            "SELECT ?d WHERE { { ?d :OP ?e . } }",
            # mixing UNION with a top-level pattern
            "SELECT ?d WHERE { { ?d :OP ?e . } UNION { ?d :UNIT ?e . } ?d :SYS ?s . }",
            # OPTIONAL alongside UNION
            "SELECT ?d WHERE { { ?d :OP ?e . } UNION { ?d :UNIT ?e . } OPTIONAL { ?d :SYS ?s . } }",
        ],
    )
    def test_bad_union_raises(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad).take_all()


@pytest.mark.usefixtures("ray_session")
class TestFilterExpressions:
    def _ds(self):
        return rd.from_arrow(T)

    def test_filter_regex(self):
        out = run_select(
            self._ds(),
            'SELECT ?d ?e WHERE { ?d :OP ?e . FILTER regex(?e, "^s") }',
        ).take_all()
        assert [(r["d"], r["e"]) for r in out] == [("d3", "sort")]

    def test_filter_eq_and_ne(self):
        eq = run_select(
            self._ds(),
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER ( ?s = :spark ) }",
        ).take_all()
        assert sorted(r["d"] for r in eq) == ["d1", "d2"]
        ne = run_select(
            self._ds(),
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER ( ?s != :spark ) }",
        ).take_all()
        assert [r["d"] for r in ne] == ["d3"]

    def test_filter_quoted_rhs_and_stacking(self):
        out = run_select(
            self._ds(),
            'SELECT ?d ?s WHERE { ?d :SYS ?s . '
            'FILTER regex(?s, "k$") FILTER ( ?d != "d2" ) }',
        ).take_all()
        assert sorted((r["d"], r["s"]) for r in out) == [
            ("d1", "spark"),
            ("d3", "flink"),
        ]

    @pytest.mark.parametrize(
        "bad",
        [
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER regex(?s) }",
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER ( ?s < :a ) }",
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER ( ?s = ) }",
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER regex(?x, \"a\") }",
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER bound(?s) }",
        ],
    )
    def test_bad_filters_raise(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad).take_all()


@pytest.mark.usefixtures("ray_session")
class TestHavingOffsetNumeric:
    def _ds(self):
        # numeric-string subjects for the numeric FILTER arm
        return rd.from_arrow(
            pa.table(
                {
                    "subj": ["1", "1", "1", "2", "2", "10", "10"],
                    "pred": ["OP", "OP", "OP", "OP", "SYS", "OP", "OP"],
                    "obj": ["a", "b", "c", "a", "spark", "a", "b"],
                }
            )
        )

    def test_having_reuses_select_aggregate(self):
        out = run_select(
            self._ds(),
            "SELECT ?d (COUNT(?o) AS ?n) WHERE { ?d :OP ?o . } "
            "GROUP BY ?d HAVING ( COUNT ( ?o ) >= 2 )",
        ).take_all()
        assert {r["d"]: r["n"] for r in out} == {"1": 3, "10": 2}

    def test_having_hidden_aggregate(self):
        # the HAVING aggregate (DISTINCT) is absent from SELECT: computed
        # hidden, filtered on, then dropped from the output
        out = run_select(
            self._ds(),
            "SELECT ?d (COUNT(?o) AS ?n) WHERE { ?d :OP ?o . } "
            "GROUP BY ?d HAVING ( COUNT ( DISTINCT ?o ) < 3 )",
        ).take_all()
        assert {r["d"]: r["n"] for r in out} == {"2": 1, "10": 2}
        assert set(out[0].keys()) == {"d", "n"}

    def test_numeric_filter_casts(self):
        # lexicographically "10" < "2"; numerically it is not
        out = run_select(
            self._ds(),
            "SELECT ?d WHERE { ?d :OP ?o . FILTER ( ?d <= 2 ) }",
        ).take_all()
        assert sorted(r["d"] for r in out) == ["1", "2"]
        out = run_select(
            self._ds(),
            "SELECT ?d WHERE { ?d :OP ?o . FILTER ( ?d > 5 ) }",
        ).take_all()
        assert [r["d"] for r in out] == ["10"]

    def test_offset_pages_the_sorted_stream(self):
        q = "SELECT ?d ?o WHERE { ?d :OP ?o . } ORDER BY ?d ?o"
        full = [(r["d"], r["o"]) for r in run_select(self._ds(), q).take_all()]
        page = [
            (r["d"], r["o"])
            for r in run_select(
                self._ds(), q + " LIMIT 3 OFFSET 2"
            ).take_all()
        ]
        assert page == full[2:5]

    @pytest.mark.parametrize(
        "bad",
        [
            # OFFSET without ORDER BY
            "SELECT ?d WHERE { ?d :OP ?o . } OFFSET 2",
            # HAVING without GROUP BY
            "SELECT ?d WHERE { ?d :OP ?o . } HAVING ( COUNT ( ?o ) > 1 )",
            # non-integer comparisons
            "SELECT ?d (COUNT(?o) AS ?n) WHERE { ?d :OP ?o . } "
            "GROUP BY ?d HAVING ( COUNT ( ?o ) > x )",
            "SELECT ?d WHERE { ?d :OP ?o . } ORDER BY ?d OFFSET x",
            # numeric FILTER against a non-number
            "SELECT ?d WHERE { ?d :OP ?o . FILTER ( ?d < :abc ) }",
            # HAVING non-COUNT
            "SELECT ?d (COUNT(?o) AS ?n) WHERE { ?d :OP ?o . } "
            "GROUP BY ?d HAVING ( SUM ( ?o ) > 1 )",
        ],
    )
    def test_bad_modifiers_raise(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad).take_all()


NUM = pa.table(
    {
        "subj": ["d1", "d1", "d2", "d2", "d3", "d4"],
        "pred": ["SYS", "N", "SYS", "N", "SYS", "N"],
        "obj": ["spark", "10", "spark", "4", "flink", "7"],
    }
)


@pytest.mark.usefixtures("ray_session")
class TestAggregateSet:
    """SPARQL 1.1 aggregates beyond COUNT: MIN/MAX/SUM/AVG/SAMPLE/
    GROUP_CONCAT with the pinned determinism contract (SAMPLE == MIN,
    GROUP_CONCAT sorted ascending, SUM/AVG int64-exact)."""

    def _ds(self, t=T):
        return rd.from_arrow(t)

    def test_parse_full_set_and_separator(self):
        q = parse_select(
            "SELECT ?s (SUM(DISTINCT ?n) AS ?sm) "
            '(GROUP_CONCAT(?o ; SEPARATOR= "|") AS ?cat) '
            "WHERE { ?d :SYS ?s . ?d :N ?n . ?d :OP ?o . } GROUP BY ?s"
        )
        assert q["aggs"][0] == {
            "fn": "sum", "var": "n", "distinct": True, "alias": "sm",
            "sep": ",",
        }
        assert q["aggs"][1]["fn"] == "group_concat"
        assert q["aggs"][1]["sep"] == "|"

    @pytest.mark.parametrize(
        "bad",
        [
            "SELECT (MEDIAN(?o) AS ?m) WHERE { ?d :OP ?o . } GROUP BY ?d",
            # SEPARATOR outside GROUP_CONCAT
            'SELECT (SUM(?o ; SEPARATOR= ",") AS ?m) '
            "WHERE { ?d :OP ?o . } GROUP BY ?d",
            # unquoted separator
            "SELECT (GROUP_CONCAT(?o ; SEPARATOR= x) AS ?m) "
            "WHERE { ?d :OP ?o . } GROUP BY ?d",
        ],
    )
    def test_parse_rejects(self, bad):
        with pytest.raises(SparqlError):
            parse_select(bad)

    def test_min_max_sample_concat(self):
        rows = run_select(
            self._ds(),
            "SELECT ?s (MIN(?d) AS ?mn) (MAX(?d) AS ?mx) "
            "(SAMPLE(?d) AS ?sp) (GROUP_CONCAT(?d) AS ?cat) "
            "WHERE { ?d :SYS ?s . } GROUP BY ?s ORDER BY ?s",
        ).take_all()
        assert rows == [
            {"s": "flink", "mn": "d3", "mx": "d3", "sp": "d3", "cat": "d3"},
            {"s": "spark", "mn": "d1", "mx": "d2", "sp": "d1",
             "cat": "d1,d2"},
        ]

    def test_sum_avg_exact(self):
        rows = run_select(
            self._ds(NUM),
            "SELECT ?s (SUM(?n) AS ?sm) (AVG(?n) AS ?av) "
            "WHERE { ?d :SYS ?s . ?d :N ?n . } GROUP BY ?s",
        ).take_all()
        by = {r["s"]: r for r in rows}
        assert by["spark"]["sm"] == 14 and by["spark"]["av"] == 7.0
        assert set(by) == {"spark"}  # d3/flink has no :N; d4 has no :SYS

    def test_sum_distinct_and_concat_distinct(self):
        # two docs share n=5: DISTINCT collapses it once
        t = pa.table(
            {
                "subj": ["a", "a", "b", "b"],
                "pred": ["SYS", "N", "SYS", "N"],
                "obj": ["s", "5", "s", "5"],
            }
        )
        rows = run_select(
            self._ds(t),
            "SELECT ?s (SUM(?n) AS ?all) (SUM(DISTINCT ?n) AS ?ds) "
            "(GROUP_CONCAT(DISTINCT ?n) AS ?cat) "
            "WHERE { ?d :SYS ?s . ?d :N ?n . } GROUP BY ?s",
        ).take_all()
        assert rows == [{"s": "s", "all": 10, "ds": 5, "cat": "5"}]

    def test_sum_non_integer_fails_loudly(self):
        with pytest.raises(Exception):
            run_select(
                self._ds(),
                "SELECT ?s (SUM(?d) AS ?sm) WHERE { ?d :SYS ?s . } "
                "GROUP BY ?s",
            ).take_all()

    def test_group_concat_custom_separator_and_having(self):
        rows = run_select(
            self._ds(),
            'SELECT ?s (GROUP_CONCAT(?d ; SEPARATOR= "|") AS ?cat) '
            "WHERE { ?d :SYS ?s . } GROUP BY ?s "
            "HAVING ( COUNT ( ?d ) > 1 )",
        ).take_all()
        assert rows == [{"s": "spark", "cat": "d1|d2"}]


@pytest.mark.usefixtures("ray_session")
class TestBindAndExpressionFilters:
    """BIND value expressions and the FILTER expression grammar
    (boolean && || !, string functions, numeric casts)."""

    def _ds(self, t=T):
        return rd.from_arrow(t)

    def test_bind_concat_and_strlen(self):
        rows = run_select(
            self._ds(),
            'SELECT ?d ?tag ?len WHERE { ?d :SYS ?s . '
            'BIND ( CONCAT(?s, "-", ?d) AS ?tag ) '
            "BIND ( STRLEN(?s) AS ?len ) } ORDER BY ?d",
        ).take_all()
        assert rows == [
            {"d": "d1", "tag": "spark-d1", "len": "5"},
            {"d": "d2", "tag": "spark-d2", "len": "5"},
            {"d": "d3", "tag": "flink-d3", "len": "5"},
        ]

    def test_bind_ucase_lcase_substr(self):
        rows = run_select(
            self._ds(),
            "SELECT ?u ?c WHERE { ?d :SYS ?s . "
            "BIND ( UCASE(?s) AS ?u ) BIND ( SUBSTR(?s, 2, 3) AS ?c ) }",
        ).take_all()
        assert sorted((r["u"], r["c"]) for r in rows) == [
            ("FLINK", "lin"), ("SPARK", "par"),
        ]

    def test_filter_on_bind_var_numeric(self):
        # STRLEN bind is a numeric string; numeric FILTER casts it back
        rows = run_select(
            self._ds(),
            "SELECT ?d WHERE { ?d :SYS ?s . ?d :OP ?o . "
            "BIND ( STRLEN(?o) AS ?len ) FILTER ( ?len >= 4 ) }",
        ).take_all()
        assert sorted(r["d"] for r in rows) == ["d1", "d3"]

    def test_filter_boolean_combinators(self):
        q = ("SELECT ?d WHERE { ?d :SYS ?s . "
             "FILTER ( ?s = :spark || ?d = :d3 ) }")
        assert sorted(
            r["d"] for r in run_select(self._ds(), q).take_all()
        ) == ["d1", "d2", "d3"]
        q = ("SELECT ?d WHERE { ?d :SYS ?s . "
             "FILTER ( ?s = :spark && ! ( ?d = :d1 ) ) }")
        assert [r["d"] for r in run_select(self._ds(), q).take_all()] == ["d2"]

    def test_filter_string_functions(self):
        q = 'SELECT ?d WHERE { ?d :SYS ?s . FILTER strStarts(?s, "sp") }'
        assert sorted(
            r["d"] for r in run_select(self._ds(), q).take_all()
        ) == ["d1", "d2"]
        q = 'SELECT ?d WHERE { ?d :SYS ?s . FILTER strEnds(?s, "ink") }'
        assert [r["d"] for r in run_select(self._ds(), q).take_all()] == ["d3"]
        q = ('SELECT ?d WHERE { ?d :SYS ?s . '
             'FILTER ( contains(?s, "lin") || STRLEN(?d) > 99 ) }')
        assert [r["d"] for r in run_select(self._ds(), q).take_all()] == ["d3"]

    def test_filter_var_to_var_compare(self):
        t = pa.table(
            {
                "subj": ["x", "x", "y", "y"],
                "pred": ["A", "B", "A", "B"],
                "obj": ["1", "1", "1", "2"],
            }
        )
        q = "SELECT ?d WHERE { ?d :A ?a . ?d :B ?b . FILTER ( ?a = ?b ) }"
        assert [r["d"] for r in run_select(self._ds(t), q).take_all()] == ["x"]

    def test_bind_then_group_by(self):
        rows = run_select(
            self._ds(),
            "SELECT ?L (COUNT(?d) AS ?n) WHERE { ?d :SYS ?s . "
            "BIND ( UCASE(?s) AS ?L ) } GROUP BY ?L",
        ).take_all()
        assert {r["L"]: r["n"] for r in rows} == {"SPARK": 2, "FLINK": 1}

    @pytest.mark.parametrize(
        "bad",
        [
            # BIND of an unbound source variable
            "SELECT ?d WHERE { ?d :SYS ?s . BIND ( UCASE(?x) AS ?u ) }",
            # BIND target already bound
            "SELECT ?d WHERE { ?d :SYS ?s . BIND ( UCASE(?s) AS ?s ) }",
            # duplicate BIND target
            "SELECT ?d WHERE { ?d :SYS ?s . BIND ( UCASE(?s) AS ?u ) "
            "BIND ( LCASE(?s) AS ?u ) }",
            # missing AS
            "SELECT ?d WHERE { ?d :SYS ?s . BIND ( UCASE(?s) ?u ) }",
            # SUBSTR with 0 start (SPARQL is 1-based)
            "SELECT ?d WHERE { ?d :SYS ?s . BIND ( SUBSTR(?s, 0) AS ?u ) }",
            # unknown value function
            "SELECT ?d WHERE { ?d :SYS ?s . BIND ( TRIM(?s) AS ?u ) }",
            # regex pattern must be constant
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER regex(?s, ?d) }",
        ],
    )
    def test_bad_bind_and_filters_raise(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad).take_all()


@pytest.mark.usefixtures("ray_session")
class TestImplicitGroupAggregates:
    """SPARQL 1.1 aggregates WITHOUT GROUP BY: the whole solution set is
    one implicit group -> one-row result."""

    def _ds(self, t=T):
        return rd.from_arrow(t)

    def test_global_count_min_max(self):
        rows = run_select(
            self._ds(),
            "SELECT (COUNT(?d) AS ?n) (COUNT(DISTINCT ?s) AS ?ns) "
            "(MIN(?s) AS ?mn) (MAX(?s) AS ?mx) "
            "WHERE { ?d :SYS ?s . }",
        ).take_all()
        assert rows == [{"n": 3, "ns": 2, "mn": "flink", "mx": "spark"}]

    def test_global_sum_avg_concat(self):
        rows = run_select(
            self._ds(NUM),
            "SELECT (SUM(?n) AS ?sm) (AVG(?n) AS ?av) "
            "(GROUP_CONCAT(?n) AS ?cat) WHERE { ?d :N ?n . }",
        ).take_all()
        assert rows == [{"sm": 21, "av": 7.0, "cat": "10,4,7"}]

    def test_empty_solutions_pin_defaults(self):
        rows = run_select(
            self._ds(),
            "SELECT (COUNT(?z) AS ?n) (MIN(?z) AS ?mn) (SUM(?z) AS ?sm) "
            "(AVG(?z) AS ?av) WHERE { ?d :NOPE ?z . }",
        ).take_all()
        assert rows == [{"n": 0, "mn": "", "sm": 0, "av": 0.0}]

    def test_mixed_projection_still_needs_group_by(self):
        with pytest.raises(SparqlError, match="GROUP BY"):
            run_select(
                self._ds(),
                "SELECT ?s (COUNT(?d) AS ?n) WHERE { ?d :SYS ?s . }",
            )


@pytest.mark.usefixtures("ray_session")
class TestGraphGroups:
    """GRAPH ?g / GRAPH :name over quad streams."""

    def _quads(self):
        return rd.from_arrow(
            pa.table(
                {
                    "subj": ["d1", "d1", "d2", "d2", "d3"],
                    "pred": ["SYS", "OP", "SYS", "OP", "SYS"],
                    "obj": ["spark", "join", "spark", "sort", "flink"],
                    "graph": ["g1", "g1", "g2", "g2", "g1"],
                }
            )
        )

    def test_graph_variable_binds_and_groups(self):
        rows = run_select(
            self._quads(),
            "SELECT ?g (COUNT(?d) AS ?n) WHERE { "
            "GRAPH ?g { ?d :SYS ?s . } } GROUP BY ?g",
        ).take_all()
        assert {r["g"]: r["n"] for r in rows} == {"g1": 2, "g2": 1}

    def test_graph_constant_restricts(self):
        rows = run_select(
            self._quads(),
            "SELECT ?d ?o WHERE { GRAPH :g2 { ?d :SYS :spark . } "
            "?d :OP ?o . }",
        ).take_all()
        assert [(r["d"], r["o"]) for r in rows] == [("d2", "sort")]

    def test_parse_shape(self):
        q = parse_select(
            "SELECT ?d WHERE { GRAPH ?g { ?d :A ?x . ?d :B ?y . } }"
        )
        assert q["patterns"] == [
            ("?d", "A", "?x", "?g"), ("?d", "B", "?y", "?g"),
        ]
        q = parse_select('SELECT ?d WHERE { GRAPH :g9 { ?d :A ?x . } }')
        assert q["patterns"] == [("?d", "A", "?x", "g9")]

    @pytest.mark.parametrize(
        "bad",
        [
            "SELECT ?d WHERE { GRAPH { ?d :A ?x . } }",
            "SELECT ?d WHERE { GRAPH ?g ?d :A ?x . }",
            "SELECT ?d WHERE { GRAPH ?g { ?d :A+2 ?x . } }",  # path inside
        ],
    )
    def test_bad_graph_raises(self, bad):
        with pytest.raises(SparqlError):
            parse_select(bad)


@pytest.mark.usefixtures("ray_session")
class TestSubqueries:
    """{ SELECT ... } inside WHERE: independent evaluation, joined to the
    outer group on shared variables, results as string terms."""

    def _ds(self, t=T):
        return rd.from_arrow(t)

    def test_aggregate_subquery_joins_outer(self):
        # docs of systems that are mentioned by >= 2 docs
        t = pa.table(
            {
                "subj": ["d1", "d2", "d3", "d1", "d3"],
                "pred": ["SYS", "SYS", "SYS", "OP", "OP"],
                "obj": ["spark", "spark", "flink", "join", "sort"],
            }
        )
        rows = run_select(
            self._ds(t),
            "SELECT ?d ?s ?n WHERE { ?d :SYS ?s . "
            "{ SELECT ?s (COUNT(?x) AS ?n) WHERE { ?x :SYS ?s . } "
            "GROUP BY ?s } }",
        ).take_all()
        got = sorted((r["d"], r["s"], r["n"]) for r in rows)
        # aggregate column re-enters as a string term
        assert got == [
            ("d1", "spark", "2"), ("d2", "spark", "2"),
            ("d3", "flink", "1"),
        ]

    def test_subquery_only_where(self):
        rows = run_select(
            self._ds(),
            "SELECT ?s ?n WHERE { { SELECT ?s (COUNT(?d) AS ?n) "
            "WHERE { ?d :SYS ?s . } GROUP BY ?s } }",
        ).take_all()
        assert sorted((r["s"], r["n"]) for r in rows) == [
            ("flink", "1"), ("spark", "2"),
        ]

    def test_filter_on_subquery_column(self):
        rows = run_select(
            self._ds(),
            "SELECT ?d WHERE { ?d :SYS ?s . "
            "{ SELECT ?s (COUNT(?x) AS ?n) WHERE { ?x :SYS ?s . } "
            "GROUP BY ?s } FILTER ( ?n >= 2 ) }",
        ).take_all()
        assert sorted(r["d"] for r in rows) == ["d1", "d2"]

    def test_select_star_subquery(self):
        rows = run_select(
            self._ds(),
            "SELECT ?d ?o WHERE { ?d :OP ?o . "
            "{ SELECT * WHERE { ?d :SYS :spark . } } }",
        ).take_all()
        assert [(r["d"], r["o"]) for r in rows] == [("d1", "join")]

    @pytest.mark.parametrize(
        "bad",
        [
            # no shared variable
            "SELECT ?d WHERE { ?d :OP ?o . "
            "{ SELECT ?z WHERE { ?z :SYS ?w . } } }",
            # unterminated subquery
            "SELECT ?d WHERE { ?d :OP ?o . { SELECT ?d WHERE { ?d :SYS ?s . }",
            # inner syntax error surfaces at parse time
            "SELECT ?d WHERE { ?d :OP ?o . { SELECT WHERE { ?d :SYS ?s . } } }",
            # OPTIONAL with subquery-only WHERE
            "SELECT ?s WHERE { { SELECT ?s WHERE { ?d :SYS ?s . } } "
            "OPTIONAL { ?s :X ?y . } }",
        ],
    )
    def test_bad_subqueries_raise(self, bad):
        with pytest.raises(SparqlError):
            run_select(self._ds(), bad).take_all()


@pytest.mark.usefixtures("ray_session")
class TestFilterExists:
    """FILTER EXISTS { }: positive semi-join on shared variables."""

    def _ds(self, t=T):
        return rd.from_arrow(t)

    def test_exists_keeps_matching_bindings(self):
        rows = run_select(
            self._ds(),
            "SELECT ?d ?s WHERE { ?d :SYS ?s . "
            "FILTER EXISTS { ?d :OP ?o . } }",
        ).take_all()
        assert sorted((r["d"], r["s"]) for r in rows) == [
            ("d1", "spark"), ("d3", "flink"),
        ]

    def test_exists_vars_never_join_output(self):
        q = parse_select(
            "SELECT ?d WHERE { ?d :SYS ?s . FILTER EXISTS { ?d :OP ?o . } }"
        )
        assert q["exists"] == [("?d", "OP", "?o")]
        rows = run_select(
            self._ds(),
            "SELECT * WHERE { ?d :SYS ?s . FILTER EXISTS { ?d :OP ?o . } }",
        ).take_all()
        assert set(rows[0].keys()) == {"d", "s"}  # no ?o column

    def test_exists_and_not_exists_stack(self):
        t = pa.table(
            {
                "subj": ["d1", "d1", "d2", "d2", "d3"],
                "pred": ["A", "B", "A", "C", "A"],
                "obj": ["x", "y", "x", "z", "x"],
            }
        )
        rows = run_select(
            self._ds(t),
            "SELECT ?d WHERE { ?d :A :x . "
            "FILTER EXISTS { ?d :B ?b . } "
            "FILTER NOT EXISTS { ?d :C ?c . } }",
        ).take_all()
        assert [r["d"] for r in rows] == ["d1"]

    def test_exists_needs_required_patterns(self):
        with pytest.raises(SparqlError):
            run_select(
                self._ds(),
                "SELECT ?s WHERE { { SELECT ?s WHERE { ?d :SYS ?s . } } "
                "FILTER EXISTS { ?s :X ?y . } }",
            )


REMOTE_T = pa.table(
    {
        "subj": ["r1", "r2", "r3", "r4"],
        "pred": ["SYS", "SYS", "SYS", "OP"],
        "obj": ["spark", "spark", "flink", "join"],
    }
)


@pytest.mark.usefixtures("ray_session")
class TestService:
    def _local(self):
        return rd.from_arrow(T)

    def _remote(self):
        return rd.from_arrow(REMOTE_T)

    def test_parse_service(self):
        q = parse_select(
            "SELECT ?e WHERE { ?d :SYS ?e . SERVICE :rem { ?r :SYS ?e . } }"
        )
        assert q["services"] == [
            {"endpoint": "rem", "patterns": [("?r", "SYS", "?e")]}
        ]

    def test_service_joins_on_shared_var(self):
        out = run_select(
            self._local(),
            "SELECT ?e ?d ?r WHERE { ?d :SYS ?e . "
            "SERVICE :rem { ?r :SYS ?e . } }",
            service_sources={"rem": self._remote()},
        ).take_all()
        got = sorted((r["e"], r["d"], r["r"]) for r in out)
        assert got == sorted(
            [
                ("spark", "d1", "r1"),
                ("spark", "d1", "r2"),
                ("spark", "d2", "r1"),
                ("spark", "d2", "r2"),
                ("flink", "d3", "r3"),
            ]
        )

    def test_service_with_aggregate(self):
        out = run_select(
            self._local(),
            "SELECT ?e (COUNT(?d) AS ?n) WHERE { ?d :SYS ?e . "
            "SERVICE :rem { ?r :SYS ?e . } } GROUP BY ?e",
            service_sources={"rem": self._remote()},
        ).take_all()
        assert sorted((r["e"], r["n"]) for r in out) == [
            ("flink", 1),
            ("spark", 4),
        ]

    def test_missing_service_source_raises(self):
        with pytest.raises(SparqlError, match="service_sources"):
            run_select(
                self._local(),
                "SELECT ?e WHERE { ?d :SYS ?e . SERVICE :x { ?r :SYS ?e . } }",
                service_sources={"rem": self._remote()},
            )

    def test_no_shared_variable_raises(self):
        with pytest.raises(SparqlError, match="shares no variable"):
            run_select(
                self._local(),
                "SELECT ?d WHERE { ?d :SYS :spark . "
                "SERVICE :rem { ?r :OP ?o . } }",
                service_sources={"rem": self._remote()},
            )

    def test_variable_endpoint_rejected(self):
        with pytest.raises(SparqlError, match="endpoint"):
            parse_select(
                "SELECT ?d WHERE { ?d :SYS ?e . SERVICE ?ep { ?r :SYS ?e . } }"
            )
