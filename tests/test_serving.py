"""SPARQL serving over the permutation store (quickner_ray.serving)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.serving import (
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
)
from quickner_ray.sinks.triplestore import write_triple_store


@pytest.fixture()
def store(ray_session, tmp_path):
    rows = [
        ("d1", "SYS", "spark"), ("d1", "OP", "join"),
        ("d2", "SYS", "spark"), ("d2", "UNIT", "row"),
        ("d3", "SYS", "flink"), ("d3", "OP", "sort"),
        ("a", "link", "b"), ("b", "link", "c"),
    ]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = str(tmp_path / "store")
    write_triple_store(rd.from_arrow(t), d)
    return d


class TestServing:
    def test_select_with_optional_and_planning(self, store):
        rows = sparql_select(
            store,
            "SELECT ?d ?o WHERE { ?d :SYS :spark . "
            "OPTIONAL { ?d :OP ?o . } }",
        ).take_all()
        assert sorted((r["d"], r["o"]) for r in rows) == [
            ("d1", "join"), ("d2", ""),
        ]

    def test_select_with_path_falls_back_to_base(self, store):
        rows = sparql_select(
            store, "SELECT ?x ?y WHERE { ?x :link+2 ?y . }"
        ).take_all()
        assert sorted((r["x"], r["y"]) for r in rows) == [
            ("a", "b"), ("a", "c"), ("b", "c"),
        ]

    def test_ask_and_construct(self, store):
        assert sparql_ask(store, "ASK { ?d :SYS :flink . }").take_all() == [
            {"ask": 1}
        ]
        out = sparql_construct(
            store,
            "CONSTRUCT { ?s :ALIAS ?d . } WHERE { ?d :SYS ?s . }",
        ).take_all()
        assert sorted((r["subj"], r["obj"]) for r in out) == [
            ("flink", "d3"), ("spark", "d1"), ("spark", "d2"),
        ]

    def test_describe_unions_both_sides(self, store):
        out = sparql_describe(store, "DESCRIBE :spark").take_all()
        assert sorted((r["subj"], r["pred"], r["obj"]) for r in out) == [
            ("d1", "SYS", "spark"), ("d2", "SYS", "spark"),
        ]

    def test_select_matches_stream_evaluation(self, store):
        from quickner_ray.kernel.sparql import run_select

        q = "SELECT ?d ?s WHERE { ?d :SYS ?s . ?d :OP ?o . }"
        served = sorted(
            (r["d"], r["s"]) for r in sparql_select(store, q).take_all()
        )
        base = rd.read_parquet(store + "/spo")
        stream = sorted(
            (r["d"], r["s"]) for r in run_select(base, q).take_all()
        )
        assert served == stream and len(served) == 2


class TestSparqlUpdate:
    """SPARQL 1.1 Update over the LSM store: ground DATA forms plus the
    pattern-template verbs (DELETE WHERE / DELETE..INSERT..WHERE)."""

    def _spo(self, store, pred):
        from quickner_ray.sinks.triplestore import lookup

        return sorted(
            (r["subj"], r["obj"], r["n_mentions"])
            for r in lookup(store, "pred", pred).take_all()
        )

    def test_insert_and_delete_data(self, store):
        from quickner_ray.serving import sparql_update

        n = sparql_update(
            store,
            'INSERT DATA { "d9" :SYS "storm" } ;\n'
            'DELETE DATA { "d3" :SYS "flink" }',
        )
        assert n == 2
        assert self._spo(store, "SYS") == [
            ("d1", "spark", 1), ("d2", "spark", 1), ("d9", "storm", 1),
        ]

    def test_delete_where_shorthand(self, store):
        from quickner_ray.serving import sparql_update

        n = sparql_update(store, "DELETE WHERE { ?d :SYS :spark . }")
        assert n == 2  # d1 and d2 retracted
        assert self._spo(store, "SYS") == [("d3", "flink", 1)]
        # deleting again is a no-op (support already 0)
        assert sparql_update(store, "DELETE WHERE { ?d :SYS :spark . }") == 0

    def test_delete_insert_where_rename_predicate(self, store):
        from quickner_ray.serving import sparql_update

        n = sparql_update(
            store,
            "DELETE { ?d :OP ?o . } INSERT { ?d :OPERATION ?o . } "
            "WHERE { ?d :OP ?o . }",
        )
        assert n == 4  # 2 retractions + 2 inserts
        assert self._spo(store, "OP") == []
        assert self._spo(store, "OPERATION") == [
            ("d1", "join", 1), ("d3", "sort", 1),
        ]

    def test_insert_where_with_filter(self, store):
        from quickner_ray.serving import sparql_update

        n = sparql_update(
            store,
            'INSERT { ?d :FLAGGED "yes" . } WHERE { ?d :SYS ?s . '
            'FILTER (?s = "flink") }',
        )
        assert n == 1
        assert self._spo(store, "FLAGGED") == [("d3", "yes", 1)]

    def test_modify_parse_errors(self, store):
        from quickner_ray.kernel.sparql import SparqlError, parse_update_request
        import pytest as _pytest

        for bad in (
            "DELETE WHERE { ?d :SYS ?s . FILTER (?s = \"x\") }",  # not plain BGP
            "INSERT DATA { \"a\" :p \"b\" } WHERE { ?s ?p ?o . }",  # DATA+WHERE
            "DELETE { ?d :SYS ?x . } WHERE { ?d :OP ?o . }",  # unbound var is
            # caught at execution; parse side: missing WHERE
        )[:2]:
            with _pytest.raises(SparqlError):
                parse_update_request(bad)
        with _pytest.raises(SparqlError):
            parse_update_request("DELETE { ?d :SYS ?s . }")  # no WHERE verb

    def test_load_turtle_document(self, store, tmp_path):
        from quickner_ray.serving import sparql_update

        # the store fixture uses bare terms, so load bare-IRI N-Triples:
        # d1/SYS/spark already has support 1 -> LOAD adds 1 more; the d9
        # triple appears twice -> support 2 on a fresh key
        nt = tmp_path / "extra.nt"
        nt.write_text(
            '<d1> <SYS> <spark> .\n'
            '<d9> <SYS> <storm> .\n'
            '<d9> <SYS> <storm> .\n'
        )
        n = sparql_update(store, f"LOAD <file://{nt}>")
        assert n == 2  # two distinct keys touched
        assert self._spo(store, "SYS") == [
            ("d1", "spark", 2), ("d2", "spark", 1), ("d3", "flink", 1),
            ("d9", "storm", 2),
        ]

    def test_load_mixing_and_errors(self, store, tmp_path):
        from quickner_ray.kernel.sparql import SparqlError, parse_update_request
        from quickner_ray.serving import sparql_update

        with pytest.raises(SparqlError):
            parse_update_request('LOAD <x.ttl> ; INSERT DATA { "a" :p "b" }')
        with pytest.raises(SparqlError):
            parse_update_request("LOAD")
        bad = tmp_path / "x.bin"
        bad.write_text("junk")
        with pytest.raises(ValueError):
            sparql_update(store, f"LOAD <{bad}>")

    def test_clear_all_then_reinsert(self, store):
        from quickner_ray.kernel.sparql import SparqlError, parse_update_request
        from quickner_ray.serving import sparql_update

        n = sparql_update(store, "CLEAR ALL")
        assert n == 8  # every fixture triple retracted
        for pred in ("SYS", "OP", "UNIT", "link"):
            assert self._spo(store, pred) == []
        # the cleared store accepts new data
        assert sparql_update(store, 'INSERT DATA { "x" :SYS "y" }') == 1
        assert self._spo(store, "SYS") == [("x", "y", 1)]
        # clearing the (logically) empty... store retracts just that key
        assert sparql_update(store, "CLEAR") == 1
        assert self._spo(store, "SYS") == []
        assert sparql_update(store, "CLEAR ALL") == 0  # now a no-op
        # CLEAR GRAPH is valid SYNTAX since the quad store landed (r5);
        # the single-graph EXECUTOR is what rejects it now
        assert parse_update_request("CLEAR GRAPH <g>") == ("clear_graph", "g")
        with pytest.raises(SparqlError, match="single-graph"):
            sparql_update(store, "CLEAR GRAPH <g>")

    def test_modify_unbound_template_var_raises(self, store):
        from quickner_ray.kernel.sparql import SparqlError
        from quickner_ray.serving import sparql_update

        with pytest.raises(SparqlError, match="unbound"):
            sparql_update(
                store, "INSERT { ?d :X ?nope . } WHERE { ?d :SYS ?s . }"
            )


@pytest.fixture()
def remote_store(ray_session, tmp_path_factory):
    rows = [
        ("r1", "SYS", "spark"), ("r2", "SYS", "flink"),
        ("r3", "SYS", "flink"),
    ]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = str(tmp_path_factory.mktemp("remote") / "store")
    write_triple_store(rd.from_arrow(t), d)
    return d


class TestFederatedServing:
    def test_select_with_service_over_second_store(self, store, remote_store):
        import os

        rows = sparql_select(
            store,
            "SELECT ?e ?d ?r WHERE { ?d :SYS ?e . "
            "SERVICE :rem { ?r :SYS ?e . } }",
            service_sources={
                "rem": rd.read_parquet(os.path.join(remote_store, "spo"))
            },
        ).take_all()
        got = sorted((r["e"], r["d"], r["r"]) for r in rows)
        assert got == sorted(
            [
                ("spark", "d1", "r1"),
                ("spark", "d2", "r1"),
                ("flink", "d3", "r2"),
                ("flink", "d3", "r3"),
            ]
        )
