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
