"""Named-graph quad store: per-graph permutation subtrees, graph-scoped
SPARQL UPDATE verbs, union-default reads (sinks/quadstore.py +
serving.quad_update/quad_select)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _quads(ray_session, rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], type=pa.string()),
                "pred": pa.array([r[1] for r in rows], type=pa.string()),
                "obj": pa.array([r[2] for r in rows], type=pa.string()),
                "graph": pa.array([r[3] for r in rows], type=pa.string()),
            }
        )
    )


ROWS = [
    ("d1", "SYSTEM", "spark", "gA"),
    ("d1", "SYSTEM", "spark", "gA"),  # support 2
    ("d1", "OPERATOR", "join", "gA"),
    ("d2", "SYSTEM", "flink", "gB"),
    ("d2", "OPERATOR", "scan", "gB"),
    ("d3", "UNIT", "ms", "gB"),
]


@pytest.fixture()
def store(ray_session, tmp_path):
    from quickner_ray.sinks.quadstore import write_quad_store

    d = str(tmp_path / "qstore")
    write_quad_store(_quads(ray_session, ROWS), d)
    return d


def _sorted_rows(ds, cols=("subj", "pred", "obj", "graph", "n_mentions")):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def test_build_and_lookup_scoped_and_union(store):
    from quickner_ray.sinks.quadstore import list_graphs, quad_lookup

    assert sorted(list_graphs(store)) == ["gA", "gB"]
    # one-graph lookup
    got = _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gA"))
    assert got == [("d1", "SYSTEM", "spark", "gA", 2)]
    # union-default lookup crosses graphs in ONE read
    got = _sorted_rows(quad_lookup(store, "pred", "SYSTEM"))
    assert got == [
        ("d1", "SYSTEM", "spark", "gA", 2),
        ("d2", "SYSTEM", "flink", "gB", 1),
    ]
    # second-key prefix prune path
    got = _sorted_rows(quad_lookup(store, "pred", "OPERATOR", second="scan"))
    assert got == [("d2", "OPERATOR", "scan", "gB", 1)]


def test_clear_graph_leaves_sibling_untouched(store):
    from quickner_ray.sinks.quadstore import clear_graph, quad_lookup

    n = clear_graph(store, "gA")
    assert n == 2  # two distinct keys retracted
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gA")) == []
    # sibling graph answers exactly as before
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gB")) == [
        ("d2", "SYSTEM", "flink", "gB", 1)
    ]
    # idempotent: clearing a cleared graph retracts nothing
    assert clear_graph(store, "gA") == 0


def test_quad_update_data_verbs_and_sequence_semantics(store):
    from quickner_ray.serving import quad_update
    from quickner_ray.sinks.quadstore import quad_lookup

    n = quad_update(
        store,
        'DELETE DATA { GRAPH "gA" { "d1" :SYSTEM "spark" } } ;\n'
        'INSERT DATA { GRAPH "gA" { "d9" :SYSTEM "ray" . }\n'
        '              GRAPH "gC" { "d9" :SYSTEM "ray" } }',
    )
    assert n == 3
    # deleted key folds to zero through the delta-aware read
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gA")) == [
        ("d9", "SYSTEM", "ray", "gA", 1)
    ]
    # unknown graph auto-created on INSERT
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gC")) == [
        ("d9", "SYSTEM", "ray", "gC", 1)
    ]
    # gB untouched
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gB")) == [
        ("d2", "SYSTEM", "flink", "gB", 1)
    ]


def test_with_scoped_modify_touches_one_graph(store):
    from quickner_ray.serving import quad_update
    from quickner_ray.sinks.quadstore import quad_lookup

    n = quad_update(
        store,
        'WITH "gB" DELETE { ?d :OPERATOR ?o . } '
        "INSERT { ?d :OP2 ?o . } WHERE { ?d :OPERATOR ?o . }",
    )
    assert n == 2  # one retraction + one insertion key
    assert _sorted_rows(quad_lookup(store, "pred", "OPERATOR", graph="gB")) == []
    assert _sorted_rows(quad_lookup(store, "pred", "OP2", graph="gB")) == [
        ("d2", "OP2", "scan", "gB", 1)
    ]
    # the SAME predicate in gA is untouched
    assert _sorted_rows(quad_lookup(store, "pred", "OPERATOR", graph="gA")) == [
        ("d1", "OPERATOR", "join", "gA", 1)
    ]


def test_drop_create_and_clear_all(store):
    from quickner_ray.serving import quad_update
    from quickner_ray.sinks.quadstore import list_graphs, quad_lookup

    assert quad_update(store, 'DROP GRAPH "gA"') == 1
    assert sorted(list_graphs(store)) == ["gB"]
    assert quad_update(store, 'DROP GRAPH "gA"') == 0  # already gone
    assert quad_update(store, 'CREATE GRAPH "gNew"') == 1
    assert quad_update(store, 'CREATE GRAPH "gNew"') == 0  # idempotent
    assert sorted(list_graphs(store)) == ["gB", "gNew"]
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gNew")) == []
    # CLEAR ALL loops every remaining graph
    assert quad_update(store, "CLEAR ALL") == 3  # gB's three keys
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM")) == []


def test_compact_folds_deltas_and_preserves_values(store):
    from quickner_ray.serving import quad_update
    from quickner_ray.sinks.quadstore import (
        _delta_dirs,
        compact_quad_store,
        graph_dir,
        quad_lookup,
    )

    quad_update(store, 'WITH "gB" DELETE WHERE { ?d :OPERATOR ?o . }')
    before = _sorted_rows(quad_lookup(store, "pred", "SYSTEM"))
    assert _delta_dirs(os.path.join(graph_dir(store, "gB"), "spo"))
    folded = compact_quad_store(store)
    assert folded["gB"] == 1 and folded["gA"] == 0
    assert not _delta_dirs(os.path.join(graph_dir(store, "gB"), "spo"))
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM")) == before
    assert _sorted_rows(quad_lookup(store, "pred", "OPERATOR", graph="gB")) == []


def test_quad_select_graph_groups(store):
    from quickner_ray.serving import quad_select

    out = quad_select(
        store,
        "SELECT ?g (COUNT(?d) AS ?n) WHERE { GRAPH ?g { ?d :SYSTEM ?s . } } "
        "GROUP BY ?g",
    )
    assert sorted(tuple(r.values()) for r in out.take_all()) == [
        ("gA", 1), ("gB", 1)
    ]


def test_load_nq_keeps_graph_terms(store, tmp_path):
    from quickner_ray.serving import quad_update
    from quickner_ray.sinks.quadstore import quad_lookup

    nq = tmp_path / "feed.nq"
    nq.write_text(
        "<u1> <LINKS> <u2> <gA> .\n"
        "<u1> <LINKS> <u3> <gZ> .\n"
        "<u2> <LINKS> <u3> .\n"  # no graph term -> default graph ''
    )
    assert quad_update(store, f"LOAD <{nq}>") == 3
    got = _sorted_rows(quad_lookup(store, "pred", "LINKS"))
    assert got == [
        ("u1", "LINKS", "u2", "gA", 1),
        ("u1", "LINKS", "u3", "gZ", 1),
        ("u2", "LINKS", "u3", "", 1),
    ]


def test_single_graph_store_rejects_graph_verbs(ray_session, tmp_path):
    import ray.data as rd

    from quickner_ray.kernel.sparql import SparqlGraphStoreError
    from quickner_ray.serving import sparql_update
    from quickner_ray.sinks.triplestore import write_triple_store

    store = str(tmp_path / "tstore")
    write_triple_store(
        rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array(["a"], type=pa.string()),
                    "pred": pa.array(["P"], type=pa.string()),
                    "obj": pa.array(["b"], type=pa.string()),
                }
            )
        ),
        store,
    )
    for req in (
        'CLEAR GRAPH "g1"',
        'DROP GRAPH "g1"',
        'WITH "g1" DELETE WHERE { ?s :P ?o . }',
        'INSERT DATA { GRAPH "g1" { "x" :P "y" } }',
    ):
        with pytest.raises(SparqlGraphStoreError):
            sparql_update(store, req)


def test_parse_graph_verbs():
    from quickner_ray.kernel.sparql import SparqlError, parse_update_request

    assert parse_update_request("CLEAR GRAPH <http://g/1>") == (
        "clear_graph", "http://g/1"
    )
    assert parse_update_request("DROP GRAPH :g1") == ("drop_graph", "g1")
    assert parse_update_request("CREATE GRAPH :g1") == ("create_graph", "g1")
    kind, parsed = parse_update_request(
        "WITH <g9> DELETE { ?s :P ?o . } WHERE { ?s :P ?o . }"
    )
    assert kind == "modify" and parsed["with_graph"] == "g9"
    kind, ops = parse_update_request(
        'INSERT DATA { "a" :P "b" . GRAPH <g1> { "c" :P "d" } . "e" :P "f" }'
    )
    assert kind == "data"
    assert ops == [
        ("insert", [("a", "P", "b"), ("c", "P", "d", "g1"), ("e", "P", "f")])
    ]
    with pytest.raises(SparqlError):
        parse_update_request("CLEAR GRAPH ?g")
    with pytest.raises(SparqlError):
        parse_update_request("WITH <g> INSERT DATA { \"a\" :P \"b\" }")


def test_quad_select_lookup_matches_stream(store):
    from quickner_ray.serving import quad_select

    q = (
        "SELECT ?g (COUNT(?d) AS ?n) WHERE { GRAPH ?g { ?d :SYSTEM ?s . } } "
        "GROUP BY ?g"
    )
    lookup = sorted(
        tuple(r.values()) for r in quad_select(store, q).take_all()
    )
    stream = sorted(
        tuple(r.values())
        for r in quad_select(store, q, serve="stream").take_all()
    )
    assert lookup == stream == [("gA", 1), ("gB", 1)]

    # constant-graph restriction reads one subtree only
    q2 = 'SELECT ?d ?o WHERE { GRAPH "gB" { ?d :OPERATOR ?o . } }'
    got = sorted(tuple(r.values()) for r in quad_select(store, q2).take_all())
    assert got == [("d2", "scan")]


def test_quad_select_stats_planned(ray_session, tmp_path):
    """A stats-carrying quad store plans its join order from the
    cross-graph synopsis; answers must be identical to the unplanned
    lookup and stream evaluations."""
    from quickner_ray.serving import quad_select
    from quickner_ray.sinks.quadstore import write_quad_store

    d = str(tmp_path / "qstore_stats")
    write_quad_store(_quads(ray_session, ROWS), d, stats=True)
    assert os.path.exists(os.path.join(d, "stats", "_DONE"))
    q = (
        "SELECT ?d ?s ?o WHERE { ?d :SYSTEM ?s . ?d :OPERATOR ?o . }"
    )
    planned = sorted(
        tuple(r.values()) for r in quad_select(d, q).take_all()
    )
    stream = sorted(
        tuple(r.values()) for r in quad_select(d, q, serve="stream").take_all()
    )
    assert planned == stream == [
        ("d1", "spark", "join"), ("d2", "flink", "scan")
    ]


def test_add_copy_move_graph_verbs(store):
    from quickner_ray.serving import quad_update
    from quickner_ray.sinks.quadstore import list_graphs, quad_lookup

    # ADD merges with support addition: gA's spark (2) lands in gB
    n = quad_update(store, 'ADD GRAPH "gA" TO GRAPH "gB"')
    assert n == 2  # gA's two keys copied
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gB")) == [
        ("d1", "SYSTEM", "spark", "gB", 2),
        ("d2", "SYSTEM", "flink", "gB", 1),
    ]
    # COPY replaces: gB's merged contents overwritten by gA's two keys
    quad_update(store, 'COPY "gA" TO "gB"')
    got = _sorted_rows(quad_lookup(store, "pred", "OPERATOR", graph="gB"))
    assert got == [("d1", "OPERATOR", "join", "gB", 1)]
    assert _sorted_rows(quad_lookup(store, "pred", "UNIT", graph="gB")) == []
    # MOVE: gA's contents land in gNew, gA is gone
    quad_update(store, 'MOVE GRAPH "gA" TO GRAPH "gNew"')
    assert "gA" not in list_graphs(store)
    assert _sorted_rows(quad_lookup(store, "pred", "SYSTEM", graph="gNew")) == [
        ("d1", "SYSTEM", "spark", "gNew", 2)
    ]
    # source must exist; same-graph rejected at parse
    import pytest as _pt

    from quickner_ray.kernel.sparql import SparqlError

    with _pt.raises(FileNotFoundError):
        quad_update(store, 'ADD "gA" TO "gB"')
    with _pt.raises(SparqlError, match="distinct graphs"):
        quad_update(store, 'COPY "gB" TO "gB"')
