"""SPARQL property paths: algebra vs brute-force references, BFS closure."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.paths import eval_path, min_hops_closure


def _triples(rows):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows]),
                "pred": pa.array([r[1] for r in rows]),
                "obj": pa.array([r[2] for r in rows]),
            }
        )
    )


def _pairs(ds):
    return sorted((r["src"], r["dst"]) for r in ds.take_all())


def _bfs_ref(edges, max_hops):
    """Brute-force min-hop closure over a directed edge list."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    out = {}
    for start in {s for s, _ in edges}:
        frontier, seen, h = {start}, set(), 0
        while frontier and h < max_hops:
            h += 1
            frontier = {d for u in frontier for d in adj[u]} - seen
            for d in frontier:
                out.setdefault((start, d), h)
            seen |= frontier
    return out


T = [
    ("d1", "SYS", "e_spark"),
    ("d1", "OP", "e_join"),
    ("d1", "OP", "e_join"),  # duplicate mention
    ("d2", "SYS", "e_spark"),
    ("d2", "UNIT", "e_row"),
    ("d3", "OP", "e_sort"),  # no SYS in d3
    ("d3", "SYS", "e_stream"),
]


@pytest.mark.usefixtures("ray_session")
class TestPathAlgebra:
    def test_pred_and_inv(self):
        assert _pairs(eval_path(_triples(T), ("pred", "SYS"))) == [
            ("d1", "e_spark"),
            ("d2", "e_spark"),
            ("d3", "e_stream"),
        ]
        assert _pairs(eval_path(_triples(T), ("inv", ("pred", "UNIT")))) == [
            ("e_row", "d2")
        ]

    def test_seq_inv_composition(self):
        # ^SYS / OP : system entity -> doc -> operator entity
        expr = ("seq", ("inv", ("pred", "SYS")), ("pred", "OP"))
        assert _pairs(eval_path(_triples(T), expr)) == [
            ("e_spark", "e_join"),
            ("e_stream", "e_sort"),
        ]

    def test_alt_unions_and_dedups(self):
        expr = ("alt", ("pred", "SYS"), ("alt", ("pred", "SYS"), ("pred", "OP")))
        got = _pairs(eval_path(_triples(T), expr))
        assert got == sorted(
            set(_pairs(eval_path(_triples(T), ("pred", "SYS"))))
            | set(_pairs(eval_path(_triples(T), ("pred", "OP"))))
        )

    def test_pred_source_hook(self):
        # pred_source supplies each step's triples individually (the
        # index-pruned read path); constant filter still applies on top
        calls = []

        def src(label):
            calls.append(label)
            return _triples(T)

        expr = ("seq", ("inv", ("pred", "SYS")), ("pred", "OP"))
        got = _pairs(eval_path(None, expr, pred_source=src))
        assert got == _pairs(eval_path(_triples(T), expr))
        assert sorted(calls) == ["OP", "SYS"]

    def test_unknown_op_raises(self):
        # NB: "star" became a real op in the SPARQL star/negation wave;
        # use a genuinely unknown tag
        with pytest.raises(ValueError, match="unknown path op"):
            eval_path(_triples(T), ("question", ("pred", "SYS")))


@pytest.mark.usefixtures("ray_session")
class TestMinHopsClosure:
    # chain with a shortcut and a cycle: a->b->c->d, a->c, d->a
    E = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a")]

    def _edges_ds(self, edges, parallelism=1):
        t = pa.table(
            {
                "src": pa.array([s for s, _ in edges]),
                "dst": pa.array([d for _, d in edges]),
            }
        )
        ds = rd.from_arrow(t)
        return ds.repartition(parallelism) if parallelism > 1 else ds

    def _closure(self, edges, max_hops, parallelism=1, driver_cap=None):
        out = min_hops_closure(
            self._edges_ds(edges, parallelism),
            max_hops=max_hops,
            driver_cap=driver_cap,
        ).take_all()
        return {(r["src"], r["dst"]): r["min_hops"] for r in out}

    # driver_cap=0 forces the distributed frontier rounds; None takes the
    # size-gated driver-side BFS — both must emit identical labeled pairs
    @pytest.mark.parametrize("cap", [None, 0])
    @pytest.mark.parametrize("h", [1, 2, 4])
    def test_matches_bfs_reference(self, h, cap):
        assert self._closure(self.E, h, driver_cap=cap) == _bfs_ref(self.E, h)

    def test_cycle_reaches_self(self):
        got = self._closure(self.E, 4)
        assert got[("a", "a")] == 3  # a->c->d->a
        assert got[("d", "b")] == 2  # d->a->b

    def test_duplicate_edges_collapse(self):
        assert self._closure(self.E * 3, 3) == _bfs_ref(self.E, 3)

    def test_parallelism_invariant(self):
        assert self._closure(self.E, 3, parallelism=5, driver_cap=0) == _bfs_ref(
            self.E, 3
        )

    def test_early_stop_at_fixpoint(self):
        # closure saturates at 3 hops; asking for 10 must not loop or differ
        assert self._closure(self.E, 10, driver_cap=0) == _bfs_ref(self.E, 10)

    def test_plus_via_eval_path(self):
        tri = _triples([(s, "link", d) for s, d in self.E])
        got = _pairs(eval_path(tri, ("plus", ("pred", "link"), 3)))
        assert got == sorted(_bfs_ref(self.E, 3).keys())

    def test_max_hops_validation(self):
        with pytest.raises(ValueError, match="max_hops >= 1"):
            min_hops_closure(self._edges_ds(self.E), max_hops=0)

    # max_hops=None = true Kleene closure: runs to FIXPOINT (the cyclic
    # graph saturates at diameter rounds, the frontier-empty gate stops
    # it) — both the driver BFS and the distributed frontier arm
    @pytest.mark.parametrize("cap", [None, 0])
    def test_unbounded_fixpoint(self, cap):
        got = self._closure(self.E, None, driver_cap=cap)
        assert got == _bfs_ref(self.E, 99)  # 99 >> diameter == saturation

    def test_unbounded_plus_via_sparql_text(self):
        from quickner_ray.kernel.sparql import run_select

        tri = _triples([(s, "link", d) for s, d in self.E])
        out = run_select(tri, "SELECT ?a ?b WHERE { ?a :link+ ?b . }")
        got = sorted((r["a"], r["b"]) for r in out.take_all())
        assert got == sorted(_bfs_ref(self.E, 99).keys())


def _bf_ref(wedges, max_hops):
    """Brute-force hop-bounded Bellman-Ford over (src, dst, w) tuples."""
    ew = {}
    for s, d, w in wedges:
        ew[(s, d)] = min(w, ew.get((s, d), w))
    dist = dict(ew)
    for _ in range(max_hops - 1):
        nxt = dict(dist)
        for (s, m), c in dist.items():
            for (m2, d), w in ew.items():
                if m2 == m and c + w < nxt.get((s, d), c + w + 1):
                    nxt[s, d] = c + w
        dist = nxt
    return dist


@pytest.mark.usefixtures("ray_session")
class TestCheapestPaths:
    # direct a->d costs 10; the 3-hop route a->b->c->d costs 3
    W = [
        ("a", "d", 10),
        ("a", "b", 1),
        ("b", "c", 1),
        ("c", "d", 1),
        ("b", "c", 5),  # parallel edge, must collapse to the cheaper
        ("d", "a", 2),
    ]

    def _run(self, wedges, max_hops, driver_cap=None):
        from quickner_ray.stages.paths import cheapest_paths

        t = pa.table(
            {
                "src": pa.array([s for s, _, _ in wedges]),
                "dst": pa.array([d for _, d, _ in wedges]),
                "w": pa.array([w for _, _, w in wedges], type=pa.int64()),
            }
        )
        out = cheapest_paths(
            rd.from_arrow(t).repartition(3),
            max_hops=max_hops,
            driver_cap=driver_cap,
        ).take_all()
        return {(r["src"], r["dst"]): r["min_cost"] for r in out}

    @pytest.mark.parametrize("cap", [None, 0])
    @pytest.mark.parametrize("h", [1, 2, 3])
    def test_matches_bellman_ford(self, h, cap):
        assert self._run(self.W, h, driver_cap=cap) == _bf_ref(self.W, h)

    def test_shortcut_beats_direct_edge(self):
        got = self._run(self.W, 3)
        assert got[("a", "d")] == 3  # a->b->c->d beats the direct 10
        assert self._run(self.W, 1)[("a", "d")] == 10

    def test_max_hops_validation(self):
        from quickner_ray.stages.paths import cheapest_paths

        with pytest.raises(ValueError, match="max_hops >= 1"):
            cheapest_paths(rd.from_arrow(pa.table({"src": ["a"], "dst": ["b"], "w": [1]})), max_hops=0)
