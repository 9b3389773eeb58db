"""Triple-store permutation indexes: lookup correctness + stats pruning."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.sinks.triplestore import (
    lookup,
    pruned_fraction,
    write_triple_store,
)


def _triples_table():
    # 40 preds x 30 subjects, duplicated mentions for support counts
    rows = []
    for p in range(40):
        for s in range(30):
            rows.append((f"doc{s}", f"P{p:02d}", f"e{(s * 7 + p) % 50}"))
            if s % 3 == 0:
                rows.append((f"doc{s}", f"P{p:02d}", f"e{(s * 7 + p) % 50}"))
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestTripleStore:
    def test_lookup_all_positions_and_pruning(self, tmp_path):
        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(
            rd.from_arrow(t).repartition(4), store, row_group_size=64
        )
        # ground truth: distinct triples + mention counts
        import collections

        cnt = collections.Counter(
            zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(), t.column("obj").to_pylist())
        )
        for pos, val in (("pred", "P07"), ("subj", "doc11"), ("obj", "e13")):
            got = {
                (r["subj"], r["pred"], r["obj"]): r["n_mentions"]
                for r in lookup(store, pos, val).take_all()
            }
            expect = {
                k: c
                for k, c in cnt.items()
                if {"subj": k[0], "pred": k[1], "obj": k[2]}[pos] == val
            }
            assert got == expect
            # sorted layout must let footer stats skip most row groups
            assert pruned_fraction(store, pos, val) > 0.5

    def test_resume_skips_finished_perm(self, tmp_path):
        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store, perms=["pos"])
        before = sorted((tmp_path / "store" / "pos").iterdir())
        write_triple_store(rd.from_arrow(t), store, perms=["pos"])
        assert sorted((tmp_path / "store" / "pos").iterdir()) == before


@pytest.mark.usefixtures("ray_session")
class TestIncrementalMaintenance:
    """apply_triple_delta + compact_store: LSM delta runs must be
    read-equivalent immediately and byte-fold to a full rebuild."""

    def _perm_table(self, store, perm):
        import os

        import pyarrow.parquet as pq

        d = os.path.join(store, perm)
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )
        t = pa.concat_tables(pq.read_table(f) for f in files)
        return t.sort_by([(c, "ascending") for c in t.column_names])

    def test_delta_then_compact_equals_full_rebuild(self, tmp_path):
        from quickner_ray.sinks.triplestore import (
            apply_triple_delta,
            compact_store,
        )

        t = _triples_table()
        half = t.num_rows // 2
        base, delta = t.slice(0, half), t.slice(half)

        inc = str(tmp_path / "inc")
        write_triple_store(rd.from_arrow(base), inc)
        apply_triple_delta(inc, rd.from_arrow(delta))

        # BEFORE compaction: lookups already see the merged store
        got = {
            (r["subj"], r["obj"]): r["n_mentions"]
            for r in lookup(inc, "pred", "P00").take_all()
        }
        full = str(tmp_path / "full")
        write_triple_store(rd.from_arrow(t), full)
        want = {
            (r["subj"], r["obj"]): r["n_mentions"]
            for r in lookup(full, "pred", "P00").take_all()
        }
        assert got == want and len(got) == 30

        # AFTER compaction: every permutation is value-identical to the
        # full rebuild (single sorted run, deltas folded)
        folded = compact_store(inc)
        assert folded == {"spo": 1, "pos": 1, "osp": 1}
        for perm in ("spo", "pos", "osp"):
            assert self._perm_table(inc, perm) == self._perm_table(full, perm)
        # and the delta partitions are gone
        import os

        for perm in ("spo", "pos", "osp"):
            subdirs = [
                f
                for f in os.listdir(os.path.join(inc, perm))
                if f.startswith("delta-")
            ]
            assert subdirs == []

    def test_retraction_drops_key(self, tmp_path):
        from quickner_ray.sinks.triplestore import (
            apply_triple_delta,
            compact_store,
        )

        base = pa.table(  # mention-level: (a,P,x) twice, (b,P,y) once
            {
                "subj": ["a", "a", "b"],
                "pred": ["P", "P", "P"],
                "obj": ["x", "x", "y"],
            }
        )
        store = str(tmp_path / "s")
        write_triple_store(rd.from_arrow(base), store)
        retract = pa.table(
            {
                "subj": ["b"],
                "pred": ["P"],
                "obj": ["y"],
                "n_mentions": pa.array([-1], pa.int64()),
            }
        )
        apply_triple_delta(store, rd.from_arrow(retract), distinct=True)
        rows = lookup(store, "pred", "P").take_all()
        assert {(r["subj"], r["obj"]) for r in rows} == {("a", "x")}
        compact_store(store)
        rows = lookup(store, "pred", "P").take_all()
        assert [(r["subj"], r["obj"], r["n_mentions"]) for r in rows] == [
            ("a", "x", 2)
        ]


@pytest.mark.usefixtures("ray_session")
class TestStoreStats:
    """Per-predicate planning synopsis: exact counts, read-back shape,
    and the compaction refresh."""

    def test_stats_match_brute_force(self, tmp_path):
        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store, perms=["pos"])
        from quickner_ray.sinks.triplestore import read_store_stats

        stats = read_store_stats(store)
        # brute force over the distinct triple set
        import collections

        dt = set(zip(t.column("subj").to_pylist(),
                     t.column("pred").to_pylist(),
                     t.column("obj").to_pylist()))
        n = collections.Counter(p for _, p, _ in dt)
        ns = {p: len({s for s, q, _ in dt if q == p}) for p in n}
        no = {p: len({o for _, q, o in dt if q == p}) for p in n}
        assert stats["preds"] == {p: (n[p], ns[p], no[p]) for p in n}
        assert stats["total"][0] == len(dt)

    def test_stats_plan_orders_smallest_first(self, ray_session):
        from quickner_ray.stages.bgp import (
            estimate_pattern_counts,
            plan_patterns_stats,
        )

        stats = {
            "preds": {"BIG": (1000, 100, 200), "SMALL": (10, 10, 5)},
            "total": (1010, 110, 205),
        }
        pats = [
            ("?d", "BIG", "?x"),        # 1000
            ("?d", "SMALL", "?y"),      # 10
            ("?d", "BIG", "konst"),     # 1000/200 = 5
            ("?d", "?p", "?z"),         # 1010 (unbound predicate)
        ]
        est = estimate_pattern_counts(stats, pats)
        assert est == [1000.0, 10.0, 5.0, 1010.0]
        got = plan_patterns_stats(stats, pats)
        assert got == [pats[2], pats[1], pats[0], pats[3]]
        # absent predicate estimates to zero and seeds first
        assert plan_patterns_stats(
            stats, [("?d", "BIG", "?x"), ("?d", "NOPE", "?x")]
        )[0] == ("?d", "NOPE", "?x")

    def test_stats_refresh_on_compaction(self, tmp_path):
        from quickner_ray.sinks.triplestore import (
            apply_triple_delta,
            compact_store,
            read_store_stats,
        )

        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store, perms=["pos"])
        before = read_store_stats(store)
        delta = pa.table(
            {
                "subj": pa.array(["newdoc"] * 3, pa.string()),
                "pred": pa.array(["PNEW"] * 3, pa.string()),
                "obj": pa.array(["e1", "e2", "e3"], pa.string()),
            }
        )
        apply_triple_delta(store, rd.from_arrow(delta), perms=["pos"])
        # deltas drift the synopsis (documented): unchanged until compaction
        assert read_store_stats(store) == before
        compact_store(store, perms=["pos"])
        after = read_store_stats(store)
        assert after["preds"]["PNEW"] == (3, 1, 3)
        assert after["total"][0] == before["total"][0] + 3

    def test_bgp_stats_plan_equals_given(self, ray_session, tmp_path):
        from quickner_ray.sinks.triplestore import (
            lookup,
            read_store_stats,
        )
        from quickner_ray.stages.bgp import bgp_match

        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store, perms=["pos"])
        pats = [("?d", "P00", "?x"), ("?d", "P01", "?y")]
        a = (
            bgp_match(rd.from_arrow(t), pats)
            .to_pandas().sort_values(["d", "x", "y"]).reset_index(drop=True)
        )
        b = (
            bgp_match(
                None,
                list(reversed(pats)),
                plan="stats",
                stats=read_store_stats(store),
                pattern_source=lambda p: lookup(store, "pred", p[1]),
            )
            .to_pandas()[["d", "x", "y"]]
            .sort_values(["d", "x", "y"]).reset_index(drop=True)
        )
        assert a.equals(b)

    def test_stats_plan_requires_stats(self, ray_session):
        from quickner_ray.stages.bgp import bgp_match

        with pytest.raises(ValueError, match="stats"):
            bgp_match(None, [("?a", "P", "?b")], plan="stats")


@pytest.mark.usefixtures("ray_session")
class TestCompositeLookup:
    def test_two_key_lookup_matches_filtered_scan(self, tmp_path):
        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store)
        # (pred, obj) on POS
        got = sorted(
            (r["subj"], r["pred"], r["obj"])
            for r in lookup(store, "pred", "P03", second="e21").take_all()
        )
        want = sorted(
            {
                (s, p, o)
                for s, p, o in zip(
                    t.column("subj").to_pylist(),
                    t.column("pred").to_pylist(),
                    t.column("obj").to_pylist(),
                )
                if p == "P03" and o == "e21"
            }
        )
        assert got == want and len(got) > 0
        # (subj, pred) on SPO
        got = sorted(
            (r["pred"], r["obj"])
            for r in lookup(store, "subj", "doc5", second="P07").take_all()
        )
        assert got == [("P07", f"e{(5 * 7 + 7) % 50}")]

    def test_two_key_lookup_sees_deltas(self, tmp_path):
        from quickner_ray.sinks.triplestore import apply_triple_delta

        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store, perms=["pos"])
        delta = pa.table(
            {
                "subj": pa.array(["nd1", "nd2"], pa.string()),
                "pred": pa.array(["P03", "P03"], pa.string()),
                "obj": pa.array(["e21", "zzz"], pa.string()),
            }
        )
        apply_triple_delta(store, rd.from_arrow(delta), perms=["pos"])
        got = {
            r["subj"]
            for r in lookup(store, "pred", "P03", second="e21").take_all()
        }
        assert "nd1" in got and "nd2" not in got

    def test_serving_uses_composite_path(self, tmp_path):
        from quickner_ray.serving import sparql_select

        t = _triples_table()
        store = str(tmp_path / "store")
        write_triple_store(rd.from_arrow(t), store)
        rows = sparql_select(
            store,
            'SELECT ?d WHERE { ?d :P03 :e21 . ?d :P05 ?x . }',
        ).take_all()
        want = sorted(
            {
                s
                for s, p, o in zip(
                    t.column("subj").to_pylist(),
                    t.column("pred").to_pylist(),
                    t.column("obj").to_pylist(),
                )
                if p == "P03" and o == "e21"
            }
        )
        assert sorted(r["d"] for r in rows) == want
