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
