"""Bigram-LM quality scoring: crafted-case semantics + DuckDB oracle parity.

The stage is integer-exact by design (counts, not float log-prob sums), so
the oracle comparison is strict equality.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from quickner_ray.stages import lm


def _docs_table():
    # even ids train the LM, odd ids are scored
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat",       # train
                    "the cat sat",                   # score: both bigrams known
                    "the cat ate the cat",           # train ("the cat" x2)
                    "dog ate homework",              # score: nothing known
                    "on the mat",                    # train
                    "x",                              # score: < 2 words
                ]
            ),
        }
    )


class TestKernel:
    def test_partial_counts_dedupe_within_batch(self):
        t = pa.table({"doc_id": [0], "text": ["a b a b a"]})
        out = lm.partial_bigram_counts(t)
        got = {
            (w1, w2): c
            for w1, w2, c in zip(
                out.column("w1").to_pylist(),
                out.column("w2").to_pylist(),
                out.column("cnt").to_pylist(),
            )
        }
        assert got == {("a", "b"): 2, ("b", "a"): 2}

    def test_multiplicities_and_totals(self):
        t = _docs_table()
        mult = lm.doc_bigram_multiplicities(t)
        rows = {
            (d, w1, w2): m
            for d, w1, w2, m in zip(
                mult.column("doc_id").to_pylist(),
                mult.column("w1").to_pylist(),
                mult.column("w2").to_pylist(),
                mult.column("m").to_pylist(),
            )
        }
        assert rows[(2, "the", "cat")] == 2
        tot = lm.add_bigram_total(t)
        assert dict(
            zip(tot.column("doc_id").to_pylist(), tot.column("n_bigrams").to_pylist())
        ) == {0: 5, 1: 2, 2: 4, 3: 2, 4: 2, 5: 0}

    def test_empty_batch(self):
        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        assert len(lm.partial_bigram_counts(t)) == 0
        assert len(lm.doc_bigram_multiplicities(t)) == 0
        assert len(lm.add_bigram_total(t)) == 0


@pytest.mark.usefixtures("ray_session")
class TestPipeline:
    def test_crafted_scores_match_oracle(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        import pyarrow.compute as pc

        tab = _docs_table()
        path = str(tmp_path / "documents.parquet")
        pq.write_table(tab, path)

        # batch-level filter (schema-preserving): row-based filter(lambda)
        # emits schema-less empty blocks that Ray's hash-join aggregator
        # cannot concatenate — the query path filters per batch for the
        # same reason.
        def half(parity):
            def f(b):
                ids = b.column("doc_id")
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                return b.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

            return f

        train = rd.read_parquet(path).map_batches(half(0), batch_format="pyarrow")
        score = rd.read_parquet(path).map_batches(half(1), batch_format="pyarrow")
        got = (
            lm.lm_bigram_scores(train, score, num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 1 "the cat sat": "the cat" trained 3x (doc0 1 + doc2 2),
        # "cat sat" trained 1x (doc0) -> n_known=2, sum_freq=4
        assert got.loc[got.doc_id == 1].iloc[0].tolist() == [1, 2, 2, 4]
        # doc 3: nothing known; doc 5: zero bigrams
        assert got.loc[got.doc_id == 3].iloc[0].tolist() == [3, 2, 0, 0]
        assert got.loc[got.doc_id == 5].iloc[0].tolist() == [5, 0, 0, 0]
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = (
            con.sql(lm.sql_lm_bigram_scores())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got[sorted(got.columns)].values.tolist() == (
            want[sorted(want.columns)].values.tolist()
        )


def _ref_dsir(target_texts, raw_texts, score_rows, d):
    """Brute-force DSIR sufficient statistics."""
    import re

    from quickner_ray.stages.dedup_approx import h64

    def bigrams(t):
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def counts(texts):
        c = {}
        for t in texts:
            for g in bigrams(t):
                b = h64(g) % d
                c[b] = c.get(b, 0) + 1
        return c

    tc, rc = counts(target_texts), counts(raw_texts)
    out = {}
    for doc_id, t in score_rows:
        bs = [h64(g) % d for g in bigrams(t)]
        out[doc_id] = (
            len(bs),
            sum(tc.get(b, 0) for b in bs),
            sum(rc.get(b, 0) for b in bs),
        )
    return out


@pytest.mark.usefixtures("ray_session")
def test_dsir_stats_matches_brute_force():
    import ray.data as rd

    from quickner_ray.stages.dsir import dsir_stats

    target = [
        "the quick brown fox jumps over the lazy dog",
        "the quick start guide to data pipelines",
        "",
    ]
    raw = [
        "the quick brown cat sleeps",
        "completely novel phrasing here",
        "x",
    ]
    t_ds = rd.from_items(
        [{"doc_id": i * 2, "text": t} for i, t in enumerate(target)]
    )
    r_rows = [(i * 2 + 1, t) for i, t in enumerate(raw)]
    r_ds = rd.from_items([{"doc_id": i, "text": t} for i, t in r_rows])
    got = {
        r["doc_id"]: (r["n_grams"], r["t_hits"], r["r_hits"])
        for r in dsir_stats(t_ds, r_ds, r_ds, d=64).take_all()
    }
    assert got == _ref_dsir(target, raw, r_rows, 64)
    # "the quick" appears twice in target: the raw doc containing it must
    # score t_hits >= 2
    assert got[1][1] >= 2
