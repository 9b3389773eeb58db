"""Grouped top-k (stages/topk.py): the per-batch combiner must never drop a
row that belongs in the global top-k (total-order tie-breaks make pruning
safe), and the stratified sample must be deterministic."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa

from quickner_ray.stages.topk import grouped_topk, stratified_sample


def test_grouped_topk_across_blocks(ray_session):
    import ray.data as rd

    # one hot key spread over many blocks; values interleaved so every
    # block holds some of the global top rows and some losers
    rng = np.random.RandomState(7)
    n = 5000
    keys = np.where(rng.rand(n) < 0.8, "hot", "cold")
    vals = rng.permutation(n).astype("float64")
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({"k": keys, "v": vals, "id": ids})
    ds = rd.from_arrow(tab).repartition(10)
    out = (
        grouped_topk(ds, "k", ["v", "id"], 5, descending=True)
        .to_pandas()
        .sort_values(["k", "v"], ascending=[True, False])
        .reset_index(drop=True)
    )
    import pandas as pd

    expect = (
        tab.to_pandas()
        .sort_values(["v", "id"], ascending=[False, True])
        .groupby("k", sort=True)
        .head(5)
        .sort_values(["k", "v"], ascending=[True, False])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "v", "id"]], expect[["k", "v", "id"]])


def test_grouped_topk_ties_and_small_groups(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "k": ["a", "a", "a", "b"],
            "v": [1.0, 1.0, 1.0, 9.0],  # all-ties: id ascending wins
            "id": pa.array([3, 1, 2, 7], type=pa.int64()),
        }
    )
    out = (
        grouped_topk(rd.from_arrow(tab), "k", ["v", "id"], 2, descending=True)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    assert out[out.k == "a"].id.tolist() == [1, 2]
    assert out[out.k == "b"].id.tolist() == [7]  # group smaller than k


def test_stratified_sample_deterministic(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "lang": ["en"] * 50 + ["de"] * 10,
            "doc_id": pa.array(range(60), type=pa.int64()),
        }
    )
    a = stratified_sample(rd.from_arrow(tab), "lang", "doc_id", 4).to_pandas()
    b = stratified_sample(rd.from_arrow(tab), "lang", "doc_id", 4).to_pandas()
    a = a.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = b.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert a[["lang", "doc_id"]].equals(b[["lang", "doc_id"]])
    assert (a.groupby("lang").size() == 4).all()


def test_grouped_topk_descending_uint64_zero(ray_session):
    """~v (not -v) for unsigned descending: 0 is the minimum and must rank
    LAST, not first (uint64 negation wraps and left 0 at the top)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from quickner_ray.stages.topk import grouped_topk

    tbl = pa.table(
        {
            "g": pa.array(["a"] * 3),
            "h": pa.array(np.array([0, 5, 10], dtype=np.uint64)),
        }
    )
    got = grouped_topk(rd.from_arrow(tbl), "g", ["h"], 2, descending=True).to_pandas()
    assert sorted(got["h"].tolist()) == [5, 10]


class TestBM25:
    def _corpus(self, tmp_path):
        import pyarrow.parquet as pq

        texts = [
            "spark window query",                       # all three terms
            "spark spark spark window",                 # tf saturation
            "window",                                   # one term, short doc
            "nothing relevant here at all " * 20,       # long doc, no terms
            "query " * 50,                              # hot tf, long doc
            "",                                         # empty doc
            "spark window query",                       # exact tie with doc 0
            "SPARK, window; query!",                    # case/punct boundaries
        ]
        path = str(tmp_path / "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            path,
        )
        return path

    def test_matches_duckdb_bit_exact(self, ray_session, tmp_path):
        import duckdb
        import ray.data as rd

        from quickner_ray.stages.search import bm25_topk, sql_bm25_topk

        path = self._corpus(tmp_path)
        ds = rd.read_parquet(path)
        ours = bm25_topk(ds, k=5).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        oracle = con.sql(sql_bm25_topk(k=5)).df()
        assert list(ours["doc_id"]) == list(oracle["doc_id"])
        assert (ours["score"].values == oracle["score"].values).all()
        # ties (docs 0 and 6 have identical text) break by doc_id asc
        ids = list(ours["doc_id"])
        if 0 in ids and 6 in ids:
            assert ids.index(0) < ids.index(6)

    def test_stats_and_ranking_semantics(self, ray_session, tmp_path):
        import ray.data as rd

        from quickner_ray.stages.search import bm25_corpus_stats, bm25_topk

        path = self._corpus(tmp_path)
        ds = rd.read_parquet(path)
        st = bm25_corpus_stats(ds)
        assert st["n_docs"] == 8
        assert st["df_0"] == 4  # spark: docs 0,1,6,7
        assert st["df_1"] == 5  # window
        assert st["df_2"] == 4  # query
        top = bm25_topk(ds, k=8).to_pandas()
        # three-term docs outrank single-term and zero-term docs
        assert top.iloc[0]["doc_id"] in (0, 6, 7)
        scores = {int(d): s for d, s in zip(top["doc_id"], top["score"])}
        assert scores[3] == 0.0  # no query terms
        assert scores[0] > scores[2] > scores[3]


class TestMMR:
    @pytest.mark.usefixtures("ray_session")
    def test_diversification_and_oracle(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        import ray.data as rd

        from quickner_ray.stages.search import mmr_topk, sql_mmr_topk

        # doc 0/1: identical high-relevance twins — plain top-k would take
        # both; MMR must demote the twin below a less-similar doc
        texts = [
            "spark window query spark window query alpha beta gamma",
            "spark window query spark window query alpha beta gamma",
            "spark window query query delta epsilon zeta eta theta",
            "spark window kappa",
            "query mu nu",
            "nothing here",
        ]
        path = str(tmp_path / "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            path,
        )
        ds = rd.read_parquet(path)
        got = mmr_topk(ds, k=4, pool=6).to_pandas().sort_values("rank")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = con.sql(sql_mmr_topk(k=4, pool=6)).df().sort_values("rank")
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
        order = list(got["doc_id"])
        assert order[0] == 0          # highest rel, lowest id seed
        # twin: rel 6, but msim 6 vs doc 0 -> score 0; doc 2: rel 4,
        # msim 3 -> score 1 — diversification demotes the twin
        assert order[1] == 2
        assert 1 in order  # the twin re-enters once diversity is paid for
