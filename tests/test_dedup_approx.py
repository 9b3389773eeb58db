"""Approximate-dedup operators: MinHash/LSH, SimHash, embedding pairs.

Kernel-level tests run without Ray; pipeline tests use the session fixture.
The DuckDB SQL builders are checked for exact value equality against the
Python implementations (the driver's oracle gate does the same at sf0.01).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from quickner_ray.stages import dedup_approx as da


def _tbl(rows):
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )


class TestKernel:
    def test_h64_matches_duckdb(self):
        con = duckdb.connect()
        for s in ["hello world", "a b c", "", "ümlaut"]:
            (v,) = con.sql("SELECT md5_number_upper(?)", params=[s]).fetchone()
            assert int(v) == da.h64(s), s

    def test_shingles_short_text(self):
        # < n words -> single polynomial shingle over the available words
        h = da.shingle_hashes("two words")
        expect = (
            np.uint64(da.h64("two")) * da.SH_C[0]
            + np.uint64(da.h64("words")) * da.SH_C[1]
        )
        assert len(h) == 1 and h[0] == expect
        assert len(da.shingle_hashes("a b c d")) == 2  # two 3-grams
        assert da.shingle_hashes("").tolist() == [0]  # zero words -> hash 0

    def test_vectorized_shingles_equal_scalar(self):
        import pyarrow as pa

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "two words", "one", "", "  !! punct only !!",
            "a b c a b c a b c", "x1 y2 z3 w4",
            "repeated repeated repeated repeated",
            "Ümlaut straße mixed café 中文 words here",
        ]
        p, h, starts = da._shingle_rows(pa.array(texts))
        assert len(starts) == len(texts)  # every row has >= 1 shingle
        for i, t in enumerate(texts):
            assert np.array_equal(np.sort(da.shingle_hashes(t)), np.sort(h[p == i])), t

    def test_identical_texts_identical_signatures(self):
        a = da.minhash_signature(da.shingle_hashes("the quick brown fox jumps"))
        b = da.minhash_signature(da.shingle_hashes("the QUICK brown Fox jumps"))
        assert (a == b).all()  # case-normalized

    def test_signature_estimates_jaccard(self):
        base = " ".join(f"w{i}" for i in range(200))
        near = " ".join(f"w{i}" for i in range(190)) + " x1 x2 x3"
        far = " ".join(f"z{i}" for i in range(200))
        sa = da.minhash_signature(da.shingle_hashes(base))
        sb = da.minhash_signature(da.shingle_hashes(near))
        sc = da.minhash_signature(da.shingle_hashes(far))
        assert (sa == sb).mean() > 0.5
        assert (sa == sc).mean() < 0.2

    def test_jaccard(self):
        assert da.jaccard({1, 2, 3}, {2, 3, 4}) == pytest.approx(0.5)
        assert da.jaccard({1}, {2}) == 0.0

    def test_simhash_near_texts_low_hamming(self):
        t = _tbl(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta " * 10),
                (2, "alpha beta gamma delta epsilon zeta eta iota " * 10),
                (3, "completely different words entirely unrelated corpus " * 10),
            ]
        )
        out = da.simhash_batch(t)
        sims = np.array(out.column("simhash").to_pylist(), dtype=np.uint64)
        d12 = da.hamming64(sims[0:1], sims[1:2])[0]
        d13 = da.hamming64(sims[0:1], sims[2:3])[0]
        assert d12 < d13
        assert d12 <= 16

    def test_simhash_drops_wordless_docs(self):
        out = da.simhash_batch(_tbl([(1, "!!! ???"), (2, "real words here")]))
        assert out.column("doc_id").to_pylist() == [2]

    def test_band_rows_shape(self):
        out = da.band_rows(_tbl([(7, "a b c d e f")]))
        assert out.num_rows == da.BANDS
        assert out.column("band_id").to_pylist() == list(range(da.BANDS))


class TestSQLParity:
    """Python batch kernels == DuckDB SQL builders on a small corpus."""

    CORPUS = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "pack my box with five dozen liquor jugs tonight"),
        (3, "short"),
        (4, "Numbers 123 and CASE folding Should match"),
    ]

    @pytest.fixture()
    def con(self, tmp_path):
        import pyarrow.parquet as pq

        path = str(tmp_path / "documents.parquet")
        pq.write_table(_tbl(self.CORPUS), path)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        return con

    def test_minhash_signatures_parity(self, con):
        ours = (
            da.minhash_signatures_long(_tbl(self.CORPUS))
            .to_pandas()
            .sort_values(["doc_id", "perm_id"])
            .reset_index(drop=True)
        )
        oracle = (
            con.sql(da.sql_minhash_signatures())
            .df()
            .sort_values(["doc_id", "perm_id"])
            .reset_index(drop=True)
        )
        assert (ours["sig"].astype("uint64").values == oracle["sig"].astype("uint64").values).all()

    def test_simhash_parity(self, con):
        ours = da.simhash_batch(_tbl(self.CORPUS)).to_pandas().sort_values("doc_id")
        oracle = con.sql(da.sql_simhash()).df().sort_values("doc_id")
        assert (
            ours["simhash"].astype("uint64").values
            == oracle["simhash"].astype("uint64").values
        ).all()


class TestLSHPipeline:
    def test_max_bucket_cap_matches_oracle(self, ray_session, tmp_path):
        """A bucket larger than MAX_BUCKET is truncated to its MAX_BUCKET
        lowest doc ids on BOTH sides (Ray `_bucket_pairs` and the SQL
        QUALIFY mirror) — pair sets must stay identical."""
        import pyarrow.parquet as pq
        import ray.data as rd

        n = da.MAX_BUCKET + 30
        base = " ".join(f"tok{i}" for i in range(50))
        rows = [(i, base) for i in range(n)]  # one giant all-identical bucket
        path = str(tmp_path / "docs.parquet")
        pq.write_table(_tbl(rows), path)

        pairs = da.lsh_dup_pairs(rd.read_parquet(path), threshold=0.5).to_pandas()
        ours = set(zip(pairs["doc_a"], pairs["doc_b"]))
        m = da.MAX_BUCKET
        assert len(ours) == m * (m - 1) // 2  # capped, not n*(n-1)/2
        assert max(b for _, b in ours) == m - 1  # only the m lowest ids pair

        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        oracle = con.sql(da.sql_lsh_dup_pairs(threshold=0.5)).df()
        theirs = set(zip(oracle["doc_a"], oracle["doc_b"]))
        assert ours == theirs

    def test_planted_near_dups_found(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        base = " ".join(f"tok{i}" for i in range(120))
        rows = [(i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(60))) for i in range(40)]
        rows.append((100, base))
        rows.append((101, base + " tail drift one"))  # near-dup of 100
        rows.append((102, base))  # exact dup of 100
        path = str(tmp_path / "docs.parquet")
        pq.write_table(_tbl(rows), path)
        ds = rd.read_parquet(path)
        pairs = da.lsh_dup_pairs(ds, threshold=0.5).to_pandas()
        found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
        assert (100, 101) in found
        assert (100, 102) in found
        assert (101, 102) in found
        j = dict(zip(zip(pairs["doc_a"], pairs["doc_b"]), pairs["jaccard"]))
        assert j[(100, 102)] == pytest.approx(1.0)
        assert 0.8 < j[(100, 101)] < 1.0
        # unrelated docs never pair
        assert all(a >= 100 for a, _ in found)

    def test_embedding_topk_pairs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        rng = np.random.default_rng(7)
        mat = rng.normal(size=(50, 16))
        mat[11] = mat[3] + rng.normal(scale=0.01, size=16)  # planted near-dup
        tab = pa.Table.from_pydict(
            {
                "vec_id": pa.array(range(50), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], type=pa.list_(pa.float32())
                ),
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pq.write_table(tab, path)
        out = da.embedding_topk_pairs(path, k=5, batch_size=16).to_pandas()
        assert len(out) == 5
        assert (out.iloc[0]["vec_a"], out.iloc[0]["vec_b"]) == (3, 11)
        assert out.iloc[0]["cos_sim"] > 0.99
        assert (out["cos_sim"].values[:-1] >= out["cos_sim"].values[1:]).all()

    def test_hyperplane_buckets_match_oracle(self, ray_session, tmp_path):
        """Sign-test bit exactness: the numpy dimension-ordered accumulation
        must agree with DuckDB's left-associated literal-coefficient chain
        for every vector (the whole point of the generated oracle)."""
        import pyarrow.parquet as pq
        import ray.data as rd

        rng = np.random.default_rng(11)
        mat = rng.normal(size=(80, 64)).astype(np.float32)
        tab = pa.Table.from_pydict(
            {
                "vec_id": pa.array(range(80), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], type=pa.list_(pa.float32())
                ),
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pq.write_table(tab, path)
        got = (
            rd.read_parquet(path)
            .map_batches(da.add_hyperplane_bucket, batch_format="pyarrow")
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        want = con.sql(
            da.sql_hyperplane_buckets() + " ORDER BY vec_id"
        ).df()
        assert got["bucket"].tolist() == want["bucket"].tolist()

    def test_embedding_lsh_pairs_planted_dup(self, ray_session, tmp_path):
        """A planted near-duplicate collides in its hyperplane bucket and
        survives the cosine threshold; output matches the SQL oracle."""
        import pyarrow.parquet as pq
        import ray.data as rd

        rng = np.random.default_rng(13)
        mat = rng.normal(size=(60, 64))
        mat[41] = mat[7] + rng.normal(scale=0.01, size=64)  # planted near-dup
        tab = pa.Table.from_pydict(
            {
                "vec_id": pa.array(range(60), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], type=pa.list_(pa.float32())
                ),
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pq.write_table(tab, path)
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        got = (
            da.embedding_lsh_pairs(ds, n_planes=8, threshold=0.2)
            .to_pandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        assert ((got["vec_a"] == 7) & (got["vec_b"] == 41)).any()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        want = (
            con.sql(da.sql_embedding_lsh_pairs(n_planes=8, threshold=0.2))
            .df()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        assert got["vec_a"].tolist() == want["vec_a"].tolist()
        assert got["vec_b"].tolist() == want["vec_b"].tolist()
        assert np.allclose(got["cos_sim"], want["cos_sim"], atol=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestContamination:
    def test_flags_overlapping_docs_only(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.dedup_approx import (
            benchmark_shingles,
            contamination_counts,
        )

        bench = ["the quick brown fox jumps over the lazy dog"]
        hashes = benchmark_shingles(bench)
        assert hashes.dtype == np.uint64 and len(hashes) == 7  # 9 words -> 7 3-grams
        docs = [
            (1, "the quick brown fox sat"),         # shares "the quick brown", "quick brown fox"
            (2, "completely unrelated text here"),  # no overlap
            (3, bench[0]),                          # full overlap: all 7
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
                    "text": [d[1] for d in docs],
                }
            )
        )
        got = {
            r["doc_id"]: r["n_shared"]
            for r in contamination_counts(ds, hashes).take_all()
        }
        assert got == {1: 2, 3: 7}

    def test_empty_benchmark_flags_nothing(self):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.dedup_approx import (
            benchmark_shingles,
            contamination_counts,
        )

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": ["x y z"]})
        )
        assert contamination_counts(ds, benchmark_shingles([])).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_dup_shingle_stats_matches_oracle():
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from quickner_ray.stages.dedup_approx import (
        dup_shingle_stats,
        sql_dup_shingle_stats,
    )

    texts = [
        "the quick brown fox jumps",      # shares "the quick brown"+.. with 1
        "the quick brown fox sleeps",
        "completely different words here",
        "tiny",                            # < n words -> single short-shingle
        "tiny",                            # exact dup of 3 -> dup_frac 1.0
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    got = (
        dup_shingle_stats(rd.from_arrow(tbl), num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql("SET threads=2")
    con.register("documents", tbl)
    ora = (
        con.sql(sql_dup_shingle_stats())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "n_shingles", "n_dup", "dup_frac"]
    pd.testing.assert_frame_equal(got[cols], ora[cols], check_dtype=False)
    assert got.loc[3, "dup_frac"] == 1.0 and got.loc[4, "dup_frac"] == 1.0
    assert got.loc[2, "n_dup"] == 0
    assert 0 < got.loc[0, "dup_frac"] < 1


class TestExactSubstringDedup:
    """ExactSubstr (Lee et al.): every duplicated K-word span is removed
    from ALL its occurrences; short docs untouched; fully-duplicated docs
    vanish."""

    def test_crafted_cases_match_duckdb(self, ray_session):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.dedup_substr import (
            exact_substring_dedup,
            sql_exact_substring_dedup,
        )

        span = "a b c d"  # K=3: spans 'a b c' and 'b c d' duplicated
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": [
                    f"x {span} y",          # shares the span with doc 2
                    f"p q {span}",          # second occurrence
                    "short doc",            # < K words: no shingles, kept
                    f"{span}",              # the whole doc IS the span -> vanishes
                    f"self {span} mid {span} end",  # within-doc repeat also counts
                ],
            }
        )
        got = (
            exact_substring_dedup(rd.from_arrow(docs), k=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs)
        ora = (
            con.sql(sql_exact_substring_dedup(k=3))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == ora["doc_id"].tolist()
        assert got["text_clean"].tolist() == ora["text_clean"].tolist()
        assert got["n_kept"].tolist() == ora["n_kept"].tolist()
        by = got.set_index("doc_id")
        assert by.loc[1, "text_clean"] == "x y"
        assert by.loc[2, "text_clean"] == "p q"
        assert by.loc[3, "text_clean"] == "short doc"
        assert 4 not in by.index  # fully-duplicated doc vanished
        # doc 5: both span copies removed, connectors kept
        assert by.loc[5, "text_clean"] == "self mid end"


@pytest.mark.usefixtures("ray_session")
def test_simhash_dup_pairs_pigeonhole():
    """Hamming <= 3 pairs are found (pigeonhole over 4 bands), unrelated
    docs are not paired, and the pair list is layout-invariant."""
    import ray.data as rd

    from quickner_ray.stages.dedup_approx import (
        hamming64,
        simhash_batch,
        simhash_dup_pairs,
    )

    near_a = "the quick brown fox jumps over the lazy dog " * 8
    near_b = near_a + "extra"
    rows = [
        {"doc_id": 1, "text": near_a},
        {"doc_id": 2, "text": near_b},
        {"doc_id": 3, "text": "completely different content about databases"},
    ]
    sh = simhash_batch(pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
    }))
    sims = sh.column("simhash").to_numpy(zero_copy_only=False)
    import numpy as np

    ham12 = int(hamming64(np.array([sims[0]]), np.array([sims[1]]))[0])
    outs = []
    for nblocks in (1, 3):
        got = simhash_dup_pairs(
            rd.from_items(rows, override_num_blocks=nblocks)
        ).take_all()
        outs.append(sorted((r["doc_a"], r["doc_b"], r["hamming"]) for r in got))
    assert outs[0] == outs[1]
    pairs = {(a, b): h for a, b, h in outs[0]}
    if ham12 <= 3:
        assert pairs.get((1, 2)) == ham12
    assert not any(3 in p for p in pairs)  # unrelated doc never paired


class TestExactSimilarityJoin:
    """PPJoin prefix filtering == brute-force all-pairs shingle Jaccard:
    the oracle-equality test runs the full distributed pipeline; the
    randomized test pins no-false-negative completeness at several τ."""

    def _corpus(self, rng, n_docs=50):
        vocab = [f"w{i}" for i in range(30)]
        texts = []
        for _ in range(n_docs):
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 20))]
            texts.append(" ".join(words))
        # planted: exact dup, one-word edit, halved doc, empty docs
        texts[40] = texts[0]
        texts[41] = texts[1] + " extra"
        texts[42] = " ".join(texts[2].split()[: max(2, len(texts[2].split()) // 2)])
        texts[43] = ""
        texts[44] = ""
        return texts

    @pytest.mark.parametrize("tau", [(1, 2), (4, 5)])
    def test_matches_brute_sql(self, ray_session, tmp_path, tau):
        import duckdb
        import pyarrow.parquet as pq
        import random as _random

        import ray.data as rd

        from quickner_ray.stages.setjoin import similarity_join, sql_similarity_join

        texts = self._corpus(_random.Random(17))
        path = str(tmp_path / f"documents_{tau[0]}_{tau[1]}.parquet")
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
        got = (
            similarity_join(ds, tau=tau)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = (
            con.sql(sql_similarity_join(tau=tau))
            .df()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert got.equals(want), (len(got), len(want))
        pairs = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])}
        assert (0, 40) in pairs  # exact dup always found
        if tau == (1, 2):
            assert (43, 44) in pairs  # empty docs share the {0} shingle set
        # exact dup: intersection == union
        row = got[(got["doc_a"] == 0) & (got["doc_b"] == 40)].iloc[0]
        assert row["n_inter"] == row["n_union"]

    def test_hot_reorder_preserves_exactness(self, ray_session, tmp_path):
        """With a tiny hot set the order is genuinely mixed (hot last):
        results must STILL equal the brute join — completeness holds for
        any consistent global order."""
        import duckdb
        import pyarrow.parquet as pq
        import random as _random

        import ray.data as rd

        from quickner_ray.stages.setjoin import similarity_join, sql_similarity_join

        texts = self._corpus(_random.Random(23))
        path = str(tmp_path / "documents_hot.parquet")
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
        got = (
            similarity_join(ds, hot_k=5)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        want = (
            con.sql(sql_similarity_join())
            .df()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert got.equals(want), (len(got), len(want))


@pytest.mark.usefixtures("ray_session")
class TestShingleNovelty:
    def test_first_snapshot_owns_shared_shingles(self, tmp_path):
        """Docs 0 and 8 share snapshot-0-first shingles (doc_id%8==0);
        doc 1 (snap 1) contributes only its own novel shingles."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from quickner_ray.pipelines.queries import q_shingle_novelty

        t = pa.table(
            {
                "doc_id": pa.array([0, 8, 1], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta",      # snap 0
                        "alpha beta gamma epsilon",    # snap 0 (dup shingle)
                        "alpha beta gamma zeta",       # snap 1: only novel
                                                       # shingles counted
                    ],
                    pa.string(),
                ),
            }
        )
        pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
        got = {
            r["first_snap"]: r["n_new_shingles"]
            for r in q_shingle_novelty(str(tmp_path)).take_all()
        }
        # snap 0 shingles: abg, bgd, abg(dup), bge -> {abg, bgd, bge} = 3
        # snap 1: abg seen, bgz new -> 1
        assert got == {0: 3, 1: 1}
