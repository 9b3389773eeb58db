"""Composed IVF-PQ index (stages/ivfpq.py): recall vs brute force, the
m-bytes-per-vector residency claim, and read pruning to probed clusters."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickner_ray.stages import ivfpq
from quickner_ray.stages.similarity import _unit


def _write_embeddings(path: str, n: int = 300, dim: int = 16, n_clusters: int = 5):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(n_clusters, dim)) * 4
    mat = centers[np.arange(n) % n_clusters] + rng.normal(size=(n, dim))
    tab = pa.Table.from_pydict(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tab, path)
    return mat


class TestIVFPQ:
    def test_recall_and_memory_per_vector(self, ray_session, tmp_path):
        emb = str(tmp_path / "emb.parquet")
        mat = _write_embeddings(emb)
        index_dir = str(tmp_path / "ivfpq")
        pq_m = 8
        cent, cbs = ivfpq.build_ivfpq_index(
            emb, index_dir, n_clusters=8, pq_m=pq_m, pq_ks=16
        )
        assert cbs.shape == (pq_m, 16, 2)

        # --- residency: the index payload is pq_m uint8 codes per vector,
        # no embedding column anywhere in the written files
        parts = [d for d in os.listdir(index_dir) if d.startswith("cluster_id=")]
        assert 1 < len(parts) <= 8
        total = 0
        for d in parts:
            t = pq.read_table(os.path.join(index_dir, d))
            total += t.num_rows
            assert "embedding" not in t.column_names
            code_cols = [c for c in t.column_names if c.startswith("code_")]
            assert len(code_cols) == pq_m
            for c in code_cols:
                assert t.schema.field(c).type == pa.uint8(), c
        assert total == 300  # every vector in exactly one partition

        # --- recall vs exact cosine brute force
        unit = _unit(mat.astype(np.float64))
        for qid in (0, 7, 42):
            q = mat[qid].astype(np.float64)
            got = ivfpq.query_ivfpq_index(index_dir, q, k=10, nprobe=4).to_pandas()
            cos = unit @ (q / np.linalg.norm(q))
            exact = set(np.argsort(-cos)[:10])
            recall = len(exact & set(got["vec_id"])) / 10
            assert recall >= 0.9, (qid, recall)
            assert got.iloc[0]["vec_id"] == qid  # top-1 is the query itself

    def test_query_scans_only_probed_clusters(self, ray_session, tmp_path):
        emb = str(tmp_path / "emb.parquet")
        _write_embeddings(emb)
        index_dir = str(tmp_path / "ivfpq")
        cent, _ = ivfpq.build_ivfpq_index(emb, index_dir, n_clusters=8)
        ds = ivfpq.query_ivfpq_index(index_dir, cent[0], k=5, nprobe=2)
        parts = {
            f.split("cluster_id=")[1].split("/")[0] for f in ds.input_files()
        }
        assert len(parts) <= 2

    def test_full_corpus_trainer_arm(self, ray_session, tmp_path):
        """train_on='full' (streaming distributed coarse trainer) builds an
        index meeting the same recall bar as the sample trainer."""
        emb = str(tmp_path / "emb.parquet")
        mat = _write_embeddings(emb)
        index_dir = str(tmp_path / "ivfpq_full")
        ivfpq.build_ivfpq_index(
            emb, index_dir, n_clusters=8, pq_m=8, pq_ks=16, train_on="full"
        )
        unit = _unit(mat.astype(np.float64))
        for qid in (0, 42):
            q = mat[qid].astype(np.float64)
            got = ivfpq.query_ivfpq_index(index_dir, q, k=10, nprobe=4).to_pandas()
            exact = set(np.argsort(-(unit @ (q / np.linalg.norm(q))))[:10])
            assert len(exact & set(got["vec_id"])) / 10 >= 0.9, qid
            assert got.iloc[0]["vec_id"] == qid

    def test_seeded_arm_matches_sql_oracle(self, ray_session, tmp_path):
        """The literal-inlined seeded config must be bit-exact against its
        DuckDB oracle (routing + residual encode + ADC, dimension-order
        accumulation), at any block layout."""
        import duckdb

        emb = str(tmp_path / "emb.parquet")
        _write_embeddings(emb, n=200, dim=64)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb}'")
        want = con.sql(ivfpq.sql_ivfpq_seeded()).fetchall()
        import ray.data as rd

        got = [
            (r["vec_id"], r["adc_dist"])
            for r in ivfpq.ivfpq_topk_seeded(emb).take_all()
        ]
        assert got == want and len(got) == 10
        # layout invariance of the per-batch scan kernel
        cent = ivfpq.ivfpq_seeded_centroids()
        cbs = ivfpq.ivfpq_seeded_codebooks()
        from quickner_ray.stages.pq import pq_query_vector

        probe, luts = ivfpq.seeded_probe_and_luts(cent, cbs, pq_query_vector())
        tab = pq.read_table(emb)
        one = ivfpq.seeded_scan_batch(tab, cent, cbs, probe, luts, 10)
        chunks = [
            ivfpq.seeded_scan_batch(tab.slice(s, 37), cent, cbs, probe, luts, 10)
            for s in range(0, tab.num_rows, 37)
        ]
        allp = pa.concat_tables(chunks)
        ids = allp.column("vec_id").to_numpy()
        dist = allp.column("adc_dist").to_numpy()
        order = np.lexsort((ids, dist))[:10]
        assert list(zip(ids[order].tolist(), dist[order].tolist())) == [
            (r["vec_id"], r["adc_dist"])
            for r in pa.Table.to_pylist(one)
        ] == want

    def test_end_to_end_cached(self, ray_session, tmp_path):
        emb = str(tmp_path / "emb.parquet")
        _write_embeddings(emb)
        index_dir = str(tmp_path / "cache" / "idx")
        out1 = ivfpq.ivfpq_topk(emb, 0, k=10, index_dir=index_dir).take_all()
        # second call reuses the index (marker = codebooks.npy)
        mark = os.path.getmtime(os.path.join(index_dir, "codebooks.npy"))
        out2 = ivfpq.ivfpq_topk(emb, 0, k=10, index_dir=index_dir).take_all()
        assert os.path.getmtime(os.path.join(index_dir, "codebooks.npy")) == mark
        assert [r["vec_id"] for r in out1] == [r["vec_id"] for r in out2]
        assert out1[0]["vec_id"] == 0
