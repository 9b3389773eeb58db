"""Distributed Lloyd k-means: exact recovery on separable clusters,
determinism across parallelism, empty-cluster preservation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(vecs, ids=None):
    vecs = np.asarray(vecs, dtype=np.float32)
    n = len(vecs)
    ids = list(range(n)) if ids is None else ids
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_recovers_separable_clusters(self):
        import ray.data as rd

        from quickner_ray.stages.kmeans import kmeans

        rng = np.random.default_rng(3)
        centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
        vecs = np.concatenate(
            [c + 0.1 * rng.normal(size=(20, 2)) for c in centers]
        )
        out = kmeans(rd.from_arrow(_emb_table(vecs)), k=3, iters=5).take_all()
        got = {r["vec_id"]: r["cluster"] for r in out}
        # every true cluster maps to exactly one label, and labels differ
        labels = [
            {got[i] for i in range(s, s + 20)} for s in (0, 20, 40)
        ]
        assert all(len(s) == 1 for s in labels)
        assert len({next(iter(s)) for s in labels}) == 3

    def test_deterministic_across_block_layouts(self):
        import ray.data as rd

        from quickner_ray.stages.kmeans import kmeans

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(120, 8))
        tbl = _emb_table(vecs)
        a = {r["vec_id"]: r["cluster"]
             for r in kmeans(rd.from_arrow(tbl), k=4, iters=3).take_all()}
        b = {r["vec_id"]: r["cluster"]
             for r in kmeans(rd.from_arrow(tbl).repartition(7), k=4, iters=3).take_all()}
        assert a == b

    def test_empty_cluster_keeps_centroid(self):
        import ray.data as rd

        from quickner_ray.stages.kmeans import kmeans_fit

        # 4 identical points, k=2: init picks ids 0,1 (identical vectors) ->
        # all points go to cluster 0 (lowest-index tie rule); cluster 1 is
        # empty every iteration and must keep its init centroid, not NaN.
        vecs = np.ones((4, 3))
        cent = kmeans_fit(rd.from_arrow(_emb_table(vecs)), k=2, iters=3)
        assert not np.isnan(cent).any()
        assert np.allclose(cent, 1.0)


@pytest.mark.usefixtures("ray_session")
class TestSeededAssign:
    def test_matches_naive_and_sql_order(self):
        """Engine assignment == naive per-row dimension-order argmin."""
        import ray.data as rd

        from quickner_ray.stages.kmeans import (
            _d2_dim_order,
            kmeans_assign_seeded,
            kmeans_seeded_centroids,
        )

        rng = np.random.default_rng(11)
        mat = rng.standard_normal((120, 64)).astype(np.float32) * 0.1
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(120), type=pa.int64()),
                    "embedding": pa.array([list(map(float, r)) for r in mat]),
                }
            )
        ).repartition(5)
        got = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign_seeded(ds).take_all()
        }
        cent = kmeans_seeded_centroids()
        ref = _d2_dim_order(mat.astype(np.float64), cent).argmin(axis=1)
        assert got == {i: int(ref[i]) for i in range(120)}

    def test_sql_twin_matches_on_duckdb(self):
        """The literal-inlined SQL twin is value-identical on DuckDB."""
        import duckdb
        import ray.data as rd

        from quickner_ray.stages.kmeans import (
            kmeans_assign_seeded,
            sql_kmeans_assign_seeded,
        )

        rng = np.random.default_rng(12)
        mat = rng.standard_normal((40, 64)).astype(np.float32) * 0.1
        tbl = pa.table(
            {
                "vec_id": pa.array(range(40), type=pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat]),
            }
        )
        con = duckdb.connect()
        con.register("embeddings", tbl)
        want = dict(con.sql(
            "SELECT vec_id, cluster FROM (" + sql_kmeans_assign_seeded() + ") t"
        ).fetchall())
        ds = rd.from_arrow(tbl)
        got = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign_seeded(ds).take_all()
        }
        assert got == {k: int(v) for k, v in want.items()}
