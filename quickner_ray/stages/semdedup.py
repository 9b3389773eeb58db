"""SemDeDup: semantic deduplication in embedding space.

SemDeDup (Abbas et al., 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") prunes training corpora by
k-means-clustering document embeddings and, within each cluster, dropping
every item whose cosine similarity to another kept item exceeds a
threshold tau — semantic near-duplicates that exact/MinHash dedup misses
(paraphrases, templated rewrites).

This implementation keeps the paper's two-phase shape:

1. **cluster** — the distributed Lloyd pass from :mod:`.kmeans`
   (streaming partial-sum fits, broadcast centroids, deterministic at any
   parallelism); assignment is a zero-shuffle per-batch argmax.
2. **within-cluster prune** — ONE shuffle on the cluster key
   (``groupby(cluster).map_groups``): per cluster, rows are ordered by id
   and greedily kept unless cosine-similar (>= tau) to an already-kept
   row. Keep-lowest-id is the deterministic stand-in for the paper's
   keep-farthest-from-centroid rule (both are a pass over the same
   within-cluster similarity matrix).

Scale: within-cluster work is an |C| x d matmul; |C| is bounded by
``cluster_cap`` (the same quadratic guard as LSH's ``MAX_BUCKET`` — at
100 TB you grow k with the corpus so mean |C| stays fixed, and the cap
turns adversarial mega-clusters into a bounded, logged approximation).
Rows-only driver check: k-means float means drift ulps across engines, so
no exact SQL oracle; determinism, duplicate-collapse and the brute-force
single-cluster equivalence are pinned by tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kmeans import (
    DEFAULT_ITERS,
    DEFAULT_K,
    _assign,
    _mat_from_list_col,
    kmeans_fit,
)

DEFAULT_TAU = 0.95
CLUSTER_CAP = 4096  # pairwise-prune guard per cluster (rows beyond keep)


def _greedy_keep(mat: np.ndarray, tau: float) -> np.ndarray:
    """Greedy prune over id-ordered unit rows: keep row i unless some
    already-kept j < i has cos(i, j) >= tau. Returns a bool keep mask."""
    n = len(mat)
    keep = np.ones(n, dtype=bool)
    if n <= 1:
        return keep
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    sim = unit @ unit.T  # |C| x |C|, bounded by cluster_cap
    for i in range(1, n):
        if (sim[i, :i][keep[:i]] >= tau).any():
            keep[i] = False
    return keep


def semdedup(
    ds,
    *,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    tau: float = DEFAULT_TAU,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_cap: int = CLUSTER_CAP,
    centroids: "np.ndarray | None" = None,
):
    """Dataset(id_col, cluster, keep) — ``keep=1`` rows survive semantic
    dedup; every input row appears exactly once. Pass ``centroids`` to
    reuse a fitted model (e.g. the IVF trainer's)."""
    import ray

    cent = centroids if centroids is not None else kmeans_fit(
        ds, k=k, iters=iters, id_col=id_col, emb_col=emb_col
    )
    dim = cent.shape[1]
    ref = ray.put(cent)

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = _mat_from_list_col(batch.column(emb_col), dim)
        return pa.table(
            {
                id_col: batch.column(id_col),
                emb_col: batch.column(emb_col),
                "cluster": pa.array(_assign(mat, c).astype(np.int64)),
            }
        )

    assigned = ds.map_batches(assign_batch, batch_format="pyarrow")

    def prune(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ids = group.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        order = pa.compute.sort_indices(ids).to_numpy(zero_copy_only=False)
        mat = _mat_from_list_col(group.column(emb_col), dim)[order]
        keep = np.ones(len(order), dtype=bool)
        # beyond the cap rows are kept un-compared (bounded approximation,
        # mirroring the LSH MAX_BUCKET contract)
        keep[:cluster_cap] = _greedy_keep(mat[:cluster_cap], tau)
        idx = pa.array(order)
        return pa.table(
            {
                id_col: ids.take(idx),
                "cluster": group.column("cluster").take(idx),
                "keep": pa.array(keep.astype(np.int64), type=pa.int64()),
            }
        )

    return assigned.groupby("cluster").map_groups(prune, batch_format="pyarrow")
