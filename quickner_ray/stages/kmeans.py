"""Distributed Lloyd k-means over an embedding column (euclidean).

The IVF index (similarity.py) trains its coarse centroids driver-side on a
sample — fine for routing, but a *clustering deliverable* must fit on the
full dataset. This is the 100-TB shape for that: every Lloyd iteration is
one streaming ``map_batches`` pass emitting at most ``k`` partial rows per
batch (cluster, member count, per-dimension vector sum), so the driver only
ever reduces a (blocks x k) x d table no matter the corpus size. Centroids
(k x d floats) are broadcast via ``ray.put`` once per iteration.

Determinism: init is the ``k`` vectors with the smallest ids (found with a
per-batch min-k combiner, not a global sort), argmin ties go to the lowest
cluster index, and empty clusters keep their previous centroid — identical
results at any parallelism, so the assignment output is stable across runs
(pinned by tests; driver query is rows-only — per-dim float means drift
ulps between engines, so no exact SQL oracle is claimed).

No counterpart in the reference (pure NER tool) — extension operator for
embedding-corpus curation (cluster-balanced sampling, near-dup pruning).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _mat_from_list_col

DEFAULT_K = 8
DEFAULT_ITERS = 5


def _min_k_partial(batch: pa.Table, k: int, id_col: str) -> pa.Table:
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    take = np.argsort(ids, kind="stable")[:k]
    return batch.take(pa.array(np.sort(take)))


def _init_centroids(ds, k: int, id_col: str) -> np.ndarray:
    """First-k-by-id init: per-batch min-k combiner -> tiny driver reduce.
    Bounded collect (k rows per block), no global sort."""
    partials = ds.map_batches(
        lambda b: _min_k_partial(b, k, id_col), batch_format="pyarrow"
    ).take_all()
    partials.sort(key=lambda r: r[id_col])
    vecs = [np.asarray(r["embedding"], dtype=np.float64) for r in partials[:k]]
    return np.stack(vecs)


def _assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # squared euclidean argmin; ||x||^2 is constant per row, so compare
    # -2 x.c + ||c||^2. np.argmin takes the FIRST minimum -> ties go to the
    # lowest cluster index deterministically.
    d2 = -2.0 * (mat @ cent.T) + (cent * cent).sum(axis=1)
    return d2.argmin(axis=1)


def kmeans_fit(
    ds,
    *,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Fit centroids with ``iters`` full streaming passes; returns (k, d)."""
    import ray

    cent = _init_centroids(ds, k, id_col)
    dim = cent.shape[1]

    for _ in range(iters):
        ref = ray.put(cent)

        def partial_sums(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            mat = _mat_from_list_col(batch.column(emb_col), dim)
            assign = _assign(mat, c)
            used = np.unique(assign)
            counts = np.bincount(assign, minlength=k)[used]
            dense = np.zeros((k, dim), dtype=np.float64)
            np.add.at(dense, assign, mat)  # one scatter-add, O(rows)
            sums = dense[used]
            return pa.Table.from_pydict(
                {
                    "cluster": pa.array(used.astype(np.int64)),
                    "n": pa.array(counts.astype(np.int64)),
                    "vec_sum": pa.array(list(sums)),
                }
            )

        rows = ds.map_batches(partial_sums, batch_format="pyarrow").take_all()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            cl = r["cluster"]
            counts[cl] += r["n"]
            sums[cl] += np.asarray(r["vec_sum"], dtype=np.float64)
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cent


def kmeans_assign(ds, cent: np.ndarray, *, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Final assignment pass: (id_col, cluster). Zero-shuffle."""
    import ray

    ref = ray.put(cent)
    dim = cent.shape[1]

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = _mat_from_list_col(batch.column(emb_col), dim)
        a = _assign(mat, c)
        return pa.Table.from_pydict(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return ds.map_batches(assign_batch, batch_format="pyarrow")


def kmeans(ds, *, k: int = DEFAULT_K, iters: int = DEFAULT_ITERS, id_col: str = "vec_id"):
    cent = kmeans_fit(ds, k=k, iters=iters, id_col=id_col)
    return kmeans_assign(ds, cent, id_col=id_col)


# --- seeded-centroid exact assignment (closed-SQL oracle arm) ---------------
#
# The Lloyd trainer above is the quality path (determinism + recovery
# pinned by tests) but its M-step means drift ulps across engines, so it
# cannot carry an exact SQL oracle. This arm is the stages/ivfpq seeded
# pattern applied to clustering: centroids are a pure function of a fixed
# seed (literal-inlined into DuckDB SQL as repr floats), squared distances
# accumulate in DIMENSION ORDER on BOTH engines (identical left-assoc IEEE
# double adds -> bit-exact d2 -> identical argmin; ties go to the lowest
# cluster id on both sides), so the ASSIGNMENT — the E-step / cluster
# serving shape a curation pipeline runs per batch at 100 TB — is verified
# VALUE-EXACT. Ray side: ONE zero-shuffle map_batches pass with the (k, d)
# centroid matrix broadcast via ray.put.

KMEANS_SEED = 907
SEEDED_KMEANS_DIM = 64
SEEDED_KMEANS_SCALE = 0.1  # match the embedding table's ~N(0, 0.1) spread


def kmeans_seeded_centroids(
    k: int = DEFAULT_K, dim: int = SEEDED_KMEANS_DIM, seed: int = KMEANS_SEED
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((k, dim)) * SEEDED_KMEANS_SCALE


def _d2_dim_order(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Squared euclidean distances accumulated dimension-by-dimension —
    the exact FP evaluation order the SQL oracle's left-assoc '+' uses."""
    acc = np.zeros((mat.shape[0], cent.shape[0]), dtype=np.float64)
    for i in range(mat.shape[1]):
        d = mat[:, i : i + 1] - cent[:, i][None, :]
        acc += d * d
    return acc


def kmeans_assign_seeded(
    ds,
    *,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """(id, cluster) assignment under the seeded centroids. Zero-shuffle;
    bit-exact vs sql_kmeans_assign_seeded."""
    import ray

    cent = kmeans_seeded_centroids(k)
    ref = ray.put(cent)
    dim = cent.shape[1]

    def f(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = _mat_from_list_col(b.column(emb_col), dim)
        a = _d2_dim_order(mat, c).argmin(axis=1)  # first min == lowest cid
        return pa.table(
            {
                id_col: b.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def sql_kmeans_assign_seeded(k: int = DEFAULT_K, table: str = "embeddings") -> str:
    """Closed-SQL twin: centroids inlined as repr literals, d2 in the same
    dimension order, argmin via row_number (d2, cid)."""
    cent = kmeans_seeded_centroids(k)
    C, dim = cent.shape
    cent_cols = ", ".join(f"c{i}" for i in range(dim))
    cent_rows = ",\n".join(
        f"    ({c}, {', '.join(repr(float(v)) for v in cent[c])})"
        for c in range(C)
    )
    d2_expr = "\n      + ".join(
        f"((CAST(embedding[{i + 1}] AS DOUBLE) - c{i})"
        f" * (CAST(embedding[{i + 1}] AS DOUBLE) - c{i}))"
        for i in range(dim)
    )
    return (
        f"WITH cent(cid, {cent_cols}) AS (VALUES\n{cent_rows}),\n"
        f"d AS (SELECT vec_id, cid,\n      {d2_expr}\n    AS d2\n"
        f"  FROM {table} CROSS JOIN cent)\n"
        f"SELECT vec_id, cluster FROM (\n"
        f"  SELECT vec_id, cid AS cluster,\n"
        f"    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn\n"
        f"  FROM d) t WHERE rn = 1"
    )
