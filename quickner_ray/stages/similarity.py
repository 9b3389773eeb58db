"""Similarity search over an embedding column (``list<float>``).

Two paths:

- **Brute force** (baseline, exact): per-batch numpy matmul against a
  broadcast query matrix — ``pipelines/queries.q_similarity_topk``.
- **IVF** (scale path, approximate): a deterministic k-means coarse
  quantizer (seeded, fixed iterations — identical across runs/nodes) is
  trained on a driver-side sample, or on the FULL corpus via streaming
  partial-sum passes (``train_centroids_distributed``, the >10^8-vector
  path); every vector is assigned to its nearest
  centroid in a broadcast ``map_batches`` stage; the index materializes as
  Parquet partitioned BY CLUSTER so a query reads only ``nprobe``
  partitions (partition pruning at the read — the 100TB win: a query
  touches nprobe/n_clusters of the data). Recall < 1 by construction;
  tests pin recall >= 0.9 vs brute force on the synthetic table.

Vectors are float64 throughout scoring (matches the DuckDB
``list_cosine_similarity(CAST(... AS DOUBLE[]))`` oracle).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..kernel.rounding import round_away


def _mat_from_list_col(col, dim: int | None = None) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if dim is None:
        dim = len(col[0])
    return (
        col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    )


def train_centroids(
    mat: np.ndarray, n_clusters: int, *, seed: int = 42, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd k-means on (already unit-normalized) vectors.
    Pure function of (mat, n_clusters, seed, iters) — every node/run gets
    identical centroids, which is what makes the cluster-partitioned index
    layout reproducible/resumable."""
    rng = np.random.default_rng(seed)
    n = mat.shape[0]
    n_clusters = min(n_clusters, n)
    idx = rng.choice(n, size=n_clusters, replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)  # cosine on unit vectors
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cent[c] = m / norm
    return cent


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1.0, norms)


def train_centroids_distributed(
    ds,
    n_clusters: int,
    *,
    iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means over the FULL dataset — the >10^8-vector path
    where a head sample no longer represents the distribution.

    Same geometry as ``train_centroids`` (cosine on unit vectors, empty
    clusters keep their centroid) but each Lloyd iteration is one
    streaming ``map_batches`` pass emitting at most ``n_clusters`` partial
    rows per batch (cluster, count, vector sum) — the driver only reduces
    a (blocks x k) x d table regardless of corpus size (kmeans.py
    pattern). Init matches the driver-side trainer: seeded choice from the
    head ``sample_size`` vectors, so at small scale both trainers start
    identically. Deterministic for a fixed block layout (argmax ties ->
    lowest cluster; partials reduced in block order); across different
    parallelism the float partial-sum grouping can differ by ulps, so
    centroids are parallelism-invariant to np.allclose (pinned by test),
    not bit-identical — fine for a coarse quantizer whose recall bar is
    what's contractual."""
    import ray

    head = ds.limit(sample_size).take_all()
    mat0 = _unit(
        np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in head])
    )
    rng = np.random.default_rng(seed)
    n = mat0.shape[0]
    n_clusters = min(n_clusters, n)
    cent = mat0[np.sort(rng.choice(n, size=n_clusters, replace=False))].copy()
    dim = cent.shape[1]
    k = n_clusters

    for _ in range(iters):
        ref = ray.put(cent)

        def partial_sums(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            mat = _unit(_mat_from_list_col(batch.column(emb_col), dim))
            assign = (mat @ c.T).argmax(axis=1)
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
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            cl = r["cluster"]
            counts[cl] += r["n"]
            sums[cl] += np.asarray(r["vec_sum"], dtype=np.float64)
        cent = cent.copy()
        for c in range(k):
            if counts[c]:
                norm = np.linalg.norm(sums[c])
                if norm > 0:
                    cent[c] = sums[c] / norm
    return cent


class ClusterAssigner:
    """Broadcast-centroid ``map_batches`` stage: adds ``cluster_id``."""

    def __init__(self, cent_ref):
        import ray

        cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.cent = cent
        self.dim = cent.shape[1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _unit(_mat_from_list_col(batch.column("embedding"), self.dim))
        assign = (mat @ self.cent.T).argmax(axis=1)
        return batch.append_column("cluster_id", pa.array(assign.astype(np.int64)))


def build_ivf_index(
    emb_path: str,
    out_dir: str,
    *,
    n_clusters: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    train_on: str = "sample",
) -> np.ndarray:
    """Build a cluster-partitioned Parquet index. Returns the centroids.

    ``train_on="sample"``: centroids train on a head sample (driver-side,
    bounded memory — fine while the head represents the distribution).
    ``train_on="full"``: distributed spherical k-means over every vector
    via streaming partial-sum passes (``train_centroids_distributed``) —
    the >10^8-vector path. Assignment is a streaming broadcast map either
    way; the write partitions by ``cluster_id`` so queries prune at the
    read."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    if train_on == "full":
        full = rd.read_parquet(emb_path, columns=["embedding"])
        cent = train_centroids_distributed(
            full, n_clusters, sample_size=sample_size, seed=seed
        )
    else:
        head = pq.ParquetFile(emb_path)
        sample_batches = []
        got = 0
        for rb in head.iter_batches(batch_size=1024, columns=["embedding"]):
            sample_batches.append(rb)
            got += rb.num_rows
            if got >= sample_size:
                break
        sample = pa.Table.from_batches(sample_batches)
        mat = _unit(_mat_from_list_col(sample.column("embedding")))
        cent = train_centroids(mat[:sample_size], n_clusters, seed=seed)

    cent_ref = ray.put(cent)
    ds = rd.read_parquet(emb_path, columns=[id_col, "embedding"])
    from .taskstate import task_stage

    ds = ds.map_batches(
        task_stage(ClusterAssigner, cent_ref=cent_ref), batch_format="pyarrow"
    )
    ds.write_parquet(out_dir, partition_cols=["cluster_id"])
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    return cent


def query_ivf_index(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
):
    """Top-k by cosine among the ``nprobe`` nearest clusters. Reads ONLY
    those partitions (everything else never leaves storage)."""
    import ray
    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    probe = np.argsort(-(cent @ q))[:nprobe]
    files = []
    for c in probe:
        d = os.path.join(index_dir, f"cluster_id={c}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    ds = rd.read_parquet(files, columns=[id_col, "embedding"])
    q_ref = ray.put(q)

    class Score:
        def __init__(self, q_ref):
            self.q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _mat_from_list_col(batch.column("embedding"), len(self.q))
            norms = np.linalg.norm(mat, axis=1)
            cos = (mat @ self.q) / np.where(norms == 0, 1.0, norms)
            cos = round_away(cos, 6)
            n_local = min(k, len(cos))
            top = (
                np.argpartition(-cos, n_local - 1)[:n_local]
                if len(cos) > n_local
                else np.arange(len(cos))
            )
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return pa.Table.from_pydict(
                {
                    id_col: ids.take(pa.array(top, type=pa.int64())),
                    "cos_sim": pa.array(cos[top], type=pa.float64()),
                }
            )

    from .taskstate import task_stage

    ds = ds.map_batches(task_stage(Score, q_ref=q_ref), batch_format="pyarrow")
    return ds.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


def ivf_topk(
    emb_path: str,
    query_id: int,
    k: int = 10,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    index_dir: str | None = None,
):
    """End-to-end IVF query: build (or reuse) the index, then probe.

    ``index_dir`` defaults to a deterministic /tmp path keyed by the input;
    an existing index (with centroids.npy present) is reused — the build is
    the amortized cost, queries prune partitions.
    """
    import hashlib

    import pyarrow.parquet as pq

    if index_dir is None:
        # content fingerprint (size+mtime) in the key: regenerated
        # embeddings at the same path must rebuild, not serve stale
        st = os.stat(emb_path)
        key = hashlib.md5(
            f"{os.path.abspath(emb_path)}:{st.st_size}:{st.st_mtime_ns}"
            f":{n_clusters}".encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/quickner_ivf/{key}"
    if not os.path.exists(os.path.join(index_dir, "centroids.npy")):
        os.makedirs(index_dir, exist_ok=True)
        build_ivf_index(emb_path, index_dir, n_clusters=n_clusters)
    qvec = fetch_vector(emb_path, query_id)
    return query_ivf_index(index_dir, qvec, k, nprobe=nprobe)


def fetch_vector(emb_path: str, query_id: int, id_col: str = "vec_id") -> np.ndarray:
    """Fetch ONE embedding by id without reading the whole table: parquet
    row-group statistics prune to the group(s) that can contain the id, then
    a vectorized filter picks the row."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(emb_path)
    ncols = pf.schema_arrow.names
    col_idx = ncols.index(id_col)
    groups = []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(col_idx).statistics
        if st is None or st.min is None or (st.min <= query_id <= st.max):
            groups.append(rg)
    tab = pf.read_row_groups(groups, columns=[id_col, "embedding"])
    row = tab.filter(pc.equal(tab.column(id_col), query_id))
    if row.num_rows == 0:
        raise KeyError(f"{id_col}={query_id} not found in {emb_path}")
    return np.asarray(row.column("embedding")[0].as_py(), dtype=np.float64)
