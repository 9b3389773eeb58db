"""Product-quantization (PQ) vector compression + ADC top-k search.

The 100-TB embedding-search structure IVF (stages/similarity.py) routes
*reads*; PQ compresses the *residency*: a 64-dim float32 vector (256 B)
becomes ``m`` uint8 codes (here 4 B), so a 10^12-vector corpus fits in
object-store-resident code tables and a query scans codes with an m x k
lookup table (ADC — asymmetric distance computation) instead of touching
raw vectors. Jegou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011).

Two codebook sources:

* ``pq_codebooks()`` — deterministic SEEDED (data-independent) codebooks,
  the oracle path: every centroid coefficient is inlined into the DuckDB
  SQL as a repr-round-trip literal (the hyperplane-LSH pattern,
  dedup_approx.sql_hyperplane_buckets), and every float accumulation on
  the Ray side runs IN DIMENSION ORDER (acc += term, left-associated)
  so encode codes AND ADC distances match the SQL bit-for-bit.
* ``pq_train()`` — per-subspace distributed Lloyd over the full dataset:
  ONE streaming pass per iteration emits <= m*k partial rows per batch
  ((sub, cluster, n, vec_sum)), the driver reduces a (blocks x m*k) x dsub
  table — corpus-size-independent, same shape as stages/kmeans.py.
  Deterministic (first-k-by-id init per subspace, first-min argmin ties,
  empty clusters hold position) hence parallelism-invariant (pinned by
  tests; no SQL oracle claimed for the trained path — k-means is the
  legitimately un-SQL-able step, as with stages/kmeans.py).

Scale shape: encode is a zero-shuffle map_batches (codebooks broadcast via
``ray.put`` once); search is a per-batch LUT scan + k-bounded local top-k
combiner, then one k-row global sort — no all-to-all anywhere.

Reference: n/a — no counterpart (extension operator for embedding-corpus
curation / similarity search at scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _mat_from_list_col

PQ_M = 4  # subspaces (oracle config)
PQ_KS = 4  # centroids per subspace (oracle config: m*k = 16 literal rows)
PQ_DIM = 64
PQ_SEED = 1306
PQ_QUERY_SEED = 1307
PQ_TOPK = 10


def pq_codebooks(
    m: int = PQ_M, k: int = PQ_KS, dim: int = PQ_DIM, seed: int = PQ_SEED
) -> np.ndarray:
    """Seeded data-independent codebooks, shape (m, k, dim//m) float64.
    Standard normals — the same family the embedding fixture draws from,
    so seeded cells still partition the space usefully."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, k, dim // m))


def pq_query_vector(dim: int = PQ_DIM, seed: int = PQ_QUERY_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def _sub_dists(mat64: np.ndarray, cb: np.ndarray, off: int) -> np.ndarray:
    """(n, k) squared-L2 distances of rows' subvector [off:off+dsub] to the
    k centroids of one subspace, accumulated IN DIMENSION ORDER so the
    left-associated SQL ``+`` chain matches bit-for-bit."""
    k, dsub = cb.shape
    acc = np.zeros((mat64.shape[0], k), dtype=np.float64)
    for i in range(dsub):
        diff = mat64[:, off + i : off + i + 1] - cb[:, i][None, :]
        acc += diff * diff
    return acc


def pq_encode_batch(
    batch: pa.Table,
    cbs: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """(id, code_0..code_{m-1}) — argmin cell per subspace, first-min ties
    (== SQL ORDER BY dist, cid)."""
    m, k, dsub = cbs.shape
    mat = _mat_from_list_col(batch.column(emb_col), m * dsub).astype(np.float64)
    cols = {id_col: batch.column(id_col)}
    for j in range(m):
        codes = _sub_dists(mat, cbs[j], j * dsub).argmin(axis=1)
        cols[f"code_{j}"] = pa.array(codes.astype(np.int64))
    return pa.table(cols)


def pq_encode(ds, cbs: np.ndarray, *, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Zero-shuffle encode pass; codebooks broadcast once via ray.put."""
    import ray

    ref = ray.put(cbs)

    def f(b: pa.Table) -> pa.Table:
        return pq_encode_batch(b, ray.get(ref), id_col=id_col, emb_col=emb_col)

    return ds.map_batches(f, batch_format="pyarrow")


def adc_lut(cbs: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(m, k) LUT of squared-L2 distances from the query's subvectors to
    every centroid — dimension-order accumulation, SQL-exact."""
    m, k, dsub = cbs.shape
    return np.stack(
        [_sub_dists(query[None, :].astype(np.float64), cbs[j], j * dsub)[0] for j in range(m)]
    )


def pq_topk(
    codes_ds,
    cbs: np.ndarray,
    query: np.ndarray,
    *,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
):
    """ADC top-k over a PQ-coded Dataset: per-batch LUT gather + local
    top-k combiner (<= k rows leave each batch), ONE k-bounded global
    sort. ``adc_dist`` sums the m LUT entries left-associated (SQL-exact);
    ties break on the id."""
    import ray

    lut = adc_lut(cbs, query)
    m = lut.shape[0]
    ref = ray.put(lut)

    def local_topk(b: pa.Table) -> pa.Table:
        t = ray.get(ref)
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "adc_dist": pa.array([], type=pa.float64()),
                }
            )
        dist = np.zeros(n, dtype=np.float64)
        for j in range(m):
            cj = b.column(f"code_{j}").to_numpy(zero_copy_only=False)
            dist += t[j][cj]
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, dist))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "adc_dist": pa.array(dist[order]),
            }
        )

    return codes_ds.map_batches(local_topk, batch_format="pyarrow").sort(
        ["adc_dist", id_col]
    ).limit(k)


# --- trained codebooks (per-subspace distributed Lloyd) ----------------------


def pq_train(
    ds,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = PQ_DIM,
) -> np.ndarray:
    """Fit (m, k, dim//m) codebooks: all subspaces in ONE streaming pass
    per iteration (<= m*k partial rows per batch). Deterministic at any
    parallelism: first-k-by-id init, first-min ties, empty cells hold."""
    import ray

    dsub = dim // m
    # init: subvectors of the k lowest-id vectors (bounded min-k combiner)
    def min_k(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        take = np.argsort(ids, kind="stable")[:k]
        return b.take(pa.array(np.sort(take)))

    first = ds.map_batches(min_k, batch_format="pyarrow").take_all()
    first.sort(key=lambda r: r[id_col])
    base = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in first[:k]])
    cbs = np.stack([base[:, j * dsub : (j + 1) * dsub] for j in range(m)])

    for _ in range(iters):
        ref = ray.put(cbs)

        def partials(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            mat = _mat_from_list_col(b.column(emb_col), dim).astype(np.float64)
            subs, cls, ns, sums = [], [], [], []
            for j in range(m):
                assign = _sub_dists(mat, c[j], j * dsub).argmin(axis=1)
                used = np.unique(assign)
                counts = np.bincount(assign, minlength=k)[used]
                dense = np.zeros((k, dsub), dtype=np.float64)
                np.add.at(dense, assign, mat[:, j * dsub : (j + 1) * dsub])
                subs.extend([j] * len(used))
                cls.extend(used.tolist())
                ns.extend(counts.tolist())
                sums.extend(list(dense[used]))
            return pa.Table.from_pydict(
                {
                    "sub": pa.array(subs, type=pa.int64()),
                    "cluster": pa.array(cls, type=pa.int64()),
                    "n": pa.array(ns, type=pa.int64()),
                    "vec_sum": pa.array(sums),
                }
            )

        rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
        counts = np.zeros((m, k), dtype=np.int64)
        sums = np.zeros((m, k, dsub), dtype=np.float64)
        for r in rows:
            counts[r["sub"], r["cluster"]] += r["n"]
            sums[r["sub"], r["cluster"]] += np.asarray(r["vec_sum"], dtype=np.float64)
        cbs = cbs.copy()
        ne = counts > 0
        cbs[ne] = sums[ne] / counts[ne][:, None]
    return cbs


# --- SQL oracles (seeded codebooks, literal coefficients) ---------------------


def _cent_values_sql(cbs: np.ndarray) -> str:
    m, k, dsub = cbs.shape
    rows = []
    for j in range(m):
        for c in range(k):
            coeffs = ", ".join(repr(float(v)) for v in cbs[j, c])
            rows.append(f"    ({j}, {c}, {coeffs})")
    cols = ", ".join(f"c{i}" for i in range(dsub))
    return (
        f"cent(sub, cid, {cols}) AS (VALUES\n" + ",\n".join(rows) + ")"
    )


def _dist_expr_sql(dsub: int) -> str:
    terms = []
    for i in range(dsub):
        e = f"(CAST(embedding[sub * {dsub} + {i + 1}] AS DOUBLE) - c{i})"
        terms.append(f"{e} * {e}")
    return "\n      + ".join(terms)


def sql_pq_codes(table: str = "embeddings") -> str:
    """Oracle for pq_encode over the seeded codebooks: literal centroid
    rows, the identical left-associated distance chain, argmin via
    row_number ORDER BY dist, cid."""
    cbs = pq_codebooks()
    m, k, dsub = cbs.shape
    pivots = ",\n".join(
        f"  max(CASE WHEN sub = {j} THEN cid END) AS code_{j}" for j in range(m)
    )
    return (
        f"WITH {_cent_values_sql(cbs)},\n"
        f"d AS (\n"
        f"  SELECT e.vec_id, c.sub, c.cid,\n"
        f"      {_dist_expr_sql(dsub)} AS dist\n"
        f"  FROM {table} e CROSS JOIN cent c),\n"
        f"best AS (\n"
        f"  SELECT vec_id, sub, cid,\n"
        f"    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn\n"
        f"  FROM d)\n"
        f"SELECT vec_id,\n{pivots}\n"
        f"FROM best WHERE rn = 1 GROUP BY vec_id"
    )


def sql_pq_topk(table: str = "embeddings", topk: int = PQ_TOPK) -> str:
    """Oracle for pq_topk: recompute the codes CTE, build the ADC LUT from
    the same literal centroids + literal query subvectors, sum the m LUT
    entries left-associated, ORDER BY dist, vec_id LIMIT k."""
    cbs = pq_codebooks()
    m, k, dsub = cbs.shape
    q = pq_query_vector()
    lut_terms = []
    for i in range(dsub):
        e = f"(CAST(qsub[sub * {dsub} + {i + 1}] AS DOUBLE) - c{i})"
        lut_terms.append(f"{e} * {e}")
    qlit = ", ".join(repr(float(v)) for v in q)
    adc = " + ".join(f"l{j}.ld" for j in range(m))
    joins = "\n".join(
        f"JOIN lut l{j} ON l{j}.sub = {j} AND l{j}.cid = codes.code_{j}"
        for j in range(m)
    )
    codes_sql = sql_pq_codes(table)
    return (
        f"WITH codes AS (\n{codes_sql}\n),\n"
        f"{_cent_values_sql(cbs)},\n"
        f"lut AS (\n"
        f"  SELECT sub, cid,\n"
        f"      {'      + '.join(t + chr(10) for t in lut_terms)}"
        f"      AS ld\n"
        f"  FROM (SELECT sub, cid, {', '.join(f'c{i}' for i in range(dsub))},\n"
        f"        [{qlit}]::DOUBLE[] AS qsub FROM cent) c)\n"
        f"SELECT codes.vec_id, {adc} AS adc_dist\n"
        f"FROM codes\n{joins}\n"
        f"ORDER BY adc_dist, codes.vec_id LIMIT {topk}"
    )
