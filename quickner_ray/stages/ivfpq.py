"""Composed IVF-PQ index: IVF routing over PQ-compressed residual codes.

IVF (stages/similarity.py) routes *reads* — a query touches only
``nprobe``/``n_clusters`` of the corpus; PQ (stages/pq.py) compresses
*residency* — a vector lives as ``m`` uint8 codes instead of dim×4 bytes.
This module composes them into the actual billion-vector serving
structure (Jegou, Douze, Schmid, TPAMI 2011 §IV: IVFADC):

* **Build** (one streaming pass each):
  1. coarse centroids = deterministic spherical k-means on unit vectors
     (sample-head or full-corpus streaming trainer, similarity.py);
  2. PQ codebooks trained per-subspace on RESIDUALS ``x_unit − c(x)``
     (the residual distribution is much tighter than the raw one, so the
     same ``m × ks`` budget buys far more resolution);
  3. encode = one broadcast map_batches: assign cluster, subtract the
     centroid, PQ-encode the residual, emit ``(vec_id, code_0..m-1)`` as
     **uint8** columns, written partitioned BY CLUSTER. The index payload
     is m bytes per vector (pinned by test) — raw embeddings never enter
     the index.
* **Query**: pick ``nprobe`` clusters by centroid cosine; build ONE
  (m × ks) ADC look-up table PER PROBED CLUSTER from
  ``q_unit − c`` vs the shared codebooks; scan only those partitions'
  code columns with a per-batch LUT gather + k-bounded local top-k
  combiner; one k-row global sort. No all-to-all; unprobed partitions
  never leave storage.

Vectors are unit-normalized on both sides, so squared-L2 ADC ranks like
cosine (``||q−x||² = 2 − 2·cos`` on the sphere); recall ≥ 0.9 vs brute
force is pinned by tests the same way the plain-IVF path is.

Reference: n/a — no counterpart (extension operator; composition asked
for by VERDICT r3 item 4).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .pq import _sub_dists, pq_query_vector, pq_train
from .similarity import (
    _mat_from_list_col,
    _unit,
    fetch_vector,
    train_centroids,
    train_centroids_distributed,
)

DEFAULT_NPROBE = 8


def _assign_unit(mat_unit: np.ndarray, cent: np.ndarray) -> np.ndarray:
    return (mat_unit @ cent.T).argmax(axis=1)


def _residual_codes(
    batch: pa.Table, cent: np.ndarray, cbs: np.ndarray, *, id_col: str, emb_col: str
) -> pa.Table:
    """(id, cluster_id, code_0..m-1 uint8): assign, subtract centroid,
    PQ-encode the residual — the single encode pass."""
    m, ks, dsub = cbs.shape
    dim = m * dsub
    mat = _unit(_mat_from_list_col(batch.column(emb_col), dim))
    assign = _assign_unit(mat, cent)
    res = mat - cent[assign]
    cols = {
        id_col: batch.column(id_col),
        "cluster_id": pa.array(assign.astype(np.int64)),
        # cid rides INSIDE the file too (uint8, +1 byte/vector; uint32
        # above 256 clusters): the partition column vanishes from the file
        # bytes, and the query reads all probed dirs in ONE read_parquet
        # (an 8-way Dataset union of per-cluster reads measured 15x
        # slower than the scan)
        "cid": (
            pa.array(assign.astype(np.uint8), type=pa.uint8())
            if cent.shape[0] <= 256
            else pa.array(assign.astype(np.uint32), type=pa.uint32())
        ),
    }
    for j in range(m):
        codes = _sub_dists(res, cbs[j], j * dsub).argmin(axis=1)
        cols[f"code_{j}"] = pa.array(codes.astype(np.uint8), type=pa.uint8())
    return pa.table(cols)


def build_ivfpq_index(
    emb_path: str,
    out_dir: str,
    *,
    n_clusters: int = 16,
    pq_m: int = 8,
    pq_ks: int = 16,
    pq_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    train_on: str = "sample",
) -> tuple[np.ndarray, np.ndarray]:
    """Build the cluster-partitioned code index; returns (centroids,
    codebooks). ``train_on`` picks the coarse-quantizer trainer exactly as
    ``similarity.build_ivf_index`` does."""
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd

    if pq_ks > 256:
        raise ValueError(f"pq_ks={pq_ks} > 256 does not fit uint8 codes")

    # ---- coarse centroids (same two trainers as the plain IVF index) -----
    if train_on == "full":
        full = rd.read_parquet(emb_path, columns=["embedding"])
        cent = train_centroids_distributed(
            full, n_clusters, sample_size=sample_size, seed=seed
        )
    else:
        pf = pq_.ParquetFile(emb_path)
        got, sample_batches = 0, []
        for rb in pf.iter_batches(batch_size=1024, columns=["embedding"]):
            sample_batches.append(rb)
            got += rb.num_rows
            if got >= sample_size:
                break
        sample = pa.Table.from_batches(sample_batches)
        mat = _unit(_mat_from_list_col(sample.column("embedding")))
        cent = train_centroids(mat[:sample_size], n_clusters, seed=seed)
    dim = cent.shape[1]

    # ---- PQ codebooks on residuals (streaming; pq_train shape) -----------
    cent_ref = ray.put(cent)

    def residuals(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _unit(_mat_from_list_col(b.column("embedding"), dim))
        res = mat - c[_assign_unit(mat, c)]
        # zero-copy FixedSizeList from the contiguous residual matrix —
        # a per-row Python list conversion here multiplies across the
        # trainer's per-iteration re-execution of this lazy stage
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(res.reshape(-1), type=pa.float64()), dim
        )
        return pa.table({id_col: b.column(id_col), "embedding": emb})

    res_ds = rd.read_parquet(emb_path, columns=[id_col, "embedding"]).map_batches(
        residuals, batch_format="pyarrow"
    )
    cbs = pq_train(
        res_ds, m=pq_m, k=pq_ks, iters=pq_iters, id_col=id_col, dim=dim
    )

    # ---- encode pass: codes only, partitioned by cluster -----------------
    cbs_ref = ray.put(cbs)

    def encode(b: pa.Table) -> pa.Table:
        return _residual_codes(
            b, ray.get(cent_ref), ray.get(cbs_ref), id_col=id_col, emb_col="embedding"
        )

    ds = rd.read_parquet(emb_path, columns=[id_col, "embedding"])
    ds.map_batches(encode, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cluster_id"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    np.save(os.path.join(out_dir, "codebooks.npy"), cbs)
    return cent, cbs


def query_ivfpq_index(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = DEFAULT_NPROBE,
    id_col: str = "vec_id",
):
    """ADC top-k over the probed clusters only -> Dataset(vec_id,
    adc_dist), ascending squared-L2 on the unit sphere (== descending
    cosine). ONE read over the probed partitions' files (each row carries
    its uint8 ``cid``), one scan pass that gathers from the per-cluster
    LUT tensor by cid slot + k-bounded local top-k, one k-row global
    sort. Unprobed partitions never leave storage."""
    import ray
    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cbs = np.load(os.path.join(index_dir, "codebooks.npy"))
    m, ks, dsub = cbs.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    probe = np.argsort(-(cent @ q))[:nprobe]

    files: list[str] = []
    slots: dict[int, int] = {}
    luts: list[np.ndarray] = []
    for c in probe:
        d = os.path.join(index_dir, f"cluster_id={c}")
        if not os.path.isdir(d):
            continue
        fs = [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]
        if not fs:
            continue
        files.extend(fs)
        slots[int(c)] = len(luts)
        # LUT for this cluster: residual target is q − centroid
        rq = (q - cent[c])[None, :]
        luts.append(np.stack([_sub_dists(rq, cbs[j], j * dsub)[0] for j in range(m)]))

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "adc_dist": pa.array([], type=pa.float64()),
        }
    )
    if not files:
        return rd.from_arrow(empty)
    # cid -> LUT slot as a dense array (cids are small ints)
    slot_map = np.full(int(max(slots)) + 1, -1, dtype=np.int64)
    for c, s in slots.items():
        slot_map[c] = s
    lut_ref = ray.put((np.stack(luts), slot_map))

    def local_topk(b: pa.Table) -> pa.Table:
        lut_all, smap = ray.get(lut_ref)
        n = b.num_rows
        if n == 0:
            return empty
        cid = b.column("cid").to_numpy(zero_copy_only=False).astype(np.int64)
        slot = smap[cid]
        dist = np.zeros(n, dtype=np.float64)
        for j in range(m):
            cj = b.column(f"code_{j}").to_numpy(zero_copy_only=False)
            dist += lut_all[slot, j, cj.astype(np.int64)]
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, dist))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "adc_dist": pa.array(dist[order]),
            }
        )

    cols = [id_col, "cid"] + [f"code_{j}" for j in range(m)]
    return (
        rd.read_parquet(files, columns=cols)
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["adc_dist", id_col])
        .limit(k)
    )


def ivfpq_topk(
    emb_path: str,
    query_id: int,
    k: int = 10,
    *,
    n_clusters: int = 16,
    nprobe: int = DEFAULT_NPROBE,
    pq_m: int = 8,
    pq_ks: int = 16,
    index_dir: str | None = None,
):
    """End-to-end IVF-PQ query: build (or reuse) the index, then probe.
    Index cached under a deterministic /tmp path keyed by input + params
    (the ivf_topk pattern)."""
    import hashlib

    if index_dir is None:
        # keyed by CONTENT fingerprint (size+mtime), not just path — a
        # regenerated embeddings file at the same path must never serve a
        # stale trained index (_corpus_cache_key rule)
        st = os.stat(emb_path)
        key = hashlib.md5(
            f"{os.path.abspath(emb_path)}:{st.st_size}:{st.st_mtime_ns}"
            f":{n_clusters}:{pq_m}:{pq_ks}".encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/quickner_ivfpq/{key}"
    if not os.path.exists(os.path.join(index_dir, "codebooks.npy")):
        # crash-safe: build into a temp dir, atomic rename (the repo's
        # cache pattern — a killed build never leaves a half-index behind)
        import shutil

        tmp = index_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        build_ivfpq_index(
            emb_path, tmp, n_clusters=n_clusters, pq_m=pq_m, pq_ks=pq_ks
        )
        shutil.rmtree(index_dir, ignore_errors=True)
        os.makedirs(os.path.dirname(index_dir), exist_ok=True)
        os.rename(tmp, index_dir)
    qvec = fetch_vector(emb_path, query_id)
    return query_ivfpq_index(index_dir, qvec, k, nprobe=nprobe)

# --- seeded oracle configuration (data-independent; closed-SQL) -------------
#
# Like stages/pq.py, the composed index keeps TWO codebook sources: the
# TRAINED path above (residual k-means; quality path, rows-only + recall
# tests) and this SEEDED path — centroids, codebooks, query and therefore
# the probe set and ADC LUTs are all pure functions of fixed seeds, so every
# coefficient inlines into DuckDB SQL as repr literals and the whole
# composed routing + residual-encode + ADC pipeline is verified VALUE-EXACT
# (dimension-order float accumulation on both engines; assignment ties ->
# first max == row_number ORDER BY dot DESC, cid; encode ties -> first min
# == ORDER BY dist, cell). The Ray side is a zero-shuffle scan (per-batch
# assignment/encode/ADC + k-bounded local top-k) + one k-row global sort.

IVFPQ_SEED = 1308
SEEDED_C = 4
SEEDED_NPROBE = 2
SEEDED_M = 4
SEEDED_KS = 8
SEEDED_DIM = 64
SEEDED_TOPK = 10


def ivfpq_seeded_centroids(n_clusters=SEEDED_C, dim=SEEDED_DIM, seed=IVFPQ_SEED):
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((n_clusters, dim))
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


def ivfpq_seeded_codebooks(m=SEEDED_M, k=SEEDED_KS, dim=SEEDED_DIM, seed=IVFPQ_SEED + 1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, k, dim // m)) * 0.5


def _norm_dim_order(mat):
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for i in range(mat.shape[1]):
        acc += mat[:, i] * mat[:, i]
    return np.sqrt(acc)


def _dots_dim_order(u, cent):
    acc = np.zeros((u.shape[0], cent.shape[0]), dtype=np.float64)
    for i in range(u.shape[1]):
        acc += u[:, i : i + 1] * cent[:, i][None, :]
    return acc


def seeded_probe_and_luts(cent, cbs, q, nprobe=SEEDED_NPROBE):
    qn = _norm_dim_order(q[None, :])[0]
    qu = q / (qn if qn else 1.0)
    qdots = _dots_dim_order(qu[None, :], cent)[0]
    order = np.argsort(-qdots, kind="stable")[:nprobe]
    m, ks, dsub = cbs.shape
    luts = {}
    for c in order:
        rq = (qu - cent[c])[None, :]
        luts[int(c)] = np.stack([_sub_dists(rq, cbs[j], j * dsub)[0] for j in range(m)])
    return [int(c) for c in order], luts


def seeded_scan_batch(b: pa.Table, cent, cbs, probe, luts, k) -> pa.Table:
    m, ks, dsub = cbs.shape
    dim = m * dsub
    empty = pa.table(
        {"vec_id": pa.array([], type=pa.int64()),
         "adc_dist": pa.array([], type=pa.float64())}
    )
    if b.num_rows == 0:
        return empty
    mat = _mat_from_list_col(b.column("embedding"), dim)
    nrm = _norm_dim_order(mat)
    nrm = np.where(nrm == 0, 1.0, nrm)
    u = mat / nrm[:, None]
    assign = _dots_dim_order(u, cent).argmax(axis=1)
    keep = np.isin(assign, probe)
    ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    if not len(ids):
        return empty
    u = u[keep]
    assign = assign[keep]
    res = u - cent[assign]
    codes = np.zeros((len(ids), m), dtype=np.int64)
    for j in range(m):
        codes[:, j] = _sub_dists(res, cbs[j], j * dsub).argmin(axis=1)
    dist = np.zeros(len(ids), dtype=np.float64)
    for c in probe:
        sel = assign == c
        if not sel.any():
            continue
        d = np.zeros(int(sel.sum()), dtype=np.float64)
        for j in range(m):
            d += luts[c][j][codes[sel, j]]
        dist[sel] = d
    order = np.lexsort((ids, dist))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order]), "adc_dist": pa.array(dist[order])}
    )


def _lit(v):
    return repr(float(v))


def sql_ivfpq_seeded(table="embeddings", topk=SEEDED_TOPK):
    cent = ivfpq_seeded_centroids()
    cbs = ivfpq_seeded_codebooks()
    q = pq_query_vector()
    probe, luts = seeded_probe_and_luts(cent, cbs, q)
    C, dim = cent.shape
    m, ks, dsub = cbs.shape

    cent_cols = ", ".join(f"c{i}" for i in range(dim))
    cent_rows = ",\n".join(
        f"    ({c}, {', '.join(_lit(v) for v in cent[c])})" for c in range(C)
    )
    cb_cols = ", ".join(f"b{i}" for i in range(dsub))
    cb_rows = ",\n".join(
        f"    ({j}, {cell}, {', '.join(_lit(v) for v in cbs[j, cell])})"
        for j in range(m) for cell in range(ks)
    )
    lut_rows = ",\n".join(
        f"    ({c}, {j}, {cell}, {_lit(luts[c][j][cell])})"
        for c in probe for j in range(m) for cell in range(ks)
    )
    norm_expr = "\n      + ".join(
        f"(CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE))"
        for i in range(dim)
    )
    dot_expr = "\n      + ".join(
        f"(CAST(embedding[{i + 1}] AS DOUBLE) / nrm) * c{i}" for i in range(dim)
    )

    parts = [
        f"cent(cid, {cent_cols}) AS (VALUES\n{cent_rows})",
        f"cb(sub, cell, {cb_cols}) AS (VALUES\n{cb_rows})",
        f"lut AS (SELECT cid, sub, cell, CAST(ld AS DOUBLE) AS ld FROM\n"
        f"  (VALUES\n{lut_rows}) t(cid, sub, cell, ld))",
        f"xn AS (SELECT vec_id, embedding,\n"
        f"  CASE WHEN nrm0 = 0 THEN 1.0 ELSE nrm0 END AS nrm\n"
        f"  FROM (SELECT vec_id, embedding, sqrt(\n      {norm_expr}) AS nrm0"
        f" FROM {table}) t)",
        f"dots AS (SELECT vec_id, cid,\n      {dot_expr}\n    AS dot\n"
        f"  FROM xn CROSS JOIN cent)",
        "asg AS (SELECT vec_id, cid FROM (\n"
        "  SELECT vec_id, cid,\n"
        "    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid)"
        " AS rn\n  FROM dots) t WHERE rn = 1)",
    ]
    adc_arms = []
    for c in probe:
        parts.append(
            f"a{c} AS (SELECT x.vec_id, x.embedding, x.nrm FROM xn x\n"
            f"  JOIN asg ON asg.vec_id = x.vec_id AND asg.cid = {c})"
        )
        for j in range(m):
            terms = []
            for i in range(dsub):
                e = (
                    f"((CAST(embedding[{j * dsub + i + 1}] AS DOUBLE) / nrm"
                    f" - {_lit(cent[c, j * dsub + i])}) - b{i})"
                )
                terms.append(f"{e} * {e}")
            expr = "\n        + ".join(terms)
            parts.append(
                f"d{c}_{j} AS (SELECT vec_id, cell,\n        {expr}\n"
                f"      AS dist\n"
                f"  FROM a{c} CROSS JOIN (SELECT cell, {cb_cols} FROM cb"
                f" WHERE sub = {j}) cbj)"
            )
            parts.append(
                f"k{c}_{j} AS (SELECT vec_id, cell FROM (\n"
                f"  SELECT vec_id, cell,\n"
                f"    row_number() OVER (PARTITION BY vec_id"
                f" ORDER BY dist, cell) AS rn\n"
                f"  FROM d{c}_{j}) t WHERE rn = 1)"
            )
        ksum = " + ".join(f"l{j}.ld" for j in range(m))
        joins = "\n  ".join(
            f"JOIN k{c}_{j} ON k{c}_{j}.vec_id = a{c}.vec_id\n"
            f"  JOIN lut l{j} ON l{j}.cid = {c} AND l{j}.sub = {j}"
            f" AND l{j}.cell = k{c}_{j}.cell"
            for j in range(m)
        )
        parts.append(
            f"adc{c} AS (SELECT a{c}.vec_id, {ksum} AS adc_dist\n"
            f"  FROM a{c}\n  {joins})"
        )
        adc_arms.append(f"SELECT vec_id, adc_dist FROM adc{c}")
    union = "\nUNION ALL ".join(adc_arms)
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT vec_id, adc_dist FROM (\n"
        f"{union}) u ORDER BY adc_dist, vec_id LIMIT {topk}"
    )


def ivfpq_topk_seeded(
    emb_path: str, *, k: int = SEEDED_TOPK, id_col: str = "vec_id"
):
    """Distributed seeded-config IVF-PQ query: one zero-shuffle scan pass
    (per-batch assignment -> probe filter -> residual encode -> ADC +
    k-bounded local top-k) + one k-row global sort. Value-exact against
    ``sql_ivfpq_seeded`` (all constants literal-inlined)."""
    import ray
    import ray.data as rd

    cent = ivfpq_seeded_centroids()
    cbs = ivfpq_seeded_codebooks()
    probe, luts = seeded_probe_and_luts(cent, cbs, pq_query_vector())
    ref = ray.put((cent, cbs, probe, luts))

    def f(b: pa.Table) -> pa.Table:
        c, cb, pr, lu = ray.get(ref)
        return seeded_scan_batch(b, c, cb, pr, lu, k)

    ds = rd.read_parquet(emb_path, columns=[id_col, "embedding"])
    return ds.map_batches(f, batch_format="pyarrow").sort(
        ["adc_dist", id_col]
    ).limit(k)
