"""DSIR-style importance statistics over hashed bigram features.

DSIR (Xie et al., 2023, "Data Selection for Language Models via Importance
Resampling") selects pretraining data by the likelihood ratio of a TARGET
vs RAW bag-of-hashed-ngrams model. The hashing trick bounds each model at
``D_BUCKETS`` integers regardless of corpus size — the OPPOSITE
distribution shape from :mod:`.lm`'s raw-bigram LM: there the model is
corpus-proportional and must be hash-partition JOINED; here it is a fixed
D-int array, so the right move is a bucket groupby-sum (at most D rows),
one driver collect of those D rows, and a BROADCAST (``ray.put`` once,
fetched once per worker process). Choosing between those two shapes by
model cardinality is exactly the broadcast-vs-shuffle decision this
engine is built around.

Integer domain: per scored doc we emit ``n_grams`` (hashed-bigram
occurrences) plus ``t_hits`` / ``r_hits`` — the sums of target / raw
bucket counts over the doc's occurrences. DSIR's float weight
``sum(log(p_t/p_r))`` needs per-bucket logs whose IEEE summation order is
engine-specific, so the exact integer sufficient statistics are the
oracle-checked contract; a consumer derives the float weight driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup_approx import h64
from .lm import _doc_bigram_arrays

D_BUCKETS = 8192


def _hashed_buckets(w1, w2, d: int) -> np.ndarray:
    """Bigram occurrences -> bucket ids; md5 once per DISTINCT pair."""
    keys = pc.binary_join_element_wise(w1, w2, " ").to_numpy(
        zero_copy_only=False
    )
    if not len(keys):
        return np.array([], dtype=np.int64)
    uniq, inv = np.unique(keys, return_inverse=True)
    buckets = np.fromiter(
        (h64(k) % d for k in uniq), dtype=np.int64, count=len(uniq)
    )
    return buckets[inv]


def partial_bucket_counts(
    batch: pa.Table, *, d: int = D_BUCKETS, text_col: str = "text"
) -> pa.Table:
    """Model-side combiner: (bucket, cnt), at most ``d`` rows per batch."""
    _, w1, w2 = _doc_bigram_arrays(batch, text_col)
    b = _hashed_buckets(w1, w2, d)
    if not len(b):
        return pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    dense = np.bincount(b, minlength=d)
    nz = np.flatnonzero(dense)
    return pa.table(
        {
            "bucket": pa.array(nz.astype(np.int64)),
            "cnt": pa.array(dense[nz].astype(np.int64)),
        }
    )


def fit_hash_counts(ds, *, d: int = D_BUCKETS, text_col: str = "text") -> np.ndarray:
    """Dataset(doc_id, text) -> dense (d,) int64 bucket-count array. The
    collect is bounded by ``d`` rows — the whole point of feature hashing."""
    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(
            lambda b: partial_bucket_counts(b, d=d, text_col=text_col),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    out = np.zeros(d, dtype=np.int64)
    for r in rows:
        out[r["bucket"]] = r["cnt"]
    return out


def dsir_stats(
    target_ds,
    raw_ds,
    score_ds,
    *,
    d: int = D_BUCKETS,
    text_col: str = "text",
):
    """Dataset(doc_id, n_grams, t_hits, r_hits), one row per scoring doc.

    Two bounded fits (bucket groupby-sum -> D-row collect -> broadcast),
    then one zero-shuffle scoring pass: per batch, hash the doc's bigram
    occurrences, take both broadcast count arrays, segment-sum by doc."""
    import ray

    t_ref = ray.put(fit_hash_counts(target_ds, d=d, text_col=text_col))
    r_ref = ray.put(fit_hash_counts(raw_ds, d=d, text_col=text_col))

    def score(batch: pa.Table) -> pa.Table:
        t_arr, r_arr = ray.get(t_ref), ray.get(r_ref)
        parents, w1, w2 = _doc_bigram_arrays(batch, text_col)
        b = _hashed_buckets(w1, w2, d)
        n = batch.num_rows
        n_grams = np.zeros(n, dtype=np.int64)
        t_hits = np.zeros(n, dtype=np.int64)
        r_hits = np.zeros(n, dtype=np.int64)
        if len(b):
            np.add.at(n_grams, parents, 1)
            np.add.at(t_hits, parents, t_arr[b])
            np.add.at(r_hits, parents, r_arr[b])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(n_grams, type=pa.int64()),
                "t_hits": pa.array(t_hits, type=pa.int64()),
                "r_hits": pa.array(r_hits, type=pa.int64()),
            }
        )

    return score_ds.map_batches(score, batch_format="pyarrow")


def sql_dsir_stats(table: str = "documents", *, d: int = D_BUCKETS) -> str:
    """Exact oracle: same tokenizer and even/odd target/raw split as the
    Ray side; ``md5_number_upper(w1 || ' ' || w2) % d`` reproduces the
    bucket hash bit-for-bit. Odd (raw-side) docs are scored."""
    return (
        f"WITH tok AS (SELECT doc_id,"
        f" regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM {table}),\n"
        f"expl AS (SELECT doc_id, unnest(ws) AS w,"
        f" generate_subscripts(ws, 1) AS i FROM tok),\n"
        f"big AS (SELECT doc_id, w1, w2 FROM (SELECT doc_id, w AS w1,\n"
        f"  lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2 FROM expl)\n"
        f"  WHERE w2 IS NOT NULL),\n"
        f"hb AS (SELECT doc_id, CAST(md5_number_upper(w1 || ' ' || w2) % {d}\n"
        f"  AS BIGINT) AS b FROM big),\n"
        f"tcnt AS (SELECT b, count(*) AS c FROM hb WHERE doc_id % 2 = 0"
        f" GROUP BY b),\n"
        f"rcnt AS (SELECT b, count(*) AS c FROM hb WHERE doc_id % 2 = 1"
        f" GROUP BY b),\n"
        f"per_doc AS (SELECT hb.doc_id, count(*) AS n_grams,\n"
        f"  sum(coalesce(t.c, 0)) AS t_hits, sum(coalesce(r.c, 0)) AS r_hits\n"
        f"  FROM hb LEFT JOIN tcnt t ON hb.b = t.b\n"
        f"  LEFT JOIN rcnt r ON hb.b = r.b\n"
        f"  WHERE hb.doc_id % 2 = 1 GROUP BY hb.doc_id)\n"
        f"SELECT tok.doc_id, CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,\n"
        f"  CAST(coalesce(p.t_hits, 0) AS BIGINT) AS t_hits,\n"
        f"  CAST(coalesce(p.r_hits, 0) AS BIGINT) AS r_hits\n"
        f"FROM tok LEFT JOIN per_doc p ON tok.doc_id = p.doc_id\n"
        f"WHERE tok.doc_id % 2 = 1"
    )
