"""CCNet-style n-gram language-model quality scoring, integer-exact.

CCNet (Wenzek et al., 2020) filters Common-Crawl text by the perplexity of
a language model trained on a trusted reference corpus. This stage keeps
the train-on-reference / score-the-crawl split but stays in the integer
domain so the result is bit-exact against a SQL oracle (float log-prob sums
are IEEE-order-sensitive; counts are not):

- **train**: documents with even ``doc_id`` play the reference corpus; the
  LM is the exact bigram count table over lowercased ``[a-z0-9]+`` words.
- **score**: documents with odd ``doc_id`` are the crawl side; per doc we
  emit ``n_bigrams`` (adjacent word pairs), ``n_known`` (occurrences whose
  bigram appears in the training table) and ``sum_freq`` (total training
  frequency of the doc's bigram occurrences). ``n_known / n_bigrams`` is
  the familiarity rate (low -> CCNet's "tail" bucket); ``sum_freq``
  separates common from merely-seen phrasing.

Scale shape (the reason this is NOT a broadcast): the bigram table of a
100 TB corpus is itself huge (billions of rows), so the doc-bigram stream
JOINS it hash-partitioned on the bigram key — a fact-to-fact shuffle join —
instead of shipping an LM to every worker. Both inputs to the join are
pre-aggregated per batch (at most one row per distinct bigram per batch /
per (doc, bigram)), bounding the shuffle the same way the vocab and
canonicalize combiners do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_analysis import WORD_CLASS_RE, WORD_CLASS_SPLIT_RE


def _default_partitions() -> int:
    """Join fan-out sized to the cluster: ~1 hash partition per CPU (each
    partition is an aggregator actor — at 8 CPUs, 32 idle aggregators cost
    more in startup than they save; on a 256-node cluster CPU count grows
    and so does the fan-out)."""
    import ray

    try:
        return max(4, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _doc_bigram_arrays(batch: pa.Table, text_col: str):
    """Batch -> (doc_index, w1, w2) arrays of adjacent-word pairs."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat):
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
    if len(flat) < 2:
        empty = pa.array([], type=pa.string())
        return np.array([], dtype=np.int64), empty, empty
    adj = parents[:-1] == parents[1:]
    idx = np.flatnonzero(adj)
    w1 = flat.take(pa.array(idx))
    w2 = flat.take(pa.array(idx + 1))
    return parents[idx], w1, w2


def partial_bigram_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Training-side combiner: per-batch (w1, w2, cnt) partial counts — at
    most ONE row per distinct bigram per batch regardless of how hot the
    bigram is, bounding the count shuffle."""
    _, w1, w2 = _doc_bigram_arrays(batch, text_col)
    if not len(w1):
        return pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    return (
        pa.table({"w1": w1, "w2": w2})
        .group_by(["w1", "w2"])
        .aggregate([([], "count_all")])
        .rename_columns(["w1", "w2", "cnt"])
    )


def doc_bigram_multiplicities(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scoring-side combiner: (doc_id, w1, w2, m) with per-(doc, bigram)
    multiplicity m pre-aggregated inside the batch."""
    parents, w1, w2 = _doc_bigram_arrays(batch, text_col)
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if not len(w1):
        return pa.table(
            {
                "doc_id": pa.array([], type=doc_ids.type),
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
            }
        )
    docs = doc_ids.take(pa.array(parents))
    return (
        pa.table({"doc_id": docs, "w1": w1, "w2": w2})
        .group_by(["doc_id", "w1", "w2"])
        .aggregate([([], "count_all")])
        .rename_columns(["doc_id", "w1", "w2", "m"])
    )


def add_bigram_total(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_bigrams): adjacent-word-pair count per document (no
    shuffle — the left side of the final per-doc attach)."""
    parents, _, _ = _doc_bigram_arrays(batch, text_col)
    n = len(batch)
    totals = np.bincount(parents, minlength=n).astype(np.int64) if n else np.array([], dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(totals[:n], type=pa.int64()),
        }
    )


def lm_bigram_scores(
    train_ds,
    score_ds,
    *,
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Score ``score_ds`` docs against the bigram LM of ``train_ds``.

    Dataset(doc_id, text) x2 -> Dataset(doc_id, n_bigrams, n_known,
    sum_freq), one row per scoring doc (zeros when nothing matched or the
    doc has < 2 words). All-to-alls: one count groupby, one bigram-key
    shuffle join, one final per-doc groupby — every one hash-partitioned,
    nothing corpus-sized on the driver or broadcast. The per-doc attach is
    a UNION + groupby (each source contributes zero-filled columns) rather
    than an outer join: same shuffle cost, and it sidesteps Ray's
    hash-join aggregator choking on schema-less empty partitions when an
    Aggregate feeds a Join at small data sizes.
    """
    from ray.data.aggregate import Sum

    if num_partitions is None:
        num_partitions = _default_partitions()
    counts = (
        train_ds.map_batches(
            lambda b: partial_bigram_counts(b, text_col), batch_format="pyarrow"
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    doc_bigrams = score_ds.map_batches(
        lambda b: doc_bigram_multiplicities(b, text_col), batch_format="pyarrow"
    )
    # bucketed hash join (stages/hashjoin.py): one groupby exchange, no
    # hash-aggregator actor pool and no schema-less-empty-block hazard —
    # which also removes the two full repartition passes the native join
    # needed as a workaround. Explicit types keep the aggregate plan
    # single-execution (no schema() probe).
    from .hashjoin import bucketed_inner_join

    joined = bucketed_inner_join(
        doc_bigrams,
        counts,
        on=("w1", "w2"),
        n_buckets=num_partitions,
        left_types={
            "doc_id": pa.int64(),
            "w1": pa.string(),
            "w2": pa.string(),
            "m": pa.int64(),
        },
        right_types={"w1": pa.string(), "w2": pa.string(), "cnt": pa.int64()},
    )

    def weigh(b: pa.Table) -> pa.Table:
        m = b.column("m").cast(pa.int64())
        n = len(b)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_bigrams": pa.array(np.zeros(n, dtype=np.int64)),
                "n_known": m,
                "sum_freq": pc.multiply_checked(m, b.column("cnt").cast(pa.int64())),
            }
        )

    def zero_fill(b: pa.Table) -> pa.Table:
        n = len(b)
        zeros = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_bigrams": b.column("n_bigrams"),
                "n_known": zeros,
                "sum_freq": zeros,
            }
        )

    matched = joined.map_batches(weigh, batch_format="pyarrow")
    totals = score_ds.map_batches(
        lambda b: add_bigram_total(b, text_col), batch_format="pyarrow"
    ).map_batches(zero_fill, batch_format="pyarrow")
    return (
        totals.union(matched)
        .groupby("doc_id")
        .aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("n_known", alias_name="n_known"),
            Sum("sum_freq", alias_name="sum_freq"),
        )
    )


def sql_lm_bigram_scores(table: str = "documents") -> str:
    """Exact oracle: same tokenizer (``[a-z0-9]+`` over lower), same
    even/odd train/score split, pure-count outputs (no float summation)."""
    return (
        f"WITH tok AS (SELECT doc_id,"
        f" regexp_extract_all(lower(text), '{WORD_CLASS_RE}') AS ws FROM {table}),\n"
        f"expl AS (SELECT doc_id, unnest(ws) AS w,"
        f" generate_subscripts(ws, 1) AS i FROM tok),\n"
        f"big AS (SELECT doc_id, w1, w2 FROM (SELECT doc_id, w AS w1,\n"
        f"  lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2 FROM expl)\n"
        f"  WHERE w2 IS NOT NULL),\n"
        f"train AS (SELECT w1, w2, count(*) AS cnt FROM big\n"
        f"  WHERE doc_id % 2 = 0 GROUP BY w1, w2),\n"
        f"matched AS (SELECT b.doc_id, count(*) AS n_known, sum(t.cnt) AS sum_freq\n"
        f"  FROM big b JOIN train t ON b.w1 = t.w1 AND b.w2 = t.w2\n"
        f"  WHERE b.doc_id % 2 = 1 GROUP BY b.doc_id)\n"
        f"SELECT tok.doc_id, CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_bigrams,\n"
        f"  CAST(coalesce(m.n_known, 0) AS BIGINT) AS n_known,\n"
        f"  CAST(coalesce(m.sum_freq, 0) AS BIGINT) AS sum_freq\n"
        f"FROM tok LEFT JOIN matched m ON tok.doc_id = m.doc_id\n"
        f"WHERE tok.doc_id % 2 = 1"
    )
