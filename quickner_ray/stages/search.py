"""Distributed BM25 ranked retrieval over the document corpus.

The IR workhorse the reference lacks (its A1/A2 indexes support only exact
lookups — quickner-core/src/quickner.rs:719-742); a web-scale corpus engine
needs *ranked* full-text search. Okapi BM25 (Robertson & Walker, SIGIR'94;
k1 = 1.2, b = 0.75 — the canonical defaults) over the same whole-token
word-class tokenization the vocab/df operators use.

Ray Data shape (the 100 TB-safe one):

1. **Statistics pass** — one streaming pass over the pruned ``text`` column
   emitting ONE partial row per batch: (n_docs, sum_dl, df_term...) — the
   classic combiner, so the final aggregate merges per-batch rows, never
   documents. Output is |terms|+2 scalars.
2. **Scoring pass** — the scalars broadcast in the task closure (bytes,
   not a join); per-batch vectorized token split + per-term tf via
   dictionary-free masked bincounts; zero shuffles. Each batch emits only
   its local top-k rows (a k-bounded combiner), so the final global
   sort+limit touches k × n_batches rows, never the corpus.

Float discipline: every double-precision expression is written with the
same shape (same literals, same parenthesization, left-assoc term sum) in
:func:`sql_bm25_topk`, so driver hash-comparison of the ``score`` column is
bit-exact — the same methodology as the interpolated-quantile and
entity-link oracles.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_analysis import WORD_CLASS_RE, WORD_CLASS_SPLIT_RE

BM25_TERMS = ("spark", "window", "query")
BM25_K = 10


def _tf_dl(texts: pa.Array, terms) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-row whole-token stats: tf matrix (rows x terms) and
    token count dl. One regex split per batch; no Python row loop."""
    n = len(texts)
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
    dl = np.bincount(parents[nonempty], minlength=n).astype(np.int64)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for i, t in enumerate(terms):
        hit = pc.equal(flat, t).to_numpy(zero_copy_only=False) & nonempty
        if hit.any():
            tf[:, i] = np.bincount(parents[hit], minlength=n)
    return tf, dl


def bm25_corpus_stats(ds, terms=BM25_TERMS, *, text_col: str = "text") -> dict:
    """Pass 1: global (n_docs, sum_dl, df per term) via per-batch one-row
    partials + a Sum-merge. Returns plain Python ints."""
    from ray.data.aggregate import Sum

    terms = tuple(terms)

    def partial(b: pa.Table) -> pa.Table:
        cols: dict = {
            "n_docs": pa.array([b.num_rows], type=pa.int64()),
        }
        if b.num_rows == 0:
            cols["sum_dl"] = pa.array([0], type=pa.int64())
            for i in range(len(terms)):
                cols[f"df_{i}"] = pa.array([0], type=pa.int64())
            return pa.table(cols)
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tf, dl = _tf_dl(texts, terms)
        cols["sum_dl"] = pa.array([int(dl.sum())], type=pa.int64())
        for i in range(len(terms)):
            cols[f"df_{i}"] = pa.array([int((tf[:, i] > 0).sum())], type=pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n_docs", alias_name="n_docs"), Sum("sum_dl", alias_name="sum_dl")]
    aggs += [Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    row = parts.aggregate(*aggs)
    return {k: int(v or 0) for k, v in row.items()}


def bm25_topk(
    ds,
    terms=BM25_TERMS,
    *,
    k: int = BM25_K,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Two-pass BM25 top-k: (doc_id, score) for the ``k`` best documents,
    ties broken by doc_id ascending. ``ds`` is consumed twice (stats +
    scoring) — pass a re-readable Dataset (a parquet read) or materialize
    a small one; pass 1 only needs the ``text`` column."""
    stats = bm25_corpus_stats(ds, terms, text_col=text_col)
    n = stats["n_docs"]
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        )
    avgdl = float(stats["sum_dl"]) / float(n)
    # idf per term, computed ONCE with the exact expression shape the SQL
    # oracle uses: ln(1 + ((n - df + 0.5) / (df + 0.5)))
    idf = [
        math.log(1.0 + ((n - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5)))
        for i in range(len(terms))
    ]

    def score_batch(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tf, dl = _tf_dl(texts, terms)
        # SQL mirror: 0.9e0 * (dl / avgdl) — shared subexpression per doc
        q = 0.9 * (dl.astype(np.float64) / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(terms)):
            tff = tf[:, i].astype(np.float64)
            # SQL mirror: idf * ((tf * 2.2e0) / ((tf + 0.3e0) + 0.9e0*(dl/avgdl)))
            score = score + idf[i] * ((tff * 2.2) / ((tff + 0.3) + q))
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False)
        # local top-k combiner: (-score, doc_id) lexicographic
        order = np.lexsort((idv, -score))[:k]
        return pa.table(
            {
                id_col: pa.array(idv[order], type=pa.int64()),
                "score": pa.array(score[order], type=pa.float64()),
            }
        )

    locals_ds = ds.map_batches(score_batch, batch_format="pyarrow")
    return locals_ds.sort(key=["score", id_col], descending=[True, False]).limit(k)


def sql_bm25_topk(terms=BM25_TERMS, *, k: int = BM25_K, table: str = "documents") -> str:
    """DuckDB oracle: same tokenization (regexp_extract_all of the word
    class == split-and-drop-empties), same double expression tree (e0
    literals force DOUBLE, parens mirror the numpy evaluation order)."""
    terms = tuple(terms)
    tf_cols = ",\n         ".join(
        f"len(list_filter(tk, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"count(*) FILTER (tf_{i} > 0) AS df_{i}" for i in range(len(terms))
    )
    term_exprs = " + ".join(
        f"(ln(1e0 + ((s.n - s.df_{i} + 0.5e0) / (s.df_{i} + 0.5e0)))"
        f" * ((d.tf_{i} * 2.2e0) / ((d.tf_{i} + 0.3e0)"
        f" + 0.9e0 * (d.dl / s.avgdl))))"
        for i in range(len(terms))
    )
    return (
        f"WITH tq AS (SELECT doc_id,"
        f" regexp_extract_all(lower(text), '{WORD_CLASS_RE}') AS tk FROM {table}),\n"
        f"d AS (SELECT doc_id, len(tk) AS dl,\n         {tf_cols} FROM tq),\n"
        f"s AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
        f" AS avgdl, {df_cols} FROM d)\n"
        f"SELECT d.doc_id, {term_exprs} AS score\n"
        f"FROM d CROSS JOIN s\n"
        f"ORDER BY score DESC, d.doc_id LIMIT {k}"
    )


MMR_K = 5
MMR_POOL = 20


def mmr_topk(
    ds,
    terms=BM25_TERMS,
    *,
    k: int = MMR_K,
    pool: int = MMR_POOL,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Diversified retrieval: Maximal Marginal Relevance (Carbonell &
    Goldstein, SIGIR'98) re-ranking of the top-``pool`` docs, made
    integer-exact so the unrolled SQL oracle matches bit-for-bit.

    relevance rel(d) = total whole-token query-term occurrences;
    redundancy sim(a, b) = |distinct-token sets a ∩ b|; selection is the
    λ=1/2 greedy — seed with argmax rel, then repeatedly add
    ``argmax (rel(d) - max_{s in S} sim(d, s))``, all ties by doc_id asc.

    Shape: pool selection is distributed (per-batch local top-``pool``
    combiner carrying each doc's distinct-token set as a list column —
    the rideshare trick — then a tiny global sort+limit); the greedy
    itself runs on the ``pool``-row table, bounded by construction (the
    POOL is the scale knob, not the corpus). Output: (rank, doc_id, rel).
    """
    import ray.data as rd

    terms = tuple(terms)

    def local_pool(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "rel": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.list_(pa.string())),
            }
        )
        if b.num_rows == 0:
            return empty
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tf, _ = _tf_dl(texts, terms)
        rel = tf.sum(axis=1)
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False)
        order = np.lexsort((idv, -rel))[:pool]
        # distinct token sets for the kept rows only
        toks = pc.split_pattern_regex(
            pc.utf8_lower(texts.take(pa.array(order))), WORD_CLASS_SPLIT_RE
        )
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat, parents = flat.filter(pa.array(nonempty)), parents[nonempty]
        sets: list[list[str]] = [[] for _ in range(len(order))]
        for w, p in zip(flat.to_pylist(), parents):
            sets[p].append(w)
        sets = [sorted(set(s)) for s in sets]
        return pa.table(
            {
                id_col: pa.array(idv[order], type=pa.int64()),
                "rel": pa.array(rel[order], type=pa.int64()),
                "ts": pa.array(sets, type=pa.list_(pa.string())),
            }
        )

    locals_ds = ds.map_batches(local_pool, batch_format="pyarrow")
    top = locals_ds.sort(key=["rel", id_col], descending=[True, False]).limit(pool)
    rows = top.take_all()  # bounded: pool rows
    cand = [(int(r[id_col]), int(r["rel"]), frozenset(r["ts"])) for r in rows]

    selected: list[tuple[int, int, int]] = []  # (rank, doc_id, rel)
    chosen: list[frozenset] = []
    remaining = list(cand)
    for rank in range(1, k + 1):
        if not remaining:
            break
        if not chosen:
            best = min(remaining, key=lambda c: (-c[1], c[0]))
        else:
            def score(c):
                msim = max(len(c[2] & s) for s in chosen)
                return (-(c[1] - msim), c[0])

            best = min(remaining, key=score)
        selected.append((rank, best[0], best[1]))
        chosen.append(best[2])
        remaining = [c for c in remaining if c[0] != best[0]]

    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array([r for r, _, _ in selected], type=pa.int64()),
                id_col: pa.array([d for _, d, _ in selected], type=pa.int64()),
                "rel": pa.array([v for _, _, v in selected], type=pa.int64()),
            }
        )
    )


def sql_mmr_topk(
    terms=BM25_TERMS, *, k: int = MMR_K, pool: int = MMR_POOL, table: str = "documents"
) -> str:
    """Unrolled-greedy oracle for ``mmr_topk``: k rounds of
    argmax(rel - max shared-distinct-tokens vs selected), ties doc_id."""
    terms = tuple(terms)
    rel_expr = " + ".join(
        f"len(list_filter(tk, x -> x = '{t}'))" for t in terms
    )
    sql = (
        f"WITH tq AS (SELECT doc_id,"
        f" regexp_extract_all(lower(text), '{WORD_CLASS_RE}') AS tk FROM {table}),\n"
        f"d AS (SELECT doc_id, list_distinct(tk) AS ts, {rel_expr} AS rel FROM tq),\n"
        f"pool AS (SELECT doc_id, ts, rel FROM d QUALIFY\n"
        f"  row_number() OVER (ORDER BY rel DESC, doc_id) <= {pool}),\n"
        f"sel1 AS (SELECT doc_id, ts, rel, 1 AS rk FROM pool QUALIFY\n"
        f"  row_number() OVER (ORDER BY rel DESC, doc_id) = 1)"
    )
    for r in range(2, k + 1):
        sql += (
            f",\nc{r} AS (SELECT p.doc_id,"
            f" max(len(list_intersect(p.ts, s.ts))) AS msim\n"
            f"  FROM pool p CROSS JOIN sel{r - 1} s\n"
            f"  WHERE p.doc_id NOT IN (SELECT doc_id FROM sel{r - 1})\n"
            f"  GROUP BY p.doc_id),\n"
            f"pick{r} AS (SELECT p.doc_id, p.ts, p.rel, {r} AS rk\n"
            f"  FROM pool p JOIN c{r} c USING (doc_id) QUALIFY\n"
            f"  row_number() OVER (ORDER BY p.rel - c.msim DESC, p.doc_id) = 1),\n"
            f"sel{r} AS (SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM pick{r})"
        )
    return (
        sql
        + f"\nSELECT CAST(rk AS BIGINT) AS rank, doc_id,"
        f" CAST(rel AS BIGINT) AS rel FROM sel{k}"
    )
