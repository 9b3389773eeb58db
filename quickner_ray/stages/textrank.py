"""TextRank extractive summarization: the top-ranked sentence per document.

Mihalcea & Tarau, "TextRank: Bringing Order into Text" (EMNLP 2004),
made exact-integer so the result is bit-deterministic and SQL-oracled:

* sentence split = stages/chunking's terminator+whitespace convention
  (identical RE2 on both engines),
* edge weight w_ij = |distinct shared [a-z0-9]+ words| between sentences
  i and j of the SAME document (an integer — the classic similarity's
  log-length normalization would put floats in the fixed point),
* scores iterate the damped random walk in integer fixed point with
  d = 1/2:  s'_i = HALF + (Σ_j (s_j * w_ij) // W_j) // 2,  W_j = Σ_k w_jk,
  all floor divisions — associative integer sums, no IEEE anywhere,
* the summary sentence is argmax score, ties to the LOWEST sentence index.

Scale shape: everything is document-local, so the whole operator is ONE
zero-shuffle ``map_batches`` pass — the per-document loop follows the
_cooc_batch precedent (one iteration per DOCUMENT over numpy matrices:
the sentence-word incidence matrix gives all pairwise weights as one
M @ M.T). Documents are capped at ``MAX_SENTS`` lowest-index sentences
(quadratic guard, mirrored in the SQL oracle).

Reference: n/a — no counterpart (extension operator for web-text corpus
summarization / snippet selection).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 10**12
HALF = SCALE // 2
MAX_SENTS = 64
N_ITERS = 2
WORD_RE = "[a-z0-9]+"


def _doc_scores(word_sets: list[set], n_iters: int) -> np.ndarray:
    m = len(word_sets)
    vocab: dict[str, int] = {}
    rows, cols = [], []
    for i, ws in enumerate(word_sets):
        for w in ws:
            j = vocab.setdefault(w, len(vocab))
            rows.append(i)
            cols.append(j)
    s = np.full(m, SCALE, dtype=np.int64)
    if not vocab or m == 1:
        # no shared-word edges possible: one damped hop leaves HALF + 0
        return np.full(m, HALF, dtype=np.int64) if n_iters else s
    mat = np.zeros((m, len(vocab)), dtype=np.int64)
    mat[rows, cols] = 1
    wts = mat @ mat.T  # w_ij = |distinct shared words|
    np.fill_diagonal(wts, 0)
    deg = wts.sum(axis=1)  # W_j (symmetric: row == column sums)
    safe = np.where(deg > 0, deg, 1)
    for _ in range(n_iters):
        contrib = (s[:, None] * wts) // safe[:, None]  # c_{j->i} at [j, i]
        contrib[deg == 0, :] = 0
        s = HALF + contrib.sum(axis=0) // 2
    return s


def textrank_batch(
    batch: pa.Table, *, text_col: str = "text", n_iters: int = N_ITERS
) -> pa.Table:
    """(doc_id, text) batch -> one (doc_id, sent_idx, sentence, score) row
    per document: its top TextRank sentence."""
    from .chunking import split_sentences_batch

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "sent_idx": pa.array([], type=pa.int64()),
            "sentence": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    sents = split_sentences_batch(batch, text_col=text_col)
    sents = sents.filter(
        pc.less_equal(sents.column("sent_idx"), pa.scalar(MAX_SENTS))
    )
    doc = sents.column("doc_id").to_numpy(zero_copy_only=False)
    idx = sents.column("sent_idx").to_numpy(zero_copy_only=False)
    words = pc.split_pattern_regex(
        pc.utf8_lower(sents.column("sentence").combine_chunks()), "[^a-z0-9]+"
    )
    wl = words.to_pylist()
    out_doc, out_idx, out_sent, out_score = [], [], [], []
    sentences = sents.column("sentence").to_pylist()
    # sentences of one doc are contiguous (split explodes per doc in order)
    start = 0
    n = len(doc)
    while start < n:
        end = start
        d = doc[start]
        while end < n and doc[end] == d:
            end += 1
        word_sets = [set(w for w in wl[k] if w) for k in range(start, end)]
        scores = _doc_scores(word_sets, n_iters)
        best = int(np.lexsort((idx[start:end], -scores))[0])
        out_doc.append(int(d))
        out_idx.append(int(idx[start + best]))
        out_sent.append(sentences[start + best])
        out_score.append(int(scores[best]))
        start = end
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "sent_idx": pa.array(out_idx, type=pa.int64()),
            "sentence": pa.array(out_sent, type=pa.string()),
            "score": pa.array(out_score, type=pa.int64()),
        }
    )


def textrank_top_sentences(ds, *, text_col: str = "text", n_iters: int = N_ITERS):
    """Zero-shuffle TextRank pass: one summary sentence per document."""
    return ds.map_batches(
        lambda b: textrank_batch(b, text_col=text_col, n_iters=n_iters),
        batch_format="pyarrow",
    )


def sql_textrank(table: str = "documents", n_iters: int = N_ITERS) -> str:
    """DuckDB oracle: identical split, identical integer fixed point,
    ``n_iters`` unrolled iteration CTEs, top-1 via row_number."""
    from .chunking import SENTENCE_RE

    prev = "s0"
    iters = []
    for k in range(1, n_iters + 1):
        iters.append(
            f"it{k} AS (\n"
            f"  SELECT b.doc_id, b.sent_idx,\n"
            f"    CAST({HALF} + COALESCE(SUM(({prev}.sc * pw.wt) // deg.w), 0) // 2\n"
            f"      AS BIGINT) AS sc\n"
            f"  FROM base b\n"
            f"  LEFT JOIN pw ON pw.doc_id = b.doc_id AND pw.dst = b.sent_idx\n"
            f"  LEFT JOIN deg ON deg.doc_id = pw.doc_id AND deg.sent_idx = pw.src\n"
            f"  LEFT JOIN {prev} ON {prev}.doc_id = pw.doc_id\n"
            f"    AND {prev}.sent_idx = pw.src\n"
            f"  GROUP BY b.doc_id, b.sent_idx)"
        )
        prev = f"it{k}"
    return (
        f"WITH sent AS (\n"
        f"  SELECT * FROM (\n"
        f"    SELECT doc_id, generate_subscripts(l, 1) AS sent_idx,\n"
        f"      unnest(l) AS sentence\n"
        f"    FROM (SELECT doc_id, string_split_regex(text, '{SENTENCE_RE}') AS l\n"
        f"          FROM {table}))\n"
        f"  WHERE sent_idx <= {MAX_SENTS}),\n"
        f"base AS (SELECT doc_id, sent_idx FROM sent),\n"
        f"wd AS (SELECT DISTINCT doc_id, sent_idx, w FROM (\n"
        f"  SELECT doc_id, sent_idx,\n"
        f"    unnest(regexp_extract_all(lower(sentence), '{WORD_RE}')) AS w\n"
        f"  FROM sent)),\n"
        f"pw AS (SELECT a.doc_id, a.sent_idx AS dst, b.sent_idx AS src,\n"
        f"    count(*) AS wt\n"
        f"  FROM wd a JOIN wd b ON a.doc_id = b.doc_id AND a.w = b.w\n"
        f"    AND a.sent_idx <> b.sent_idx\n"
        f"  GROUP BY 1, 2, 3),\n"
        f"deg AS (SELECT doc_id, src AS sent_idx, sum(wt) AS w\n"
        f"  FROM pw GROUP BY 1, 2),\n"
        f"s0 AS (SELECT doc_id, sent_idx, CAST({SCALE} AS BIGINT) AS sc\n"
        f"  FROM base),\n"
        + ",\n".join(iters)
        + f"\nSELECT s.doc_id, s.sent_idx, s.sentence, f.sc AS score\n"
        f"FROM {prev} f JOIN sent s ON s.doc_id = f.doc_id\n"
        f"  AND s.sent_idx = f.sent_idx\n"
        f"QUALIFY row_number() OVER (PARTITION BY s.doc_id\n"
        f"  ORDER BY f.sc DESC, s.sent_idx) = 1"
    )
