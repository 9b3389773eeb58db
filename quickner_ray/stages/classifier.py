"""fastText-style hashed-linear quality-classifier inference.

Web-scale corpus curation scores every document with a cheap linear text
classifier (CCNet / RefinedWeb / FineWeb use fastText models): feature id
= hash(token) % D (the "hashing trick", Weinberger et al. 2009; fastText's
bag-of-words architecture, Joulin et al. 2017), score = sum of the feature
weights over token occurrences, keep = score above a threshold.

Ray shape: the weight table is a flat D-element array built ONCE per
worker process (``task_stage`` memo — the stand-in model is tiny, but a
real 2M-bucket fastText LUT follows the identical path via an
``ObjectRef`` ctor kwarg: one object-store fetch per worker, never one
per batch). Per-batch inference is one vectorized lower+split over the
whole batch, one md5 per DISTINCT token, one take + segment-sum — no
Python per row, zero shuffles.

Integer domain: the deterministic stand-in weights are
``W[j] = ((j * 48271) % D) - (D-1)//2`` (Lehmer-mix so signs are balanced
across buckets), keeping scores bit-exact against the SQL oracle — a real
model ships learned float weights through the same plumbing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup_approx import h64 as _h64
from .text_analysis import WORD_CLASS_RE, WORD_CLASS_SPLIT_RE

D_FEATURES = 2001
W_MIX = 48271


def _stand_in_weights(d: int = D_FEATURES) -> np.ndarray:
    j = np.arange(d, dtype=np.int64)
    return (j * W_MIX) % d - (d - 1) // 2


class ClassifierScorer:
    """Per-batch linear-classifier inference over hashed token features.

    ``weights_ref``: optional ``ray.ObjectRef`` of an int64/float weight
    array (a trained model broadcast with ``ray.put``); defaults to the
    deterministic stand-in LUT so the end-to-end path is oracle-checkable.
    """

    def __init__(self, weights_ref=None, text_col: str = "text"):
        if weights_ref is not None:
            import ray

            self.weights = np.asarray(ray.get(weights_ref))
        else:
            self.weights = _stand_in_weights()
        self.d = len(self.weights)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(texts), WORD_CLASS_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        n_tokens = np.zeros(n, dtype=np.int64)
        score = np.zeros(n, dtype=np.int64)
        if len(flat):
            nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(
                zero_copy_only=False
            )
            words = flat.to_numpy(zero_copy_only=False)[nonempty]
            parents = parents[nonempty]
            if len(words):
                uniq, inv = np.unique(words, return_inverse=True)
                buckets = np.fromiter(
                    (_h64(w) % self.d for w in uniq),
                    dtype=np.int64,
                    count=len(uniq),
                )
                per_tok = self.weights[buckets][inv]
                np.add.at(score, parents, per_tok)
                np.add.at(n_tokens, parents, 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "score": pa.array(score, type=pa.int64()),
                "keep": pa.array((score > 0).astype(np.int64), type=pa.int64()),
            }
        )


def classifier_scores(ds, *, weights_ref=None, text_col: str = "text"):
    """Score every document with the hashed linear classifier — a
    stateless-per-batch map (model state memoized per worker process);
    zero shuffles."""
    from .taskstate import task_stage

    kw = {"text_col": text_col}
    if weights_ref is not None:
        kw["weights_ref"] = weights_ref
    return ds.map_batches(task_stage(ClassifierScorer, **kw), batch_format="pyarrow")


def sql_classifier_scores(table: str = "documents") -> str:
    """Oracle: same tokenization (``[a-z0-9]+`` runs over lowered text),
    same Lehmer-mixed bucket weights from ``md5_number_upper`` — token-less
    documents score 0 via the LEFT JOIN."""
    d, half = D_FEATURES, (D_FEATURES - 1) // 2
    return (
        f"WITH words AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        f" '{WORD_CLASS_RE}')) AS w FROM {table}),\n"
        f"ws AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,\n"
        f"  CAST(sum((CAST(md5_number_upper(w) % {d} AS BIGINT) * {W_MIX})"
        f" % {d} - {half}) AS BIGINT) AS score\n"
        f"  FROM words GROUP BY doc_id)\n"
        f"SELECT d.doc_id, COALESCE(ws.n_tokens, 0) AS n_tokens,\n"
        f"  COALESCE(ws.score, 0) AS score,\n"
        f"  CAST(COALESCE(ws.score, 0) > 0 AS BIGINT) AS keep\n"
        f"FROM {table} d LEFT JOIN ws ON d.doc_id = ws.doc_id"
    )
