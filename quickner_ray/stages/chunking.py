"""Document chunking for training-data pipelines: split each document into
fixed-size character windows with overlap (the pre-tokenization chunking
step of an LLM data pipeline).

Vectorized: chunk counts and window offsets are numpy arithmetic over the
whole batch; the chunk texts are ONE gather over the Arrow data buffer via
``canonicalize._slice_surfaces`` (ASCII fast path; per-row Python only for
non-ASCII rows). Empty documents produce no chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .canonicalize import _slice_surfaces


def chunk_batch(
    batch: pa.Table, *, size: int = 512, overlap: int = 64, text_col: str = "text"
) -> pa.Table:
    """(doc_id, text) -> (doc_id, chunk_id, chunk_text). Windows start every
    ``size - overlap`` chars; the last window may be short."""
    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    import pyarrow.compute as pc

    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = np.where(n > 0, (np.maximum(n, 1) - 1) // step + 1, 0)
    parents = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    total = int(n_chunks.sum())
    first = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=first[1:])
    chunk_id = np.arange(total, dtype=np.int64) - first[:-1][parents]
    starts = chunk_id * step
    ends = np.minimum(starts + size, n[parents])
    chunk_text = _slice_surfaces(texts, parents, starts, ends)
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids.take(pa.array(parents)),
            "chunk_id": pa.array(chunk_id),
            "chunk_text": chunk_text.cast(pa.string()),
        }
    )


def chunk_documents(ds, *, size: int = 512, overlap: int = 64, text_col: str = "text"):
    return ds.map_batches(
        lambda b: chunk_batch(b, size=size, overlap=overlap, text_col=text_col),
        batch_format="pyarrow",
    )


SENTENCE_RE = r"[.!?]\s+"


def split_sentences_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> (doc_id, sent_idx, sentence, sent_chars): explode
    each document into sentences split on terminator+whitespace (the
    terminator is consumed — RE2 has no lookbehind, and the same pattern
    drives the DuckDB oracle so both engines cut identically). Fully
    Arrow-vectorized: one split kernel, one list_flatten, numpy offsets
    for the per-doc sentence ordinals (1-based, ``generate_subscripts``
    convention)."""
    import pyarrow.compute as pc

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern_regex(texts, SENTENCE_RE)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    counts = counts.astype(np.int64)
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    first = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=first[1:])
    sent_idx = np.arange(int(counts.sum()), dtype=np.int64) - first[:-1][parents] + 1
    flat = pc.list_flatten(parts)
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    return pa.Table.from_pydict(
        {
            "doc_id": doc_ids.take(pa.array(parents)),
            "sent_idx": pa.array(sent_idx),
            "sentence": flat,
            "sent_chars": pc.utf8_length(flat).cast(pa.int64()),
        }
    )


def split_sentences(ds, *, text_col: str = "text"):
    return ds.map_batches(
        lambda b: split_sentences_batch(b, text_col=text_col),
        batch_format="pyarrow",
    )


def sql_sentences(table: str = "documents") -> str:
    """DuckDB oracle: identical RE2 split; generate_subscripts is 1-based."""
    return (
        f"SELECT doc_id, sent_idx, sentence,\n"
        f"  CAST(length(sentence) AS BIGINT) AS sent_chars\n"
        f"FROM (\n"
        f"  SELECT doc_id, generate_subscripts(l, 1) AS sent_idx,\n"
        f"    unnest(l) AS sentence\n"
        f"  FROM (SELECT doc_id, string_split_regex(text, '{SENTENCE_RE}') AS l\n"
        f"        FROM {table}))"
    )


def sql_chunks(size: int = 512, overlap: int = 64, table: str = "documents") -> str:
    """DuckDB oracle: same windows via generate_series + substr (1-based)."""
    step = size - overlap
    return (
        f"SELECT doc_id, chunk_id,\n"
        f"  substr(text, CAST(chunk_id * {step} + 1 AS BIGINT), {size}) AS chunk_text\n"
        f"FROM (\n"
        f"  SELECT doc_id, text,\n"
        f"    unnest(range(0, (length(text) - 1) // {step} + 1)) AS chunk_id\n"
        f"  FROM {table} WHERE length(text) > 0)"
    )
