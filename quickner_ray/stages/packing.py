"""Sequence packing: greedily pack chunks into training sequences of total
length <= max_len (the batch-assembly step of an LLM data pipeline).

Distributed shape: packing is PER BLOCK (no shuffle) — the standard
practice for web-scale corpora, where global packing order is irrelevant
but determinism per shard matters for resume. Within a block, chunks are
packed in (doc_id, chunk_id) order by a greedy first-fit scan whose loop
runs once per OUTPUT SEQUENCE (searchsorted over the prefix-sum array),
not once per row. A single over-long chunk becomes its own sequence.

Sequence ids are content-derived ("<doc_id>:<chunk_id>" of the sequence's
first chunk), so re-running a shard yields identical ids — resumable
output, no global counter. Semantics are order-dependent per block, hence
no SQL oracle; the property tests pin the invariants (every chunk exactly
once, no sequence over max_len unless a single chunk is itself over,
deterministic across runs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_batch(batch: pa.Table, *, max_len: int, text_col: str = "chunk_text") -> pa.Table:
    order = pc.sort_indices(
        batch, sort_keys=[("doc_id", "ascending"), ("chunk_id", "ascending")]
    )
    b = batch.take(order)
    lens = pc.utf8_length(b.column(text_col)).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    n = len(lens)
    prefix = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=prefix[1:])
    starts = []
    s = 0
    while s < n:
        starts.append(s)
        # furthest e with prefix[e] - prefix[s] <= max_len; always advance
        e = int(np.searchsorted(prefix, prefix[s] + max_len, side="right")) - 1
        s = max(e, s + 1)
    starts_np = np.asarray(starts, dtype=np.int64)
    n_seqs = len(starts_np)
    bounds = np.r_[starts_np, n]
    seq_sizes = np.diff(bounds)
    seq_of_row = np.repeat(np.arange(n_seqs, dtype=np.int64), seq_sizes)
    seq_pos = np.arange(n, dtype=np.int64) - starts_np[seq_of_row]
    doc_ids = b.column("doc_id")
    chunk_ids = b.column("chunk_id")
    first_doc = doc_ids.take(pa.array(starts_np)).cast(pa.string())
    first_chunk = chunk_ids.take(pa.array(starts_np)).cast(pa.string())
    seq_ids = pc.binary_join_element_wise(first_doc, first_chunk, ":")
    return pa.Table.from_pydict(
        {
            "seq_id": seq_ids.take(pa.array(seq_of_row)),
            "seq_pos": pa.array(seq_pos),
            "doc_id": doc_ids,
            "chunk_id": chunk_ids,
            "n_chars": pa.array(lens),
        }
    )


def pack_sequences(ds, *, max_len: int = 2048, text_col: str = "chunk_text"):
    return ds.map_batches(
        lambda b: pack_batch(b, max_len=max_len, text_col=text_col),
        batch_format="pyarrow",
    )


# --- doc-local part packing (closed-SQL arm) --------------------------------
#
# The block-local chunk packer above is order-dependent PER BLOCK — output
# composition depends on how the executor happened to split the chunk
# stream, which is fine for throughput but unverifiable and not
# resume-stable under dynamic block splitting. This packer is the
# scale-correct contract shape: sequences never span documents; each
# document splits into PARTS by a regex (sentences by default; whitespace
# tokens for corpora without sentence punctuation — variable part lengths
# make the greedy genuinely data-dependent), and the parts pack greedily
# in order. Because every INPUT ROW is a whole document the result is
# identical at any parallelism or block layout, and the greedy fold has
# an exact recursive-CTE oracle (sql_pack_doc_parts): DuckDB's recursion
# carries the running fill, resetting exactly where the engine's
# searchsorted scan starts a new sequence. The scan loop runs once per
# OUTPUT SEQUENCE (searchsorted on the prefix-sum array), never per row.

PART_SPLIT_RE = r"\s+"  # whitespace tokens (the corpus has no sentence marks)


def pack_doc_parts_batch(
    batch: pa.Table,
    *,
    max_len: int,
    text_col: str = "text",
    split_re: str = PART_SPLIT_RE,
) -> pa.Table:
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern_regex(texts, split_re)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    counts = counts.astype(np.int64)
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    first = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=first[1:])
    n = int(counts.sum())
    flat = pc.list_flatten(parts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    part_idx = np.arange(n, dtype=np.int64) - first[:-1][parents] + 1
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    doc_col = doc_ids.take(pa.array(parents))

    prefix = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=prefix[1:])
    starts: list[int] = []
    for a, bnd in zip(first[:-1], first[1:]):
        i = int(a)
        while i < bnd:
            starts.append(i)
            e = int(np.searchsorted(prefix, prefix[i] + max_len, side="right")) - 1
            i = min(max(e, i + 1), int(bnd))  # advance; never cross the doc
    starts_np = np.asarray(starts, dtype=np.int64)
    bounds = np.r_[starts_np, n]
    seq_of_row = np.repeat(
        np.arange(len(starts_np), dtype=np.int64), np.diff(bounds)
    )
    seq_pos = np.arange(n, dtype=np.int64) - starts_np[seq_of_row]
    first_doc = doc_col.take(pa.array(starts_np)).cast(pa.string())
    first_part = pa.array(part_idx[starts_np]).cast(pa.string())
    seq_ids = pc.binary_join_element_wise(first_doc, first_part, ":")
    return pa.Table.from_pydict(
        {
            "seq_id": seq_ids.take(pa.array(seq_of_row)),
            "seq_pos": pa.array(seq_pos),
            "doc_id": doc_col,
            "part_idx": pa.array(part_idx),
            "n_chars": pa.array(lens),
        }
    )


def pack_doc_parts(
    ds,
    *,
    max_len: int = 100,
    text_col: str = "text",
    split_re: str = PART_SPLIT_RE,
):
    """(doc_id, text) Dataset -> packed part rows. Zero-shuffle: each
    input row is a whole document, so dynamic block splitting cannot
    change the output (the property the block-local packer lacks)."""
    return ds.map_batches(
        lambda b: pack_doc_parts_batch(
            b, max_len=max_len, text_col=text_col, split_re=split_re
        ),
        batch_format="pyarrow",
    )


def sql_pack_doc_parts(
    max_len: int = 100,
    table: str = "documents",
    split_re: str = PART_SPLIT_RE,
) -> str:
    """Recursive-CTE oracle for the doc-local greedy: the recursion walks
    each doc's part ranks carrying the running fill; a part that would
    overflow starts a new sequence (fill resets to its own length —
    exactly the searchsorted scan's boundary rule, single over-long parts
    included). A window max over the start markers recovers each row's
    sequence-first rank."""
    return (
        f"WITH RECURSIVE s AS (\n"
        f"  SELECT doc_id, generate_subscripts(l, 1) AS part_idx,\n"
        f"    CAST(length(unnest(l)) AS BIGINT) AS n_chars\n"
        f"  FROM (SELECT doc_id, string_split_regex(text, '{split_re}') AS l\n"
        f"        FROM {table})),\n"
        f"p AS (\n"
        f"  SELECT doc_id, part_idx, n_chars, n_chars AS fill,\n"
        f"    TRUE AS is_start\n"
        f"  FROM s WHERE part_idx = 1\n"
        f"  UNION ALL\n"
        f"  SELECT s.doc_id, s.part_idx, s.n_chars,\n"
        f"    CASE WHEN p.fill + s.n_chars <= {max_len}\n"
        f"         THEN p.fill + s.n_chars ELSE s.n_chars END,\n"
        f"    (p.fill + s.n_chars > {max_len})\n"
        f"  FROM p JOIN s ON s.doc_id = p.doc_id\n"
        f"    AND s.part_idx = p.part_idx + 1),\n"
        f"q AS (\n"
        f"  SELECT doc_id, part_idx, n_chars,\n"
        f"    max(CASE WHEN is_start THEN part_idx END) OVER (\n"
        f"      PARTITION BY doc_id ORDER BY part_idx\n"
        f"      ROWS UNBOUNDED PRECEDING) AS seq_first\n"
        f"  FROM p)\n"
        f"SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(seq_first AS VARCHAR)\n"
        f"    AS seq_id,\n"
        f"  CAST(part_idx - seq_first AS BIGINT) AS seq_pos,\n"
        f"  doc_id, CAST(part_idx AS BIGINT) AS part_idx, n_chars\n"
        f"FROM q"
    )
