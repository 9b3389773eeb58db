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
