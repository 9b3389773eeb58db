"""Streaming crawl ingest against a SHARED MUTABLE dedup registry.

The one operator class the Dataset API genuinely cannot express (SURVEY
§7's "(c) raw Ray actors as a last resort"): continuous ingestion where
every arriving page must be checked/recorded against corpus-wide state
*as it streams* — the crawl-frontier "have we seen this content" service.
The registry is a pool of ``DedupRegistryShard`` actors, hash-partitioned
by content hash; ingest tasks push their batch's (hash, id) pairs to the
owning shards from inside ``map_batches`` (data plane stays distributed —
the driver never touches page content), and the final survivor table is
drained from the shards afterwards.

Determinism & fault tolerance by ALGEBRA, not by ordering: each shard
keeps ``min(doc_id)`` and an arrival count per content hash. Min-merge is
commutative, associative and idempotent on ids, so the survivor set is
identical for ANY arrival order / parallelism, and a retried ingest task
re-offering the same (hash, id) pairs can only re-assert the same min.
Counts are made exactly-once too: every offer() carries a delivery token
derived from the ids it ships (stable across retries because a retried
task re-sends the same rows, unique across deliveries because doc_ids
are globally unique), and a shard that has already seen the token drops
the re-delivery — so ``n_dupes`` is retry-proof and safe to check
against an exact COUNT(*) oracle.

Scale notes: registry memory is one (uint64 -> int64) entry per DISTINCT
document spread over ``n_shards`` actors — at 10^12 docs that is the same
state a shuffle-based dedup must materialize, but queryable DURING the
run; shards are independent, so n_shards scales the service horizontally
and each offer() is a single actor hop for the rows it owns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


@ray.remote
class DedupRegistryShard:
    """One registry partition: content-hash -> (min doc_id, arrivals)."""

    def __init__(self) -> None:
        self._min: dict[str, int] = {}
        self._n: dict[str, int] = {}
        self._seen_tokens: set[str] = set()

    def offer(self, hashes: list[str], ids: list[int], token: str) -> int:
        # At-least-once delivery: a Ray task retry re-sends the same rows
        # under the same content-derived token — drop the duplicate so
        # n_dupes stays an exact arrival count (min-merge is idempotent
        # anyway; the token guard makes the COUNT exact too).
        if token in self._seen_tokens:
            return 0
        self._seen_tokens.add(token)
        mn, cnt = self._min, self._n
        for h, i in zip(hashes, ids):
            cur = mn.get(h)
            if cur is None or i < cur:
                mn[h] = i
            cnt[h] = cnt.get(h, 0) + 1
        return len(hashes)

    def dump(self) -> "pa.Table":
        keys = sorted(self._min)
        return pa.table(
            {
                "text_hash": pa.array(keys, type=pa.string()),
                "keep_doc_id": pa.array(
                    [self._min[k] for k in keys], type=pa.int64()
                ),
                "n_dupes": pa.array([self._n[k] for k in keys], type=pa.int64()),
            }
        )


def streaming_ingest_dedup(
    ds,
    *,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Ingest ``ds`` through the sharded registry; returns the survivor
    Dataset (text_hash, keep_doc_id, n_dupes) — value-identical to the
    batch ``doc_dedup`` groupby (same md5 content hash, min-id keep rule),
    which is exactly the point: the streaming service and the batch
    shuffle agree on every corpus."""
    import ray.data as rd

    from ..kernel.hashing import hash_texts

    shards = [DedupRegistryShard.remote() for _ in range(n_shards)]

    def push(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_pushed": pa.array([0], type=pa.int64())})
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False)
        hashes = hash_texts(texts.to_pylist())
        # route each row to the shard owning its hash (first hex byte)
        shard_of = np.fromiter(
            (int(h[:2], 16) % n_shards for h in hashes),
            dtype=np.int64,
            count=len(hashes),
        )
        pending = []
        for s in range(n_shards):
            sel = np.flatnonzero(shard_of == s)
            if len(sel):
                sub_ids = [int(idv[j]) for j in sel]
                # delivery token: stable across task retries (same rows),
                # unique across deliveries (doc_ids are globally unique)
                import hashlib

                token = hashlib.md5(
                    np.asarray(sub_ids, dtype=np.int64).tobytes()
                ).hexdigest()
                pending.append(
                    shards[s].offer.remote(
                        [hashes[j] for j in sel], sub_ids, token
                    )
                )
        ray.get(pending)  # ack before the batch is considered ingested
        return pa.table({"n_pushed": pa.array([b.num_rows], type=pa.int64())})

    # drain the stream through the registry (the count() is the barrier
    # that guarantees every batch's offers were acked)
    ds.map_batches(push, batch_format="pyarrow").sum("n_pushed")
    tables = [t for t in ray.get([s.dump.remote() for s in shards]) if t.num_rows]
    if not tables:
        return rd.from_arrow(
            pa.table(
                {
                    "text_hash": pa.array([], type=pa.string()),
                    "keep_doc_id": pa.array([], type=pa.int64()),
                    "n_dupes": pa.array([], type=pa.int64()),
                }
            )
        )
    return rd.from_arrow(pa.concat_tables(tables))
