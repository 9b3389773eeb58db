"""Exact content dedup (E1) — hash column + hash-partitioned first-wins.

The reference dedups by content via ``HashSet<Text>`` at load and a
content-hash doc id (quickner.rs:538-557, 330-343). Distributed form:

1. ``add_doc_id``: vectorized md5-of-text column inside ``map_batches``
   (cheap, stateless);
2. ``dedup_exact``: ``groupby(doc_id)`` -> first row per group. This is the
   E1 shuffle; its key is the content hash, so it is uniformly distributed
   by construction (no salting needed — hot TEXTS collapse into one group
   whose size equals the duplicate count, and only one row survives).
"""

from __future__ import annotations

import pyarrow as pa

from ..kernel.hashing import hash_texts


def add_doc_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    if "doc_id" in batch.column_names:
        return batch
    ids = hash_texts(batch.column(text_col).to_pylist())
    return batch.append_column("doc_id", pa.array(ids, type=pa.string()))


def _first_per_group(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def dedup_exact(ds, key: str = "doc_id"):
    """ray.data.Dataset -> Dataset with one row per distinct ``key``."""
    return ds.groupby(key).map_groups(_first_per_group, batch_format="pyarrow")
