"""Inverted indexes as derived datasets (A1/A2 distributed form).

``documents_label_index`` (label -> [doc ids], quickner.rs:719-728) and
``documents_entities_index`` (surface_norm -> [doc ids], quickner.rs:730-742)
become groupby-collect stages over the exploded mentions Dataset.

Partitioning (SURVEY.md §2.6/§4): posting-list collection is the one truly
skew-exposed shuffle — label cardinality is tiny (at 100x scale one reducer
would colocate the entire corpus's "ORG" posting list) and surface forms are
Zipf-hot. So EVERY builder here is the salted two-phase shape (the north
rule's "salted keys for skewed hot entities"):

- phase 1 shuffles on ``(key, salt)`` — a hot key splits across ``salt``
  reducers, each collecting a bounded partial list;
- phase 2 shuffles only the partial rows (<= salt per key) and merges.

Posting lists come out SORTED (deterministic across runs/parallelism —
arrival order is scheduling-dependent). ``max_postings`` caps the
materialized list per key (the full posting set stays queryable as the
mentions table partitioned by the key); index rows record the true count
alongside the (possibly truncated) list.

All stages are ``batch_format="pyarrow"`` — list collection is offset
surgery (ListArray.from_arrays), no pandas conversion anywhere.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _single_row_list(values: pa.Array) -> pa.ListArray:
    """Wrap an array as a one-row list column (zero-copy: offsets only)."""
    offsets = pa.array([0, len(values)], type=pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


def build_posting_index(
    ds,
    key_col: str,
    id_col: str = "doc_id",
    *,
    salt: int = 16,
    max_postings: int | None = None,
    out_key_col: str | None = None,
):
    """Generic salted posting-list index: ``key_col -> sorted [id_col]``.

    Output schema: (out_key_col or key_col, doc_ids: list<id>, n_postings).
    """
    out_key = out_key_col or key_col

    def add_salt(batch: pa.Table) -> pa.Table:
        import numpy as np

        # positional salt: assignment doesn't need to be content-based —
        # phase 2 merges and sorts, so any spread of a hot key's rows works
        return batch.append_column(
            "_salt", pa.array(np.arange(batch.num_rows, dtype=np.int64) % salt)
        )

    def collect_partial(group: pa.Table) -> pa.Table:
        ids = _as_array(group.column(id_col))
        return pa.Table.from_pydict(
            {
                key_col: _as_array(group.column(key_col)).slice(0, 1),
                "_ids": _single_row_list(ids),
                "_n": pa.array([len(ids)], type=pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        parts = _as_array(group.column("_ids"))
        ids = pc.list_flatten(parts)
        ids = ids.take(pc.array_sort_indices(ids))
        n = len(ids)
        if max_postings is not None and n > max_postings:
            ids = ids.slice(0, max_postings)
        return pa.Table.from_pydict(
            {
                out_key: _as_array(group.column(key_col)).slice(0, 1),
                "doc_ids": _single_row_list(ids),
                "n_postings": pa.array([n], type=pa.int64()),
            }
        )

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby([key_col, "_salt"]).map_groups(
        collect_partial, batch_format="pyarrow"
    )
    return partials.groupby(key_col).map_groups(merge, batch_format="pyarrow")


def build_label_index(
    mentions_ds,
    id_col: str = "doc_id",
    *,
    salt: int = 16,
    max_postings: int | None = None,
    key_col: str = "label",
):
    """A1: label -> sorted posting list of document ids (duplicates per doc
    retained, matching the reference's per-span append). ``key_col='pred'``
    serves the fused triples layout (output column stays ``label``)."""
    return build_posting_index(
        mentions_ds,
        key_col,
        id_col,
        salt=salt,
        max_postings=max_postings,
        out_key_col="label",
    )


def build_entity_index(
    mentions_ds,
    id_col: str = "doc_id",
    *,
    salt: int = 16,
    max_postings: int | None = None,
):
    """A2: lowercased surface form -> sorted posting list of document ids."""
    return build_posting_index(
        mentions_ds, "surface_norm", id_col, salt=salt, max_postings=max_postings
    )


def build_entity_index_salted(
    mentions_ds,
    id_col: str = "doc_id",
    *,
    salt: int = 16,
    max_postings: int | None = None,
    key_col: str = "surface_norm",
):
    """Backward-compatible alias — salting is now the only path."""
    return build_posting_index(
        mentions_ds, key_col, id_col, salt=salt, max_postings=max_postings
    )
