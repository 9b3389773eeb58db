"""Inverted indexes as derived datasets (A1/A2 distributed form).

``documents_label_index`` (label -> [doc ids], quickner.rs:719-728) and
``documents_entities_index`` (surface_norm -> [doc ids], quickner.rs:730-742)
become groupby-collect stages over the exploded mentions Dataset.

Partitioning note (SURVEY.md §2.6/§4): posting-list collection is the one
truly skew-exposed shuffle — a web-scale hot surface ("apple") makes one
giant group. ``max_postings`` caps the materialized list per key (the full
posting set stays queryable as the mentions table partitioned by
surface_norm); index rows record the true count alongside the (possibly
truncated) list.
"""

from __future__ import annotations

import pandas as pd


def _collect(id_col: str, key_cols: list[str], max_postings: int | None):
    def fn(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        n = len(ids)
        if max_postings is not None and n > max_postings:
            ids = ids[:max_postings]
        row = {k: [group[k].iloc[0]] for k in key_cols}
        row["doc_ids"] = [ids]
        row["n_postings"] = [n]
        return pd.DataFrame(row)

    return fn


def build_label_index(mentions_ds, id_col: str = "doc_id", max_postings: int | None = None):
    """A1: label -> posting list of document ids (duplicates per doc retained,
    matching the reference's per-span append)."""
    return mentions_ds.groupby("label").map_groups(
        _collect(id_col, ["label"], max_postings), batch_format="pandas"
    )


def build_entity_index(mentions_ds, id_col: str = "doc_id", max_postings: int | None = None):
    """A2: lowercased surface form -> posting list of document ids."""
    return mentions_ds.groupby("surface_norm").map_groups(
        _collect(id_col, ["surface_norm"], max_postings), batch_format="pandas"
    )


def build_entity_index_salted(
    mentions_ds,
    id_col: str = "doc_id",
    *,
    salt: int = 16,
    max_postings: int | None = None,
    key_col: str = "surface_norm",
):
    """A2 with SALTED keys — the hot-key path (north rule: "salted keys for
    skewed hot entities").

    Two-phase: phase 1 shuffles on ``(key, hash(id) % salt)`` so a Zipf-hot
    surface form splits across ``salt`` reducers (each collects a bounded
    partial list); phase 2 shuffles only the partial rows (<= salt per key)
    and concatenates. Posting lists come out SORTED (deterministic across
    runs/parallelism — unlike arrival order, which scheduling perturbs).
    """
    import pyarrow as pa

    def add_salt(batch: pa.Table) -> pa.Table:
        import numpy as np

        # positional salt: assignment doesn't need to be content-based —
        # phase 2 merges and sorts, so any spread of a hot key's rows works
        return batch.append_column(
            "_salt", pa.array(np.arange(batch.num_rows, dtype=np.int64) % salt)
        )

    def collect_partial(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                "_ids": [ids],
                "_n": [len(ids)],
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        for part in group["_ids"]:
            ids.extend(part)
        ids.sort()
        n = len(ids)
        if max_postings is not None and n > max_postings:
            ids = ids[:max_postings]
        return pd.DataFrame(
            {key_col: [group[key_col].iloc[0]], "doc_ids": [ids], "n_postings": [n]}
        )

    salted = mentions_ds.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby([key_col, "_salt"]).map_groups(
        collect_partial, batch_format="pandas"
    )
    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")
