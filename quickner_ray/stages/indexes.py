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
