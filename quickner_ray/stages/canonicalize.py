"""Mention explosion, canonicalization, and triple materialization.

This generalizes the reference's entity index (A2, quickner.rs:730-742 —
lowercased-surface -> doc ids) into the KG-construction shuffle demanded by
the north rule:

- ``explode_mentions``: annotated docs -> one row per mention, vectorized
  via ``pc.list_flatten``/``list_parent_indices`` (no Python row loop over
  docs; surfaces are sliced only for actual mentions).
- ``canonical_entities``: the canonicalization "shuffle" done as
  partial-then-final aggregation: each batch pre-aggregates counts per
  (surface_norm, label) — bounding skew because a batch contributes at most
  ONE row per key no matter how hot the surface is (the salting/combiner
  strategy of SURVEY.md §4) — then a small ``groupby().sum()`` merges
  partials. Canonical entity id = md5("surface_norm\\x00label").
- ``add_triple_columns``: mentions -> (subj, pred, obj) triples WITHOUT any
  shuffle: obj is the deterministic canonical id, computed per batch.
- ``label_counts``: A5 per-label totals, same partial-aggregate shape.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def entity_id(surface_norm: str, label: str) -> str:
    return hashlib.md5(
        surface_norm.encode("utf-8") + b"\x00" + label.encode("utf-8")
    ).hexdigest()


def explode_mentions(batch: pa.Table, *, subj_col: str = "doc_id") -> pa.Table:
    """Annotated-docs batch -> mentions batch
    (subj, doc_id?, label, start, end, surface, surface_norm)."""
    labels = batch.column("label")
    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()
    flat = pc.list_flatten(labels)
    parents = pc.list_parent_indices(labels)
    starts = flat.field("start")
    ends = flat.field("end")
    lbls = flat.field("label")
    texts = batch.column("text").to_pylist()
    p = parents.to_pylist()
    s_list = starts.to_pylist()
    e_list = ends.to_pylist()
    surfaces = [texts[pi][si:ei] for pi, si, ei in zip(p, s_list, e_list)]
    surface_arr = pa.array(surfaces, type=pa.string())
    # A2 lowercases the surface when indexing (quickner.rs:737)
    surface_norm = pc.utf8_lower(surface_arr)
    cols = {}
    for name in (subj_col, "doc_id", "url", "lang"):
        if name in batch.column_names and name not in cols:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(parents)
    cols["label"] = lbls
    cols["start"] = starts
    cols["end"] = ends
    cols["surface"] = surface_arr
    cols["surface_norm"] = surface_norm
    return pa.Table.from_pydict(cols)


def partial_entity_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: at most one row per (surface_norm, label).
    Accepts mention rows (``label``) or triple rows (``pred``)."""
    label_col = "label" if "label" in batch.column_names else "pred"
    out = batch.group_by(["surface_norm", label_col]).aggregate(
        [("surface_norm", "count")]
    )
    return out.rename_columns(["surface_norm", "label", "partial_count"])


def canonical_entities(mentions_ds):
    """Mentions (or triples) Dataset -> canonical entity table
    (entity_id, surface_norm, label, n_mentions)."""
    from ray.data.aggregate import Sum

    partials = mentions_ds.map_batches(partial_entity_counts, batch_format="pyarrow")
    merged = partials.groupby(["surface_norm", "label"]).aggregate(
        Sum("partial_count", alias_name="n_mentions")
    )

    def _with_id(batch: pa.Table) -> pa.Table:
        ids = [
            entity_id(s, l)
            for s, l in zip(
                batch.column("surface_norm").to_pylist(),
                batch.column("label").to_pylist(),
            )
        ]
        return batch.append_column("entity_id", pa.array(ids, type=pa.string()))

    return merged.map_batches(_with_id, batch_format="pyarrow")


def add_triple_columns(batch: pa.Table, *, subj_col: str = "url") -> pa.Table:
    """Mentions batch -> triples batch. No shuffle: obj is content-derived.

    subj = the document (url if present else doc_id), pred = label,
    obj = canonical entity id; surface/start/end retained as evidence.
    """
    if subj_col not in batch.column_names:
        subj_col = "doc_id"
    ids = [
        entity_id(s, l)
        for s, l in zip(
            batch.column("surface_norm").to_pylist(),
            batch.column("label").to_pylist(),
        )
    ]
    out = pa.Table.from_pydict(
        {
            "subj": batch.column(subj_col).cast(pa.string()),
            "pred": batch.column("label"),
            "obj": pa.array(ids, type=pa.string()),
            "surface_norm": batch.column("surface_norm"),
            "start": batch.column("start"),
            "end": batch.column("end"),
        }
    )
    return out


def partial_label_counts(batch: pa.Table) -> pa.Table:
    return (
        batch.group_by(["label"])
        .aggregate([("label", "count")])
        .rename_columns(["label", "partial_count"])
    )


def label_counts(mentions_ds):
    """A5: label -> total mention count (partial-then-final aggregate)."""
    from ray.data.aggregate import Sum

    partials = mentions_ds.map_batches(partial_label_counts, batch_format="pyarrow")
    return partials.groupby("label").aggregate(Sum("partial_count", alias_name="n_mentions"))


def label_counts_from_entities(entities_ds):
    """A5 computed from the (tiny) canonical-entity table instead of a
    full-corpus pass: sum n_mentions per label."""
    from ray.data.aggregate import Sum

    return entities_ds.groupby("label").aggregate(
        Sum("n_mentions", alias_name="n_mentions")
    )
