"""Distributed annotation import (S4/S5 in Ray Data form).

The reference's ``from_jsonl``/``from_spacy`` (quickner.rs:585-692) parse an
annotation dump, rebuild the corpus, and INFER the gazetteer from the
annotated spans (slice ``text[start:end]``, lowercase, distinct). The
driver-side facade (`api.Quickner.from_jsonl`) covers the in-memory
contract; this module is the distributed shape from SURVEY §2.1:
``read lines -> parse -> explode spans -> vectorized surface slice ->
distinct`` — streaming, for annotation dumps that don't fit one machine.

JSONL rows: ``{"id": ..., "text": ..., "label": [[start, end, label], ...]}``
spaCy rows (one JSON array total, or JSONL of pairs): ``[text, {"entity":
[[start, end, label], ...]}]``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..stages.detect import LABEL_TYPE


def _docs_batch(ids, texts, labels) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([str(i) for i in ids], type=pa.string()),
            "text": pa.array(texts, type=pa.large_string()),
            "label": pa.array(
                [
                    [{"start": s, "end": e, "label": l} for s, e, l in doc]
                    for doc in labels
                ],
                type=LABEL_TYPE,
            ),
        }
    )


def parse_jsonl_batch(batch: pa.Table) -> pa.Table:
    """`read_text` lines -> annotated-doc rows (JSON parse is inherently
    per-record; everything downstream is vectorized)."""
    from ..kernel.hashing import hash_text

    ids, texts, labels = [], [], []
    for line in batch.column("text").to_pylist():
        if not line.strip():
            continue
        row = json.loads(line)
        # missing id -> content hash (the in-memory facade's Document.id
        # semantics). A batch-local counter would collide across read_text
        # blocks and corrupt downstream per-doc dedup/joins.
        ids.append(row["id"] if "id" in row else hash_text(row["text"]))
        texts.append(row["text"])
        labels.append([(int(s), int(e), str(l)) for s, e, l in row.get("label", [])])
    return _docs_batch(ids, texts, labels)


def parse_spacy_batch(batch: pa.Table) -> pa.Table:
    """JSONL of spaCy pairs ``[text, {"entity": [...]}]`` -> doc rows."""
    from ..kernel.hashing import hash_text

    ids, texts, labels = [], [], []
    for line in batch.column("text").to_pylist():
        if not line.strip():
            continue
        text, meta = json.loads(line)
        ids.append(hash_text(text))  # content hash: stable across blocks
        texts.append(text)
        labels.append(
            [(int(s), int(e), str(l)) for s, e, l in meta.get("entity", [])]
        )
    return _docs_batch(ids, texts, labels)


def read_annotations_jsonl(path: str):
    """JSONL annotation dump -> Dataset of annotated docs
    (doc_id, text, label: list<struct>)."""
    import ray.data as rd

    return rd.read_text(path).map_batches(parse_jsonl_batch, batch_format="pyarrow")


def infer_gazetteer(annotated_ds):
    """Annotated docs -> distinct (name, label) gazetteer rows with corpus
    counts — the reference's annotation-driven gazetteer bootstrap
    (quickner.rs:608-621), distributed: explode spans (vectorized surface
    slice), lowercase, partial-then-final distinct."""
    from ..stages.canonicalize import canonical_entities, explode_mentions

    mentions = annotated_ds.map_batches(
        lambda b: explode_mentions(b, subj_col="doc_id"), batch_format="pyarrow"
    )
    ents = canonical_entities(mentions)
    return ents.map_batches(
        lambda b: b.rename_columns(
            ["name" if c == "surface_norm" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
