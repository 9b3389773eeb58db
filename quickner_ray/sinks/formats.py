"""Conformance sinks K1-K5 — byte-compatible ports of ``Format::save``
(quickner-core/src/models.rs:39-165), including the documented quirks:

- K3 "csv" writes JSON-serialized documents one per line (same bytes as
  JSONL) to a ``.csv`` file (models.rs:92-102).
- K4 brat byte-slices the text with CHAR indices (models.rs:114) — a latent
  non-ASCII hazard in the reference; we replicate via byte slicing and raise
  on a broken UTF-8 boundary. Entity T-ids restart per document while the
  ``.ann``/``.txt`` files are corpus-wide (models.rs:113).
- K5 CoNLL assigns each span's label to the FIRST whitespace-token that
  CONTAINS the surface as a substring; everything else is ``O``
  (models.rs:139); later spans overwrite earlier labels on the same token.

The output path has its extension stripped and rewritten per format
(models.rs:49-55). JSON is serde-compact (no spaces).

These sinks serve reference-format conformance (small, ordered corpora,
written driver-side). The scale path materializes Parquet
(pipelines/kg.py); a Ray Dataset can still stream into these via
``iter_batches`` with ``preserve_order`` when reference file ordering
matters (SURVEY.md §4 Ordering).
"""

from __future__ import annotations

import json
import re

from ..kernel.chars import RUST_WHITESPACE

# Rust split_whitespace splits on char::is_whitespace runs, dropping empties.
_WS_SPLIT_RE = re.compile("[" + "".join(sorted(RUST_WHITESPACE)) + "]+")


def _strip_ext(path: str) -> str:
    """models.rs:49-55 — truncate at the LAST '.' if any '.' is present."""
    if "." in path:
        return path[: path.rfind(".")]
    return path


def _doc_json(doc) -> str:
    """serde-compact Document JSON with field order id, text, label."""
    return json.dumps(
        {"id": doc.id, "text": doc.text, "label": [list(t) for t in doc.label]},
        ensure_ascii=False,
        separators=(",", ":"),
    )


def write_jsonl(documents, path: str) -> str:
    path = _strip_ext(path)
    with open(path + ".jsonl", "w", encoding="utf-8") as f:
        for doc in documents:
            f.write(_doc_json(doc))
            f.write("\n")
    return path


def write_csv(documents, path: str) -> str:
    # reference quirk: identical bytes to JSONL, but a .csv extension
    path = _strip_ext(path)
    with open(path + ".csv", "w", encoding="utf-8") as f:
        for doc in documents:
            f.write(_doc_json(doc))
            f.write("\n")
    return path


def write_spacy(documents, path: str) -> str:
    path = _strip_ext(path)
    payload = [
        [doc.text, {"entity": [list(t) for t in doc.label]}] for doc in documents
    ]
    with open(path + ".json", "w", encoding="utf-8") as f:
        f.write(json.dumps(payload, ensure_ascii=False, separators=(",", ":")))
    return path


def write_brat(documents, path: str) -> str:
    path = _strip_ext(path)
    with open(path + ".txt", "w", encoding="utf-8") as ftxt, open(
        path + ".ann", "w", encoding="utf-8"
    ) as fann:
        for doc in documents:
            ftxt.write(doc.text)
            ftxt.write("\n")
            raw = doc.text.encode("utf-8")
            for tid, (start, end, label) in enumerate(doc.label):
                surface = raw[start:end].decode("utf-8")  # char-indices-as-bytes quirk
                fann.write(f"T{tid}\t{label}\t{start}\t{end}\t{surface}\n")
    return path


def write_conll(documents, path: str) -> str:
    path = _strip_ext(path)
    with open(path + ".txt", "w", encoding="utf-8") as f:
        for doc in documents:
            words = [w for w in _WS_SPLIT_RE.split(doc.text) if w]
            labels = ["O"] * len(words)
            raw = doc.text.encode("utf-8")
            for start, end, label in doc.label:
                surface = raw[start:end].decode("utf-8")
                for i, w in enumerate(words):
                    if surface in w:
                        labels[i] = label
                        break
            for w, lbl in zip(words, labels):
                f.write(f"{w}\t{lbl}\n")
            f.write("\n")
    return path


_WRITERS = {
    "jsonl": write_jsonl,
    "csv": write_csv,
    "spacy": write_spacy,
    "brat": write_brat,
    "conll": write_conll,
}


def save_annotations(documents, path: str, format: str = "jsonl") -> str:
    """``Format::save`` dispatch (models.rs:39-47)."""
    try:
        writer = _WRITERS[format]
    except KeyError:
        raise ValueError(f"unsupported format: {format!r}") from None
    return writer(documents, path)
