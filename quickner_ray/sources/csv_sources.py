"""Driver-side CSV readers for the small control inputs.

Ports of the reference's readers with their exact failure semantics:

- ``read_entities_csv`` (quickner-core/src/quickner.rs:493-529): header cols
  ``name,label``; optional filter (+ lowercase when case-insensitive);
  set-dedup; ANY parse error -> warn and return EMPTY (the reference bails
  out of the whole load).
- ``read_texts_csv`` (quickner.rs:531-564): header col ``text``; optional
  filter; set-dedup by content; parse error -> hard failure (the reference
  calls exit(1); we raise).
- ``read_excludes_csv`` (quickner.rs:566-583): first column -> set of names.

These are SMALL side inputs (gazetteer, excludes): they are read on the
driver and broadcast to workers via the compiled Gazetteer, never shuffled.
Large text corpora use Parquet pages (sources/pages.py) instead.
"""

from __future__ import annotations

import csv
import logging

from ..kernel.filters import Filters

logger = logging.getLogger(__name__)


def read_entities_csv(
    path: str, filters: Filters | None = None, filter: bool = False
) -> list[tuple[str, str]]:
    """Returns dedup'd (name, label) pairs, first-occurrence order."""
    filters = filters or Filters()
    out: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    try:
        with open(path, newline="", encoding="utf-8") as f:
            reader = csv.DictReader(f)
            for row in reader:
                if row.get("name") is None or row.get("label") is None or row.get(None):
                    raise ValueError(f"malformed entities row: {row}")
                name, label = row["name"], row["label"]
                if filter:
                    if not filters.is_valid(name):
                        continue
                    if not filters.case_sensitive:
                        name = name.lower()
                key = (name, label)
                if key not in seen:
                    seen.add(key)
                    out.append(key)
    except (OSError, csv.Error, ValueError) as e:
        logger.warning("Unable to parse the entities file, using empty list: %s", e)
        return []
    return out


def read_texts_csv(path: str, filters: Filters | None = None, filter: bool = False) -> list[str]:
    """Returns dedup'd texts, first-occurrence order. Parse errors raise."""
    filters = filters or Filters()
    out: list[str] = []
    seen: set[str] = set()
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            if row.get("text") is None:
                raise ValueError(f"Unable to parse the texts file: missing 'text' in {row}")
            text = row["text"]
            if filter and not filters.is_valid(text):
                continue
            if text not in seen:
                seen.add(text)
                out.append(text)
    return out


def read_excludes_csv(path: str) -> set[str]:
    """First CSV column -> set of entity names to drop (anti-join side)."""
    out: set[str] = set()
    with open(path, newline="", encoding="utf-8") as f:
        rows = csv.reader(f)
        next(rows, None)  # the reference's csv::Reader treats row 1 as a header
        for row in rows:
            if row:
                out.add(row[0])
    return out
