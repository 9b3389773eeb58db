from .canonicalize import (
    add_triple_columns,
    canonical_entities,
    explode_mentions,
    label_counts,
)
from .detect import MentionDetector, detect_mentions
from .dedup_exact import add_doc_id, dedup_exact
from .extract import extract_pages
from .filter_stage import filter_texts
from .indexes import build_entity_index, build_label_index

__all__ = [
    "MentionDetector",
    "add_doc_id",
    "add_triple_columns",
    "build_entity_index",
    "build_label_index",
    "canonical_entities",
    "dedup_exact",
    "detect_mentions",
    "explode_mentions",
    "extract_pages",
    "filter_texts",
    "label_counts",
]
