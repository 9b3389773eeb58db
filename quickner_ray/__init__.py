"""quickner_ray — a Ray-Data-native gazetteer-NER / KG-construction engine.

A from-scratch re-expression of omarmhaimdat/quickner's capabilities
(gazetteer Aho-Corasick annotation, indexes, import/export formats) as Ray
Data pipelines over Arrow batches, extended to the web-scale KG contract in
/root/repo/BASELINE.json: HTML extraction, mention detection with actor
pools, surface-form canonicalization shuffles, (subj, pred, obj) triple
materialization, dedup/similarity/text-analysis operators, checkpointed
resumable runs.

Layout:
- ``kernel/``     pure-Python conformance-critical semantics (no Ray)
- ``api``         reference-compatible ``Quickner``/``Document``/``Entity``
- ``sources/``    readers (CSV/JSONL/spaCy/Parquet pages + synth generator)
- ``sinks/``      conformance writers (JSONL/spaCy/CSV/brat/CoNLL) + Parquet
- ``stages/``     Ray Data batch stages (extract, detect, dedup, canonicalize,
                  indexes, near-dup, similarity, text analysis, multimodal)
- ``pipelines/``  end-to-end KG pipeline with lineage + resume
"""

from ._compat import patch_fsspec_http_race as _patch_fsspec

_patch_fsspec()

from .kernel import (
    Config,
    Filters,
    Gazetteer,
    annotate_text,
    annotate_texts,
    extract_text,
    hash_text,
    synth_page,
)

# reference package surface (src/lib.rs:12-24, quickner.pyi): the model
# classes and module-level loaders live at the TOP level, so
# ``from quickner import Quickner`` ports as ``from quickner_ray import
# Quickner`` one-for-one.
from .api import Document, Entity, Quickner, Text

from_jsonl = Quickner.from_jsonl
from_spacy = Quickner.from_spacy

# KG query surface (no reference counterpart — quickner has no query
# layer): SPARQL SELECT over a triples Dataset. Ray-free import; the
# engine modules load lazily inside run_select.
from .kernel.sparql import (
    SparqlError,
    parse_select,
    run_ask,
    run_construct,
    run_describe,
)
from .kernel.sparql import run_select as sparql

__version__ = "0.1.0"

__all__ = [
    "Config",
    "Document",
    "Entity",
    "Filters",
    "Gazetteer",
    "Quickner",
    "Text",
    "annotate_text",
    "annotate_texts",
    "extract_text",
    "from_jsonl",
    "from_spacy",
    "hash_text",
    "parse_select",
    "run_ask",
    "run_construct",
    "run_describe",
    "sparql",
    "SparqlError",
    "synth_page",
]
