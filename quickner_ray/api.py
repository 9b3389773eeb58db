"""Reference-compatible Python API: ``Entity``, ``Document``, ``Quickner``.

A drop-in surface for users of the reference package (src/pyquickner.rs,
src/pydocument.rs, src/pyentity.rs; typed stubs quickner.pyi): same
constructors, methods, and semantics, backed by the pure-Python kernel. This
facade is the in-memory conformance layer; the distributed path for large
corpora is ``quickner_ray.pipelines`` (same kernel inside Ray actors).

Pinned behaviors ported one-for-one:

- ``Document.annotate`` annotates a FRESH copy of the text (original casing
  kept on the object), extends the label list, and dedups preserving
  first-occurrence order (src/pydocument.rs:74-97) — so a case-sensitive
  pass followed by an insensitive one yields accumulated labels in
  first-seen order (tests/test.py:157-165).
- ``Quickner.process`` lowercases document text IN PLACE when
  case-insensitive (quickner-core/src/quickner.rs:266-270), extends labels
  without per-doc dedup (quickner.rs:278), rebuilds ``documents_hash`` and
  both inverted indexes (quickner.rs:281-287).
- ``find_documents_by_entity`` lowercases the query and preserves
  index-posting order with order-preserving dedup (src/pyquickner.rs:329-360).
- ``spacy(chunks)`` yields ceil(n/chunks) chunks preserving input order
  (quickner.rs:694-715; tests/test.py:143-155).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from .kernel.automaton import Gazetteer, Span
from .kernel.config import Config
from .kernel.hashing import hash_text
from .sinks.formats import save_annotations
from .sources.csv_sources import read_entities_csv, read_excludes_csv, read_texts_csv


class Text:
    """Plain text row (quickner-core/src/models.rs:13-16, src/pymodels.rs:9-12):
    a one-field value object; Eq/Hash on the text."""

    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text

    def __eq__(self, other):
        return isinstance(other, Text) and self.text == other.text

    def __hash__(self):
        return hash(self.text)

    def __repr__(self):
        return f'Text(text="{self.text}")'


class Entity:
    """Gazetteer row (quickner-core/src/entity.rs:9-26): Eq/Hash on (name, label)."""

    __slots__ = ("name", "label")

    def __init__(self, name: str, label: str):
        self.name = name
        self.label = label

    def __eq__(self, other):
        return (
            isinstance(other, Entity)
            and self.name == other.name
            and self.label == other.label
        )

    def __hash__(self):
        return hash((self.name, self.label))

    def __repr__(self):
        return f'Entity(name="{self.name}", label="{self.label}")'


class Document:
    """A text with span annotations (quickner-core/src/document.rs:14-19).

    ``id`` is a stable content hash of the text (semantics of
    utils.rs:95-102; value differs — documented in kernel/hashing.py).
    ``label`` holds CHAR-index triples ``(start, end, label)``.
    """

    __slots__ = ("id", "text", "label")

    def __init__(self, text: str, label: list[Span] | None = None):
        self.id = hash_text(text)
        self.text = text
        self.label: list[Span] = [tuple(t) for t in (label or [])]

    @staticmethod
    def from_string(text: str) -> "Document":
        return Document(text)

    def annotate(self, entities: list[Entity], case_sensitive: bool = False) -> None:
        """src/pydocument.rs:74-87: fresh-copy annotate + accumulate + dedup."""
        gaz = Gazetteer(((e.name, e.label) for e in entities), case_sensitive)
        text = self.text if case_sensitive else self.text.lower()
        new = gaz.annotate(text)
        self.label.extend(new)
        self._set_unique_labels()

    def _set_unique_labels(self) -> None:
        seen: list[Span] = []
        for t in self.label:
            if t not in seen:
                seen.append(t)
        self.label = seen

    # ANSI color cycle (src/utils.rs:25-35): red green yellow blue magenta cyan
    _PRETTY_COLORS = (31, 32, 33, 34, 35, 36)

    def pretty(self) -> str:
        """ANSI span render (src/pydocument.rs:121-167), quirks preserved:

        - colors assigned per label in FIRST-APPEARANCE order of the
          (unsorted) label list, cycling 6 ANSI codes;
        - spans rendered in stable start-order; OVERLAPPING spans garble the
          output (the reference's own TODO — slices are taken from the
          running cursor, not merged);
        - indices are treated as byte offsets into the UTF-8 text (the
          reference's Rust `&str[a..b]` slicing); out-of-range offsets raise
          ValueError (pydocument.rs:151-156).
        """
        color_of: dict[str, int] = {}
        for _s, _e, label in self.label:
            if label not in color_of:
                color_of[label] = self._PRETTY_COLORS[
                    len(color_of) % len(self._PRETTY_COLORS)
                ]
        raw = self.text.encode("utf-8")
        out = bytearray()
        cursor = 0
        for start, end, label in sorted(self.label, key=lambda t: t[0]):
            if start > len(raw) or end > len(raw):
                raise ValueError("start_label is greater than the length of the text")
            out += raw[cursor:start]
            out += b"\x1b[%dm" % color_of[label] + raw[start:end] + b"\x1b[0m"
            out += b"[%s]" % label.encode("utf-8")
            cursor = end
        out += raw[cursor:]
        return out.decode("utf-8")

    def __eq__(self, other):
        return (
            isinstance(other, Document)
            and self.id == other.id
            and self.text == other.text
            and self.label == other.label
        )

    def __repr__(self):
        spans = ", ".join(f"({s}, {e}, {lbl})" for s, e, lbl in self.label)
        return f'Document(id="{self.id}", text="{self.text}", label=[{spans}])'


class Quickner:
    """In-memory engine state (quickner-core/src/quickner.rs:23-34): a row
    store plus ``documents_hash`` (id -> doc), ``documents_label_index``
    (label -> [doc ids]) and ``documents_entities_index``
    (lowercased surface -> [doc ids])."""

    def __init__(
        self,
        documents: list[Document] | None = None,
        entities: list[Entity] | None = None,
        config: Config | str | None = None,
    ):
        if isinstance(config, str):
            config = Config.from_file(config)
        self.config: Config = config or Config()
        self._documents: list[Document] = list(documents or [])
        self._entities: list[Entity] = list(entities or [])
        self.documents_hash: dict[str, Document] = {}
        self.documents_label_index: dict[str, list[str]] = {}
        self.documents_entities_index: dict[str, list[str]] = {}
        self._rebuild_indexes()

    # -- properties (setters rebuild indexes, src/pyquickner.rs:114-127) ------
    @property
    def documents(self) -> list[Document]:
        return self._documents

    @documents.setter
    def documents(self, documents: list[Document]) -> None:
        self._documents = list(documents)
        self._rebuild_indexes()

    @property
    def entities(self) -> list[Entity]:
        return self._entities

    @entities.setter
    def entities(self, entities: list[Entity]) -> None:
        self._entities = list(entities)

    # -- index maintenance (quickner.rs:719-764) -------------------------------
    def _rebuild_indexes(self) -> None:
        self.documents_hash = {doc.id: doc for doc in self._documents}
        self.build_label_index()
        self.build_entity_index()

    def build_label_index(self) -> None:
        index: dict[str, list[str]] = {}
        for doc in self._documents:
            for _, _, label in doc.label:
                index.setdefault(label, []).append(doc.id)
        self.documents_label_index = index

    def build_entity_index(self) -> None:
        index: dict[str, list[str]] = {}
        for doc in self._documents:
            for start, end, _ in doc.label:
                surface = doc.text[start:end]
                index.setdefault(surface.lower(), []).append(doc.id)
        self.documents_entities_index = index

    def add_document(self, document: Document) -> None:
        if document.id in self.documents_hash:
            return
        self._documents.append(document)
        self.documents_hash[document.id] = document
        for _, _, label in document.label:
            self.documents_label_index.setdefault(label, []).append(document.id)
        for start, end, _ in document.label:
            surface = document.text[start:end].lower()
            self.documents_entities_index.setdefault(surface, []).append(document.id)

    def add_entity(self, entity: Entity) -> None:
        if entity in self._entities:
            return
        self._entities.append(entity)

    # -- the batch pipeline (quickner.rs:406-491) ------------------------------
    def process(self, save: bool = False) -> None:
        cfg = self.config
        cfg.entities.filters.set_special_characters()
        cfg.texts.filters.set_special_characters()
        if not self._entities:
            pairs = read_entities_csv(
                cfg.entities.input.path,
                cfg.entities.filters,
                cfg.entities.input.filter or False,
            )
            self._entities = [Entity(n, l) for n, l in pairs]
        if not self._documents:
            texts = read_texts_csv(
                cfg.texts.input.path,
                cfg.texts.filters,
                cfg.texts.input.filter or False,
            )
            self._documents = [Document(t) for t in texts]
        excludes: set[str] = set()
        if cfg.entities.excludes.path:
            excludes = read_excludes_csv(cfg.entities.excludes.path)
        if excludes:
            self._entities = _unique_entities(
                e for e in self._entities if e.name not in excludes
            )
        else:
            self._entities = _unique_entities(self._entities)
        case_sensitive = cfg.entities.filters.case_sensitive
        if not case_sensitive:
            self._entities = [Entity(e.name.lower(), e.label) for e in self._entities]
        gaz = Gazetteer(((e.name, e.label) for e in self._entities), case_sensitive)
        text_case_sensitive = cfg.texts.filters.case_sensitive
        for doc in self._documents:
            if not text_case_sensitive:
                doc.text = doc.text.lower()  # in-place lowercase (quickner.rs:267-270)
            spans = gaz.annotate(doc.text)
            doc.label.extend(spans)  # no per-doc dedup here (quickner.rs:278)
        self._rebuild_indexes()
        if save:
            self.save_annotations(cfg.annotations.output.path, cfg.annotations.format)

    def save_annotations(self, path: str | None = None, format: str = "jsonl") -> str:
        path = path or self.config.annotations.output.path
        return save_annotations(self._documents, path, format)

    # -- lookups (src/pyquickner.rs:297-360) -----------------------------------
    def find_documents_by_label(self, label: str) -> list[Document]:
        ids = self.documents_label_index.get(label)
        if ids is None:
            return []
        return _dedup_docs(self.documents_hash[i] for i in ids)

    def find_documents_by_entity(self, name: str) -> list[Document]:
        ids = self.documents_entities_index.get(name.lower())
        if ids is None:
            return []
        return _dedup_docs(self.documents_hash[i] for i in ids)

    # -- exports ---------------------------------------------------------------
    def spacy(self, chunks: int | None = None) -> Iterator[list[tuple[str, dict]]]:
        """Chunked spaCy-format generator (quickner.rs:694-715)."""
        rows = [
            (doc.text, {"entity": [list(t) for t in doc.label]})
            for doc in self._documents
        ]
        size = chunks if chunks is not None else len(rows)
        size = max(size, 1)
        for i in range(0, len(rows), size):
            yield rows[i : i + size]

    def numpy(self):
        """K7 export (src/pyquickner.rs:398-448): object ndarray of
        (id, text, [(s, e, label), ...]) rows."""
        import numpy as np

        return np.array(
            [(doc.id, doc.text, [tuple(t) for t in doc.label]) for doc in self._documents],
            dtype=object,
        )

    def to_jsonl(self, path: str) -> None:
        save_annotations(self._documents, path, "jsonl")

    def to_csv(self, path: str) -> None:
        save_annotations(self._documents, path, "csv")

    def to_spacy(self, path: str) -> None:
        save_annotations(self._documents, path, "spacy")

    # -- loaders (quickner.rs:585-692) -----------------------------------------
    @staticmethod
    def from_jsonl(path: str) -> "Quickner":
        import json

        documents: list[Document] = []
        entities: list[Entity] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                row = json.loads(line)
                doc = Document(row["text"], [tuple(t) for t in row["label"]])
                doc.id = row.get("id", doc.id)
                documents.append(doc)
                for start, end, label in doc.label:
                    # char->byte then byte-slice (quickner.rs:610-611) == char slice
                    entities.append(Entity(doc.text[start:end].lower(), label))
        quick = Quickner(documents=documents, entities=_unique_entities(entities))
        return quick

    @staticmethod
    def from_spacy(path: str) -> "Quickner":
        import json

        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        documents: list[Document] = []
        entities: list[Entity] = []
        for text, ent in rows:
            spans = [tuple(t) for t in ent["entity"]]
            documents.append(Document(text, spans))
            raw = text.encode("utf-8")
            for start, end, label in spans:
                # byte-slice quirk (quickner.rs:668)
                entities.append(Entity(raw[start:end].decode("utf-8").lower(), label))
        quick = Quickner(documents=documents, entities=_unique_entities(entities))
        return quick

    def __repr__(self):
        counts: dict[str, int] = {}
        for doc in self._documents:
            for _, _, label in doc.label:
                counts[label] = counts.get(label, 0) + 1
        summary = ", ".join(f"{k}: {v}" for k, v in counts.items())
        return (
            f"Entities: {len(self._entities)} | "
            f"Documents: {len(self._documents)} | "
            f"Annotations: {summary}"
        )


def _unique_entities(entities: Iterable[Entity]) -> list[Entity]:
    seen: set[tuple[str, str]] = set()
    out: list[Entity] = []
    for e in entities:
        key = (e.name, e.label)
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


def _dedup_docs(docs: Iterable[Document]) -> list[Document]:
    out: list[Document] = []
    for d in docs:
        if d not in out:
            out.append(d)
    return out
