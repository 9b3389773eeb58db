"""Port of the reference's own test suite (tests/test.py) against our
reference-compatible API, plus the aggregate goldens from FIXTURES.md F-3."""

from __future__ import annotations

import pytest

from quickner_ray.api import Document, Entity, Quickner

TEXTS = (
    "rust is made by Mozilla",
    "Python was created by Guido van Rossum",
    "Java was created by James Gosling at Sun Microsystems",
    "Swift was created by Chris Lattner and Apple",
    "You can find more information about Rust at https://www.rust-lang.org/",
)
ENTITIES = (
    ("Rust", "PL"),
    ("Python", "PL"),
    ("Java", "PL"),
    ("Swift", "PL"),
    ("Mozilla", "ORG"),
    ("Apple", "ORG"),
    ("Sun Microsystems", "ORG"),
    ("Guido van Rossum", "PERSON"),
    ("James Gosling", "PERSON"),
    ("Chris Lattner", "PERSON"),
)
# spans on the LOWERCASED texts (the reference lowercases doc text in place)
ANNOTATIONS = {
    "rust is made by mozilla": [(0, 4, "PL"), (16, 23, "ORG")],
    "python was created by guido van rossum": [(0, 6, "PL"), (22, 38, "PERSON")],
    "java was created by james gosling at sun microsystems": [
        (0, 4, "PL"),
        (20, 33, "PERSON"),
        (37, 53, "ORG"),
    ],
    "swift was created by chris lattner and apple": [
        (0, 5, "PL"),
        (21, 34, "PERSON"),
        (39, 44, "ORG"),
    ],
}


def make_quick():
    documents = [Document(text) for text in TEXTS]
    entities = [Entity(*e) for e in ENTITIES]
    return Quickner(documents=documents, entities=entities)


def assert_correct(documents):
    for document in documents:
        if document.text in ANNOTATIONS:
            assert document.label == ANNOTATIONS[document.text]


class TestQuicknerReferenceSuite:
    def test_quickner_from_documents(self):
        quick = Quickner(documents=[Document(t) for t in TEXTS])
        assert len(quick.documents) == 5
        assert len(quick.entities) == 0
        quick.entities = [Entity(*e) for e in ENTITIES]
        quick.process()
        assert sum(len(d.label) for d in quick.documents) == 12
        assert_correct(quick.documents)

    def test_quickner_from_documents_and_entities(self):
        quick = make_quick()
        assert len(quick.documents) == 5
        assert len(quick.entities) == 10
        quick.process()
        assert sum(len(d.label) for d in quick.documents) == 12
        assert_correct(quick.documents)

    def test_find_document_by_label(self):
        quick = make_quick()
        quick.process()
        assert len(quick.find_documents_by_label("PL")) == 5
        assert len(quick.find_documents_by_label("ORG")) == 3
        assert len(quick.find_documents_by_label("PERSON")) == 3
        assert quick.find_documents_by_label("NOPE") == []

    def test_setting_documents(self):
        quick = make_quick()
        quick.process()
        documents = quick.documents
        quick.documents = []
        assert len(quick.documents) == 0
        quick.documents = documents
        quick.process()
        assert len(quick.documents) == 5
        assert len(quick.find_documents_by_entity("Rust")) == 2

    @pytest.mark.parametrize(
        "name,n",
        [("Rust", 2)] + [(e[0], 1) for e in ENTITIES if e[0] != "Rust"],
    )
    def test_find_document_by_entity(self, name, n):
        quick = make_quick()
        quick.process()
        assert len(quick.find_documents_by_entity(name)) == n

    def test_get_spacy_generator(self):
        quick = make_quick()
        quick.process()
        assert len(list(quick.spacy())) == 1
        assert len(list(quick.spacy(chunks=2))) == 3
        assert len(list(quick.spacy(chunks=3))) == 2
        assert len(list(quick.spacy(chunks=5))) == 1

    def test_single_document_annotation(self):
        rust = Document.from_string("rust is made by Mozilla")
        entities = [Entity("Rust", "PL"), Entity("Mozilla", "ORG")]
        rust.annotate(entities, case_sensitive=True)
        assert len(rust.label) == 1
        rust.annotate(entities, case_sensitive=False)
        assert len(rust.label) == 2
        # accumulate order: first-seen wins (src/pydocument.rs:74-97)
        assert rust.label[0][2] == "ORG"
        assert rust.label[1][2] == "PL"

    def test_character_level_slicing(self):
        entity = Entity("Python", "PL")
        document = Document(
            "Indizes auf Zeichenebene anstelle von Indizes auf Byteebene, "
            "um Python-Slicing zu unterstützen"
        )
        document.annotate([entity], case_sensitive=False)
        assert len(document.label) == 1
        start, end, _ = document.label[0]
        assert document.text[start:end] == "Python"

    def test_repr_label_counts(self):
        quick = make_quick()
        quick.process()
        r = repr(quick)
        assert "Entities: 10" in r and "Documents: 5" in r
        assert "PL: 6" in r  # 5 docs, URL text has 2 PL spans

    def test_numpy_export(self):
        quick = make_quick()
        quick.process()
        arr = quick.numpy()
        assert arr.shape[0] == 5
        assert arr[0][1] == quick.documents[0].text

    def test_add_document_and_entity_dedup(self):
        quick = Quickner()
        quick.add_document(Document("hello world"))
        quick.add_document(Document("hello world"))
        assert len(quick.documents) == 1
        quick.add_entity(Entity("a", "L"))
        quick.add_entity(Entity("a", "L"))
        assert len(quick.entities) == 1


class TestPackageSurface:
    """src/lib.rs:12-24: model classes + loaders at package top level;
    Document.pretty (src/pydocument.rs:121-167)."""

    def test_top_level_imports(self, tmp_path):
        import quickner_ray as q

        assert q.Quickner is Quickner and q.Document is Document
        assert q.Entity is Entity
        assert q.Text("abc") == q.Text("abc") and q.Text("abc") != q.Text("b")
        quick = make_quick()
        quick.process()
        path = str(tmp_path / "a.jsonl")
        quick.to_jsonl(path)
        q2 = q.from_jsonl(path)  # module-level loader
        assert len(q2.documents) == len(TEXTS)
        quick.to_spacy(str(tmp_path / "a.json"))
        q3 = q.from_spacy(str(tmp_path / "a.json"))
        assert len(q3.documents) == len(TEXTS)

    def test_pretty_render(self):
        doc = Document("rust is made by mozilla")
        doc.label = [(0, 4, "PL"), (16, 23, "ORG")]
        out = doc.pretty()
        # first-appearance color order: PL=red(31), ORG=green(32)
        assert out == (
            "\x1b[31mrust\x1b[0m[PL] is made by \x1b[32mmozilla\x1b[0m[ORG]"
        )

    def test_pretty_color_cycle_and_sorting(self):
        doc = Document("a b c d e f g h")
        # 7 labels -> the 7th cycles back to red; spans given out of order
        doc.label = [(2 * i, 2 * i + 1, f"L{i}") for i in range(7)][::-1]
        out = doc.pretty()
        # color map is first-appearance over the UNSORTED list: L6 (listed
        # first) gets red; L0 is the 7th distinct label -> cycles to red too
        assert "\x1b[31mg\x1b[0m[L6]" in out
        assert "\x1b[31ma\x1b[0m[L0]" in out
        # render order is by start: L0's span comes first in the output
        assert out.index("[L0]") < out.index("[L6]")

    def test_pretty_out_of_range_raises(self):
        doc = Document("short")
        doc.label = [(0, 99, "X")]
        with pytest.raises(ValueError):
            doc.pretty()
