"""Sources (CSV readers, loaders S4/S5) and sinks (K1-K5 byte goldens)."""

from __future__ import annotations

import json
import os

from quickner_ray.api import Document, Entity, Quickner
from quickner_ray.kernel.filters import Filters
from quickner_ray.sinks.formats import save_annotations
from quickner_ray.sources.csv_sources import (
    read_entities_csv,
    read_excludes_csv,
    read_texts_csv,
)


def make_processed():
    texts = ["rust is made by Mozilla", "Swift was created by Chris Lattner and Apple"]
    ents = [Entity("Rust", "PL"), Entity("Mozilla", "ORG"), Entity("Swift", "PL"),
            Entity("Chris Lattner", "PERSON"), Entity("Apple", "ORG")]
    q = Quickner(documents=[Document(t) for t in texts], entities=ents)
    q.process()
    return q


class TestCsvSources:
    def test_entities_reader(self, tmp_path):
        p = tmp_path / "entities.csv"
        p.write_text('name,label\nRust,PL\n"Moe & Jack, Inc.",ORG\nRust,PL\n')
        rows = read_entities_csv(str(p))
        assert rows == [("Rust", "PL"), ("Moe & Jack, Inc.", "ORG")]

    def test_entities_reader_filter_lowercases(self, tmp_path):
        p = tmp_path / "entities.csv"
        p.write_text("name,label\nRust,PL\nab,SHORT\n")
        rows = read_entities_csv(str(p), Filters(min_length=3), filter=True)
        assert rows == [("rust", "PL")]

    def test_entities_reader_malformed_returns_empty(self, tmp_path):
        p = tmp_path / "entities.csv"
        p.write_text("name,label\nRust,PL\nbad,row,extra\n")
        assert read_entities_csv(str(p)) == []

    def test_texts_reader_dedups(self, tmp_path):
        p = tmp_path / "texts.csv"
        p.write_text('text\n"hello, world"\nhello\n"hello, world"\n')
        assert read_texts_csv(str(p)) == ["hello, world", "hello"]

    def test_excludes_skips_header_row(self, tmp_path):
        p = tmp_path / "excludes.csv"
        p.write_text("name\nApple\nMozilla\n")
        assert read_excludes_csv(str(p)) == {"Apple", "Mozilla"}


class TestSinks:
    def test_jsonl_bytes(self, tmp_path):
        q = make_processed()
        out = str(tmp_path / "out.anything")
        save_annotations(q.documents, out, "jsonl")
        lines = (tmp_path / "out.jsonl").read_text().splitlines()
        assert len(lines) == 2
        row = json.loads(lines[0])
        assert list(row.keys()) == ["id", "text", "label"]
        assert row["text"] == "rust is made by mozilla"
        assert row["label"] == [[0, 4, "PL"], [16, 23, "ORG"]]
        # serde-compact: no spaces after separators
        assert ", " not in lines[0].split('"text"')[0]

    def test_csv_quirk_same_bytes_as_jsonl(self, tmp_path):
        q = make_processed()
        save_annotations(q.documents, str(tmp_path / "a.x"), "jsonl")
        save_annotations(q.documents, str(tmp_path / "b.x"), "csv")
        assert (tmp_path / "a.jsonl").read_bytes() == (tmp_path / "b.csv").read_bytes()

    def test_spacy_format(self, tmp_path):
        q = make_processed()
        save_annotations(q.documents, str(tmp_path / "out.json"), "spacy")
        data = json.loads((tmp_path / "out.json").read_text())
        assert data[0][0] == "rust is made by mozilla"
        assert data[0][1]["entity"] == [[0, 4, "PL"], [16, 23, "ORG"]]

    def test_brat_pair(self, tmp_path):
        q = make_processed()
        save_annotations(q.documents, str(tmp_path / "out.any"), "brat")
        txt = (tmp_path / "out.txt").read_text().splitlines()
        ann = (tmp_path / "out.ann").read_text().splitlines()
        assert txt[0] == "rust is made by mozilla"
        assert ann[0] == "T0\tPL\t0\t4\trust"
        assert ann[1] == "T1\tORG\t16\t23\tmozilla"
        # T-ids restart per document (models.rs:113)
        assert ann[2].startswith("T0\t")

    def test_conll_first_containing_word_quirk(self, tmp_path):
        q = make_processed()
        save_annotations(q.documents, str(tmp_path / "out.c"), "conll")
        content = (tmp_path / "out.txt").read_text()
        blocks = content.strip("\n").split("\n\n")
        assert len(blocks) == 2
        first = [line.split("\t") for line in blocks[0].splitlines()]
        assert first[0] == ["rust", "PL"]
        assert first[1] == ["is", "O"]
        assert first[4] == ["mozilla", "ORG"]

    def test_extension_rewrite(self, tmp_path):
        q = make_processed()
        returned = save_annotations(q.documents, str(tmp_path / "deep.name.ext"), "jsonl")
        assert returned.endswith("deep.name")
        assert (tmp_path / "deep.name.jsonl").exists()


class TestLoaders:
    def test_jsonl_roundtrip_infers_gazetteer(self, tmp_path):
        q = make_processed()
        q.to_jsonl(str(tmp_path / "out.jsonl"))
        q2 = Quickner.from_jsonl(str(tmp_path / "out.jsonl"))
        assert len(q2.documents) == 2
        names = {e.name for e in q2.entities}
        assert names == {"rust", "mozilla", "swift", "chris lattner", "apple"}
        # indexes rebuilt
        assert len(q2.find_documents_by_entity("rust")) == 1

    def test_spacy_roundtrip(self, tmp_path):
        q = make_processed()
        q.to_spacy(str(tmp_path / "out.json"))
        q2 = Quickner.from_spacy(str(tmp_path / "out.json"))
        assert len(q2.documents) == 2
        assert {e.name for e in q2.entities} == {
            "rust", "mozilla", "swift", "chris lattner", "apple"
        }

    def test_excludes_anti_join(self, tmp_path):
        ex = tmp_path / "excludes.csv"
        ex.write_text("name\nApple\n")
        q = Quickner(
            documents=[Document("i love Apple and Rust")],
            entities=[Entity("Apple", "ORG"), Entity("Rust", "PL")],
        )
        q.config.entities.excludes.path = str(ex)
        q.process()
        labels = {lbl for _, _, lbl in q.documents[0].label}
        assert labels == {"PL"}


class TestDistributedAnnotationImport:
    """S4 in Ray Data form: JSONL dump -> docs -> inferred gazetteer,
    matching the driver-side api.Quickner.from_jsonl result."""

    def test_roundtrip_and_gazetteer_inference(self, ray_session, tmp_path):
        import json

        from quickner_ray.api import Document, Entity, Quickner
        from quickner_ray.sources.annotations import (
            infer_gazetteer,
            read_annotations_jsonl,
        )

        texts = [
            "rust is made by mozilla",
            "python was created by guido van rossum",
            "rust and python are languages",
        ]
        entities = [
            Entity("rust", "PL"),
            Entity("python", "PL"),
            Entity("mozilla", "ORG"),
            Entity("guido van rossum", "PERSON"),
        ]
        q = Quickner(documents=[Document(t) for t in texts])
        q.entities = entities
        q.process()
        path = str(tmp_path / "ann.jsonl")
        q.to_jsonl(path)

        ds = read_annotations_jsonl(path)
        docs = ds.to_pandas()
        assert len(docs) == 3
        assert set(docs.columns) == {"doc_id", "text", "label"}

        gaz = infer_gazetteer(ds).to_pandas()
        got = {(r["name"], r["label"]) for _, r in gaz.iterrows()}
        # reference semantics: inferred gazetteer = lowercased surfaces of
        # all annotated spans (same as api.from_jsonl)
        q2 = Quickner.from_jsonl(path)
        expected = {(e.name, e.label) for e in q2.entities}
        assert got == expected
        assert ("rust", "PL") in got
        # counts: "rust" appears in 2 docs -> at least 2 mentions
        rust_count = int(gaz[gaz["name"] == "rust"]["n_mentions"].iloc[0])
        assert rust_count >= 2


class TestDistributedJsonlSink:
    def test_lines_byte_equal_reference_sink(self, ray_session, tmp_path):
        """Distributed part files carry the SAME line bytes as the
        reference-conformant in-memory sink, and round-trip via the
        from_jsonl loader."""
        import glob as _glob

        import ray.data as rd

        from quickner_ray.api import Document
        from quickner_ray.sinks.distributed import write_jsonl_dataset
        from quickner_ray.sinks.formats import write_jsonl

        docs = [
            Document("the sort and hash join"),
            Document("plain text, no entities"),
            Document("ünïcode étexte"),
        ]
        docs[0].label = [(4, 8, "OPERATOR"), (13, 22, "OPERATOR")]
        ref_path = write_jsonl(docs, str(tmp_path / "ref.jsonl"))
        ref_lines = open(ref_path + ".jsonl", encoding="utf-8").read().splitlines()

        tab = __import__("pyarrow").table(
            {
                "doc_id": [d.id for d in docs],
                "text": [d.text for d in docs],
                "label": [
                    [
                        {"start": s, "end": e, "label": l}
                        for (s, e, l) in d.label
                    ]
                    for d in docs
                ],
            }
        )
        out = str(tmp_path / "dist")
        manifest = write_jsonl_dataset(
            rd.from_arrow(tab), out, id_col="doc_id"
        ).take_all()
        assert sum(m["rows"] for m in manifest) == len(docs)
        got_lines = []
        for f in sorted(_glob.glob(os.path.join(out, "part-*.jsonl"))):
            got_lines += open(f, encoding="utf-8").read().splitlines()
        assert sorted(got_lines) == sorted(ref_lines)

    def test_all_formats_byte_equal_reference_sinks(self, ray_session, tmp_path):
        """Every format's part files concatenate (in some part order) to the
        same record set the in-memory conformance writers produce."""
        import glob as _glob

        import ray.data as rd

        from quickner_ray.api import Document
        from quickner_ray.sinks.distributed import (
            _PART_EXTS,
            write_annotations_dataset,
        )
        from quickner_ray.sinks.formats import save_annotations

        docs = [
            Document("the sort and hash join"),
            Document("ünïcode étexte berlin"),
        ]
        docs[0].label = [(4, 8, "OPERATOR")]
        docs[1].label = [(15, 21, "CITY")]

        tab = __import__("pyarrow").table(
            {
                "doc_id": [d.id for d in docs],
                "text": [d.text for d in docs],
                "label": [
                    [{"start": s, "end": e, "label": l} for (s, e, l) in d.label]
                    for d in docs
                ],
            }
        )
        for fmt, exts in _PART_EXTS.items():
            ref_base = save_annotations(docs, str(tmp_path / f"ref_{fmt}.x"), fmt)
            out = str(tmp_path / f"dist_{fmt}")
            manifest = write_annotations_dataset(
                rd.from_arrow(tab), out, format=fmt
            ).take_all()
            assert sum(m["rows"] for m in manifest) == len(docs)
            for ext in exts:
                ref_bytes = open(ref_base + ext, "rb").read()
                got = b"".join(
                    open(f, "rb").read()
                    for f in sorted(_glob.glob(os.path.join(out, "part-*" + ext)))
                )
                if fmt == "spacy":
                    # spacy is one JSON array per file; compare parsed docs
                    arrays = [
                        json.load(open(f, encoding="utf-8"))
                        for f in sorted(_glob.glob(os.path.join(out, "part-*" + ext)))
                    ]
                    flat = [d for a in arrays for d in a]
                    assert sorted(map(json.dumps, flat)) == sorted(
                        map(json.dumps, json.load(open(ref_base + ext, encoding="utf-8")))
                    )
                else:
                    assert got == ref_bytes  # single block -> same order

    def test_retry_idempotent_part_names(self, ray_session, tmp_path):
        import glob as _glob

        import pyarrow as _pa
        import ray.data as rd

        from quickner_ray.sinks.distributed import write_jsonl_dataset

        tab = _pa.table(
            {"doc_id": ["a", "b"], "text": ["t1", "t2"], "label": [[], []]}
        )
        out = str(tmp_path / "dist2")
        write_jsonl_dataset(rd.from_arrow(tab), out).take_all()
        write_jsonl_dataset(rd.from_arrow(tab), out).take_all()  # re-run
        parts = _glob.glob(os.path.join(out, "part-*.jsonl"))
        assert len(parts) == 1  # same content -> same name -> overwrite


import pytest


@pytest.mark.usefixtures("ray_session")
def test_compact_parquet(tmp_path):
    """Many small shards -> few target-size files, content-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quickner_ray.sinks.distributed import compact_parquet

    src = tmp_path / "small"
    src.mkdir()
    rows = []
    for i in range(12):
        tab = pa.table({"k": [i * 10 + j for j in range(10)]})
        pq.write_table(tab, src / f"part-{i:03d}.parquet")
        rows += tab.column("k").to_pylist()
    out = tmp_path / "compact"
    stats = compact_parquet(str(src), str(out), target_rows_per_file=60)
    assert stats == {"rows": 120, "files_in": 12, "files_out": 2}
    got = sorted(
        pq.read_table(str(out)).column("k").to_pylist()
    )
    assert got == sorted(rows)


class TestNTriplesSink:
    def test_bytes_escaping_and_idempotency(self, ray_session, tmp_path):
        import ray.data as rd

        import pyarrow as pa

        from quickner_ray.sinks.distributed import write_ntriples_dataset

        tab = pa.table(
            {
                "subj": ["d1", "d2", "d 3"],
                "pred": ["ORG", "mentions", "PL"],
                "obj": ['plain', 'q"uote\\back\nnl\tté', '汉字'],
            }
        )
        out = str(tmp_path / "nt")
        ds = rd.from_arrow(tab).repartition(1)
        manifest = write_ntriples_dataset(ds, out).take_all()
        assert sum(m["rows"] for m in manifest) == 3
        [path] = [m["path"] for m in manifest]
        data = open(path, "rb").read().decode("utf-8")
        lines = data.splitlines()
        assert lines[0] == '<urn:quickner:doc:d1> <urn:quickner:pred:ORG> "plain" .'
        # escaping: \ -> \\, " -> \", newline -> \n, tab -> \t; UTF-8 raw
        assert (
            lines[1]
            == '<urn:quickner:doc:d2> <urn:quickner:pred:mentions> '
            '"q\\"uote\\\\back\\nnl\\tté" .'
        )
        # IRI-unsafe subject percent-encoded
        assert lines[2].startswith('<urn:quickner:doc:d%203> ')
        assert '"汉字" .' in lines[2]
        assert data.endswith("\n")
        # idempotency: rerun writes the same part path, no duplicates
        manifest2 = write_ntriples_dataset(rd.from_arrow(tab).repartition(1), out).take_all()
        assert [m["path"] for m in manifest2] == [path]
        import os as _os

        assert len([f for f in _os.listdir(out) if f.endswith(".nt")]) == 1

    def test_kg_triples_export(self, ray_session, tmp_path, sf_dir):
        """The flagship triples stream exports to N-Triples end-to-end."""
        from quickner_ray.pipelines.queries import q_triples
        from quickner_ray.sinks.distributed import write_ntriples_dataset

        tri = q_triples(sf_dir)
        out = str(tmp_path / "kg_nt")
        manifest = write_ntriples_dataset(tri, out).take_all()
        total = sum(m["rows"] for m in manifest)
        assert total == tri.count()
        # every line parses as <iri> <iri> "literal" .
        import re

        pat = re.compile(r'^<[^ >]+> <[^ >]+> ".*" \.$')
        for m in manifest[:2]:
            for ln in open(m["path"], encoding="utf-8").read().splitlines()[:50]:
                assert pat.match(ln), ln


class TestNTriplesReader:
    def test_round_trip(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.sinks.distributed import write_ntriples_dataset
        from quickner_ray.sources.ntriples import read_ntriples

        tab = pa.table(
            {
                "subj": ["d1", "d2", "d 3", "d4"],
                "pred": ["ORG", "mentions", "PL", "p"],
                # exercises every writer escape incl. the \\n ambiguity
                # (backslash-then-n must NOT come back as newline)
                "obj": ["plain", 'q"uote\\back\nnl\tté', "汉字", "back\\nslash"],
            }
        )
        out = str(tmp_path / "nt_rt")
        write_ntriples_dataset(rd.from_arrow(tab), out).take_all()
        back = read_ntriples(out).to_pandas()
        got = {
            (r.subj, r.pred, r.obj, r.obj_is_iri) for r in back.itertuples()
        }
        want = {
            (s, p, o, False)
            for s, p, o in zip(
                tab.column("subj").to_pylist(),
                tab.column("pred").to_pylist(),
                tab.column("obj").to_pylist(),
            )
        }
        assert got == want

    def test_foreign_dump_and_escapes(self, ray_session, tmp_path):
        from quickner_ray.sources.ntriples import read_ntriples

        p = tmp_path / "dump.nt"
        p.write_text(
            "# a comment line\n"
            '<http://ex.org/a> <http://ex.org/p> "caf\\u00e9" .\n'
            "<http://ex.org/a> <http://ex.org/q> <http://ex.org/b> .\n"
            '<urn:quickner:doc:42> <urn:quickner:pred:OPERATOR> "v" .\n'
            "\n",
            encoding="utf-8",
        )
        df = read_ntriples(str(p)).to_pandas()
        rows = {(r.subj, r.pred, r.obj, r.obj_is_iri) for r in df.itertuples()}
        assert ("http://ex.org/a", "http://ex.org/p", "café", False) in rows
        assert ("http://ex.org/a", "http://ex.org/q", "http://ex.org/b", True) in rows
        # our urn base strips back to bare ids
        assert ("42", "OPERATOR", "v", False) in rows
        assert len(rows) == 3

    def test_malformed_raises(self, ray_session, tmp_path):
        import pytest as _pytest

        from quickner_ray.sources.ntriples import read_ntriples

        p = tmp_path / "bad.nt"
        p.write_text("<urn:x> <urn:p> no-object-here\n", encoding="utf-8")
        with _pytest.raises(Exception):
            read_ntriples(str(p)).materialize()


class TestNQuadsReader:
    def test_quads_and_default_graph_lines(self, ray_session, tmp_path):
        from quickner_ray.sources.ntriples import read_nquads

        p = tmp_path / "dump.nq"
        p.write_text(
            "# comment\n"
            '<http://ex.org/a> <http://ex.org/p> "v" <http://ex.org/g1> .\n'
            "<http://ex.org/a> <http://ex.org/q> <http://ex.org/b> "
            "<http://ex.org/g2> .\n"
            '<http://ex.org/c> <http://ex.org/p> "w" .\n'  # default graph
            '<urn:quickner:doc:7> <urn:quickner:pred:OP> "x" '
            "<urn:quickner:graph:src9> .\n",
            encoding="utf-8",
        )
        df = read_nquads(str(p)).to_pandas()
        rows = {
            (r.subj, r.pred, r.obj, r.obj_is_iri, r.graph)
            for r in df.itertuples()
        }
        assert rows == {
            ("http://ex.org/a", "http://ex.org/p", "v", False,
             "http://ex.org/g1"),
            ("http://ex.org/a", "http://ex.org/q", "http://ex.org/b", True,
             "http://ex.org/g2"),
            ("http://ex.org/c", "http://ex.org/p", "w", False, ""),
            ("7", "OP", "x", False, "src9"),
        }

    def test_nt_content_parses_as_default_graph(self, ray_session, tmp_path):
        from quickner_ray.sources.ntriples import read_nquads

        p = tmp_path / "plain.nt"
        p.write_text('<urn:x> <urn:p> "v" .\n', encoding="utf-8")
        df = read_nquads(str(p)).to_pandas()
        assert list(df.graph) == [""]

    def test_quads_feed_graph_scoped_bgp(self, ray_session, tmp_path):
        from quickner_ray.kernel.sparql import run_select
        from quickner_ray.sources.ntriples import read_nquads

        p = tmp_path / "kg.nq"
        p.write_text(
            '<urn:d1> <urn:quickner:pred:SYS> "spark" <urn:g1> .\n'
            '<urn:d2> <urn:quickner:pred:SYS> "spark" <urn:g2> .\n'
            '<urn:d3> <urn:quickner:pred:SYS> "flink" <urn:g1> .\n',
            encoding="utf-8",
        )
        rows = run_select(
            read_nquads(str(p)),
            'SELECT ?d ?g WHERE { GRAPH ?g { ?d :SYS "spark" . } }',
        ).take_all()
        assert sorted((r["d"], r["g"]) for r in rows) == [
            ("urn:d1", "urn:g1"), ("urn:d2", "urn:g2"),
        ]

    def test_malformed_quad_raises(self, ray_session, tmp_path):
        import pytest as _pytest

        from quickner_ray.sources.ntriples import read_nquads

        p = tmp_path / "bad.nq"
        p.write_text("<urn:x> <urn:p> <urn:o> <urn:g> extra .\n",
                     encoding="utf-8")
        with _pytest.raises(Exception):
            read_nquads(str(p)).materialize()


class TestNQuadsWriter:
    def test_round_trip_with_default_graph(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.sinks.distributed import write_nquads_dataset
        from quickner_ray.sources.ntriples import read_nquads

        tab = pa.table(
            {
                "subj": ["d1", "d2", "d 3"],
                "pred": ["ORG", "mentions", "PL"],
                "obj": ["plain", 'q"uote\\back\nnl', "汉字"],
                "graph": ["srcA", "", "src B"],  # '' = default graph
            }
        )
        out = str(tmp_path / "nq_rt")
        write_nquads_dataset(rd.from_arrow(tab), out).take_all()
        back = read_nquads(out).to_pandas()
        got = {
            (r.subj, r.pred, r.obj, r.graph) for r in back.itertuples()
        }
        want = set(
            zip(
                tab.column("subj").to_pylist(),
                tab.column("pred").to_pylist(),
                tab.column("obj").to_pylist(),
                tab.column("graph").to_pylist(),
            )
        )
        assert got == want
