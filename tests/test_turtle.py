"""Turtle-subset reader (sources/turtle.py): parser conformance + the
per-file Ray ingest path."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quickner_ray.sources.turtle import TurtleError, parse_turtle, read_turtle

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class TestParser:
    def test_prefixes_lists_and_a(self):
        got = parse_turtle(
            "@prefix : <urn:q:> .\n"
            "@prefix ex: <http://ex.org/> .  # comment\n"
            ":d1 a ex:Page ;\n"
            "    ex:links :h1 , :h2 ;\n"
            '    ex:title "t" .\n'
        )
        assert got == [
            ("urn:q:d1", RDF_TYPE, "http://ex.org/Page"),
            ("urn:q:d1", "http://ex.org/links", "urn:q:h1"),
            ("urn:q:d1", "http://ex.org/links", "urn:q:h2"),
            ("urn:q:d1", "http://ex.org/title", "t"),
        ]

    def test_sparql_style_prefix_and_base(self):
        got = parse_turtle(
            "PREFIX ex: <http://ex.org/>\n"
            "@base <http://b.org/> .\n"
            "<x> ex:see <http://abs.org/y> .\n"
        )
        assert got == [
            ("http://b.org/x", "http://ex.org/see", "http://abs.org/y")
        ]

    def test_literal_tags_and_escapes(self):
        got = parse_turtle(
            "@prefix ex: <http://ex.org/> .\n"
            'ex:a ex:t "A \\"q\\"\\nB"@en .\n'
            'ex:a ex:n "1.5"^^ex:float .\n'
            "ex:a ex:r 42 .\n"
        )
        assert got == [
            ("http://ex.org/a", "http://ex.org/t", 'A "q"\nB'),
            ("http://ex.org/a", "http://ex.org/n", "1.5"),
            ("http://ex.org/a", "http://ex.org/r", "42"),
        ]

    def test_dotted_tokens(self):
        # decimal literals, dotted local names and dotted datatype IRIs are
        # single tokens (ADVICE r3: the old tokenizer split at internal dots)
        got = parse_turtle(
            "@prefix ex: <http://ex.org/> .\n"
            "ex:a ex:score 1.5 .\n"
            "ex:a ex:see ex:foo.bar .\n"
            'ex:a ex:v "3.4"^^<http://www.w3.org/2001/XMLSchema#decimal> .\n'
            'ex:a ex:w "v"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
        )
        assert got == [
            ("http://ex.org/a", "http://ex.org/score", "1.5"),
            ("http://ex.org/a", "http://ex.org/see", "http://ex.org/foo.bar"),
            ("http://ex.org/a", "http://ex.org/v", "3.4"),
            ("http://ex.org/a", "http://ex.org/w", "v"),
        ]

    def test_trailing_dot_still_terminates(self):
        # 'ex:foo.' / '1.5.' with no space before the terminator: the final
        # dot must tokenize as punct, not be swallowed into the word
        got = parse_turtle(
            "@prefix ex: <http://ex.org/> .\n"
            "ex:a ex:n 1.5.\n"
            "ex:a ex:see ex:foo.\n"
        )
        assert got == [
            ("http://ex.org/a", "http://ex.org/n", "1.5"),
            ("http://ex.org/a", "http://ex.org/see", "http://ex.org/foo"),
        ]

    @pytest.mark.parametrize(
        "bad",
        [
            "@prefix : <u:> .\n:a :b [ :c :d ] .",  # blank node
            "@prefix : <u:> .\n:a :b ( :c ) .",  # collection
            ":a :b :c .",  # undeclared prefix
            "@prefix : <u:> .\n:a :b :c",  # missing '.'
            '@prefix : <u:> .\n:a :b "v"^^',  # dangling datatype tag
        ],
    )
    def test_rejects(self, bad):
        with pytest.raises(TurtleError):
            parse_turtle(bad)


def test_read_turtle_per_file(ray_session, tmp_path):
    for k in range(3):
        (tmp_path / f"s{k}.ttl").write_text(
            "@prefix ex: <http://ex.org/> .\n"
            f"ex:d{k} ex:links ex:h{k % 2} ;\n"
            f'   ex:snap "s" .\n'
        )
    rows = read_turtle(str(tmp_path)).take_all()
    got = sorted((r["subj"], r["pred"], r["obj"]) for r in rows)
    assert got == sorted(
        [
            ("http://ex.org/d0", "http://ex.org/links", "http://ex.org/h0"),
            ("http://ex.org/d0", "http://ex.org/snap", "s"),
            ("http://ex.org/d1", "http://ex.org/links", "http://ex.org/h1"),
            ("http://ex.org/d1", "http://ex.org/snap", "s"),
            ("http://ex.org/d2", "http://ex.org/links", "http://ex.org/h0"),
            ("http://ex.org/d2", "http://ex.org/snap", "s"),
        ]
    )
