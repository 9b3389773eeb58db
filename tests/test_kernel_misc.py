"""Filters (F-5 matrix), hashing, config, HTML extraction round-trip."""

from __future__ import annotations

import random

import pyarrow as pa

from quickner_ray.kernel import (
    Config,
    Filters,
    extract_text,
    hash_text,
    naive_find_index,
    synth_page,
)


class TestFilters:
    def test_empty_rejected(self):
        assert not Filters().is_valid("")

    def test_alphanumeric_flag(self):
        f = Filters(alphanumeric=True)
        assert not f.is_valid("abc123")
        assert f.is_valid("abc 123")  # space is not alphanumeric

    def test_punctuation_flag(self):
        f = Filters(punctuation=True)
        assert not f.is_valid("hello, world")
        assert f.is_valid("hello world")

    def test_numbers_flag(self):
        f = Filters(numbers=True)
        assert not f.is_valid("call 911")
        assert f.is_valid("call me")

    def test_special_characters_with_accept_list(self):
        # config/config.toml:19 accepts ".,-"
        f = Filters(special_characters=True, accept_special_characters=".,-")
        assert f.is_valid("a.b,c-d")
        assert not f.is_valid("a@b")

    def test_byte_length_bounds(self):
        f = Filters(min_length=2, max_length=4)
        assert not f.is_valid("a")
        assert f.is_valid("ab")
        assert f.is_valid("abcd")
        assert not f.is_valid("abcde")
        # length is BYTES: 'éé' is 4 bytes
        assert f.is_valid("éé")
        assert not f.is_valid("ééé")  # 6 bytes

    def test_vectorized_mask_matches_scalar(self):
        rng = random.Random(3)
        alphabet = "ab1.@é "
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 10)))
            for _ in range(200)
        ]
        for f in [
            Filters(),
            Filters(alphanumeric=True, punctuation=True),
            Filters(numbers=True, special_characters=True, accept_special_characters="."),
            Filters(min_length=2, max_length=5),
        ]:
            mask = f.valid_mask(pa.array(texts, type=pa.string())).to_pylist()
            assert mask == [f.is_valid(t) for t in texts]


class TestHashing:
    def test_stable_and_content_keyed(self):
        assert hash_text("abc") == hash_text("abc")
        assert hash_text("abc") != hash_text("abd")
        # md5 parity with DuckDB's md5()
        assert hash_text("abc") == "900150983cd24fb0d6963f7d28e17f72"


class TestConfig:
    def test_defaults_match_core(self):
        c = Config()
        assert c.texts.filters.max_length == 1024
        assert c.texts.filters.case_sensitive is False
        assert c.annotations.format == "jsonl"

    def test_toml_roundtrip(self, tmp_path):
        p = tmp_path / "config.toml"
        p.write_text(
            """
[texts.input]
path = "texts.csv"
filter = true
[texts.filters]
case_sensitive = false
max_length = 99
[annotations.output]
path = "out.jsonl"
[annotations]
format = "spacy"
[entities.input]
path = "entities.csv"
[entities.excludes]
path = "excludes.csv"
"""
        )
        c = Config.from_file(str(p))
        assert c.texts.input.path == "texts.csv"
        assert c.texts.filters.max_length == 99
        assert c.annotations.format == "spacy"
        assert c.entities.excludes.path == "excludes.csv"


class TestHtmlExtract:
    def test_roundtrip_goldens(self):
        for t in [
            "rust is made by Mozilla",
            "",
            "a\nb",
            "trailing newline\n",
            "x & <y> über\n\nz",
            "  leading and trailing  ",
            'quotes "stay" intact & <tags> escaped',
        ]:
            assert extract_text(synth_page(t)) == t, repr(t)

    def test_roundtrip_random(self):
        rng = random.Random(11)
        alphabet = "ab<>&\"'é\n ;x"
        for _ in range(300):
            t = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
            assert extract_text(synth_page(t)) == t, repr(t)

    def test_invalid_utf8_returns_none(self):
        assert extract_text(b"\xff\xfe<html>") is None

    def test_plain_html_without_article(self):
        page = (
            b"<html><head><title>t</title></head><body>"
            b"<nav>skip</nav><p>hello &amp; bye</p><footer>no</footer></body></html>"
        )
        assert extract_text(page) == "hello & bye"

    def test_deterministic(self):
        t = "same input, same bytes"
        assert synth_page(t, seq=5) == synth_page(t, seq=5)
        assert extract_text(synth_page(t)) == extract_text(synth_page(t))


class TestNaiveFindIndex:
    def test_basic_byte_offsets(self):
        # legacy oracle (quickner.rs:68-116): byte offsets, first hit per entity
        spans = naive_find_index("rust is made by mozilla", [("mozilla", "ORG")])
        assert spans == [(16, 23, "ORG")]

    def test_one_match_per_entity(self):
        spans = naive_find_index("go go go", [("go", "PL")])
        assert spans == [(0, 2, "PL")]


class TestRoundAway:
    def test_matches_duckdb_on_dyadics(self):
        """round_away == DuckDB ROUND bit-for-bit, including the dyadic
        midpoints where Python's banker's rounding diverges."""
        import duckdb
        import numpy as np

        from quickner_ray.kernel.rounding import round_away

        con = duckdb.connect()
        vals = [0.5078125, -0.5078125, 65 / 128, 3 / 4096, -7 / 8192,
                0.1234565, 1.0000005, 0.0, -0.25]
        rng = np.random.RandomState(4)
        vals += list(rng.uniform(-2, 2, 500))
        for v in vals:
            got = con.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
            assert round_away(v, 6) == got, v
        # the divergence this kernel exists for:
        assert round(0.5078125, 6) == 0.507812      # banker's
        assert round_away(0.5078125, 6) == 0.507813  # DuckDB

    def test_vectorized(self):
        import numpy as np

        from quickner_ray.kernel.rounding import round_away

        out = round_away(np.array([0.5078125, -0.5078125, 1.25]), 6)
        assert out.tolist() == [0.507813, -0.507813, 1.25]


class TestMd5Vec:
    """Batch MD5 kernel == hashlib, byte for byte (kernel/md5vec.py)."""

    def test_matches_hashlib(self):
        import hashlib
        import random

        import pyarrow as pa

        from quickner_ray.kernel.md5vec import md5_h64, md5_hex

        random.seed(11)
        strs = ["", "a", "hello world", "x" * 55, "x" * 56, "y" * 63,
                "z" * 64, "w" * 65, "q" * 119, "r" * 120, "ü€汉я" * 20]
        strs += [
            "".join(random.choice("abcdefgh ü汉") for _ in range(random.randint(0, 200)))
            for _ in range(300)
        ]
        arr = pa.array(strs, type=pa.string())
        hexes = md5_hex(arr).to_pylist()
        h64s = md5_h64(arr)
        for s, hx, h6 in zip(strs, hexes, h64s):
            d = hashlib.md5(s.encode()).digest()
            assert hx == d.hex()
            assert int(h6) == int.from_bytes(d[:8], "little")

    def test_sliced_and_chunked(self):
        import hashlib

        import pyarrow as pa

        from quickner_ray.kernel.md5vec import md5_hex

        arr = pa.array([f"row-{i}" for i in range(50)])
        sl = arr.slice(7, 20)
        got = md5_hex(sl).to_pylist()
        want = [hashlib.md5(f"row-{i}".encode()).hexdigest() for i in range(7, 27)]
        assert got == want
        ch = pa.chunked_array([arr.slice(0, 25), arr.slice(25, 25)])
        assert len(md5_hex(ch)) == 50

    def test_matches_h64_scalar(self):
        import pyarrow as pa

        from quickner_ray.kernel.md5vec import md5_h64
        from quickner_ray.stages.dedup_approx import h64

        words = ["", "the", "word", "doc-123", "ümlaut", "汉字"]
        got = md5_h64(pa.array(words))
        assert [int(x) for x in got] == [h64(w) for w in words]
