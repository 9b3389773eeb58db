"""BPE-ish pretokenizer count: the Ray stage (pyarrow RE2), the DuckDB
oracle, and Python ``re`` (also leftmost-first) must agree exactly."""

from __future__ import annotations

import re

import duckdb
import pyarrow as pa

from quickner_ray.stages.text_analysis import (
    PRETOKEN_RE,
    add_bpe_token_count,
    sql_bpe_token_count,
)

TEXTS = [
    "",
    "hello world",
    "it's a test-case: 42x, won't don'tish we'll they're I'm you've he'd",
    "  leading and   multiple   spaces\tand\ttabs\nnewlines  ",
    "CamelCase MixedCASE all-lower ALL-UPPER 123abc abc123",
    "punct!!! runs??? ...with'apostrophes' and (parens) [brackets]",
    "no-space-prefix",
    "trailing space ",
    "'s starts with contraction",
    "unicode stays opaque: café naïve 中文",
]


def test_bpe_count_matches_python_re_and_duckdb():
    batch = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    out = add_bpe_token_count(batch)
    got = out.column("n_bpe_tokens").to_pylist()

    pat = re.compile(PRETOKEN_RE)
    expect = [len(pat.findall(t)) for t in TEXTS]
    assert got == expect

    con = duckdb.connect()
    con.sql("SET threads=2")
    con.register("documents", batch)
    ora = dict(
        con.sql(sql_bpe_token_count("documents")).fetchall()
    )
    assert [ora[i] for i in range(len(TEXTS))] == expect


def test_bpe_count_contraction_and_prefix_semantics():
    # "it's" -> ["it", "'s"]; " won't" -> [" won", "'t"]; a space binds to
    # the following letter run (GPT-2 style), whitespace runs collapse.
    batch = pa.table({"doc_id": [0, 1, 2], "text": ["it's", " won't x", "a  b"]})
    got = add_bpe_token_count(batch).column("n_bpe_tokens").to_pylist()
    assert got == [2, 3, 3]  # [it]['s] | [ won]['t][ x] | [a][  ][b]


def test_normalized_text_matches_duckdb():
    import duckdb

    from quickner_ray.stages.text_analysis import (
        add_normalized_text,
        sql_normalized_text,
    )

    batch = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["  A\t\tB\nC  ", "École  ÇA\x0b x", "", "\r\n\r\n"],
        }
    )
    out = add_normalized_text(batch)
    got = list(
        zip(out.column("norm_text").to_pylist(), out.column("n_chars_norm").to_pylist())
    )
    assert got == [("a b c", 5), ("école ça x", 10), ("", 0), ("", 0)]
    con = duckdb.connect()
    con.register("documents", batch)
    ora = {r[0]: (r[1], r[2]) for r in con.sql(sql_normalized_text()).fetchall()}
    assert [ora[i] for i in range(4)] == got


class TestLineDedup:
    """Corpus-level line dedup (CCNet-style): first occurrence wins, blank
    lines always survive, docs reassemble in line order, a doc whose every
    line is dropped disappears."""

    DOCS = {
        # doc 2 repeats doc 10's boilerplate line; doc 10 is corpus-first
        # by numeric id order... no — 2 < 10 numerically, so doc 2 wins.
        2: "alpha beta\nshared boilerplate line\n\ngamma",
        10: "shared boilerplate line\ndelta",
        7: "shared boilerplate line",  # every line dropped -> doc vanishes
        3: "   \nalpha beta\nunique tail",  # ws-only line kept; dup of doc2 line0? no: 'alpha beta' first seen in doc 2
    }

    def _run(self, ids, ray_session):
        import ray.data as rd

        from quickner_ray.stages.text_analysis import line_dedup, sql_line_dedup

        tab = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64() if isinstance(ids[0], int) else pa.string()),
                "text": [self.DOCS[k] for k in sorted(self.DOCS)],
            }
        )
        ds = rd.from_arrow(tab)
        got = (
            line_dedup(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", tab)
        ora = (
            con.sql(sql_line_dedup())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return got, ora

    def test_int_ids_match_duckdb(self, ray_session):
        ids = sorted(self.DOCS)  # [2, 3, 7, 10]
        got, ora = self._run(ids, ray_session)
        assert got["doc_id"].tolist() == ora["doc_id"].tolist()
        assert got["text_dedup"].tolist() == ora["text_dedup"].tolist()
        assert got["n_kept"].tolist() == ora["n_kept"].tolist()
        # doc 7's only line is a duplicate -> doc disappears
        assert 7 not in set(got["doc_id"])
        # doc 2 (numerically first) keeps the boilerplate line
        assert "shared boilerplate line" in got.set_index("doc_id").loc[2, "text_dedup"]
        assert "shared boilerplate line" not in got.set_index("doc_id").loc[10, "text_dedup"]
        # blank / ws-only lines always survive
        assert "   \n" in got.set_index("doc_id").loc[3, "text_dedup"]

    def test_string_ids_match_duckdb(self, ray_session):
        # string ids order LEXICOGRAPHICALLY ('10' < '2') in both engines
        ids = [str(k) for k in sorted(self.DOCS)]
        got, ora = self._run(ids, ray_session)
        assert got["text_dedup"].tolist() == ora["text_dedup"].tolist()
        assert "shared boilerplate line" in got.set_index("doc_id").loc["10", "text_dedup"]


class TestGopherFilter:
    """Gopher composite gate: each rule trips independently; the Ray batch
    kernel and the SQL oracle agree on every count and the keep bit."""

    CASES = [
        # (text, expect_keep, reason)
        ("the quick brown fox jumps over a lazy dog " * 3, 1, "clean"),
        ("word " * 5, 0, "too few words"),
        ("the " + "supercalifragilistic " * 30, 0, "mean word len > 10"),
        ("the " + "## ### # ".join(["word"] * 30), 0, "symbol ratio"),
        ("the " + "12345 6789 " * 15, 0, "alpha-word fraction"),
        ("zzz qqq xxx " * 10, 0, "no stopwords"),
    ]

    def test_rules_and_oracle_agree(self, ray_session):
        import duckdb
        import ray.data as rd

        from quickner_ray.stages.text_analysis import (
            add_gopher_quality,
            sql_gopher_filter,
        )

        tab = pa.table(
            {
                "doc_id": pa.array(range(len(self.CASES)), type=pa.int64()),
                "text": [t for t, _, _ in self.CASES],
            }
        )
        got = (
            rd.from_arrow(tab)
            .map_batches(add_gopher_quality, batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, (_, want, reason) in enumerate(self.CASES):
            assert got.loc[i, "keep"] == want, reason
        con = duckdb.connect()
        con.register("documents", tab)
        ora = con.sql(sql_gopher_filter()).df().sort_values("doc_id").reset_index(drop=True)
        for col in ["n_words", "n_word_chars", "n_alpha_words", "n_sym", "n_stop", "keep"]:
            assert got[col].tolist() == ora[col].tolist(), col


class TestHostBoilerplate:
    """Per-host boilerplate stripping: a line repeated across >= min_docs
    distinct docs of the SAME host is removed from all of them; the same
    line on another host survives; blank lines always survive."""

    def _tab(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "host": [
                    "a.com", "a.com", "a.com", "b.com", "b.com",
                ],
                "text": [
                    "Cookie banner\ncontent one",
                    "Cookie banner\ncontent two\n\ntail",
                    "unique page",
                    "Cookie banner\nother site content",  # b.com: only 1 doc has it
                    "fresh text",
                ],
            }
        )

    def test_lines_and_strip_match_brute_force(self, ray_session):
        import ray.data as rd

        from quickner_ray.stages.text_analysis import (
            host_boilerplate_lines,
            host_boilerplate_strip,
        )

        ds = rd.from_arrow(self._tab())
        lines = {
            (r["host"], r["line"]): r["n_docs"]
            for r in host_boilerplate_lines(ds).take_all()
        }
        # only a.com's banner crosses the 2-doc threshold
        assert lines == {("a.com", "Cookie banner"): 2}

        got = {
            r["doc_id"]: (r["text_clean"], r["n_kept"])
            for r in host_boilerplate_strip(rd.from_arrow(self._tab())).take_all()
        }
        assert got[1] == ("content one", 1)
        assert got[2] == ("content two\n\ntail", 3)  # blank line survives
        assert got[3] == ("unique page", 1)
        assert got[4] == ("Cookie banner\nother site content", 2)  # other host
        assert got[5] == ("fresh text", 1)

    def test_doc_of_only_boilerplate_disappears(self, ray_session):
        import ray.data as rd

        from quickner_ray.stages.text_analysis import host_boilerplate_strip

        tab = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "host": ["x", "x"],
                "text": ["nav", "nav"],
            }
        )
        assert host_boilerplate_strip(rd.from_arrow(tab)).take_all() == []


def test_compression_ratio_signal():
    """Repetitive text compresses far below high-entropy text; ratio is
    deterministic and n_deflate consistent with a direct zlib call."""
    import zlib

    import pyarrow as pa

    from quickner_ray.stages.text_analysis import add_compression_ratio

    rep = "the same line again and again. " * 50
    import random

    rng = random.Random(0)
    rand = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz 0123456789") for _ in range(1500))
    batch = pa.table({"doc_id": [1, 2, 3], "text": [rep, rand, ""]})
    out = add_compression_ratio(batch)
    r = dict(zip(out.column("doc_id").to_pylist(), out.column("compression_ratio").to_pylist()))
    assert r[1] < 0.15 < 0.5 < r[2]
    nd = dict(zip(out.column("doc_id").to_pylist(), out.column("n_deflate").to_pylist()))
    assert nd[2] == len(zlib.compress(rand.encode(), 6))
    # empty doc: guarded division
    assert out.column("n_bytes").to_pylist()[2] == 0
    out2 = add_compression_ratio(batch)
    assert out.column("compression_ratio").to_pylist() == out2.column("compression_ratio").to_pylist()


def test_nfc_normalization():
    import pyarrow as pa

    from quickner_ray.stages.text_analysis import add_nfc_normalized

    dec = "cafe" + chr(769)  # e + combining acute (decomposed)
    lig = "ﬁne"  # fi ligature: NFC leaves compatibility chars alone
    batch = pa.table({"doc_id": ["a", "b", "c"], "text": ["plain ascii", dec, lig]})
    out = add_nfc_normalized(batch)
    got = out.column("text_nfc").to_pylist()
    assert got[0] == "plain ascii"
    assert got[1] == "café" and len(got[1]) == 4  # composed
    assert got[2] == lig  # NFC != NFKC
    assert out.column("n_chars_raw").to_pylist() == [11, 5, 3]
    assert out.column("n_chars_nfc").to_pylist() == [11, 4, 3]


def test_readability_exact_rational(ray_session):
    """FK grade rational on crafted docs: clamps, punct runs, vowel groups,
    and the value itself against hand computation + the SQL oracle."""
    import duckdb

    from quickner_ray.stages.text_analysis import add_readability, sql_readability

    texts = [
        "The cat sat. The dog ran!",   # 6 words, 2 sentences
        "",                             # all-clamped
        "why?!? y y y",                 # terminator run counts once; y = vowel
        "a" * 50,                       # one long vowel group, no sentence
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )
    out = add_readability(tbl)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[0]["n_words"] == 6 and rows[0]["n_sentences"] == 2
    assert rows[1]["n_words"] == 0 and rows[1]["fk_den"] == 100  # clamped 1*1
    assert rows[2]["n_sentences"] == 1  # "?!?" is one terminator run
    assert rows[3]["n_syllables"] == 1  # one maximal vowel run
    # hand-check doc 0: W=6 S=2 Syl = vowel groups of "the cat sat the dog ran"
    syl = rows[0]["n_syllables"]
    assert rows[0]["fk_num"] == 39 * 36 + 1180 * syl * 2 - 1559 * 2 * 6
    assert rows[0]["fk_den"] == 100 * 2 * 6
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.sql(sql_readability()).df().sort_values("doc_id").reset_index(drop=True)
    got = (
        out.select(["doc_id", "n_words", "n_sentences", "n_syllables", "fk_num", "fk_den"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
