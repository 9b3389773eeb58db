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
