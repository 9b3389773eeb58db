"""Chunking, vocab-DF, and PII redaction: engine vs DuckDB oracle on
crafted inputs that actually exercise the rules (the sf testdata contains
no PII and little vocab variety)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

from quickner_ray.stages.chunking import chunk_batch, sql_chunks
from quickner_ray.stages.text_analysis import (
    partial_vocab_counts,
    redact_pii,
    sql_redact_pii,
    sql_vocab_df,
)


def _oracle(tbl: pa.Table, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql("SET threads=2")
    con.register("documents", tbl)
    return con.sql(sql).df()


def test_chunking_matches_oracle_incl_edges():
    texts = [
        "a" * 450,          # 3 windows at size=200/step=160
        "b" * 200,          # exactly one window
        "c" * 201,          # wraps into a 41-char tail
        "",                 # no chunks
        "short",
        "ü" * 170,          # non-ASCII: char semantics must match substr
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    got = chunk_batch(tbl, size=200, overlap=40).to_pandas()
    ora = _oracle(tbl, sql_chunks(size=200, overlap=40))
    cols = ["doc_id", "chunk_id", "chunk_text"]
    got = got[cols].sort_values(cols[:2]).reset_index(drop=True)
    ora = ora[cols].sort_values(cols[:2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ora, check_dtype=False)
    # overlap really overlaps
    c0 = got[(got.doc_id == 0) & (got.chunk_id == 0)].chunk_text.iloc[0]
    c1 = got[(got.doc_id == 0) & (got.chunk_id == 1)].chunk_text.iloc[0]
    assert c0[-40:] == c1[:40]
    assert (got.doc_id != 3).all()  # empty doc -> no chunks


def test_redact_pii_rules():
    texts = [
        "mail me at john.doe+x@example.co.uk please",
        "call +1 (415) 555-0199 or 020 7946 0958 now",
        "ssn-ish 123456789 and card 4111111111111111",
        "clean text with no pii at all",
        "a@b.io end",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    got = redact_pii(tbl).to_pandas()[["doc_id", "clean_text"]]
    ora = _oracle(tbl, sql_redact_pii())
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        ora.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    by = got.set_index("doc_id").clean_text
    assert by[0] == "mail me at <EMAIL> please"
    assert "<PHONE>" in by[1] and "555" not in by[1]
    assert "<NUM>" in by[2] and "123456789" not in by[2]
    assert by[3] == "clean text with no pii at all"
    assert by[4] == "<EMAIL> end"


def test_vocab_partial_counts():
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": ["the cat the dog", "THE bird", ""],
        }
    )
    got = (
        partial_vocab_counts(tbl)
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    ora = _oracle(tbl, sql_vocab_df()).sort_values("word").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ora, check_dtype=False)
    the = got[got.word == "the"].iloc[0]
    assert the.df == 2 and the.tf == 3  # df counts docs, tf occurrences


def test_repetition_stats_matches_oracle():
    from quickner_ray.stages.text_analysis import (
        add_repetition_stats,
        sql_repetition_stats,
    )

    texts = [
        "a\nb\na\nb\na",          # 5 lines, 2 distinct
        "unique\nlines\nonly",
        "",                        # one empty line
        "same\nsame\nsame",
        "no newline at all",
        "trailing\n",              # trailing newline -> empty last line
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    got = add_repetition_stats(tbl).to_pandas()[
        ["doc_id", "n_lines", "n_distinct_lines", "dup_line_frac"]
    ]
    ora = _oracle(tbl, sql_repetition_stats())
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        ora.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    by = got.set_index("doc_id")
    assert by.loc[0, "n_lines"] == 5 and by.loc[0, "n_distinct_lines"] == 2
    assert by.loc[0, "dup_line_frac"] == 0.6
    assert by.loc[3, "dup_line_frac"] == 2 / 3
    assert by.loc[2, "n_lines"] == 1 and by.loc[2, "dup_line_frac"] == 0.0


def test_partial_bigram_counts():
    from quickner_ray.stages.text_analysis import (
        partial_bigram_counts,
        sql_top_bigrams,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": ["the cat sat", "the cat", "x", ""],  # no cross-doc bigrams
        }
    )
    got = (
        partial_bigram_counts(tbl)
        .to_pandas()
        .sort_values("ngram")
        .reset_index(drop=True)
    )
    assert got.set_index("ngram").n.to_dict() == {"the cat": 2, "cat sat": 1}
    # single-batch partials already equal the oracle's grouped totals
    ora = _oracle(tbl, sql_top_bigrams(k=10)).sort_values("ngram").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["n", "ngram"], ascending=[False, True]).reset_index(drop=True),
        ora.sort_values(["n", "ngram"], ascending=[False, True]).reset_index(drop=True),
        check_dtype=False,
    )


def test_chunking_property_random():
    """Random texts/sizes: chunks reassemble to the original text when the
    overlap is stripped, and every window respects the size bound."""
    import numpy as np

    from quickner_ray.stages.chunking import chunk_batch

    rng = np.random.RandomState(5)
    alphabet = "abcdef \n"
    for trial in range(20):
        size = int(rng.randint(8, 60))
        overlap = int(rng.randint(0, size - 1))
        step = size - overlap
        texts = [
            "".join(rng.choice(list(alphabet), size=int(n)))
            for n in rng.randint(0, 150, size=8)
        ]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
        out = chunk_batch(tbl, size=size, overlap=overlap).to_pandas()
        for i, t in enumerate(texts):
            chunks = out[out.doc_id == i].sort_values("chunk_id").chunk_text.tolist()
            if not t:
                assert chunks == []
                continue
            assert all(len(c) <= size for c in chunks)
            rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
            assert rebuilt == t, (size, overlap, i)


def test_split_sentences_matches_oracle_incl_edges():
    from quickner_ray.stages.chunking import split_sentences_batch, sql_sentences

    texts = [
        "One. Two! Three? Four",        # mixed terminators, unterminated tail
        "no terminators at all",         # single sentence
        "",                              # one empty sentence (split semantics)
        "Trailing dot. ",                # terminator+space at end -> empty tail
        "a.b not split (no whitespace)", # dot without whitespace stays
        "Multi   spaces.   After.",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    got = split_sentences_batch(tbl).to_pandas()
    ora = _oracle(tbl, sql_sentences())
    cols = ["doc_id", "sent_idx", "sentence", "sent_chars"]
    got = got[cols].sort_values(cols[:2]).reset_index(drop=True)
    ora = ora[cols].sort_values(cols[:2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ora, check_dtype=False)
    # dot-without-whitespace is NOT a boundary
    assert (got[got.doc_id == 4].sentence == texts[4]).all()
    # sent_idx is 1-based and dense per doc
    d0 = got[got.doc_id == 0]
    assert list(d0.sent_idx) == [1, 2, 3, 4]


def test_rare_word_stats_matches_oracle_with_tf_tie(ray_session):
    import ray.data as rd

    from quickner_ray.stages.text_analysis import rare_word_stats, sql_rare_word_stats

    # k=2: "aa" tf=3 is in; "bb" and "cc" tie at tf=2 -> lexicographic
    # tiebreak keeps "bb", makes "cc" rare. Empty doc -> n_tokens=0, frac=0.
    texts = ["aa aa bb cc", "aa bb cc!", "", "zz zz zz zz"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    # zz tf=4 beats aa -> common={zz, aa} at k=2
    got = (
        rare_word_stats(rd.from_arrow(tbl), k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ora = (
        _oracle(tbl, sql_rare_word_stats(k=2))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "n_tokens", "n_rare", "rare_frac"]
    pd.testing.assert_frame_equal(got[cols], ora[cols], check_dtype=False)
    assert got.loc[2, "n_tokens"] == 0 and got.loc[2, "rare_frac"] == 0.0


def test_keyword_search_whole_token_semantics(ray_session):
    import ray.data as rd

    from quickner_ray.stages.text_analysis import keyword_search, sql_keyword_search

    texts = [
        "Spark window functions",   # both, case-insensitive
        "sparkly windows",          # substring only -> no match
        "window spark",             # both at string edges
        "spark only here",          # missing window
        "",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    got = keyword_search(rd.from_arrow(tbl)).to_pandas()
    ora = _oracle(tbl, sql_keyword_search())
    assert sorted(got.doc_id) == sorted(ora.doc_id) == [0, 2]


def test_pattern_offsets_edges(ray_session):
    from quickner_ray.pipelines import queries as Q

    texts = [
        "spark at start sparkspark adjacent, end with spark",
        "no hits here",
        "",
        "spark",                       # exact-equal doc
        "ssparkk",                     # embedded
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    import duckdb

    con = duckdb.connect()
    con.sql("SET threads=2")
    con.register("documents", tbl)
    ora = con.sql(Q.sql_pattern_offsets()).df()

    # the query reads documents.parquet from a dir — stage the crafted table
    import tempfile, os as _os
    import pyarrow.parquet as _pq

    with tempfile.TemporaryDirectory() as d:
        _pq.write_table(tbl.append_column("lang", pa.array(["en"] * len(texts))), _os.path.join(d, "documents.parquet"))
        got = Q.q_pattern_offsets(d).to_pandas()
    key = ["doc_id", "pos"]
    a = got.sort_values(key).reset_index(drop=True)
    b = ora.sort_values(key).reset_index(drop=True)
    assert a[key].values.tolist() == b[key].values.tolist()
    # doc 0: positions 1, 16, 21, 46 (1-based)
    assert a[a.doc_id == 0].pos.tolist() == [1, 16, 21, 46]
    assert a[a.doc_id == 3].pos.tolist() == [1]


def test_crawl_budget_hamilton_allocation(ray_session, tmp_path):
    """Largest-remainder budget split: Σbudget == B exactly, proportional
    base, remainder ties broken by host asc — vs the DuckDB oracle on a
    skewed corpus (one dominant host)."""
    import pyarrow.parquet as pq

    from quickner_ray.pipelines.queries import q_crawl_budget, sql_crawl_budget

    # doc_id magnitude controls len(str(doc_id)) -> host bucket; a skewed
    # spread: 1-3 digit ids dominate two buckets, five 4-digit stragglers
    ids = list(range(270)) + [1000 + i for i in range(5)]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(["web"] * len(ids)),
            "text": pa.array(["x"] * len(ids)),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))

    got = (
        q_crawl_budget(str(sf))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(sql_crawl_budget()).df().sort_values("host").reset_index(drop=True)
    assert got.equals(want), (got, want)
    assert int(got["budget"].sum()) == 1000
    # proportionality: every host within 1 slot of its exact share
    tot = got["n_docs"].sum()
    for _, r in got.iterrows():
        exact = 1000 * r["n_docs"] / tot
        assert abs(r["budget"] - exact) < 1


def test_zorder_key_locality_and_bits():
    """Morton keys: magic-mask spread == per-bit reference, and z-ordered
    blocks prune a 2-D range query better than either single-column sort."""
    import numpy as np

    from quickner_ray.stages.zorder import zorder_key16

    rng = np.random.default_rng(5)
    a = rng.integers(0, 65536, 2000).astype(np.int64)
    b = rng.integers(0, 65536, 2000).astype(np.int64)
    z = zorder_key16(a, b)
    # per-bit reference
    ref = np.zeros(len(a), dtype=np.int64)
    for i in range(16):
        ref |= ((a >> i) & 1) << (2 * i)
        ref |= ((b >> i) & 1) << (2 * i + 1)
    assert (z == ref).all()
    # locality: uniform grid, 64-row blocks, square range query
    lo, hi = 20000, 28000

    def blocks_touched(order):
        aa, bb = a[order], b[order]
        touched = 0
        for s in range(0, len(aa), 64):
            amin, amax = aa[s : s + 64].min(), aa[s : s + 64].max()
            bmin, bmax = bb[s : s + 64].min(), bb[s : s + 64].max()
            if amin <= hi and amax >= lo and bmin <= hi and bmax >= lo:
                touched += 1
        return touched

    zt = blocks_touched(np.argsort(z, kind="stable"))
    at = blocks_touched(np.argsort(a, kind="stable"))
    bt = blocks_touched(np.argsort(b, kind="stable"))
    assert zt < at and zt < bt
