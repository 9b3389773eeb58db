"""Composed training-data preparation pipeline — the operators a 100 TB
corpus prep run chains together, as ONE streaming Dataset flow:

    read(documents)                         # pruned columns
      -> P1 length filter                   # vectorized predicate
      -> LangIdStage (actor pool)           # keep target language
      -> near-dup anti-join                 # MinHash+LSH drop set, broadcast
      -> token counts                       # vectorized
      -> survivors (doc_id, n_tokens)

The near-dup drop set comes from ``dedup_approx.lsh_dup_pairs`` over the
full corpus (greedy keep-lowest-id, same contract as ``minhash_dedup_docs``)
— a small result collected driver-side and broadcast, NOT a shuffle join.
Every step is DuckDB-expressible, so the whole composition is oracle-checked
end-to-end (``sql_corpus_prep``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup_approx import lsh_dup_pairs, sql_lsh_dup_pairs
from ..stages.text_analysis import LangIdStage, add_token_count, sql_lang_id

MIN_LEN = 100
MAX_LEN = 500
LANG = "en"
DUP_THRESHOLD = 0.5


def corpus_prep(sf_dir: str):
    """documents.parquet -> surviving (doc_id, n_tokens).

    The near-dup drop set goes through ``antijoin.anti_join`` — broadcast
    only when measurably small, hash-partitioned ``left_anti`` otherwise;
    nothing corpus-proportional lands on the driver. (The LSH pass is a
    second read of the input by design: dedup semantics are defined over the
    FULL corpus, before the length/lang filters.)"""
    import ray.data as rd

    from ..stages.antijoin import anti_join

    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])

    pairs = lsh_dup_pairs(
        rd.read_parquet(path, columns=["doc_id", "text"]), threshold=DUP_THRESHOLD
    )

    def length_filter(b: pa.Table) -> pa.Table:
        n = pc.binary_length(b.column("text"))
        mask = pc.and_(
            pc.greater_equal(n, pa.scalar(MIN_LEN)), pc.less_equal(n, pa.scalar(MAX_LEN))
        )
        return b.filter(mask)

    ds = docs.map_batches(length_filter, batch_format="pyarrow")
    from ..stages.taskstate import task_stage

    ds = ds.map_batches(task_stage(LangIdStage), batch_format="pyarrow")
    ds = ds.filter(expr=f"lang_pred == '{LANG}'")
    ds = anti_join(ds, "doc_id", pairs, "doc_b")
    ds = ds.map_batches(add_token_count, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens"])


def sql_corpus_prep(table: str = "documents") -> str:
    token_re = r"[^ \t\n\x0b\x0c\r]+"
    return (
        f"WITH lang AS ({sql_lang_id(table)}),\n"
        f"drops AS (SELECT DISTINCT doc_b FROM ({sql_lsh_dup_pairs(DUP_THRESHOLD, table)})),\n"
        f"tok AS (SELECT doc_id, CAST(length(regexp_extract_all(text, '{token_re}'))"
        f" AS BIGINT) AS n_tokens, strlen(text) AS n_bytes FROM {table})\n"
        f"SELECT d.doc_id, tok.n_tokens FROM {table} d\n"
        f"JOIN lang ON lang.doc_id = d.doc_id\n"
        f"JOIN tok ON tok.doc_id = d.doc_id\n"
        f"WHERE tok.n_bytes >= {MIN_LEN} AND tok.n_bytes <= {MAX_LEN}\n"
        f"  AND lang.lang_pred = '{LANG}'\n"
        f"  AND d.doc_id NOT IN (SELECT doc_b FROM drops)"
    )


# -- full prep chain (round 2): + PII redaction, repetition filter, quality --

MAX_DUP_LINE_FRAC = 0.5


def corpus_prep_full(sf_dir: str):
    """The extended chain a real pretraining-corpus run uses — one streaming
    flow, every stage vectorized, end-to-end oracle (``sql_corpus_prep_full``):

        length filter -> PII redaction -> lang-ID (raw text) ->
        repetition filter (clean text) -> near-dup anti-join ->
        token + BPE-pretoken counts + quality score over the CLEAN text

    Emits (doc_id, n_tokens, n_bpe_tokens, quality_score, dup_line_frac).
    """
    import ray.data as rd

    from ..stages.antijoin import anti_join
    from ..stages.taskstate import task_stage
    from ..stages.text_analysis import (
        add_bpe_token_count,
        add_quality_score,
        add_repetition_stats,
        redact_pii,
    )

    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    pairs = lsh_dup_pairs(
        rd.read_parquet(path, columns=["doc_id", "text"]), threshold=DUP_THRESHOLD
    )

    def length_filter(b: pa.Table) -> pa.Table:
        n = pc.binary_length(b.column("text"))
        return b.filter(
            pc.and_(
                pc.greater_equal(n, pa.scalar(MIN_LEN)),
                pc.less_equal(n, pa.scalar(MAX_LEN)),
            )
        )

    ds = docs.map_batches(length_filter, batch_format="pyarrow")
    ds = ds.map_batches(redact_pii, batch_format="pyarrow")  # adds clean_text
    ds = ds.map_batches(task_stage(LangIdStage), batch_format="pyarrow")
    ds = ds.filter(expr=f"lang_pred == '{LANG}'")
    ds = ds.map_batches(
        lambda b: add_repetition_stats(b, text_col="clean_text"),
        batch_format="pyarrow",
    )
    ds = ds.filter(expr=f"dup_line_frac <= {MAX_DUP_LINE_FRAC}")
    ds = anti_join(ds, "doc_id", pairs, "doc_b")
    ds = ds.map_batches(
        lambda b: add_token_count(b, text_col="clean_text"), batch_format="pyarrow"
    )
    ds = ds.map_batches(
        lambda b: add_bpe_token_count(b, text_col="clean_text"),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        lambda b: add_quality_score(b, text_col="clean_text"), batch_format="pyarrow"
    )
    return ds.select_columns(
        ["doc_id", "n_tokens", "n_bpe_tokens", "quality_score", "dup_line_frac"]
    )


def sql_corpus_prep_full(table: str = "documents") -> str:
    from ..stages.text_analysis import (
        sql_bpe_token_count,
        sql_quality_score,
        sql_redact_pii,
        sql_repetition_stats,
    )

    token_re = r"[^ \t\n\x0b\x0c\r]+"
    return (
        f"WITH red AS (SELECT doc_id, clean_text AS text FROM ({sql_redact_pii(table)})),\n"
        f"lang AS ({sql_lang_id(table)}),\n"
        f"rep AS ({sql_repetition_stats('red')}),\n"
        f"q AS ({sql_quality_score('red')}),\n"
        f"bpe AS ({sql_bpe_token_count('red')}),\n"
        f"tok AS (SELECT doc_id, CAST(length(regexp_extract_all(text, '{token_re}'))"
        f" AS BIGINT) AS n_tokens FROM red),\n"
        f"drops AS (SELECT DISTINCT doc_b FROM ({sql_lsh_dup_pairs(DUP_THRESHOLD, table)}))\n"
        f"SELECT d.doc_id, tok.n_tokens, bpe.n_bpe_tokens, q.quality_score,\n"
        f"  rep.dup_line_frac\n"
        f"FROM {table} d\n"
        f"JOIN lang USING (doc_id) JOIN rep USING (doc_id) JOIN q USING (doc_id)\n"
        f"JOIN bpe USING (doc_id) JOIN tok USING (doc_id)\n"
        f"WHERE strlen(d.text) >= {MIN_LEN} AND strlen(d.text) <= {MAX_LEN}\n"
        f"  AND lang.lang_pred = '{LANG}'\n"
        f"  AND rep.dup_line_frac <= {MAX_DUP_LINE_FRAC}\n"
        f"  AND d.doc_id NOT IN (SELECT doc_b FROM drops)"
    )
